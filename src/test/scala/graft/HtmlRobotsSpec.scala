package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.html.Html
import graft.robots.{RobotRule, Robots}

class HtmlRobotsSpec extends AnyFunSuite {

  test("F3 spec: script/style/comment stripped, tags→space, entities, ws collapse") {
    val html =
      """<html><head><title>T1</title><style>s{}</style>
        |<script>var x=1;</script></head>
        |<body><h1>Page 1 &amp; friends</h1>
        |<p>Hello   &lt;world&gt; &#65;&#x42;&nbsp;end</p>
        |<!-- noise --></body></html>""".stripMargin
    assert(Html.extractTextStr(html) == "T1 Page 1 & friends Hello <world> AB end")
  }

  test("extraction drops nothing visible and is deterministic") {
    val h = "<p>a</p><p>b</p>"
    assert(Html.extractTextStr(h) == "a b")
    assert(Html.extractTextStr(h) == Html.extractTextStr(h))
  }

  test("link extraction: quoting styles, resolution, entity decode") {
    val html =
      """<a href="/abs">a</a>
        |<a href='rel/x'>b</a>
        |<a href=bare>c</a>
        |<A HREF="HTTP://Other.com/Y">d</A>
        |<a href="?q=1&amp;r=2">e</a>
        |<a href="#frag">f</a>""".stripMargin
    val links = Html.extractLinksStr(html, "http://ex.com/dir/page")
    assert(links.toSeq == Seq(
      "http://ex.com/abs",
      "http://ex.com/dir/rel/x",
      "http://ex.com/dir/bare",
      "HTTP://Other.com/Y",
      "http://ex.com/dir/page?q=1&r=2"))
  }

  test("fixture pages: stored text equals frozen extractor output") {
    val uni = graft.crawl.FixtureGen.Universe(200)
    (0L until 200L).foreach { p =>
      val row = uni.pageRow(p)
      assert(Html.extractText(row.html) == row.text)
    }
  }

  test("fixture outlinks resolve into the universe or the 404/off-scheme classes") {
    val uni = graft.crawl.FixtureGen.Universe(500)
    val links = Html.extractLinks(uni.pageRow(7L).html, uni.canonUrl(7L))
    assert(links.length == uni.nOutlinks(7L))
  }

  test("robots: group selection — specific UA group beats *") {
    val rules = Robots.parse(
      """User-agent: *
        |Disallow: /
        |User-agent: crawlerspark
        |Disallow: /private
        |Allow: /private/ok""".stripMargin)
    assert(Robots.allows(rules, "crawlerspark", "/anything"))
    assert(!Robots.allows(rules, "crawlerspark", "/private/x"))
    assert(Robots.allows(rules, "crawlerspark", "/private/ok"))
    assert(!Robots.allows(rules, "otherbot", "/anything"))
  }

  test("robots: longest match wins; tie → allow; empty rules → allow") {
    val rules = Robots.parse("User-agent: *\nDisallow: /a\nAllow: /a/b")
    assert(!Robots.allows(rules, "x", "/a/c"))
    assert(Robots.allows(rules, "x", "/a/b/c"))
    assert(Robots.allows(Array.empty[RobotRule], "x", "/a"))
  }

  test("robots: wildcards and $ anchor") {
    val rules = Robots.parse("User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*x")
    assert(!Robots.allows(rules, "x", "/doc/file.pdf"))
    assert(Robots.allows(rules, "x", "/doc/file.pdfx"))
    assert(!Robots.allows(rules, "x", "/tmp123x"))
  }

  test("robots: pathological star patterns complete in milliseconds") {
    // exponential-backtracking killer: many stars, near-matching long path
    val rules = Robots.parse("User-agent: *\nDisallow: /*a*a*a*a*a*a*a*a*a*a$")
    val path = "/" + ("ab" * 2000) + "c" // forces full backtracking search
    val t0 = System.nanoTime()
    val verdict = Robots.allows(rules, "x", path)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(verdict, "path does not end in 'a' so the anchored pattern must not match")
    assert(ms < 200.0, s"pathological robots match took $ms ms — backtracking blowup")
    // and the stars still match correctly
    assert(!Robots.allows(rules, "x", "/" + ("xa" * 10)))
    assert(!Robots.allows(Robots.parse("User-agent: *\nDisallow: /*mid*end"), "x", "/a/mid/b/end/c"))
  }

  test("robots: missing/empty body allows everything") {
    assert(Robots.allows(Robots.parse(""), "x", "/"))
    assert(Robots.allows(Robots.parse("User-agent: *\nDisallow:"), "x", "/any"))
  }
}
