package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.urls.UrlCanon

class UrlCanonSpec extends AnyFunSuite {

  /** scalatestplus isn't in the offline cache — drive ScalaCheck directly. */
  private def checkProp(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("RFC 3986 §6.2.2 case normalization") {
    assert(UrlCanon.canonicalize("HTTP://WWW.Example.COM/Path") ==
      "http://www.example.com/Path")
  }

  test("§6.2.3 default port dropped, non-default kept") {
    assert(UrlCanon.canonicalize("http://a.com:80/x") == "http://a.com/x")
    assert(UrlCanon.canonicalize("https://a.com:443/x") == "https://a.com/x")
    assert(UrlCanon.canonicalize("http://a.com:8080/x") == "http://a.com:8080/x")
  }

  test("§6.2.3 empty path becomes /") {
    assert(UrlCanon.canonicalize("http://a.com") == "http://a.com/")
    assert(UrlCanon.canonicalize("http://a.com?q=1") == "http://a.com/?q=1")
  }

  test("fragment stripped; bare ? dropped") {
    assert(UrlCanon.canonicalize("http://a.com/x#frag") == "http://a.com/x")
    assert(UrlCanon.canonicalize("http://a.com/x?") == "http://a.com/x")
  }

  test("§5.2.4 dot segments removed") {
    assert(UrlCanon.canonicalize("http://a.com/b/./c/../d") == "http://a.com/b/d")
    assert(UrlCanon.canonicalize("http://a.com/../x") == "http://a.com/x")
  }

  test("§6.2.2.2 percent-encoding: unreserved decoded, others uppercased") {
    assert(UrlCanon.canonicalize("http://a.com/%7Euser") == "http://a.com/~user")
    assert(UrlCanon.canonicalize("http://a.com/a%2fb") == "http://a.com/a%2Fb")
    assert(UrlCanon.canonicalize("http://a.com/%41%2D") == "http://a.com/A-")
  }

  test("non-http schemes: scheme lowercased only") {
    assert(UrlCanon.canonicalize("MAILTO:Bob@Example.com") == "mailto:Bob@Example.com")
  }

  test("userinfo and ipv6 survive") {
    assert(UrlCanon.canonicalize("http://u:p@A.com/x") == "http://u:p@a.com/x")
    assert(UrlCanon.canonicalize("http://[2001:DB8::1]:80/x") == "http://[2001:db8::1]/x")
  }

  test("hostRev") {
    assert(UrlCanon.hostRev("www.example.com") == "com.example.www")
    assert(UrlCanon.hostRev("localhost") == "localhost")
  }

  test("hostOf") {
    assert(UrlCanon.hostOf("HTTPS://WWW.A.com:443/x?y#z") == "www.a.com")
  }

  test("resolve: RFC 3986 §5.4 reference cases") {
    val base = "http://a/b/c/d;p?q"
    assert(UrlCanon.resolve(base, "g") == "http://a/b/c/g")
    assert(UrlCanon.resolve(base, "./g") == "http://a/b/c/g")
    assert(UrlCanon.resolve(base, "/g") == "http://a/g")
    assert(UrlCanon.resolve(base, "//g") == "http://g")
    assert(UrlCanon.resolve(base, "?y") == "http://a/b/c/d;p?y")
    assert(UrlCanon.resolve(base, "../g") == "http://a/b/g")
    assert(UrlCanon.resolve(base, "../../g") == "http://a/g")
    assert(UrlCanon.resolve(base, "g:h") == "g:h")
    assert(UrlCanon.resolve(base, "#s") == null)
  }

  // ---- properties ----

  private val hostGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString take 12)
  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTP", "Https")
    host <- hostGen
    tld <- Gen.oneOf("com", "org", "io")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    segs <- Gen.listOfN(3, Gen.alphaNumStr.map(_.take(5)))
    frag <- Gen.oneOf("", "#x", "#frag")
    q <- Gen.oneOf("", "?a=1", "?")
  } yield s"$scheme://$host.$tld$port/${segs.mkString("/")}$q$frag"

  test("property: canonicalize is idempotent") {
    checkProp(Prop.forAll(urlGen) { u =>
      val once = UrlCanon.canonicalize(u)
      UrlCanon.canonicalize(once) == once
    })
  }

  test("property: fixture variants collapse to the canonical form") {
    val uni = graft.crawl.FixtureGen.Universe(1000)
    (0L until 1000L).foreach { p =>
      val c = uni.canonUrl(p)
      assert(UrlCanon.canonicalize(c) == c, s"canonical url not a fixpoint: $c")
      (0 to 4).foreach { v =>
        assert(UrlCanon.canonicalize(uni.variantUrl(p, v)) == c,
          s"variant $v of page $p: ${uni.variantUrl(p, v)}")
      }
    }
  }
}
