package graft.crawl

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.html.Html
import graft.urls.UrlCanon

/**
 * Deterministic synthetic web corpus (FIXTURES.md §F1–F2). Seed discipline:
 * everything derives from splitmix64 chains off page/host ids — no wall
 * clock, no Random. The corpus ships its own oracles: `text` is the frozen
 * extractor (§F3) applied to `html`, and each page's canonical URL is a pure
 * function of its id, so golden tests can recompute expectations exactly.
 *
 * Zipf(s=1.2) host assignment produces the hot-host head that exercises
 * skew handling (AQE + salting) at bench scale.
 */
object FixtureGen {

  val Epoch: Long = 1767225600000L // 2026-01-01T00:00:00Z — fixture time base

  def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  /** uniform double in [0,1) from a hash */
  private def unit(h: Long): Double = (h >>> 11) * (1.0 / (1L << 53))

  private val tlds = Array(".com", ".org", ".net", ".io", ".dev")
  private val lexicon: Array[String] = {
    // 256 deterministic pronounceable words
    val cons = "btdkmnprsvz"; val vow = "aeiou"
    (0 until 256).map { i =>
      val h = splitmix64(0xCAFEL + i)
      val len = 2 + (h & 1).toInt
      val sb = new StringBuilder
      var x = h
      for (_ <- 0 until len) {
        sb.append(cons.charAt(((x >>> 7) % cons.length).abs.toInt))
        sb.append(vow.charAt(((x >>> 17) % vow.length).abs.toInt))
        x = splitmix64(x)
      }
      sb.toString
    }.toArray
  }

  /** `textScale` multiplies the per-page sentence count: 1 ≈ 1 KB toy pages
    * (unit/golden tests), 64 ≈ 10–25 KB — the Common-Crawl-realistic weight
    * the bench uses so parse compute, not per-round scheduling, is what the
    * throughput metric measures. Link structure is identical at any scale. */
  final case class Universe(nPages: Long, seed: Long = 42L, textScale: Int = 1) {
    val nHosts: Int = math.max(16, (nPages / 64).toInt)

    /** Zipf(s=1.2) cumulative distribution over hosts. */
    private val zipfCdf: Array[Double] = {
      val w = (1 to nHosts).map(r => 1.0 / math.pow(r, 1.2)).toArray
      val total = w.sum
      val cdf = new Array[Double](nHosts)
      var acc = 0.0
      var i = 0
      while (i < nHosts) { acc += w(i) / total; cdf(i) = acc; i += 1 }
      cdf(nHosts - 1) = 1.0
      cdf
    }

    def host(i: Int): String = "www.h" + i + tlds((splitmix64(seed ^ i) >>> 3).toInt.abs % tlds.length)

    def hostOfPage(p: Long): Int = {
      val u = unit(splitmix64(seed ^ (p * 0x9E37L + 1)))
      val idx = java.util.Arrays.binarySearch(zipfCdf, u)
      if (idx >= 0) idx else math.min(nHosts - 1, -idx - 1)
    }

    /** Canonical URL of page p — THE identity the whole engine agrees on. */
    def canonUrl(p: Long): String = {
      val h = host(hostOfPage(p))
      val d = 1 + (splitmix64(seed ^ (p * 31 + 2)) & 3L).toInt // 1..4 segments
      val segs = (0 until d).map { s =>
        lexicon((splitmix64(seed ^ (p * 131 + s)) & 255L).toInt)
      }
      val base = s"https://$h/${segs.mkString("/")}/p$p"
      val hasQuery = unit(splitmix64(seed ^ (p * 7 + 3))) < 0.10
      if (hasQuery) base + s"?id=$p" else base
    }

    /** A non-canonical variant that collapses to canonUrl(p) under
      * canonicalization — exercises the §F1.1 equivalence classes. */
    def variantUrl(p: Long, which: Int): String = {
      val c = canonUrl(p)
      val schemeEnd = c.indexOf("://") + 3
      val pathStart = c.indexOf('/', schemeEnd)
      val hostPart = c.substring(schemeEnd, pathStart)
      val rest = c.substring(pathStart)
      which % 5 match {
        case 0 => c
        case 1 => "https://" + hostPart.toUpperCase(java.util.Locale.ROOT) + rest
        case 2 => "https://" + hostPart + ":443" + rest
        case 3 => // insert a no-op dot-segment after the first path segment
          val slash2 = rest.indexOf('/', 1)
          if (slash2 < 0) c else "https://" + hostPart + rest.substring(0, slash2) + "/./" + rest.substring(slash2 + 1)
        case 4 => c + "#frag" + (p % 7)
      }
    }

    /** Raw stored url of page p: ~8% are non-canonical variants. */
    def rawUrl(p: Long): String = {
      val r = splitmix64(seed ^ (p * 13 + 4))
      if (unit(r) < 0.08) variantUrl(p, 1 + (r & 3L).toInt) else canonUrl(p)
    }

    def lang(p: Long): String = {
      val u = unit(splitmix64(seed ^ (p * 17 + 5)))
      if (u < 0.60) "en" else if (u < 0.70) "de" else if (u < 0.80) "zh"
      else if (u < 0.90) "fr" else "es"
    }

    def nOutlinks(p: Long): Int = 3 + (splitmix64(seed ^ (p * 19 + 6)) & 7L).toInt

    /** The j-th outlink href of page p, in the form it appears in the HTML. */
    def outlink(p: Long, j: Int): String = {
      val h = splitmix64(seed ^ (p * 1009 + j * 101 + 7))
      val u = unit(h)
      if (u < 0.70) {
        // in-universe target, possibly as a variant or page-relative form
        val q = (splitmix64(h) >>> 1) % nPages
        val form = (h & 7L).toInt
        if (form <= 4) variantUrl(q, form)
        else {
          // relative form only when same host, else absolute canonical
          if (hostOfPage(q) == hostOfPage(p)) {
            val c = canonUrl(q)
            c.substring(c.indexOf('/', c.indexOf("://") + 3)) // absolute path form
          } else canonUrl(q)
        }
      } else if (u < 0.90) {
        // never-materialized url on a real host (the 404 path)
        s"https://${host(hostOfPage(p))}/missing/m${h >>> 40}"
      } else if (u < 0.95) "mailto:nobody@example.invalid"
      else "javascript:void(0)"
    }

    def sentence(p: Long, k: Int): String = {
      val n = 4 + (splitmix64(seed ^ (p * 53 + k)) & 7L).toInt
      (0 until n).map(i => lexicon((splitmix64(seed ^ (p * 511 + k * 37 + i)) & 255L).toInt))
        .mkString(" ").capitalize + "."
    }

    def html(p: Long): String = {
      val nS = (2 + (splitmix64(seed ^ (p * 29 + 8)) & 3L).toInt) * textScale
      val paras = (0 until nS).map(k => sentence(p, k)).mkString(" ")
      val links = (0 until nOutlinks(p)).map { j =>
        s"""<li><a href="${escapeAttr(outlink(p, j))}">anchor $j</a></li>"""
      }.mkString("\n")
      s"""<html><head><title>T$p</title><style>s{}</style>
<script>var x=$p;</script></head>
<body><h1>Page $p &amp; friends</h1>
<p>$paras</p>
<ul>$links</ul>
<!-- noise $p --></body></html>"""
    }

    private def escapeAttr(s: String): String = s.replace("&", "&amp;")

    def pageRow(p: Long): PageRow = {
      val h = html(p)
      PageRow(rawUrl(p), new Timestamp(Epoch + p * 1000L),
        h.getBytes(StandardCharsets.UTF_8), Html.extractTextStr(h), lang(p))
    }

    /** ~2% of pages get a second, later version (exercises as-of, op 29). */
    def hasSecondVersion(p: Long): Boolean =
      unit(splitmix64(seed ^ (p * 37 + 9))) < 0.02

    def pageRowV2(p: Long): PageRow = {
      val h = html(p).replace("</body>", s"<p>Updated rev for $p.</p></body>")
      PageRow(rawUrl(p), new Timestamp(Epoch + p * 1000L + 86400000L),
        h.getBytes(StandardCharsets.UTF_8), Html.extractTextStr(h), lang(p))
    }

    def robotsBody(hostIdx: Int): Option[String] = {
      val u = unit(splitmix64(seed ^ (hostIdx * 997 + 11)))
      if (u < 0.80) Some("User-agent: *\nDisallow:")
      else if (u < 0.90) {
        val seg = lexicon((splitmix64(seed ^ (hostIdx * 5 + 12)) & 255L).toInt)
        Some(s"User-agent: *\nDisallow: /$seg\nUser-agent: crawlerspark\nDisallow: /$seg")
      }
      else if (u < 0.95) Some("User-agent: *\nDisallow: /")
      else None // missing robots.txt → allow (RFC 9309)
    }

    def seeds(n: Int): Seq[String] = {
      // 2 per hottest hosts, mixed canonical-variant forms
      (0 until n).map { i =>
        // pick pages living on the hot head deterministically
        var p = splitmix64(seed ^ (0xBEEFL + i)).abs % nPages
        var tries = 0
        while (hostOfPage(p) > math.max(4, nHosts / 8) && tries < 64) {
          p = splitmix64(p + tries).abs % nPages; tries += 1
        }
        variantUrl(p, i % 5)
      }
    }
  }

  /** Materialize pages + robots + seeds under `dir`; bucket-shaped layout:
    * hash-repartitioned by canonical host and sorted by host_rev within
    * partitions, html as the last column (column pruning, SURVEY §4.1). */
  def write(spark: SparkSession, dir: String, nPages: Long, nSeeds: Int,
            numPartitions: Int = 32, textScale: Int = 1): Universe = {
    import spark.implicits._
    val u = Universe(nPages, textScale = textScale)
    val pages: Dataset[PageRow] = spark.range(nPages).map { p =>
      u.pageRow(p)
    }
    val v2 = spark.range(nPages).filter(p => u.hasSecondVersion(p)).map(p => u.pageRowV2(p))
    import org.apache.spark.sql.functions._
    import graft.functions.UrlExpressions.{canonicalize_url, host_rev, url_host}
    pages.unionByName(v2).toDF()
      .withColumn("__host", url_host(col("url")))
      .repartition(numPartitions, pmod(xxhash64(col("__host")), lit(numPartitions)))
      .sortWithinPartitions(host_rev(col("__host")))
      .drop("__host")
      .select("url", "warc_ts", "text", "lang", "html") // html last
      .write.mode("overwrite").parquet(s"$dir/pages.parquet")

    val robots = (0 until u.nHosts).flatMap(i => u.robotsBody(i).map(b => (u.host(i), b)))
    robots.toDF("host", "robots_body").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/robots.parquet")

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/seeds.txt"),
      u.seeds(nSeeds).mkString("\n").getBytes(StandardCharsets.UTF_8))
    u
  }
}
