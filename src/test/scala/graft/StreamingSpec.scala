package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingFrontier
import graft.streaming.StreamingFrontier.StreamLink

/** Structured-Streaming frontier (SURVEY op 52): watermarked dedup, tumbling
  * round windows, keyed host-budget state — driven by MemoryStream batches
  * with processAllAvailable barriers. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val T0 = 1767225600000L // 2026-01-01T00:00:00Z
  private def link(u: String, h: String, d: Int, offsetMin: Long) =
    StreamLink(u, h, d, new Timestamp(T0 + offsetMin * 60000L))

  test("streaming dedup: same canon_url within watermark emits once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamLink]
    val q = StreamingFrontier.dedupedLinks(in.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(link("u1", "h1", 0, 0), link("u2", "h1", 1, 1), link("u1", "h1", 2, 2))
      q.processAllAvailable()
      in.addData(link("u2", "h2", 3, 3), link("u3", "h2", 0, 4))
      q.processAllAvailable()
      val urls = spark.table("dedup_out").select("canon_url").as[String].collect().sorted
      assert(urls.toSeq == Seq("u1", "u2", "u3"))
    } finally q.stop()
  }

  test("tumbling rounds: window seals when watermark passes; late row rolls forward") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamLink]
    val q = StreamingFrontier.hostRoundCounts(in.toDF(), roundLen = "10 minutes",
        watermark = "5 minutes")
      .writeStream.format("memory").queryName("rounds_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // round 1 = [00:00, 00:10); push watermark past 00:15 with a late-round row
      in.addData(link("u1", "h1", 0, 1), link("u2", "h1", 1, 4), link("u3", "h2", 2, 6))
      q.processAllAvailable()
      in.addData(link("u9", "h1", 0, 21)) // event at 00:21 → watermark 00:16 seals round 1
      q.processAllAvailable()
      val sealedRounds = spark.table("rounds_out")
        .select("host", "n_discovered", "min_depth")
        .as[(String, Long, Int)].collect().toSet
      assert(sealedRounds == Set(("h1", 2L, 0), ("h2", 1L, 2)), s"got $sealedRounds")
    } finally q.stop()
  }

  test("streaming frontier ≡ batch loop: accepted links equal the enqueued set per round") {
    // op 52's real contract: feeding the SAME FixtureGen web's per-round
    // discovery stream through the streaming dedup must accept exactly the
    // links the batch loop enqueued each round — first-ever occurrence wins
    // in both engines, earlier rounds' emissions guard later rounds'.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.crawl._
    val uni = FixtureGen.Universe(400)
    val pages = spark.range(400).map(p => uni.pageRow(p)).toDF()
    val robots = (0 until uni.nHosts).flatMap(i => uni.robotsBody(i).map(b => (uni.host(i), b)))
      .toDF("host", "robots_body")
    val cfg = CrawlConfig(numPartitions = 8, hostBudget = 16, roundBudget = 2048,
      bloomExpectedPerPartition = 4096)
    val dir = java.nio.file.Files.createTempDirectory("streamparity").toString
    val catalog = new HadoopSnapshotCatalog(dir)
    Crawl.bootstrap(spark, catalog, pages, robots, uni.seeds(8), cfg)
    Crawl.runRounds(spark, catalog, cfg, 3)
    val latest = catalog.latestRound.get

    // batch truth: enqueued_r = the url_seen_exact append delta of round r
    def seenAt(r: Int): Set[String] = catalog.load(spark, "url_seen_exact", Some(r)).get
      .select("canon_url").as[String].collect().toSet
    val enqueuedByRound = (1 to latest).map(r => r -> (seenAt(r) -- seenAt(r - 1))).toMap

    // the raw per-round discovery stream, reconstructed from committed state:
    // round r's fetched pages × corpus html → parse → canonicalize → scheme
    // filter (the same parser and canonicalizer the loop runs)
    val pagesCanon = catalog.load(spark, "pages_canon").get
    def discoveredLinks(r: Int): Seq[StreamLink] = {
      val fetched = catalog.load(spark, "fetch_log", Some(r)).get
        .filter(col("round") === r && col("status") === 200).select("canon_url")
      fetched.join(pagesCanon, Seq("canon_url"))
        .select(explode(graft.functions.CrawlUdfs.parse_page(col("html"), col("canon_url"))
          .getField("links")).as("raw_url"))
        .select(graft.functions.UrlExpressions.canonicalize_url(col("raw_url")).as("canon_url"))
        .filter(col("canon_url").startsWith("http://") || col("canon_url").startsWith("https://"))
        .select(col("canon_url"), graft.functions.UrlExpressions.url_host(col("canon_url")).as("host"))
        .as[(String, String)].collect().toSeq
        .map { case (u, h) => StreamLink(u, h, r, new Timestamp(T0 + r * 60000L)) }
    }
    // seeds enter the stream first — they are the round-0 seen set
    val seedLinks = catalog.load(spark, "frontier", Some(0)).get
      .select("canon_url", "host").as[(String, String)].collect().toSeq
      .map { case (u, h) => StreamLink(u, h, 0, new Timestamp(T0)) }

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamLink]
    val q = StreamingFrontier.dedupedLinks(in.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("parity_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(seedLinks: _*); q.processAllAvailable()
      (1 to latest).foreach { r =>
        val links = discoveredLinks(r)
        if (links.nonEmpty) { in.addData(links: _*); q.processAllAvailable() }
      }
      val accepted = spark.table("parity_out")
        .select(col("canon_url"), col("discovery_ts")).as[(String, Timestamp)].collect()
        .groupBy { case (_, ts) => ((ts.getTime - T0) / 60000L).toInt }
        .map { case (r, xs) => r -> xs.map(_._1).toSet }
      (1 to latest).foreach { r =>
        val batch = enqueuedByRound(r)
        val stream = accepted.getOrElse(r, Set.empty[String])
        assert(stream == batch,
          s"round $r diverged: stream-only=${(stream -- batch).take(5)} " +
            s"batch-only=${(batch -- stream).take(5)}")
      }
    } finally q.stop()
  }

  test("host budget state: at most k links pass per host across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamLink]
    val q = StreamingFrontier.budgetedCandidates(in.toDS(), budget = 3)
      .writeStream.format("memory").queryName("budget_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(link("a1", "hot", 0, 0), link("a2", "hot", 0, 1))
      q.processAllAvailable()
      in.addData(link("a3", "hot", 0, 2), link("a4", "hot", 0, 3),
        link("b1", "cold", 0, 4))
      q.processAllAvailable()
      val out = spark.table("budget_out").select("canon_url", "host")
        .as[(String, String)].collect()
      assert(out.count(_._2 == "hot") == 3, s"hot host must cap at 3: ${out.toSeq}")
      assert(out.count(_._2 == "cold") == 1)
    } finally q.stop()
  }
}
