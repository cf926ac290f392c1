package graft.crawl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CrawlUdfs
import graft.sketch.{SeenFilter, SketchAgg}

/**
 * The batch-iterative crawl driver (SURVEY.md op 50): a plain Scala loop —
 * each round is one job DAG over snapshot tables; no streaming runtime.
 * Resume (op 51) is "read the latest manifest and keep going": a fresh JVM
 * reconstructs everything from the catalog directory, which is the whole
 * point of making the queue a table.
 */
object Crawl {

  /** One-time setup: canonicalize+dedup the corpus, parse robots, seed the
    * frontier and the seen state, commit as round -0 (manifest 0 = bootstrap,
    * fetch rounds start at 1). */
  def bootstrap(
      spark: SparkSession,
      catalog: StateCatalog,
      pagesRaw: DataFrame,
      robotsRaw: DataFrame, // (host, robots_body)
      seeds: Seq[String],
      cfg: CrawlConfig): Unit = {
    import spark.implicits._

    val pagesCanon = CrawlRound.canonicalizePages(pagesRaw)
      // bucket by canon_url hash — the fetch join's key and the same
      // pmod(xxhash64(canon_url), P) math as the url_seen state tables, so
      // corpus, frontier and seen-state co-partition (SPJ story) AND page
      // payloads spread uniformly. (Bucketing by HOST would funnel the
      // Zipf-hot host's pages into one partition: the fetch join broadcasts
      // the small candidate side, parse inherits the corpus partitioning,
      // and the hot partition becomes the stage's critical path at any
      // core count — measured as flat 8→32 scaling.)
      .repartition(cfg.numPartitions,
        CrawlRound.partitionIdOf(col("canon_url"), cfg.numPartitions))

    val robotsRules = robotsRaw
      .withColumn("rules", CrawlUdfs.robots_parse(col("robots_body")))
      .select("host", "rules")

    val frontier0 = CrawlRound.seedFrontier(spark, seeds)
    val seenExact0 = frontier0.select("canon_url")

    val sketch0 = buildSketchDelta(spark, seenExact0, cfg)

    catalog.commit(0, Map(
      "pages_canon" -> pagesCanon,
      "robots_rules" -> robotsRules,
      "frontier" -> frontier0,
      "url_seen_exact" -> seenExact0,
      "url_seen" -> sketch0,
      "fetch_log" -> emptyFetchLog(spark)),
      Map("total_fetched" -> 0L, "enqueued" -> frontier0.count()))
  }

  private def emptyFetchLog(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.fetchLog)

  /** Per-partition sketch rows for a batch of new canon_urls. */
  def buildSketchDelta(spark: SparkSession, newKeys: DataFrame, cfg: CrawlConfig): DataFrame = {
    val bits = math.max(64L,
      math.ceil(-cfg.bloomExpectedPerPartition * math.log(cfg.bloomFpp) / (math.log(2) * math.log(2))).toLong)
      .min(Int.MaxValue.toLong - 64).toInt
    val k = math.max(1, math.round(bits.toDouble / cfg.bloomExpectedPerPartition * math.log(2)).toInt)
    val keyed = newKeys
      .withColumn("partition_id", CrawlRound.partitionIdOf(col("canon_url"), cfg.numPartitions))
      .withColumn("key", xxhash64(col("canon_url")))
    val agg =
      if (cfg.filterKind == "cuckoo")
        SketchAgg.cuckooBuild(cfg.bloomExpectedPerPartition)(col("key"))
      else
        SketchAgg.bloomBuild(bits, k)(col("key"))
    keyed.groupBy(col("partition_id"))
      .agg(agg.as("sketch"), count(lit(1)).as("n_items"))
      .withColumn("kind", lit(cfg.filterKind))
      .select("partition_id", "kind", "sketch", "n_items")
  }

  /** Merge previous sketch state with a delta — fully distributed, one
    * sketch-row per partition flows through the shuffle. */
  def mergeSketches(prev: DataFrame, delta: DataFrame): DataFrame = {
    prev.unionByName(delta)
      .groupBy(col("partition_id"), col("kind"))
      .agg(SketchAgg.sketchMerge(col("sketch")).as("sketch"), sum(col("n_items")).as("n_items"))
      .select("partition_id", "kind", "sketch", "n_items")
  }

  /** Collect the P sketch rows into the driver-side map used by the round's
    * membership UDF. P is small (32 here, ≤2^15 at the design point); at the
    * extreme, broadcast only the buckets a stage touches (SURVEY §4.3). */
  def loadSketches(spark: SparkSession, catalog: StateCatalog): Map[Int, SeenFilter] = {
    catalog.load(spark, "url_seen") match {
      case None => Map.empty
      case Some(df) => df.select("partition_id", "sketch").collect()
        .map(r => r.getInt(0) -> SeenFilter.deserialize(r.getAs[Array[Byte]](1))).toMap
    }
  }

  /** Run rounds `from..until` (inclusive), committing each. Returns per-round
    * results. Stops early when the frontier drains. */
  def runRounds(
      spark: SparkSession,
      catalog: StateCatalog,
      cfg: CrawlConfig,
      maxRounds: Int): Seq[CrawlRound.RoundResult] = {
    val startRound = catalog.latestRound.getOrElse(
      throw new IllegalStateException("catalog not bootstrapped")) + 1
    val pagesCanon = catalog.load(spark, "pages_canon").get
    val robotsRules = catalog.load(spark, "robots_rules").get
    val results = scala.collection.mutable.ArrayBuffer[CrawlRound.RoundResult]()

    var round = startRound
    var continue = true
    while (continue && round < startRound + maxRounds) {
      val tRound = System.nanoTime()
      def phase[T](name: String, t0: Long)(f: => T): (T, Long) = {
        val r = f; val t1 = System.nanoTime()
        if (sys.env.contains("GRAFT_CRAWL_TIMING"))
          System.err.println(f"[crawl] r$round $name ${(t1 - t0) / 1e9}%.2fs")
        (r, t1)
      }
      val frontier = catalog.load(spark, "frontier").get
      if (frontier.isEmpty) { continue = false }
      else {
        val (_, tLoad) = phase("load+isEmpty", tRound)(())
        val seenExact = catalog.load(spark, "url_seen_exact").get
        val (sketches, tSk) = phase("loadSketches", tLoad)(loadSketches(spark, catalog))
        val base = catalog.metricsOf(round - 1).getOrElse("total_fetched",
          (0 until round).map(r => catalog.metricsOf(r).getOrElse("fetched", 0L)).sum)
        val out = CrawlRound.run(spark, frontier, seenExact, sketches, pagesCanon, robotsRules,
          cfg, round, base)
        val sketchNext = catalog.load(spark, "url_seen") match {
          case Some(prev) => mergeSketches(prev, buildSketchDelta(spark, out.newKeys, cfg))
          case None => buildSketchDelta(spark, out.newKeys, cfg)
        }
        out.frontierNext.persist() // backs both the table write and the lineage agg
        val lineage = out.frontierNext
          .withColumn("partition_id", CrawlRound.partitionIdOf(col("canon_url"), cfg.numPartitions))
          .groupBy("partition_id").agg(count(lit(1)).as("frontier_rows"))
          .withColumn("round", lit(round))
        // metric aggregates run CONCURRENTLY with the (parallel) commit
        // writes — independent job DAGs over the same persisted frames; the
        // manifest (which embeds the metrics) still lands strictly after
        // both, so atomicity and resume semantics are unchanged. The round's
        // serial critical path shrinks to rank + max(writes, metrics).
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: scala.concurrent.ExecutionContext = StateCatalog.commitEc
        val resF = Future(CrawlRound.result(out))
        val (res, tCommit) = phase("commit+metrics", tSk) {
          catalog.commit(round, Map(
            "fetch_log" -> out.fetchLog,
            "frontier" -> out.frontierNext,
            "url_seen_exact" -> out.seenExactNext,
            "url_seen" -> sketchNext,
            "lineage" -> lineage), {
            val r = Await.result(resF, Duration.Inf)
            Map(
              "total_fetched" -> (base + r.fetched),
              "fetched" -> r.fetched,
              "discovered" -> r.discovered,
              "enqueued" -> r.enqueued,
              "robots_denied" -> r.robotsDenied,
              "deduped_bloom_definite" -> r.dedupedBloomDefinite,
              "deduped_exact" -> r.dedupedExact,
              "text_mismatches" -> r.textMismatches)
          })
          Await.result(resF, Duration.Inf)
        }
        if (sys.env.contains("GRAFT_CRAWL_TIMING"))
          System.err.println(f"[crawl] r$round TOTAL ${(tCommit - tRound) / 1e9}%.2fs fetched=${res.fetched} discovered=${res.discovered}")
        (out.persisted :+ out.frontierNext).foreach(_.unpersist())
        results += res
        if (res.fetched == 0L) continue = false
      }
      round += 1
    }
    results.toSeq
  }

  /** Union of all committed fetch_log rounds 1..latest. */
  def fullFetchLog(spark: SparkSession, catalog: StateCatalog): DataFrame = {
    val latest = catalog.latestRound.getOrElse(return emptyFetchLog(spark))
    (0 to latest).flatMap(r =>
      if (r == 0) None
      else catalog.load(spark, "fetch_log", Some(r)).filter(_ => true))
      .reduceOption(_ unionByName _)
      .getOrElse(emptyFetchLog(spark))
  }
}
