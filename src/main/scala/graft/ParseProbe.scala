package graft

import org.apache.spark.sql.functions._

import graft.functions.CrawlUdfs

/**
 * Diagnostic: RAW parse compute scaling (extract_links + extract_text over
 * a FixtureGen corpus) at local[8] vs local[32] — isolates the crawl's
 * dominant per-row compute from its round structure (shuffles, commit
 * concurrency, rank passes).
 *
 * Measured on the sandbox host (480k-page corpus, textScale=128):
 * local[8] 98.8s → local[32] 33.7s = 2.93x from 4x cores (efficiency
 * 0.73). This bounds what ANY round structure can achieve here and shows
 * the gap to the 0.8 gate is round-structure fixed costs + host noise,
 * not the parser.
 *
 * Usage: `sbt "runMain graft.ParseProbe [corpusDir]"` (corpus from
 * ScalingBench's cached tmpfs dir).
 */
object ParseProbe {
  def main(args: Array[String]): Unit = {
    val corpus = args.headOption.getOrElse("/dev/shm/graft_corpus_240000_128_32")
    Seq(8, 32).foreach { cpus =>
      val s = Bench.session(cpus, shufflePartitions = 32)
      val pages = s.read.parquet(s"$corpus/pages.parquet")
      // JIT/codegen warmup outside the timed window
      pages.limit(2000).select(CrawlUdfs.extract_text(col("html")))
        .write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      pages.select(
          size(CrawlUdfs.extract_links(col("html"), col("url"))).as("n"),
          length(CrawlUdfs.extract_text(col("html"))).as("l"))
        .agg(sum("n"), sum("l")).write.format("noop").mode("overwrite").save()
      println(f"[parseprobe] local[$cpus] ${(System.nanoTime() - t0) / 1e9}%.2fs")
      s.stop()
    }
  }
}
