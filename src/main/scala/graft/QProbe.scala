package graft

/**
 * Diagnostic: time individual SparkEntry queries (noop sink, same
 * evaluation discipline as [[Bench]]) without paying for the full bench.
 *
 * Usage: `sbt "runMain graft.QProbe <sfDir> <queryName>..."`; repeats each
 * query `GRAFT_PROBE_ITERS` times (default 1).
 */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q26_ngram_jaccard")
    val iters = sys.env.getOrElse("GRAFT_PROBE_ITERS", "1").toInt
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val explain = sys.env.get("GRAFT_PROBE_EXPLAIN").contains("1")
    for (name <- names; i <- 1 to iters) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (explain && i == 1) { println(s"[qprobe] ==== $name plan ===="); df.explain("formatted") }
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[qprobe] $name#$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
