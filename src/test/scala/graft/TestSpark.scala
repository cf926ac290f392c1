package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM (suites are forked into
  * one JVM by sbt; a session per suite would thrash). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      // match the main session builders (see Bench.session): tests must
      // exercise the same optimizer configuration the harness runs
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
