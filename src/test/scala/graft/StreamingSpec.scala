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
