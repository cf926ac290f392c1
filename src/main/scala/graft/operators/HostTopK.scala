package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Bounded per-host top-k (SURVEY.md ops 47+49): the host-budget stage as a
 * size-k priority-queue AGGREGATE instead of a rank window.
 *
 * Why this is the 10^10 shape:
 *   - a `row_number().over(partitionBy(host))` window sorts EVERY candidate
 *     of a host inside one task — the Zipf-hot host (30%+ of a real
 *     frontier) serializes its whole candidate set through one partition,
 *     which measured as the flat-scaling straggler;
 *   - the aggregator's map-side partial aggregation caps every mapper's
 *     output at k rows per host, so the hot host's reduce-side input is
 *     (mapPartitions × k), not its full candidate count — partial
 *     aggregation IS the salting (op 47), with no explicit salt column and
 *     per-host determinism preserved;
 *   - per-host memory is bounded by k everywhere (op 49's guard) instead of
 *     by the hot host's frontier share.
 *
 * Ordering/determinism: candidates compare by (depth, discovery_round,
 * canon_url) — a total order (canon_url unique within a batch after
 * first-discovery dedup), so the surviving set and the emitted host_rank
 * are independent of partitioning and merge order.
 */
object HostTopK {

  /** The candidate payload carried through the budget PQ. */
  final case class Cand(
      canon_url: String,
      raw_url: String,
      host_rev: String,
      depth: Int,
      discovery_round: Int,
      src_url: String)

  implicit val candOrd: Ordering[Cand] =
    Ordering.by((c: Cand) => (c.depth, c.discovery_round, c.canon_url))

  // binary max-heap helpers over a plain ArrayBuffer (root = worst kept
  // candidate) — no closure state in the buffer, so kryo round-trips it
  private def siftUp(h: scala.collection.mutable.ArrayBuffer[Cand], i0: Int): Unit = {
    var i = i0
    while (i > 0 && candOrd.gt(h(i), h((i - 1) / 2))) {
      val p = (i - 1) / 2
      val t = h(i); h(i) = h(p); h(p) = t
      i = p
    }
  }
  private def siftDown(h: scala.collection.mutable.ArrayBuffer[Cand]): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < h.length && candOrd.gt(h(l), h(m))) m = l
      if (r < h.length && candOrd.gt(h(r), h(m))) m = r
      if (m == i) done = true
      else { val t = h(i); h(i) = h(m); h(m) = t; i = m }
    }
  }

  /** Size-k bounded PQ aggregator: keeps the k SMALLEST candidates by
    * [[candOrd]] in a binary max-heap (root = current worst). */
  final class TopKAgg(k: Int)
      extends Aggregator[Cand, scala.collection.mutable.ArrayBuffer[Cand], Array[Cand]] {
    override def zero: scala.collection.mutable.ArrayBuffer[Cand] =
      scala.collection.mutable.ArrayBuffer.empty[Cand]

    override def reduce(
        h: scala.collection.mutable.ArrayBuffer[Cand],
        c: Cand): scala.collection.mutable.ArrayBuffer[Cand] = {
      if (h.length < k) { h += c; siftUp(h, h.length - 1) }
      else if (candOrd.lt(c, h(0))) { h(0) = c; siftDown(h) }
      h
    }

    override def merge(
        a: scala.collection.mutable.ArrayBuffer[Cand],
        b: scala.collection.mutable.ArrayBuffer[Cand]): scala.collection.mutable.ArrayBuffer[Cand] = {
      b.foreach(c => reduce(a, c))
      a
    }

    override def finish(h: scala.collection.mutable.ArrayBuffer[Cand]): Array[Cand] =
      h.sorted(candOrd).toArray // best-first

    override def bufferEncoder: Encoder[scala.collection.mutable.ArrayBuffer[Cand]] =
      Encoders.kryo[scala.collection.mutable.ArrayBuffer[Cand]]
    override def outputEncoder: Encoder[Array[Cand]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Cand]]()
  }

  /**
   * frontier-shaped input (canon_url, raw_url, host, host_rev, depth,
   * discovery_round, src_url) → same columns + host_rank (1-based priority
   * rank within host), at most k rows per host. Output is hash-partitioned
   * by host (the aggregation key) — downstream host-clustered stages can
   * reuse the partitioning without another exchange.
   */
  def hostTopK(df: DataFrame, k: Int): DataFrame = {
    val agg = udaf(new TopKAgg(k))
    df.groupBy(col("host"))
      // a udaf over a case-class input takes the FIELDS as arguments
      .agg(agg(col("canon_url"), col("raw_url"), col("host_rev"),
        col("depth"), col("discovery_round"), col("src_url")).as("top"))
      .select(col("host"), posexplode(col("top")).as(Seq("pos", "c")))
      .select(col("c.canon_url").as("canon_url"), col("c.raw_url").as("raw_url"),
        col("host"), col("c.host_rev").as("host_rev"), col("c.depth").as("depth"),
        col("c.discovery_round").as("discovery_round"), col("c.src_url").as("src_url"),
        (col("pos") + 1).cast("int").as("host_rank"))
  }
}
