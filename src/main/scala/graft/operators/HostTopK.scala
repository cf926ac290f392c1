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
 * Budgets are PER-HOST (op 38's literal signature `k = budget(host)`): a
 * small (host → k) override map rides the aggregator's closure — the
 * production shape for politeness tiers (whitelisted partners get a larger
 * budget, abuse-listed hosts a smaller one). The map is driver-provided
 * config, tiny by construction (explicit tier entries, not one row per
 * host), so closure capture — which broadcasts it once per stage — is the
 * right delivery; a join would shuffle the candidate set against config.
 *
 * Ordering/determinism: candidates compare by (depth, discovery_round,
 * canon_url) — a total order (canon_url unique within a batch after
 * first-discovery dedup), so the surviving set and the emitted host_rank
 * are independent of partitioning and merge order.
 */
object HostTopK {

  /** The candidate payload carried through the budget PQ. `host` rides
    * along (it is also the grouping key) so the per-host budget lookup is
    * buffer-local — the aggregator never sees the grouping key otherwise. */
  final case class Cand(
      canon_url: String,
      raw_url: String,
      host: String,
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
    * [[candOrd]] in a binary max-heap (root = current worst), where
    * k = budgets(host) with `default` as the fallback. All candidates in a
    * buffer share one host (the grouping key), so the per-buffer k is
    * well-defined; merge keeps the same k because both sides carry it. */
  final class TopKAgg(default: Int, budgets: Map[String, Int])
      extends Aggregator[Cand, scala.collection.mutable.ArrayBuffer[Cand], Array[Cand]] {
    private def kOf(host: String): Int = budgets.getOrElse(host, default)

    override def zero: scala.collection.mutable.ArrayBuffer[Cand] =
      scala.collection.mutable.ArrayBuffer.empty[Cand]

    override def reduce(
        h: scala.collection.mutable.ArrayBuffer[Cand],
        c: Cand): scala.collection.mutable.ArrayBuffer[Cand] = {
      val k = kOf(c.host)
      // k ≤ 0 is a legal politeness tier ("banned host keeps nothing") —
      // without the guard the else branch reads h(0) on an empty heap
      if (k > 0) {
        if (h.length < k) { h += c; siftUp(h, h.length - 1) }
        else if (candOrd.lt(c, h(0))) { h(0) = c; siftDown(h) }
      }
      h
    }

    override def merge(
        a: scala.collection.mutable.ArrayBuffer[Cand],
        b: scala.collection.mutable.ArrayBuffer[Cand]): scala.collection.mutable.ArrayBuffer[Cand] = {
      if (a.isEmpty) b
      else { b.foreach(c => reduce(a, c)); a }
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
   * rank within host), at most `budgets.getOrElse(host, k)` rows per host.
   * Output is hash-partitioned by host (the aggregation key) — downstream
   * host-clustered stages can reuse the partitioning without another
   * exchange.
   */
  def hostTopK(df: DataFrame, k: Int, budgets: Map[String, Int] = Map.empty): DataFrame = {
    val agg = udaf(new TopKAgg(k, budgets))
    df.groupBy(col("host"))
      // a udaf over a case-class input takes the FIELDS as arguments
      .agg(agg(col("canon_url"), col("raw_url"), col("host"), col("host_rev"),
        col("depth"), col("discovery_round"), col("src_url")).as("top"))
      .select(col("host"), posexplode(col("top")).as(Seq("pos", "c")))
      .select(col("c.canon_url").as("canon_url"), col("c.raw_url").as("raw_url"),
        col("host"), col("c.host_rev").as("host_rev"), col("c.depth").as("depth"),
        col("c.discovery_round").as("discovery_round"), col("c.src_url").as("src_url"),
        (col("pos") + 1).cast("int").as("host_rank"))
  }
}
