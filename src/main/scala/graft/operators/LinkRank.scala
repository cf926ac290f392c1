package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Link-graph rank for crawl prioritization (PageRank-style, the OPIC/
 * popularity signal a production frontier feeds into op 16's priority
 * struct): `rank_{t+1}(v) = 0.15 + 0.85 · Σ_{u→v} rank_t(u)/outdeg(u)`.
 *
 * Arithmetic is FIXED-POINT INTEGER (micro-units, 1.0 = 10^6) with
 * integral division — deliberately:
 *
 *   - every per-iteration sum is a sum of LONGS, order-independent and
 *     exact, so the result is deterministic across partitionings, merge
 *     orders AND engines — the DuckDB oracle (q45) reproduces it bit-for-
 *     bit with `//`, where a float PageRank would diverge in ulps by
 *     accumulation order;
 *   - truncation loses < 1 micro-unit per (edge, iteration) — irrelevant
 *     for a priority signal consumed by top-k ordering.
 *
 * Dataflow per iteration: edges ⋈ ranks on src (both sides hash-
 * partitioned on the join key), contributions aggregated by dst (one
 * shuffle keyed by dst), left-join back onto the node set so sink nodes
 * keep receiving the teleport term. Dangling mass (nodes with no
 * out-edges) evaporates — the standard simplified variant; both engines
 * do the same, which is the property the oracle checks.
 *
 * Scale: each iteration is one join + one aggregate over the edge table —
 * the Pregel-in-SQL shape. With `persistEvery = 0` the plan UNROLLS the K
 * iterations (fine for K ≤ ~5, and what the SQL oracle mirrors); deeper
 * iteration counts pass `persistEvery ≥ 1`, which pins the iterated ranks
 * (and the loop-invariant node/outdeg frames) so plan depth stays bounded
 * and `nodes`/`outdeg` evaluate once instead of once per unrolled level —
 * the same cache-pin/retire discipline as `Crawl.runRounds`' round frames.
 */
object LinkRank {

  /** One micro-unit fixed-point "1.0". */
  val Unit1: Long = 1000000L

  /** `iters` rounds of the integer recurrence over `edges` (src, dst —
    * assumed distinct, self-loops allowed but pointless). Returns
    * (node, rank) for every node appearing as src or dst.
    *
    * `persistEvery > 0` pins `ranks` every that-many iterations (forcing
    * it, then retiring the previous pin — never more than one iteration
    * cache live beyond the frontier) plus the loop-invariant `nodes` /
    * `outdeg` frames for the loop's duration. The RETURNED frame is then
    * itself pinned and forced; the caller unpersists it when done. Values
    * are identical either way — integer arithmetic, order-independent. */
  def linkRank(edges: DataFrame, iters: Int, persistEvery: Int = 0): DataFrame = {
    val doPin = persistEvery > 0
    def pin(df: DataFrame): DataFrame = if (doPin) df.persist() else df
    val nodes = pin(edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct())
    val outdeg = pin(edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg")))
    // teleport term: 0.15 in micro-units
    val teleport = Unit1 * 15 / 100
    var ranks = nodes.withColumn("rank", lit(Unit1))
    var pinned: Option[DataFrame] = None
    for (i <- 1 to iters) {
      val contribs = edges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"), expr("rank div outdeg").as("contrib"))
      val gathered = contribs.groupBy(col("node")).agg(sum(col("contrib")).as("s"))
      ranks = nodes.join(gathered, Seq("node"), "left_outer")
        .select(col("node"),
          (lit(teleport) + expr("(coalesce(s, 0L) * 85) div 100")).as("rank"))
      if (doPin && (i % persistEvery == 0 || i == iters)) {
        val p = ranks.persist()
        p.count() // force BEFORE retiring the pin this plan reads from
        pinned.foreach(_.unpersist())
        pinned = Some(p)
        ranks = p
      }
    }
    if (doPin) { nodes.unpersist(); outdeg.unpersist() }
    ranks
  }

  /** Deterministic bucketing of [[linkRank]] output into `buckets` priority
    * tiers for the crawl frontier (CrawlConfig.rankPriority): tier 0 is the
    * hottest. Thresholds are PURE INTEGER — tier t ⇔ 1 + rank div Unit1 ≥
    * 2^(buckets−1−t) — so the assignment is exact and engine/partitioning
    * independent (a float log2 could flip a bucket on a 1-ulp boundary; a
    * global ntile window would single-task-sort the full host table). With
    * the default 4 buckets: rank < 1.0 → 3 (teleport-only, unlinked),
    * 1.0 ≤ r < 3.0 → 2, 3.0 ≤ r < 7.0 → 1, r ≥ 7.0 → 0. Output:
    * (host, rank_bucket int). */
  def bucketByRank(ranks: DataFrame, buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= 31, s"rankBuckets must be in [2,31], got $buckets")
    val v = lit(1L) + expr(s"rank div ${Unit1}L")
    // nest so the hottest threshold tests OUTERMOST (folding ascending
    // would route every hot host into the t=buckets-2 arm)
    val tier = (buckets - 2 to 0 by -1).foldLeft(lit(buckets - 1): Column) {
      case (acc, t) => when(v >= (1L << (buckets - 1 - t)), lit(t)).otherwise(acc)
    }
    ranks.select(col("node").as("host"), tier.cast("int").as("rank_bucket"))
  }

  /** Sequential reference implementation of the identical recurrence —
    * the spec's ground truth for the distributed form. */
  def linkRankReference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val teleport = Unit1 * 15 / 100
    var ranks = nodes.map(_ -> Unit1).toMap
    for (_ <- 1 to iters) {
      val gathered = edges
        .map { case (u, v) => v -> ranks(u) / outdeg(u) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      ranks = nodes.map(n => n -> (teleport + gathered.getOrElse(n, 0L) * 85 / 100)).toMap
    }
    ranks
  }
}
