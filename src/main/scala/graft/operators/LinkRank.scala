package graft.operators

import org.apache.spark.sql.DataFrame
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
 * the Pregel-in-SQL shape. At the design point (10^10 edges) the loop
 * would persist `ranks` per iteration exactly like the crawl loop commits
 * rounds (the iteration count is small and fixed; the plan here unrolls
 * K iterations, which is fine for K ≤ ~5 — callers that iterate deeper
 * checkpoint between rounds like `Crawl.runRounds` does).
 */
object LinkRank {

  /** One micro-unit fixed-point "1.0". */
  val Unit1: Long = 1000000L

  /** `iters` rounds of the integer recurrence over `edges` (src, dst —
    * assumed distinct, self-loops allowed but pointless). Returns
    * (node, rank) for every node appearing as src or dst. */
  def linkRank(edges: DataFrame, iters: Int): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // teleport term: 0.15 in micro-units
    val teleport = Unit1 * 15 / 100
    var ranks = nodes.withColumn("rank", lit(Unit1))
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"), expr("rank div outdeg").as("contrib"))
      val gathered = contribs.groupBy(col("node")).agg(sum(col("contrib")).as("s"))
      ranks = nodes.join(gathered, Seq("node"), "left_outer")
        .select(col("node"),
          (lit(teleport) + expr("(coalesce(s, 0L) * 85) div 100")).as("rank"))
    }
    ranks
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
