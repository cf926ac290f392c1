package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Deterministic stratified sampling for training-data curation: keep the
 * best-k rows per stratum (language, source, quality bucket, …) by a
 * caller-supplied priority, typically a seeded hash of the row key — i.e.
 * "a uniform, reproducible N-docs-per-language sample of the corpus".
 *
 * Why this shape at 100 TB:
 *   - `row_number().over(partitionBy(stratum))` sorts EVERY row of a
 *     stratum inside one task; with Zipf-ish strata (English is 40%+ of a
 *     web corpus) the hot stratum serializes through one partition — the
 *     same straggler the crawl's host budget avoids ([[HostTopK]]).
 *     The bounded-PQ aggregate caps every mapper's output at k rows per
 *     stratum, so the hot stratum's reduce-side input is mapPartitions×k,
 *     not its full row count, and per-stratum memory is k everywhere.
 *   - only (stratum, priority, key) triples enter the PQ — never the
 *     document payload. The sample is materialized as keys + ranks and the
 *     caller semi-joins the payload back (the same payload-out-of-buffer
 *     argument as the as-of operator, SURVEY op 29): hauling text/binary
 *     through an agg buffer is the difference between shuffling ~24 bytes
 *     and ~100 KB per candidate row.
 *   - priority = pure integer arithmetic on the key (e.g.
 *     `(key * KNUTH) % P`) keeps the sample exactly reproducible across
 *     engines, partitionings and reruns — no RNG, no wall clock; changing
 *     the seed constant yields an independent sample.
 *
 * Determinism: candidates compare by (priority, key); key is unique, so
 * the order is total and the surviving set is independent of partitioning
 * and merge order.
 */
object StratifiedSample {

  /** Narrow candidate carried through the PQ: grouping stratum, the
    * priority to minimize, and the unique row key that both tie-breaks and
    * lets the caller join the payload back. */
  final case class SampleCand(stratum: String, pri: Long, key: Long)

  implicit val sampleOrd: Ordering[SampleCand] =
    Ordering.by((c: SampleCand) => (c.pri, c.key))

  private def siftUp(h: scala.collection.mutable.ArrayBuffer[SampleCand], i0: Int): Unit = {
    var i = i0
    while (i > 0 && sampleOrd.gt(h(i), h((i - 1) / 2))) {
      val p = (i - 1) / 2
      val t = h(i); h(i) = h(p); h(p) = t
      i = p
    }
  }
  private def siftDown(h: scala.collection.mutable.ArrayBuffer[SampleCand]): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < h.length && sampleOrd.gt(h(l), h(m))) m = l
      if (r < h.length && sampleOrd.gt(h(r), h(m))) m = r
      if (m == i) done = true
      else { val t = h(i); h(i) = h(m); h(m) = t; i = m }
    }
  }

  /** Size-k bounded PQ keeping the k smallest candidates by [[sampleOrd]]
    * (max-heap, root = current worst kept). Same mechanics as
    * [[HostTopK.TopKAgg]]; duplicated rather than abstracted because the
    * candidate payload and ordering are the whole of each class and an
    * Ordering-generic Aggregator defeats the case-class udaf encoding. */
  final class SampleTopKAgg(k: Int)
      extends Aggregator[SampleCand, scala.collection.mutable.ArrayBuffer[SampleCand], Array[SampleCand]] {

    override def zero: scala.collection.mutable.ArrayBuffer[SampleCand] =
      scala.collection.mutable.ArrayBuffer.empty[SampleCand]

    override def reduce(
        h: scala.collection.mutable.ArrayBuffer[SampleCand],
        c: SampleCand): scala.collection.mutable.ArrayBuffer[SampleCand] = {
      if (k > 0) {
        if (h.length < k) { h += c; siftUp(h, h.length - 1) }
        else if (sampleOrd.lt(c, h(0))) { h(0) = c; siftDown(h) }
      }
      h
    }

    override def merge(
        a: scala.collection.mutable.ArrayBuffer[SampleCand],
        b: scala.collection.mutable.ArrayBuffer[SampleCand]): scala.collection.mutable.ArrayBuffer[SampleCand] = {
      if (a.isEmpty) b
      else { b.foreach(c => reduce(a, c)); a }
    }

    override def finish(h: scala.collection.mutable.ArrayBuffer[SampleCand]): Array[SampleCand] =
      h.sorted(sampleOrd).toArray // best-first

    override def bufferEncoder: Encoder[scala.collection.mutable.ArrayBuffer[SampleCand]] =
      Encoders.kryo[scala.collection.mutable.ArrayBuffer[SampleCand]]
    override def outputEncoder: Encoder[Array[SampleCand]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[SampleCand]]()
  }

  /**
   * Best-k rows per stratum by ascending priority. Input columns are
   * expressions over `df`; output is `(stratum, key, pri, sample_rank)`
   * with `sample_rank` 1-based within the stratum, at most k rows per
   * stratum, hash-partitioned by stratum (reusable downstream).
   *
   * The caller joins payloads back by `key` — by construction a sample is
   * ≤ k·|strata| rows, so that join is broadcast-able on the sample side
   * even when `df` is the 100 TB corpus.
   */
  def stratifiedTopK(
      df: DataFrame, stratum: Column, key: Column, pri: Column, k: Int): DataFrame = {
    val agg = udaf(new SampleTopKAgg(k))
    df.select(stratum.cast("string").as("stratum"), pri.cast("long").as("pri"),
        key.cast("long").as("key"))
      .groupBy(col("stratum"))
      // a udaf over a case-class input takes the FIELDS as arguments
      .agg(agg(col("stratum"), col("pri"), col("key")).as("top"))
      .select(col("stratum"), posexplode(col("top")).as(Seq("pos", "c")))
      .select(col("stratum"), col("c.key").as("key"), col("c.pri").as("pri"),
        (col("pos") + 1).cast("int").as("sample_rank"))
  }

  /** Knuth multiplicative constant / large prime used by the default
    * hash priority: exact in 64-bit integer arithmetic for any key up to
    * ~3.4e9, hence bit-identical across Spark and any ANSI-SQL engine. */
  val PriMul: Long = 2654435761L
  val PriMod: Long = 1000000007L

  /** Default cross-engine priority: `((key + seed) * PriMul) mod PriMod`.
    * Deterministic, seed-parameterized, uniform enough for sampling (a
    * Fibonacci-style multiplicative hash). The seed offsets the KEY, not
    * the product — a post-multiply additive seed would only shift every
    * priority by the same constant mod P, reordering nothing but the
    * wrap-around pairs. NOT cryptographic — callers sampling adversarial
    * keys should substitute xxhash64. */
  def hashPri(key: Column, seed: Long = 0L): Column =
    pmod((key.cast("long") + lit(seed)) * lit(PriMul), lit(PriMod))

  /**
   * Deterministic train/validation/test assignment by key hash: returns
   * `df` plus a `split` column, where fractions are permille thresholds
   * over the same cross-engine hash (e.g. `Seq(("train", 980),
   * ("valid", 990), ("test", 1000))` = 98% / 1% / 1%). Row-local
   * projection — no shuffle, no RNG, stable under reruns and appends,
   * which is precisely what leakage-free split assignment at corpus scale
   * requires (a random() split re-deals on every rerun).
   */
  def hashSplit(
      df: DataFrame, key: Column, fractions: Seq[(String, Int)],
      seed: Long = 0L): DataFrame = {
    require(fractions.nonEmpty && fractions.last._2 == 1000,
      s"fractions must end at 1000 permille: $fractions")
    require(fractions.map(_._2) == fractions.map(_._2).sorted,
      s"fraction thresholds must be non-decreasing: $fractions")
    val bucket = pmod(hashPri(key, seed), lit(1000L))
    val split = fractions.init.foldRight(lit(fractions.last._1): Column) {
      case ((name, upTo), rest) => when(bucket < upTo, name).otherwise(rest)
    }
    df.withColumn("split", split)
  }

  /**
   * DOMAIN-MIX sampling under a per-stratum TOKEN budget (the Pile/Dolma
   * mixing move): within each stratum (source domain), order rows by
   * ascending (pri, key) — a deterministic hash priority, so the sample is
   * a uniform reproducible subset — and keep the maximal prefix whose
   * cumulative `weight` (token count) stays ≤ the stratum's budget. A row
   * is kept iff its INCLUSIVE running weight sum ≤ budget; weights are
   * non-negative, so this equals the maximal-prefix rule and is exactly
   * `QUALIFY sum(w) OVER (PARTITION BY stratum ORDER BY pri, key) <= B`.
   *
   * Why not that window directly: a running sum over `partitionBy(stratum)`
   * sorts EVERY row of a stratum through one task — the hot-stratum
   * straggler again ([[stratifiedTopK]]'s opening argument), except worse,
   * because a budget cut needs the whole prefix, not a k-bounded PQ. The
   * scale shape here is HISTOGRAM QUOTA + EXACT BOUNDARY:
   *
   *   1. bucket each row by its priority PREFIX (`pri / width`, monotone in
   *      pri) — one codegen'd projection;
   *   2. ONE hash aggregation to (stratum, bucket) weight totals — a
   *      |strata|·nBuckets-row frame, windowed per stratum in microseconds
   *      to find each stratum's BOUNDARY bucket: the first whose cumulative
   *      weight crosses the budget;
   *   3. rows in buckets BELOW the boundary are kept outright (their
   *      inclusive cumsum is ≤ the boundary's entering total ≤ B); rows
   *      ABOVE are dropped outright; only the boundary bucket's ~1/nBuckets
   *      slice of the stratum pays the exact running-sum window, entering
   *      at the (broadcast) cumulative total of the full buckets.
   *
   * The result is BIT-IDENTICAL to the naive window for every nBuckets ≥ 1
   * (bucket order is a coarsening of the row order; the boundary window
   * re-establishes exact order inside the one ambiguous bucket) — asserted
   * by PipelineSpec across bucket counts — while the big data only ever
   * sees projections, one aggregation, and one broadcast-joined filter.
   *
   * `priBound`: exclusive upper bound of `pri` values (defaults to
   * [[PriMod]], matching [[hashPri]]); buckets are `pri / ceil(priBound /
   * nBuckets)`, clamped into range so an out-of-contract priority degrades
   * to a bigger boundary bucket rather than a wrong sample.
   */
  def tokenBudgetSample(
      df: DataFrame, stratum: Column, key: Column, weight: Column,
      defaultBudget: Long, budgets: Map[String, Long] = Map.empty,
      pri: Column = null, nBuckets: Int = 1024,
      priBound: Long = PriMod): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    val priC = if (pri == null) hashPri(key) else pri
    val width = math.max(1L, (priBound + nBuckets - 1) / nBuckets)
    val budgetCol =
      if (budgets.isEmpty) lit(defaultBudget)
      else coalesce(element_at(typedLit(budgets), col("stratum")), lit(defaultBudget))

    val rows = df.select(stratum.cast("string").as("stratum"),
        key.cast("long").as("key"), priC.cast("long").as("pri"),
        weight.cast("long").as("w"))
      .withColumn("bucket", least(col("pri") / lit(width), lit(nBuckets - 1L)).cast("long"))

    // (stratum, bucket) histogram — |strata|·nBuckets rows, tiny by design
    val hist = rows.groupBy(col("stratum"), col("bucket"))
      .agg(sum(col("w")).as("bw"))
    val wOrd = Window.partitionBy(col("stratum")).orderBy(col("bucket"))
    val cum = hist.withColumn("cum_before",
      coalesce(sum(col("bw")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // boundary = FIRST bucket whose cumulative total crosses the budget:
    // exactly the bucket with cum_before ≤ B < cum_before + bw (an earlier
    // crossing would have pushed cum_before past B already) — one filter,
    // ≤ 1 row per stratum. A stratum that fits entirely has none
    // (boundary = nBuckets ⇒ keep all).
    val boundary = cum
      .filter(col("cum_before") <= budgetCol && col("cum_before") + col("bw") > budgetCol)
      .select(col("stratum"), col("bucket").as("b_star"), col("cum_before").as("entering"))

    val tagged = rows.join(broadcast(boundary), Seq("stratum"), "left")
      .withColumn("b_star", coalesce(col("b_star"), lit(nBuckets.toLong)))
    val below = tagged.filter(col("bucket") < col("b_star"))
    // the exact window runs ONLY over each stratum's single boundary bucket
    val atBoundary = tagged.filter(col("bucket") === col("b_star"))
      .withColumn("cum_in",
        sum(col("w")).over(Window.partitionBy(col("stratum"))
          .orderBy(col("pri"), col("key"))))
      .filter(col("entering") + col("cum_in") <= budgetCol)
      .drop("cum_in")
    below.unionByName(atBoundary)
      .select(col("stratum"), col("key"), col("pri"), col("w"))
  }
}
