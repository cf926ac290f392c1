package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/**
 * Deduplication operators for a large-scale training-data pipeline:
 *
 *   - exact:       hash-groupBy on a content fingerprint (md5 of normalized
 *                  text) — one shuffle keyed by the digest;
 *   - n-gram Jaccard: all-pairs within a blocking key, set similarity over
 *                  distinct word 3-grams;
 *   - MinHash+LSH: shingle → k-permutation min-hash signature → banded
 *                  bucket join → candidate pairs → exact-Jaccard verify;
 *   - SimHash:     64-bit sign-of-weighted-sum sketch + pigeonhole chunk
 *                  join for hamming-distance ≤ d pairs.
 *
 * Scale notes (the 100 TB story):
 *   - exact dedup is a single hash-partitioned aggregate — map-side partial
 *     aggregation collapses per-partition duplicates before the shuffle;
 *   - MinHash signatures are built by explode + groupBy(doc) with k `min`
 *     aggregates: partial aggregation makes the shuffle carry one row per
 *     (doc, partial-mins), never one row per shingle;
 *   - the LSH bucket join shuffles on (band_idx, band_hash) — bucket sizes
 *     are bounded w.h.p.; a `bucketCap` guard drops degenerate buckets
 *     (e.g. the all-empty-text bucket) the way production pipelines do;
 *   - only candidate pairs (tiny vs n²) ever join back to full shingle sets
 *     for verification.
 */
object Dedup {

  /** Distinct word 3-gram shingles of the normalized text. Documents with
    * fewer than `n` words contribute their whole text as one shingle. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(TextAnalysis.normText(text), " ")
    val grams = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array(TextAnalysis.normText(text)))
    array_distinct(grams)
  }

  // --- exact dedup ----------------------------------------------------------

  /** Duplicate groups by exact normalized content: one row per distinct
    * content that appears >1 times, with the representative (min id) and
    * the full sorted member list. */
  def exactDupGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), TextAnalysis.fingerprintMd5(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keep_id"),
        sort_array(collect_list(col(idCol))).as("member_ids"))
      .filter(col("n_dups") > 1)

  /** The kept corpus after exact dedup: lowest id per distinct content. */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val keep = docs
      .select(col(idCol), TextAnalysis.fingerprintMd5(col(textCol)).as("fp"))
      .groupBy(col("fp")).agg(min(col(idCol)).as(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  // --- n-gram Jaccard (all-pairs within a blocking key) ---------------------

  /** Pairwise Jaccard over distinct word n-grams for documents sharing
    * `blockCol` (blocking bounds the pair explosion; at web scale the block
    * is a cheap cluster key — source, LSH bucket, length bucket…).
    * Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥ minJ. */
  def ngramJaccardPairs(
      docs: DataFrame,
      blockCol: String,
      minJ: Double,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val withSh = docs.select(col(idCol), col(blockCol), shingles(col(textCol)).as("sh"))
    val a = withSh.select(col(blockCol), col(idCol).as("id_a"), col("sh").as("sh_a"))
    val b = withSh.select(col(blockCol), col(idCol).as("id_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val unionSz = (size(col("sh_a")) + size(col("sh_b"))).cast("double") - inter
    a.join(b, Seq(blockCol))
      .filter(col("id_a") < col("id_b"))
      // single int-derived IEEE division — bit-identical in the SQL oracle
      .withColumn("jaccard", inter / greatest(unionSz, lit(1.0)))
      .filter(col("jaccard") >= minJ)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // --- MinHash + LSH --------------------------------------------------------

  /** MinHash signature: sig_i = min over shingles of h64(i ":" shingle),
    * built distributed via explode + k-way min aggregate (partial agg makes
    * the shuffle O(docs), not O(shingles)). Output: (id, sig array<long>).
    * The hash is the cross-engine md5-derived [[graft.functions.Hash64]] so
    * the whole pipeline has a DuckDB oracle; swap an xxhash64-based hasher
    * in production if the ~10x hash-cost delta ever shows up in a profile
    * (it is dominated by the shingle explode shuffle at scale). */
  def minhashSignatures(
      docs: DataFrame, k: Int, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import graft.functions.Hash64.h64
    val exploded = docs
      .select(col(idCol), explode(shingles(col(textCol))).as("sh"))
    val minCols = (0 until k).map(i => min(h64(concat(lit(s"$i:"), col("sh")))).as(s"m$i"))
    exploded.groupBy(col(idCol))
      .agg(minCols.head, minCols.tail: _*)
      .select(col(idCol), array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH banding: candidate pairs = docs agreeing on at least one band of
    * `rowsPerBand` consecutive signature slots. Distinct (id_a < id_b). */
  def lshCandidatePairs(
      sigs: DataFrame,
      bands: Int,
      rowsPerBand: Int,
      idCol: String = "doc_id",
      bucketCap: Int = 1000): DataFrame = {
    import graft.functions.Hash64.h64
    val banded = sigs.select(col(idCol).as("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => h64(concat(b.cast("string"), lit("|"),
          concat_ws(",", transform(
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
            x => x.cast("string")))))))
        .as(Seq("band_idx", "band_hash")))
    // guard: drop degenerate buckets (all-identical junk content) that would
    // quadratically explode the self-join — production LSH pipelines cap too
    val capped = banded.join(
      banded.groupBy("band_idx", "band_hash").count().filter(col("count") <= bucketCap)
        .drop("count"),
      Seq("band_idx", "band_hash"), "left_semi")
    capped.as("x").join(capped.as("y"), Seq("band_idx", "band_hash"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
  }

  /** Full MinHash near-dup pipeline: signatures → LSH candidates → exact
    * Jaccard verification over true shingle sets. */
  def minhashNearDupPairs(
      docs: DataFrame,
      k: Int = 32,
      bands: Int = 8,
      minJ: Double = 0.5,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k % bands == 0, "k must divide into bands evenly")
    val sigs = minhashSignatures(docs, k, idCol, textCol)
    val cands = lshCandidatePairs(sigs, bands, k / bands, idCol)
    val sh = docs.select(col(idCol), shingles(col(textCol)).as("sh"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val unionSz = (size(col("sh_a")) + size(col("sh_b"))).cast("double") - inter
    cands
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      // single int-derived IEEE division, no round(): bit-identical cross-engine
      .withColumn("jaccard", inter / greatest(unionSz, lit(1.0)))
      .filter(col("jaccard") >= minJ)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // --- SimHash --------------------------------------------------------------

  /** SimHash bit width: 60, not 64 — the sketch bits come from the
    * cross-engine [[graft.functions.Hash64]] (60-bit by construction), and
    * 60 bits keeps the packed sketch positive in both engines' signed i64,
    * so chunking/XOR/bit_count agree exactly. Detection quality at ≤3-bit
    * hamming distance is indistinguishable from 64 bits. */
  val SimhashBits = 60

  /** SimHash over word tokens: bit j of the sketch is the sign of
    * Σ_tokens (±1 by bit j of h64(token)). Built via explode + 60 sum
    * aggregates (partial agg ⇒ shuffle carries one row per doc). */
  def simhash64(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import graft.functions.Hash64.h64
    val toks = docs.select(col(idCol),
      explode(split(TextAnalysis.normText(col(textCol)), " ")).as("tok"))
      .withColumn("h", h64(col("tok")))
    val sums = (0 until SimhashBits).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1L) === 1L, 1).otherwise(-1)).as(s"b$j"))
    val agg = toks.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
    val sketch = (0 until SimhashBits).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_.bitwiseOR(_))
    agg.select(col(idCol), sketch.as("simhash"))
  }

  /** Near-dup pairs with hamming(simhash) ≤ maxDist via pigeonhole: split
    * the 60-bit sketch into (maxDist+1) chunks — any pair within distance d
    * agrees exactly on ≥1 chunk, so an equi-join on (chunk_idx, chunk_val)
    * finds all of them without an n² scan. */
  def simhashNearDupPairs(
      docs: DataFrame, maxDist: Int = 3, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val nChunks = maxDist + 1
    val width = SimhashBits / nChunks
    val sk = simhash64(docs, idCol, textCol)
    val chunked = sk.select(col(idCol).as("id"), col("simhash"),
      posexplode(array((0 until nChunks).map { c =>
        val shift = c * width
        val w = if (c == nChunks - 1) SimhashBits - shift else width
        val mask = (1L << w) - 1L
        shiftrightunsigned(col("simhash"), shift).bitwiseAND(mask)
      }: _*)).as(Seq("chunk_idx", "chunk_val")))
    chunked.as("x").join(chunked.as("y"), Seq("chunk_idx", "chunk_val"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  // --- embedding cosine near-dup --------------------------------------------

  /** Pairs of vectors with cosine ≥ minCos, blocked on `blockCol` (label /
    * coarse-quantizer cell / LSH bucket — at scale the block IS the index).
    * Cosine is computed in double precision, sequential over the array. */
  def embeddingNearDupPairs(
      embs: DataFrame,
      blockCol: String,
      minCos: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import graft.sim.Similarity.cosine
    val v = embs.select(col(blockCol), col(idCol), col(vecCol))
    v.as("x").join(v.as("y"), Seq(blockCol))
      .filter(col(s"x.$idCol") < col(s"y.$idCol"))
      .withColumn("cos", round(cosine(col(s"x.$vecCol"), col(s"y.$vecCol")), 6))
      .filter(col("cos") >= minCos)
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"), col("cos"))
  }
}
