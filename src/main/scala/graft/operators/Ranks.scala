package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Scalable global sequence numbering (SURVEY.md op 41).
 *
 * `row_number().over(Window.orderBy(...))` funnels the whole relation through
 * ONE partition — fine at test scale, fatal at 10^10 rows. This is the
 * standard two-phase alternative:
 *
 *   1. range-repartition + local sort on the order key (one shuffle — the
 *      same one any global sort pays);
 *   2. per-partition counts (tiny agg, ≤P longs through the driver) →
 *      prefix-sum offsets, broadcast;
 *   3. one `mapPartitions` adds offset + local 0-based index.
 *
 * Step 3 stays a Dataset transform (NOT `.rdd` — round 1 measured a full
 * plan re-compile plus driver re-planning on the RDD hop): a single typed
 * partition pass with a Row encoder. It is deliberately an OBJECT node, not
 * a `monotonically_increasing_id` projection — the optimizer is free to
 * eliminate a local sort under an order-insensitive projection (measured:
 * q16 went wrong exactly that way under a downstream orderBy), while an
 * opaque mapPartitions pins the sort it consumes.
 *
 * The result equals the single-partition window exactly (the sort is made
 * total by requiring the caller to pass a tie-free key set), but every
 * partition works independently.
 */
object Ranks {

  /** Append `seqCol` = 0-based global rank by `order` (must be a total
    * order — end it with a unique key). Runs the sorted input twice (counts
    * pass + output pass).
    *
    * The sorted intermediate is ALWAYS persisted and returned as the second
    * frame: RangePartitioner seeds its boundary sampling from the physical
    * RDD id, which is fresh per query execution — two independent
    * executions of the same repartitionByRange get (slightly) DIFFERENT
    * boundaries, so offsets computed by pass 1 would mis-align with pass
    * 2's partitions (measured: ~87% wrong ranks at 60k rows). Caching pins
    * one materialization that both passes read. Callers should unpersist
    * the second frame once the first is materialized; [[globalSeq]] leaves
    * it to cache eviction (fine for one-shot queries, not for loops). */
  def globalSeqCached(
      df: DataFrame,
      seqCol: String,
      order: Seq[Column],
      numPartitions: Int,
      cache: Boolean = true): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(numPartitions, order: _*)
      .sortWithinPartitions(order: _*)
      .persist()
    val counts = sorted.groupBy(spark_partition_id().as("__pid")).agg(count(lit(1)).as("__cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until numPartitions).scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    val bOffsets = spark.sparkContext.broadcast(offsets.toArray)
    val outSchema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        seqCol, org.apache.spark.sql.types.LongType, nullable = false))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    val out = sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var i = bOffsets.value(pid)
      it.map { row =>
        val r = Row.fromSeq(row.toSeq :+ i)
        i += 1
        r
      }
    }
    (out, sorted)
  }

  def globalSeq(df: DataFrame, seqCol: String, order: Seq[Column], numPartitions: Int): DataFrame =
    globalSeqCached(df, seqCol, order, numPartitions, cache = false)._1
}
