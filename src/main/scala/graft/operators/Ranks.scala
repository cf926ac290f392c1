package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Scalable global sequence numbering (SURVEY.md op 41).
 *
 * `row_number().over(Window.orderBy(...))` funnels the whole relation through
 * ONE partition — fine at test scale, fatal at 10^10 rows. This is the
 * standard two-phase alternative:
 *
 *   1. range-repartition + sort locally on the order key (one shuffle, the
 *      same one any global sort pays),
 *   2. count rows per partition (cheap action over partition counts only),
 *   3. add each partition's prefix-sum offset to its local 0-based index.
 *
 * The result equals the single-partition window exactly (the sort is made
 * total by requiring the caller to pass a tie-free key set), but every
 * partition works independently.
 */
object Ranks {

  /** Append `seqCol` = 0-based global rank by `order` (must be a total
    * order — end it with a unique key). */
  def globalSeq(df: DataFrame, seqCol: String, order: Seq[Column], numPartitions: Int): DataFrame = {
    val sorted = df.repartitionByRange(numPartitions, order: _*)
      .sortWithinPartitions(order: _*)
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(seqCol, org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = sorted.rdd
    // phase 2: per-partition counts (runs only the scan+shuffle read, no data
    // movement beyond a long per partition)
    val counts = rdd.mapPartitions(it => Iterator.single(it.size), preservesPartitioning = true).collect()
    val offsets = counts.scanLeft(0L)(_ + _)
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var i = bOffsets.value(pid)
      it.map { row =>
        val r = org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i)
        i += 1
        r
      }
    }
    spark.createDataFrame(out, schema)
  }
}
