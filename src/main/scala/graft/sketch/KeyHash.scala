package graft.sketch

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/**
 * JVM-side key hashing that is bit-identical to Spark's `xxhash64(col)`
 * expression (XXH64 over the UTF-8 bytes, seed 42). Keeping the two sides
 * identical is what lets `pmod(xxhash64(canon_url), P)` computed in a plan
 * agree with the partition routing done inside UDFs/aggregators — a silent
 * mismatch would corrupt the per-partition sketch math (SURVEY.md §7.5.4).
 */
object KeyHash {
  val SparkSeed = 42L

  def of(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, SparkSeed)
  }

  /** Non-negative partition id, same as `pmod(xxhash64(c), p)`. */
  def pidOf(s: String, p: Int): Int =
    java.lang.Math.floorMod(of(s), p.toLong).toInt
}
