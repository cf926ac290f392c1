package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Cross-engine 60-bit hash used by every oracle-compared operator that
 * needs hashing (minhash, simhash, LSH banding, winnowing, hyperplane
 * signs): `h64(x)` = the low 8 bytes of md5(x) read little-endian,
 * logically shifted right by 4 — a value in [0, 2^60).
 *
 * Why this exact construction:
 *   - md5 exists in BOTH engines with identical bytes; xxhash64 (Spark's
 *     native hash) has no DuckDB counterpart, which is what kept q27/q28/
 *     q35 un-oracled in round 1;
 *   - DuckDB exposes the little-endian low word directly as
 *     `md5_number_lower(x)` (UBIGINT); `>> 4` keeps the value inside
 *     BIGINT/LongType range so signed-vs-unsigned ORDERING agrees across
 *     engines (min-aggregates depend on that);
 *   - the Spark side reverses the hex pairs of chars 17..32 and drops the
 *     lowest nibble, which is the same value computed with `conv`.
 *
 * Engine-internal hashing (URL-seen sketches, partition routing) stays on
 * xxhash64 — it is ~10x cheaper and needs no oracle; at the 100 TB design
 * point callers that don't need cross-engine parity should pass xxhash-
 * based hashers into the dedup operators instead (they take the hash as a
 * parameter for exactly this reason).
 */
object Hash64 {

  /** DuckDB SQL text of the same function, for oracle generation. */
  def sql(expr: String): String = s"CAST((md5_number_lower($expr) >> 4) AS BIGINT)"

  /** Spark column form. Input is hashed as its UTF-8 bytes (strings). */
  def h64(c: Column): Column = {
    val m = md5(c)
    // little-endian read of bytes 8..15 == hex pairs reversed; >>4 == drop
    // the final low nibble, leaving 15 hex chars = 60 bits (fits a long).
    val le = concat(
      substring(m, 31, 2), substring(m, 29, 2), substring(m, 27, 2), substring(m, 25, 2),
      substring(m, 23, 2), substring(m, 21, 2), substring(m, 19, 2), substring(m, 17, 1))
    conv(le, 16, 10).cast("long")
  }

  /** JVM-side implementation, bit-identical to [[h64]] — used by kernel
    * paths (winnowing UDF) that hash inside partition loops. */
  def h64Jvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val le = java.nio.ByteBuffer.wrap(d, 8, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    le >>> 4
  }
}
