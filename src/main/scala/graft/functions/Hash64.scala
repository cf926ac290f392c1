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
 * xxhash64 — it is ~10x cheaper and needs no oracle; callers that don't
 * need cross-engine parity pass [[graft.dedup.DedupHasher.production]]
 * (xxhash64-based) into the dedup operators, which take the hasher as a
 * parameter for exactly this reason.
 *
 * K-hash families (minhash permutations) do NOT re-digest the input k
 * times: [[permutePair]] derives hash_i from TWO base digests by
 * Kirsch–Mitzenmacher double hashing, `(h1 + i·h2) mod 2^60` — round 2
 * measured k full md5 digests per shingle as a 2.6x regression of the
 * minhash pipeline; this construction is two digests per shingle plus k
 * long adds (the i·h2 multiply split so no intermediate wraps — wrapping
 * is a DuckDB overflow error and an ANSI-mode Spark error). A
 * single-digest affine family `(a_i·h + b_i) mod 2^60` was tried first
 * and REJECTED: measured LSH recall 0.82 vs 0.96 (KM) / 0.91
 * (independent digests) on the planted-near-dup fixture — one 60-bit
 * value does not carry enough independent entropy for 32 permutations.
 */
object Hash64 {

  /** 2^60 — the modulus of the [[h64]] value domain. */
  val Mod60: Long = 1L << 60
  private val Mask30: Long = (1L << 30) - 1L

  /** The [[h64]]-domain seed of the SECOND Kirsch–Mitzenmacher digest:
    * `h2 = h64("2#" ++ input)`. KM double hashing ("Less Hashing, Same
    * Performance") derives hash_i = (h1 + i·h2) mod 2^60 from TWO digests —
    * measured on the planted-near-dup LSH fixture it matches the
    * fully-independent-digest family (recall 0.96 vs 0.91) where the
    * single-digest affine family `(a_i·h + b_i) mod 2^60` lost real recall
    * (0.82): one 60-bit value does not carry enough independent entropy for
    * 32 permutations, two do. */
  val Km2Prefix: String = "2#"

  /** KM hash_i over the two base-digest columns: (h1 + i·h2) mod 2^60,
    * evaluated with every intermediate below 2^62 — i·h2 is computed as a
    * 30/30-bit SPLIT product (i < 2^6, h2 < 2^60), so plain BIGINT
    * multiply/add/shift/mask in BOTH engines, ANSI-overflow-safe. The
    * DuckDB oracle mirrors it as `(h1::HUGEINT + i*h2) % 2^60` —
    * mathematically identical. */
  def permutePair(h1: Column, h2: Column, i: Int): Column = {
    if (i == 0) h1
    else {
      val mid = (lit(i.toLong) * shiftright(h2, 30)).bitwiseAND(lit(Mask30))
      (h1 + lit(i.toLong) * h2.bitwiseAND(lit(Mask30)) + shiftleft(mid, 30)) % lit(Mod60)
    }
  }

  /** DuckDB SQL text of the same function, for oracle generation. */
  def sql(expr: String): String = s"CAST((md5_number_lower($expr) >> 4) AS BIGINT)"

  /** Spark column form — the native [[H64]] expression. (The round-2
    * composition of built-ins — md5 → 8 hex substrings → concat → conv —
    * computed the same value through ~12 allocating string ops per row and
    * measured as the dominant cost of the minhash pipeline; the native
    * expression reads the long straight out of the digest bytes.) */
  def h64(c: Column): Column =
    org.apache.spark.sql.graft.GraftBridge.column(
      H64(org.apache.spark.sql.graft.GraftBridge.expression(c)))

  /** One MessageDigest per thread: getInstance per row costs more than the
    * digest itself on short inputs. */
  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Digest path shared by the expression and the JVM kernels: md5 low 8
    * bytes read little-endian, >>> 4 → a value in [0, 2^60). */
  def h64Bytes(bytes: Array[Byte]): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(bytes)
    val le = java.nio.ByteBuffer.wrap(d, 8, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    le >>> 4
  }

  /** Static entry the generated code calls (top-level object ⇒ static
    * forwarder ⇒ plain Java static call in codegen). */
  def h64Utf8(u: org.apache.spark.unsafe.types.UTF8String): Long = h64Bytes(u.getBytes)

  /** JVM-side implementation, bit-identical to [[h64]] — used by kernel
    * paths (winnowing UDF) that hash inside partition loops. */
  def h64Jvm(s: String): Long =
    h64Bytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** JVM mirror of [[permutePair]] — identical 30/30-split arithmetic, so
    * every intermediate stays below 2^62 (values, not semantics, are what
    * the split protects on the SQL side; here it keeps the two forms
    * literally the same expression). */
  def permutePairJvm(h1: Long, h2: Long, i: Int): Long =
    if (i == 0) h1
    else {
      val mid = (i.toLong * (h2 >>> 30)) & Mask30
      (h1 + i.toLong * (h2 & Mask30) + (mid << 30)) % Mod60
    }
}

/** The cross-engine 60-bit hash as a NATIVE codegen'd expression:
  * `h64(s)` = little-endian low word of md5(s) >>> 4 (see [[Hash64]]).
  * Stays inside whole-stage codegen; deterministic; foldable on literals. */
case class H64(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.LongType
  override def prettyName: String = "h64"

  override def nullSafeEval(v: Any): Any =
    Hash64.h64Utf8(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash64.h64Utf8($c)")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = newChild)
}
