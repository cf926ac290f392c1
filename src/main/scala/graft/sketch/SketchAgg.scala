package graft.sketch

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Typed aggregators that fold URL keys into per-partition membership
 * sketches (SURVEY.md op 35). Partial + final merge are the sketch's own
 * associative merge (bit-OR for Bloom, fingerprint re-placement for cuckoo),
 * so Spark's map-side partial aggregation applies and each grouped partition
 * ships exactly one sketch-sized buffer through the shuffle.
 *
 * Chosen over `TypedImperativeAggregate` because `Aggregator` is the stable
 * public API (Spark's own `bloom_filter_agg` is internal); exposed to
 * DataFrames via `functions.udaf`.
 */
object SketchAgg {

  /** Bloom build: Long key column → serialized BloomFilter. The buffer is
    * the raw word array (encodes natively, no kryo). */
  final class BloomBuildAgg(numBits: Int, numHashes: Int)
      extends Aggregator[Long, Array[Long], Array[Byte]] {
    private val header: Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16)
      bb.putInt(BloomFilter.Magic).putInt(1).putInt(numBits).putInt(numHashes)
      bb.array()
    }
    private def longsToBytes(ws: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(ws.length * 8)
      ws.foreach(bb.putLong)
      bb.array()
    }

    override def zero: Array[Long] = new Array[Long]((numBits + 63) >>> 6)

    override def reduce(buf: Array[Long], key: Long): Array[Long] = {
      val h1 = BloomFilter.mix1(key)
      val h2 = BloomFilter.mix2(key) | 1L
      var i = 0
      while (i < numHashes) {
        val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits).toInt
        buf(bit >>> 6) |= (1L << (bit & 63))
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Byte] = header ++ longsToBytes(buf)
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Cuckoo build: Long key column → serialized CuckooFilter. Kryo buffer
    * (the filter is an opaque mutable object). */
  final class CuckooBuildAgg(capacity: Long)
      extends Aggregator[Long, CuckooFilter, Array[Byte]] {
    override def zero: CuckooFilter = CuckooFilter.create(capacity)
    override def reduce(buf: CuckooFilter, key: Long): CuckooFilter = {
      // same no-silent-drops contract as CuckooMerge: insert() returning
      // false means the fingerprint was dropped — a URL-seen false negative
      // waiting to break fetch_seq parity. Undersizing must be a loud
      // config error on the build path exactly as it is on merge.
      if (!buf.insert(key))
        throw new IllegalStateException(
          s"cuckoo build saturated at ${buf.count} items / ${buf.numBuckets * 4} slots: " +
            "a dropped fingerprint would be a URL-seen false negative. Increase " +
            "bloomExpectedPerPartition to bound the partition's total seen-set.")
      buf
    }
    override def merge(a: CuckooFilter, b: CuckooFilter): CuckooFilter = {
      CuckooMerge.mergeInto(a, b); a
    }
    override def finish(buf: CuckooFilter): Array[Byte] = buf.serialize()
    override def bufferEncoder: Encoder[CuckooFilter] = Encoders.kryo[CuckooFilter]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Merge already-serialized sketches of the same partition (old snapshot
    * row + this round's delta row → next snapshot row). */
  final class SketchMergeAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = Array.emptyByteArray
    override def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] = mergeBytes(buf, in)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeBytes(a, b)
    override def finish(buf: Array[Byte]): Array[Byte] = buf
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY

    private def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val magic = java.nio.ByteBuffer.wrap(a, 0, 4).getInt
      if (magic == BloomFilter.Magic)
        BloomFilter.deserialize(a).merge(BloomFilter.deserialize(b)).serialize()
      else {
        val ca = CuckooFilter.deserialize(a)
        CuckooMerge.mergeInto(ca, CuckooFilter.deserialize(b))
        ca.serialize()
      }
    }
  }

  def bloomBuild(numBits: Int, numHashes: Int): Column => Column = {
    val f = udaf(new BloomBuildAgg(numBits, numHashes))
    c => f(c)
  }
  def cuckooBuild(capacity: Long): Column => Column = {
    val f = udaf(new CuckooBuildAgg(capacity))
    c => f(c)
  }
  def sketchMerge: Column => Column = {
    val f = udaf(new SketchMergeAgg)
    c => f(c)
  }
}

/** Fingerprint-level cuckoo merge: re-place every occupied slot of `src`
  * into `dst` using the slot's bucket index + partial-key alternate. Both
  * filters must share numBuckets.
  *
  * Two contracts this merge is NOT allowed to bend:
  *
  *   - **no silent drops**: a dropped fingerprint is a false NEGATIVE — a
  *     seen URL gets re-fetched and fetch_seq parity breaks. Merge runs the
  *     same bounded eviction-kick loop as `insert` and THROWS when the
  *     filter is genuinely saturated, so undersizing is a loud config error
  *     (resize `bloomExpectedPerPartition` to bound the partition's TOTAL
  *     seen-set across all rounds, not one round's delta), never a silent
  *     parity bug;
  *   - **multiset semantics** (Fan'14 §3.2): identical fingerprints in the
  *     same bucket are kept as separate copies, NOT coalesced. The engine
  *     inserts each canon_url exactly once, so same-(bucket,fp) copies only
  *     arise from genuine fingerprint collisions between different URLs —
  *     and exactly then, coalescing would make a later `delete` of one URL
  *     silently remove the other's membership (a false negative again).
  */
object CuckooMerge {
  def mergeInto(dst: CuckooFilter, src: CuckooFilter): Unit = {
    require(dst.numBuckets == src.numBuckets, "cuckoo geometry mismatch")
    var slot = 0
    while (slot < src.table.length) {
      val fp = src.table(slot)
      if (fp != 0) insertFp(dst, slot >> 2, fp)
      slot += 1
    }
    if (src.stash != 0) {
      // A stash entry has NO recoverable bucket identity (it fell off the
      // end of a kick chain), so the only slot that keeps it findable by
      // mightContain is the destination stash itself. Occupied ⇒ saturated.
      if (dst.stash == 0) { dst.stash = src.stash; dst.count += 1 }
      else throw new IllegalStateException(
        "cuckoo merge: both stash slots occupied — filter saturated; " +
          "increase bloomExpectedPerPartition (a drop would be a false negative)")
    }
  }

  private def insertFp(dst: CuckooFilter, bucket: Int, fp: Short): Unit = {
    if (bucketInsert(dst, bucket, fp)) { dst.count += 1; return }
    val alt = altBucket(dst, bucket, fp)
    if (bucketInsert(dst, alt, fp)) { dst.count += 1; return }
    // both buckets full: bounded eviction kicks, exactly like insert()
    var b = bucket
    var f = fp
    var kick = 0
    while (kick < CuckooFilter.MaxKicks) {
      val slot = (b << 2) + (BloomFilter.mix1(kick.toLong ^ (f.toLong & 0xffffL)) & 3L).toInt
      val victim = dst.table(slot)
      dst.table(slot) = f
      f = victim
      b = altBucket(dst, b, f)
      if (bucketInsert(dst, b, f)) { dst.count += 1; return }
      kick += 1
    }
    if (dst.stash == 0) { dst.stash = f; dst.count += 1; return }
    throw new IllegalStateException(
      s"cuckoo merge saturated at ${dst.count} items / ${dst.numBuckets * 4} slots: " +
        "a dropped fingerprint would be a URL-seen false negative. Increase " +
        "bloomExpectedPerPartition to bound the partition's total seen-set.")
  }

  private def altBucket(dst: CuckooFilter, b: Int, fp: Short): Int =
    (b ^ (BloomFilter.mix2(fp.toLong & 0xffffL) & (dst.numBuckets - 1)).toInt) & (dst.numBuckets - 1)

  private def bucketInsert(dst: CuckooFilter, b: Int, fp: Short): Boolean = {
    val base = b << 2
    var i = 0
    while (i < 4) {
      if (dst.table(base + i) == 0) { dst.table(base + i) = fp; return true }
      i += 1
    }
    false
  }
}
