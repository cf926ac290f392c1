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
      buf.insert(key); buf
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
  * filters must share numBuckets. */
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
      // stash has no bucket context; re-stash (or drop into any bucket is
      // unsound — bucket identity is part of the key)
      if (dst.stash == 0) { dst.stash = src.stash; dst.count += 1 }
    }
  }

  private def insertFp(dst: CuckooFilter, bucket: Int, fp: Short): Unit = {
    val base = bucket << 2
    var i = 0
    while (i < 4) {
      if (dst.table(base + i) == fp) return // already present — idempotent
      i += 1
    }
    i = 0
    while (i < 4) {
      if (dst.table(base + i) == 0) { dst.table(base + i) = fp; dst.count += 1; return }
      i += 1
    }
    // bucket full: try alternate bucket via the same partial-key relation
    val alt = (bucket ^ (BloomFilter.mix2(fp.toLong & 0xffffL) & (dst.numBuckets - 1)).toInt) & (dst.numBuckets - 1)
    val abase = alt << 2
    i = 0
    while (i < 4) {
      if (dst.table(abase + i) == fp) return
      i += 1
    }
    i = 0
    while (i < 4) {
      if (dst.table(abase + i) == 0) { dst.table(abase + i) = fp; dst.count += 1; return }
      i += 1
    }
    if (dst.stash == 0) { dst.stash = fp; dst.count += 1 }
    // else: saturated — membership may miss; create() sizes for the round's
    // capacity so this is unreachable in practice (asserted in tests)
  }
}
