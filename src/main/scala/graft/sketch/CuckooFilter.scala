package graft.sketch

/**
 * Cuckoo filter over 64-bit keys (Fan, Andersen, Kaminsky, Mitzenmacher —
 * "Cuckoo Filter: Practically Better Than Bloom", CoNEXT 2014).
 *
 * Geometry: 4-way set-associative buckets, 16-bit fingerprints, partial-key
 * cuckoo hashing (alternate bucket = bucket XOR hash(fingerprint)), max 500
 * eviction kicks, single-slot stash as the fail-safe.
 *
 * Why it exists alongside [[BloomFilter]]: the crawl re-visit path needs
 * DELETE (evict a URL from the seen-set so a changed page is re-crawled);
 * Bloom cannot delete. Both implement [[SeenFilter]].
 *
 * numBuckets is a power of two so the XOR-partial-key trick keeps the
 * alternate-bucket relation an involution.
 */
final class CuckooFilter private (
    val numBuckets: Int, // power of 2
    val table: Array[Short], // numBuckets * 4 slots; 0 = empty
    var stash: Short,
    var count: Long) extends Serializable {

  import CuckooFilter._

  @inline private def bucketOf(key: Long): Int =
    (BloomFilter.mix1(key) & (numBuckets - 1)).toInt

  @inline private def altBucket(b: Int, fp: Short): Int =
    (b ^ (BloomFilter.mix2(fp.toLong & 0xffffL) & (numBuckets - 1)).toInt) & (numBuckets - 1)

  @inline private def fpOf(key: Long): Short = {
    val f = (BloomFilter.mix2(key) & 0xffffL).toShort
    if (f == 0) 1.toShort else f // 0 is the empty marker
  }

  private def bucketHas(b: Int, fp: Short): Int = {
    val base = b << 2
    var i = 0
    while (i < 4) {
      if (table(base + i) == fp) return base + i
      i += 1
    }
    -1
  }

  private def bucketInsert(b: Int, fp: Short): Boolean = {
    val base = b << 2
    var i = 0
    while (i < 4) {
      if (table(base + i) == 0) { table(base + i) = fp; return true }
      i += 1
    }
    false
  }

  /** Insert; returns false only when the filter is saturated (stash full). */
  def insert(key: Long): Boolean = {
    val fp0 = fpOf(key)
    val b1 = bucketOf(key)
    val b2 = altBucket(b1, fp0)
    if (bucketInsert(b1, fp0) || bucketInsert(b2, fp0)) { count += 1; return true }
    // evict loop — deterministic victim slot from the kick counter
    var b = if (((BloomFilter.mix1(key ^ fp0.toLong) & 1L) == 0L)) b1 else b2
    var fp = fp0
    var kick = 0
    while (kick < MaxKicks) {
      val slot = (b << 2) + (BloomFilter.mix1(kick.toLong ^ fp.toLong & 0xffffL) & 3L).toInt
      val victim = table(slot)
      table(slot) = fp
      fp = victim
      b = altBucket(b, fp)
      if (bucketInsert(b, fp)) { count += 1; return true }
      kick += 1
    }
    if (stash == 0) { stash = fp; count += 1; true } else false
  }

  def mightContain(key: Long): Boolean = {
    val fp = fpOf(key)
    if (stash == fp) return true
    val b1 = bucketOf(key)
    if (bucketHas(b1, fp) >= 0) return true
    bucketHas(altBucket(b1, fp), fp) >= 0
  }

  /** Delete one copy of the key's fingerprint; true if something was removed.
    * (Per Fan'14, only delete items known to have been inserted.) */
  def delete(key: Long): Boolean = {
    val fp = fpOf(key)
    val b1 = bucketOf(key)
    var slot = bucketHas(b1, fp)
    if (slot < 0) slot = bucketHas(altBucket(b1, fp), fp)
    if (slot >= 0) { table(slot) = 0; count -= 1; return true }
    if (stash == fp) { stash = 0; count -= 1; return true }
    false
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + 4 + 2 + 8 + table.length * 2)
    bb.putInt(CuckooFilter.Magic).putInt(1).putInt(numBuckets).putShort(stash).putLong(count)
    var i = 0
    while (i < table.length) { bb.putShort(table(i)); i += 1 }
    bb.array()
  }
}

object CuckooFilter {
  val Magic = 0x47434b46 // "GCKF"
  val MaxKicks = 500

  /** Capacity for n items at ~95% load: buckets = next pow2 of n/4/0.95. */
  def create(n: Long): CuckooFilter = {
    val needed = math.max(8L, math.ceil(n / 4.0 / 0.95).toLong)
    var pow2 = 8
    while (pow2 < needed && pow2 < (1 << 29)) pow2 <<= 1
    new CuckooFilter(pow2, new Array[Short](pow2 * 4), 0, 0L)
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val magic = bb.getInt; val ver = bb.getInt
    require(magic == Magic && ver == 1, s"bad cuckoo header: $magic/$ver")
    val numBuckets = bb.getInt
    val stash = bb.getShort
    val count = bb.getLong
    val table = new Array[Short](numBuckets * 4)
    var i = 0
    while (i < table.length) { table(i) = bb.getShort; i += 1 }
    new CuckooFilter(numBuckets, table, stash, count)
  }
}

/**
 * Common seen-set membership surface: the engine is generic over the sketch
 * kind (SURVEY.md ops 24/25); exact-tier parity tests swap in a ground-truth
 * set behind the same trait.
 */
trait SeenFilter extends Serializable {
  def mightContain(key: Long): Boolean
  def insert(key: Long): Unit
}

object SeenFilter {
  final class OfBloom(val b: BloomFilter) extends SeenFilter {
    def mightContain(key: Long): Boolean = b.mightContain(key)
    def insert(key: Long): Unit = b.insert(key)
  }
  final class OfCuckoo(val c: CuckooFilter) extends SeenFilter {
    def mightContain(key: Long): Boolean = c.mightContain(key)
    def insert(key: Long): Unit = c.insert(key)
  }

  /** Sniff the wire format by magic header. */
  def deserialize(bytes: Array[Byte]): SeenFilter = {
    val magic = java.nio.ByteBuffer.wrap(bytes, 0, 4).getInt
    if (magic == BloomFilter.Magic) new OfBloom(BloomFilter.deserialize(bytes))
    else new OfCuckoo(CuckooFilter.deserialize(bytes))
  }
}
