package graft.sketch

/**
 * Partition-local Bloom filter over 64-bit keys (xxhash64 of canonical URL).
 *
 * Classic Bloom (Bloom 1970, CACM 13(7)) with double hashing
 * (Kirsch–Mitzenmacher): h_i(x) = h1(x) + i*h2(x). Keys are already
 * 64-bit hashes, so h1/h2 are cheap finalizers (splitmix64 steps).
 *
 * The serialized form is OUR wire format (magic+version header) because the
 * filters live as `BinaryType` cells in a state table that must be readable
 * across rounds and releases — we do not depend on Spark's internal sketch
 * serialization.
 *
 * Word-array OR-merge is associative+commutative ⇒ usable as the partial/
 * final merge of an Aggregator (SURVEY.md op 35).
 */
final class BloomFilter private (val numBits: Int, val numHashes: Int, val words: Array[Long])
    extends Serializable {

  def insert(key: Long): Unit = {
    val h1 = BloomFilter.mix1(key)
    val h2 = BloomFilter.mix2(key) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits).toInt
      words(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
  }

  def mightContain(key: Long): Boolean = {
    val h1 = BloomFilter.mix1(key)
    val h2 = BloomFilter.mix2(key) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits).toInt
      if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** In-place OR merge; both sides must share geometry. */
  def merge(other: BloomFilter): BloomFilter = {
    require(other.numBits == numBits && other.numHashes == numHashes,
      s"bloom geometry mismatch: ($numBits,$numHashes) vs (${other.numBits},${other.numHashes})")
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
    this
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + words.length * 8)
    bb.putInt(BloomFilter.Magic).putInt(1).putInt(numBits).putInt(numHashes)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }
}

object BloomFilter {
  val Magic = 0x47424c4d // "GBLM"

  /** splitmix64 finalizer variants — avalanche the already-hashed key. */
  def mix1(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def mix2(z0: Long): Long = mix1(z0 + 0x632be59bd9b4e019L)

  /** (numBits, numHashes) for `n` expected items at false-positive rate
    * `fpp` — the standard m = −n·ln p / ln²2 sizing, floored at one word
    * and capped at the serializable max. THE single sizing authority: the
    * crawl loop's adaptive resizing and resume-header adoption depend on
    * exact geometry equality (merge requires on it), so every sizing
    * decision must flow through here. */
  def geometry(n: Long, fpp: Double): (Int, Int) = {
    val bits0 = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val bits = math.max(64L, math.min(bits0, Int.MaxValue.toLong - 64)).toInt
    val k = math.max(1, math.round(bits.toDouble / n * math.log(2)).toInt)
    (bits, k)
  }

  /** Size for `n` expected items at false-positive rate `fpp`. */
  def create(n: Long, fpp: Double): BloomFilter = {
    val (bits, k) = geometry(n, fpp)
    new BloomFilter(bits, k, new Array[Long]((bits + 63) >>> 6))
  }

  def deserialize(bytes: Array[Byte]): BloomFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val magic = bb.getInt; val ver = bb.getInt
    require(magic == Magic && ver == 1, s"bad bloom header: $magic/$ver")
    val numBits = bb.getInt; val numHashes = bb.getInt
    val words = new Array[Long]((numBits + 63) >>> 6)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong; i += 1 }
    new BloomFilter(numBits, numHashes, words)
  }
}
