package graft.core

/** Common shape of the partition-local seen-set negative caches: "definitely
  * absent / maybe present" over already-hashed 64-bit url hashes. Two
  * implementations — [[BloomFilter64]] (default; no deletes) and
  * [[CuckooFilter64]] (the north rule's deletion-capable fallback a bucket
  * transitions to the first time seen-set entries are retracted from it).
  */
trait SeenFilter {
  def mightContain(key: Long): Boolean
}

/** Serializable 64-bit-key Bloom filter used as a partition-local negative
  * cache in front of the exact seen-set anti-join (the exact set stays
  * authoritative). Capability shape mirrors the reference's alternative
  * seen-set (`Abot/Core/BloomFilterCrawledUrlRepository.cs:19`,
  * `Abot/Util/BloomFilter.cs:178-192,282-286`): capacity + target FPR derive
  * bit count and hash count; membership is "definitely absent / maybe
  * present"; no deletes.
  *
  * Keys are already-hashed 64-bit url hashes; k index functions are derived
  * by double hashing h1 + i*h2 (Kirsch–Mitzenmacher).
  */
final class BloomFilter64(val numBits: Long, val numHashes: Int)
    extends SeenFilter with Serializable {
  require(numBits > 0 && numHashes > 0)
  private val words = new Array[Long](((numBits + 63) / 64).toInt)

  @inline private def setBit(idx: Long): Unit = {
    val w = (idx >>> 6).toInt
    words(w) |= (1L << (idx & 63))
  }
  @inline private def getBit(idx: Long): Boolean = {
    val w = (idx >>> 6).toInt
    (words(w) & (1L << (idx & 63))) != 0
  }

  def add(key: Long): Unit = {
    val h1 = XxHash64.hashLong(key, 0L)
    val h2 = XxHash64.hashLong(key, 1L) | 1L
    var i = 0
    while (i < numHashes) {
      setBit(java.lang.Math.floorMod(h1 + i * h2, numBits))
      i += 1
    }
  }

  def mightContain(key: Long): Boolean = {
    val h1 = XxHash64.hashLong(key, 0L)
    val h2 = XxHash64.hashLong(key, 1L) | 1L
    var i = 0
    while (i < numHashes) {
      if (!getBit(java.lang.Math.floorMod(h1 + i * h2, numBits))) return false
      i += 1
    }
    true
  }

  def merge(other: BloomFilter64): BloomFilter64 = {
    require(other.numBits == numBits && other.numHashes == numHashes)
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
    this
  }

  def serializedSizeBytes: Long = words.length.toLong * 8

  /** Bit array as bytes (little-endian longs) — for persisting partition-
    * local filters as table rows.
    */
  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    words.foreach(bb.putLong)
    bb.array()
  }
}

object BloomFilter64 {
  /** Standard sizing: m = -n ln p / (ln 2)^2, k = m/n ln 2. */
  def forCapacity(expectedItems: Long, fpr: Double): BloomFilter64 = {
    val n = math.max(1L, expectedItems)
    val m = math.ceil(-n * math.log(fpr) / (math.log(2) * math.log(2))).toLong
    val k = math.max(1, math.round(m.toDouble / n * math.log(2)).toInt)
    new BloomFilter64(m, k)
  }

  /** Inverse of toBytes. */
  def fromBytes(numBits: Long, numHashes: Int, bytes: Array[Byte]): BloomFilter64 = {
    val bf = new BloomFilter64(numBits, numHashes)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < bf.words.length && bb.remaining() >= 8) {
      bf.words(i) = bb.getLong(); i += 1
    }
    bf
  }
}

/** Cuckoo filter over 64-bit keys — the deletion-capable fallback the north
  * rule asks for when seen-set entries must be retractable (e.g. retry
  * bookkeeping). 4-slot buckets, 16-bit fingerprints, standard partial-key
  * cuckoo hashing (Fan et al., "Cuckoo Filter: Practically Better Than
  * Bloom", CoNEXT 2014 — public paper).
  */
final class CuckooFilter64(val log2Buckets: Int, maxKicks: Int = 500)
    extends SeenFilter with Serializable {
  private val numBuckets = 1 << log2Buckets
  private val table = new Array[Short](numBuckets * 4)
  private var rng = new java.util.Random(42)
  private var countItems = 0L

  @inline private def fingerprint(key: Long): Short = {
    val f = (XxHash64.hashLong(key, 7L) & 0xffffL).toShort
    if (f == 0) 1.toShort else f
  }
  @inline private def bucketOf(key: Long): Int =
    (XxHash64.hashLong(key, 0L) & (numBuckets - 1)).toInt
  @inline private def altBucket(b: Int, f: Short): Int =
    (b ^ (XxHash64.hashLong(f.toLong & 0xffffL, 0L) & (numBuckets - 1)).toInt) & (numBuckets - 1)

  private def tryInsert(b: Int, f: Short): Boolean = {
    var s = 0
    while (s < 4) {
      if (table(b * 4 + s) == 0) { table(b * 4 + s) = f; return true }
      s += 1
    }
    false
  }

  def add(key: Long): Boolean = {
    var f = fingerprint(key)
    val b1 = bucketOf(key)
    val b2 = altBucket(b1, f)
    if (tryInsert(b1, f) || tryInsert(b2, f)) { countItems += 1; return true }
    var b = if (rng.nextBoolean()) b1 else b2
    var kicks = 0
    while (kicks < maxKicks) {
      val s = rng.nextInt(4)
      val evicted = table(b * 4 + s)
      table(b * 4 + s) = f
      f = evicted
      b = altBucket(b, f)
      if (tryInsert(b, f)) { countItems += 1; return true }
      kicks += 1
    }
    false // table too full
  }

  def mightContain(key: Long): Boolean = {
    val f = fingerprint(key)
    val b1 = bucketOf(key)
    val b2 = altBucket(b1, f)
    var s = 0
    while (s < 4) {
      if (table(b1 * 4 + s) == f || table(b2 * 4 + s) == f) return true
      s += 1
    }
    false
  }

  def remove(key: Long): Boolean = {
    val f = fingerprint(key)
    val b1 = bucketOf(key)
    val b2 = altBucket(b1, f)
    var s = 0
    while (s < 4) {
      if (table(b1 * 4 + s) == f) { table(b1 * 4 + s) = 0; countItems -= 1; return true }
      if (table(b2 * 4 + s) == f) { table(b2 * 4 + s) = 0; countItems -= 1; return true }
      s += 1
    }
    false
  }

  def size: Long = countItems

  def serializedSizeBytes: Long = table.length.toLong * 2

  /** Slot array as bytes (little-endian shorts) — same persistence shape as
    * [[BloomFilter64.toBytes]], for filter-bucket table rows.
    */
  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(table.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    table.foreach(bb.putShort)
    bb.array()
  }
}

object CuckooFilter64 {
  /** Slots sized for `expectedItems` at a conservative 0.8 load factor
    * (4-slot buckets reach ~0.95 with kicking; the headroom keeps the
    * saturation fallback rare).
    */
  def forCapacity(expectedItems: Long): CuckooFilter64 = {
    val n = math.max(1L, expectedItems)
    val buckets = math.max(4L, math.ceil(n / (4.0 * 0.8)).toLong)
    val log2 = 64 - java.lang.Long.numberOfLeadingZeros(buckets - 1) // ceil log2
    new CuckooFilter64(math.min(28, math.max(2, log2)))
  }

  /** Inverse of toBytes. `count` restores the size() bookkeeping. */
  def fromBytes(log2Buckets: Int, count: Long, bytes: Array[Byte]): CuckooFilter64 = {
    val cf = new CuckooFilter64(log2Buckets)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < cf.table.length && bb.remaining() >= 2) {
      cf.table(i) = bb.getShort(); i += 1
    }
    cf.countItems = count
    cf
  }
}
