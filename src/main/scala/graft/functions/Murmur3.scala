package graft.functions

/** Canonical 32-bit murmur3 (murmur3_x86_32, Austin Appleby's public
  * algorithm) — the hash the Iceberg spec's `bucket[N]` partition
  * transform requires (spec §Appendix B: 32-bit Hash Requirements).
  *
  * This is NOT Spark's `functions.hash` / `Murmur3Hash` (Spark seeds with
  * 42 and uses its own tail handling for byte arrays) and NOT the
  * replayable multiplicative (LCG) hash the oracle-checked bucket keys use
  * ([[graft.lake.iceberg.IcebergTable.appendBucket]]'s default, chosen so
  * DuckDB can replay the exact bucket ids) — it is the spec form a real
  * Iceberg reader interoperating on the layout would compute, pinned by
  * the spec's published test vectors in `Murmur3Spec`:
  * `hashLong(34) == 2017239379`, `hashBytes("iceberg") == 1210000089`,
  * `hashLong(17486 /* date 2017-11-16 */) == -653330422`.
  *
  * Int/date/long/timestamp values all hash as the LITTLE-ENDIAN bytes of
  * the widened long (spec rule: int and date promote to long so the same
  * value buckets identically across type promotions). */
object Murmur3 {
  private val C1 = 0xcc9e2d51
  private val C2 = 0x1b873593

  private def mixK1(k1in: Int): Int = {
    var k1 = k1in * C1
    k1 = Integer.rotateLeft(k1, 15)
    k1 * C2
  }

  private def mixH1(h1in: Int, k1: Int): Int = {
    var h1 = h1in ^ k1
    h1 = Integer.rotateLeft(h1, 13)
    h1 * 5 + 0xe6546b64
  }

  private def fmix(h1in: Int, len: Int): Int = {
    var h1 = h1in ^ len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** murmur3_x86_32 over a byte array, seed 0 (the spec's seed). */
  def hashBytes(bytes: Array[Byte], seed: Int = 0): Int = {
    val len = bytes.length
    var h1 = seed
    var i = 0
    while (i + 4 <= len) {
      val k = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
      h1 = mixH1(h1, mixK1(k))
      i += 4
    }
    // canonical tail: remaining 1–3 bytes fold into one k1 (little-endian),
    // mixed WITHOUT the h1 rotation — the part Spark's hashUnsafeBytes
    // does differently, which is why this exists as its own implementation
    var k1 = 0
    (len & 3) match {
      case 3 =>
        k1 ^= (bytes(i + 2) & 0xff) << 16
        k1 ^= (bytes(i + 1) & 0xff) << 8
        k1 ^= bytes(i) & 0xff
        h1 ^= mixK1(k1)
      case 2 =>
        k1 ^= (bytes(i + 1) & 0xff) << 8
        k1 ^= bytes(i) & 0xff
        h1 ^= mixK1(k1)
      case 1 =>
        k1 ^= bytes(i) & 0xff
        h1 ^= mixK1(k1)
      case _ => ()
    }
    fmix(h1, len)
  }

  /** Spec hash of an integral value: the 8 little-endian bytes of the
    * widened long (two 4-byte blocks — inlined, no array allocation: this
    * runs per row inside codegen). */
  def hashLong(v: Long): Int = {
    var h1 = 0 // seed 0
    h1 = mixH1(h1, mixK1(v.toInt))
    h1 = mixH1(h1, mixK1((v >>> 32).toInt))
    fmix(h1, 8)
  }

  /** Spec `bucket[n]` of an integral value: (hash & Int.MaxValue) % n. */
  def bucketLong(v: Long, n: Int): Int =
    (hashLong(v) & Integer.MAX_VALUE) % n

  /** Spec `bucket[n]` of a string: murmur3 of its UTF-8 bytes. */
  def bucketString(s: org.apache.spark.unsafe.types.UTF8String, n: Int): Int =
    (hashBytes(s.getBytes) & Integer.MAX_VALUE) % n
}
