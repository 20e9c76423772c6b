package graft

import graft.functions.Murmur3
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Murmur3]] to the Iceberg spec's PUBLISHED hash test vectors
  * (spec §Appendix B: 32-bit Hash Requirements — the table of
  * `hash(value)` results every conforming implementation must reproduce).
  * These vectors are what make the opt-in spec bucket mode
  * ([[graft.lake.iceberg.IcebergTable.appendBucket]] `murmur3 = true`)
  * interoperable: a real Iceberg reader planning a point lookup against
  * our bucket layout computes these exact integers. */
class Murmur3Spec extends AnyFunSuite {

  test("spec vector: int/long 34 hash as 8 LE bytes of the widened long") {
    assert(Murmur3.hashLong(34L) === 2017239379)
  }

  test("spec vector: date 2017-11-16 (17486 days) hashes as its long") {
    assert(Murmur3.hashLong(17486L) === -653330422)
  }

  test("spec vector: time 22:31:08 (81068000000 micros)") {
    assert(Murmur3.hashLong(81068000000L) === -662762989)
  }

  test("spec vector: timestamp 2017-11-16T22:31:08 (1510871468000000 micros)") {
    assert(Murmur3.hashLong(1510871468000000L) === -2047944441)
  }

  test("spec vector: string 'iceberg' hashes its UTF-8 bytes") {
    assert(Murmur3.hashBytes("iceberg".getBytes("UTF-8")) === 1210000089)
  }

  test("spec vector: fixed/binary 0x00010203") {
    assert(Murmur3.hashBytes(Array[Byte](0, 1, 2, 3)) === -188683207)
  }

  test("hashLong equals hashBytes over the long's little-endian bytes") {
    for (v <- Seq(0L, 1L, -1L, 34L, Long.MaxValue, Long.MinValue, 1510871468000000L)) {
      val le = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()
      assert(Murmur3.hashLong(v) === Murmur3.hashBytes(le), s"value $v")
    }
  }

  test("bucketLong is (hash & Int.MaxValue) % n and never negative") {
    assert(Murmur3.bucketLong(34L, 16) === (2017239379 & Int.MaxValue) % 16)
    // a value whose hash is negative must still bucket non-negatively
    assert(Murmur3.hashLong(17486L) < 0)
    assert(Murmur3.bucketLong(17486L, 16) >= 0)
    assert(Murmur3.bucketLong(17486L, 16) === ((-653330422 & Int.MaxValue) % 16))
  }
}
