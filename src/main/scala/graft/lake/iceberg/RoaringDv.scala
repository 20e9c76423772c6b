package graft.lake.iceberg

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

/** Byte-real Roaring-bitmap serialization for Iceberg v3 DELETION VECTORS.
  *
  * Iceberg v3 stores positional deletes as per-data-file bitmaps packed into
  * Puffin files (blob type `deletion-vector-v1`) instead of v2's
  * (file_path, pos) parquet rows — the representation the reference's DV
  * resolution/delete-storm studies cost-model (the repo's `lake_dv_roaring`
  * modeled these byte sizes in r9; this object WRITES them). Everything here
  * follows two public specs:
  *
  *  1. RoaringFormatSpec (github.com/RoaringBitmap/RoaringFormatSpec) — the
  *     32-bit "standard" portable serialization: little-endian cookie
  *     (12346 without run containers, +count word; 12347 with runs embeds
  *     count-1 in the upper 16 bits and is followed by a run-flag bitset),
  *     a (key, cardinality-1) descriptive header per container, an offset
  *     header (always for cookie 12346; for 12347 only at ≥4 containers),
  *     then containers in key order — array (sorted u16s, card ≤ 4096),
  *     bitmap (fixed 8 KiB), or run (u16 run count + (start, length-1)
  *     pairs). The writer picks run iff its bytes are strictly smaller than
  *     the cheaper of array/bitmap (CRoaring's runOptimize rule — exactly
  *     the `lake_dv_roaring` model's decision column, so the model's
  *     arithmetic doubles as this serializer's oracle).
  *  2. The Iceberg Puffin spec's `deletion-vector-v1` blob: 64-bit
  *     positions split into a u32 key (high 4 bytes) and u32 sub-position;
  *     the vector serializes as a u64 LE bitmap count then, per key in
  *     unsigned order, u32 LE key + the 32-bit standard serialization; the
  *     blob frames it as [len(magic+vector) u32 BE][magic D1 D3 39 64]
  *     [vector][CRC-32 of magic+vector, u32 BE], uncompressed.
  *
  * Reference behavior mirrored: `test_dv_resolution_strategies.py` /
  * `test_delete_storm.py` measure positional-delete resolution and DV
  * sizes; this is the v3 on-disk form those studies' tables converge to. */
object RoaringDv {

  val SerialCookieNoRuns = 12346
  val SerialCookieRuns = 12347
  val NoOffsetThreshold = 4
  val ArrayMaxCard = 4096
  /** `deletion-vector-v1` magic (Puffin spec). */
  val DvMagic: Array[Byte] = Array(0xD1, 0xD3, 0x39, 0x64).map(_.toByte)

  private final case class Container(key: Int, values: Array[Int]) {
    // values: sorted distinct 16-bit low parts (0..65535) as Ints
    def card: Int = values.length
    def nRuns: Int = {
      var n = 0; var i = 0
      while (i < values.length) { if (i == 0 || values(i) != values(i - 1) + 1) n += 1; i += 1 }
      n
    }
    def arrBytes: Int = 2 * card
    def runBytes: Int = 2 + 4 * nRuns
    /** CRoaring runOptimize: run iff strictly smaller than min(array, bitmap). */
    def isRun: Boolean = runBytes < math.min(arrBytes, 8192)
    def isBitmap: Boolean = !isRun && card > ArrayMaxCard
    def bytes: Int = if (isRun) runBytes else if (card > ArrayMaxCard) 8192 else arrBytes
  }

  private def containers(positions: Array[Long]): Array[Container] = {
    require(positions.forall(p => p >= 0 && p <= 0xFFFFFFFFL), "32-bit domain")
    positions.sorted.distinct
      .groupBy(p => (p >>> 16).toInt).toArray.sortBy(_._1)
      .map { case (k, ps) => Container(k, ps.map(p => (p & 0xFFFF).toInt)) }
  }

  /** Container census of a position set: (containers, array, bitmap, run) —
    * the same classification the serializer commits to bytes, exposed so a
    * decoded-blob census can be compared against an independent oracle. */
  def census(positions: Array[Long]): (Int, Int, Int, Int) = {
    val cs = containers(positions)
    (cs.length, cs.count(c => !c.isRun && c.card <= ArrayMaxCard),
      cs.count(_.isBitmap), cs.count(_.isRun))
  }

  /** Serialized size of the 32-bit standard format for a position set —
    * pure integer arithmetic (this is what the DuckDB oracle recomputes). */
  def serialized32Size(positions: Array[Long]): Int = {
    val cs = containers(positions)
    val n = cs.length
    val hasRun = cs.exists(_.isRun)
    val header =
      if (hasRun) 4 + (n + 7) / 8 + 4 * n + (if (n >= NoOffsetThreshold) 4 * n else 0)
      else 4 + 4 + 4 * n + 4 * n
    header + cs.map(_.bytes).sum
  }

  /** 32-bit standard portable serialization (RoaringFormatSpec). */
  def serialize32(positions: Array[Long]): Array[Byte] = {
    val cs = containers(positions)
    val n = cs.length
    val hasRun = cs.exists(_.isRun)
    val buf = ByteBuffer.allocate(serialized32Size(positions)).order(ByteOrder.LITTLE_ENDIAN)
    if (hasRun) {
      buf.putInt(SerialCookieRuns | ((n - 1) << 16))
      val flags = new Array[Byte]((n + 7) / 8)
      cs.zipWithIndex.foreach { case (c, i) =>
        if (c.isRun) flags(i / 8) = (flags(i / 8) | (1 << (i % 8))).toByte
      }
      buf.put(flags)
    } else {
      buf.putInt(SerialCookieNoRuns)
      buf.putInt(n)
    }
    cs.foreach { c => buf.putShort(c.key.toShort); buf.putShort((c.card - 1).toShort) }
    if (!hasRun || n >= NoOffsetThreshold) {
      var off = buf.position() + 4 * n
      cs.foreach { c => buf.putInt(off); off += c.bytes }
    }
    cs.foreach { c =>
      if (c.isRun) {
        buf.putShort(c.nRuns.toShort)
        var i = 0
        while (i < c.values.length) {
          val start = c.values(i)
          var j = i
          while (j + 1 < c.values.length && c.values(j + 1) == c.values(j) + 1) j += 1
          buf.putShort(start.toShort); buf.putShort((c.values(j) - start).toShort)
          i = j + 1
        }
      } else if (c.card > ArrayMaxCard) {
        val words = new Array[Long](1024)
        c.values.foreach(v => words(v >>> 6) |= (1L << (v & 63)))
        words.foreach(buf.putLong)
      } else c.values.foreach(v => buf.putShort(v.toShort))
    }
    buf.array()
  }

  /** Read back a 32-bit standard serialization (all three container types,
    * both cookie forms) — the reader any spec-following tool implements. */
  def deserialize32(bytes: Array[Byte], at: Int = 0): (Array[Long], Int) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).position(at)
    val cookie = buf.getInt
    val (n, runFlags) =
      if ((cookie & 0xFFFF) == SerialCookieRuns) {
        val n = (cookie >>> 16) + 1
        val flags = new Array[Byte]((n + 7) / 8)
        buf.get(flags)
        (n, Some(flags))
      } else {
        require(cookie == SerialCookieNoRuns, s"bad roaring cookie $cookie")
        (buf.getInt, None)
      }
    val keys = new Array[Int](n); val cards = new Array[Int](n)
    (0 until n).foreach { i =>
      keys(i) = buf.getShort & 0xFFFF; cards(i) = (buf.getShort & 0xFFFF) + 1
    }
    val hasOffsets = runFlags.isEmpty || n >= NoOffsetThreshold
    if (hasOffsets) (0 until n).foreach(_ => buf.getInt) // offsets are redundant on a full read
    val out = Array.newBuilder[Long]
    (0 until n).foreach { i =>
      val base = keys(i).toLong << 16
      val isRun = runFlags.exists(f => (f(i / 8) & (1 << (i % 8))) != 0)
      if (isRun) {
        val nr = buf.getShort & 0xFFFF
        (0 until nr).foreach { _ =>
          val start = buf.getShort & 0xFFFF; val len = buf.getShort & 0xFFFF
          (start to start + len).foreach(v => out += base | v)
        }
      } else if (cards(i) > ArrayMaxCard) {
        (0 until 1024).foreach { w =>
          var word = buf.getLong; var b = 0
          while (word != 0) {
            if ((word & 1L) != 0) out += base | (w * 64 + b)
            word >>>= 1; b += 1
          }
        }
      } else (0 until cards(i)).foreach(_ => out += base | (buf.getShort & 0xFFFF))
    }
    (out.result(), buf.position())
  }

  /** Serialize a full `deletion-vector-v1` blob payload: the portable-64
    * wrapper (u64 LE bitmap count; per 32-bit key in unsigned order,
    * u32 LE key + standard 32-bit bytes) framed with the spec's length /
    * magic / CRC-32 envelope. */
  def serializeDvBlob(positions: Array[Long]): Array[Byte] = {
    require(positions.nonEmpty, "empty deletion vector")
    val byKey = positions.sorted.distinct.groupBy(_ >>> 32).toSeq.sortBy(_._1)
    val vec = {
      val parts = byKey.map { case (hi, ps) =>
        val keyBytes = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
          .putInt(hi.toInt).array()
        keyBytes ++ serialize32(ps.map(_ & 0xFFFFFFFFL))
      }
      val count = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(byKey.size.toLong).array()
      count ++ parts.flatten
    }
    val crc = new CRC32()
    crc.update(DvMagic); crc.update(vec)
    val out = ByteBuffer.allocate(4 + 4 + vec.length + 4) // BE framing words
    out.putInt(4 + vec.length).put(DvMagic).put(vec).putInt(crc.getValue.toInt)
    out.array()
  }

  /** Decode + verify a `deletion-vector-v1` blob: check framing length,
    * magic, and CRC-32, then expand every 64-bit position. */
  def deserializeDvBlob(blob: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(blob) // big-endian framing
    val len = buf.getInt
    require(len == blob.length - 8, s"dv framing length $len vs ${blob.length - 8}")
    val magic = new Array[Byte](4); buf.get(magic)
    require(magic.sameElements(DvMagic), "dv magic mismatch")
    val vec = java.util.Arrays.copyOfRange(blob, 8, blob.length - 4)
    val crc = new CRC32(); crc.update(DvMagic); crc.update(vec)
    val stored = ByteBuffer.wrap(blob, blob.length - 4, 4).getInt
    require(crc.getValue.toInt == stored, "dv crc mismatch")
    val vb = ByteBuffer.wrap(vec).order(ByteOrder.LITTLE_ENDIAN)
    val nKeys = vb.getLong
    val out = Array.newBuilder[Long]
    var at = 8
    (0L until nKeys).foreach { _ =>
      val hi = ByteBuffer.wrap(vec, at, 4).order(ByteOrder.LITTLE_ENDIAN).getInt.toLong << 32
      val (ps, next) = deserialize32(vec, at + 4)
      ps.foreach(p => out += hi | p)
      at = next
    }
    out.result()
  }
}
