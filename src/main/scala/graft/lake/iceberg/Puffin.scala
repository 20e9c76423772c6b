package graft.lake.iceberg

import java.io.File
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** A from-scratch writer/reader for the Puffin file format — Iceberg's
  * statistics-file container (public spec: iceberg.apache.org/puffin-spec).
  * Puffin is how a table ships NDV sketches and other secondary statistics
  * alongside its snapshots: the file holds opaque BLOBS plus a JSON footer
  * describing them, and table metadata points at it via the `statistics`
  * field (spec §Table Statistics) so planners can cost queries without
  * touching data.
  *
  * Layout implemented exactly as specified:
  * {{{
  *   Magic | Blob₁ | … | Blobₙ | Footer
  *   Footer = Magic | FooterPayload (UTF-8 JSON FileMetadata)
  *          | FooterPayloadSize (4-byte little-endian int)
  *          | Flags (4 bytes; bit 0 = payload compressed — we write 0)
  *          | Magic
  * }}}
  * Magic is the 4 bytes 0x50 0x46 0x41 0x31 ("PFA1"). FileMetadata JSON is
  * `{"blobs":[BlobMetadata…],"properties":{…}}` with the spec's field
  * names (`type`, `fields`, `snapshot-id`, `sequence-number`, `offset`,
  * `length`).
  *
  * The one honest deviation: blob TYPE. The spec's standard sketch type is
  * `apache-datasketches-theta-v1`; serializing a byte-exact DataSketches
  * theta image without the library would be a fake, so blobs carry the
  * vendor type `graft-kmv-v1` (the spec explicitly allows non-standard
  * types) — a KMV (k minimum values) distinct-count sketch whose payload
  * is the k smallest DISTINCT 32-bit multiplicative hashes of the column,
  * serialized as big-endian longs. KMV is deliberately chosen over theta
  * here because its estimate is an exact deterministic function of the
  * data (`(k-1)·2³²/h_k`), so the DuckDB oracle can recompute it in SQL
  * and hash-match the query output — the same determinism contract every
  * other fixture in this repo follows. */
object Puffin {

  val Magic: Array[Byte] = Array(0x50, 0x46, 0x41, 0x31).map(_.toByte)

  /** Spec BlobMetadata (the JSON footer entry describing one blob).
    * `properties` is the spec's optional per-blob map — the
    * `deletion-vector-v1` type REQUIRES `referenced-data-file` and
    * `cardinality` entries there; statistics blobs leave it empty (and the
    * footer JSON then omits it, keeping pre-existing files byte-identical). */
  final case class BlobMetadata(blobType: String, fields: Seq[Int], snapshotId: Long,
                                sequenceNumber: Long, offset: Long, length: Long,
                                properties: Map[String, String] = Map.empty)

  final case class FileMetadata(blobs: Seq[BlobMetadata], properties: Map[String, String])

  /** One blob to write: payload + the footer metadata describing it. */
  final case class BlobSpec(blobType: String, fields: Seq[Int], snapshotId: Long,
                            sequenceNumber: Long, payload: Array[Byte],
                            properties: Map[String, String] = Map.empty)

  /** Write a Puffin file; `blobs` are (type, field-ids, snapshot-id,
    * sequence-number, payload). Returns (fileSize, footerPayloadSize) —
    * the two numbers the table metadata's `statistics` entry records. */
  def write(file: File, blobs: Seq[(String, Seq[Int], Long, Long, Array[Byte])],
            properties: Map[String, String] = Map.empty): (Long, Long) = {
    val (size, footer, _) = writeBlobs(file,
      blobs.map { case (t, f, s, q, p) => BlobSpec(t, f, s, q, p) }, properties)
    (size, footer)
  }

  /** Write a Puffin file from [[BlobSpec]]s, returning the per-blob footer
    * metadata too — a delete-file manifest entry needs each DV blob's
    * (offset, length) as its v3 `content_offset`/`content_size_in_bytes`. */
  def writeBlobs(file: File, blobs: Seq[BlobSpec],
                 properties: Map[String, String] = Map.empty)
      : (Long, Long, Seq[BlobMetadata]) = {
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(file))
    try {
      out.write(Magic)
      var offset = Magic.length.toLong
      val metas = blobs.map { b =>
        out.write(b.payload)
        val m = BlobMetadata(b.blobType, b.fields, b.snapshotId, b.sequenceNumber,
          offset, b.payload.length.toLong, b.properties)
        offset += b.payload.length
        m
      }
      def propsJsonOf(props: Map[String, String]): String = props.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
      val blobsJson = metas.map { m =>
        s"""{"type":"${m.blobType}","fields":${m.fields.mkString("[", ",", "]")},""" +
          s""""snapshot-id":${m.snapshotId},"sequence-number":${m.sequenceNumber},""" +
          s""""offset":${m.offset},"length":${m.length}""" +
          (if (m.properties.nonEmpty) s""","properties":${propsJsonOf(m.properties)}""" else "") +
          "}"
      }.mkString("[", ",", "]")
      val payload = s"""{"blobs":$blobsJson,"properties":${propsJsonOf(properties)}}"""
        .getBytes(StandardCharsets.UTF_8)
      out.write(Magic)
      out.write(payload)
      val tail = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(payload.length).array()
      out.write(tail)
      out.write(Array[Byte](0, 0, 0, 0)) // flags: footer payload uncompressed
      out.write(Magic)
      (offset + 4 + payload.length + 4 + 4 + 4, payload.length.toLong, metas)
    } finally out.close()
  }

  /** Read a Puffin file: footer-first like any spec reader (seek to the
    * tail, verify magics, parse FileMetadata), then slice each blob's
    * payload by its recorded (offset, length). The whole file is small
    * (statistics-grain) so one read suffices; a large-file reader would
    * range-request the same byte spans. */
  def read(file: File): (FileMetadata, BlobMetadata => Array[Byte]) = {
    val bytes = Files.readAllBytes(file.toPath)
    require(bytes.length >= 16, "not a Puffin file: too short")
    def magicAt(i: Int): Boolean = Magic.indices.forall(j => bytes(i + j) == Magic(j))
    require(magicAt(0) && magicAt(bytes.length - 4), "not a Puffin file: bad magic")
    val flags = bytes.slice(bytes.length - 8, bytes.length - 4)
    require((flags(0) & 1) == 0, "compressed footer payload not supported")
    val payloadSize = ByteBuffer.wrap(bytes, bytes.length - 12, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt
    val payloadStart = bytes.length - 12 - payloadSize
    require(magicAt(payloadStart - 4), "footer start magic missing")
    val json = new String(bytes, payloadStart, payloadSize, StandardCharsets.UTF_8)
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(json)
    val blobs = (j \ "blobs").children.map { b =>
      BlobMetadata((b \ "type").extract[String],
        (b \ "fields").children.map(_.extract[Int]),
        (b \ "snapshot-id").extract[Long],
        (b \ "sequence-number").extract[Long],
        (b \ "offset").extract[Long],
        (b \ "length").extract[Long],
        (b \ "properties") match {
          case JObject(fields) => fields.map { case (k, v) => k -> v.extract[String] }.toMap
          case _ => Map.empty[String, String]
        })
    }
    val props = (j \ "properties") match {
      case JObject(fields) => fields.map { case (k, v) => k -> v.extract[String] }.toMap
      case _ => Map.empty[String, String]
    }
    (FileMetadata(blobs, props),
      m => bytes.slice(m.offset.toInt, (m.offset + m.length).toInt))
  }

  /** KMV sketch hash domain: 32-bit multiplicative (Knuth) hashing —
    * `h(v) = (v · 2654435761) mod 2³²` — chosen because BOTH Spark SQL and
    * the DuckDB oracle can evaluate it exactly in integer SQL (a quality
    * hash like xxhash64 exists only on one side). */
  val KmvHashMult = 2654435761L
  val KmvHashMod = 4294967296L

  /** Serialize the k minimum distinct hash values (ascending) — the
    * `graft-kmv-v1` blob payload: big-endian longs, 8·|values| bytes. */
  def kmvPayload(values: Seq[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * values.size) // big-endian by default
    values.foreach(bb.putLong)
    bb.array()
  }

  def kmvDecode(payload: Array[Byte]): Seq[Long] = {
    val bb = ByteBuffer.wrap(payload)
    Seq.fill(payload.length / 8)(bb.getLong)
  }

  /** KMV distinct-count estimate from a decoded payload: exact when the
    * sketch saturated below k, else the classic `(k-1)·M / h_k`. */
  def kmvEstimate(mins: Seq[Long], k: Int): Double =
    if (mins.size < k) mins.size.toDouble
    else (k - 1).toDouble * KmvHashMod.toDouble / mins.last.toDouble
}
