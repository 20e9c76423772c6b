package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing (SURVEY.md §2.7).
  *
  * Media payloads are opaque `binary` columns with typed metadata. The real
  * decode (image/audio libraries) is STUBBED — `decodeStub` derives
  * deterministic fake features from the raw bytes — but the Spark-side
  * plumbing is real: binary columns flow through a typed `Dataset`
  * `mapPartitions` (batched per partition, the Scala analogue of
  * `mapInPandas` batch processing), schemas are explicit, and partitioning
  * is preserved. Swap `decodeStub` for a real codec and nothing else changes.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, byte_len: Long, checksum: Long, feature_bucket: Long)

  /** STUB decode: deterministic byte-level features standing in for a real
    * image/audio decoder (libs unavailable in this environment). */
  def decodeStub(payload: Array[Byte]): (Long, Long) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    (sum, sum % 16)
  }

  /** Typed mapPartitions pipeline over binary payloads (batch shape: one
    * iterator per partition, constant memory). */
  def extractFeaturesTyped(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (checksum, bucket) = decodeStub(r.payload)
        MediaFeatures(r.doc_id, r.payload.length.toLong, checksum, bucket)
      }
    }
  }

  /** Documents → binary payloads (UTF-8 bytes stand in for media blobs). */
  def payloads(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Frame sampling over binary payloads: treat the payload as fixed-width
    * frames (16 bytes), sample every `stride`-th frame, emit per-frame
    * features — the Spark-side plumbing of video frame extraction (generator
    * expansion + per-chunk featurize; swap the checksum for a real frame
    * decoder and nothing else changes). Query set bounded to keep the oracle
    * result compact. */
  def frameSample(documents: DataFrame, frameBytes: Int = 16, stride: Int = 4,
                  maxDocs: Int = 50): DataFrame =
    documents
      // Empty payloads have 0 frames; without the guard sequence(0, -1)
      // yields [0, -1] (descending default step) and emits bogus frame rows.
      .filter(col("doc_id") < maxDocs && length(col("text")) > 0)
      .withColumn("n_frames", ceil(length(col("text")) / lit(frameBytes.toDouble)).cast("long"))
      .select(col("doc_id"), col("text"), col("n_frames"),
        explode(expr(s"sequence(0L, n_frames - 1)")).as("frame_idx"))
      .filter(col("frame_idx") % stride === 0)
      .withColumn("frame",
        expr(s"substring(text, CAST(frame_idx * $frameBytes + 1 AS INT), $frameBytes)"))
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame")).cast("long").as("frame_len"),
        expr("graft_bytesum(CAST(frame AS BINARY))").as("frame_checksum"))
      .orderBy("doc_id", "frame_idx")

  /** Decode-batch planning: pack each source's payloads into inference
    * batches under a byte budget — the batch-shape planning a GPU decode
    * stage needs. The per-source running byte offset is a two-phase
    * `plans.PrefixSum` partitioned by source (exclusive, ordered by
    * doc_id), so a source with billions of payloads spreads over
    * |sources|×nBuckets tasks instead of one single-threaded window
    * partition per source — the same de-globalization the events deciles
    * got. Results are exact integer sums, bit-identical to the window
    * formulation. */
  def batchPlan(documents: DataFrame, budgetBytes: Long = 4096L): DataFrame = {
    val sized = documents
      .select(col("source"), col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("payload_bytes"))
    graft.plans.PrefixSum.prefixSum(sized, "doc_id", "payload_bytes", "bytes_before",
        inclusive = false, partitionCols = Seq("source"))
      .withColumn("batch_id", (col("bytes_before") / budgetBytes).cast("long"))
      .groupBy(col("source"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("payload_bytes")).as("batch_bytes"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("source", "batch_id")
  }

  /** Exact media dedup on (checksum, byte length) — the first gate of any
    * multimodal ingest (identical blobs under different names). Same
    * group-window shape as text dedup, keyed on the codegen'd byte checksum;
    * a real pipeline would add a second content-hash pass within groups. */
  def payloadDedup(documents: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("checksum"), col("byte_len"))
    documents
      .withColumn("payload", col("text").cast("binary"))
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("byte_len"),
        expr("graft_bytesum(payload)").as("checksum"))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("keep", col("doc_id") === min(col("doc_id")).over(w))
      .select(col("doc_id"), col("byte_len"), col("checksum"), col("group_size"), col("keep"))
      .orderBy("doc_id")
  }

  /** Frame-to-chunk alignment plan: proportionally map each payload's
    * fixed-width frames onto its text chunks — the integer skeleton of
    * audio/text forced alignment (each chunk owns a contiguous frame span,
    * spans partition the frame axis). `chunk = (frame_idx * n_chunks) div
    * n_frames` is exact integer math, so both engines agree and the spans
    * are reproducible. Generator expansion + one (doc, chunk) aggregate —
    * same shape as frame sampling; swap the proportional map for a real
    * aligner's output and the downstream contract is unchanged. */
  def chunkAlign(documents: DataFrame, frameBytes: Int = 16, tokensPerChunk: Int = 20,
                 maxDocs: Int = 50): DataFrame =
    documents
      // Zero-frame guard: see frameSample (sequence(0, -1) is non-empty).
      .filter(col("doc_id") < maxDocs && length(col("text")) > 0)
      .withColumn("n_frames", ceil(length(col("text")) / lit(frameBytes.toDouble)).cast("long"))
      .withColumn("n_chunks",
        ceil(size(split(trim(col("text")), "\\s+")) / lit(tokensPerChunk.toDouble)).cast("long"))
      .select(col("doc_id"), col("text"), col("n_frames"), col("n_chunks"),
        explode(expr("sequence(0L, n_frames - 1)")).as("frame_idx"))
      .withColumn("chunk_id", expr("(frame_idx * n_chunks) div n_frames"))
      .withColumn("frame_len",
        length(expr(s"substring(text, CAST(frame_idx * $frameBytes + 1 AS INT), $frameBytes)")).cast("long"))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(max(col("n_frames")).as("n_frames"), max(col("n_chunks")).as("n_chunks"),
        count(lit(1)).as("frames_in_chunk"),
        min(col("frame_idx")).as("first_frame"), max(col("frame_idx")).as("last_frame"),
        sum(col("frame_len")).as("chunk_bytes"))
      .orderBy("doc_id", "chunk_id")

  /** Frame-level dedup across payloads: aligned fixed-width frames that
    * recur (within or across docs) — the video/image analogue of boilerplate
    * detection, where repeated intro/outro frames shouldn't count as fresh
    * training signal. Group key is the frame *content* (checksum reported
    * alongside); only colliding groups are emitted. Generator expansion +
    * one group-aggregate — the same sub-quadratic shape as text dedup,
    * keyed by frame bytes instead of shingles. */
  def frameDedup(documents: DataFrame, frameBytes: Int = 16, maxDocs: Int = 100): DataFrame =
    documents
      // Zero-frame guard: see frameSample (sequence(0, -1) is non-empty).
      .filter(col("doc_id") < maxDocs && length(col("text")) > 0)
      .withColumn("n_frames", ceil(length(col("text")) / lit(frameBytes.toDouble)).cast("long"))
      .select(col("doc_id"), col("text"), explode(expr("sequence(0L, n_frames - 1)")).as("frame_idx"))
      .withColumn("frame",
        expr(s"substring(text, CAST(frame_idx * $frameBytes + 1 AS INT), $frameBytes)"))
      .groupBy(col("frame"))
      .agg(count(lit(1)).as("n_frames"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .filter(col("n_frames") > 1L)
      .withColumn("frame_len", length(col("frame")).cast("long"))
      .withColumn("checksum", expr("graft_bytesum(CAST(frame AS BINARY))"))
      .select("frame", "frame_len", "checksum", "n_frames", "n_docs", "first_doc", "last_doc")
      .orderBy("frame")

  /** Source-mix rebalancing: the training-data curation step that levels a
    * skewed corpus — every source is deterministically downsampled to (at
    * most) the byte budget of the smallest source, so no single crawl
    * dominates the mixture. Rates are exact integer percentages from the
    * per-source byte totals (broadcast back onto the fact); the keep
    * decision is the engine-portable multiplicative hash over doc_id (the
    * q47 sampling idiom) compared to the source's rate — reproducible
    * across runs and engines, no RNG state. Reports per source: planned
    * rate, achieved docs/bytes, realized share. Two aggregates and one
    * broadcast join — no shuffle of the payload itself. */
  def sourceMix(documents: DataFrame): DataFrame = {
    val bySource = documents.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("src_bytes"))
    val minB = bySource.agg(min(col("src_bytes")).as("min_bytes"))
    val rates = bySource.crossJoin(broadcast(minB))
      .withColumn("rate_pct", least(lit(100L), expr("(min_bytes * 100) div src_bytes")))
    documents
      .join(broadcast(rates.select(col("source"), col("rate_pct"))), "source")
      .withColumn("kept", (col("doc_id") % 1000003L) * 2654435761L % 100L < col("rate_pct"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("src_bytes"),
        max(col("rate_pct")).as("rate_pct"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("kept_docs"),
        sum(when(col("kept"), col("n_chars")).otherwise(0L)).as("kept_bytes"))
      .withColumn("achieved_pct", round(col("kept_bytes") * 100.0 / col("src_bytes"), 4))
      .orderBy("source")
  }

  /** Byte-histogram entropy triage: Shannon entropy (bits/byte) of each
    * payload's byte-value distribution — the standard first-pass media
    * classifier of an ingest pipeline (≈8 bits ⇒ compressed/encrypted
    * blob, mid-range ⇒ structured binary, low ⇒ text), run here on the
    * byte payloads with the usual honest stand-in corpus (ASCII ⇒ char
    * codes equal byte values, same convention as [[extractFeatures]]).
    * Classification thresholds are applied to the ROUNDED entropy so both
    * engines flag identically; the defaults are tuned to the stand-in
    * corpus's 3.7–4.2-bit text band (real media triage would sit near the
    * 8-bit ceiling), keeping all three classes populated in tests.
    *
    * Scale shape: byte-grain explode (linear, the tokenizer's cost class)
    * → per-(doc, byte-value) counts (≤256 values/doc) → one doc-key
    * aggregate; entropy is a sum over the ≤256-bin histogram with the
    * entropy/PMI rounding convention. */
  def payloadEntropy(documents: DataFrame, highBits: Double = 4.15,
                     lowBits: Double = 4.0): DataFrame =
    documents
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(length(col("ch")) > 0)
      .select(col("doc_id"), ascii(col("ch")).as("bv"))
      .groupBy(col("doc_id"), col("bv")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("byte_len"),
        count(lit(1)).as("n_distinct_bytes"),
        ((log(sum(col("c"))) - sum(col("c") * log(col("c"))) / sum(col("c")))
          / math.log(2.0)).as("h"))
      .withColumn("entropy_bits", round(col("h"), 6))
      .withColumn("triage",
        when(col("entropy_bits") >= highBits, "3_high_entropy")
          .when(col("entropy_bits") < lowBits, "1_low_entropy")
          .otherwise("2_mid_entropy"))
      .select(col("doc_id"), col("byte_len"), col("n_distinct_bytes"),
        col("entropy_bits"), col("triage"))
      .orderBy("doc_id")

  /** Oracle-checkable column-level equivalent of the typed pipeline: same
    * features computed with codegen'd expressions (ASCII corpus ⇒ char codes
    * equal byte values; the oracle mirrors with ascii()/octet_length). */
  def extractFeatures(documents: DataFrame): DataFrame =
    documents
      .withColumn("payload", col("text").cast("binary"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("byte_len"),
        expr("graft_bytesum(payload)").as("checksum"))
      .withColumn("feature_bucket", col("checksum") % 16)
      .orderBy("doc_id")

  /** Magic-byte format sniffing — the first-pass classifier of any media
    * ingest: match the leading bytes against container signatures
    * (PNG/JPEG/GIF/PDF/RIFF/ZIP/GZIP), fall back to a printable-ASCII scan
    * of the first 32 bytes (≥95% printable → text), else opaque binary.
    * All per-row codegen'd expressions (hex prefix compare + one bounded
    * regexp over a 32-char slice — never the whole payload), one
    * map-side-combinable aggregation to (source, class) grain. The output
    * keeps the full class spine per source so absent formats are explicit
    * zero cells (this corpus is UTF-8 text standing in for media blobs —
    * the signature rows are structurally empty by construction, the
    * ASCII-scan path does the real work; point `payloads` at real media
    * and the same plan fills them). Limitation of the string stand-in: the
    * hex compare sees the text's UTF-8 encoding, so only signatures whose
    * bytes are valid ASCII (PDF/GIF/RIFF/ZIP) can ever fire from a string
    * column; high-byte magics (PNG 0x89, JPEG 0xFF, GZIP 0x1F8B) need a
    * true `binary` ingest column — they are listed so the class alphabet
    * is already the production one. */
  def magicBytes(documents: DataFrame): DataFrame = {
    val classes = Seq("binary_other", "empty", "gif", "gzip", "jpeg", "pdf",
      "png", "riff", "text_ascii", "zip")
    val classified = documents
      .withColumn("blen", length(col("text").cast("binary")).cast("long"))
      .withColumn("h8", hex(substring(col("text"), 1, 4)))
      .withColumn("p32", substring(col("text"), 1, 32))
      .withColumn("printable", length(regexp_replace(col("p32"), "[^ -~]", "")))
      .withColumn("format_class",
        when(col("blen") === 0L, "empty")
          .when(col("h8") === "89504E47", "png")
          .when(substring(col("h8"), 1, 6) === "FFD8FF", "jpeg")
          .when(col("h8") === "47494638", "gif")
          .when(col("h8") === "25504446", "pdf")
          .when(col("h8") === "52494646", "riff")
          .when(col("h8") === "504B0304", "zip")
          .when(substring(col("h8"), 1, 4) === "1F8B", "gzip")
          .when(col("printable") * 100 >= length(col("p32")) * 95, "text_ascii")
          .otherwise("binary_other"))
    val counts = classified.groupBy(col("source"), col("format_class"))
      .agg(count(lit(1)).as("n_payloads"), round(avg(col("blen")), 2).as("avg_bytes"))
    val spine = documents.select(col("source")).distinct()
      .select(col("source"), explode(array(classes.map(lit): _*)).as("format_class"))
    spine.join(counts, Seq("source", "format_class"), "left")
      .select(col("source"), col("format_class"),
        coalesce(col("n_payloads"), lit(0L)).as("n_payloads"), col("avg_bytes"))
      .orderBy("source", "format_class")
  }
}
