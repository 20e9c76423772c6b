package graft.multimodal

import graft.plans.Checkpoints._
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

  /** Shot-boundary (scene-cut) detection skeleton over binary payloads —
    * the video-curation step that segments footage into shots before
    * per-shot sampling/dedup (a training pipeline samples per SCENE, not
    * per frame, or intro/outro shots dominate). Frames are the fixed-width
    * chunks of [[frameSample]]; the frame signal is its mean byte value
    * (length-normalized in exact integer math so the short tail frame
    * doesn't fake a cut), and a cut opens a new scene when the
    * frame-to-frame delta exceeds `cutDelta` (the real pipeline swaps this
    * for an HSV-histogram or embedding distance — the plumbing is
    * identical). Scenes are the classic gaps-and-islands: running sum of
    * cut flags inside the bounded per-doc window (frames per payload, not
    * corpus-wide), then one (doc, scene) aggregate — per-doc-local work at
    * row grain, embarrassingly parallel across a 100 TB video corpus. */
  def sceneCut(documents: DataFrame, frameBytes: Int = 16, cutDelta: Long = 140L,
               maxDocs: Int = 100): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    documents
      // Zero-frame guard: see frameSample (sequence(0, -1) is non-empty).
      .filter(col("doc_id") < maxDocs && length(col("text")) > 0)
      .withColumn("n_frames", ceil(length(col("text")) / lit(frameBytes.toDouble)).cast("long"))
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(0L, n_frames - 1)")).as("frame_idx"))
      .withColumn("frame",
        expr(s"substring(text, CAST(frame_idx * $frameBytes + 1 AS INT), $frameBytes)"))
      .withColumn("flen", length(col("frame")).cast("long"))
      .withColumn("mval",
        expr(s"(graft_bytesum(CAST(frame AS BINARY)) * $frameBytes) div flen"))
      .withColumn("delta", abs(col("mval") - lag(col("mval"), 1).over(w)))
      .withColumn("cut",
        when(col("delta").isNull || col("delta") > cutDelta, 1L).otherwise(0L))
      .withColumn("scene_id", sum(col("cut")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("scene_id"))
      .agg(count(lit(1)).as("n_frames"),
        min(col("frame_idx")).as("first_frame"),
        max(col("frame_idx")).as("last_frame"),
        sum(col("flen")).as("scene_bytes"),
        round(avg(col("mval")), 4).as("mean_frame_val"))
      .orderBy("doc_id", "scene_id")
  }

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

  /** Perceptual-hash banding ladder (mirrors `Dedup.embBandParams`): bits
    * per band r grows with log2(ceil(n/8)) so a band's key space keeps
    * NOMINAL bucket occupancy ~8 at any corpus size (fixed 8-bit bands
    * would give 256 buckets → occupancy ∝ n → a quadratic band join, the
    * exact defect the r9 scale harness caught in the fixed-band LSH; the
    * r13 harness re-caught it here at the 64-occupancy setting, whose
    * 8-bit floor stayed quadratic through the measured window). Bands tile
    * the 32-bit hash: nBands = 32 div r (4 bands at r=8 down to 2 at
    * r=16). r is capped at 16 by the hash width — past ~1M payloads the
    * residual guarantees are [[PhashBandMaxOcc]] and the DISTINCT-hash
    * pairing grain (≤2^32 group rows, each carrying its member count,
    * never a per-doc pair explosion); a 64-bit hash lifts that ceiling and
    * nothing else changes. Integer-exact ladder (no float log) so the SQL
    * oracle reproduces it bit-for-bit. */
  val PhashMinBandBits = 8
  val PhashOccupancy = 8
  def phashBandParams(nPayloads: Long): (Int, Int) = {
    val m = math.max(1L, (nPayloads + PhashOccupancy - 1L) / PhashOccupancy)
    var r = 0
    while ((1L << r) < m) r += 1
    val rr = math.max(PhashMinBandBits, math.min(16, r))
    (32 / rr, rr)
  }

  /** Hard per-(band, key) occupancy cap: a bucket holding more distinct
    * hashes than this is SKIPPED entirely (its key carries no
    * discriminative signal — the LSH analogue of the dedup df caps
    * `ShingleMaxDf`/`SubstrMaxAnchorOcc`). Payload checksums of the text
    * stand-in cluster far above the uniform-hash occupancy model, and only
    * a hard cap bounds the candidate join against that skew: with the cap,
    * candidates ≤ nBuckets · C(cap, 2) — LINEAR in corpus size at fixed
    * cap. The recall trade is explicit and deterministic (both engines
    * skip the same buckets); a pair losing its dense bucket can still meet
    * in any of its other bands. */
  val PhashBandMaxOcc = 128

  /** Perceptual-hash near-dup detection over binary payloads — the
    * image/video analogue of SimHash dedup: a 32-bit payload fingerprint
    * whose bit j is the majority vote of a seeded hash of each FRAME's
    * checksum, so payloads sharing most frames land within a few bits of
    * each other (a real pipeline swaps the frame checksum for a DCT pHash
    * of the decoded frame; the banding, Hamming join and group accounting
    * are unchanged). Candidate pairs come from corpus-adaptive bands
    * ([[phashBandParams]]) at DISTINCT-hash grain — identical payloads
    * collapse into one group row with a member count, so a million exact
    * copies cost one row, not 10^12 pairs — and survive on exact Hamming
    * distance (`bit_count(a ^ b)`) ≤ `maxHamming`.
    *
    * Scale shape: one frame explode (linear, the decode stage's own cost
    * class) → one doc-grain aggregate (32 map-side-combinable bit sums) →
    * one distinct-hash aggregate → banded equi-join over ~64-occupancy
    * buckets. No stage is quadratic in docs. */
  def payloadPhash(documents: DataFrame, frameBytes: Int = 16, maxHamming: Int = 6): DataFrame = {
    val P = 1000003L
    val nPayloads = documents.filter(length(col("text")) > 0).count()
    val (nBands, bandBits) = phashBandParams(nPayloads)
    val frames = documents
      // Zero-frame guard: see frameSample (sequence(0, -1) is non-empty).
      .filter(length(col("text")) > 0)
      .withColumn("n_frames", ceil(length(col("text")) / lit(frameBytes.toDouble)).cast("long"))
      .select(col("doc_id"), col("text"), explode(expr("sequence(0L, n_frames - 1)")).as("frame_idx"))
      .select(col("doc_id"),
        expr(s"graft_bytesum(CAST(substring(text, CAST(frame_idx * $frameBytes + 1 AS INT), $frameBytes) AS BINARY))")
          .as("chk"))
    // 32 bit-votes as map-side-combinable aggregates (the simhash idiom);
    // chk is range-reduced mod the hash prime before the multiply so the
    // product stays < 2^63 (the shardPlan overflow rule).
    val bitSums = (0 until 32).map { j =>
      sum(when(((col("chk") % P) * 2654435761L + j * 40503L) % 65536L > 32767L, 1L).otherwise(-1L))
        .as(s"bit$j")
    }
    val hash = (0 until 32)
      .map(j => when(col(s"bit$j") > 0, 1L << j).otherwise(0L))
      .reduce(_ + _)
    val groups = frames.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), hash.as("phash"))
      .groupBy(col("phash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
    val bandStructs = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        (shiftright(col("phash"), b * bandBits) % (1L << bandBits)).as("bkey"))
    }
    val allBands = groups.select(col("phash"), col("n_docs"), col("min_doc"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bkey").as("bkey"),
        col("phash"), col("n_docs"), col("min_doc"))
    // Occupancy cap ([[PhashBandMaxOcc]]): one map-side-combinable count
    // per bucket, then an equi-join keeps only sane buckets — bounds the
    // candidate join linearly even when checksum clustering defeats the
    // uniform-occupancy model the ladder assumes.
    val okBuckets = allBands.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") <= PhashBandMaxOcc)
      .select(col("band"), col("bkey"))
    val bands = allBands.join(okBuckets, Seq("band", "bkey"))
    val a = bands.select(col("band"), col("bkey"), col("phash").as("phash_a"),
      col("n_docs").as("n_docs_a"), col("min_doc").as("min_doc_a"))
    val b = bands.select(col("band"), col("bkey"), col("phash").as("phash_b"),
      col("n_docs").as("n_docs_b"), col("min_doc").as("min_doc_b"))
    // Equi-join on (band, bkey); AQE broadcasts the build side while the
    // distinct-hash table is small and falls back to a shuffle join at
    // scale. A pair can collide in several bands → distinct AFTER the
    // Hamming filter (few qualifying pairs, not the candidate volume).
    a.join(b, Seq("band", "bkey"))
      .filter(col("phash_a") < col("phash_b"))
      .withColumn("hamming", expr("bit_count(phash_a ^ phash_b)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("phash_a", "phash_b", "hamming", "n_docs_a", "n_docs_b", "min_doc_a", "min_doc_b")
      .distinct()
      .orderBy("phash_a", "phash_b")
  }

  /** Cross-modal coherence audit: caption metadata (documents) joined to
    * the paired vision-encoder embeddings (`embeddings`, keyed vec_id =
    * doc_id — the stand-in for a CLIP-style image tower) and scored
    * against their SOURCE centroid — the standard curation check that a
    * crawl source's captions and media actually agree (a source whose
    * pairs scatter against its own centroid is mis-scraped or mislabeled).
    * Per source: pair count, mean/min cosine-to-centroid and the count
    * below `lowCos` (the mismatch candidates a human reviews).
    *
    * Determinism: centroid coords are avg rounded to 9 dp and cosines
    * rounded to 6 dp (the knn_centroid convention) so both engines agree
    * bit-for-bit. Scale shape: one posexplode (linear in n·dim) → a
    * (source, dim)-grain aggregate (bounded by |sources|·dim) → broadcast
    * centroids back onto the pairs → one source-grain rollup. */
  def crossModalCoherence(documents: DataFrame, embeddings: DataFrame,
                          lowCos: Double = 0.0): DataFrame = {
    val v = embeddings.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
    val pairs = documents.select(col("doc_id"), col("source"))
      .join(v, col("doc_id") === col("vec_id"))
    val cent = pairs
      .select(col("source"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("source"), col("pos")).agg(round(avg(col("x")), 9).as("c"))
      .groupBy(col("source"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("source"), expr("transform(pc, s -> s.c)").as("cv"))
      .withColumn("cn", expr("sqrt(graft_dot(cv, cv))"))
    pairs.join(broadcast(cent), "source")
      .withColumn("cos", round(expr("graft_dot(v, cv)") / (col("nrm") * col("cn")), 6))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg(col("cos")), 4).as("avg_cos"),
        min(col("cos")).as("min_cos"),
        sum(when(col("cos") < lowCos, 1L).otherwise(0L)).as("n_low"))
      .withColumn("low_pct", round(col("n_low") * 100.0 / col("n_pairs"), 4))
      .orderBy("source")
  }

  /** Multimodal token-budget accounting: each payload costs text tokens
    * (whitespace tokenizer) plus `visTokensPerFrame` vision tokens per
    * 16-byte frame — the budget model a vision-language training mix is
    * planned against. Per source: both token pools, the vision share (in
    * basis points — exact integer division, no float drift), and when the
    * share exceeds `maxVisionSharePct` the media keep-rate (basis points)
    * that brings it back to the cap: keep = (s·text·10^4) div ((100−s)·vis)
    * from solving vis′/(text+vis′) = s. Two hash aggregates, no shuffle of
    * the payloads themselves; every derived number is integer-exact so the
    * oracle reproduces it bit-for-bit. */
  def tokenBudget(documents: DataFrame, frameBytes: Int = 16, visTokensPerFrame: Int = 4,
                  maxVisionSharePct: Int = 30): DataFrame = {
    val s = maxVisionSharePct.toLong
    documents
      .withColumn("n_tok",
        when(length(trim(col("text"))) === 0, 0L)
          .otherwise(size(split(trim(col("text")), "\\s+")).cast("long")))
      .withColumn("n_frames", ceil(length(col("text")) / lit(frameBytes.toDouble)).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("text_tokens"),
        sum(col("n_frames")).as("n_frames"),
        (sum(col("n_frames")) * visTokensPerFrame).as("vision_tokens"))
      .withColumn("share_bp",
        when(col("text_tokens") + col("vision_tokens") === 0L, 0L)
          .otherwise(expr("vision_tokens * 10000 div (text_tokens + vision_tokens)")))
      .withColumn("media_keep_bp",
        when(col("vision_tokens") * 100L <= (col("text_tokens") + col("vision_tokens")) * s, 10000L)
          .otherwise(expr(s"(text_tokens * $s * 10000) div (vision_tokens * ${100L - s})")))
      .withColumn("kept_vision_tokens", expr("vision_tokens * media_keep_bp div 10000"))
      .withColumn("new_share_bp",
        when(col("text_tokens") + col("kept_vision_tokens") === 0L, 0L)
          .otherwise(expr("kept_vision_tokens * 10000 div (text_tokens + kept_vision_tokens)")))
      .select("source", "n_docs", "text_tokens", "vision_tokens", "share_bp",
        "media_keep_bp", "kept_vision_tokens", "new_share_bp")
      .orderBy("source")
  }

  /** Multimodal ingest quality gate — the payload-level filter cascade
    * (the binary-blob sibling of `text_filter_cascade`): empty → size
    * window → byte-entropy band ([[payloadEntropy]]'s rounded-bits
    * convention, thresholds tuned to this stand-in corpus's 3.7–4.2-bit
    * text band) → exact-dup (only the min-doc_id of each (checksum,
    * byte_len) group passes, computed over ALL sized payloads so the
    * verdict doesn't depend on which gate a group-mate failed). Each doc
    * gets its FIRST failing rule; output is the (source × rule) funnel
    * with explicit zero cells (the magicBytes spine convention) so every
    * source reports the same schema at any SF.
    *
    * Scale shape: one char-grain explode for the entropy histogram (the
    * tokenizer's linear cost class, ≤256 bins/doc), one codegen'd checksum,
    * two hash aggregates — no windows over corpus-grain partitions (the
    * dup-group min is a (checksum, byte_len)-keyed aggregate joined back). */
  def qualityGate(documents: DataFrame, minBytes: Long = 100L, maxBytes: Long = 480L,
                  lowBits: Double = 3.9, highBits: Double = 4.2): DataFrame = {
    // base feeds three branches (dup keeper, the ruled join, per-source
    // totals) — cut it so the payload checksum scan runs once (doc-grain).
    val base = documents
      .withColumn("payload", col("text").cast("binary"))
      .select(col("doc_id"), col("source"),
        length(col("payload")).cast("long").as("byte_len"),
        expr("graft_bytesum(payload)").as("checksum"))
      .stableCheckpoint()
    val entropy = documents
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(length(col("ch")) > 0)
      .select(col("doc_id"), ascii(col("ch")).as("bv"))
      .groupBy(col("doc_id"), col("bv")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(round((log(sum(col("c"))) - sum(col("c") * log(col("c"))) / sum(col("c")))
        / math.log(2.0), 6).as("entropy_bits"))
    val keeper = base.groupBy(col("checksum"), col("byte_len"))
      .agg(min(col("doc_id")).as("keep_doc"))
    val ruled = base
      .join(entropy, Seq("doc_id"), "left")
      .join(keeper, Seq("checksum", "byte_len"))
      .withColumn("rule",
        when(col("byte_len") === 0L, "1_empty")
          .when(col("byte_len") < minBytes, "2_too_small")
          .when(col("byte_len") > maxBytes, "3_too_large")
          .when(col("entropy_bits") < lowBits || col("entropy_bits") >= highBits, "4_entropy_band")
          .when(col("doc_id") =!= col("keep_doc"), "5_exact_dup")
          .otherwise("6_kept"))
    val rules = Seq("1_empty", "2_too_small", "3_too_large", "4_entropy_band",
      "5_exact_dup", "6_kept")
    val counts = ruled.groupBy(col("source"), col("rule"))
      .agg(count(lit(1)).as("n_docs"), sum(col("byte_len")).as("n_bytes"))
    val srcTotals = base.groupBy(col("source")).agg(count(lit(1)).as("src_docs"))
    val spine = documents.select(col("source")).distinct()
      .select(col("source"), explode(array(rules.map(lit): _*)).as("rule"))
    spine.join(counts, Seq("source", "rule"), "left")
      .join(broadcast(srcTotals), "source")
      .select(col("source"), col("rule"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_bytes"), lit(0L)).as("n_bytes"),
        round(coalesce(col("n_docs"), lit(0L)) * 100.0 / col("src_docs"), 4).as("pct"))
      .orderBy("source", "rule")
  }

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
