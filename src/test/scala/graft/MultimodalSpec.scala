package graft

import graft.tables.Tables
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("typed mapPartitions pipeline matches the column-level featurizer") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
    val typed = Multimodal
      .extractFeaturesTyped(spark,
        Multimodal.payloads(docs).as[Multimodal.MediaRow])
      .collect().map(f => (f.doc_id, (f.byte_len, f.checksum, f.feature_bucket))).toMap
    val columnar = Multimodal.extractFeatures(docs)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(typed == columnar, "stubbed decode must agree between typed and columnar paths")
  }

  test("decode stub is deterministic on raw bytes") {
    val (c1, b1) = Multimodal.decodeStub("hello".getBytes("UTF-8"))
    val (c2, b2) = Multimodal.decodeStub("hello".getBytes("UTF-8"))
    assert(c1 == c2 && b1 == b2)
    assert(c1 == "hello".getBytes("UTF-8").map(_.toLong).sum)
  }

  test("payload entropy: bounded by log2 of distinct bytes, exact on uniform bytes") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val rows = Multimodal.payloadEntropy(docs).collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy_bits")
      val k = r.getAs[Long]("n_distinct_bytes")
      assert(h >= 0.0 && h <= math.log(k.toDouble) / math.log(2.0) + 1e-9,
        s"doc ${r.getAs[Long]("doc_id")}: $h exceeds log2($k)")
      val expected = if (h >= 4.15) "3_high_entropy"
        else if (h < 4.0) "1_low_entropy" else "2_mid_entropy"
      assert(r.getAs[String]("triage") == expected)
    }
    assert(rows.map(_.getAs[String]("triage")).distinct.length == 3,
      "all three triage classes populated on the synthetic corpus")
    // a uniform byte distribution achieves exactly log2(k) bits
    val uni = Multimodal.payloadEntropy(
      docs.limit(0).sparkSession.createDataFrame(
        java.util.List.of[org.apache.spark.sql.Row](
          org.apache.spark.sql.Row(1L, "aabbccdd", "en", "t", 8L)),
        docs.schema)).head()
    assert(uni.getAs[Double]("entropy_bits") == 2.0, "4 uniform byte values = 2 bits")
  }

  test("payload dedup covers every doc and keeps one canonical per group") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val rows = Multimodal.payloadDedup(docs).collect()
    assert(rows.length == docs.count())
    val byGroup = rows.groupBy(r => (r.getAs[Long]("checksum"), r.getAs[Long]("byte_len")))
    byGroup.foreach { case (_, g) =>
      assert(g.count(_.getAs[Boolean]("keep")) == 1, "exactly one keeper per group")
      assert(g.forall(_.getAs[Long]("group_size") == g.length))
    }
  }

  test("frame dedup emits only colliding groups with consistent doc bounds") {
    val rows = Multimodal.frameDedup(graft.tables.Tables.documents(spark, sf0001)).collect()
    assert(rows.nonEmpty, "the boilerplate-heavy corpus must repeat some aligned frames")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_frames") >= 2L)
      assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("n_frames"))
      assert(r.getAs[Long]("first_doc") <= r.getAs[Long]("last_doc"))
      assert(r.getAs[Long]("frame_len") <= 16L)
    }
  }

  test("chunk alignment partitions every payload's frame axis into contiguous spans") {
    val rows = Multimodal.chunkAlign(graft.tables.Tables.documents(spark, sf0001)).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getAs[Long]("chunk_id"))
      val nFrames = sorted.head.getAs[Long]("n_frames")
      assert(sorted.map(_.getAs[Long]("frames_in_chunk")).sum == nFrames,
        "spans must cover every frame exactly once")
      assert(sorted.head.getAs[Long]("first_frame") == 0L)
      assert(sorted.last.getAs[Long]("last_frame") == nFrames - 1)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_frame") + 1 == b.getAs[Long]("first_frame"),
            "spans must be contiguous and non-overlapping")
        case _ =>
      }
      assert(sorted.length <= sorted.head.getAs[Long]("n_chunks"))
    }
  }

  test("source mix: rates floor at the smallest source's bytes, kept within population") {
    val docs = Tables.documents(spark, sf0001)
    val rows = Multimodal.sourceMix(docs).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val minBytes = rows.map(_.getAs[Long]("src_bytes")).min
    rows.foreach { r =>
      val rate = r.getAs[Long]("rate_pct")
      assert(rate >= 1 && rate <= 100)
      assert(rate == math.min(100L, minBytes * 100L / r.getAs[Long]("src_bytes")),
        "rate must be the exact integer byte-budget ratio")
      assert(r.getAs[Long]("kept_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("kept_bytes") <= r.getAs[Long]("src_bytes"))
    }
    // The smallest source keeps everything (rate 100).
    val smallest = rows.minBy(_.getAs[Long]("src_bytes"))
    assert(smallest.getAs[Long]("rate_pct") == 100L)
    assert(smallest.getAs[Long]("kept_docs") == smallest.getAs[Long]("n_docs"))
  }

  test("magic bytes: full class spine per source, counts conserve docs, signatures fire on real magic") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf0001)
    val rows = Multimodal.magicBytes(docs).collect()
    val nSources = docs.select("source").distinct().count()
    assert(rows.length == nSources * 10, "10-class spine per source, zero cells explicit")
    assert(rows.map(_.getAs[Long]("n_payloads")).sum == docs.count())
    // this UTF-8 word-salad corpus: every non-empty payload is text_ascii
    rows.filter(r => !Set("text_ascii", "empty").contains(r.getAs[String]("format_class")))
      .foreach(r => assert(r.getAs[Long]("n_payloads") == 0L,
        s"signature class ${r.getAs[String]("format_class")} must be structurally empty here"))
    // and the signature path itself fires on the ASCII-representable magics
    // (high-byte signatures like PNG's \x89 can't round-trip a UTF-8 string
    // stand-in -- they need a true binary ingest column; scaladoc'd limit)
    val fake = spark.createDataFrame(Seq(
      (1L, "GIF89a....", "img"), (2L, "RIFF....WAVE", "img"),
      (3L, "%PDF-1.7 x", "docs"), (4L, "PK\u0003\u0004zipdata", "docs"),
      (5L, "plain words here", "docs"), (6L, "", "docs")))
      .toDF("doc_id", "text", "source")
    val cls = Multimodal.magicBytes(fake).collect()
      .filter(_.getAs[Long]("n_payloads") > 0)
      .map(r => (r.getAs[String]("source"), r.getAs[String]("format_class")) -> r.getAs[Long]("n_payloads"))
      .toMap
    assert(cls(("img", "gif")) == 1L && cls(("img", "riff")) == 1L)
    assert(cls(("docs", "pdf")) == 1L && cls(("docs", "zip")) == 1L)
    assert(cls(("docs", "text_ascii")) == 1L && cls(("docs", "empty")) == 1L)
  }

  test("phash band ladder: occupancy-driven bits per band, 32-bit tiling") {
    assert(Multimodal.phashBandParams(100L) == ((4, 8)),
      "small corpora keep the 8-bit floor (4 bands)")
    assert(Multimodal.phashBandParams(1L << 16) == ((2, 13)),
      "64k payloads -> ceil(log2(n/8)) = 13 bits, 2 bands")
    assert(Multimodal.phashBandParams(1000000000L) == ((2, 16)),
      "hash-width cap at 16 bits")
    val (nb, r) = Multimodal.phashBandParams(50L)
    assert(nb * r <= 32, "bands must tile within the 32-bit hash")
  }

  test("phash band ladder properties: tiling, floor/cap, minimality, monotonicity (seeded sweep)") {
    val rnd = new scala.util.Random(97)
    val ns = (Seq(1L, 2L, 7L, 8L, 9L, (1L << 11) - 1, 1L << 11, (1L << 11) + 1) ++
      Seq.fill(500)(math.abs(rnd.nextLong()) % (1L << 40) + 1)).sorted
    var prevBits = 0
    ns.foreach { n =>
      val (bands, bits) = Multimodal.phashBandParams(n)
      assert(bands * bits <= 32 && bands == 32 / bits, s"n=$n: bands must tile the 32-bit hash")
      assert(bits >= Multimodal.PhashMinBandBits && bits <= 16, s"n=$n: bits outside [floor, cap]")
      val buckets = math.max(1L, (n + Multimodal.PhashOccupancy - 1L) / Multimodal.PhashOccupancy)
      if (bits < 16 && bits > Multimodal.PhashMinBandBits) {
        assert((1L << bits) >= buckets, s"n=$n: key space must hold nominal occupancy")
        assert((1L << (bits - 1)) < buckets, s"n=$n: bits must be MINIMAL (ladder, not a jump)")
      }
      assert(bits >= prevBits, s"n=$n: bits must be monotone in corpus size")
      prevBits = bits
    }
  }

  test("phash near-dup: pairs carry true Hamming distance, exact copies collapse to one group") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf0001)
    val pairs = Multimodal.payloadPhash(docs).collect()
    pairs.foreach { p =>
      val a = p.getAs[Long]("phash_a"); val b = p.getAs[Long]("phash_b")
      val h = p.getAs[Long]("hamming")
      assert(a < b, "canonical pair order")
      assert(h == java.lang.Long.bitCount(a ^ b), "reported Hamming must equal bit_count(xor)")
      assert(h > 0 && h <= 6, s"pair outside the Hamming envelope: $h")
    }
    // a perturbed copy (one frame's byte changed) lands within the envelope
    // of its original; an exact copy collapses into the SAME hash group
    val base = "the quick brown fox jumps over the lazy dog " * 4
    val fixture = spark.createDataFrame(Seq(
      (1L, base, "s"), (2L, base, "s"),
      (3L, base.updated(5, 'z'), "s"))).toDF("doc_id", "text", "source")
    val fp = Multimodal.payloadPhash(fixture).collect()
    fp.foreach { p =>
      // docs 1+2 share a phash, so any emitted pair is (group{1,2}) x doc 3
      assert(p.getAs[Long]("n_docs_a") + p.getAs[Long]("n_docs_b") == 3L,
        "exact copies must collapse into one group row")
    }
  }

  test("cross-modal coherence: per-source stats are internally consistent") {
    val docs = Tables.documents(spark, sf0001)
    val emb = Tables.embeddings(spark, sf0001)
    val rows = Multimodal.crossModalCoherence(docs, emb).collect()
    assert(rows.nonEmpty)
    val paired = docs.join(emb, docs("doc_id") === emb("vec_id")).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == paired,
      "every joined (caption, embedding) pair is scored exactly once")
    rows.foreach { r =>
      val avg = r.getAs[Double]("avg_cos"); val mn = r.getAs[Double]("min_cos")
      val n = r.getAs[Long]("n_pairs"); val nLow = r.getAs[Long]("n_low")
      assert(avg >= -1.0 && avg <= 1.0 && mn >= -1.0 && mn <= 1.0)
      assert(mn <= avg + 1e-9, "min cannot exceed the mean")
      assert(nLow >= 0 && nLow <= n)
      assert(math.abs(r.getAs[Double]("low_pct") - nLow * 100.0 / n) < 5e-5)
    }
  }

  test("token budget: integer share math, over-cap sources return to the 30% ceiling") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf0001)
    val rows = Multimodal.tokenBudget(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val text = r.getAs[Long]("text_tokens"); val vis = r.getAs[Long]("vision_tokens")
      val share = r.getAs[Long]("share_bp"); val keep = r.getAs[Long]("media_keep_bp")
      val kept = r.getAs[Long]("kept_vision_tokens"); val ns = r.getAs[Long]("new_share_bp")
      assert(share == (if (text + vis == 0) 0L else vis * 10000 / (text + vis)))
      if (vis * 100 <= (text + vis) * 30) {
        assert(keep == 10000L && kept == vis, "under-cap sources keep all media")
      } else {
        assert(keep < 10000L, "over-cap sources must downsample media")
        assert(ns <= 3000L, "the keep-rate must bring the share back under the cap")
      }
      assert(kept == vis * keep / 10000)
    }
    // brute recompute of one source's pools
    val first = rows.head
    val brute = docs.filter(col("source") === first.getAs[String]("source"))
      .select(
        when(length(trim(col("text"))) === 0, 0L)
          .otherwise(size(split(trim(col("text")), "\\s+")).cast("long")).as("t"),
        ceil(length(col("text")) / 16.0).cast("long").as("f"))
      .agg(sum("t"), sum("f")).head()
    assert(first.getAs[Long]("text_tokens") == brute.getLong(0))
    assert(first.getAs[Long]("vision_tokens") == brute.getLong(1) * 4)
  }

  test("quality gate: full rule spine, counts conserve docs, kept docs obey every gate") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf0001)
    val rows = Multimodal.qualityGate(docs).collect()
    val nSources = docs.select("source").distinct().count()
    assert(rows.length == nSources * 6, "6-rule spine per source, zero cells explicit")
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count(), "every doc gets exactly one rule")
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getAs[Double]("pct")).sum - 100.0) < 1e-6,
        "per-source funnel percentages must sum to 100")
    }
    // the empty rule is structurally zero on this corpus but stays in the spine
    assert(rows.filter(_.getAs[String]("rule") == "1_empty").forall(_.getAs[Long]("n_docs") == 0L))
    assert(rows.filter(_.getAs[String]("rule") == "6_kept").map(_.getAs[Long]("n_docs")).sum > 0)
    // kept bytes respect the size window: n_bytes of 6_kept rows between
    // 100*n and 480*n
    rows.filter(r => r.getAs[String]("rule") == "6_kept" && r.getAs[Long]("n_docs") > 0).foreach { r =>
      val n = r.getAs[Long]("n_docs"); val b = r.getAs[Long]("n_bytes")
      assert(b >= 100 * n && b <= 480 * n, "kept docs must sit inside the size window")
    }
  }

  test("scene cut: scenes tile each payload's frame axis, boundaries are real cuts") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val rows = graft.multimodal.Multimodal.sceneCut(docs).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      val scenes = rs.sortBy(_.getAs[Long]("scene_id"))
      // scene ids are 1..n and frame spans tile the axis with no gap/overlap
      assert(scenes.map(_.getAs[Long]("scene_id")).toSeq == (1L to scenes.length).toSeq)
      assert(scenes.head.getAs[Long]("first_frame") == 0L)
      scenes.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("first_frame") == a.getAs[Long]("last_frame") + 1,
            "scenes must partition the frame axis")
        case _ =>
      }
      scenes.foreach(s =>
        assert(s.getAs[Long]("n_frames") ==
          s.getAs[Long]("last_frame") - s.getAs[Long]("first_frame") + 1))
    }
    // segmentation is non-trivial: some doc has more than one scene, and
    // scenes are coarser than frames (the threshold is not 0)
    assert(rows.groupBy(_.getAs[Long]("doc_id")).exists(_._2.length > 1))
    val totalFrames = rows.map(_.getAs[Long]("n_frames")).sum
    assert(rows.length < totalFrames, "a scene per frame means the threshold is broken")
  }
}
