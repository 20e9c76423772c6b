package graft

import graft.tables.Tables
import graft.similarity.Ann
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf0001)

  test("brute-force top-k: k neighbors per query, ranks ordered by cosine") {
    val rows = Ann.bruteForceTopK(emb, nQueries = 5, k = 5).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQuery.size == 5)
    byQuery.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      assert(sorted.length == 5)
      sorted.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi.getAs[Double]("cos") >= lo.getAs[Double]("cos"))
        case _ =>
      }
    }
  }

  test("LSH buckets partition the corpus and the plane ladder tracks corpus size") {
    val (bucketed, nPlanes) = Ann.withBucket(emb)
    assert(bucketed.count() == emb.count())
    assert(bucketed.select("bucket").distinct().count() > 1, "all vectors in one bucket = useless LSH")
    assert(nPlanes == Ann.lshPlanes(emb.count()))
    // The corpus-adaptive law: plane count grows with log2(n/64) so bucket
    // occupancy stays ~64 — the property whose absence made fixed-8-plane
    // LSH degrade into a 1/256 scan at scale.
    assert(Ann.lshPlanes(100) == 3)
    assert(Ann.lshPlanes(64 * 1024) == 10)
    assert(Ann.lshPlanes(64L * 1024 * 1024) == 20)
    assert(Ann.lshPlanes(Long.MaxValue / 2) == 48, "ladder clamps at 48 planes")
    // occupancy bound: n / 2^planes ≤ 64 for any n in the unclamped range
    Seq(1L, 500L, 8000L, 1000000L, 1L << 40).foreach { n =>
      val p = Ann.lshPlanes(n)
      if (p < 48) assert(n.toDouble / (1L << p) <= 64.0, s"occupancy blows up at n=$n")
    }
  }

  test("LSH top-k neighbors share the query's bucket and appear in brute-force order") {
    val lsh = Ann.lshTopK(emb, nQueries = 5, k = 3).collect()
    lsh.groupBy(_.getAs[Long]("q_id")).values.foreach { rs =>
      val buckets = rs.map(_.getAs[Long]("bucket")).distinct
      assert(buckets.length == 1)
    }
  }

  test("multi-probe LSH recall is at least single-bucket LSH recall") {
    val lsh = Ann.lshTopK(emb, nQueries = 5, k = 3).collect()
      .groupBy(_.getAs[Long]("q_id")).view.mapValues(_.map(_.getAs[Double]("cos")).max).toMap
    val mp = Ann.multiProbeTopK(emb, nQueries = 5, k = 3).collect()
      .groupBy(_.getAs[Long]("q_id")).view.mapValues(_.map(_.getAs[Double]("cos")).max).toMap
    // multi-probe searches a superset of buckets, so its best hit per query
    // can only match or beat the single-bucket one
    lsh.foreach { case (q, best) => assert(mp(q) >= best, s"query $q: ${mp(q)} < $best") }
  }

  test("centroid assignment covers all vectors") {
    val n = Ann.centroidAssign(emb).agg(sum("n")).collect()(0).getLong(0)
    assert(n == emb.count())
  }

  test("k-means cells cover all vectors and iterating improves cohesion") {
    val one = Ann.kmeansCells(emb, k = 4, iters = 1).collect()
    val two = Ann.kmeansCells(emb, k = 4, iters = 2).collect()
    assert(one.map(_.getAs[Long]("n")).sum == emb.count())
    assert(two.map(_.getAs[Long]("n")).sum == emb.count())
    def cohesion(rows: Array[org.apache.spark.sql.Row]) = {
      val n = rows.map(_.getAs[Long]("n")).sum
      rows.map(r => r.getAs[Double]("avg_cos") * r.getAs[Long]("n")).sum / n
    }
    assert(cohesion(two) >= cohesion(one) - 1e-9,
      "a Lloyd round never decreases mean assignment similarity")
  }

  test("embedding near-dup pairs are mutual high-cosine") {
    val rows = Dedup.embeddingNearDup(emb, threshold = 0.3).collect()
    assert(rows.forall(_.getAs[Double]("cos") >= 0.3))
  }

  test("mutual top-k pairs are reciprocal and a subset of the near-dup candidate graph") {
    val rows = Ann.mutualTopK(emb, k = 3).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
      assert(r.getAs[Long]("rk_a") <= 3 && r.getAs[Long]("rk_b") <= 3)
      assert(r.getAs[Double]("cos") >= Dedup.EmbPairFloor)
    }
    // every mutual pair must be in the banded candidate pair set
    val cand = Dedup.embeddingNearDup(emb, Dedup.EmbPairFloor).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(rows.forall(r => cand((r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))))
    // reciprocity: a rank-1 <-> rank-1 pair (the strongest mutual edge) exists
    assert(rows.exists(r => r.getAs[Long]("rk_a") == 1 && r.getAs[Long]("rk_b") == 1))
  }

  test("range search is top-k-consistent: every result clears the threshold") {
    val rows = Ann.rangeSearch(emb, nQueries = 5, minCos = 0.3).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("cos") >= 0.3))
    // brute-force rank-1 neighbors above the threshold must appear
    val brute = Ann.bruteForceTopK(emb, nQueries = 5, k = 1).collect()
      .filter(_.getAs[Double]("cos") >= 0.3)
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val range = rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(brute.subsetOf(range), "range search must contain every qualifying top-1")
  }

  test("PQ quantizes every vector in every subspace with bounded error") {
    val rows = Ann.pqQuantize(emb).collect()
    assert(rows.length == 8, "one report row per subspace")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vectors") == emb.count())
      assert(r.getAs[Double]("avg_sq_err") >= 0.0)
      assert(r.getAs[Double]("max_sq_err") >= r.getAs[Double]("avg_sq_err"))
      assert(r.getAs[Long]("codes_used") <= 10L)
    }
  }

  test("matryoshka recall is a proper fraction per query and full-dim recall is 1") {
    val emb = graft.tables.Tables.embeddings(spark, sf0001)
    val rows = Ann.matryoshkaRecall(emb).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall_at_k")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // sanity: truncating to the full dimension must reproduce the exact top-k
    val dim = emb.selectExpr("size(embedding)").first().getInt(0)
    val selfRecall = Ann.matryoshkaRecall(emb, prefixDim = dim).collect()
    selfRecall.foreach(r => assert(r.getAs[Double]("recall_at_k") == 1.0))
  }

  test("rerank never loses to the coarse ranking and recovers everything the cut kept") {
    val emb = graft.tables.Tables.embeddings(spark, sf0001)
    val rows = Ann.rerankTopK(emb).collect()
    assert(rows.length == 10, "one row per query")
    rows.foreach { r =>
      val (hc, hr) = (r.getAs[Long]("hits_coarse"), r.getAs[Long]("hits_rerank"))
      assert(hc >= 0 && hc <= 5 && hr >= 0 && hr <= 5)
      // both rankings draw from the same candidate set; the exact ordering
      // surfaces every true top-k member that survived the coarse cut
      assert(hr >= hc, s"query ${r.getAs[Long]("q_id")}: rerank $hr below coarse $hc")
      assert(r.getAs[Double]("recall_coarse") == hc / 5.0)
      assert(r.getAs[Double]("recall_rerank") == hr / 5.0)
    }
    // the rerank stage must buy something on this corpus (deterministic data)
    assert(rows.map(_.getAs[Long]("hits_rerank")).sum >
           rows.map(_.getAs[Long]("hits_coarse")).sum)
    // widening the candidate cut to the whole corpus makes rerank exact
    val full = Ann.rerankTopK(emb, coarseC = emb.count().toInt).collect()
    full.foreach(r => assert(r.getAs[Double]("recall_rerank") == 1.0))
  }

  test("IVF-PQ covers every vector; residual PQ error never exceeds residual energy") {
    val emb = graft.tables.Tables.embeddings(spark, sf0001)
    val rows = Ann.ivfPq(emb).collect()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == emb.count())
    rows.foreach { r =>
      val energy = r.getAs[Double]("avg_res_energy")
      val err = r.getAs[Double]("avg_pq_err")
      assert(energy >= 0.0 && err >= 0.0)
      // The per-(subspace, label) mean codeword makes within-group quantization
      // error <= group variance, and nearest-code assignment only improves it.
      assert(err <= energy + 1e-6, s"PQ error $err above residual energy $energy")
    }
  }

  test("SQ8 covers every vector with bounded reconstruction error") {
    val emb = graft.tables.Tables.embeddings(spark, sf0001)
    val rows = Ann.sq8Quantize(emb).collect()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == emb.count())
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_mse") >= 0.0)
      assert(r.getAs[Double]("max_mse") >= r.getAs[Double]("avg_mse"))
      assert(r.getAs[Double]("avg_codes_used") <= 256.0)
    }
  }

  test("threshold sweep: higher cutoffs can only shrink pairs and linked docs") {
    val rows = Dedup.embeddingThresholdSweep(Tables.embeddings(spark, sf0001)).collect()
      .sortBy(_.getAs[Double]("threshold"))
    assert(rows.length == 4)
    val pairs = rows.map(_.getAs[Long]("n_pairs"))
    val docs = rows.map(_.getAs[Long]("n_docs_linked"))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b })
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs_linked") <= 2 * r.getAs[Long]("n_pairs"))
      val pct = r.getAs[Double]("pct_linked")
      assert(pct >= 0.0 && pct <= 100.0)
    }
  }

  test("probe sweep: recall grows with nprobe and is a proper percentage") {
    val rows = Ann.probeSweep(Tables.embeddings(spark, sf0001)).collect()
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq == Seq(1L, 2L, 3L))
    val recalls = rows.map(_.getAs[Double]("recall_pct"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b + 1e-9 },
      "probing more cells can only add candidates")
    rows.foreach { r =>
      assert(r.getAs[Long]("recovered") <= r.getAs[Long]("expected"))
      val rec = r.getAs[Double]("recall_pct")
      assert(rec >= 0.0 && rec <= 100.0)
    }
  }

  test("filtered search stays within the label predicate and under brute-force scores") {
    val emb = Tables.embeddings(spark, sf0001)
    val filtered = Ann.filteredTopK(emb).collect()
    assert(filtered.nonEmpty)
    val labelOf = emb.select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label").toLong).toMap
    filtered.foreach { r =>
      assert(labelOf(r.getAs[Long]("neighbor_id")) == r.getAs[Long]("label"),
        "filtered neighbor must satisfy the metadata predicate")
      assert(labelOf(r.getAs[Long]("q_id")) == r.getAs[Long]("label"))
    }
    // The filtered rank-1 cosine can never beat the unfiltered rank-1 cosine.
    val brute1 = Ann.bruteForceTopK(emb).collect()
      .filter(_.getAs[Long]("rk") == 1L).map(r => r.getAs[Long]("q_id") -> r.getAs[Double]("cos")).toMap
    filtered.filter(_.getAs[Long]("rk") == 1L).foreach { r =>
      assert(r.getAs[Double]("cos") <= brute1(r.getAs[Long]("q_id")) + 1e-9)
    }
  }

  test("MMR rerank: brute-force greedy trajectory match; pick1 is the relevance argmax") {
    val rows = Ann.mmrTopK(emb).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty && byQ.values.forall(_.length == 5), "k=5 picks per query")
    // brute force: rebuild candidates + greedy MMR from raw vectors
    val vecs = emb.collect().map { r =>
      r.getAs[Long]("vec_id") -> r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray
    }.toMap
    def relU(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    byQ.foreach { case (qid, picks) =>
      val qv = vecs(qid)
      val cands = vecs.keys.filter(_ != qid).toSeq
        .map(id => id -> relU(qv, vecs(id)))
        .sortBy { case (id, r) => (-r, id) }.take(20)
      val candRel = cands.toMap
      var sel = Vector.empty[Long]
      val expected = (1 to 5).map { _ =>
        val pick =
          if (sel.isEmpty) cands.head._1
          else cands.collect { case (id, r) if !sel.contains(id) =>
            val pen = sel.map(sid => relU(vecs(id), vecs(sid))).max
            (id, r * 7L - pen * 3L)
          }.sortBy { case (id, sc) => (-sc, id) }.head._1
        sel :+= pick
        pick
      }
      val got = picks.sortBy(_.getAs[Long]("pick")).map(_.getAs[Long]("vec_id")).toSeq
      assert(got == expected, s"query $qid greedy trajectory diverges: $got vs $expected")
      // scores are monotone non-increasing along the greedy picks
      val scores = picks.sortBy(_.getAs[Long]("pick")).map(_.getAs[Double]("score"))
      scores.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-12); case _ => }
    }
  }

  test("IVF balance: lists conserve the corpus, metrics agree with the confusion matrix") {
    val rows = Ann.ivfBalance(emb).collect()
    val nTotal = emb.count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == nTotal, "every vector lands in one list")
    val k = rows.length.toLong
    val maxList = rows.map(_.getAs[Long]("n_vecs")).max
    val sumSq = rows.map(r => r.getAs[Long]("n_vecs") * r.getAs[Long]("n_vecs")).sum
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("imbalance_x") - maxList * k * 1.0 / nTotal) < 1e-6)
      assert(math.abs(r.getAs[Double]("exp_probe_cost") - sumSq * 1.0 / nTotal) < 1e-3)
      assert(r.getAs[Double]("pct") > 0.0)
    }
    assert(rows.head.getAs[Double]("imbalance_x") >= 1.0, "imbalance factor floors at even split")
    assert(rows.head.getAs[Double]("exp_probe_cost") >= nTotal.toDouble / k - 1e-6,
      "expected probe cost floors at N/k (even lists)")
    // same assignment as the confusion matrix: per-assigned column sums agree
    val confusion = Ann.centroidAssign(emb).collect()
      .groupBy(_.getAs[Number]("assigned").longValue).view
      .mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    rows.foreach(r =>
      assert(confusion(r.getAs[Number]("assigned").longValue) == r.getAs[Long]("n_vecs"),
        "balance lists must be the confusion matrix's column sums"))
  }

  test("k-center coreset: greedy trajectory deterministic, coverage monotone non-increasing") {
    val rows = Ann.kCenterCoreset(emb, k = 5).collect().sortBy(_.getAs[Long]("sel_order"))
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Long]("center_id")).distinct.length == 5, "centers are distinct")
    // the seed is the min vec_id and has no distance-when-chosen
    assert(rows.head.getAs[Long]("center_id") ==
      emb.agg(min("vec_id")).head().getLong(0))
    assert(rows.head.isNullAt(rows.head.fieldIndex("dist_when_chosen")))
    // each later pick was chosen AT the previous coverage radius, and the
    // radius never increases as centers are added
    rows.sliding(2).foreach {
      case Array(prev, cur) =>
        assert(cur.getAs[Double]("dist_when_chosen") == prev.getAs[Double]("coverage_after"),
          "a pick is by definition the farthest point of the previous round")
        assert(cur.getAs[Double]("coverage_after") <= prev.getAs[Double]("coverage_after"),
          "coverage radius must be monotone non-increasing")
      case _ =>
    }
    // rerun: the trajectory is bit-identical (rounded distances + id ties)
    val again = Ann.kCenterCoreset(emb, k = 5).collect().sortBy(_.getAs[Long]("sel_order"))
    assert(again.map(_.getAs[Long]("center_id")).toSeq ==
      rows.map(_.getAs[Long]("center_id")).toSeq)
  }
}
