package graft

import graft.tables.Tables
import graft.dedup.{Components, Dedup}
import graft.lake.Manifest
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {

  test("connected components: every edge endpoint shares its pair's component") {
    val docs = Tables.documents(spark, sf0001)
    val pairs = Dedup.minhashLsh(docs)
    val comps = Components.connectedComponents(docs, pairs)
    val mismatches = pairs
      .join(comps.withColumnsRenamed(Map("doc_id" -> "doc_a", "comp" -> "ca")), Seq("doc_a"))
      .join(comps.withColumnsRenamed(Map("doc_id" -> "doc_b", "comp" -> "cb")), Seq("doc_b"))
      .filter(col("ca") =!= col("cb")).count()
    assert(mismatches == 0, "paired docs must land in the same component")
    // component label is the minimum member id
    val badLabel = comps.filter(col("comp") > col("doc_id")).count()
    assert(badLabel == 0)
    assert(comps.count() == docs.count(), "every doc gets a component (singletons included)")
  }

  test("batched convergence: a long chain needing several batches converges to exact min labels") {
    // A path graph 0-1-2-...-11 takes 11 propagation steps to pull node 11
    // down to label 0 — several StepsPerCheck batches, so this pins the
    // batched loop's convergence detection (a premature zero-change read
    // or an off-by-one in the comp<comp0 batch test would strand a suffix
    // of the chain above its true component). Plus isolated singletons.
    import spark.implicits._
    val nodes = (0L to 13L).toDF("doc_id")
    val pairs = (0L until 11L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comps = Components.connectedComponents(nodes, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 11L).foreach(i => assert(comps(i) == 0L, s"chain node $i must reach label 0"))
    assert(comps(12L) == 12L && comps(13L) == 13L, "isolated nodes stay singletons")
  }

  test("split leakage: every doc assigned once, leak accounting consistent per split") {
    val docs = Tables.documents(spark, sf0001)
    val out = Components.splitLeakage(docs).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.count(),
      "splits must partition the corpus")
    out.foreach { r =>
      val leaky = r.getAs[Long]("leaky_docs")
      assert(leaky >= 0L && leaky <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("leaky_pct") >= 0.0 && r.getAs[Double]("leaky_pct") <= 100.0)
    }
    // cross-check: leaky docs are exactly members of components spanning >1 split
    val comps = Components.minhashComponents(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("comp"))
    val split = comps.map { case (d, _) =>
      val b = (d % 1000003L) * 2654435761L % 1000003L % 100L
      d -> (if (b < 90) "train" else if (b < 95) "val" else "test")
    }.toMap
    val spanning = comps.groupBy(_._2).filter(_._2.map(p => split(p._1)).distinct.length > 1)
      .values.flatten.map(_._1).toSet
    val wantLeaky = spanning.groupBy(split).view.mapValues(_.size.toLong).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("leaky_docs") == wantLeaky.getOrElse(r.getAs[String]("split"), 0L))
    }
  }

  test("semantic clusters: total coverage, min-id labels, pairs co-clustered") {
    val emb = Tables.embeddings(spark, sf0001)
    val clusters = Components.semanticClusters(emb)
    assert(clusters.count() == emb.count(), "every vector gets a cluster")
    assert(clusters.filter(col("comp") > col("vec_id")).count() == 0, "label is the min reachable id")
    assert(clusters.filter(col("is_rep") =!= (col("vec_id") === col("comp"))).count() == 0)
    val byComp = clusters.collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("comp")).toMap
    Dedup.embeddingNearDup(emb).collect().foreach { r =>
      assert(byComp(r.getAs[Long]("vec_a")) == byComp(r.getAs[Long]("vec_b")),
        "near-dup pair split across clusters")
    }
  }

  test("manifest tree planning: deeper trees trade index reads for scan work") {
    val rows = Manifest.treePlanning(Tables.lineitem(spark, sf0001), "1997-01", "1997-06")
      .collect().map(r => r.getAs[String]("structure") ->
        (r.getAs[Long]("index_reads"), r.getAs[Long]("entries_scanned"))).toMap
    assert(rows("flat")._1 == 1)
    assert(rows("two_level")._1 > 1)
    assert(rows("two_level")._2 < rows("flat")._2, "partition pruning must cut scanned entries")
    assert(rows("three_level")._1 >= rows("two_level")._1)
  }

  test("soft dedup: cluster weights sum to one, totals equal the hard-drop survivor count") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val rows = graft.dedup.Components.softDedupWeights(docs).collect()
    assert(rows.length == docs.count(), "soft dedup keeps every document")
    val byComp = rows.groupBy(_.getAs[Long]("comp"))
    byComp.foreach { case (c, g) =>
      assert(g.forall(_.getAs[Long]("comp_size") == g.length),
        s"comp $c: size column disagrees with the actual cluster")
      assert(math.abs(g.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-4,
        s"comp $c: weights must sum to 1")
    }
    // total effective docs = number of components = what a hard keep-best drop retains
    val comps = graft.dedup.Components.minhashComponents(docs).collect()
      .map(_.getAs[Long]("comp")).distinct.length
    assert(math.abs(rows.map(_.getAs[Double]("weight")).sum - comps) < 1e-3)
    // singletons carry full weight; every weight in (0, 1]
    rows.foreach { r =>
      val w = r.getAs[Double]("weight")
      assert(w > 0.0 && w <= 1.0)
      if (r.getAs[Long]("comp_size") == 1L) assert(w == 1.0)
    }
  }
}
