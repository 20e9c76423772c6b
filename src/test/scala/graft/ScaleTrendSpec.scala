package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.tables.{ScaleUp, Tables}

/** Deterministic counterpart of the Bench `scale_trend` timing block: proves
  * the LINEARITY of the candidate-generation stages by cardinality, which is
  * noise-free where wall-clock is not.
  *
  * [[ScaleUp]] replicas are mutually disjoint by construction (salted
  * shingles, shifted ids, rotated embeddings), so for every
  * inverted-index / LSH operator the candidate-pair table over an m×
  * corpus must be (a) free of cross-replica pairs and (b) for the
  * vocab-independent exact operators, EXACTLY m× the base count — total
  * candidate work is then Σ per-replica work, i.e. linear in volume by
  * construction, not merely measured so.
  */
class ScaleTrendSpec extends SparkSpec {

  private lazy val dirs: (String, String) = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_scale_spec_").toString
    ScaleUp.materialize(spark, sf0001, s"$tmp/x3", 3,
      tables = Seq("documents", "embeddings", "events"))
    (sf0001, s"$tmp/x3")
  }
  private def base = dirs._1
  private def x3 = dirs._2

  private def replicaOf(c: String) = (col(c) / lit(ScaleUp.IdStride)).cast("long")

  private def crossReplica(pairs: DataFrame, a: String, b: String): Long =
    pairs.filter(replicaOf(a) =!= replicaOf(b)).count()

  test("scale-up replicas multiply table volume exactly") {
    assert(Tables.documents(spark, x3).count() === 3 * Tables.documents(spark, base).count())
    assert(Tables.embeddings(spark, x3).count() === 3 * Tables.embeddings(spark, base).count())
    assert(Tables.events(spark, x3).count() === 3 * Tables.events(spark, base).count())
    // replica salting keeps per-replica token statistics isomorphic: total
    // token count triples exactly (suffixes add chars, never tokens)
    def nTok(d: String) = Tables.documents(spark, d)
      .select(sum(size(split(trim(col("text")), "\\s+")))).head().getLong(0)
    assert(nTok(x3) === 3 * nTok(base))
  }

  test("exact-dedup group structure scales exactly linearly") {
    val b = Dedup.exact(Tables.documents(spark, base))
    val s = Dedup.exact(Tables.documents(spark, x3))
    assert(s.count() === 3 * b.count())
    // group-size histogram is replica-invariant: 3× the docs at every size
    val bh = b.groupBy("group_size").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sh = s.groupBy("group_size").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh === bh.map { case (k, v) => k -> 3 * v })
  }

  test("shingle inverted-index pairs scale exactly linearly with zero cross-replica candidates") {
    val bj = Dedup.ngramJaccardPairs(Tables.documents(spark, base))
    val sj = Dedup.ngramJaccardPairs(Tables.documents(spark, x3))
    assert(sj.count() === 3 * bj.count())
    assert(crossReplica(sj, "doc_a", "doc_b") === 0L)
    val bc = Dedup.containmentPairs(Tables.documents(spark, base))
    val sc = Dedup.containmentPairs(Tables.documents(spark, x3))
    assert(sc.count() === 3 * bc.count())
    assert(crossReplica(sc, "doc_a", "doc_b") === 0L)
  }

  test("substring-run coverage scales exactly linearly") {
    val b = Dedup.substringDup(Tables.documents(spark, base))
    val s = Dedup.substringDup(Tables.documents(spark, x3))
    assert(s.count() === 3 * b.count())
  }

  test("minhash LSH candidates never cross replicas and grow at least linearly in the base") {
    // hashTid=true (dictionary-hash vocab ids) makes replica 0's signatures
    // independent of the other replicas' tokens: the base corpus's pairs
    // reappear verbatim, salted replicas draw fresh same-shaped candidates.
    val b = Dedup.minhashLsh(Tables.documents(spark, base), hashTid = true)
    val s = Dedup.minhashLsh(Tables.documents(spark, x3), hashTid = true)
    assert(crossReplica(s, "doc_a", "doc_b") === 0L)
    val (bn, sn) = (b.count(), s.count())
    assert(sn >= bn, s"scaled corpus lost base-replica candidates: $sn < $bn")
    assert(sn <= 5 * bn + 10, s"candidate growth super-linear: $bn -> $sn at 3x volume")
  }

  test("embedding LSH candidates never cross replicas (rotation decorrelates)") {
    val s = Dedup.embeddingNearDup(Tables.embeddings(spark, x3), threshold = 0.8)
    assert(crossReplica(s, "vec_a", "vec_b") === 0L)
  }

  test("sessionization scales exactly linearly (per-user history replica-invariant)") {
    val b = SparkEntry.queries("ev_sessionize")(spark, base)
    val s = SparkEntry.queries("ev_sessionize")(spark, x3)
    assert(s.count() === 3 * b.count())
  }

  test("rung guard: non-monotone cpu profiles detected, envelope defuses the dip") {
    // the r14 false-confirm profile: a JIT-inflated 1x rung above the 4x
    // rung — raw last/mid ratio 9.78, envelope ratio divides by the 1x
    // lower bound instead of the deflated denominator
    val dip = Seq(0.508, 0.283, 2.766)
    assert(!Bench.monotoneCpu(dip))
    assert(Bench.cpuEnvelope(dip) == Seq(0.508, 0.508, 2.766))
    assert(Bench.envelopeRatioHi(dip) < dip(2) / dip(1))
    assert(math.abs(Bench.envelopeRatioHi(dip) - 2.766 / 0.508) < 1e-9)
    // a clean monotone profile passes untouched and keeps its raw ratio
    val clean = Seq(0.109, 0.150, 0.203)
    assert(Bench.monotoneCpu(clean))
    assert(Bench.cpuEnvelope(clean) == clean)
    assert(math.abs(Bench.envelopeRatioHi(clean) - 0.203 / 0.150) < 1e-9)
    // small jitter inside the 5% tolerance is not a dip
    assert(Bench.monotoneCpu(Seq(1.00, 0.97, 1.5)))
    // a dip on the LAST rung clamps the ratio at >= 1 territory (the
    // numerator rises to the envelope, never below the denominator)
    val lastDip = Seq(0.5, 1.0, 0.6)
    assert(!Bench.monotoneCpu(lastDip))
    assert(math.abs(Bench.envelopeRatioHi(lastDip) - 1.0) < 1e-9)
    // a genuinely super-linear profile keeps its full ratio — the guard
    // cannot mask a real flag
    val quad = Seq(0.1, 1.6, 25.6)
    assert(Bench.monotoneCpu(quad))
    assert(math.abs(Bench.envelopeRatioHi(quad) - 16.0) < 1e-9)
  }
}
