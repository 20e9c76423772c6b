package graft

import graft.plans.{PrefixSum, QuarterQuantiles}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Randomized equivalence checks for the distributed primitives several
  * operator families lean on: whatever the data shape, `PrefixSum` must
  * equal the single-partition window running sum and `QuarterQuantiles`
  * must equal the sort-based exact interpolated quantile. Seeded trials —
  * deterministic, but exercising sizes/buckets/groups the fixed test data
  * never hits (singleton groups, bucketWidth 1, duplicate-heavy values). */
class PlanPrimitivesPropertySpec extends SparkSpec {

  test("PrefixSum equals the window running sum across random inputs, buckets and modes") {
    import spark.implicits._
    val rnd = new Random(42)
    for (trial <- 1 to 8) {
      val n = 1 + rnd.nextInt(200)
      val nGroups = 1 + rnd.nextInt(3)
      val keys = rnd.shuffle((1 to 500).toList).take(n)
      val rows = keys.map(k => (k.toLong, rnd.nextInt(1000).toLong, rnd.nextInt(nGroups).toString))
      val df = rows.toDF("k", "v", "g")
      val nBuckets = Seq(1, 3, 32)(trial % 3)
      val inclusive = trial % 2 == 0
      val got = PrefixSum.prefixSum(df, "k", "v", "out", inclusive, nBuckets, Seq("g"))
        .select("g", "k", "out").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val w = Window.partitionBy("g").orderBy("k")
        .rowsBetween(Window.unboundedPreceding, if (inclusive) 0 else -1)
      val want = df.withColumn("out", coalesce(sum(col("v")).over(w), lit(0L)))
        .select("g", "k", "out").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == want, s"trial $trial (nBuckets=$nBuckets inclusive=$inclusive)")

      val gotGlobal = PrefixSum.prefixSum(df, "k", "v", "out", inclusive, nBuckets)
        .select("k", "out").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val wg = Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, if (inclusive) 0 else -1)
      val wantGlobal = df.withColumn("out", coalesce(sum(col("v")).over(wg), lit(0L)))
        .select("k", "out").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotGlobal == wantGlobal, s"global trial $trial")
    }
  }

  test("prefixSums multi-value equals independent single-value prefix sums") {
    import spark.implicits._
    val rnd = new Random(137)
    for (trial <- 1 to 4) {
      val n = 1 + rnd.nextInt(150)
      val rows = rnd.shuffle((1 to 400).toList).take(n)
        .map(k => (k.toLong, rnd.nextInt(100).toLong, rnd.nextInt(1000).toLong))
      val df = rows.toDF("k", "a", "b")
      val multi = PrefixSum.prefixSums(df, "k", Seq("a" -> "ca", "b" -> "cb"))
        .select("k", "ca", "cb").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val singleA = PrefixSum.prefixSum(df, "k", "a", "ca")
        .select("k", "ca").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val singleB = PrefixSum.prefixSum(df, "k", "b", "cb")
        .select("k", "cb").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows.foreach { case (k, _, _) =>
        assert(multi(k) == ((singleA(k), singleB(k))), s"trial $trial key $k")
      }
    }
  }

  test("PrefixSum stays correct AND balanced under pathological key skew") {
    import spark.implicits._
    val rnd = new Random(271)
    // ≥90% of rows land in one key decile of the range [0, 100000): an
    // equal-width bucketing would drop ~90% of rows into ~3 of 32 buckets;
    // the equi-height edges must keep every bucket ≤ 2× the ideal share.
    val n = 5000
    val rows = (0 until n).map { i =>
      val k = if (rnd.nextInt(10) < 9) 30000L + rnd.nextInt(10000) // hot decile
              else rnd.nextInt(100000).toLong
      (k * 1000L + i, 1L) // unique keys, skew preserved at ×1000 scale
    }
    val df = rows.toDF("k", "v").repartition(8)
    // correctness under skew
    val got = PrefixSum.prefixSum(df, "k", "v", "out")
      .select("k", "out").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    val want = df.withColumn("out", sum(col("v")).over(w))
      .select("k", "out").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, "prefix sums must be exact under skew")
    // balance: no bucket holds more than 2× the ideal equal share
    val counts = PrefixSum.equiHeightBuckets(df, "k", 32)
      .groupBy("bucket__ps").count().collect().map(_.getLong(1))
    val ideal = math.ceil(n / 32.0)
    assert(counts.max <= 2 * ideal,
      s"max bucket ${counts.max} exceeds 2×ideal ($ideal); counts=${counts.sorted.reverse.take(5).mkString(",")}")
    assert(counts.length >= 16, s"skew collapsed the spread to ${counts.length} buckets")
  }

  test("lagOver and prefixMax equal their unpartitioned window forms across random inputs") {
    import spark.implicits._
    val rnd = new Random(314)
    for (trial <- 1 to 6) {
      val n = 1 + rnd.nextInt(250)
      // unique keys, possibly sparse; vals null-able for the prefixMax
      // conditional-max shape (lagOver is fed the non-null key itself)
      val keys = rnd.shuffle((1 to 2000).toList).take(n).map(_.toLong)
      val rows = keys.map(k => (k, if (rnd.nextInt(3) == 0) Some(k * 7) else None))
      val df = rows.toDF("k", "cv").repartition(5)
      val nBuckets = Seq(1, 4, 32)(trial % 3)

      val gotLag = PrefixSum.lagOver(df, "k", "k", "prev", nBuckets)
        .select("k", "prev").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      val wantLag = df.withColumn("prev", lag(col("k"), 1).over(Window.orderBy("k")))
        .select("k", "prev").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      assert(gotLag == wantLag, s"lagOver trial $trial (nBuckets=$nBuckets)")

      val gotMax = PrefixSum.prefixMax(df, "k", "cv", "runmax", nBuckets)
        .select("k", "runmax").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      val wMax = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
      val wantMax = df.withColumn("runmax", max(col("cv")).over(wMax))
        .select("k", "runmax").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      assert(gotMax == wantMax, s"prefixMax trial $trial (nBuckets=$nBuckets)")
    }
  }

  test("discreteQuartiles equals sort-based rank selection across random inputs") {
    import spark.implicits._
    val rnd = new Random(58)
    for (trial <- 1 to 8) {
      val nGroups = 1 + rnd.nextInt(3)
      val rows = (0 until nGroups).flatMap { gi =>
        val n = 1 + rnd.nextInt(300)
        val hi = if (trial % 2 == 1) 10 else 5000 // odd trials: heavy duplicates
        (0 until n).map(_ => (gi.toString, rnd.nextInt(hi).toLong))
      }
      val df = rows.toDF("g", "v")
      val bw = Seq(1L, 7L, 1000L)(trial % 3)
      val got = QuarterQuantiles.discreteQuartiles(df, Seq("g"), "v", Seq(1, 2, 3), bw)
        .collect()
        .map(r => r.getAs[String]("g") ->
          ((r.getAs[Long]("q1_disc"), r.getAs[Long]("q2_disc"), r.getAs[Long]("q3_disc")))).toMap
      rows.groupBy(_._1).foreach { case (gk, grp) =>
        val v = grp.map(_._2).sorted.toIndexedSeq
        val n = v.length
        // rank ceil(p·n/4) == the min value whose cumulative count reaches p·n/4
        def sel(p: Int): Long = v(((p.toLong * n + 3) / 4).toInt - 1)
        assert(got(gk) == ((sel(1), sel(2), sel(3))),
          s"group $gk trial $trial (bw=$bw n=$n): got ${got(gk)}, want ${(sel(1), sel(2), sel(3))}")
      }
      // the global (no-group) form used by ev_rfm
      val gGlobal = QuarterQuantiles.discreteQuartiles(df, Seq.empty, "v", Seq(1, 2, 3), bw)
        .collect().map(r =>
          (r.getAs[Long]("q1_disc"), r.getAs[Long]("q2_disc"), r.getAs[Long]("q3_disc"))).head
      val v = rows.map(_._2).sorted.toIndexedSeq
      val n = v.length
      def selAll(p: Int): Long = v(((p.toLong * n + 3) / 4).toInt - 1)
      assert(gGlobal == ((selAll(1), selAll(2), selAll(3))), s"global trial $trial")
    }
  }

  test("native TopKPerKey equals the window top-k across random inputs, ks and directions") {
    import spark.implicits._
    val rnd = new Random(99)
    for (trial <- 1 to 6) {
      val n = 1 + rnd.nextInt(300)
      val nKeys = 1 + rnd.nextInt(12)
      // duplicate-heavy values force tie-breaks through the id column
      val rows = (0 until n).map(i => (rnd.nextInt(nKeys).toLong, rnd.nextInt(20).toLong, i.toLong))
      val df = rows.toDF("g", "v", "id").repartition(4)
      val k = Seq(1, 2, 5)(trial % 3)
      val desc = trial % 2 == 0
      val native = graft.operators.TopK.nativePerKey(df, Seq("g"), Seq(("v", desc), ("id", false)), k)
        .select("g", "v", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val w = Window.partitionBy(col("g"))
        .orderBy(if (desc) col("v").desc else col("v").asc, col("id").asc)
      val window = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
        .select("g", "v", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(native == window, s"trial $trial (k=$k desc=$desc): " +
        s"native-only=${(native -- window).take(3)} window-only=${(window -- native).take(3)}")
    }
  }

  test("asofJoin equals the brute-force point-in-time match across random inputs") {
    import spark.implicits._
    val rnd = new Random(123)
    for (trial <- 1 to 6) {
      val nKeys = 1 + rnd.nextInt(5)
      val nl = 1 + rnd.nextInt(120)
      val nr = rnd.nextInt(120) // can be tiny -> unmatched lefts
      val left = (0 until nl).map(i => (rnd.nextInt(nKeys).toLong, rnd.nextInt(1000).toLong, i.toLong))
      // unique (key, rts) so the at-or-before winner is well-defined
      val rightPairs = rnd.shuffle(
        (for (k <- 0 until nKeys; t <- 0 until 1000) yield (k.toLong, t.toLong)).toList).take(nr)
      val right = rightPairs.zipWithIndex.map { case ((k, t), i) => (k, t, (1000 + i).toLong) }
      val ldf = left.toDF("k", "ts", "lid").repartition(3)
      val rdf = right.toDF("k", "rts", "rid").repartition(3)
      val out = graft.operators.AsofJoin
        .asofJoin(ldf, rdf, "k", "ts", "rts", Seq("rid", "rts")).collect()
      val got = out.map { r =>
        val asof = r.getAs[org.apache.spark.sql.Row]("asof")
        r.getAs[Long]("lid") -> (if (asof == null) -1L else asof.getAs[Long]("rid"))
      }.toMap
      val byKey = right.groupBy(_._1)
      left.foreach { case (k, ts, lid) =>
        val want = byKey.getOrElse(k, Nil).filter(_._2 <= ts)
          .sortBy(_._2).lastOption.map(_._3).getOrElse(-1L)
        assert(got(lid) == want, s"trial $trial lid=$lid key=$k ts=$ts")
      }
    }
  }

  test("connectedComponents equals union-find min-labels on random graphs") {
    import spark.implicits._
    val rnd = new Random(31)
    for (trial <- 1 to 5) {
      val n = 2 + rnd.nextInt(80)
      val nEdges = rnd.nextInt(2 * n) // sparse through mildly dense, possibly 0
      val nodes = (0 until n).map(_.toLong)
      val edges = (0 until nEdges).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val nodesDf = nodes.toDF("doc_id")
      val pairsDf =
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
        else edges.toDF("doc_a", "doc_b")
      val got = graft.dedup.Components.connectedComponents(nodesDf, pairsDf).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("comp")).toMap
      // brute-force union-find with min-label extraction
      val parent = scala.collection.mutable.ArrayBuffer.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val minLabel = nodes.groupBy(v => find(v.toInt)).map { case (_, vs) => find(vs.head.toInt) -> vs.min }
      val want = nodes.map(v => v -> minLabel(find(v.toInt))).toMap
      assert(got == want, s"trial $trial (n=$n edges=${edges.size})")
    }
  }

  test("Memo: identical frame + tag reuses the artifact; a different tag rebuilds") {
    import spark.implicits._
    val df = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    var builds = 0
    def build(): org.apache.spark.sql.DataFrame = {
      builds += 1
      df.withColumn("c", col("a") + col("b")).localCheckpoint(true)
    }
    val r1 = graft.plans.Memo.memoize(df, "spec.memo.a")(build())
    val r2 = graft.plans.Memo.memoize(df, "spec.memo.a")(build())
    assert(builds == 1, "second identical call must reuse, not rebuild")
    assert(r1 eq r2, "memo returns the same materialized artifact")
    graft.plans.Memo.memoize(df, "spec.memo.b")(build())
    assert(builds == 2, "a different tag is a different artifact")
  }

  test("QuarterQuantiles equals sort-based exact interpolated quantiles across random inputs") {
    import spark.implicits._
    val rnd = new Random(7)
    for (trial <- 1 to 8) {
      val nGroups = 1 + rnd.nextInt(3)
      val rows = (0 until nGroups).flatMap { gi =>
        val n = 1 + rnd.nextInt(300)
        // small value range on odd trials -> heavy duplicates
        val hi = if (trial % 2 == 1) 10 else 5000
        (0 until n).map(_ => (gi.toString, rnd.nextInt(hi).toLong))
      }
      val df = rows.toDF("g", "v")
      val bw = Seq(1L, 7L, 1000L)(trial % 3)
      val got = QuarterQuantiles.quarterQuantiles(df, Seq("g"), "v", Seq(1, 2, 3), bw)
        .collect()
        .map(r => r.getAs[String]("g") ->
          ((r.getAs[Long]("q1_x4"), r.getAs[Long]("q2_x4"), r.getAs[Long]("q3_x4")))).toMap
      rows.groupBy(_._1).foreach { case (gk, grp) =>
        val v = grp.map(_._2).sorted.toIndexedSeq
        val n = v.length
        def qx4(p: Int): Long = {
          val pos4 = p.toLong * n + (4 - p)
          val k = (pos4 / 4).toInt
          val j = (pos4 % 4).toInt
          if (j == 0) 4L * v(k - 1) else (4L - j) * v(k - 1) + j.toLong * v(k)
        }
        assert(got(gk) == ((qx4(1), qx4(2), qx4(3))),
          s"group $gk trial $trial (bw=$bw n=$n): got ${got(gk)}, want ${(qx4(1), qx4(2), qx4(3))}")
      }
    }
  }

  test("Intervals.islands union length equals the brute-force point-set size") {
    import spark.implicits._
    val rnd = new Random(271)
    for (trial <- 1 to 8) {
      val nKeys = 1 + rnd.nextInt(4)
      val rows = (1 to (1 + rnd.nextInt(120))).map { _ =>
        val key = rnd.nextInt(nKeys).toLong
        val s = rnd.nextInt(100).toLong
        // include empty (e == s), unit, and long intervals; heavy overlap
        (key, s, s + rnd.nextInt(12).toLong)
      }
      val df = rows.toDF("k", "s", "e")
      // union length per key from the islands labeling (the consumers'
      // aggregation shape: span per island, summed)
      val got = graft.plans.Intervals.islands(df, keys = Seq("k"))
        .groupBy(col("k"), col("isl"))
        .agg((max(col("e")) - min(col("s"))).as("cov"))
        .groupBy(col("k")).agg(sum(col("cov")).as("u"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // brute force: materialize the covered integer points per key
      val want = rows.groupBy(_._1).map { case (k, iv) =>
        k -> iv.flatMap { case (_, s, e) => s until e }.toSet.size.toLong
      }
      assert(got.keySet == want.keySet, s"trial $trial keys")
      for ((k, u) <- want)
        assert(got(k) == u, s"trial $trial key $k: islands union ${got(k)} != brute $u")
    }
  }

  test("CrossSketch HLL: estimate within 5*rsd across random cardinalities, ranks well-formed") {
    import graft.plans.CrossSketch._
    import spark.implicits._
    val rnd = new Random(7)
    for (trial <- 1 to 6) {
      // cardinalities spanning linear-counting and raw-HLL regimes
      val n = Seq(17, 200, 900, 3000, 20000, 120000)(trial - 1)
      val keys = rnd.shuffle((1L to 400000L).toList).take(n)
      val df = keys.toDF("k")
      val regs = df.select(hash31(col("k")).as("h"))
        .select(hllBucket(col("h")).as("bucket"), hllRank(col("h")).as("r"))
      // ranks live in [1, RankCap], buckets in [0, m)
      val mm = regs.agg(min("bucket"), max("bucket"), min("r"), max("r")).head()
      assert(mm.getLong(0) >= 0 && mm.getLong(1) < HllM)
      assert(mm.getInt(2) >= 1 && mm.getInt(3) <= HllRankCap)
      val est = regs.groupBy(col("bucket")).agg(max(col("r")).as("r"))
        .agg(hllSumCol.as("s"), hllZerosCol.as("v"))
        .select(hllEstimate(col("s"), col("v")).as("est")).head().getLong(0)
      val rel = math.abs(est - n).toDouble / n
      assert(rel <= HllErrBound, s"trial $trial n=$n est=$est rel=$rel > $HllErrBound")
      // duplicate-insensitivity: unioning the data with itself cannot move
      // a single register (same key -> same (bucket, rank))
      val est2 = df.unionAll(df).select(hash31(col("k")).as("h"))
        .groupBy(hllBucket(col("h")).as("bucket")).agg(max(hllRank(col("h"))).as("r"))
        .agg(hllSumCol.as("s"), hllZerosCol.as("v"))
        .select(hllEstimate(col("s"), col("v")).as("est")).head().getLong(0)
      assert(est2 == est, s"trial $trial: duplicates moved the estimate $est -> $est2")
      // the typed-aggregator (streaming-state) form must produce the
      // IDENTICAL estimate — same hash, same exact dyadic sum, same libm
      val estUdaf = df.agg(hllDistinct(col("k")).as("est")).head().getLong(0)
      assert(estUdaf == est, s"trial $trial: udaf $estUdaf != register table $est")
    }
  }
}
