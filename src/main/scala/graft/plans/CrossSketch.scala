package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine DETERMINISTIC sketches: HyperLogLog registers and the
  * register→estimate arithmetic expressed so that ANY SQL engine can
  * recompute the estimate bit-for-bit — the property that turns this
  * repo's approximate queries from "self-verified, rows-only" into fully
  * oracle-checked results (the DuckDB oracle re-derives the ESTIMATE, not
  * just the exact anchor).
  *
  * Why a from-scratch HLL instead of Spark's `approx_count_distinct` /
  * `hll_sketch_agg`: those bind the result to one library's hash
  * (xxHash64 / murmur) and register encoding, so no other engine can
  * reproduce the estimate and the best a test can do is an error
  * envelope. Here every ingredient is chosen to be ENGINE-NEUTRAL:
  *
  *  - hash: two LCG rounds + xorshift folds in the mod-2³¹ integer
  *    domain — every product stays below 2⁶² so 64-bit integer engines
  *    (JVM longs, DuckDB BIGINT, Postgres int8) compute it exactly, no
  *    wrap-around semantics needed (the [[graft.lake.iceberg.Puffin]]
  *    KMV hash plays the same trick with one Knuth round);
  *  - rank: `21 - (length(bin(w)) - 1)` — floor(log₂) via the binary
  *    string, pure integer/string ops, no libm;
  *  - register sum Σ 2^−r: every term is a dyadic rational ≥ 2⁻²² and
  *    the total is < 2¹⁰, so EVERY partial sum is exactly representable
  *    in an IEEE double — the sum is exact and order-independent (no
  *    float-summation nondeterminism across partitionings);
  *  - estimate: α·m²/S is one IEEE multiply+divide of exact inputs;
  *    the linear-counting branch m·ln(m/V) is the one libm call, and
  *    JVM `Math.log` ≡ DuckDB `ln` was verified for all 1024 possible V
  *    (they are correctly-rounded on these inputs).
  *
  * The HLL shape is the classic Flajolet–Fusy–Gandouet–Meunier
  * estimator with the small-range linear-counting correction (the
  * HLL++ bias table is NOT used — it is an empirical lookup that would
  * have to be duplicated in every engine; the 5·rsd envelopes these
  * queries carry hold without it). m = 1024 registers (B = 10 bucket
  * bits, 21 rank bits, rank ∈ [1, 22]).
  *
  * Scale: registers live at (group, bucket) grain — group-cardinality ×
  * 1024 rows, constant per group, mergeable map-side; never O(distinct
  * keys). Reference anchor: the reference's NDV/statistics studies keep
  * sketches per file and merge (`poc/test_wide_table_pruning.py` root
  * manifest stats); this is that idea with the estimator itself made
  * portable.
  */
object CrossSketch {

  /** Register-count exponent / count: m = 2^B. */
  val HllB = 10
  val HllM: Int = 1 << HllB // 1024
  /** Rank bits: hash is 31 bits → 21 suffix bits after B bucket bits. */
  val HllSuffixBits: Int = 31 - HllB // 21
  val HllSuffixMod: Long = 1L << HllSuffixBits // 2097152
  /** Rank for an all-zero suffix (max leading zeros + 1). */
  val HllRankCap: Int = HllSuffixBits + 1 // 22
  /** α·m² for m = 1024 (α = 0.7213/(1 + 1.079/m)); spliced into SQL via
    * Double.toString, which round-trips to the identical double. */
  val HllAlphaM2: Double = 0.7213 / (1.0 + 1.079 / HllM) * HllM.toDouble * HllM.toDouble
  /** Raw-estimate ceiling below which linear counting takes over. */
  val HllLinearMax: Double = 2.5 * HllM
  /** Relative-error envelope: 5 × rsd, rsd = 1.04/√m. */
  val HllErrBound: Double = 5.0 * 1.04 / math.sqrt(HllM.toDouble)

  // LCG constants (public-domain classics: glibc's rand and the VAX
  // MTH$RANDOM multiplier) + xorshift fold distances.
  private val A1 = 1103515245L; private val C1 = 12345L
  private val A2 = 69069L; private val C2 = 1234567L
  private val M31 = 2147483648L
  private val P31 = 2147483647L

  /** 31-bit mix of a non-negative integer key — Column side. */
  def hash31(k: Column): Column = {
    val h0 = pmod(k.cast("long"), lit(P31))
    val h1 = (lit(A1) * h0 + lit(C1)) % lit(M31)
    val h1x = h1.bitwiseXOR(shiftright(h1, 15))
    val h2 = (lit(A2) * h1x + lit(C2)) % lit(M31)
    h2.bitwiseXOR(shiftright(h2, 13))
  }

  /** The same mix as DuckDB SQL text (keep in lockstep with [[hash31]]). */
  def hash31Sql(k: String): String = {
    val h0 = s"(($k) % $P31)"
    val h1 = s"(($A1 * $h0 + $C1) % $M31)"
    val h1x = s"xor($h1, $h1 >> 15)"
    val h2 = s"(($A2 * $h1x + $C2) % $M31)"
    s"xor($h2, $h2 >> 13)"
  }

  /** HLL bucket of a mixed hash: top B bits. */
  def hllBucket(h: Column): Column = shiftright(h, HllSuffixBits)
  def hllBucketSql(h: String): String = s"(($h) >> $HllSuffixBits)"

  /** HLL rank of a mixed hash: leading zeros of the suffix + 1, via the
    * binary-string floor(log₂) — no libm. */
  def hllRank(h: Column): Column = {
    val w = h % lit(HllSuffixMod)
    when(w === 0, lit(HllRankCap))
      .otherwise(lit(HllSuffixBits) - (length(bin(w)) - lit(1)))
  }
  def hllRankSql(h: String): String = {
    val w = s"(($h) % $HllSuffixMod)"
    s"(CASE WHEN $w = 0 THEN $HllRankCap ELSE $HllSuffixBits - (length(bin($w)) - 1) END)"
  }

  /** Register-array summary → estimate, from the EXACT dyadic sum
    * S = Σ_b 2^−r_b (absent buckets contribute 2⁰ = 1 each) and the
    * zero-register count V. Raw α·m²/S with the linear-counting
    * fallback; rounded to a whole count. */
  def hllEstimate(s: Column, v: Column): Column =
    when(lit(HllAlphaM2) / s <= lit(HllLinearMax) && v > 0,
      round(lit(HllM.toDouble) * log(lit(HllM.toDouble) / v)))
      .otherwise(round(lit(HllAlphaM2) / s))
      .cast("long")
  def hllEstimateSql(s: String, v: String): String =
    s"""(CASE WHEN $HllAlphaM2 / ($s) <= $HllLinearMax AND ($v) > 0
       | THEN CAST(round($HllM.0 * ln($HllM.0 / ($v))) AS BIGINT)
       | ELSE CAST(round($HllAlphaM2 / ($s)) AS BIGINT) END)""".stripMargin

  /** The exact dyadic register sum and zero count over a (… , bucket, r)
    * register table grouped by `grp`: SQL fragment bodies the oracles
    * compose. S = Σ 2^−r + (m − present); V = m − present. */
  def hllSumSql: String = s"sum(1.0 / (1 << r)) + ($HllM - count(*))"
  def hllZerosSql: String = s"$HllM - count(*)"

  /** Column-side register sum/zeros over a DataFrame with columns
    * (grp…, bucket, r): aggregate expressions for `groupBy(grp…)`. */
  def hllSumCol: Column = sum(lit(1.0) / expr("shiftleft(1, r)")) + (lit(HllM) - count(lit(1)))
  def hllZerosCol: Column = lit(HllM) - count(lit(1))

  // ---------------------------------------------------------------------
  // Log-linear (HDR-style) quantile histogram: pure-integer bucketing
  // with bounded relative width — floor(log₂) octave + `SubBucketBits`
  // linear sub-buckets per octave, the public HdrHistogram layout. A
  // bucket's half-width is ≤ 2^−(SubBucketBits+1) of its lower edge, so
  // any rank's bucket midpoint is a guaranteed-relative-error quantile
  // estimate — and every ingredient is integer arithmetic both engines
  // compute identically.
  // ---------------------------------------------------------------------

  /** Sub-bucket resolution: 2^5 = 32 sub-buckets per octave → bucket
    * coordinates of a positive integer v ≥ 2^SubBucketBits are
    * (oct = floor(log₂ v) via `length(bin(v)) − 1`,
    * idx = v >> (oct − SubBucketBits) ∈ [32, 64)); bucket bounds
    * [idx << shift, (idx+1) << shift) give relative half-width
    * 1/(2·idx+1) ≤ 1/65. */
  val SubBucketBits = 5
  val SubBuckets: Int = 1 << SubBucketBits

  // ---------------------------------------------------------------------
  // Typed aggregator form — the STREAMING-STATE shape of the same HLL:
  // one fixed m-byte register array per group in the state store
  // (mergeable across micro-batches), producing the IDENTICAL estimate
  // as the register-table formulation above (same hash, same exact
  // dyadic sum, same libm call) — proven by equality in
  // PlanPrimitivesPropertySpec.
  // ---------------------------------------------------------------------

  /** JVM mirror of [[hash31]] — kept in lockstep (integer ops only). */
  def hash31Jvm(k: Long): Long = {
    val h0 = ((k % P31) + P31) % P31
    val h1 = (A1 * h0 + C1) % M31
    val h1x = h1 ^ (h1 >> 15)
    val h2 = (A2 * h1x + C2) % M31
    h2 ^ (h2 >> 13)
  }

  /** Register-array estimate — the JVM mirror of [[hllEstimate]]: the
    * dyadic sum is exact in any order, α·m²/S is one IEEE multiply+divide,
    * Math.log ≡ the SQL `ln` on these inputs, and Math.round ≡ SQL
    * round-half-up for positives. */
  def estimateJvm(regs: Array[Byte]): Long = {
    var s = 0.0; var v = 0; var i = 0
    while (i < regs.length) {
      if (regs(i) == 0) { s += 1.0; v += 1 } else s += 1.0 / (1L << regs(i))
      i += 1
    }
    val raw = HllAlphaM2 / s
    if (raw <= HllLinearMax && v > 0) Math.round(HllM.toDouble * math.log(HllM.toDouble / v))
    else Math.round(raw)
  }

  private object HllAggregator
      extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Byte], Long] {
    def zero: Array[Byte] = new Array[Byte](HllM)
    def reduce(b: Array[Byte], k: Long): Array[Byte] = {
      val h = hash31Jvm(k)
      val bucket = (h >> HllSuffixBits).toInt
      val w = h % HllSuffixMod
      val rank =
        if (w == 0) HllRankCap
        else HllSuffixBits - (63 - java.lang.Long.numberOfLeadingZeros(w))
      if (rank > b(bucket)) b(bucket) = rank.toByte
      b
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }
    def finish(b: Array[Byte]): Long = estimateJvm(b)
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    def outputEncoder: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
  }

  /** `hllDistinct(keyCol)`: approximate COUNT(DISTINCT key) as a single
    * mergeable aggregate with m bytes of state per group — the form a
    * streaming window keeps in its state store. Identical estimates to
    * the register-table pipeline. */
  val hllDistinct: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(HllAggregator)
}
