package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Replica-based volume scaling for the empirical scale-trend bench.
  *
  * Produces an m× copy of the driver testdata whose WORKLOAD SHAPE is
  * invariant: each replica is a statistically identical, mutually disjoint
  * copy of the base corpus, so measured time growth isolates VOLUME (the
  * 100 TB question) from duplicate-structure artifacts. A naive `union` of
  * the same rows would instead multiply every duplicate group m× — LSH
  * buckets, fingerprint groups and cosine neighborhoods would grow
  * super-linearly BY CONSTRUCTION and the measurement would indict the data,
  * not the operator.
  *
  * Per-table replica transforms (replica 0 is the untouched base):
  *  - ids (`doc_id`, `vec_id`, `user_id`, `event_id`, `*_orderkey`,
  *    `o_custkey`/`c_custkey`) shift by `i * IdStride` — per-key history
  *    (sessions, baskets, order cadence) is preserved verbatim per replica
  *    while key cardinality scales ×m, exactly how production traffic grows;
  *  - `documents.text` salts every whitespace token with a replica suffix:
  *    token/shingle/fingerprint statistics WITHIN a replica are isomorphic to
  *    the base corpus, while shingle sets ACROSS replicas are disjoint — the
  *    duplicate rate stays constant as volume grows;
  *  - `embeddings.embedding` circularly rotates by i positions: norms and
  *    within-replica geometry are preserved exactly (rotation is an
  *    isometry), while cross-replica cosines decorrelate;
  *  - dimension tables (`region nation part supplier`) stay FIXED — fact
  *    volume outgrows dims at scale, which is precisely what keeps the
  *    broadcast joins broadcastable; facts keep referencing the shared dims.
  *
  * Timestamps are left untouched: m× users over the same wall-clock range is
  * densification, the real shape of traffic growth (windows get heavier,
  * the range does not stretch).
  */
object ScaleUp {

  /** Above any base key; replica i's ids live in [i·2⁴⁰, (i+1)·2⁴⁰). */
  val IdStride: Long = 1L << 40

  private def shift(c: String, i: Int) =
    col(c) + lit(i.toLong * IdStride)

  /** Fixed-width replica salt ("_a".."_z"): every replica's tokens grow by
    * the SAME two characters, so per-row string hash/compare cost is
    * identical across multipliers (a variable-width "_15"-style suffix made
    * high-multiplier corpora ~40% more expensive PER ROW — measured — and
    * the growth curve indicted the scaler, not the operator). */
  private def saltOf(i: Int): String = "_" + ('a' + i).toChar

  /** Replica transform for one table; identity at i = 0 unless `saltAll`
    * (the bench materializes EVERY scale point salted — including 1× —
    * so all points share the token-length and writer-encoding regime). */
  private def replica(name: String, df: DataFrame, i: Int,
                      saltAll: Boolean = false): DataFrame =
    if (i == 0 && !saltAll) df
    else if (i == 0) name match {
      case "documents" =>
        df.withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1" + saltOf(0)))
          .withColumn("n_chars", length(col("text")))
      case _ => df
    }
    else name match {
      case "customer" => df.withColumn("c_custkey", shift("c_custkey", i))
      case "orders" => df.withColumn("o_orderkey", shift("o_orderkey", i))
        .withColumn("o_custkey", shift("o_custkey", i))
      case "lineitem" => df.withColumn("l_orderkey", shift("l_orderkey", i))
      case "events" => df.withColumn("event_id", shift("event_id", i))
        .withColumn("user_id", shift("user_id", i))
      case "documents" => df.withColumn("doc_id", shift("doc_id", i))
        // Salt every token: replica-internal token statistics mirror the
        // base, cross-replica shingle overlap is zero. "$1" is a group-1
        // backreference; the fixed-width suffix keeps per-token cost flat.
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1" + saltOf(i)))
        .withColumn("n_chars", length(col("text")))
      case "embeddings" => df.withColumn("vec_id", shift("vec_id", i))
        // Circular rotation by i (an isometry — see scaladoc).
        .withColumn("embedding",
          concat(slice(col("embedding"), lit(i + 1),
                   size(col("embedding")) - lit(i)),
                 slice(col("embedding"), 1, i)))
      case _ => df // fixed dimension tables
    }

  private val scaledTables = Set("customer", "orders", "lineitem",
    "events", "documents", "embeddings")

  /** Write an m× scaled copy of `tables` from `baseDir` into `outDir`
    * (same `<name>.parquet` layout [[Tables.load]] reads). `saltAll` salts
    * replica 0 too (see [[saltOf]]) — the bench's comparable-points mode. */
  def materialize(spark: SparkSession, baseDir: String, outDir: String, mult: Int,
                  tables: Seq[String] = Tables.all, saltAll: Boolean = false): Unit =
    tables.foreach { name =>
      val base = Tables.load(spark, baseDir, name)
      // Dimension tables (part/supplier/nation/region) are NEVER replicated:
      // they are key dictionaries, and m verbatim copies would duplicate
      // every key so any fact⋈dim join multiplies its input m× — the scaled
      // corpus would then measure the SCALER's m² artifact, not the plan
      // (q55_market_basket measured cpu exponent 1.83 from exactly this
      // before the guard; 1.0 after). Fact growth keeps dictionaries fixed.
      val out =
        if (!scaledTables(name)) base
        else if (mult <= 1 && !saltAll) base
        else (0 until mult).map(replica(name, base, _, saltAll)).reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    }
}
