package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family over `documents` (SURVEY.md §2.3).
  *
  * Scale design: nothing here ever forms an unbounded cross join. Exact dedup
  * is a hash groupBy on a content signature; Jaccard uses an inverted-index
  * (shingle) join so only docs sharing a shingle pair up; MinHash/LSH buckets
  * candidates by band signature (the standard sub-quadratic near-dup path at
  * 100 TB); embedding near-dup bounds pairs the same way brute-force KNN
  * does (and would switch to `Ann.lshTopK` buckets beyond toy corpus sizes —
  * documents/embeddings are fixed 500-row sides here).
  *
  * Determinism contract (SURVEY.md §3/§5): token ids are dense ranks over the
  * sorted vocabulary and hash permutations are explicit LCGs `(a·id+b) mod p`
  * — the DuckDB oracles rebuild identical integers; float dot products use
  * sequential array folds on both engines for bit-identical sums.
  */
object Dedup {

  private def toks = split(trim(col("text")), "\\s+")

  /** Exact dedup on the sorted-distinct-token signature (keep lowest id). */
  def exact(documents: DataFrame): DataFrame = {
    val sig = documents.withColumn("sig", array_join(array_sort(array_distinct(toks)), " "))
    val w = Window.partitionBy(col("sig"))
    sig
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("keep", col("doc_id") === min(col("doc_id")).over(w))
      .select(col("doc_id"), col("group_size"), col("keep"))
      .orderBy("doc_id")
  }

  /** Token-trigram shingles, distinct per doc. */
  private def shingles(documents: DataFrame): DataFrame =
    documents
      .withColumn("t", toks)
      .select(col("doc_id"), explode(expr(
        "filter(transform(t, (x, i) -> CASE WHEN i + 2 < size(t) THEN concat(x, ' ', t[i+1], ' ', t[i+2]) END), y -> y IS NOT NULL)"))
        .as("sh"))
      .distinct()

  /** Near-dup pairs by n-gram Jaccard via inverted-index join (no cross join:
    * only docs sharing at least one shingle are compared). */
  def ngramJaccardPairs(documents: DataFrame, threshold: Double = 0.5): DataFrame = {
    val sh = shingles(documents)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("doc_id").as("doc_a"), col("sh"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh"))
    a.join(b, Seq("sh")).filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("common"))
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_a", "n_sh" -> "na")), Seq("doc_a"))
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_b", "n_sh" -> "nb")), Seq("doc_b"))
      .withColumn("jaccard", round(col("common") * 1.0 / (col("na") + col("nb") - col("common")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("common"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  val MinhashK = 16
  val MinhashP = 10007L
  /** a/b coefficients of the k-th LCG permutation (shared with the oracle).
    * Multipliers must wrap the modulus many times over the vocab-id range or
    * every "permutation" is order-preserving and the signature degenerates to
    * min(tid) — hence the large mixing constant reduced mod P. */
  def hashA(k: Int): Long = ((k + 1).toLong * 2654435761L) % MinhashP
  def hashB(k: Int): Long = (k.toLong * 40503L + 7919L) % MinhashP

  /** Per-doc MinHash signature columns m0..m15 over vocab token ids. */
  private def signatures(documents: DataFrame): DataFrame = {
    val tok = documents.select(col("doc_id"), explode(toks).as("token")).distinct()
    val vocab = tok.select(col("token")).distinct()
      .withColumn("tid", row_number().over(Window.orderBy(col("token"))).cast("long"))
    val tt = tok.join(broadcast(vocab), Seq("token"))
    val mins = (0 until MinhashK).map(k =>
      min((col("tid") * hashA(k) + hashB(k)) % MinhashP).as(s"m$k"))
    tt.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH banding: candidate pairs share a band bucket; estimated
    * similarity = fraction of agreeing minhashes.
    *
    * Shape matters for codegen: candidates travel as bare (doc_a, doc_b) ids
    * through the band self-join and dedup, then the two signatures join back
    * (broadcast) and the agreement count is a flat 16-way integer comparison
    * — no array columns, no interpreted lambdas in the hot path. */
  def minhashLsh(documents: DataFrame, bandRows: Int = 4, threshold: Double = 0.9): DataFrame = {
    val nBands = MinhashK / bandRows
    val sig = signatures(documents)
    val bandStructs = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until bandRows).map(r => col(s"m${b * bandRows + r}")): _*).as("bkey"))
    }
    // Signatures ride the band join as flat long columns: one pass, one
    // (doc_a, doc_b) dedup shuffle, no signature-table re-joins (which would
    // recompute the signature subtree per join) and no interpreted array ops.
    def sideCols(prefix: String) =
      col("doc_id").as(s"doc_$prefix") +: (0 until MinhashK).map(k => col(s"m$k").as(s"${prefix}_m$k"))
    val bands = sig.select((col("doc_id") +: explode(array(bandStructs: _*)).as("bk") +:
      (0 until MinhashK).map(k => col(s"m$k"))): _*)
    val x = bands.select((col("bk.band").as("band") +: col("bk.bkey").as("bkey") +: sideCols("a")): _*)
    val y = bands.select((col("bk.band").as("band") +: col("bk.bkey").as("bkey") +: sideCols("b")): _*)
    val agree = (0 until MinhashK)
      .map(k => when(col(s"a_m$k") === col(s"b_m$k"), 1).otherwise(0))
      .reduce(_ + _)
    x.join(y, Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("est_sim", agree / lit(MinhashK.toDouble))
      .filter(col("est_sim") >= threshold)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(round(max(col("est_sim")), 6).as("est_sim"))
      .orderBy("doc_a", "doc_b")
  }

  /** 32-bit SimHash fingerprint over distinct vocab token ids (deterministic
    * integer bit mix, identical in the oracle).
    *
    * One groupBy with 32 conditional-sum columns (fully codegen'd) instead
    * of exploding a 32× row blowup through two aggregations. */
  def simhash(documents: DataFrame): DataFrame = {
    val tok = documents.select(col("doc_id"), explode(toks).as("token")).distinct()
    val vocab = tok.select(col("token")).distinct()
      .withColumn("tid", row_number().over(Window.orderBy(col("token"))).cast("long"))
    val bitSums = (0 until 32).map { j =>
      sum(when((col("tid") * 2654435761L + j * 40503L) % 65536L > 32767L, 1L).otherwise(-1L)).as(s"bit$j")
    }
    val hash = (0 until 32)
      .map(j => when(col(s"bit$j") > 0, 1L << j).otherwise(0L))
      .reduce(_ + _)
    tok.join(broadcast(vocab), Seq("token"))
      .groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), hash.as("simhash"))
      .orderBy("doc_id")
  }

  /** Embedding-cosine near-dup pairs. Dot products use the codegen'd
    * graft_dot expression (same left-to-right summation as the oracle's
    * sequential fold — see graft.functions.DotProduct). */
  def embeddingNearDup(embeddings: DataFrame, threshold: Double = 0.45): DataFrame = {
    val v = embeddings.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
    val a = v.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = v.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", round(expr("graft_dot(va, vb)") / (col("na") * col("nb")), 6))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
      .orderBy("vec_a", "vec_b")
  }
}
