package graft.dedup

import graft.plans.Checkpoints._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family over `documents` (SURVEY.md §2.3).
  *
  * Scale design: nothing here ever forms an unbounded cross join. Exact dedup
  * is a hash groupBy on a content signature; Jaccard uses an inverted-index
  * (shingle) join so only docs sharing a shingle pair up; MinHash/LSH buckets
  * candidates by band signature (the standard sub-quadratic near-dup path at
  * 100 TB); embedding near-dup buckets candidates the same way, with banded
  * hyperplane-LSH keys in cosine space — no operator in this family ever
  * joins the corpus against itself without an equi-key.
  *
  * Determinism contract (SURVEY.md §3/§5): token ids are dense ranks over the
  * sorted vocabulary and hash permutations are explicit LCGs `(a·id+b) mod p`
  * — the DuckDB oracles rebuild identical integers; float dot products use
  * sequential array folds on both engines for bit-identical sums.
  */
object Dedup {

  /** [[bloomScreen]] sizing, shared with the `dedup_bloom` oracle SQL in
    * [[graft.SparkEntry]] (spliced there, so changing a default here cannot
    * silently diverge the oracle). */
  val BloomBatchMod = 5L
  val BloomMBits: Long = 1L << 11
  val BloomK = 4

  private def toks = split(trim(col("text")), "\\s+")

  /** Whitespace token count per doc — THE shared token-count definition
    * (mirror of the oracle's `len($tokSql)`). Consumers outside this file
    * (e.g. `Components.softDedupWeights`) must use this rather than
    * re-inlining the split, so a tokenizer change can never silently
    * diverge one operator from its oracle's splice. */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), size(toks).cast("long").as("n_tokens"))

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

  /** Prefix-duplicate detection: documents sharing the identical first
    * `prefixTokens` tokens (truncation/expansion duplicates that full-text
    * hashing misses). Same group-window shape as `exact`, keyed on the
    * prefix signature; only docs long enough to have a full prefix play. */
  def prefixDup(documents: DataFrame, prefixTokens: Int = 8): DataFrame = {
    val sig = documents
      .withColumn("t", toks)
      .filter(size(col("t")) >= prefixTokens)
      .withColumn("psig", array_join(slice(col("t"), 1, prefixTokens), " "))
    val w = Window.partitionBy(col("psig"))
    sig
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("keep", col("doc_id") === min(col("doc_id")).over(w))
      .filter(col("group_size") > 1)
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

  /** Document-frequency cap for the shingle inverted index. A shingle in
    * df documents contributes ~df²/2 candidate pairs to the self-join, so
    * ONE boilerplate trigram ("all rights reserved") shared by 10⁶ docs is
    * a 10¹²-pair bomb at 100 TB — the quadratic failure mode the substring
    * family already caps via [[SubstrMaxAnchorOcc]]. Shingles with
    * df > cap are stop-shingles: they carry no near-dup evidence (sharing
    * boilerplate is not similarity) and are removed from the WHOLE
    * similarity universe — pair evidence AND per-doc set sizes — so
    * Jaccard/containment are computed consistently over the df-filtered
    * shingle space. Spliced into the jaccard/containment/sweep oracles;
    * sized far above any real df in the test corpora (max measured df is
    * 25 at sf0.1) so the cap is protection, not a result change — the
    * planted-boilerplate spec proves it fires. */
  val ShingleMaxDf = 128

  /** Cap observability: total distinct shingles, how many the df cap
    * removed, and how many documents contained at least one removed
    * shingle — the removal accounting that makes a silent candidate cap
    * auditable (the SubstrMaxAnchorOcc convention). */
  def shingleDfCapStats(documents: DataFrame): DataFrame = {
    val sh = shingles(documents)
    val df = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val dropped = df.filter(col("df") > ShingleMaxDf)
    val affected = sh.join(dropped.select(col("sh")), Seq("sh"))
      .select(countDistinct(col("doc_id")).as("docs_affected"))
    df.agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") > ShingleMaxDf, 1L).otherwise(0L)).as("n_capped"),
        max(col("df")).as("max_df"))
      .crossJoin(affected)
  }

  /** Shared candidate-pair table behind the Jaccard and containment screens:
    * the inverted-index self-join (only docs sharing ≥1 shingle pair up)
    * with common-shingle counts and both set sizes — the expensive stage of
    * either query, identical for both, so it is memoized per corpus per JVM
    * (`plans.Memo`; the shingle table itself feeds three plan branches and
    * is checkpointed inside the build). Each consumer applies only its own
    * ratio arithmetic + threshold on top. The [[ShingleMaxDf]] stop-shingle
    * cap bounds every posting list BEFORE the self-join, which is what
    * keeps the candidate volume linear in corpus size. */
  private def shinglePairCommon(documents: DataFrame): DataFrame =
    graft.plans.Memo.memoize(documents, "dedup.shinglePairs") {
      val sh0 = shingles(documents).stableCheckpoint()
      val keep = sh0.groupBy(col("sh")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= ShingleMaxDf).select(col("sh"))
      val sh = sh0.join(keep, Seq("sh"))
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      val a = sh.select(col("doc_id").as("doc_a"), col("sh"))
      val b = sh.select(col("doc_id").as("doc_b"), col("sh"))
      a.join(b, Seq("sh")).filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("common"))
        .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_a", "n_sh" -> "na")), Seq("doc_a"))
        .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_b", "n_sh" -> "nb")), Seq("doc_b"))
        .stableCheckpoint()
    }

  /** Jaccard-threshold shrink curve: for each cutoff, the qualifying shingle
    * pairs, distinct docs linked, and the corpus fraction they cover — the
    * "which threshold do we dedup at" policy table (the lexical twin of the
    * cosine `knn_threshold_sweep`). All cutoffs read the one memoized
    * candidate-pair table; the spine join is a broadcast of the threshold
    * list, and thresholds appear via LEFT JOIN so an empty cutoff still
    * reports a zero row at any SF. */
  def jaccardSweep(documents: DataFrame,
                   thresholds: Seq[Double] = Seq(0.3, 0.5, 0.7, 0.9)): DataFrame = {
    val session = documents.sparkSession
    val pairs = shinglePairCommon(documents)
      .withColumn("jaccard", round(col("common") * 1.0 / (col("na") + col("nb") - col("common")), 6))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val th = session.createDataFrame(thresholds.map(Tuple1(_))).toDF("threshold")
    val f = pairs.join(broadcast(th), col("jaccard") >= col("threshold"))
    val np = f.groupBy(col("threshold")).agg(count(lit(1)).as("n_pairs"))
    val nd = f.select(col("threshold"), explode(array(col("doc_a"), col("doc_b"))).as("vid"))
      .groupBy(col("threshold")).agg(countDistinct(col("vid")).as("n_docs_linked"))
    val tot = documents.agg(count(lit(1)).as("n_docs"))
    th.join(np, Seq("threshold"), "left").join(nd, Seq("threshold"), "left")
      .crossJoin(broadcast(tot))
      .select(col("threshold"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs_linked"), lit(0L)).as("n_docs_linked"),
        round(coalesce(col("n_docs_linked"), lit(0L)) * 100.0 / col("n_docs"), 4).as("pct_linked"))
      .orderBy("threshold")
  }

  /** Near-dup pairs by n-gram Jaccard via inverted-index join (no cross join:
    * only docs sharing at least one shingle are compared). */
  def ngramJaccardPairs(documents: DataFrame, threshold: Double = 0.5): DataFrame = {
    shinglePairCommon(documents)
      .withColumn("jaccard", round(col("common") * 1.0 / (col("na") + col("nb") - col("common")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("common"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Shingle-containment near-dup pairs: C(A,B) = |A∩B| / |A|. Containment
    * catches subset duplicates (a doc embedded inside a longer one) that
    * symmetric Jaccard under-scores — the standard complement to Jaccard in
    * LLM-corpus dedup. Same inverted-index join as `ngramJaccardPairs`
    * (only docs sharing a shingle pair up), thresholded on the larger of
    * the two directional containments. */
  def containmentPairs(documents: DataFrame, threshold: Double = 0.8): DataFrame = {
    shinglePairCommon(documents)
      .withColumn("cont_a", round(col("common") * 1.0 / col("na"), 6))
      .withColumn("cont_b", round(col("common") * 1.0 / col("nb"), 6))
      .filter(greatest(col("cont_a"), col("cont_b")) >= threshold)
      .select(col("doc_a"), col("doc_b"), col("common"), col("cont_a"), col("cont_b"))
      .orderBy("doc_a", "doc_b")
  }

  val MinhashK = 16
  /** Hash modulus for the MinHash permutation family (spliced into the
    * DuckDB oracle, so both engines move together). Sized ≫ per-doc token
    * counts: a doc's minhash is the MIN of ~n_tokens draws over [0, P), so
    * values concentrate in [0, P/n] — with the original P = 10007 and
    * hundred-token docs, band keys collapsed into a tiny effective space and
    * the group-level band self-join grew QUADRATICALLY with corpus size
    * (caught by the r9 scale-trend harness: task-time exponent 1.47 at
    * 16× volume, candidate counts linear). 2²⁰-3 keeps the estimator's
    * tie-inflation negligible at any realistic doc length while tid·a stays
    * far from int64 overflow in both engines. */
  val MinhashP = 1048573L
  /** a/b coefficients of the k-th LCG permutation (shared with the oracle).
    * Multipliers must wrap the modulus many times over the vocab-id range or
    * every "permutation" is order-preserving and the signature degenerates to
    * min(tid) — hence the large mixing constant reduced mod P. */
  def hashA(k: Int): Long = ((k + 1).toLong * 2654435761L) % MinhashP
  def hashB(k: Int): Long = (k.toLong * 40503L + 7919L) % MinhashP

  /** Distinct (doc_id, tid) token-id pairs — the tokenize→vocab pipeline
    * every signature-family operator starts from, computed ONCE per corpus
    * per JVM (`plans.Memo`, checkpointed) and shared by minhash, simhash and
    * the LSH tuner: the tokenize+explode+distinct over the corpus is the
    * dominant cost of all three and is bit-identical across them.
    *
    * Two tid modes:
    *  - rank (default): dense ranks over the sorted vocabulary. The rank is
    *    an unpartitioned window, but it runs over the *distinct token
    *    vocabulary* — bounded by language, not data volume (≤ a few million
    *    rows at any corpus size) — and it keeps the DuckDB oracle bit-exact
    *    (SURVEY.md §4).
    *  - hashTid=true: dictionary hash (xxhash64 mod P) — zero windows, zero
    *    vocab table, the setting for a 100 TB run where even the vocab rank
    *    is unwanted coordination. Same signature algebra; identical-token
    *    docs still collapse to identical signatures. Not oracle-matched
    *    (DuckDB has no xxhash64), hence the flag. */
  private[dedup] def docTokenIds(documents: DataFrame, hashTid: Boolean = false): DataFrame =
    graft.plans.Memo.memoize(documents, s"dedup.tokids:$hashTid") {
      val tok = documents.select(col("doc_id"), explode(toks).as("token")).distinct()
      val tt =
        if (hashTid) tok.withColumn("tid", pmod(xxhash64(col("token")), lit(MinhashP)))
        else {
          val vocab = tok.select(col("token")).distinct()
            .withColumn("tid", row_number().over(Window.orderBy(col("token"))).cast("long"))
          tok.join(broadcast(vocab), Seq("token"))
        }
      tt.select(col("doc_id"), col("tid")).stableCheckpoint()
    }

  /** Per-doc MinHash signature columns m0..m15 over vocab token ids (see
    * `docTokenIds` for the tid modes and the per-corpus memo). */
  private def signatures(documents: DataFrame, hashTid: Boolean = false): DataFrame = {
    val mins = (0 until MinhashK).map(k =>
      min((col("tid") * hashA(k) + hashB(k)) % MinhashP).as(s"m$k"))
    docTokenIds(documents, hashTid).groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** Internal decomposition of the MinHash/LSH pair graph, factored through
    * *signature groups* (docs with identical 16-hash signatures collapse to
    * one node). Near-dup-saturated corpora have far fewer distinct signatures
    * than docs (2256 vs 5000 at sf0.1), so banding/matching at group level
    * shrinks the candidate self-join quadratically (677k group candidates vs
    * 7.5M doc candidates) and the O(n·m) member expansion happens only for
    * the pairs that already passed the similarity threshold.
    *
    * @param members   (doc_id, gid) — gid is the group's min doc_id
    * @param groups    (gid, gn) — group size
    * @param crossQual (ga, gb, est_sim) qualifying pairs of *different* groups
    * @param selfQual  (gid) groups of ≥2 members (intra-group est_sim = 1.0)
    */
  private[dedup] case class SigGroups(members: DataFrame, groups: DataFrame,
                                      crossQual: DataFrame, selfQual: DataFrame)

  private[dedup] def minhashGroups(documents: DataFrame, bandRows: Int = 4,
                                   threshold: Double = 0.9,
                                   hashTid: Boolean = false): SigGroups =
    graft.plans.Memo.memoize(documents,
      s"dedup.groups:$bandRows:$threshold:$hashTid") {
      minhashGroupsBuild(documents, bandRows, threshold, hashTid)
    }

  private def minhashGroupsBuild(documents: DataFrame, bandRows: Int,
                                 threshold: Double, hashTid: Boolean): SigGroups = {
    val nBands = MinhashK / bandRows
    val mcols = (0 until MinhashK).map(k => col(s"m$k"))
    // Signature table feeds both the grouping and the member mapping —
    // checkpoint so the vocab-id groupBy subtree runs once.
    val sig = signatures(documents, hashTid).stableCheckpoint()
    val groups = sig.groupBy(mcols: _*)
      .agg(min(col("doc_id")).as("gid"), count(lit(1)).as("gn"))
      .stableCheckpoint()
    val members = sig
      .join(broadcast(groups), (0 until MinhashK).map(k => s"m$k"))
      .select(col("doc_id"), col("gid"))
    val bandStructs = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until bandRows).map(r => col(s"m${b * bandRows + r}")): _*).as("bkey"))
    }
    // Narrow band self-join on bare group ids, dedup, then broadcast the tiny
    // group table back for the flat 16-way agreement comparison.
    val bands = groups.select(col("gid"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bkey").as("bkey"), col("gid"))
    val cand = bands.select(col("band"), col("bkey"), col("gid").as("ga"))
      .join(bands.select(col("band"), col("bkey"), col("gid").as("gb")), Seq("band", "bkey"))
      .filter(col("ga") < col("gb"))
      .select(col("ga"), col("gb")).distinct()
    def side(prefix: String) =
      broadcast(groups.select(col("gid").as(s"g$prefix") +:
        (0 until MinhashK).map(k => col(s"m$k").as(s"${prefix}_m$k")): _*))
    val agree = (0 until MinhashK)
      .map(k => when(col(s"a_m$k") === col(s"b_m$k"), 1).otherwise(0))
      .reduce(_ + _)
    // The qualifying cross-group pair set is consumed by four queries
    // (minhash pairs, incremental screen, components, keep-best) — small
    // after the threshold filter, so checkpoint it and let the memo share
    // the materialised band join.
    val crossQual = cand.join(side("a"), Seq("ga")).join(side("b"), Seq("gb"))
      .withColumn("est_sim", round(agree / lit(MinhashK.toDouble), 6))
      .filter(col("est_sim") >= threshold)
      .select(col("ga"), col("gb"), col("est_sim"))
      .stableCheckpoint()
    val selfQual = groups.filter(col("gn") >= 2).select(col("gid"))
    SigGroups(members, groups, crossQual, selfQual)
  }

  /** MinHash + LSH banding: candidate pairs share a band bucket; estimated
    * similarity = fraction of agreeing minhashes. Computed via signature
    * groups (see minhashGroups) — identical output to the direct doc-level
    * band join: same-group doc pairs always share every band (est 1.0), and
    * a cross-group doc pair is a candidate iff its signatures share a band
    * bucket, which depends only on the signatures. */
  def minhashLsh(documents: DataFrame, bandRows: Int = 4, threshold: Double = 0.9,
                 hashTid: Boolean = false): DataFrame =
    minhashPairs(documents, bandRows, threshold, hashTid).orderBy("doc_a", "doc_b")

  /** [[minhashLsh]] without the presentation sort — for consumers that
    * filter/re-aggregate the pair table (a global sort of a multi-million-row
    * candidate set is pure waste ahead of another shuffle). */
  private[dedup] def minhashPairs(documents: DataFrame, bandRows: Int = 4,
                                  threshold: Double = 0.9,
                                  hashTid: Boolean = false): DataFrame = {
    val g = minhashGroups(documents, bandRows, threshold, hashTid)
    val ma = g.members.select(col("gid").as("ga"), col("doc_id").as("da"))
    val mb = g.members.select(col("gid").as("gb"), col("doc_id").as("db"))
    // Cross-group: every (a ∈ A, b ∈ B) qualifies; orient by id afterwards.
    val cross = g.crossQual
      .join(ma, Seq("ga")).join(mb, Seq("gb"))
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"), col("est_sim"))
    // Intra-group: all member pairs, est_sim exactly 1.0.
    val self = g.selfQual
      .join(ma, col("gid") === col("ga")).join(mb, col("gid") === col("gb"))
      .filter(col("da") < col("db"))
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        round(lit(1.0), 6).as("est_sim"))
    cross.unionAll(self)
  }

  /** 32-bit SimHash fingerprint over distinct vocab token ids (deterministic
    * integer bit mix, identical in the oracle).
    *
    * One groupBy with 32 conditional-sum columns (fully codegen'd) instead
    * of exploding a 32× row blowup through two aggregations. `hashTid=true`
    * swaps the rank-mode vocab ids for the window-free xxhash64 dictionary
    * hash (see `docTokenIds`) — the 100 TB setting, not oracle-matched. */
  def simhash(documents: DataFrame, hashTid: Boolean = false): DataFrame = {
    val bitSums = (0 until 32).map { j =>
      sum(when((col("tid") * 2654435761L + j * 40503L) % 65536L > 32767L, 1L).otherwise(-1L)).as(s"bit$j")
    }
    val hash = (0 until 32)
      .map(j => when(col(s"bit$j") > 0, 1L << j).otherwise(0L))
      .reduce(_ + _)
    docTokenIds(documents, hashTid)
      .groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), hash.as("simhash"))
      .orderBy("doc_id")
  }

  /** MINIMUM hyperplane-LSH bands / sign bits per band for embedding
    * near-dup candidate generation; the effective values ADAPT to corpus
    * size via [[embBandParams]] (shared with the oracle). */
  val EmbBands = 12
  val EmbBandRows = 3

  /** Corpus-adaptive banding — the fix for the defect the r9 scale-trend
    * harness caught: with FIXED rows-per-band r, a band has only 2^r
    * buckets, so bucket occupancy (and the band self-join) grows
    * QUADRATICALLY with corpus size (measured: cpu exponent 2.1 at 16×
    * volume, the one flagged query). The LSH scaling law instead holds
    * occupancy constant by growing r with log(n) and recovers recall by
    * growing the band count geometrically in r:
    *  - r(n) = max(3, ceil(log2(ceil(n/64)))) — ~64 vectors per bucket at
    *    any corpus size (integer-exact ladder, no float log, so the SQL
    *    oracle reproduces it bit-for-bit);
    *  - B(r) = max(12, ceil(3 / 0.795^r)) — ≥95% candidate recall at
    *    cos ≥ 0.8 (sign-agreement prob s = 1 − θ/π = 0.795), the regime
    *    near-dup semantics live in; below that recall degrades gracefully,
    *    exactly the ANN trade `knn_recall`/`knn_threshold_sweep` measure.
    *    B is precomputed per r as an integer table (inlined into the SQL
    *    oracle) so no runtime float pow can diverge between engines.
    * Work scales as n·B·r ≈ n^1.33·log n projections with LINEAR candidate
    * volume — sub-quadratic end to end. */
  def embBandParams(nVectors: Long): (Int, Int) = {
    val m = math.max(1L, (nVectors + 63L) / 64L)
    var r = 0
    while ((1L << r) < m) r += 1
    val rr = math.max(EmbBandRows, r)
    (embBandsFor(rr), rr)
  }

  /** B(r) table, r ∈ [0, 40] (integer-exact in both engines via literal
    * inlining; 0.795 = sign-agreement probability at cos 0.8). */
  val embBandsForTable: IndexedSeq[Int] =
    (0 to 40).map(r => math.max(EmbBands, math.ceil(3.0 / math.pow(0.795, r)).toInt))
  private def embBandsFor(r: Int): Int = embBandsForTable(math.min(r, 40))

  /** Deterministic integer weight in [-10, 10] for plane j, 1-based dim p1.
    * The large-prime double-mod decorrelates planes — a small modulus makes
    * every plane a shift of the same periodic weight sequence (measured:
    * recall stuck at 10/14 no matter how many bands were added). Shared with
    * the oracle, which inlines the same literals. */
  def embPlaneWeight(j: Int, p1: Int): Double =
    (((j * 73856093L + p1 * 19349663L) % 1000003L) % 21L - 10L).toDouble

  /** All 36 hyperplanes as ONE array<array<double>> literal. A per-plane
    * `array(lit, lit, …)` expression rebuilds a 64-element array per row per
    * plane (36 × 64 literal nodes — a codegen tree big enough that Janino
    * compile time dominates the whole query); a single Literal costs nothing
    * per row and the 36 projections come from one `transform` over it. */
  private def embPlanesLit(dim: Int, nPlanes: Int) = typedlit(
    Seq.tabulate(nPlanes)(j => Seq.tabulate(dim)(p0 => embPlaneWeight(j, p0 + 1))))

  /** Embedding-cosine near-dup pairs via banded hyperplane LSH — the
    * sub-quadratic candidate path (same banding idea as `minhashLsh`, in
    * cosine space): every vector gets `EmbBands` band keys, each the sign
    * bits of `EmbBandRows` deterministic hyperplane projections; a pair is a
    * candidate iff it collides in at least one band, and only candidates get
    * the exact codegen'd `graft_dot` cosine check. Nothing here is O(n²):
    * the band self-join is an equi-join on (band, key) whose bucket sizes
    * shrink as planes are added, so the plan survives a corpus 1000× this
    * size (add bands to recover recall, add rows-per-band to cut candidate
    * volume — the `dedup_lsh_tuning` trade in cosine space). Dot products
    * keep the sequential-fold determinism contract with the oracle, which
    * mirrors the banding bit-for-bit. */
  /** Floor below every threshold the embedding-dedup family queries with —
    * the banded cosine-pair set is computed once at this floor per corpus
    * per JVM (`plans.Memo`) and each consumer re-filters to its own cutoff
    * (filter-of-a-superset ≡ direct computation, pair for pair). */
  val EmbPairFloor = 0.40

  def embeddingNearDup(embeddings: DataFrame, threshold: Double = 0.45): DataFrame = {
    val pairs =
      if (threshold >= EmbPairFloor)
        embeddingCosPairs(embeddings, EmbPairFloor).filter(col("cos") >= threshold)
      else embeddingCosPairs(embeddings, threshold)
    pairs
      .select(col("vec_a"), col("vec_b"), col("cos"))
      .distinct()
      .orderBy("vec_a", "vec_b")
  }

  /** Banded hyperplane-LSH candidate pairs with exact cosine ≥ `floor`,
    * pre-distinct (a pair may collide in several bands) — the shared stage
    * behind dedup_embedding / dedup_semantic / knn_threshold_sweep. */
  private def embeddingCosPairs(embeddings: DataFrame, floor: Double): DataFrame =
    graft.plans.Memo.memoize(embeddings, s"dedup.embpairs:$floor") {
      embeddingCosPairsBuild(embeddings, floor).stableCheckpoint()
    }

  private def embeddingCosPairsBuild(embeddings: DataFrame, floor: Double): DataFrame = {
    val dim = embeddings.select(size(col("embedding"))).head().getInt(0)
    val (nBands, bandRows) = embBandParams(embeddings.count())
    val v = embeddings.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
      // One pass computes every plane projection; band keys then read the
      // precomputed array instead of re-dotting per band.
      .withColumn("proj", transform(embPlanesLit(dim, nBands * bandRows),
        p => call_function("graft_dot", col("v"), p)))
    val bandStructs = (0 until nBands).map { b =>
      val key = (0 until bandRows)
        .map(r => when(element_at(col("proj"), b * bandRows + r + 1) > 0, lit(1L << r)).otherwise(lit(0L)))
        .reduce(_ + _)
      struct(lit(b).as("band"), key.as("bkey"))
    }
    // Vectors ride through the band join, the exact cosine check runs inside
    // the join's codegen stage, and the pair-dedup (a pair can collide in
    // several bands) happens AFTER the threshold filter — a distinct over
    // the few qualifying pairs, not the full candidate volume. At cluster
    // scale the broadcast becomes a shuffle equi-join on (band, bkey) and
    // payloads would be stripped to ids before a post-distinct re-fetch; the
    // shape (equi-key candidates, never O(n²)) is the same.
    val bands = v.select(col("vec_id"), col("v"), col("nrm"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bkey").as("bkey"),
        col("vec_id"), col("v"), col("nrm"))
    val a = bands.select(col("band"), col("bkey"),
      col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = bands.select(col("band"), col("bkey"),
      col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(broadcast(b), Seq("band", "bkey"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", round(expr("graft_dot(va, vb)") / (col("na") * col("nb")), 6))
      .filter(col("cos") >= floor)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }

  /** LSH banding-parameter sweep: for each (bands b × rows r) split of the
    * 16-hash signature, the s-curve threshold (1/b)^(1/r) and the candidate
    * volume it would generate — the tuning table you consult before running
    * dedup at 100 TB. Candidate pairs are *counted* at signature-group
    * level (cross-group Σ gn_a·gn_b + intra-group Σ gn·(gn−1)/2), never
    * materialised per doc; the group table is checkpointed once and each
    * config's band join runs over it. */
  def lshTuning(documents: DataFrame, bandRowsConfigs: Seq[Int] = Seq(2, 4, 8)): DataFrame = {
    // Signature groups are banding-invariant (they depend only on the 16
    // minhashes), so the tuner reads the same memoized group table the
    // minhash/components queries share instead of rebuilding signatures.
    // Pairs are identified by gid (the group's min doc_id — unique per
    // group, 8 bytes) rather than the 16-minhash sigkey string (~100
    // bytes): the candidate distinct is the query's one data-grain
    // shuffle, and a pair row of 4 longs shuffles ~7× fewer bytes than
    // two sigkey strings for the identical pair set (any unique key under
    // `<` dedups unordered pairs the same way). Before this change the
    // r=2 config's distinct spilled 322 MB at sf0.1; after, zero spill.
    val g = minhashGroups(documents).groups
    val intra = g.agg((sum(col("gn") * (col("gn") - 1)) / 2).cast("long").as("intra_docs"))
    // Per-config band joins (NOT one fused join keyed by band_rows): each
    // config's self-join is tiny after the signature-group collapse, and
    // fusing them was measured 1.7× slower at sf0.1 — the combined explode
    // feeds every config's rows through one join and a wider distinct,
    // destroying the per-config AQE sizing without saving meaningful work.
    val perConfig = bandRowsConfigs.map { r =>
      val b = MinhashK / r
      val bands = (0 until b).map { bi =>
        g.select(col("gid"), col("gn"), lit(bi).as("band"),
          concat_ws(",", (bi * r until (bi + 1) * r).map(k => col(s"m$k")): _*).as("bkey"))
      }.reduce(_ unionAll _)
      val cand = bands.alias("x")
        .join(bands.alias("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.gid") < col("y.gid"))
        .select(col("x.gid").as("sa"), col("y.gid").as("sb"),
          col("x.gn").as("ga"), col("y.gn").as("gb"))
        .distinct()
      cand.agg(count(lit(1)).as("cross_groups"),
          coalesce(sum(col("ga") * col("gb")), lit(0L)).as("cross_docs"))
        .crossJoin(broadcast(intra))
        .select(lit(r.toLong).as("band_rows"), lit(b.toLong).as("n_bands"),
          round(pow(lit(1.0) / b, 1.0 / r), 6).as("s_curve_threshold"),
          col("cross_groups"),
          (col("cross_docs") + col("intra_docs")).as("candidate_doc_pairs"))
    }
    perConfig.reduce(_ unionAll _).orderBy("band_rows")
  }

  /** MinHash estimator calibration: est-vs-exact Jaccard error measured ON
    * THE LSH CANDIDATE SET (the lexical twin of `knn_recall`'s
    * measure-don't-guess report). For every banded candidate pair with
    * est ≥ `threshold`, the exact distinct-token-set Jaccard is computed by
    * an equi-join of the two docs' token sets, and pairs aggregate into
    * est-deciles: pair count, mean estimate, mean exact similarity, mean
    * absolute estimator error, and the fraction of the bucket that is a
    * true duplicate at the 0.7 exact cutoff — the table that says whether
    * a 16-permutation signature is enough before committing a 100 TB dedup
    * run to it.
    *
    * Scale: exact Jaccard is computed ONLY for LSH candidates (the small
    * output of the banded join, never all pairs), each via a token
    * equi-join bounded by candidate count × doc length. Recall against
    * ground truth outside the candidate set is inherently unmeasurable at
    * scale — that end is covered by the banding s-curve (`dedup_lsh_tuning`);
    * this measures precision and estimator bias where candidates exist.
    * Estimates are k/16 dyadic rationals, so decile edges and the
    * threshold compare identically on any engine. */
  def minhashCalibration(documents: DataFrame, threshold: Double = 0.5,
                         sampleMod: Long = 20L): DataFrame = {
    // Calibration is a statistical measurement, so it runs on a
    // deterministic 1/sampleMod hash sample of the candidate set — the only
    // shape that survives a corpus where a low threshold qualifies a large
    // fraction of all pairs (the sf0.1 synthetic corpus puts 58% of ALL
    // pairs at est ≥ 0.5: 7.3M candidates, an effectively-all-pairs exact
    // Jaccard nobody would run when a 365k-pair sample gives the same
    // decile table to ±sampling error). The sampled table feeds two plan
    // branches (intersection build + outer join) — checkpoint it or the
    // 0.5-threshold LSH banding runs twice.
    val cand = minhashPairs(documents, threshold = threshold)
      .filter(((col("doc_a") % 1000003L) * 31L + col("doc_b")) % sampleMod === 0L)
      .select(col("doc_a"), col("doc_b"), col("est_sim"))
      .stableCheckpoint()
    // Semi-join pre-filter (guide §3.2's shape at doc grain): exact Jaccard
    // only ever reads tokens of docs IN the sampled candidate set, so the
    // corpus is pruned to those docs BEFORE the tokenize+explode — the
    // explode then runs over the sample's docs instead of the whole corpus,
    // and the checkpoint bounds it to one pass (it previously re-ran for
    // both intersection sides and both size lookups). Per-doc token sets
    // are complete (the filter is on doc_id, never on tokens), so every
    // intersection/size below is bit-identical.
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .unionAll(cand.select(col("doc_b").as("doc_id"))).distinct()
    val tok = documents.join(candDocs, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode(array_distinct(toks)).as("token"))
      .stableCheckpoint()
    val sizes = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("ntok"))
    val inter = cand.select(col("doc_a"), col("doc_b"))
      .join(tok.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
      .join(tok.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b", "token"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    cand
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_a", "ntok" -> "na")), Seq("doc_a"))
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_b", "ntok" -> "nb")), Seq("doc_b"))
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .withColumn("exact_j", col("inter") * 1.0 / (col("na") + col("nb") - col("inter")))
      .withColumn("bucket", floor(col("est_sim") * 10).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        (round(avg(col("est_sim")), 6) + lit(0.0)).as("mean_est"),
        (round(avg(col("exact_j")), 6) + lit(0.0)).as("mean_exact"),
        (round(avg(abs(col("est_sim") - col("exact_j"))), 6) + lit(0.0)).as("mean_abs_err"),
        round(sum(when(col("exact_j") >= 0.7, 1L).otherwise(0L)) * 1.0 / count(lit(1)), 6)
          .as("true_dup_rate"))
      .orderBy("bucket")
  }

  /** Semantic-dedup threshold sweep: how aggressively would each cosine
    * cutoff link the corpus? Per candidate threshold over the SAME
    * LSH-banded pair set (one candidate generation, sweep as a 4-element
    * generator): qualifying pairs, distinct vectors touched, and the
    * fraction of the corpus that would be mutated — the number a curation
    * team stares at before committing to a dedup threshold at 100 TB. */
  def embeddingThresholdSweep(embeddings: DataFrame,
                              thresholds: Seq[Double] = Seq(0.40, 0.45, 0.50, 0.55)): DataFrame = {
    val pairs = embeddingNearDup(embeddings, thresholds.min)
    val tot = embeddings.agg(count(lit(1)).as("n_vecs"))
    val byT = pairs.select(col("cos"), col("vec_a"), col("vec_b"),
        explode(array(thresholds.map(lit): _*)).as("threshold"))
      .filter(col("cos") >= col("threshold"))
    val nPairs = byT.groupBy(col("threshold")).agg(count(lit(1)).as("n_pairs"))
    val nDocs = byT
      .select(col("threshold"), explode(array(col("vec_a"), col("vec_b"))).as("vid"))
      .groupBy(col("threshold")).agg(countDistinct(col("vid")).as("n_docs_linked"))
    // Spine-first so cutoffs that link nothing still report zeros.
    val spine = embeddings.sparkSession.range(1)
      .select(explode(array(thresholds.map(lit): _*)).as("threshold"))
    spine
      .join(nPairs, Seq("threshold"), "left")
      .join(nDocs, Seq("threshold"), "left")
      .crossJoin(broadcast(tot))
      .select(col("threshold"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs_linked"), lit(0L)).as("n_docs_linked"),
        round(coalesce(col("n_docs_linked"), lit(0L)) * 100.0 / col("n_vecs"), 4).as("pct_linked"))
      .orderBy("threshold")
  }

  /** Incremental-ingest dedup screen: an incoming batch (docs with
    * `doc_id % batchMod == 0` stand in for the new crawl) checked against
    * the existing corpus through the same MinHash band buckets — the
    * steady-state shape of production dedup, where each delivery is screened
    * against the accumulated index instead of re-clustering the world. Per
    * new doc: how many corpus near-dups it hit, the best estimated
    * similarity, and the admit/reject flag. Candidates come only from
    * band-bucket equality (the batch side of the join is delivery-sized). */
  def incrementalScreen(documents: DataFrame, batchMod: Long = 5L,
                        threshold: Double = 0.9): DataFrame = {
    val inBatch = (c: org.apache.spark.sql.Column) => c % batchMod === 0L
    val hits = minhashPairs(documents, threshold = threshold)
      .filter(inBatch(col("doc_a")) =!= inBatch(col("doc_b")))
      .select(when(inBatch(col("doc_a")), col("doc_a")).otherwise(col("doc_b")).as("doc_id"),
        col("est_sim"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nm"), max(col("est_sim")).as("be"))
    documents.filter(inBatch(col("doc_id"))).select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nm"), lit(0L)).as("n_matches"),
        coalesce(col("be"), lit(0.0)).as("best_est"),
        col("nm").isNotNull.as("is_dup"))
      .orderBy("doc_id")
  }

  /** Tokens per anchor shingle of the exact-substring screen. */
  val SubstrAnchorLen = 8
  /** Corpus-wide occurrence cap per anchor: anchors seen in more (doc, pos)
    * slots are dropped before the join (the standard frequent-substring
    * guard — a boilerplate 8-gram shared by millions of docs would turn the
    * inverted index into a quadratic hot key; dropping it loses only runs
    * that are ubiquitous boilerplate rather than pairwise duplication). */
  val SubstrMaxAnchorOcc = 100
  /** Exact-substring near-duplication: pairs of documents sharing a maximal
    * common token run of at least `minRun` tokens — the duplication family
    * of suffix-array corpus dedup ("Deduplicating Training Data Makes
    * Language Models Better", Lee et al. 2021), re-expressed as a bucketed
    * Spark plan (a distributed suffix array is not expressible as a
    * DataFrame program; the anchor inverted index finds the same ≥ minRun
    * runs as long as minRun ≥ 2·anchorLen − 1, which 16 ≥ 15 satisfies:
    * every window of anchorLen consecutive positions inside a common run
    * contributes an anchor match, so a run of length ≥ minRun can't be
    * missed).
    *
    * Pipeline, every stage equi-keyed (no all-pairs anywhere):
    *  1. positional anchors: one 8-token shingle per token position;
    *  2. occurrence cap: anchors in > [[SubstrMaxAnchorOcc]] (doc, pos)
    *     slots are dropped (see above);
    *  3. inverted-index self-join on the anchor string (doc_a < doc_b) —
    *     only positions sharing an exact 8-gram pair up; matches of one
    *     common run share the diagonal d = pos_a − pos_b;
    *  4. islands per (pair, diagonal): consecutive pos_a collapse to one
    *     maximal run (the q37 gaps-and-islands trick), run length =
    *     anchor count + anchorLen − 1, keep runs ≥ minRun;
    *  5. interval union per pair and side: overlapping run intervals are
    *     merged by a running-max window (bounded by runs-per-pair) so
    *     `dup_tokens_a/b` count each duplicated token once, then joined to
    *     doc lengths for per-doc duplicated fractions.
    *
    * Windows are partitioned by (pair, diagonal) or (pair) — bounded by a
    * single document's length, never corpus cardinality. */
  def substringDup(documents: DataFrame, minRun: Int = 16,
                   maxAnchorOcc: Int = SubstrMaxAnchorOcc): DataFrame = {
    val docLen = substrDocLen(documents)
    val runs = substrRuns(documents, minRun, maxAnchorOcc)
    // interval union per (pair, side): each duplicated token counted once
    // (shared gaps-and-islands core: plans.Intervals)
    def coverage(startCol: String, out: String): DataFrame =
      graft.plans.Intervals.islands(
          runs.select(col("doc_a"), col("doc_b"), col("diag"),
            col(startCol).as("s"), (col(startCol) + col("run_len")).as("e")),
          keys = Seq("doc_a", "doc_b"), tieCols = Seq("diag"))
        .groupBy(col("doc_a"), col("doc_b"), col("isl"))
        .agg((max(col("e")) - min(col("s"))).as("cov"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(sum(col("cov")).as(out))
    runs.groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_runs"), max(col("run_len")).as("max_run"))
      .join(coverage("sa", "dup_tokens_a"), Seq("doc_a", "doc_b"))
      .join(coverage("sb", "dup_tokens_b"), Seq("doc_a", "doc_b"))
      .join(docLen.withColumnsRenamed(Map("doc_id" -> "doc_a", "n_tok" -> "na")), Seq("doc_a"))
      .join(docLen.withColumnsRenamed(Map("doc_id" -> "doc_b", "n_tok" -> "nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_runs"), col("max_run"),
        col("dup_tokens_a"), col("dup_tokens_b"),
        round(col("dup_tokens_a") * 1.0 / col("na"), 6).as("dup_frac_a"),
        round(col("dup_tokens_b") * 1.0 / col("nb"), 6).as("dup_frac_b"))
      .orderBy("doc_a", "doc_b")
  }

  /** Token count per doc (the denominator of every coverage fraction). */
  private def substrDocLen(documents: DataFrame): DataFrame =
    documents.withColumn("t", toks)
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tok"))

  /** Maximal cross-doc duplicated-run table `(doc_a, doc_b, diag, sa, sb,
    * run_len)` — stages 1–4 of [[substringDup]]'s pipeline, checkpointed
    * AND memoized per (corpus, params): the per-pair view
    * ([[substringDup]]) and the per-doc onion union ([[onionCoverage]])
    * both consume it, and within one view the table feeds three plan
    * branches with the anchor explode + occurrence-cap join +
    * inverted-index self-join in its lineage. AQE's ReusedExchange already
    * recovers most of the intra-query re-execution, so the checkpoint is
    * not the 3× saving it looks like — measured cold 7.0 → 5.9 s at sf0.1
    * (reuse can't cover the post-shuffle window/agg stages), warm
    * unchanged. Qualifying runs are tiny. */
  private def substrRuns(documents: DataFrame, minRun: Int,
                         maxAnchorOcc: Int): DataFrame =
    graft.plans.Memo.memoize(documents, s"dedup.substr.runs:$minRun:$maxAnchorOcc") {
      val a = SubstrAnchorLen
      val cat = (1 until a).map(k => s", t[i+$k]").mkString
      val anchors = documents.withColumn("t", toks)
        .select(col("doc_id"), explode(expr(
          s"filter(transform(t, (x, i) -> CASE WHEN i + ${a - 1} < size(t) " +
            s"THEN struct(i AS pos, concat_ws(' ', x$cat) AS sh) END), y -> y IS NOT NULL)"))
          .as("an"))
        .select(col("doc_id"), col("an.pos").as("pos"), col("an.sh").as("sh"))
      val keep = anchors.groupBy(col("sh")).agg(count(lit(1)).as("occ"))
        .filter(col("occ") <= maxAnchorOcc).select(col("sh"))
      val af = anchors.join(keep, Seq("sh"))
      val m = af.select(col("sh"), col("doc_id").as("doc_a"), col("pos").as("pa"))
        .join(af.select(col("sh"), col("doc_id").as("doc_b"), col("pos").as("pb")), Seq("sh"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("pa"), (col("pa") - col("pb")).as("diag"))
      // islands per (pair, diagonal): consecutive pos_a → one maximal run
      val wd = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag")).orderBy(col("pa"))
      m.withColumn("grp", col("pa") - row_number().over(wd))
        .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("grp"))
        .agg(min(col("pa")).as("sa"), (count(lit(1)) + (a - 1)).as("run_len"))
        .filter(col("run_len") >= minRun)
        .withColumn("sb", col("sa") - col("diag"))
        .stableCheckpoint()
    }

  /** Onion-layer duplication coverage, the per-DOCUMENT rollup of the
    * exact-substring screen: for every document, the fraction of its token
    * positions covered by ANY ≥ `minRun`-token run it shares with any other
    * document — the statistic the "onion" dedup policy drops on (a document
    * that is mostly an assembly of text duplicated elsewhere in the corpus
    * contributes almost no novel supervision even when no single partner
    * pair looks alarming; cf. the coverage-threshold removal policy of the
    * suffix-array dedup family, Lee et al. 2021, reference
    * `poc/utils` has no analogue — this is pipeline widening).
    *
    * Plan: the memoized [[substrRuns]] table is read once; each run
    * contributes its interval to BOTH endpoint docs (a union of the two
    * projections), and the per-doc interval union is one gaps-and-islands
    * window partitioned by `doc_id` — bounded by one document's run count,
    * never corpus cardinality. Docs with zero duplicated runs surface with
    * coverage 0 via the doc-length left join, so the output is a total
    * per-doc policy table: `drop_doc` marks docs whose ROUNDED coverage
    * meets `dropFrac` (rounding first keeps the flag engine-invariant). */
  def onionCoverage(documents: DataFrame, minRun: Int = 16,
                    maxAnchorOcc: Int = SubstrMaxAnchorOcc,
                    dropFrac: Double = 0.5): DataFrame = {
    val runs = substrRuns(documents, minRun, maxAnchorOcc)
    val sides = runs.select(col("doc_a").as("doc_id"), col("doc_b").as("other"),
        col("diag"), col("sa").as("s"), (col("sa") + col("run_len")).as("e"))
      .unionByName(runs.select(col("doc_b").as("doc_id"), col("doc_a").as("other"),
        col("diag"), col("sb").as("s"), (col("sb") + col("run_len")).as("e")))
    val cov = graft.plans.Intervals.islands(sides, keys = Seq("doc_id"),
        tieCols = Seq("other", "diag"))
      .groupBy(col("doc_id"), col("isl"))
      .agg((max(col("e")) - min(col("s"))).as("cov"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cov")).as("dup_tokens"))
    val partners = sides.groupBy(col("doc_id"))
      .agg(countDistinct(col("other")).as("n_partners"))
    substrDocLen(documents)
      .join(cov, Seq("doc_id"), "left")
      .join(partners, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        coalesce(col("n_partners"), lit(0L)).as("n_partners"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)) * 1.0 / col("n_tok"), 6).as("dup_frac"))
      .withColumn("drop_doc", col("dup_frac") >= dropFrac)
      .orderBy("doc_id")
  }

  /** Bloom-filter membership pre-screen for exact dedup (Bloom 1970; the
    * standard first gate of a crawl-ingest pipeline — cf. the broadcast
    * runtime bloom filters Spark itself injects for joins): the accumulated
    * corpus publishes an mBits-wide bloom over content fingerprints, and an
    * incoming batch (`doc_id % batchMod == 0`, the same delivery convention
    * as [[incrementalScreen]]) is screened against it without ever joining
    * the corpus row-for-row. Output is the 2×2 confusion matrix of
    * (bloom says maybe-dup × exact truth) with the filter's fill ratio — the
    * false-positive/fill tradeoff that sizes mBits, with the no-false-
    * negative guarantee visible as an empty (false, true) cell.
    *
    * Everything is integer arithmetic on the 64-bit content fingerprint
    * ([[graft.text.TextAnalysis.fingerprintCore]]): k positions per doc via
    * independent affine hashes mod a prime, reduced mod mBits — bit-exact in
    * the DuckDB oracle. Scale shape: the corpus side collapses to ≤ mBits
    * distinct set-bit rows (a DataFrame `distinct` IS the distributed bloom
    * build — per-partition partial filters union by construction), which
    * broadcast-joins against the delivery-sized batch; the exact-truth join
    * keys on (fingerprint, n_tokens), an equi-join the batch side bounds.
    * Production sizing wants ~10–15 bits/key; the default mBits=2¹¹ over a
    * few hundred corpus docs is deliberately tight (~50% fill) so the test
    * corpus's matrix shows a nonzero false-positive cell alongside the
    * empty false-negative one. */
  def bloomScreen(documents: DataFrame, batchMod: Long = BloomBatchMod,
                  mBits: Long = BloomMBits, k: Int = BloomK): DataFrame = {
    // A prime comfortably above mBits (a small modulus would alias every
    // position into its first 10007 bits); affine multipliers stay < P so
    // key·a ≈ 10¹² never overflows int64 under ANSI arithmetic.
    val P = 1000003L
    val fp = graft.text.TextAnalysis.fingerprintCore(documents)
      .withColumn("is_batch", col("doc_id") % batchMod === 0L)
      .withColumn("key", (pmod(col("fingerprint"), lit(P)) * 31L + col("n_tokens")) % P)
      // fp is the corpus-grain fingerprint pass and feeds four branches
      // (bit positions -> filter + screen, and both truth sides) — cut it
      // so the tokenize+fingerprint aggregation runs once (doc-grain).
      .stableCheckpoint()
    val withPos = fp.select(col("doc_id"), col("is_batch"),
        explode(array((0 until k).map(i =>
          (col("key") * (((i + 1).toLong * 2654435761L) % P) +
            (i.toLong * 40503L + 7919L)) % P % mBits): _*)).as("pos"))
    val bits = withPos.filter(!col("is_batch")).select(col("pos")).distinct()
    val screened = withPos.filter(col("is_batch"))
      .join(broadcast(bits.withColumn("hit", lit(1L))), Seq("pos"), "left")
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("pos")).as("n_pos"),
           count_distinct(when(col("hit").isNotNull, col("pos"))).as("n_hit"))
      .withColumn("maybe_dup", col("n_hit") === col("n_pos"))
    val truth = fp.filter(col("is_batch")).select(col("doc_id"), col("fingerprint"), col("n_tokens"))
      .join(fp.filter(!col("is_batch")).select(col("fingerprint"), col("n_tokens")).distinct()
              .withColumn("in_corpus", lit(1L)),
            Seq("fingerprint", "n_tokens"), "left")
      .select(col("doc_id"), col("in_corpus").isNotNull.as("is_dup"))
    val fill = bits.agg(count(lit(1)).as("bits_set"))
      .withColumn("fill_pct", round(col("bits_set") * 100.0 / mBits, 4))
    screened.join(truth, Seq("doc_id"))
      .groupBy(col("maybe_dup"), col("is_dup"))
      .agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(fill))
      .orderBy("maybe_dup", "is_dup")
  }

  /** Fixed-width block-hash dedup — the scalable "paragraph dedup" shape of
    * C4/CCNet/Dolma pipelines (there the unit is a newline paragraph; this
    * corpus has no newlines, so the unit is a fixed 20-token block — the
    * plan is identical either way). Block signature = md5 of the block's
    * token string: stable across engines and bounded key width, the
    * production choice when block text runs to kilobytes. Cost is one
    * shuffle on block signatures (linear in corpus tokens — the same shape
    * as exact dedup, just at block grain) plus one doc-keyed rollup; no
    * pairwise joins anywhere, so the 100 TB story is exactly exact-dedup's.
    * Per doc: block count, blocks shared verbatim with ANY other doc, the
    * duplicated fraction, and the C4-style drop flag at ≥ `dropFrac`. */
  def blockDedup(documents: DataFrame, blockTokens: Int = 20,
                 dropFrac: Double = 0.8): DataFrame = {
    // Token grain via posexplode + `pos div blockTokens` grouping (the
    // cdcDedup shape): every exploded row carries ONE token, and the block
    // text is reassembled by a position-ordered hash agg. The previous
    // shape exploded a block index and carried the doc's FULL token array
    // through the generate to slice per block row — O(tokens²/blockTokens)
    // bytes per doc through the exchange, which the scale harness measured
    // as cpu exponent 1.85 at 16× volume (this shape re-measures linear).
    val blocks = documents
      .select(col("doc_id"), posexplode(toks).as(Seq("pos", "token")))
      .withColumn("b", (col("pos") / blockTokens).cast("long"))
      .groupBy(col("doc_id"), col("b"))
      .agg(md5(array_join(
        expr("transform(array_sort(collect_list(struct(pos, token))), x -> x.token)"),
        " ")).as("sig"))
      .select(col("doc_id"), col("sig"))
    val dupSigs = blocks.groupBy(col("sig")).agg(countDistinct(col("doc_id")).as("n_docs"))
    blocks.join(dupSigs, "sig")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("dup_blocks"))
      .withColumn("dup_frac", round(col("dup_blocks") * 1.0 / col("n_blocks"), 6))
      .withColumn("drop_doc", col("dup_frac") >= dropFrac)
      .select(col("doc_id"), col("n_blocks"), col("dup_blocks"), col("dup_frac"), col("drop_doc"))
      .orderBy("doc_id")
  }

  /** Content-defined-chunking dedup — the shift-resistant complement to
    * [[blockDedup]]: chunk boundaries are declared wherever a token's own
    * hash ≡ 0 (mod `modBase`), so inserting or deleting a sentence moves
    * only the chunks it touches, while fixed-width blocks would re-align
    * every block after the edit (the rsync/LBFS/CDC principle, applied at
    * token grain). Boundary hash is the first 8 md5 hex digits — stable
    * across engines, no dictionary build. The chunk id is a per-doc
    * prefix count of boundaries (doc-length-bounded partitioned window);
    * chunk signatures are md5 of the position-ordered token run; the
    * cross-doc rollup is the same linear signature shuffle as blockDedup.
    * Per doc: chunk/token counts, verbatim-shared chunks and the
    * token-weighted duplicated fraction. */
  def cdcDedup(documents: DataFrame, modBase: Int = 16): DataFrame = {
    val tok = documents.select(col("doc_id"), posexplode(toks).as(Seq("pos0", "token")))
      .withColumn("pos", col("pos0").cast("long") + 1)
      .withColumn("bnd",
        conv(substring(md5(col("token")), 1, 8), 16, 10).cast("long") % modBase === 0)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunks = tok
      .withColumn("chunk", coalesce(sum(when(col("bnd"), 1L).otherwise(0L)).over(w), lit(0L)))
      .groupBy(col("doc_id"), col("chunk"))
      .agg(count(lit(1)).as("n_tok"),
        md5(array_join(
          expr("transform(array_sort(collect_list(struct(pos, token))), x -> x.token)"),
          " ")).as("sig"))
    val ds = chunks.groupBy(col("sig")).agg(countDistinct(col("doc_id")).as("n_docs"))
    chunks.join(ds, "sig")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_tok")).as("n_tokens"),
        sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("dup_chunks"),
        sum(when(col("n_docs") > 1, col("n_tok")).otherwise(0L)).as("dup_tokens"))
      .withColumn("dup_frac", round(col("dup_tokens") * 1.0 / col("n_tokens"), 6))
      .select(col("doc_id"), col("n_chunks"), col("n_tokens"),
        col("dup_chunks"), col("dup_tokens"), col("dup_frac"))
      .orderBy("doc_id")
  }
}
