package graft.text

import graft.plans.Checkpoints._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (SURVEY.md §2.5).
  *
  * Everything is built from codegen'd `functions._` / higher-order array
  * functions — no UDFs — so the whole pipeline stays inside WholeStageCodegen
  * and scales linearly: tokenize → per-doc arrays; corpus-level structures
  * (vocabulary, language profiles) are tiny aggregates that broadcast.
  *
  * Determinism contract with the DuckDB oracles: token ids come from a
  * dense_rank over the sorted global vocabulary (not an engine hash), all
  * tie-breaks are explicit, positions are 1-based on both sides.
  */
object TextAnalysis {

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  private def toks = split(trim(col("text")), "\\s+")

  /** Broadcast gate for corpus-derived LM count tables (bigram/trigram/
    * unigram types). These are vocabulary-bounded (Heaps-sublinear in
    * corpus size) and Zipf-skewed on their bare context keys, so a
    * broadcast join is the right plan — UNTIL the type table outgrows
    * broadcast range, where Spark hard-fails at 8 GB and the driver can
    * OOM collecting it. The gate estimates from the SOURCE corpus bytes
    * (optimizer scan stats — real parquet file sizes): every distinct
    * n-gram string is a substring of the corpus, so distinct-key bytes are
    * corpus-bounded; the 256 MiB default leaves ~30× headroom for row/hash
    * overhead under the 8 GB ceiling. Over the threshold the join falls
    * back to a shuffle join — AQE's skew-join split (on in GraftSession.
    * tune) absorbs the Zipf-hot context keys that made the unconditional
    * hint attractive. */
  private[text] val lmBroadcastMaxCorpusBytes: Long = 256L << 20

  private def lmCounts(counts: DataFrame, sourceCorpus: DataFrame): DataFrame = {
    val bytes = sourceCorpus.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes <= lmBroadcastMaxCorpusBytes) broadcast(counts) else counts
  }

  /** Per-doc token/char statistics: whitespace tokens plus a GPT-2-style
    * pre-tokenizer count (`n_subtokens` — runs of letters / digits /
    * punctuation, each with its leading space, the public BPE pre-split of
    * Radford et al. 2019 §2.2 minus the RE2-unsupported lookahead so the
    * DuckDB oracle matches byte-for-byte). The subtoken:word fertility ratio
    * is the standard proxy for how a byte-pair vocabulary will segment the
    * corpus — budget planning needs it before any real tokenizer run. */
  def tokenStats(documents: DataFrame): DataFrame =
    documents
      .withColumn("t", toks)
      .select(
        col("doc_id"), col("lang"),
        size(col("t")).cast("long").as("n_tokens"),
        size(expr("regexp_extract_all(text, ' ?[\\\\p{L}]+| ?[\\\\p{N}]+| ?[^\\\\p{L}\\\\p{N} ]+', 0)"))
          .cast("long").as("n_subtokens"),
        length(col("text")).cast("long").as("text_len"),
        round(length(regexp_replace(col("text"), " ", "")) * 1.0 / size(col("t")), 6).as("avg_token_len"))
      .orderBy("doc_id")

  /** Heuristic quality score: stopword ratio + length norm + punctuation. */
  def qualityScore(documents: DataFrame): DataFrame =
    qualityWithTokens(documents)
      .select(col("doc_id"), col("stop_ratio"), col("punct_ratio"), col("quality"))
      .orderBy("doc_id")

  /** One-pass quality + token count: the single tokenization both
    * `qualityScore` (which drops the count) and `qualityBudget` (which needs
    * it) project from — consumers joining the two would tokenize the corpus
    * twice and shuffle on doc_id for nothing. `n_tok` carries the oracle's
    * empty-text convention (0 tokens, where `size(split(''))` would be 1). */
  private def qualityWithTokens(documents: DataFrame): DataFrame = {
    val stopList = stopwords.map(s => s"'$s'").mkString(", ")
    documents
      .withColumn("t", toks)
      .withColumn("n_tokens", size(col("t")).cast("long"))
      .withColumn("stop_ratio",
        expr(s"size(filter(t, x -> x IN ($stopList)))") * 1.0 / col("n_tokens"))
      .withColumn("punct_ratio",
        (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", ""))) * 1.0 / length(col("text")))
      .select(col("doc_id"),
        round(col("stop_ratio"), 6).as("stop_ratio"),
        round(col("punct_ratio"), 6).as("punct_ratio"),
        round(lit(0.5) * col("stop_ratio") +
              lit(0.3) * least(col("n_tokens") / 50.0, lit(1.0)) +
              lit(0.2) * (lit(1.0) - col("punct_ratio")), 6).as("quality"),
        when(length(trim(col("text"))) === 0, 0L)
          .otherwise(col("n_tokens")).as("n_tok"))
  }

  /** Exact top-`k` rows per language by (count desc, key asc), without a
    * single-task vocabulary sort: a `row_number` window partitioned by
    * `lang` alone has ≤ #languages partitions, so ONE task sorts that
    * language's whole (corpus-growing) vocabulary — the per-task volume
    * that made `text_char_langid`'s profile stage run ~1.8× the linear
    * control in the r10 scale artifact. Two levels restore parallelism
    * exactly: level 1 takes top-k inside (lang, hash-bucket) — every
    * global top-k row is its own bucket's top-k, so no survivor is lost —
    * and level 2 re-ranks the ≤ langs × buckets × k survivors, a
    * CONSTANT-size table at any corpus size. */
  private def topPerLang(counts: DataFrame, keyCol: String, k: Int,
                         buckets: Int = 64): DataFrame =
    counts
      .withColumn("b__", pmod(xxhash64(col(keyCol)), lit(buckets.toLong)))
      .withColumn("rk__", row_number().over(
        Window.partitionBy(col("lang"), col("b__")).orderBy(col("c").desc, col(keyCol))))
      .filter(col("rk__") <= k)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("c").desc, col(keyCol))))
      .filter(col("rk") <= k)
      .drop("b__", "rk__")

  /** Data-derived language ID: per-language top-`profileSize` token profiles
    * from the labeled corpus, classify each doc by profile overlap, report
    * the confusion matrix. Profiles are tiny → broadcast to the match join. */
  def languageId(documents: DataFrame, profileSize: Int = 20): DataFrame = {
    val tok = documents.select(col("doc_id"), col("lang"), explode(toks).as("token"))
    val profile = topPerLang(
        tok.groupBy(col("lang"), col("token")).agg(count(lit(1)).as("c")),
        "token", profileSize)
      .select(col("lang").as("plang"), col("token"))
    val docTokens = tok.select(col("doc_id"), col("lang"), col("token")).distinct()
    val matches = docTokens.join(broadcast(profile), Seq("token"))
      .groupBy(col("doc_id"), col("lang"), col("plang"))
      .agg(count(lit(1)).as("m"))
    val predicted = matches
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("m").desc, col("plang"))))
      .filter(col("rk") === 1)
    predicted
      .groupBy(col("lang").as("true_lang"), col("plang").as("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy("true_lang", "pred_lang")
  }

  /** Positional rolling fingerprint: XOR over (vocab-id × 1-based position).
    * Two tid modes, mirroring `Dedup.docTokenIds`:
    *  - rank (default): a window rank over the sorted distinct tokens — runs
    *    over the vocabulary (bounded by language, not corpus size) and keeps
    *    the DuckDB oracle bit-exact;
    *  - hashTid=true: the 100 TB setting — tid = xxhash64(token) mod 2³²,
    *    zero windows, zero vocab table, zero join; same XOR algebra, so docs
    *    with identical token sequences still collapse to identical
    *    fingerprints. The 32-bit reduction keeps tid·pos inside int64 under
    *    ANSI arithmetic for docs up to 2³¹ tokens. Not oracle-matched
    *    (DuckDB has no xxhash64), hence the flag. */
  def fingerprint(documents: DataFrame, hashTid: Boolean = false): DataFrame =
    fingerprintCore(documents, hashTid).orderBy("doc_id")

  /** [[fingerprint]] without the presentation sort — for consumers that
    * re-aggregate the fingerprints (e.g. `Dedup.bloomScreen`) and would
    * otherwise pay a useless range-partition exchange. */
  private[graft] def fingerprintCore(documents: DataFrame, hashTid: Boolean = false): DataFrame = {
    val tok = documents.select(col("doc_id"), posexplode(toks).as(Seq("pos0", "token")))
      .withColumn("pos", col("pos0").cast("long") + 1)
    val tt =
      if (hashTid) tok.withColumn("tid", pmod(xxhash64(col("token")), lit(1L << 32)))
      else {
        val vocab = tok.select(col("token")).distinct()
          .withColumn("tid", row_number().over(Window.orderBy(col("token"))).cast("long"))
        tok.join(broadcast(vocab), Seq("token"))
      }
    tt.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
           expr("bit_xor(tid * pos)").as("fingerprint"))
  }

  /** Text normalisation pipeline: lowercase → strip punctuation → collapse
    * whitespace → trim. Pure codegen string ops. */
  def normalize(documents: DataFrame): DataFrame =
    documents
      .withColumn("norm_text",
        trim(regexp_replace(regexp_replace(lower(col("text")), "[.,!?;:]", ""), "\\s+", " ")))
      .select(col("doc_id"),
        length(col("norm_text")).cast("long").as("norm_len"),
        size(split(col("norm_text"), " ")).cast("long").as("n_tokens"),
        (col("norm_text") =!= col("text")).as("changed"))
      .orderBy("doc_id")

  /** Top-k tokens per doc by TF-IDF (idf = ln((N+1)/(df+1)); N, df and tf are
    * exact integers so both engines feed ln identical operands). Ranking uses
    * the 6-dp-rounded score with a token tie-break for determinism. */
  def tfidf(documents: DataFrame, k: Int = 3): DataFrame = {
    val tok = documents.select(col("doc_id"), explode(toks).as("token"))
    val n = documents.count() // corpus size: a literal in the plan (tiny driver action)
    val tf = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df = tok.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("token"))
      .withColumn("score", round(col("tf") * log((lit(n) + 1.0) / (col("df") + 1.0)), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("token"))).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("token"), col("tf"), col("df"), col("score"), col("rk"))
      .orderBy("doc_id", "rk")
  }

  /** Stopword filtering: per-doc token counts before/after removing the
    * stopword list, and the filtered text itself (pipeline-shaped: the
    * filtered column is what a downstream trainer would consume). */
  def stopwordFilter(documents: DataFrame): DataFrame = {
    val stopList = stopwords.map(s => s"'$s'").mkString(", ")
    documents
      .withColumn("t", toks)
      .withColumn("kept", expr(s"filter(t, x -> x NOT IN ($stopList))"))
      .select(col("doc_id"),
        size(col("t")).cast("long").as("n_tokens"),
        size(col("kept")).cast("long").as("n_kept"),
        round(size(col("kept")) * 1.0 / size(col("t")), 6).as("keep_ratio"),
        length(array_join(col("kept"), " ")).cast("long").as("filtered_len"))
      .orderBy("doc_id")
  }

  /** Bigram language-model score (perplexity proxy): corpus bigram/unigram
    * counts give P(w2|w1) = c(w1 w2)/c(w1·); each doc scores the mean
    * negative log-likelihood of its adjacent pairs. Counts are exact
    * integers on both engines, so ln() sees identical operands. The count
    * tables are corpus-level aggregates (vocab² bounded) → broadcast. */
  def bigramLmScore(documents: DataFrame): DataFrame = {
    val bg = documents
      .withColumn("t", toks)
      .select(col("doc_id"), explode(expr(
        "filter(transform(t, (x, i) -> CASE WHEN i + 1 < size(t) THEN struct(x AS w1, t[i+1] AS w2) END), y -> y IS NOT NULL)"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    // bigramCounts is the corpus-grain aggregation and feeds three
    // branches (contextCounts + both LM joins) — cut it so the bigram
    // explode+groupBy runs once (bigram-TYPE bounded, the documented
    // broadcast bound). Two corpus passes total: counts + scoring.
    val bigramCounts = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
      .stableCheckpoint()
    val contextCounts = bigramCounts.groupBy(col("w1")).agg(sum(col("cb")).as("cw"))
    bg
      .join(lmCounts(bigramCounts, documents), Seq("w1", "w2"))
      .join(lmCounts(contextCounts, documents), Seq("w1"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
           round(avg(-log(col("cb") / col("cw"))), 6).as("avg_nll"))
      .orderBy("doc_id")
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020,
    * `reference/README.md`'s quality-screen stage generalized): score every
    * doc by its mean negative log-likelihood under the corpus bigram LM, then
    * split each language's docs into head / middle / tail terciles by that
    * score — the standard "keep the head, inspect the middle, drop the tail"
    * pre-training filter. Output: per (lang, bucket) doc/bigram counts and
    * NLL summary stats.
    *
    * Scale shape: the per-doc scoring is [[bigramLmScore]]'s two corpus
    * aggregates + BROADCAST joins against the token stream. Both count
    * tables are bounded by bigram/unigram TYPE counts (vocab-bounded, Heaps
    * sublinear in corpus size), not token counts — and the bare-`w1` key is
    * Zipf-skewed (stopword contexts), so a shuffle join on it concentrates
    * the hot partition super-linearly as the corpus grows while a broadcast
    * join keeps the token stream partition-local with zero shuffle. The broadcast is
    * GATED, not unconditional ([[lmCounts]]): past the corpus-size
    * threshold the joins fall back to shuffle joins (AQE skew-split
    * absorbing the hot context keys) instead of hard-failing Spark's 8 GB
    * broadcast ceiling or OOMing the driver collect. The tercile cut is NOT a
    * per-doc rank (an ntile over
    * docs-per-lang would be an O(n)-cardinality window): docs land in
    * 64th-nat histogram bins (bounded key space — NLL is bounded by
    * ln(corpus bigrams), so ≤ ~1000 bins per lang even at 100 TB), the
    * cumulative bin counts run under a window whose partitions are
    * bins-per-lang (bounded), and every doc inherits its bin's tercile.
    * Bins are cut on the 6-dp-rounded NLL so Spark and the oracle floor
    * identical doubles; a bin straddling a tercile boundary goes wholly to
    * the earlier bucket (deterministic, documented approximation — at
    * resolution 1/64 nat the misassigned mass is at most one bin per cut).
    * Docs with < 2 tokens have no bigrams and are out of scope, as in
    * [[bigramLmScore]]. */
  def perplexityBuckets(documents: DataFrame): DataFrame = {
    val bg = documents
      .withColumn("t", toks)
      .select(col("doc_id"), col("lang"), explode(expr(
        "filter(transform(t, (x, i) -> CASE WHEN i + 1 < size(t) THEN struct(x AS w1, t[i+1] AS w2) END), y -> y IS NOT NULL)"))
        .as("b"))
      .select(col("doc_id"), col("lang"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    // bigramCounts is the corpus-grain aggregation and feeds three
    // branches (contextCounts + both LM joins) — cut it so the bigram
    // explode+groupBy runs once (bigram-TYPE bounded, the documented
    // broadcast bound). Two corpus passes total: counts + scoring.
    val bigramCounts = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
      .stableCheckpoint()
    val contextCounts = bigramCounts.groupBy(col("w1")).agg(sum(col("cb")).as("cw"))
    val perDoc = bg
      .join(lmCounts(bigramCounts, documents), Seq("w1", "w2"))
      .join(lmCounts(contextCounts, documents), Seq("w1"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"),
           round(avg(-log(col("cb") / col("cw"))), 6).as("h"))
      .withColumn("bin", floor(col("h") * 64).cast("long"))
      // perDoc is the scoring pass (the query's second and last corpus
      // explode) and feeds three branches (bin histogram, bucket map,
      // final join) — cut it so the explode+LM-join runs once (doc-grain).
      .stableCheckpoint()
    val binCounts = perDoc.groupBy(col("lang"), col("bin")).agg(count(lit(1)).as("n"))
    val wb = Window.partitionBy(col("lang")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = binCounts.groupBy(col("lang")).agg(sum(col("n")).as("tot"))
    val bucketOf = binCounts
      .withColumn("cum", sum(col("n")).over(wb))
      .join(broadcast(totals), Seq("lang"))
      .withColumn("bucket",
        when(col("cum") * 3 <= col("tot"), "head")
          .when(col("cum") * 3 <= col("tot") * 2, "middle")
          .otherwise("tail"))
      .select(col("lang"), col("bin"), col("bucket"))
    // The bucket mean averages ALREADY-6dp-rounded per-doc values, whose sums
    // routinely land exactly on the mean's own rounding boundary — a float
    // avg + round here flips the 6th decimal between engines (Spark rounds
    // the shortest decimal rendering, DuckDB the binary double). So the mean
    // never touches float rounding at all: per-doc NLLs become exact integer
    // micro-nats, the bucket mean is their integer floor-division, and the
    // only float op is a final exact-integer ÷ 10⁶ — bit-identical anywhere.
    perDoc.join(broadcast(bucketOf), Seq("lang", "bin"))
      .withColumn("hmu", round(col("h") * 1e6, 0).cast("long"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_bigrams")).as("n_bigrams"),
           sum(col("hmu")).as("sum_hmu"),
           round(min(col("h")), 6).as("min_nll"),
           round(max(col("h")), 6).as("max_nll"))
      .withColumn("mean_nll", expr("sum_hmu div n_docs") / 1e6)
      .select(col("lang"), col("bucket"), col("n_docs"), col("n_bigrams"),
        col("mean_nll"), col("min_nll"), col("max_nll"))
      .orderBy("lang", "bucket")
  }

  /** Repetition quality signals (Gopher-style): per-doc duplicate-bigram
    * fraction and most-frequent-token share. Pure per-row array lambdas —
    * no shuffle at all, the whole operator is one codegen'd map over the
    * scan, so it costs a single pass at any corpus size. `flagged` is
    * computed from the 6-dp-rounded ratios so the threshold comparison is
    * identical on both engines. */
  def repetition(documents: DataFrame, dupThreshold: Double = 0.2,
                 topThreshold: Double = 0.2): DataFrame =
    documents
      .withColumn("t", toks)
      .withColumn("b", expr(
        "filter(transform(t, (x, i) -> CASE WHEN i + 1 < size(t) THEN concat(x, ' ', t[i+1]) END), y -> y IS NOT NULL)"))
      .withColumn("dup_bigram_ratio",
        round(lit(1.0) - size(array_distinct(col("b"))) * 1.0 / size(col("b")), 6))
      .withColumn("top_token_ratio", round(
        expr("array_max(transform(array_distinct(t), x -> size(filter(t, y -> y = x))))")
          * 1.0 / size(col("t")), 6))
      .select(col("doc_id"),
        size(col("t")).cast("long").as("n_tokens"),
        size(col("b")).cast("long").as("n_bigrams"),
        col("dup_bigram_ratio"), col("top_token_ratio"),
        (col("dup_bigram_ratio") > dupThreshold || col("top_token_ratio") > topThreshold)
          .as("flagged"))
      .orderBy("doc_id")

  /** Benchmark-contamination check: which corpus docs share a 5-token
    * shingle with the held-out benchmark set (`doc_id % benchMod == 0` —
    * standing in for an eval-suite n-gram index). The benchmark shingle set
    * is small by construction (eval suites are fixed-size) → broadcast to
    * the corpus side, so the scan over the 100 TB corpus is a single
    * map-side semi-join pass plus one per-doc aggregation. */
  def contamination(documents: DataFrame, benchMod: Long = 50): DataFrame = {
    val sh = documents
      .withColumn("t", toks)
      .select(col("doc_id"), explode(expr(
        "filter(transform(t, (x, i) -> CASE WHEN i + 4 < size(t) THEN concat(x, ' ', t[i+1], ' ', t[i+2], ' ', t[i+3], ' ', t[i+4]) END), y -> y IS NOT NULL)"))
        .as("sh"))
      .distinct()
    val bench = sh.filter(col("doc_id") % benchMod === 0).select(col("sh")).distinct()
    val corpus = sh.filter(col("doc_id") % benchMod =!= 0)
    val sizes = corpus.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val hits = corpus.join(broadcast(bench), Seq("sh"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    sizes.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)) * 1.0 / col("n_shingles"), 6).as("contamination"))
      .orderBy("doc_id")
  }

  /** Decontamination splice plan: the removal step that `contamination`
    * only detects. Every corpus doc's 5-token shingles are matched against
    * the broadcast benchmark shingle set (same index as `contamination`);
    * each hit position expands to a removal span [pos − margin,
    * pos + 5 + margin), overlapping spans merge (gaps-and-islands interval
    * union), and what remains is re-chunked: each clean segment between
    * merged spans packs into ⌈len / chunkSize⌉ training chunks — splicing
    * across a removed span is forbidden (the standard span-splice rule, so
    * no training window straddles deleted benchmark text). Per corpus doc:
    * hit/span counts, tokens removed vs kept, and the surviving chunk
    * count; clean docs pass through with zero spans and their full-length
    * chunking, so the output is a total plan over the corpus, not just the
    * contaminated tail.
    *
    * Scale: the benchmark side is eval-suite-sized → broadcast; the corpus
    * scan is one pass; the merge/segment windows are partitioned per doc
    * and bounded by a single document's hit count. */
  def decontaminate(documents: DataFrame, benchMod: Long = 50,
                    margin: Int = 3, chunkSize: Int = 32): DataFrame = {
    val t = documents.withColumn("t", toks)
      .select(col("doc_id"), col("t"), size(col("t")).cast("long").as("n_tokens"))
    val shPos = t.select(col("doc_id"), col("n_tokens"), explode(expr(
        "filter(transform(t, (x, i) -> CASE WHEN i + 4 < size(t) THEN " +
          "struct(i AS pos, concat(x, ' ', t[i+1], ' ', t[i+2], ' ', t[i+3], ' ', t[i+4]) AS sh) END), " +
          "y -> y IS NOT NULL)")).as("an"))
      .select(col("doc_id"), col("n_tokens"), col("an.pos").as("pos"), col("an.sh").as("sh"))
    val bench = shPos.filter(col("doc_id") % benchMod === 0).select(col("sh")).distinct()
    val corpusDocs = t.filter(col("doc_id") % benchMod =!= 0)
      .select(col("doc_id"), col("n_tokens"))
    // hit positions → clipped removal spans [s, e)
    val spans = shPos.filter(col("doc_id") % benchMod =!= 0)
      .join(broadcast(bench), Seq("sh"))
      .select(col("doc_id"), col("n_tokens"),
        greatest(col("pos") - margin, lit(0)).cast("long").as("s"),
        least(col("pos") + (5 + margin), col("n_tokens")).cast("long").as("e"))
    // interval union per doc (shared gaps-and-islands core: plans.Intervals)
    val merged = graft.plans.Intervals.islands(spans, keys = Seq("doc_id"))
      .groupBy(col("doc_id"), col("isl"))
      .agg(first(col("n_tokens")).as("n_tokens"),
        min(col("s")).as("ss"), max(col("e")).as("ee"), count(lit(1)).as("hits"))
    // clean segment BEFORE each span, plus the tail segment after the last
    val wi = Window.partitionBy(col("doc_id")).orderBy(col("ss"))
    // ⌈seg / chunkSize⌉ in integer arithmetic (floor of a double division is
    // exact here: segment lengths are doc-bounded, far inside 2^53)
    val chunkUp = (seg: Column) =>
      when(seg > 0, floor((seg + (chunkSize - 1)) / chunkSize)).otherwise(lit(0L)).cast("long")
    val dirty = merged
      .withColumn("seg_before", col("ss") - coalesce(lag(col("ee"), 1).over(wi), lit(0L)))
      .groupBy(col("doc_id"))
      .agg(first(col("n_tokens")).as("n_tokens"),
        sum(col("hits")).as("n_hits"),
        count(lit(1)).as("n_spans"),
        sum(col("ee") - col("ss")).as("tokens_removed"),
        (sum(chunkUp(col("seg_before"))) +
          chunkUp(first(col("n_tokens")) - max(col("ee")))).as("survivor_chunks"))
    corpusDocs.join(dirty.drop("n_tokens"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("tokens_removed"), lit(0L)).as("tokens_removed"),
        (col("n_tokens") - coalesce(col("tokens_removed"), lit(0L))).as("tokens_kept"),
        coalesce(col("survivor_chunks"), chunkUp(col("n_tokens"))).as("survivor_chunks"),
        col("n_hits").isNotNull.as("cleaned"))
      .orderBy("doc_id")
  }

  /** Zipf fit: linear regression of ln(freq) on ln(rank) over the top
    * `topRanks` tokens — the rank-frequency slope (≈ −1 for natural text) is
    * a corpus-level quality signal. regr_* aggregates are algebraic
    * (map-side partial). The top-`topRanks` cut is a distributed
    * `orderBy(...).limit(...)` (TakeOrderedAndProject: per-partition heaps of
    * `topRanks` rows merged on the driver — the q17 plan), so a web-scale
    * vocabulary (10⁸–10⁹ distinct tokens) is never single-partition-sorted;
    * the rank window then runs over the ≤ `topRanks`-row survivor table. */
  def zipfSlope(documents: DataFrame, topRanks: Int = 100): DataFrame = {
    val freq = documents
      .select(explode(toks).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("freq").desc, col("token"))
    freq
      .orderBy(col("freq").desc, col("token")).limit(topRanks)
      .withColumn("rk", row_number().over(w).cast("long"))
      .agg(count(lit(1)).as("n_ranks"),
        (round(expr("regr_slope(ln(freq), ln(rk))"), 6) + lit(0.0)).as("zipf_slope"),
        (round(expr("regr_intercept(ln(freq), ln(rk))"), 6) + lit(0.0)).as("zipf_intercept"),
        round(expr("regr_r2(ln(freq), ln(rk))"), 6).as("fit_r2"))
  }

  /** Bigram novelty: the fraction of each document's distinct bigrams that
    * occur in no other document — high novelty separates original text from
    * boilerplate. Inverted-index shape (bigram → doc frequency), the same
    * sub-quadratic pattern as the dedup family. */
  def bigramNovelty(documents: DataFrame): DataFrame = {
    val bg = documents
      .withColumn("t", toks)
      .select(col("doc_id"), explode(expr(
        "filter(transform(t, (x, i) -> CASE WHEN i + 1 < size(t) THEN concat(x, ' ', t[i+1]) END), y -> y IS NOT NULL)"))
        .as("bg"))
      .distinct()
    val docFreq = bg.groupBy(col("bg")).agg(count(lit(1)).as("df"))
    bg.join(docFreq, Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty", round(col("n_novel") * 1.0 / col("n_bigrams"), 6))
      .orderBy("doc_id")
  }

  /** Corpus-level bigram frequencies (positional n-gram assembly done with
    * array lambdas — no self-join). */
  def topBigrams(documents: DataFrame, topN: Int = 15): DataFrame =
    documents
      .withColumn("t", toks)
      .select(explode(expr(
        "filter(transform(t, (x, i) -> CASE WHEN i + 1 < size(t) THEN concat(x, ' ', t[i+1]) END), y -> y IS NOT NULL)"))
        .as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(topN)

  /** Per-doc token Shannon entropy H = −Σ p·ln p (nats) — low entropy flags
    * repetitive/templated text. Two map-side-combinable aggregations
    * ((doc, token) counts → per-doc fold); the identity Σ(c/N)ln(c/N) =
    * ln N − Σ c·ln c / N lets both stages stay algebraic. */
  def tokenEntropy(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(toks).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        (log(sum(col("c"))) - sum(col("c") * log(col("c"))) / sum(col("c"))).as("h"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"), round(col("h"), 6).as("entropy"))
      .orderBy("doc_id")

  /** DSIR importance weights (Data Selection via Importance Resampling,
    * Xie et al. 2023): score every raw document by how much its hashed
    * unigram bag looks drawn from a TARGET distribution rather than the
    * raw-corpus distribution — log w(x) = Σ_b c_b(x)·(ln p̂_target(b) −
    * ln p̂_raw(b)) over `nBuckets` hashed-feature buckets with Laplace
    * smoothing. The target here is the English subcorpus (`lang = 'en'`,
    * standing in for the trusted high-quality corpus DSIR resamples
    * toward); positive log-weight docs are the ones importance resampling
    * would favor.
    *
    * Feature hashing follows the [[fingerprint]] convention: rank-derived
    * token ids reduced mod `nBuckets` (vocab-bounded dictionary window,
    * bit-identical in the oracle); `hashTid = true` switches to
    * xxhash64 ids — the windowless 100 TB path where the vocabulary is
    * unbounded and hashing is the whole point of DSIR's features.
    *
    * Scale shape: one token-grain aggregation; both distributions collapse
    * to ≤ nBuckets-row broadcast tables; per-doc scoring is one more
    * doc-key aggregation over (doc, bucket) counts. Per-bucket log deltas
    * round at 12 dp before the per-doc sum (the entropy/PMI convention). */
  def dsirWeights(documents: DataFrame, targetLang: String = "en",
                  nBuckets: Int = 256, hashTid: Boolean = false): DataFrame = {
    val tok = documents.select(col("doc_id"), col("lang"), explode(toks).as("token"))
    val tt =
      if (hashTid) tok.withColumn("bucket", pmod(xxhash64(col("token")), lit(nBuckets.toLong)))
      else {
        val vocab = tok.select(col("token")).distinct()
          .withColumn("bucket",
            pmod(row_number().over(Window.orderBy(col("token"))).cast("long"), lit(nBuckets.toLong)))
        tok.join(broadcast(vocab), Seq("token"))
      }
    // counts is the one corpus-grain aggregation and feeds four branches
    // (raw, tgt, their totals via delta, and the per-doc scoring join) —
    // cut it so the token explode+vocab join runs once ((doc, bucket)
    // grain, ≤ docs×nBuckets rows).
    val counts = tt.groupBy(col("doc_id"), col("lang"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .stableCheckpoint()
    val raw = counts.groupBy(col("bucket")).agg(sum(col("c")).as("cr"))
    val tgt = counts.filter(col("lang") === targetLang)
      .groupBy(col("bucket")).agg(sum(col("c")).as("ct"))
    // smoothed log-ratio per bucket: buckets absent from the target still
    // score via the +1 smoothing; totals broadcast as 1-row scalars
    val delta = raw.join(tgt, Seq("bucket"), "left")
      .crossJoin(broadcast(raw.agg(sum(col("cr")).as("nr"))))
      .crossJoin(broadcast(tgt.agg(sum(col("ct")).as("nt"))))
      .select(col("bucket"),
        round(log((coalesce(col("ct"), lit(0L)) + 1.0) / (col("nt") + nBuckets))
          - log((col("cr") + 1.0) / (col("nr") + nBuckets)), 12).as("delta"))
    counts.join(broadcast(delta), Seq("bucket"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c")).as("n_tokens"),
        round(sum(col("c") * col("delta")), 6).as("log_weight"))
      .withColumn("selected", col("log_weight") > 0.0)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("log_weight"), col("selected"))
      .orderBy("doc_id")
  }

  /** Corpus bigram PMI: ln(P(w1,w2) / (P(w1)·P(w2))) for bigrams seen at
    * least `minCount` times — the classic collocation score. Unigram totals
    * are a broadcast-size vocabulary table joined onto the bigram counts. */
  def bigramPmi(documents: DataFrame, minCount: Long = 20L, topN: Int = 20): DataFrame = {
    val tok = documents.withColumn("t", toks)
    // uni feeds three branches (total + two broadcast joins), bg two
    // (total + the PMI row set) — cut both so each corpus explode runs
    // once (vocab- / bigram-type-bounded tables).
    val uni = tok.select(explode(col("t")).as("w")).groupBy(col("w")).agg(count(lit(1)).as("cw"))
      .stableCheckpoint()
    val uniTotal = uni.agg(sum(col("cw")).as("n_uni"))
    val bg = tok
      .select(explode(expr(
        "filter(transform(t, (x, i) -> CASE WHEN i + 1 < size(t) THEN struct(x AS w1, t[i+1] AS w2) END), y -> y IS NOT NULL)"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
      .stableCheckpoint()
    val bgTotal = bg.agg(sum(col("cb")).as("n_bg"))
    bg.filter(col("cb") >= minCount)
      .join(broadcast(uni.withColumnRenamed("w", "w1").withColumnRenamed("cw", "c1")), "w1")
      .join(broadcast(uni.withColumnRenamed("w", "w2").withColumnRenamed("cw", "c2")), "w2")
      .crossJoin(broadcast(bgTotal)).crossJoin(broadcast(uniTotal))
      .withColumn("pmi",
        round(log((col("cb") / col("n_bg")) / ((col("c1") / col("n_uni")) * (col("c2") / col("n_uni")))), 6))
      .select(col("w1"), col("w2"), col("cb"), col("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topN)
  }

  /** Lexical-diversity report per doc: type-token ratio and hapax-legomena
    * ratio (types seen exactly once / types). Same two-stage shape as
    * entropy; a single pass over (doc, token) counts. */
  def lexicalDiversity(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(toks).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("ttr", round(col("n_types") * 1.0 / col("n_tokens"), 6))
      .withColumn("hapax_ratio", round(col("n_hapax") * 1.0 / col("n_types"), 6))
      .orderBy("doc_id")

  /** C4-style quality filter cascade: rules applied in order, each doc
    * attributed to the *first* rule it trips (or 'kept'). One pass computes
    * every per-doc signal; the report is a tiny groupBy over the rule label —
    * the funnel accounting a 100 TB cleaning job needs to stay debuggable. */
  def filterCascade(documents: DataFrame, minTokens: Int = 20, maxTokens: Int = 500,
                    minTtr: Double = 0.2, maxTopShare: Double = 0.2): DataFrame = {
    val perTok = documents
      .select(col("doc_id"), explode(toks).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"), max(col("c")).as("top_c"))
    perTok
      .withColumn("rule",
        when(col("n_tokens") < minTokens, "1_too_short")
          .when(col("n_tokens") > maxTokens, "2_too_long")
          .when(col("n_types") * 1.0 / col("n_tokens") < minTtr, "3_low_diversity")
          .when(col("top_c") * 1.0 / col("n_tokens") > maxTopShare, "4_top_token_dominates")
          .otherwise("5_kept"))
      .groupBy(col("rule"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy("rule")
  }

  /** Character-trigram language ID (fastText-style *word-internal*
    * subword trigrams — spaces are token boundaries, not trigram
    * characters). Trigram occurrences come from a nested NARROW double
    * explode (token → its in-token trigrams) per token OCCURRENCE — no
    * corpus-grain shuffle or checkpoint in the expansion; everything that
    * aggregates afterwards is either vocabulary-bounded ((lang, tri)
    * profile counts) or profile-bounded (per-doc match counts after the
    * broadcast profile join). Assumes a deterministic `documents` source:
    * the `occ` lineage is recomputed independently by the profile and
    * match branches, so a nondeterministic input (sampling, unstable
    * reads) could feed them different data — cache `occ` first if that
    * ever applies. Same broadcast-profile/overlap-vote shape as
    * `languageId`; returns the true × predicted confusion matrix. */
  def charTrigramLangId(documents: DataFrame, profileSize: Int = 20): DataFrame = {
    // Trigram OCCURRENCES via two nested NARROW explodes — no shuffle, no
    // materialization. Three corpus-grain stages that each grew a per-task
    // state with data volume are gone (the r11 driver harness flagged this
    // query three rounds running, cpu exponent 1.67 at the 16× rung):
    //  - the (doc,token)-grain groupBy whose map-side hash table is
    //    corpus-sized per task at a fixed partition count (the linear
    //    control's map stays vocabulary-bounded — that asymmetry IS the
    //    flagged ratio);
    //  - the stableCheckpoint of that table (a corpus-sized write+read
    //    whose only job was sharing the first agg between two consumers —
    //    recomputing the narrow explode twice is linear and cheaper);
    //  - the per-doc row_number vote window (sort-based; replaced by a
    //    min-of-struct hash aggregate below).
    // A trigram repeated within or across a doc's tokens contributes each
    // occurrence in both formulations, so every downstream count is
    // bit-identical to the old (doc,token)-deduped + weighted path.
    // ONE generator per pass instead of two chained ones (explode tokens →
    // explode trigrams): the per-doc trigram list is built by a single
    // nested-transform expression and exploded once, so the intermediate
    // (doc_id, lang, token) row blow-up — one row per token carrying both
    // key columns through a second Generate — never materializes. Same
    // trigram multiset per doc (token order × position order), and every
    // consumer aggregates, so all counts are bit-identical.
    val occ = documents
      .withColumn("t__", toks)
      .select(col("doc_id"), col("lang"),
        explode(expr(
          "flatten(transform(filter(t__, x -> length(x) >= 3), " +
            "x -> transform(sequence(1, length(x) - 2), i -> substring(x, i, 3))))")).as("tri"))
    // Profile cut: (lang, tri)-grain counts are vocabulary-bounded, so
    // map-side combine does the heavy lifting; the two-level bucketed
    // top-k (`topPerLang`) avoids sorting a whole language's trigram
    // vocabulary in one task.
    val profile = topPerLang(
        occ.groupBy(col("lang"), col("tri")).agg(count(lit(1)).as("c")),
        "tri", profileSize)
      .select(col("lang").as("plang"), col("tri"))
    // Broadcast-join BEFORE the per-doc distinct: only profile hits (≤
    // langs × profileSize distinct trigrams per doc) reach the distinct
    // count, so the agg state per doc is profile-bounded, not text-bounded.
    val matches = occ.join(broadcast(profile), Seq("tri"))
      .groupBy(col("doc_id"), col("lang"), col("plang"))
      .agg(countDistinct(col("tri")).as("m"))
    // Vote = argmax by (m desc, plang asc) as one hash aggregate:
    // min(struct(-m, plang)) picks the highest match count, ties broken by
    // the lexicographically first language — exactly the row_number order
    // it replaces, without the per-doc sort.
    matches
      .groupBy(col("doc_id"), col("lang"))
      .agg(min(struct((-col("m")).as("nm"), col("plang"))).as("v"))
      .groupBy(col("lang").as("true_lang"), col("v.plang").as("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy("true_lang", "pred_lang")
  }

  /** Corpus drift detection: KL and Jensen–Shannon divergence between the
    * token distributions of two corpus halves (even vs odd doc ids — a
    * scale-free split; swap for time/source buckets in production).
    * Laplace-smoothed over the joint vocabulary so absent tokens don't blow
    * up the log; one token-count pass plus a vocabulary-bounded reduce. */
  def corpusDrift(documents: DataFrame): DataFrame = {
    val counts = documents
      .select((col("doc_id") % 2 === 0).as("side_a"), explode(toks).as("token"))
      .groupBy(col("token"))
      .agg(sum(when(col("side_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("side_a"), 1L).otherwise(0L)).as("cb"))
    val totals = counts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
      count(lit(1)).as("v"))
    counts.crossJoin(broadcast(totals))
      .withColumn("pa", (col("ca") + 1.0) / (col("na") + col("v")))
      .withColumn("pb", (col("cb") + 1.0) / (col("nb") + col("v")))
      .withColumn("pm", (col("pa") + col("pb")) / 2.0)
      .agg(max(col("v")).as("vocab"),
        max(col("na")).as("tokens_a"), max(col("nb")).as("tokens_b"),
        round(sum(col("pa") * log(col("pa") / col("pb"))), 6).as("kl_ab"),
        round(sum(col("pb") * log(col("pb") / col("pa"))), 6).as("kl_ba"),
        round(sum(col("pa") * log(col("pa") / col("pm")) / 2.0 +
                  col("pb") * log(col("pb") / col("pm")) / 2.0), 6).as("js_divergence"))
  }

  /** Vocabulary coverage curve: what fraction of all token occurrences the
    * top-k vocabulary entries cover, at fixed k checkpoints — the
    * tokenizer-budget question (how big a vocab before coverage plateaus).
    * Only the top `max(ks)` vocabulary rows are consumed, so the cut is a
    * distributed `orderBy(...).limit(...)` (TakeOrderedAndProject, the q17
    * plan) BEFORE any window — the rank + running-sum window then runs over
    * the ≤ `max(ks)`-row survivor table, never the full vocabulary. The
    * occurrence total still aggregates the full table (map-side-combinable
    * sum, no window). */
  def vocabCoverage(documents: DataFrame, ks: Seq[Int] = Seq(1, 2, 4, 8, 16, 24, 31)): DataFrame = {
    val freq = documents.select(explode(toks).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
    val w = Window.orderBy(col("freq").desc, col("token"))
    val ranked = freq
      .orderBy(col("freq").desc, col("token")).limit(ks.max)
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("freq")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val total = freq.agg(sum(col("freq")).as("total"))
    val kdf = documents.sparkSession.createDataFrame(ks.map(Tuple1(_))).toDF("k")
      .select(col("k").cast("long").as("k"))
    ranked.join(broadcast(kdf), col("rk") <= col("k"))
      .groupBy(col("k"))
      .agg(max(col("cum")).as("covered"), count(lit(1)).as("vocab_used"))
      .crossJoin(broadcast(total))
      .withColumn("coverage_pct", round(col("covered") * 100.0 / col("total"), 4))
      .select(col("k"), col("vocab_used"), col("covered"), col("coverage_pct"))
      .orderBy("k")
  }

  /** Context-window chunking: split each document into overlapping
    * `chunkTokens`-token windows every `stride` tokens (the chunk shape an
    * embedding/RAG indexer feeds a context-limited model). Pure generator
    * expansion (`sequence` + slice arithmetic) — per-doc, no shuffle beyond
    * the final per-doc accounting. */
  def chunkPlan(documents: DataFrame, chunkTokens: Int = 32, stride: Int = 24): DataFrame =
    documents
      .withColumn("n_tok", size(toks).cast("long"))
      .select(col("doc_id"), col("n_tok"),
        explode(expr(s"sequence(1L, greatest(n_tok - $chunkTokens + $stride, 1L), ${stride}L)")).as("start"))
      .withColumn("chunk_len", least(lit(chunkTokens.toLong), col("n_tok") - col("start") + 1L))
      .filter(col("chunk_len") > 0)
      .groupBy(col("doc_id"), col("n_tok"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("chunk_len")).as("chunked_tokens"),
        min(col("chunk_len")).as("min_chunk_len"))
      .withColumn("overlap_tokens", col("chunked_tokens") - col("n_tok"))
      .orderBy("doc_id")

  /** Sequence packing (concat-then-chunk): lay all documents end-to-end in
    * doc_id order on a global token axis and cut fixed `seqTokens`-token
    * training sequences — the batch-prep step that turns a ragged corpus
    * into equal-length model inputs with zero padding (only the tail
    * sequence can run short). Per sequence: docs touched, token count, docs
    * split across a boundary, and the largest single-doc contribution (the
    * attention-contamination diagnostic — how much of a window one document
    * dominates).
    *
    * The global token offset is a distributed two-phase prefix sum
    * (`plans.PrefixSum`), not a single-partition window, and each doc
    * explodes into only the ⌈n_tok/seqTokens⌉+1 sequences it overlaps, so
    * the whole plan is one bounded-fan-out shuffle keyed by seq_id at any
    * corpus size. */
  def packPlan(documents: DataFrame, seqTokens: Int = 512): DataFrame = {
    val B = seqTokens.toLong
    val d = documents
      .withColumn("n_tok",
        when(length(trim(col("text"))) === 0, 0L).otherwise(size(toks).cast("long")))
      .filter(col("n_tok") > 0)
      .select(col("doc_id"), col("n_tok"))
    graft.plans.PrefixSum.prefixSum(d, "doc_id", "n_tok", "cum")
      .withColumn("st", col("cum") - col("n_tok"))
      .withColumn("en", col("cum") - 1L)
      .withColumn("seq_id", explode(expr(s"sequence(st div $B, en div $B)")))
      .withColumn("tok_in_seq",
        least(col("en"), (col("seq_id") + 1L) * B - 1L) - greatest(col("st"), col("seq_id") * B) + 1L)
      .withColumn("split_doc",
        (col("st") < col("seq_id") * B) || (col("en") > (col("seq_id") + 1L) * B - 1L))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok_in_seq")).as("seq_tokens"),
        sum(when(col("split_doc"), 1L).otherwise(0L)).as("n_split_docs"),
        max(col("tok_in_seq")).as("max_doc_tokens"))
      .orderBy("seq_id")
  }

  /** Deterministic epoch-shuffle shard plan: each training epoch reassigns
    * every document to one of `nShards` shards by a seeded hash (the global
    * shuffle a data loader needs reproducibly at 100 TB — no sort, no RNG
    * state, any worker can recompute any assignment). Per (epoch, shard):
    * docs, tokens, token deviation from the ideal balance, and how many
    * docs stayed in the same shard as the previous epoch (≈ 1/nShards when
    * the reshuffle actually decorrelates epochs).
    *
    * The doc id is range-reduced mod the hash prime BEFORE the multiply so
    * the product stays < 2^63 for any 64-bit id (the ANSI-overflow rule the
    * dedup hashTid path documents). Pure hash partitioning: the heavy side
    * is one explode × nEpochs and two hash aggregations; the epoch×shard
    * spine is a LEFT JOIN so empty cells survive at any SF. */
  def shardPlan(documents: DataFrame, nShards: Int = 8, nEpochs: Int = 3): DataFrame = {
    val P = 1000003L
    val session = documents.sparkSession
    val d = documents
      .withColumn("n_tok",
        when(length(trim(col("text"))) === 0, 0L).otherwise(size(toks).cast("long")))
      .select(col("doc_id"), col("n_tok"))
    val assign = d
      .select(col("doc_id"), col("n_tok"),
        explode(expr(s"sequence(0L, ${nEpochs - 1}L)")).as("epoch"))
      .withColumn("shard",
        (((col("doc_id") % P) * 2654435761L + col("epoch") * 40503L) % P) % nShards)
    val prev = assign.select(col("doc_id"), (col("epoch") + 1L).as("epoch"),
      col("shard").as("pshard"))
    val cells = assign.join(prev, Seq("doc_id", "epoch"), "left")
      .groupBy(col("epoch"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"),
        sum(when(col("pshard") === col("shard"), 1L)).as("stayed_docs"))
    val tot = cells.groupBy(col("epoch")).agg(sum(col("tokens")).as("etotal"))
    val spine = session.range(nEpochs).select(col("id").as("epoch"))
      .crossJoin(session.range(nShards).select(col("id").as("shard")))
    spine.join(cells, Seq("epoch", "shard"), "left")
      .join(broadcast(tot), Seq("epoch"))
      .select(col("epoch"), col("shard"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("tokens"), lit(0L)).as("tokens"),
        col("stayed_docs"),
        round((coalesce(col("tokens"), lit(0L)).cast("double") * nShards / col("etotal") - 1.0) * 100.0, 4)
          .as("dev_pct"))
      .orderBy("epoch", "shard")
  }

  /** Temperature-based source-mixing plan: sampling weights w_i ∝ n_i^α per
    * language (source) for α ∈ {¼, ½, ¾, 1} — the data-mixture planner that
    * trades corpus-proportional sampling (α=1) against uniform (α→0),
    * reported as the weight share and the up/down-sampling boost each source
    * gets. The only corpus-sized work is one token-count aggregation; the
    * mixing table itself is |sources| × |alphas| rows.
    *
    * Determinism contract: n^α is computed ONLY from sqrt compositions
    * (n^¼ = √√n, n^¾ = √n·√√n) because IEEE 754 guarantees correctly-rounded
    * sqrt on both engines while `pow` carries no such guarantee (a last-ulp
    * divergence would flake the hash). Weights are normalized by the
    * per-alpha max then quantized to 1e-9 integers, so the normalizing sums
    * are exact integer sums bounded by |sources|·1e9 regardless of corpus
    * size (no n·1e6 long overflow at 100 TB). */
  def mixPlan(documents: DataFrame): DataFrame = {
    val session = documents.sparkSession
    val n = documents
      .withColumn("n_tok",
        when(length(trim(col("text"))) === 0, 0L).otherwise(size(toks).cast("long")))
      .groupBy(col("lang")).agg(sum(col("n_tok")).as("n_tokens"))
    val alphas = session.createDataFrame(Seq(0.25, 0.5, 0.75, 1.0).map(Tuple1(_))).toDF("alpha")
    val s = n.crossJoin(broadcast(alphas))
      .withColumn("nd", col("n_tokens").cast("double"))
      .withColumn("sv",
        when(col("alpha") === 1.0, col("nd"))
          .when(col("alpha") === 0.75, sqrt(col("nd")) * sqrt(sqrt(col("nd"))))
          .when(col("alpha") === 0.5, sqrt(col("nd")))
          .otherwise(sqrt(sqrt(col("nd")))))
    val m = s.groupBy(col("alpha")).agg(max(col("sv")).as("s_max"))
    val qt = s.join(broadcast(m), Seq("alpha"))
      .withColumn("s_q", round(col("sv") / col("s_max") * 1e9, 0).cast("long"))
    val tot = qt.groupBy(col("alpha"))
      .agg(sum(col("s_q")).as("s_tot"), sum(col("n_tokens")).as("n_tot"))
    qt.join(broadcast(tot), Seq("alpha"))
      .select(col("alpha"), col("lang"), col("n_tokens"),
        round(col("s_q") * 100.0 / col("s_tot"), 6).as("weight_pct"),
        round((col("s_q").cast("double") / col("s_tot")) *
          (col("n_tot").cast("double") / col("n_tokens")), 6).as("boost_x"))
      .orderBy("alpha", "lang")
  }

  /** Quality-budget selection curve: for each keep-fraction target (10…90%
    * of docs), the highest quality cutoff that retains at least that many
    * documents, and the token yield at that cutoff — the "filter the corpus
    * down to a training budget" planner. Selection runs entirely on the
    * quantized-quality histogram: quality is already 6-dp rounded, so
    * grouping by `round(quality·1e6)` loses nothing and bounds every
    * downstream structure at ≤1e6+1 rows regardless of corpus size. The
    * descending cumulative over that histogram is a two-phase
    * `plans.PrefixSum` (key = 1e6 − qi), not a corpus window, and the
    * threshold pick is a broadcast range-join of the 5-row target spine
    * against the bounded cumulative table. */
  def qualityBudget(documents: DataFrame, keepPcts: Seq[Int] = Seq(10, 25, 50, 75, 90)): DataFrame = {
    val session = documents.sparkSession
    val d = qualityWithTokens(documents)
      .select(col("doc_id"), col("quality"), col("n_tok"))
      .withColumn("qi", round(col("quality") * 1e6, 0).cast("long"))
    // Checkpoint the ≤1e6+1-row histogram: PrefixSum's offsets/main branches
    // both reference their input, so without the cut the corpus-level
    // tokenize+score lineage would execute once per branch.
    val hist = d.groupBy(col("qi")).agg(count(lit(1)).as("n"), sum(col("n_tok")).as("tok"))
      .withColumn("negq", lit(1000000L) - col("qi"))
      .stableCheckpoint()
    val cum = graft.plans.PrefixSum.prefixSums(hist, "negq",
        Seq("n" -> "cum_docs", "tok" -> "cum_tok"))
      .select(col("qi"), col("cum_docs"), col("cum_tok"))
    // Totals from the checkpointed histogram (Σn, Σtok), not from d — a
    // second reference to d would re-run the corpus tokenize+score lineage.
    val tot = hist.groupBy().agg(sum(col("n")).as("n_docs"), sum(col("tok")).as("n_toks"))
    val spine = session.createDataFrame(keepPcts.map(Tuple1(_))).toDF("p")
      .select(col("p").cast("long").as("keep_pct"))
    spine.crossJoin(broadcast(tot))
      .withColumn("target", expr("(n_docs * keep_pct + 99) div 100"))
      .join(broadcast(cum), col("cum_docs") >= col("target"))
      .groupBy(col("keep_pct"), col("target"), col("n_toks"))
      .agg(max(struct(col("qi"), col("cum_docs"), col("cum_tok"))).as("cut"))
      .select(col("keep_pct"),
        round(col("cut.qi") / 1e6, 6).as("cutoff_quality"),
        col("cut.cum_docs").as("docs_kept"),
        col("target").as("docs_target"),
        col("cut.cum_tok").as("tokens_kept"),
        round(col("cut.cum_tok") * 100.0 / col("n_toks"), 4).as("tokens_pct"))
      .orderBy("keep_pct")
  }

  /** End-to-end corpus-prep funnel: the canonical training-data pipeline
    * (quality cascade → exact dedup → MinHash near-dedup) run as ONE
    * composition, reporting docs/tokens surviving each stage and the yield
    * against the raw corpus — the stage-attrition report every dataset card
    * publishes. Each stage reuses the library operator it names (the C4-style
    * cascade rules, `Dedup.exact`'s sorted-distinct-token signature,
    * `Components.minhashComponents` on the survivor set — vocabulary and
    * signatures rebuilt over survivors on both engines), so the funnel also
    * proves the operators compose: the near-dedup stage is the same banded,
    * signature-group-level pipeline with no O(n²) path, and every stage
    * output is a doc-id set driving one hash join. */
  def pipelineFunnel(documents: DataFrame, minTokens: Int = 20, maxTokens: Int = 500,
                     minTtr: Double = 0.2, maxTopShare: Double = 0.2): DataFrame = {
    // stats feeds six consumers (four stage rows, the raw totals, the
    // cascade) — materialize once or Spark re-tokenizes the corpus per
    // branch. One row per doc, values unchanged by the checkpoint.
    val stats = documents
      .select(col("doc_id"), explode(toks).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"), max(col("c")).as("top_c"))
      .stableCheckpoint()
    val k1 = stats.filter(
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens &&
        col("n_types") * 1.0 / col("n_tokens") >= minTtr &&
        col("top_c") * 1.0 / col("n_tokens") <= maxTopShare)
      .select(col("doc_id"), col("n_tokens"))
    val d1 = documents.join(k1.select("doc_id"), "doc_id")
    // k2's sorted-distinct-signature groupBy is the funnel's second
    // corpus-grain tokenization and feeds TWO branches (the near-dedup
    // input d2 and its own stage row) — checkpoint the surviving id set
    // (8 bytes/doc) so it runs once. d2 then joins documents directly:
    // k2 ⊆ k1 by construction (every k2 id is a d1 member), so the
    // documents ⋈ k2 rows are exactly the d1 ⋈ k2 rows without
    // re-deriving the quality join per consumer.
    val k2 = d1.withColumn("sig", array_join(array_sort(array_distinct(toks)), " "))
      .groupBy(col("sig")).agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
      .stableCheckpoint()
    val d2 = documents.join(k2, "doc_id")
    val k3 = graft.dedup.Components.minhashComponents(d2)
      .filter(col("doc_id") === col("comp"))
      .select("doc_id")
    def stageRow(stage: String, ids: DataFrame) =
      ids.join(stats, "doc_id")
        .agg(coalesce(count(lit(1)), lit(0L)).as("n_docs"),
          coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"))
        .select(lit(stage).as("stage"), col("n_docs"), col("n_tokens"))
    val rows = stageRow("0_raw", stats.select("doc_id"))
      .union(stageRow("1_quality", k1.select("doc_id")))
      .union(stageRow("2_exact_dedup", k2))
      .union(stageRow("3_near_dedup", k3))
    val tot = stats.agg(count(lit(1)).as("raw_docs"), sum(col("n_tokens")).as("raw_tokens"))
    rows.crossJoin(broadcast(tot))
      .select(col("stage"), col("n_docs"), col("n_tokens"),
        round(col("n_docs") * 100.0 / col("raw_docs"), 4).as("pct_docs"),
        round(col("n_tokens") * 100.0 / col("raw_tokens"), 4).as("pct_tokens"))
      .orderBy("stage")
  }

  /** Boilerplate phrase mining: 5-gram shingles that recur across many
    * documents (headers, footers, templates — what a cleaning pipeline
    * strips before training). Inverted-index shape: distinct (doc, shingle)
    * → document frequency → top recurring phrases. */
  def boilerplate(documents: DataFrame, minDf: Long = 2L, topN: Int = 20): DataFrame = {
    val sh = documents
      .withColumn("t", toks)
      .select(col("doc_id"), explode(expr(
        "filter(transform(t, (x, i) -> CASE WHEN i + 4 < size(t) THEN concat(x, ' ', t[i+1], ' ', t[i+2], ' ', t[i+3], ' ', t[i+4]) END), y -> y IS NOT NULL)"))
        .as("phrase"))
    val perDoc = sh.distinct()
    perDoc.groupBy(col("phrase")).agg(count(lit(1)).as("df"))
      .join(sh.groupBy(col("phrase")).agg(count(lit(1)).as("occurrences")), "phrase")
      .filter(col("df") >= minDf)
      .select(col("phrase"), col("df"), col("occurrences"))
      .orderBy(col("df").desc, col("phrase"))
      .limit(topN)
  }

  /** Heaps'-law fit: vocabulary growth V(n) ≈ K·n^β over the corpus read in
    * doc_id order. Each token contributes at its *first* document (min
    * doc_id), and the growth curve is evaluated at `checkpoints` fixed
    * prefix points (broadcast non-equi join + re-aggregate) — never a global
    * running window over the doc spine, so the shape survives a
    * billion-document corpus. β/K come from one regr fit in log space. */
  def heapsLaw(documents: DataFrame, checkpoints: Int = 32): DataFrame = {
    val tok = documents.select(col("doc_id"), explode(toks).as("token"))
    val perDoc = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tok"))
    val firstDoc = tok.groupBy(col("token")).agg(min(col("doc_id")).as("first_doc"))
    val maxDoc = documents.agg(max(col("doc_id")).as("maxdoc"))
    val cp = documents.sparkSession.range(1, checkpoints + 1)
      .crossJoin(broadcast(maxDoc))
      .select(floor(col("id") * col("maxdoc") / checkpoints).cast("long").as("cp"))
      .distinct()
    val cumTok = perDoc.join(broadcast(cp), col("doc_id") <= col("cp"))
      .groupBy(col("cp")).agg(sum(col("n_tok")).as("cum_tokens"))
    val cumVocab = firstDoc.join(broadcast(cp), col("first_doc") <= col("cp"))
      .groupBy(col("cp")).agg(count(lit(1)).as("cum_vocab"))
    cumTok.join(cumVocab, "cp")
      .agg(count(lit(1)).as("n_points"),
        max(col("cum_tokens")).as("corpus_tokens"),
        max(col("cum_vocab")).as("corpus_vocab"),
        (round(expr("regr_slope(ln(cum_vocab), ln(cum_tokens))"), 6) + lit(0.0)).as("heaps_beta"),
        round(exp(expr("regr_intercept(ln(cum_vocab), ln(cum_tokens))")), 6).as("heaps_k"))
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-Res):
    * pick `k` documents with probability proportional to a weight — here
    * n_chars, standing in for a quality/importance score — the curation
    * step that upsamples high-value text when assembling a training mix.
    * Each doc gets key ln(u)/w for a DETERMINISTIC uniform u (the q47
    * multiplicative-hash grid + half-offset — reproducible across runs and
    * engines, no RNG state); the global top-k keys are the sample. The
    * top-k is a TakeOrderedAndProject (distributed heap, no global sort);
    * keys are rounded to 12 dp with a doc_id tie-break so the selection is
    * engine-stable (ln's last-ulp wiggle is ~1e-20 against a 1e-12 grid). */
  def weightedSample(documents: DataFrame, k: Int = 50): DataFrame = {
    val sampled = documents
      .withColumn("u", ((col("doc_id") % 1000003L) * 2654435761L % 10000L + 0.5) / 10000.0)
      .withColumn("ares_key", round(log(col("u")) / col("n_chars"), 12))
      .orderBy(col("ares_key").desc, col("doc_id"))
      .limit(k)
    sampled
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("ares_key").desc, col("doc_id"))).cast("long")) // ≤ k rows
      .select(col("rk"), col("doc_id"), col("n_chars"), col("ares_key"))
      .orderBy("rk")
  }

  /** Flesch-style readability per document: words from the shared
    * whitespace tokenizer, sentences and syllables from simple regex counts
    * (terminal-punctuation runs; vowel-group runs as the classic syllable
    * proxy — no dictionary). Because the coefficients are decimal
    * rationals, the TRUE score can land exactly on a 4-dp half
    * (e.g. 25.22625), where double `round` is engine-dependent (Spark
    * consults the decimal repr, DuckDB the binary value — observed
    * diverging at sf0.1). So the 4-dp rounding is done on the EXACT
    * integer-scaled rational: numerator/denominator in int64 over the
    * common denominator s·w, half-away-from-zero by integer division,
    * final value = integer / 10⁴ — bit-identical on any engine. Headroom:
    * the numerators stay under 2⁶³ past 10⁶-token documents. Row-local
    * narrow map, no shuffle at all. */
  def readability(documents: DataFrame): DataFrame =
    documents
      .withColumn("n_words", size(toks).cast("long"))
      .filter(col("n_words") > 0L)
      .withColumn("n_sentences",
        greatest(size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))).cast("long"), lit(1L)))
      .withColumn("n_syllables",
        size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0))).cast("long"))
      // ×10⁴-scaled exact numerators over den = s·w:
      //   flesch = 206.835 − 1.015·w/s − 84.6·sy/w
      //   fk     = 0.39·w/s + 11.8·sy/w − 15.59
      .withColumn("den", col("n_sentences") * col("n_words"))
      .withColumn("fe_num", lit(2068350L) * col("den")
        - lit(10150L) * col("n_words") * col("n_words")
        - lit(846000L) * col("n_syllables") * col("n_sentences"))
      .withColumn("fk_num", lit(3900L) * col("n_words") * col("n_words")
        + lit(118000L) * col("n_syllables") * col("n_sentences")
        - lit(155900L) * col("den"))
      .withColumn("flesch_ease", expr(
        "CASE WHEN fe_num >= 0 THEN (2 * fe_num + den) div (2 * den) " +
          "ELSE -((2 * -fe_num + den) div (2 * den)) END") / 10000.0)
      .withColumn("fk_grade", expr(
        "CASE WHEN fk_num >= 0 THEN (2 * fk_num + den) div (2 * den) " +
          "ELSE -((2 * -fk_num + den) div (2 * den)) END") / 10000.0)
      .select("doc_id", "n_words", "n_sentences", "n_syllables", "flesch_ease", "fk_grade")
      .orderBy("doc_id")

  /** PII pattern classes shared verbatim with the `text_pii_scan` oracle
    * SQL (both engines' regex dialects — Java here, RE2 in DuckDB — agree
    * on this common subset: classes, `\\b`, bounded repetition). Regex-only
    * detection, the Dolma/CCNet redaction-pass shape; no checksum
    * validation (a Luhn pass would be a downstream filter). */
  val PiiClasses: Seq[(String, String)] = Seq(
    "cc16" -> "\\b\\d{13,16}\\b",
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4" -> "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b",
    "phone" -> "\\+\\d{7,15}",
    "ssn" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b")

  /** PII scan — the redaction pre-pass every public-corpus pipeline runs
    * before release: count matches of the [[PiiClasses]] regexes per
    * document, roll up to (source, class) grain with docs-hit and total-hit
    * counts. ONE parquet scan computes all five counters as codegen'd
    * columns; the class axis unfolds from a per-row 5-struct array, so
    * every (source, class) cell exists in the output and absent PII shows
    * as an explicit zero (this synthetic corpus matches nothing — the
    * firing path is spec-proved on planted PII rows, the mm_magic_bytes
    * pattern). Scale: linear scan + one map-side-combinable aggregation;
    * the regexes are the per-row cost, exactly as in production. */
  def piiScan(documents: DataFrame): DataFrame = {
    val counted = documents.select(
      col("source") +: PiiClasses.map { case (nm, re) =>
        size(regexp_extract_all(col("text"), lit(re), lit(0))).cast("long").as(nm)
      }: _*)
    counted
      .select(col("source"), explode(array(PiiClasses.map { case (nm, _) =>
        struct(lit(nm).as("pii_class"), col(nm).as("hits"))
      }: _*)).as("s"))
      .groupBy(col("source"), col("s.pii_class").as("pii_class"))
      .agg(sum(when(col("s.hits") > 0, 1L).otherwise(0L)).as("docs_hit"),
        sum(col("s.hits")).as("n_hits"))
      .orderBy("source", "pii_class")
  }

  /** Stupid-backoff trigram LM scoring (Brants et al. 2007 — "Large
    * Language Models in Machine Translation", THE web-scale LM recipe:
    * no discounting, a fixed 0.4 backoff multiplier, count ratios only) —
    * with a real train/eval doc split so the scores are out-of-sample:
    * even doc ids build the trigram/bigram/unigram tables, odd docs are
    * scored. S(w|w₁w₂) = c₃/c₂(w₁w₂), else 0.4·c₂(w₂w)/c₁(w₂), else
    * 0.4²·c₁(w)/N, else the 0.4²/N OOV floor. All scores are ratios of
    * exact integers (identical doubles on both engines); per-token log₁₀
    * rounds at 12 dp before the per-doc mean (the entropy/PMI summation
    * convention), mean at 6 dp. Scale: n-gram tables are hash aggregations
    * (n-gram-TYPE bounded, Heaps-sublinear in corpus size) BROADCAST
    * against the token stream — the bare w2/token join keys are
    * Zipf-skewed, so a shuffle join there concentrates the hot partition
    * super-linearly while a broadcast keeps the eval stream shuffle-free
    * (the [[perplexityBuckets]] convention); the scalar N broadcasts. The
    * per-doc mean log-score is the quality signal CCNet buckets on — this
    * is its n-gram-LM incarnation. */
  def lmBackoffScore(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val tok = documents
      .select(col("doc_id"), posexplode(toks).as(Seq("pos0", "token")))
      .withColumn("pos", col("pos0").cast("long") + 1)
      .withColumn("w2", lag(col("token"), 1).over(w))
      .withColumn("w1", lag(col("token"), 2).over(w))
    val train = tok.filter(col("doc_id") % 2 === 0)
    // ONE corpus count pass: the (w1, w2, token) table with NULLABLE
    // context keys (boundary tokens keep their rows) rolls up exactly to
    // the old per-order tables — c3 is its w1-non-null slice, c2 the
    // (w2, token) sum over w2-non-null rows, c1/N plain sums — so every
    // count is the identical integer. Checkpointing it (trigram-TYPE
    // bounded, Heaps-sublinear) stops the train-side window explode
    // re-running per derived table (the before plan re-ran the corpus
    // posexplode+lag window once each for c3/c2/c1/N).
    val gb3 = train.groupBy(col("w1"), col("w2"), col("token"))
      .agg(count(lit(1)).as("c3")).stableCheckpoint()
    val c3 = gb3.filter(col("w1").isNotNull)
    val c2 = gb3.filter(col("w2").isNotNull)
      .groupBy(col("w2").as("b1"), col("token").as("b2")).agg(sum(col("c3")).as("c2"))
    val c1 = gb3.groupBy(col("token").as("u")).agg(sum(col("c3")).as("c1"))
    val n = gb3.agg(sum(col("c3")).as("n_train"))
    tok.filter(col("doc_id") % 2 === 1 && col("w1").isNotNull)
      .join(lmCounts(c3, documents), Seq("w1", "w2", "token"), "left")
      .join(lmCounts(c2.select(col("b1").as("w1"), col("b2").as("w2"), col("c2").as("c2ctx")), documents),
        Seq("w1", "w2"), "left")
      .join(lmCounts(c2.select(col("b1").as("w2"), col("b2").as("token"), col("c2").as("c2bo")), documents),
        Seq("w2", "token"), "left")
      .join(lmCounts(c1.select(col("u").as("w2"), col("c1").as("c1ctx")), documents), Seq("w2"), "left")
      .join(lmCounts(c1.select(col("u").as("token"), col("c1").as("c1w")), documents), Seq("token"), "left")
      .crossJoin(broadcast(n))
      .withColumn("score",
        when(col("c3").isNotNull, col("c3") * 1.0 / col("c2ctx"))
          .when(col("c2bo").isNotNull, lit(0.4) * col("c2bo") / col("c1ctx"))
          .when(col("c1w").isNotNull, lit(0.16) * col("c1w") / col("n_train"))
          .otherwise(lit(0.16) / col("n_train")))
      .withColumn("lg", round(log10(col("score")), 12))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_scored"), round(avg(col("lg")), 6).as("avg_log10"))
      .orderBy("doc_id")
  }

  /** Interpolated Kneser–Ney bigram LM scoring (Kneser & Ney 1995, the
    * Chen & Goodman 1999 interpolated form with a single absolute discount
    * D = 0.75 — the smoothing every n-gram toolkit defaults to, and the
    * methodological counterpart of [[lmBackoffScore]]'s web-scale stupid
    * backoff): the lower-order distribution is the CONTINUATION
    * probability, not raw unigram frequency — the fix for the "San
    * Francisco" pathology (seeing "Francisco" often teaches you nothing
    * about P(Francisco | novel context), because it only ever follows
    * "San").
    *
    * Same out-of-sample protocol as lm_backoff: even docs train, odd docs
    * score. With exact integer counts (T = distinct train bigram types,
    * N1+(·w) = contexts w follows, N1+(u·) = continuations of u):
    *  - Pcont(w) = N1+(·w)/T, floored at 1/T for OOV w;
    *  - seen context u: P(w|u) = max(c2(u,w)−D, 0)/c1(u)
    *      + D·N1+(u·)/c1(u) · Pcont(w);
    *  - unseen context: P(w|u) = Pcont(w).
    * Every term is a ratio of exact integers with the literal D, so both
    * engines evaluate identical doubles; per-token log₁₀ rounds at 12 dp
    * before the 6-dp per-doc mean (the summation convention). Scale:
    * bigram/continuation tables are hash aggregations (type-bounded,
    * Heaps-sublinear) BROADCAST against the eval token stream — the bare
    * u/token keys are Zipf-skewed, so shuffle joins there grow a hot
    * partition super-linearly (the [[perplexityBuckets]] convention);
    * the scalar T broadcasts. */
  def kneserNeyScore(documents: DataFrame): DataFrame = {
    val D = 0.75
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val tok = documents
      .select(col("doc_id"), posexplode(toks).as(Seq("pos0", "token")))
      .withColumn("pos", col("pos0").cast("long") + 1)
      .withColumn("u", lag(col("token"), 1).over(w))
    val train = tok.filter(col("doc_id") % 2 === 0 && col("u").isNotNull)
    // c2 is the one corpus-grain count pass and every other table (c1,
    // continuation counts, T) derives from it — cut it so the train-side
    // window explode runs once (bigram-TYPE bounded).
    val c2 = train.groupBy(col("u"), col("token")).agg(count(lit(1)).as("c2"))
      .stableCheckpoint()
    val c1 = c2.groupBy(col("u"))
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1p_right"))
    val cont = c2.groupBy(col("token")).agg(count(lit(1)).as("n1p_left"))
    val t = c2.agg(count(lit(1)).as("t_types"))
    tok.filter(col("doc_id") % 2 === 1 && col("u").isNotNull)
      .join(lmCounts(c2, documents), Seq("u", "token"), "left")
      .join(lmCounts(c1, documents), Seq("u"), "left")
      .join(lmCounts(cont, documents), Seq("token"), "left")
      .crossJoin(broadcast(t))
      .withColumn("pcont",
        coalesce(col("n1p_left"), lit(1L)) * 1.0 / col("t_types"))
      .withColumn("score",
        when(col("c1").isNotNull,
          greatest(coalesce(col("c2"), lit(0L)) - lit(D), lit(0.0)) / col("c1") +
            lit(D) * col("n1p_right") / col("c1") * col("pcont"))
          .otherwise(col("pcont")))
      .withColumn("lg", round(log10(col("score")), 12))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_scored"), round(avg(col("lg")), 6).as("avg_log10"))
      .orderBy("doc_id")
  }
}
