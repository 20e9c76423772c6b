package graft.dedup

import graft.plans.Checkpoints._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over the near-duplicate pair graph (SURVEY.md §2.3):
  * turns pairwise matches into dedup clusters, assigning every doc the
  * minimum doc_id reachable from it.
  *
  * Algorithm: min-label propagation (the standard large-graph CC shape, cf.
  * GraphX/Pregel) — each iteration every node takes the min of its own label
  * and its neighbours' labels; converges in ≤ graph-diameter iterations.
  * Near-dup graphs have tiny diameters, so a handful of join+groupBy rounds
  * suffice at any scale. `localCheckpoint` truncates lineage between rounds
  * (iterative DataFrame loops otherwise stack plans); the per-round
  * convergence count is the one intentional driver-side action.
  */
object Components {

  /** Min-label propagation steps folded into ONE plan per convergence
    * check (guide §2: the loop's cost at high core counts was driver
    * round-trips — every iteration paid an eager checkpoint action plus a
    * count action, serial by construction). Batching `stepsPerCheck`
    * propagation steps between checks halves the actions for the same
    * converged labels: propagation is monotone (labels only decrease) and
    * idempotent at the fixpoint, so extra steps past convergence are
    * no-ops, and a batch with zero label changes proves the fixpoint
    * exactly as a single unchanged step did. 4 steps per check: the
    * sf0.1 corpus' group graph converges in ~8 steps (measured — chained
    * near-dups, not just cliques), so 4 cuts the eager checkpoint+probe
    * actions ~3× versus per-step checks while wasting at most 2k−1
    * propagation passes over already-converged labels per run. */
  private val StepsPerCheck = 4

  /** @param nodes node ids as a `doc_id` column (isolated nodes form
    *              singleton components)
    * @param pairs undirected edges as (doc_a, doc_b)
    * @param maxIter max convergence CHECKS (each [[StepsPerCheck]] steps) */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // Once-variants: when pairs/nodes are already checkpoint artifacts
    // (the minhashGroups path hands in checkpointed group tables), the
    // union/projection re-reads cached blocks per step — a dedicated
    // re-cut would only add an eager action (and its AQE stage jobs) to
    // the funnel's driver-job bill.
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .stableCheckpointOnce()
    var labels = nodes.select(col("doc_id").as("id")).withColumn("comp", col("id"))
      .stableCheckpointOnce()
    def step(l: DataFrame): DataFrame = {
      val neigh = edges
        .join(l.select(col("id").as("nid"), col("comp").as("ncomp0")), col("dst") === col("nid"))
        .groupBy(col("src")).agg(min(col("ncomp0")).as("ncomp"))
      l.join(neigh, col("id") === col("src"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"),
          col("comp0"))
    }
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // comp0 rides through the batch so the changed test is one
      // comp < comp0 filter on the checkpointed result — labels are
      // monotone non-increasing, so "changed anywhere in the batch" is
      // exactly "strictly below the batch's starting label".
      var updated = labels.withColumn("comp0", col("comp"))
      for (_ <- 0 until StepsPerCheck) updated = step(updated)
      val batch = updated.stableCheckpoint()
      // isEmpty (limit-1 over the materialized blocks), not count(): the
      // convergence probe only needs existence, and the early-out keeps
      // the per-batch driver action minimal.
      val changed = !batch.filter(col("comp") < col("comp0")).isEmpty
      labels = batch.select(col("id"), col("comp"))
      converged = !changed
      iter += 1
    }
    labels.select(col("id").as("doc_id"), col("comp")).orderBy("doc_id")
  }

  /** Dedup clusters of the MinHash near-dup graph: per-doc component
    * assignment (comp = min doc_id of the cluster).
    *
    * Runs label propagation on the *signature-group* graph (docs with
    * identical MinHash signatures are one node — see Dedup.minhashGroups)
    * and expands group components back to docs at the end. Equivalent to
    * doc-level CC: same-group docs form a clique (est 1.0 edges) so they
    * always share a component, and each group's node id is its min doc_id,
    * so the propagated min label is the min reachable doc_id. Collapsing
    * 5000 docs / 1.4M edges to 2256 groups / 4.3k edges makes every
    * iteration a small-table join. */
  /** Cluster-size histogram over the MinHash components: how many dedup
    * clusters exist at each size (size 1 = unique docs). The downstream
    * "how much would dedup shrink the corpus" report. */
  def clusterSizeHistogram(documents: DataFrame): DataFrame =
    minhashComponents(documents)
      .groupBy(col("comp"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .orderBy("cluster_size")

  /** Canonical selection — the step that turns clusters into an actual
    * deduplicated corpus: per MinHash component keep the member with the
    * highest quality score (ties → lowest doc_id) and account for what gets
    * dropped. The ranking window partitions by component (high-cardinality),
    * and quality ranks on the 6-dp-rounded score so the tie-break is
    * identical in the DuckDB oracle. */
  def keepBest(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val comps = minhashComponents(documents)
    val qual = graft.text.TextAnalysis.qualityScore(documents)
      .select(col("doc_id"), col("quality"))
    val w = Window.partitionBy(col("comp")).orderBy(col("quality").desc, col("doc_id"))
    comps.join(qual, Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .groupBy(col("comp"))
      .agg(count(lit(1)).as("cluster_size"),
        min(when(col("rk") === 1, col("doc_id"))).as("kept_doc"),
        min(when(col("rk") === 1, col("quality"))).as("kept_quality"),
        (count(lit(1)) - 1).as("n_removed"))
      .orderBy("comp")
  }

  /** Train/val/test split with a near-duplicate leakage audit: every doc is
    * assigned a deterministic hash bucket (90/5/5 by default — any worker
    * can recompute any assignment, no RNG state), then a doc is *leaky* if
    * its MinHash dedup component straddles a split boundary — the
    * train/test contamination that inflates eval scores when near-dups of
    * training docs land in the test set. Per split: docs, leaky docs, leak
    * rate. The doc id is range-reduced mod the hash prime before the
    * multiply (ANSI-overflow rule); the component labels are the memoized
    * corpus-wide propagation, so the audit itself is two hash aggregations
    * and one broadcast-size join on the component key. */
  def splitLeakage(documents: DataFrame, trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val P = 1000003L
    val assigned = minhashComponents(documents)
      .withColumn("bucket", ((col("doc_id") % P) * 2654435761L % P) % 100L)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
    val compSplits = assigned.groupBy(col("comp"))
      .agg(countDistinct(col("split")).as("n_splits"))
    assigned.join(compSplits, "comp")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_splits") > 1, 1L).otherwise(0L)).as("leaky_docs"))
      .withColumn("leaky_pct", round(col("leaky_docs") * 100.0 / col("n_docs"), 4))
      .orderBy("split")
  }

  def minhashComponents(documents: DataFrame): DataFrame =
    // The label-propagation rounds are the slowest part of the dedup family
    // and feed two queries (components, keep-best) — memoize the converged
    // per-doc labels (checkpointed; the ordering is re-applied per caller).
    graft.plans.Memo.memoize(documents, "dedup.components") {
      val g = Dedup.minhashGroups(documents)
      val comps = connectedComponents(
        g.groups.select(col("gid").as("doc_id")),
        g.crossQual.select(col("ga").as("doc_a"), col("gb").as("doc_b")))
      g.members
        .join(broadcast(comps.withColumnRenamed("doc_id", "gid")), Seq("gid"))
        .select(col("doc_id"), col("comp"))
        .stableCheckpoint()
    }.orderBy("doc_id")

  /** Semantic (embedding-space) dedup clusters — SemDeDup's shape: the
    * near-duplicate graph comes from LSH-banded cosine pairs
    * (`Dedup.embeddingNearDup`, equi-key candidates, never O(n²)), and the
    * same min-label propagation collapses it into clusters; the minimum
    * vec_id is the retained representative. This is the dedup that catches
    * paraphrases exact/MinHash text matching cannot see. */
  def semanticClusters(embeddings: DataFrame, threshold: Double = 0.45): DataFrame = {
    val pairs = Dedup.embeddingNearDup(embeddings, threshold)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    connectedComponents(embeddings.select(col("vec_id").as("doc_id")), pairs)
      .select(col("doc_id").as("vec_id"), col("comp"),
        (col("doc_id") === col("comp")).as("is_rep"))
      .orderBy("vec_id")
  }

  /** SoftDeDup-style down-weighting — keep every document, divide its
    * training weight by its near-duplicate cluster size instead of
    * dropping survivors (the soft alternative the 2024 SoftDeDup line
    * argues preserves tail knowledge the hard drop destroys): weight =
    * 1/|component| over the SAME memoized MinHash components as
    * `dedup_components`, so the two policies are directly comparable on
    * one clustering. Per doc: component, cluster size, weight and
    * effective (weighted) token mass; Σ weight over a cluster is exactly 1,
    * so Σ weights corpus-wide = #components — the effective corpus size
    * the hard drop would keep, now reached without deleting anything. */
  def softDedupWeights(documents: DataFrame): DataFrame = {
    val comps = graft.plans.Memo.memoize(documents, "dedup.components") {
      // (memo key shared with minhashComponents — computed once per corpus)
      val g = Dedup.minhashGroups(documents)
      val cc = connectedComponents(
        g.groups.select(col("gid").as("doc_id")),
        g.crossQual.select(col("ga").as("doc_a"), col("gb").as("doc_b")))
      g.members
        .join(broadcast(cc.withColumnRenamed("doc_id", "gid")), Seq("gid"))
        .select(col("doc_id"), col("comp"))
        .stableCheckpoint()
    }
    val sizes = comps.groupBy(col("comp")).agg(count(lit(1)).as("comp_size"))
    // shared tokenizer (NOT a local re-split): keeps this operator's token
    // counts in lockstep with the dedup_soft oracle's len(tokSql) splice
    val toks = Dedup.tokenCounts(documents)
    comps.join(sizes, Seq("comp"))
      .join(toks, Seq("doc_id"))
      .withColumn("weight", round(lit(1.0) / col("comp_size"), 6))
      .withColumn("eff_tokens", round(col("n_tokens") * 1.0 / col("comp_size"), 6))
      .select(col("doc_id"), col("comp"), col("comp_size"), col("weight"),
        col("n_tokens"), col("eff_tokens"))
      .orderBy("doc_id")
  }
}
