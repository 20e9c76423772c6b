package graft.dedup

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

  /** @param docs  all documents (isolated docs form singleton components)
    * @param pairs undirected edges as (doc_a, doc_b) */
  def connectedComponents(docs: DataFrame, pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(true)
    var labels = docs.select(col("doc_id").as("id")).withColumn("comp", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neigh = edges.join(labels.withColumnRenamed("id", "nid"), col("dst") === col("nid"))
        .groupBy(col("src")).agg(min(col("comp")).as("ncomp"))
      val updated = labels.join(neigh, col("id") === col("src"), "left")
        .select(col("id"), least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      val changed = updated.join(labels.withColumnRenamed("comp", "prev"), Seq("id"))
        .filter(col("comp") =!= col("prev")).count()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    labels.select(col("id").as("doc_id"), col("comp")).orderBy("doc_id")
  }

  /** Dedup clusters of the MinHash near-dup graph: per-doc component
    * assignment (comp = min doc_id of the cluster). */
  def minhashComponents(documents: DataFrame): DataFrame =
    connectedComponents(documents, Dedup.minhashLsh(documents))
}
