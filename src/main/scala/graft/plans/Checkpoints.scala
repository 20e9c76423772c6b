package graft.plans

import org.apache.spark.sql.Dataset

/** One seam for every lineage-truncating checkpoint in the operator layer.
  *
  * Default mode is `localCheckpoint(eager = true)`: blocks live on the
  * executors that computed them — free of any filesystem dependency, ideal
  * for the single-JVM Bench/Verify/job-server loop, but NOT replicated, so
  * on a real cluster an executor loss invalidates the artifact and every
  * consumer fails with missing-block errors rather than recomputing.
  *
  * Setting `spark.graft.reliableCheckpoint=true` routes the same call sites
  * through `Dataset.checkpoint(eager = true)` — files under the context's
  * checkpoint directory (HDFS / object store on a cluster), which survive
  * executor churn. The directory comes from an already-configured
  * `SparkContext.setCheckpointDir`, or from `spark.graft.checkpointDir` at
  * first use; asking for reliable checkpoints with neither set is an error
  * (silently falling back to local blocks would defeat the point of the
  * flag).
  *
  * The two modes produce byte-identical DataFrames — only the storage of
  * the truncation point differs — so oracle hashes and memoized reuse
  * (`plans.Memo`) are unaffected by the flag.
  */
object Checkpoints {
  /** Session conf key: "true" → reliable (replicated) checkpoints. */
  val FlagKey = "spark.graft.reliableCheckpoint"
  /** Session conf key: checkpoint directory, applied lazily at first use
    * when the context has none set. */
  val DirKey = "spark.graft.checkpointDir"

  implicit class StableCheckpoint[T](private val ds: Dataset[T]) extends AnyVal {
    /** Eager lineage-truncating checkpoint honoring [[FlagKey]]. */
    def stableCheckpoint(): Dataset[T] = {
      val spark = ds.sparkSession
      if (!spark.conf.getOption(FlagKey).exists(_.toBoolean)) ds.localCheckpoint(eager = true)
      else {
        val sc = spark.sparkContext
        if (sc.getCheckpointDir.isEmpty) {
          val dir = spark.conf.getOption(DirKey).getOrElse(throw new IllegalStateException(
            s"$FlagKey=true needs a checkpoint dir: call setCheckpointDir or set $DirKey"))
          sc.setCheckpointDir(dir)
        }
        ds.checkpoint(eager = true)
      }
    }

    /** [[stableCheckpoint]] unless the dataset is already a (possibly
      * trivially projected/aliased) checkpoint artifact — the idempotent
      * form for infrastructure seams whose callers sometimes pre-cut the
      * lineage themselves (a second cut would duplicate the blocks for
      * no plan benefit). */
    def stableCheckpointOnce(): Dataset[T] = {
      import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
      import org.apache.spark.sql.execution.LogicalRDD
      def isCut(p: LogicalPlan): Boolean = p match {
        case _: LogicalRDD => true
        case pr: Project => isCut(pr.child)
        case a: SubqueryAlias => isCut(a.child)
        case _ => false
      }
      if (isCut(ds.queryExecution.analyzed)) ds else stableCheckpoint()
    }
  }
}
