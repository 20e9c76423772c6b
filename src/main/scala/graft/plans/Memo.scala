package graft.plans

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.LogicalRDD

/** Per-JVM memo of expensive checkpointed pipeline artifacts.
  *
  * Several query families share one heavy deterministic subtree per corpus —
  * the MinHash family (dedup_minhash / dedup_components / dedup_keep_best /
  * dedup_incremental / dedup_lsh_tuning) rebuilds the identical
  * tokenize→vocab→signature→group pipeline per query, the embedding-dedup
  * family (dedup_embedding / dedup_semantic / knn_threshold_sweep) the same
  * banded hyperplane cosine-pair set. Inside one Bench/Verify JVM these are
  * pure functions of (input plan, parameters), so the first caller's
  * `localCheckpoint(true)` artifact is reused verbatim — results stay
  * BIT-IDENTICAL because the cached value IS the DataFrame the first caller
  * would have consumed, not a recomputation.
  *
  * Keying: the canonicalized analyzed plan of the input (structural
  * equality, verified on every hit — a semanticHash collision cannot serve
  * the wrong corpus) + a tag encoding the function and its parameters +
  * the owning SparkContext (identically-tuned sessions of one context
  * share artifacts — see [[memoize]]).
  *
  * Lifecycle (bounded, leak-free in long-lived JVMs):
  *  - keys whose plan contains a [[LogicalRDD]] leaf are NOT memoized — such
  *    plans are minted fresh per call (e.g. a `localCheckpoint` upstream), so
  *    their keys could never be re-hit and every entry would pin blocks
  *    forever; the computation simply runs un-cached;
  *  - entries owned by a stopped SparkContext are swept on every call
  *    (test-suite session cycling can't accumulate);
  *  - superseded keys and capacity evictions drop the MAP ENTRY ONLY — the
  *    old artifact's checkpointed blocks are deliberately NOT unpersisted,
  *    because earlier callers may still hold the evicted DataFrame, and a
  *    localCheckpoint truncates lineage: unpersisting under a live reference
  *    turns a later action into a missing-block failure (it cannot
  *    recompute), a use-after-free the put-only shape could never produce.
  *    Evicted blocks live until their session stops; the eviction bounds the
  *    number of entries the memo can SERVE, and the block cost is bounded in
  *    practice by the ~10 family pipelines a round builds per corpus.
  *
  * Cluster caveat: `localCheckpoint(true)`'s blocks are NOT replicated —
  * losing an executor invalidates the artifact, and later family queries
  * reading it fail with missing-block errors rather than silently
  * recomputing. Every artifact the memo serves is checkpointed through
  * [[Checkpoints.StableCheckpoint.stableCheckpoint]], so setting
  * `spark.graft.reliableCheckpoint=true` (+ a checkpoint dir) routes them
  * through replicated reliable checkpoints that survive executor churn; the
  * local default targets the single-JVM Bench/Verify/job-server loop where
  * the blocks live exactly as long as the session. */
object Memo {

  private case class Entry(plan: LogicalPlan, session: SparkSession,
                           value: AnyRef, seq: Long)
  private val cache = new scala.collection.concurrent.TrieMap[(Int, String), Entry]
  private val seqGen = new AtomicLong(0L)
  /** Per-key build locks: two threads asking for the same un-built fixture
    * serialize on its key (the second gets the first's artifact) instead
    * of racing duplicate builds — which, for the iceberg physical-table
    * fixtures, would mean two writers in one temp dir. Different keys
    * build concurrently (what lets the bench's setup phase thread-pool the
    * fixture builds, guide §2.6). Lock ordering is acyclic: nested memo
    * calls only ever descend (components → groups → tokids). */
  private val inFlight =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), Object]

  /** Max live artifacts; far above the ~10 family pipelines a round uses,
    * low enough that a runaway caller cannot pin unbounded block memory. */
  val maxEntries = 64

  /** Hits are scoped to the owning SparkContext, not the owning session:
    * every session of this engine is tuned identically (GraftSession.tune —
    * UTC, same AQE/broadcast confs), artifacts are checkpointed LogicalRDDs
    * whose execution no longer depends on session confs, and cross-session
    * sharing is what lets fixtures built by the bench's setup worker
    * sessions serve the suite's main session. */
  def memoize[T <: AnyRef](keyDf: DataFrame, tag: String)(compute: => T): T = {
    sweepStopped()
    val canon = keyDf.queryExecution.analyzed.canonicalized
    // A LogicalRDD leaf (fresh per localCheckpoint/createDataFrame call) makes
    // the key un-re-hittable: caching it would only leak — run un-memoized.
    if (canon.collectLeaves().exists(_.isInstanceOf[LogicalRDD])) return compute
    val key = (canon.semanticHash(), tag)
    def hit: Option[T] = cache.get(key) match {
      case Some(e) if (e.session.sparkContext eq keyDf.sparkSession.sparkContext) &&
          !e.session.sparkContext.isStopped && e.plan == canon =>
        Some(e.value.asInstanceOf[T])
      case _ => None
    }
    hit.getOrElse {
      inFlight.computeIfAbsent(key, _ => new Object).synchronized {
        // re-check under the key lock: a concurrent builder may have
        // finished while this thread waited
        hit.getOrElse {
          // Superseded / capacity paths drop map entries only — never the
          // blocks (see scaladoc: an earlier caller may still reference the
          // evicted checkpointed DataFrame, which cannot recompute).
          if (cache.size >= maxEntries)
            cache.toSeq.sortBy(_._2.seq).headOption.foreach { case (k, _) =>
              cache.remove(k)
            }
          val v = compute
          cache.put(key, Entry(canon, keyDf.sparkSession, v, seqGen.incrementAndGet()))
          // success: drop the build lock so inFlight stays bounded by the
          // keys currently building, not every key ever built. Late
          // waiters on the removed object re-check `hit` and take the
          // cached value; a FAILED compute keeps its lock entry so
          // retrying threads still serialize instead of racing a rebuild.
          inFlight.remove(key)
          v
        }
      }
    }
  }

  /** Bench-harness hook (scale-trend): drop all map entries AND unpersist
    * the checkpointed blocks the memo owns, so each measured scale point
    * rebuilds its family pipeline memo-cold in a heap that is not carrying
    * the previous phase's block history (the r9 driver artifact measured a
    * 63× outlier on q55 purely because the 16× points ran in a
    * 250-query-old heap; a fresh JVM measures 1.02×).
    *
    * Unpersisting here does NOT violate the eviction-path use-after-free
    * rule (scaladoc above): reset() is a PHASE BOUNDARY hook — the harness
    * calls it only between benchmark phases, after every prior caller's
    * result has been fully materialized (noop-written) and no evicted
    * DataFrame reference is live. The per-call eviction path still drops
    * map entries only. */
  private[graft] def reset(): Unit = {
    cache.values.foreach { e =>
      if (!e.session.sparkContext.isStopped)
        datasetsOf(e.value).foreach { d =>
          d.queryExecution.analyzed.collectLeaves().foreach {
            case l: LogicalRDD => l.rdd.unpersist(blocking = false)
            case _ => ()
          }
        }
    }
    cache.clear()
  }

  /** Memo values are either checkpointed Datasets or small case classes
    * holding them (e.g. the MinHash group bundle) — surface every Dataset
    * so reset() can release its blocks. */
  private def datasetsOf(v: AnyRef): Seq[Dataset[_]] = v match {
    case d: Dataset[_] => Seq(d)
    case p: Product => p.productIterator.collect { case d: Dataset[_] => d }.toSeq
    case _ => Seq.empty
  }

  /** Drop entries whose owning context is stopped (their blocks died with
    * the executors; only the map entries linger). */
  private def sweepStopped(): Unit =
    cache.foreach { case (k, e) =>
      if (e.session.sparkContext.isStopped) cache.remove(k)
    }
}
