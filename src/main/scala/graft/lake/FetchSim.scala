package graft.lake

import org.apache.spark.sql.SparkSession

/** MEASURED parallel-fetch ladder — the executor-side counterpart of
  * [[Manifest.fetchLatency]]'s analytic `ceil(n/p) × TTFB` model (the
  * reference study times a real thread pool over TTFB-simulated fetches;
  * see `reference/poc/test_parallel_s3_fetching.py:37-60`).
  *
  * Each of `nObjects` fetches is a task-side TTFB sleep; a `repartition(p)`
  * makes each partition one pool worker, so p concurrent partitions drain
  * the object set in ceil(n/p) sequential rounds of one TTFB each — the
  * exact quantity the model predicts. Rungs are capped at the task-slot
  * count: beyond it Spark would QUEUE partitions (measuring the scheduler,
  * not the pool). RDD is deliberate here — this is a harness simulating
  * per-worker blocking IO, not a data operator.
  */
object FetchSim {

  /** (parallelism, measured_sec, modeled_sec) per rung. */
  def ladder(spark: SparkSession, nObjects: Int = 64, ttfbMs: Long = 55L,
             rungs: Seq[Int] = Seq(1, 4, 16, 32)): Seq[(Int, Double, Double)] = {
    val slots = spark.sparkContext.defaultParallelism
    // scheduler/closure warmup so rung 1 doesn't carry first-job cost
    spark.range(nObjects.toLong).rdd.repartition(math.min(4, slots)).foreachPartition(_ => ())
    rungs.filter(_ <= slots).map { p =>
      val t0 = System.nanoTime()
      spark.range(nObjects.toLong).rdd.repartition(p)
        .foreachPartition(it => it.foreach(_ => Thread.sleep(ttfbMs)))
      val measured = (System.nanoTime() - t0) / 1e9
      val modeled = math.ceil(nObjects.toDouble / p) * ttfbMs / 1e3
      (p, measured, modeled)
    }
  }
}
