package graft

import org.apache.spark.sql.SparkSession

/** Micro-harness for the optimization loop: times the named queries in the
  * given order with the noop sink (guide §1.4), N reps each, labelled jobs
  * (§1.5). Earlier names warm shared memo fixtures so later names measure
  * steady state — pass e.g. "dedup_minhash,dedup_lsh_tuning" to time the
  * tuner without the signature build. Usage:
  *
  *   runMain graft.TimeQuery <sfDir> <reps> <q1,q2,...>
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val requested = args(2).split(",").toSeq
    val names = requested.filter(SparkEntry.queries.contains)
    val unknown = requested.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty)
      System.err.println(s"[timequery] WARNING: unknown query names dropped: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    // per-run Spark-job counter: the driver-round-trip profile (a query at
    // 7 s wall / 119 jobs is scheduler-bound, not data-bound)
    val jobCount = new java.util.concurrent.atomic.AtomicLong(0L)
    val trace = sys.env.get("SPARK_GRAFT_JOB_TRACE").contains("1") ||
      sys.props.get("graft.jobtrace").contains("1")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet()
        if (trace) starts.put(e.jobId, System.nanoTime())
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (trace) Option(starts.remove(e.jobId)).foreach { t0 =>
          System.err.println(f"[job ${e.jobId}%4d] ${(System.nanoTime() - t0) / 1e3}%8.0fus")
        }
      override def onStageSubmitted(
          e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        if (trace) System.err.println(
          s"[stage ${e.stageInfo.stageId}] ${e.stageInfo.numTasks}t ${e.stageInfo.name.take(90)}")
    })
    def run(name: String): (Double, Long) = {
      spark.sparkContext.setJobDescription(name)
      val j0 = jobCount.get()
      val t0 = System.nanoTime()
      SparkEntry.benchVariants.getOrElse(name, SparkEntry.queries(name))(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are async — drain adaptively: wait until the
      // counter stops moving (two consecutive stable reads) instead of a
      // fixed sleep, which under-counts exactly the job-storm queries this
      // counter exists to diagnose. Bounded at 3 s.
      var last = -1L
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 30) {
        Thread.sleep(100); waited += 1
        val now = jobCount.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      (sec, jobCount.get() - j0)
    }
    names.foreach { n =>
      val ts = (1 to reps).map(_ => run(n))
      println(f"$n%-28s ${ts.map { case (t, j) => f"$t%7.3f/${j}%dj" }.mkString(" ")}")
    }
    spark.stop()
  }
}
