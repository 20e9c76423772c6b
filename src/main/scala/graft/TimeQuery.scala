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
    val names = args(2).split(",").toSeq.filter(SparkEntry.queries.contains)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    def run(name: String): Double = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      SparkEntry.benchVariants.getOrElse(name, SparkEntry.queries(name))(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val ts = (1 to reps).map(_ => run(n))
      println(f"$n%-28s ${ts.map(t => f"$t%7.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
