package graft

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` output for the named queries to
  * `<outDir>/<query>_<tag>.txt` — the optimization-round evidence files
  * (`plans/r18/...`). Usage:
  *
  *   runMain graft.PlanDump <sfDir> <outDir> <tag> <q1,q2,...>
  *
  * Builds each DataFrame through the same registry entry Bench times
  * (benchVariants override first) so the captured plan is the timed plan.
  * NOTE: building a frame can execute memoized fixture builds (iceberg
  * warehouses, checkpointed signature tables) — run this on an idle box,
  * not concurrently with a bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val requested = args(3).split(",").toSeq
    val names = requested.filter(SparkEntry.queries.contains)
    val unknown = requested.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty)
      System.err.println(s"[plandump] WARNING: unknown query names dropped: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      try {
        val fn = SparkEntry.benchVariants.getOrElse(name, SparkEntry.queries(name))
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        System.err.println(s"[plandump] wrote $name")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
