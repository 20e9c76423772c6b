package graft

import org.apache.spark.sql.SparkSession

/** Session tuning applied once per JVM. Every knob here is a runtime-settable
  * SQL conf so it works whether the session was built by Verify, Bench, tests
  * or a user application.
  *
  * Scale rationale (100 TB / 1000 executors — see SURVEY.md §4): AQE handles
  * runtime partition coalescing and skew-join splitting; a generous broadcast
  * threshold keeps the TPC-H-ratio dimension tables on the broadcast path;
  * shuffle partition count is environment-provided (local[32] → 32) and no
  * operator depends on it.
  */
object GraftSession {
  def tune(spark: SparkSession): SparkSession = {
    val c = spark.conf
    c.set("spark.sql.adaptive.enabled", "true")
    c.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    c.set("spark.sql.adaptive.skewJoin.enabled", "true")
    c.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    c.set("spark.sql.session.timeZone", "UTC")
    c.set("spark.sql.parquet.filterPushdown", "true")
    c.set("spark.sql.parquet.aggregatePushdown", "true")
    graft.functions.VectorExpressions.register(spark)
    // Optimizer rules can't be injected post-build via SparkSessionExtensions,
    // but experimental.extraOptimizations is runtime-settable and runs at the
    // end of optimization — same rule the extensions path injects.
    if (!spark.experimental.extraOptimizations.contains(graft.plans.FusePercentiles)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.FusePercentiles
    }
    // Same post-build story for the planner strategy behind the native
    // per-key top-k plan node (the extensions path injects it instead).
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKStrategy
    }
    spark
  }
}
