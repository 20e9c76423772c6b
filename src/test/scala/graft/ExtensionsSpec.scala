package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions deployment path: a session built with
  * graft.GraftExtensions must expose the native functions to pure SQL with
  * no programmatic registration call. Needs its own SparkSession (extensions
  * are fixed at session build), so this spec does not reuse SparkSpec's. */
class ExtensionsSpec extends AnyFunSuite {

  test("graft functions are available via spark.sql.extensions") {
    // getOrCreate would silently reuse another suite's session (whose tune()
    // call registers the functions anyway) — clear the active/default session
    // so the builder genuinely constructs one with OUR extensions, then
    // restore so the shared SparkSpec session is unaffected.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // `spark.sql.extensions` as a conf is only honoured when this builder
    // also creates the SparkContext; under a shared test JVM the context
    // already exists, so exercise the same class via the equivalent
    // programmatic hook.
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val dot = spark.sql(
        "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
        .collect()(0).getDouble(0)
      assert(dot == 32.0)
      val bs = spark.sql("SELECT graft_bytesum(CAST('AB' AS BINARY)) AS s")
        .collect()(0).getLong(0)
      assert(bs == 65L + 66L)

      // FusePercentiles: four scalar percentiles over the same column must
      // collapse to ONE array percentile, with identical values.
      import spark.implicits._
      val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "x")
        .groupBy($"g")
        .agg(
          org.apache.spark.sql.functions.expr("percentile(x, 0.25D)").as("p25"),
          org.apache.spark.sql.functions.expr("percentile(x, 0.5D)").as("p50"),
          org.apache.spark.sql.functions.expr("percentile(x, 0.75D)").as("p75"),
          org.apache.spark.sql.functions.expr("percentile(x, 0.99D)").as("p99"))
      val optimized = df.queryExecution.optimizedPlan.toString
      val nPercentiles = "percentile\\(".r.findAllIn(optimized).length
      assert(nPercentiles == 1, s"expected one fused percentile, plan:\n$optimized")
      val r = df.collect()(0)
      assert(r.getAs[Double]("p25") == 25.75 && r.getAs[Double]("p50") == 50.5 &&
             r.getAs[Double]("p75") == 75.25 && r.getAs[Double]("p99") == 99.01,
        s"fused values wrong: $r")
    } finally {
      // Don't stop(): that would kill the JVM-shared SparkContext under the
      // other suites. Just restore the previous session handles.
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
