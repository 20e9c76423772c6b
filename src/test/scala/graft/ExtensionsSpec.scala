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
