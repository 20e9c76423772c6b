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
      // 'AABB' has two symbols at p=1/2 each -> exactly 1 bit
      val ent = spark.sql("SELECT graft_entropy(CAST('AABB' AS BINARY)) AS e")
        .collect()(0).getDouble(0)
      assert(math.abs(ent - 1.0) < 1e-12)

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

  test("config-only wiring: spark.sql.extensions alone fires every hook in a fresh JVM") {
    // The conf form of the hook is only honoured by the builder that
    // CREATES the SparkContext, so the real deploy path needs a JVM with
    // no context yet: spawn one running graft.ExtensionsSmoke, which
    // builds a session with ONLY spark.sql.extensions=graft.GraftExtensions
    // (no withExtensions call) and asserts graft_dot/graft_bytesum,
    // FusePercentiles, and TopKPerKey all fire.
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java").getPath
    // same module opens the build forks tests with (Spark 4.x on JDK 17)
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g",
      "-cp", System.getProperty("java.class.path"), "graft.ExtensionsSmoke")
    import scala.sys.process._
    val out = new StringBuilder
    val logger = ProcessLogger(l => out.append(l).append('\n'),
      l => out.append(l).append('\n'))
    val code = Process(cmd).!(logger)
    assert(code == 0 && out.toString.contains("SMOKE_OK"),
      s"config-only smoke failed (exit $code):\n${out.toString.takeRight(4000)}")
  }
}
