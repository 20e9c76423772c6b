package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Config-only deployment smoke, run in a FRESH JVM by `ExtensionsSpec`:
  * builds a session wired ONLY through
  * `spark.sql.extensions=graft.GraftExtensions` — the spark-submit deploy
  * story SURVEY §4 promises — and proves every injected piece fires with
  * no programmatic registration: the native SQL functions, the
  * FusePercentiles optimizer rule, and the TopKPerKey planner strategy.
  * (A fresh JVM is required because the conf form of the hook is only
  * honoured by the builder that CREATES the SparkContext; inside the
  * shared test JVM a context already exists, which is why the in-suite
  * test must use `withExtensions`.) Exit 0 + "SMOKE_OK" on success. */
object ExtensionsSmoke {
  def main(args: Array[String]): Unit = try {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-smoke")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    import spark.implicits._
    // native functions reachable from pure SQL
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(dot == 32.0, s"graft_dot: $dot")
    val bs = spark.sql("SELECT graft_bytesum(CAST('AB' AS BINARY)) AS s")
      .head().getLong(0)
    assert(bs == 131L, s"graft_bytesum: $bs")
    val ent = spark.sql("SELECT graft_entropy(CAST('AABB' AS BINARY)) AS e")
      .head().getDouble(0)
    assert(math.abs(ent - 1.0) < 1e-12, s"graft_entropy: $ent")
    // FusePercentiles: four scalar percentiles collapse to one array call
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "x")
      .groupBy($"g")
      .agg(expr("percentile(x, 0.25D)").as("p25"), expr("percentile(x, 0.5D)").as("p50"),
        expr("percentile(x, 0.75D)").as("p75"), expr("percentile(x, 0.99D)").as("p99"))
    val nP = "percentile\\(".r.findAllIn(df.queryExecution.optimizedPlan.toString).length
    assert(nP == 1, s"FusePercentiles did not fire ($nP percentile calls)")
    val fused = df.head()
    assert(fused.getAs[Double]("p25") == 25.75 && fused.getAs[Double]("p99") == 99.01,
      s"fused values wrong: $fused")
    // TopKPerKey: the strategy must lower the logical node (no fallback
    // exists — planning would throw without it), and values must be right
    val src = Seq((1L, 10.0, 1L), (1L, 30.0, 2L), (1L, 20.0, 3L), (2L, 5.0, 4L))
      .toDF("o_custkey", "o_totalprice", "o_orderkey")
    val topk = operators.TopK.nativePerKey(
      src, Seq("o_custkey"), Seq(("o_totalprice", true)), 2)
    val phys = topk.queryExecution.executedPlan.toString
    assert(phys.contains("TopKPerKey"), s"TopKStrategy did not fire:\n$phys")
    val got = topk.collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Double]("o_totalprice")))
      .sortBy(identity).toSeq
    assert(got == Seq((1L, 20.0), (1L, 30.0), (2L, 5.0)), s"topk values: $got")
    println("SMOKE_OK")
    spark.stop()
  } catch {
    case e: Throwable =>
      System.err.println(s"SMOKE_FAIL: $e")
      sys.exit(1)
  }
}
