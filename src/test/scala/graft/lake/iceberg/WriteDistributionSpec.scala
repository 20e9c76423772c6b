package graft.lake.iceberg

import java.nio.file.Files

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-19 write-distribution contracts:
  *  - distribution/sort keys derive from the table's PARTITION SPEC, not a
  *    hardcoded column name (an arbitrary-named partition column flows
  *    through to the delta write's required ordering);
  *  - the `months` V2 function served by the catalog's FunctionCatalog
  *    computes the Iceberg month-transform value;
  *  - a table with `write.distribution-mode=hash` hash-clusters streaming
  *    epochs by months(<part col>), so an epoch writes ≈ months-touched
  *    files instead of tasks × months. */
class WriteDistributionSpec extends SparkSpec {

  test("distribution source column derives from an arbitrary-named partition transform") {
    assert(GraftPartitioning.sourceColumnOf(
      Array(Expressions.months("event_ts"))).contains("event_ts"))
    assert(GraftPartitioning.sourceColumnOf(
      Array(Expressions.months("l_shipdate"))).contains("l_shipdate"))
    assert(GraftPartitioning.sourceColumnOf(Array.empty).isEmpty)
    // the catalog's declared spec resolves to its own source column
    assert(GraftPartitioning.sourceColumnOf(
      Array(GraftPartitioning.monthTransform)).contains("l_shipdate"))
  }

  test("delta write sort keys follow the spec's source column, falling back to (_file,_pos)") {
    val schema = StructType(Seq(
      StructField("event_ts", TimestampType), StructField("v", LongType)))
    def orderingCols(partCol: Option[String]): Seq[String] =
      new GraftDeltaWrite("/tmp/unused", schema, partCol)
        .requiredOrdering().toSeq.map(_.expression().references().head.fieldNames.head)
    // arbitrary-named partition column: the data sort key is that column
    assert(orderingCols(Some("event_ts")) == Seq("_file", "event_ts"))
    // spec column absent from the write schema (pure DELETE): row-id order
    assert(orderingCols(Some("not_there")) == Seq("_file", "_pos"))
    assert(orderingCols(None) == Seq("_file", "_pos"))
  }

  test("months V2 function computes the Iceberg month-transform value") {
    val bound = GraftMonthsFunction.bind(
      StructType(Seq(StructField("ts", TimestampType))))
    def monthsOf(isoDate: String): Integer = {
      val micros = java.time.LocalDate.parse(isoDate).atStartOfDay
        .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L
      bound.asInstanceOf[
          org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
        .produceResult(org.apache.spark.sql.catalyst.InternalRow(micros))
    }
    assert(monthsOf("1970-01-15") == 0)
    assert(monthsOf("1970-02-01") == 1)
    assert(monthsOf("1997-03-15") == (1997 - 1970) * 12 + 2)
    // catalog serves it through the FunctionCatalog surface
    val cat = new GraftCatalog()
    val opts = new java.util.HashMap[String, String]()
    opts.put("warehouse", Files.createTempDirectory("graft_fn_wh_").toString)
    cat.initialize("gfn", new org.apache.spark.sql.util.CaseInsensitiveStringMap(opts))
    assert(cat.loadFunction(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "months"))
      eq GraftMonthsFunction)
  }

  test("write.distribution-mode=hash clusters streaming epochs: files == months touched") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val w = Files.createTempDirectory("graft_wdist_wh_").toString
    spark.conf.set("spark.sql.catalog.gwdist", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gwdist.warehouse", w)
    // one epoch spanning three months, arriving SHUFFLED by join key (NOT
    // by month — broadcast disabled so the shuffle really happens): without
    // the clustered distribution every join task would open a writer per
    // month it sees (tasks × months files)
    val li = Tables.lineitem(spark, sf0001)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
    spark.sql(s"""CREATE TABLE gwdist.lake.li_stream_dist
      | (${li.schema.toDDL})
      | TBLPROPERTIES ('write.distribution-mode'='hash')""".stripMargin)
    val loc = IcebergCatalog.tableLocation(w, "lake", "li_stream_dist")
    val markers = MemoryStream[Int]
    val streamDf = markers.toDF().toDF("__m")
      .join(li.withColumn("__b", pmod(col("l_orderkey"), lit(4L)).cast("int")),
        col("__m") === col("__b"))
      .drop("__m", "__b")
    val ckpt = Files.createTempDirectory("graft_wdist_ckpt_").toString
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = streamDf.writeStream
        .option("checkpointLocation", ckpt)
        .toTable("gwdist.lake.li_stream_dist")
      try { markers.addData(0, 1, 2, 3); q.processAllAvailable() } finally q.stop()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
    val meta = IcebergTable.readMetadata(loc)
    val files = IcebergTable.readManifestList(
        IcebergTable.currentSnapshot(meta).manifestList)
      .flatMap(m => IcebergTable.readManifest(m.path)).filter(_.content == 0)
    val nMonths = li.select(date_format(col("l_shipdate"), "yyyy-MM")).distinct().count()
    assert(files.size.toLong == nMonths,
      s"expected one file per month ($nMonths), got ${files.size}")
    // and the rows all arrived
    val n = spark.table("gwdist.lake.li_stream_dist").count()
    assert(n == li.count())
  }
}
