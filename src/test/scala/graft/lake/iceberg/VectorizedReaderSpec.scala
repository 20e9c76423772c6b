package graft.lake.iceberg

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unit coverage for the executor-side vectorized per-file reader behind
  * the DSv2 SQL front door — the physical-form and schema-drift cases a
  * table-level query can't isolate: legacy int96 timestamps, columns a
  * pre-evolution file lacks (null-fill), the synthesized `_file`/`_pos`
  * metadata columns (row-level operations' rowId), and DV/equality
  * filtering by row ordinal. */
class VectorizedReaderSpec extends SparkSpec {

  private def lineitem = Tables.lineitem(spark, sf0001)

  private def writeOne(df: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("graft_vread_").toString
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    new File(dir).listFiles().filter(_.getName.endsWith(".parquet")).head.getPath
  }

  private def drain(r: GraftPartitionReader,
                    n: Int): Seq[org.apache.spark.sql.catalyst.InternalRow] = {
    val out = Seq.newBuilder[org.apache.spark.sql.catalyst.InternalRow]
    try while (r.next()) out += r.get() finally r.close()
    out.result()
  }

  test("int96 timestamps decode to the same micros Spark's own reader returns") {
    val key = "spark.sql.parquet.outputTimestampType"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "INT96")
    val src = lineitem.limit(200)
      .select(col("l_orderkey"),
        col("l_shipdate").cast("timestamp_ltz").as("l_shipdate"))
      .orderBy("l_orderkey")
    val path =
      try writeOne(src)
      finally old.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
    assert(GraftVectorized.fileSchemaOf(path).getType(Seq("l_shipdate"): _*)
      .asPrimitiveType().getPrimitiveTypeName.toString == "INT96",
      "fixture must exercise the legacy physical form")
    val rows = drain(new GraftPartitionReader(path,
      Array(("l_orderkey", LongType), ("l_shipdate", TimestampType)),
      Array.empty, Array.empty), 200)
    val expect = spark.read.parquet(new File(path).getParent)
      .orderBy("l_orderkey")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toInstant))
    val got = rows.map(r => (r.getLong(0),
      java.time.Instant.EPOCH.plusNanos(r.getLong(1) * 1000L)))
      .sortBy(_._1)
    assert(got == expect.toSeq)
  }

  test("missing columns null-fill; _file/_pos synthesize; DV+equality filter by ordinal") {
    val src = lineitem.limit(50).select(col("l_orderkey"), col("l_quantity"))
      .orderBy("l_orderkey")
    val path = writeOne(src)
    val all = drain(new GraftPartitionReader(path,
      Array(("l_orderkey", LongType), ("added_later", StringType),
        ("_file", StringType), ("_pos", LongType)),
      Array.empty, Array.empty), 50)
    assert(all.size == 50)
    assert(all.forall(_.isNullAt(1)), "absent column must null-fill")
    assert(all.forall(_.getUTF8String(2).toString == path))
    assert(all.map(_.getLong(3)) == (0L until 50L))
    // DV positions skip by ordinal; equality keys filter by value
    val keys = src.collect().map(_.getLong(0)).sorted
    val dv = Array(0L, 7L, 49L)
    val eq = Array(keys(3), keys(5))
    val left = drain(new GraftPartitionReader(path,
      Array(("l_orderkey", LongType), ("_pos", LongType)), dv, eq), 50)
    assert(left.size == 45)
    assert(!left.exists(r => dv.contains(r.getLong(1))))
    assert(!left.exists(r => eq.contains(r.getLong(0))))
  }

  test("empty projection (count(*) shape) still counts every live row") {
    val path = writeOne(lineitem.limit(64).select(col("l_orderkey")))
    val n = drain(new GraftPartitionReader(path,
      Array.empty[(String, DataType)], Array(3L), Array.empty), 64).size
    assert(n == 63)
  }
}
