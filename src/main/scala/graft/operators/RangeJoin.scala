package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (band/interval) join (SURVEY.md §2.1 q19).
  *
  * The band table is tiny and broadcast, so the non-equi predicate evaluates
  * as a BroadcastNestedLoopJoin with #bands comparisons per row — linear scan
  * cost, no shuffle of the fact side at all. For band tables that are aligned
  * to a fixed width, `bucketedBands` instead computes the bucket arithmetically
  * (an equi-join / pure projection) — the preferred 100 TB shape.
  */
object RangeJoin {

  /** 11 bands of width 10k cover the full l_extendedprice domain (~900 to
    * ~105k at every SF) — the covering property is asserted in
    * RelationalSpec. Band names are zero-padded so lexicographic order is
    * numeric order on both engines. */
  def bands(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 11).map(i => (f"B$i%02d", i * 10000.0, (i + 1) * 10000.0))
      .toDF("band", "lo", "hi")
  }

  /** q19: non-equi interval join of lineitem prices against price bands. */
  def priceBands(spark: SparkSession, lineitem: DataFrame): DataFrame =
    lineitem
      .join(broadcast(bands(spark)),
        col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("l_extendedprice")), 4).as("sum_price"),
           round(avg(col("l_discount")), 6).as("avg_disc"))
      .orderBy("band")

  /** Equivalent fixed-width banding as pure arithmetic — zero join. */
  def bucketedBands(lineitem: DataFrame, width: Double = 10000.0): DataFrame =
    lineitem
      .withColumn("band", concat(lit("B"), floor(col("l_extendedprice") / width).cast("long")))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 4).as("sum_price"))
      .orderBy("band")
}
