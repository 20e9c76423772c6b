package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-K operators (SURVEY.md §2.1 q7/q17).
  *
  * Per-group top-k uses a rank window partitioned by a high-cardinality key —
  * one shuffle, no global sort. Global top-N compiles to
  * TakeOrderedAndProject: per-partition heaps + a driver merge of K rows,
  * never a total sort — the shape that survives 100 TB.
  */
object TopK {

  /** Generic per-group top-k by an ordering expression. */
  def perGroup(df: DataFrame, partitionCols: Seq[String], orderCols: Seq[org.apache.spark.sql.Column],
               k: Int, rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn(rankCol, row_number().over(w).cast("long")).filter(col(rankCol) <= k)
  }

  /** q7: top-3 orders per customer by total price. */
  def topOrdersPerCustomer(orders: DataFrame, k: Int = 3): DataFrame =
    perGroup(orders, Seq("o_custkey"), Seq(col("o_totalprice").desc, col("o_orderkey")), k)
      .select(col("o_custkey"), col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"), col("rk"))
      .orderBy("o_custkey", "rk")

  /** q17: global top-N (distributed TakeOrdered, not a total sort). */
  def globalTopLineitems(lineitem: DataFrame, n: Int = 20): DataFrame =
    lineitem
      .select(col("l_orderkey"), col("l_linenumber"), round(col("l_extendedprice"), 2).as("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(n)
}
