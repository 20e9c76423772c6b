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

  /** Per-key top-k through the native plan node (`graft.plans.TopKPerKey`):
    * bounded heaps with a map-side partial pass instead of a full window
    * sort. Keys/order are column names resolved against the input's
    * analyzed output (building already-resolved catalyst expressions — a
    * hand-built node must not lean on the analyzer's lazy Column lowering,
    * whose wrappers don't survive task serialization). `descending` pairs
    * each order column with its direction. Requires `TopKStrategy`
    * (GraftSession.tune or spark.sql.extensions=graft.GraftExtensions). */
  def nativePerKey(df: DataFrame, keys: Seq[String],
                   orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
    val plan = GraftSqlBridge.analyzed(df)
    def attr(n: String) = plan.output.find(_.name.equalsIgnoreCase(n))
      .getOrElse(throw new IllegalArgumentException(s"column $n not in ${plan.output.map(_.name)}"))
    val sortOrders = orderCols.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending) }
    GraftSqlBridge.ofRows(df.sparkSession,
      graft.plans.TopKPerKey(keys.map(attr), sortOrders, k, plan))
  }

  /** q57: q7's semantics through the native operator — top-3 orders per
    * customer, no window sort, partial top-k before the shuffle. */
  def nativeTopOrdersPerCustomer(orders: DataFrame, k: Int = 3): DataFrame =
    nativePerKey(orders, Seq("o_custkey"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), k)
      .select(col("o_custkey"), col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))

  /** q17: global top-N (distributed TakeOrdered, not a total sort). */
  def globalTopLineitems(lineitem: DataFrame, n: Int = 20): DataFrame =
    lineitem
      .select(col("l_orderkey"), col("l_linenumber"), round(col("l_extendedprice"), 2).as("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(n)
}
