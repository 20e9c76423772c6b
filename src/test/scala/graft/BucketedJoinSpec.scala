package graft

import graft.tables.Tables
import graft.operators.SkewSafe
import org.apache.spark.sql.functions._

/** Scale-path claims from SURVEY.md §4 exercised for real: bucketed tables
  * co-locate their join (no Exchange on either side), and salting preserves
  * results while spreading hot keys. */
class BucketedJoinSpec extends SparkSpec {

  private def explained(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  test("bucketed tables join without a shuffle exchange") {
    val orders = Tables.orders(spark, sf0001)
    val customer = Tables.customer(spark, sf0001)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      val plan = explained(joined)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ over bucketed tables:\n$plan")
      // the join inputs must come straight from the bucketed scans — no
      // Exchange on the bucket key below the join (the final aggregation may
      // still shuffle on its own key)
      val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning(o_custkey"))
      assert(exchanges == 0, s"bucketed join must not re-shuffle on the bucket key:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("salted aggregation equals direct aggregation") {
    val lineitem = Tables.lineitem(spark, sf0001)
    val salted = SkewSafe.saltedFlagRevenue(lineitem)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val direct = lineitem.groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (rev, n)) =>
      assert(n == direct(k)._2)
      assert(math.abs(rev - direct(k)._1) < 1e-3, s"$k: $rev vs ${direct(k)._1}")
    }
  }

  test("salted join equals plain join") {
    val orders = Tables.orders(spark, sf0001)
    val customer = Tables.customer(spark, sf0001)
    val saltedN = SkewSafe.saltedJoin(orders, customer, "o_custkey", "c_custkey", "o_orderkey").count()
    val plainN = orders.join(customer, col("o_custkey") === col("c_custkey")).count()
    assert(saltedN == plainN)
  }
}
