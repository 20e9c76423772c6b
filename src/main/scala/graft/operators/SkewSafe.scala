package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §4): salting spreads pathological hot keys
  * across `saltFactor` sub-keys so no single reducer owns a hot key.
  *
  * `saltedSum` is two-phase aggregation: partial aggregate on (key, salt) —
  * map-side combine already bounds each partition's state, the salt bounds
  * the per-reducer share of a hot key — then final aggregate on key. The
  * result is identical to a direct groupBy (verified by the q24 oracle,
  * which IS the direct form); only the shuffle distribution changes.
  *
  * `saltedJoin` replicates the (small, non-broadcastable) right side across
  * all salts and joins on (key, salt): each hot left key fans across
  * saltFactor reducers. AQE's skew-join handles moderate skew on its own;
  * salting is the explicit tool for the extreme tail.
  */
object SkewSafe {

  /** Deterministic salt from any column (engine-portable, unlike hash()). */
  private def saltOf(c: Column, saltFactor: Int): Column = pmod(c, lit(saltFactor))

  /** Two-phase skew-safe sum/count per key. */
  def saltedSum(df: DataFrame, keyCol: String, saltSource: String, valueExpr: Column,
                saltFactor: Int = 16): DataFrame =
    df.withColumn("_salt", saltOf(col(saltSource), saltFactor))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(valueExpr).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("_psum")).as("salted_sum"), sum(col("_pcnt")).as("n"))

  /** Skew-safe equi-join: right side replicated across salts. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
                 leftSaltSource: String, saltFactor: Int = 16): DataFrame = {
    val salted = left.withColumn("_salt", saltOf(col(leftSaltSource), saltFactor))
    val replicated = right.withColumn("_salt", explode(array((0 until saltFactor).map(lit(_)): _*)))
    salted.join(replicated,
      salted(leftKey) === replicated(rightKey) && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }

  /** q24: revenue per return flag — 3 distinct keys over the whole fact
    * table, the canonical hot-key aggregation, computed salted. */
  def saltedFlagRevenue(lineitem: DataFrame, saltFactor: Int = 16): DataFrame =
    saltedSum(lineitem, "l_returnflag", "l_orderkey",
        col("l_extendedprice") * (lit(1.0) - col("l_discount")), saltFactor)
      .select(col("l_returnflag"), round(col("salted_sum"), 4).as("revenue"), col("n"))
      .orderBy("l_returnflag")
}
