package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: match each left row to the nearest right row at-or-before its
  * timestamp, per key (SURVEY.md §2.1 q18).
  *
  * Spark-first formulation: instead of a non-equi join (which would plan as a
  * broadcast-nested-loop or a per-key explode), tag and UNION the two inputs,
  * then take `last(right-payload, ignoreNulls)` over an ordered per-key
  * window. Cost: ONE shuffle on the key + a per-key sort — linear in input,
  * skew-safe under AQE, no candidate-pair blowup. This is the standard
  * distributed point-in-time-join shape.
  */
object AsofJoin {

  /** Generic as-of join.
    *
    * @param left      probe side
    * @param right     reference side (its latest row at-or-before each left ts wins)
    * @param keyCol    equality key present in both inputs
    * @param leftTs    event-time column on `left`
    * @param rightTs   event-time column on `right`
    * @param rightPayload columns of `right` to surface (prefixed `asof_`)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTs: String, rightTs: String, rightPayload: Seq[String]): DataFrame = {
    val l = left.withColumn("_asof_ts", col(leftTs)).withColumn("_asof_side", lit(1))
    val r = right.withColumn("_asof_ts", col(rightTs)).withColumn("_asof_side", lit(0))

    val lCols = left.columns
    val payloadStruct = struct(rightPayload.map(col): _*)
    val lAligned = l.select(col(keyCol).as("_asof_key"), col("_asof_ts"), col("_asof_side"),
      struct(lCols.map(col): _*).as("_asof_left"), lit(null).cast(r.select(payloadStruct).schema.head.dataType).as("_asof_right"))
    val rAligned = r.select(col(keyCol).as("_asof_key"), col("_asof_ts"), col("_asof_side"),
      lit(null).cast(lAligned.schema("_asof_left").dataType).as("_asof_left"), payloadStruct.as("_asof_right"))

    // Right rows sort before left rows at identical timestamps → inclusive match.
    val w = Window.partitionBy(col("_asof_key"))
      .orderBy(col("_asof_ts"), col("_asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lAligned.unionAll(rAligned)
      .withColumn("_asof_match", last(col("_asof_right"), ignoreNulls = true).over(w))
      .filter(col("_asof_side") === 1)
      .select((lCols.map(c => col(s"_asof_left.$c").as(c)) :+
        col("_asof_match")): _*)
      .withColumnsRenamed(Map("_asof_match" -> "asof"))
  }

  /** q18: each purchase matched to the user's most recent signup at-or-before it. */
  def purchaseAfterSignup(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id"))
    val joined = asofJoin(purchases, signups, "user_id", "ts", "ts", Seq("event_id", "ts"))
    joined.select(
      col("event_id"), col("user_id"),
      col("asof.event_id").as("signup_event_id"),
      (unix_millis(col("ts")) - unix_millis(col("asof.ts"))).as("wait_ms"))
      .orderBy("event_id")
  }
}
