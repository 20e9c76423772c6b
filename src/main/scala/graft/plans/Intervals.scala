package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands over half-open intervals — the shared core of every
  * interval-union consumer (exact-substring duplicated-token coverage,
  * decontamination span splicing): label each row with an `isl` id such that
  * transitively overlapping-or-touching `[s, e)` intervals share an id, via
  * the standard running-max formulation (a new island starts exactly where
  * the start exceeds the running max of previous ends). Callers aggregate
  * per (keys, isl) to union lengths / merged spans.
  *
  * Scale shape: one window partitioned by `keys` — per-key interval counts
  * are bounded by the caller's semantics (runs of one candidate pair, spans
  * of one document), never by corpus size. The ordering must be total for
  * run-determinism when `(s, e)` can tie — pass `tieCols`.
  */
object Intervals {

  /** Output carries a new `isl` column; `pme` is used as a temp and dropped.
    * Both names are RESERVED: an input already carrying either would be
    * silently overwritten, so this asserts they are absent. */
  def islands(df: DataFrame, keys: Seq[String], s: String = "s", e: String = "e",
              tieCols: Seq[String] = Nil): DataFrame = {
    require(!df.columns.contains("pme") && !df.columns.contains("isl"),
      s"Intervals.islands reserves columns 'pme'/'isl'; input has ${df.columns.mkString(",")}")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((Seq(s, e) ++ tieCols).map(col): _*)
    df.withColumn("pme", max(col(e)).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("isl", sum(when(col("pme").isNull || col(s) > col("pme"), 1L)
        .otherwise(0L)).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("pme")
  }
}
