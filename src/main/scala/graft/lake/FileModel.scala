package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic data-file model shared by the lake operators (SURVEY.md §3).
  *
  * The reference benchmarks operate on synthetic manifests of data files
  * (`poc/utils/manifest_generator.py`, `poc/test_dv_resolution_strategies.py:65`
  * `generate_manifests`). graft derives an equivalent model from the real
  * `lineitem` table so the DuckDB oracle can reconstruct the identical
  * metadata in pure SQL: rows are assigned to `n_files` pseudo data files by
  * key hash, and each row gets a stable position within its file — exactly
  * the `(file_path, position)` coordinate system Iceberg delete vectors use.
  */
object FileModel {

  /** Assign each lineitem row to a pseudo data file. */
  def withFileId(lineitem: DataFrame, nFiles: Int = 40): DataFrame =
    lineitem.withColumn("file_id", col("l_orderkey") % nFiles)

  /** Add the 0-based row position within its file (deterministic ordering). */
  def withPos(withFile: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("file_id")).orderBy(col("l_orderkey"), col("l_linenumber"))
    withFile.withColumn("pos", row_number().over(w).cast("long") - 1)
  }

  /** SQL fragment producing the same model (kept adjacent to the Scala so the
    * two derivations stay in sync; interpolated into oracle queries). */
  def sqlModel(nFiles: Int = 40): String =
    s"""SELECT l.*, l_orderkey % $nFiles AS file_id,
       | row_number() OVER (PARTITION BY l_orderkey % $nFiles
       |                    ORDER BY l_orderkey, l_linenumber) - 1 AS pos
       |FROM lineitem l""".stripMargin
}
