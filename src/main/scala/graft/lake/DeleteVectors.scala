package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Delete-vector operators (SURVEY.md §2.2).
  *
  * The reference validates how positional delete vectors are stored and
  * resolved (`poc/test_dv_resolution_strategies.py`, `poc/test_delete_storm
  * .py`, `poc/test_density_adaptive_policy.py`). graft re-expresses them as
  * DataFrame operators over `(file_id, pos)`-keyed delete sets:
  *
  *  - applying DVs on read (merge-on-read) is a null-safe ANTI join on the
  *    file/position coordinate — a shuffled hash join on a compound key, the
  *    distributed analogue of the reference's per-file bitmap probe;
  *  - folding multiple delete manifests is "latest sequence wins per
  *    coordinate" — one window (or max-aggregate) over the unioned manifests,
  *    the coalesced positional join of
  *    `test_dv_resolution_strategies.py:230`;
  *  - the density-adaptive policy is a per-file aggregation producing the
  *    encoding + inline/external decision of
  *    `test_density_adaptive_policy.py:282` (4 KB / 10 MB thresholds).
  */
object DeleteVectors {

  /** Deterministic synthetic delete set: ~10% of rows, spread across files.
    * (In production this DataFrame comes from delete files; here it is
    * derived so the oracle can rebuild it — SURVEY.md §3.) */
  def syntheticDeletes(lineitem: DataFrame, nFiles: Int = 40): DataFrame =
    FileModel.withPos(FileModel.withFileId(lineitem, nFiles))
      .filter((col("l_orderkey") * 31 + col("l_linenumber")) % 10 === 3)
      .select(col("file_id"), col("pos"))

  /** Merge-on-read: survivors = data ANTI JOIN deletes ON (file_id, pos).
    * Summarised per return flag to keep the result compact. */
  def applyDeletes(lineitem: DataFrame, nFiles: Int = 40): DataFrame = {
    val data = FileModel.withPos(FileModel.withFileId(lineitem, nFiles))
    val dv = syntheticDeletes(lineitem, nFiles)
    data.join(dv, Seq("file_id", "pos"), "left_anti")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("live_rows"),
           round(sum(col("l_quantity")), 4).as("live_qty"))
      .orderBy("l_returnflag")
  }

  /** Two overlapping delete manifests with sequence numbers (models
    * incremental DV rewrites). */
  private def manifests(lineitem: DataFrame, nFiles: Int): DataFrame = {
    // One pass over the (windowed) file model: each row emits its manifest
    // memberships via a 2-element conditional array — the union-of-filters
    // form would compute the scan+window subtree once per manifest.
    val base = FileModel.withPos(FileModel.withFileId(lineitem, nFiles))
    base.select(col("file_id"), col("pos"),
      explode(array(
        when(col("pos") % 7 === 1, 1L),
        when(col("pos") % 5 === 2 && col("file_id") % 4 === 0, 2L))).as("seq"))
      .filter(col("seq").isNotNull) // plain explode+filter stays codegen'd; a filter() lambda would not
  }

  /** Folded/coalesced DV resolution: latest sequence wins per coordinate;
    * per-file accounting of resolved deletes and their origin. */
  def foldManifests(lineitem: DataFrame, nFiles: Int = 40): DataFrame =
    manifests(lineitem, nFiles)
      .groupBy(col("file_id"), col("pos"))
      .agg(max(col("seq")).as("winning_seq"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_deletes"),
           sum(when(col("winning_seq") === 2, 1L).otherwise(0L)).as("from_seq2"))
      .orderBy("file_id")

  /** Delete storm (test_delete_storm.py:51): `waves` successive small delete
    * commits each add a tiny DV fragment per touched file. Storing fragments
    * separately costs per-fragment overhead; folding them into one DV per
    * file amortises it. Reports, per file, the fragment count and the byte
    * amplification the storm causes before compaction — the 4 KB-inline
    * pathology the reference measures. Wave membership is arithmetic on
    * `pos`, so the oracle rebuilds the identical storm. */
  def deleteStorm(lineitem: DataFrame, nFiles: Int = 40, waves: Int = 5,
                  overheadBytes: Long = 100L): DataFrame = {
    val base = FileModel.withPos(FileModel.withFileId(lineitem, nFiles))
    val frags = base
      .withColumn("wave", col("pos") % 97)
      .filter(col("wave") < waves)
      .groupBy(col("file_id"), col("wave"))
      .agg(count(lit(1)).as("n_deletes"))
    frags
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_fragments"),
           sum(col("n_deletes")).as("total_deletes"),
           sum(col("n_deletes") * 4 + overheadBytes).as("fragmented_bytes"))
      .withColumn("folded_bytes", col("total_deletes") * 4 + overheadBytes)
      .withColumn("amplification",
        round(col("fragmented_bytes") / col("folded_bytes"), 6))
      .orderBy("file_id")
  }

  /** Equality-delete resolution: a predicate-keyed delete (DELETE WHERE
    * l_partkey % 50 = 7) resolved against each file, contrasted with the
    * positional delete set on the same data — per-file counts of rows hit by
    * each mechanism and by both. Equality deletes ship one predicate row
    * regardless of match count; positional ship 4 bytes/row — the byte
    * columns make the storage trade explicit. */
  def equalityDeletes(lineitem: DataFrame, nFiles: Int = 40): DataFrame = {
    // No pos window needed: both delete predicates are row-derivable.
    FileModel.withFileId(lineitem, nFiles)
      .withColumn("eq_hit", (col("l_partkey") % 50 === 7).cast("long"))
      .withColumn("pos_hit", ((col("l_orderkey") * 31 + col("l_linenumber")) % 10 === 3).cast("long"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("record_count"),
           sum(col("eq_hit")).as("eq_deleted"),
           sum(col("pos_hit")).as("pos_deleted"),
           sum(col("eq_hit") * col("pos_hit")).as("both_deleted"))
      .withColumn("eq_bytes", lit(16L))
      .withColumn("pos_bytes", col("pos_deleted") * 4)
      .orderBy("file_id")
  }

  /** Survivor-run fragmentation: after applying the positional delete set,
    * the surviving positions of each file form contiguous runs (islands via
    * `pos − row_number` per file — partitioned by file_id, no global sort).
    * Run count and length distribution decide between run-length and list
    * DV encodings (`test_density_adaptive_policy.py` run-length arm) and
    * quantify read amplification of a fragmented file. */
  def survivorRuns(lineitem: DataFrame, nFiles: Int = 40): DataFrame = {
    val survivors = FileModel.withPos(FileModel.withFileId(lineitem, nFiles))
      .filter((col("l_orderkey") * 31 + col("l_linenumber")) % 10 =!= 3)
      .select(col("file_id"), col("pos"))
    val w = Window.partitionBy(col("file_id")).orderBy(col("pos"))
    survivors
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("file_id"), col("grp"))
      .agg(count(lit(1)).as("run_len"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_runs"),
        sum(col("run_len")).as("survivors"),
        max(col("run_len")).as("longest_run"),
        round(avg(col("run_len")), 4).as("avg_run_len"))
      .orderBy("file_id")
  }

  /** Density-adaptive storage policy per file: choose the cheaper encoding
    * (positional list vs bitmap), then inline/external by size thresholds. */
  def densityPolicy(lineitem: DataFrame, nFiles: Int = 40,
                    inlineThreshold: Long = 4096, externalThreshold: Long = 10L * 1024 * 1024): DataFrame = {
    val base = FileModel.withPos(FileModel.withFileId(lineitem, nFiles))
    val perFile = base.groupBy(col("file_id")).agg(
      count(lit(1)).as("record_count"),
      sum(when((col("l_orderkey") * 31 + col("l_linenumber")) % 10 === 3, 1L).otherwise(0L)).as("deleted"))
    perFile
      .withColumn("density", round(col("deleted") / col("record_count"), 6))
      .withColumn("list_bytes", col("deleted") * 4)
      .withColumn("bitmap_bytes", ceil(col("record_count") / 8.0).cast("long"))
      .withColumn("encoding",
        when(col("list_bytes") <= col("bitmap_bytes"), "positions").otherwise("bitmap"))
      .withColumn("dv_bytes", least(col("list_bytes"), col("bitmap_bytes")))
      .withColumn("storage",
        when(col("dv_bytes") <= inlineThreshold, "inline")
          .when(col("dv_bytes") <= externalThreshold, "external")
          .otherwise("partitioned"))
      .select("file_id", "record_count", "deleted", "density", "encoding", "dv_bytes", "storage")
      .orderBy("file_id")
  }

  /** Copy-on-write vs merge-on-read cost model for one delete wave (the
    * `(l_orderkey·31+l_linenumber) % 10 = 3` rows): per strategy, the bytes
    * a full-table reader must scan and the bytes the writer must produce.
    * CoW rewrites every touched file (clean reads, expensive writes);
    * positional MoR appends 8 B/position DVs; equality MoR appends 16 B/key
    * tuples (cheap writes, amplified reads). One per-file aggregation, then
    * a three-row strategy summary over the 40-file stats table. */
  def morCostModel(lineitem: DataFrame, nFiles: Int = 40, rowBytes: Long = 100L): DataFrame = {
    val files = FileModel.withFileId(lineitem, nFiles)
      .withColumn("del", (col("l_orderkey") * 31 + col("l_linenumber")) % 10 === 3)
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("rows"),
        sum(when(col("del"), 1L).otherwise(0L)).as("del_rows"))
    files.agg(
        sum((col("rows") - col("del_rows")) * rowBytes).as("cow_read"),
        sum(when(col("del_rows") > 0, col("rows") * rowBytes).otherwise(0L)).as("cow_write"),
        sum(when(col("del_rows") > 0, 1L).otherwise(0L)).as("files_touched"),
        sum(col("rows") * rowBytes + col("del_rows") * 8L).as("pos_read"),
        sum(col("del_rows") * 8L).as("pos_write"),
        sum(col("rows") * rowBytes + col("del_rows") * 16L).as("eq_read"),
        sum(col("del_rows") * 16L).as("eq_write"))
      .select(explode(array(
        struct(lit("1_copy_on_write").as("strategy"), col("cow_read").as("read_bytes"),
          col("cow_write").as("write_bytes"), col("files_touched")),
        struct(lit("2_mor_positional").as("strategy"), col("pos_read").as("read_bytes"),
          col("pos_write").as("write_bytes"), col("files_touched")),
        struct(lit("3_mor_equality").as("strategy"), col("eq_read").as("read_bytes"),
          col("eq_write").as("write_bytes"), col("files_touched")))).as("s"))
      .select(col("s.strategy").as("strategy"), col("s.read_bytes").as("read_bytes"),
        col("s.write_bytes").as("write_bytes"), col("s.files_touched").as("files_touched"))
      .orderBy("strategy")
  }

  /** Column-file (column-granularity) update cost model — full-table rewrite
    * vs writing a replacement file for just the updated column. Re-expresses
    * the reference's column-file DV-update study
    * (`poc/results/column_file_dv_updates_results.json`; its
    * `test_column_file_dv_updates.py` source is a 0-byte file, so the results
    * JSON is the spec). The four scenarios mirror the reference ladder —
    * scenarios A/B/C are the 1 / 10 / 100 % update-percentage rungs at the
    * base file tier, D is the medium-table tier at 5 % — and the cost columns
    * mirror the reference fields: `full_rewrite_bytes`/`_io_ops`,
    * `column_update_bytes`/`_io_ops`, `bytes_saved_pct`, `io_reduction_pct`.
    * The reference's `*_time_ms`/`speedup_factor` are single-node wall-clock
    * measurements; graft's `speedup_model` is the deterministic analogue —
    * the ratio of modeled costs with a 4 KiB byte-equivalent per io op — so
    * both engines can reproduce it bit-exactly.
    *
    * Cost model (reference semantics, graft widths):
    *  - a full rewrite writes every row at its physical width (68 B fixed +
    *    the measured flag/status string bytes, as `Manifest.scanCostModel`)
    *    in 2 io ops — one read pass, one write pass (the reference's constant
    *    `full_rewrite_io_ops: 2`);
    *  - a column update writes 8 B per updated row for the replaced numeric
    *    column plus a 200 B metadata commit in 3 io ops — read column file,
    *    write column file, write commit (the reference's constant
    *    `column_update_io_ops: 3`, hence the constant -50 % io "reduction");
    *  - rows are marked updated by the deterministic `l_orderkey % 100 < pct`
    *    screen so the DuckDB oracle rebuilds the identical update set.
    *
    * Scale: one map-side-combinable per-file aggregation per file tier over
    * the fact table, a broadcast join of the two 1-row tier summaries, and a
    * 4-struct explode — no driver math, no value buffering; at 100 TB this is
    * two columnar scans of (l_orderkey, l_returnflag, l_linestatus). */
  def columnUpdateCost(lineitem: DataFrame, baseFiles: Int = 40,
                       mediumFiles: Int = 100): DataFrame = {
    val colBytes = 8L    // replaced column physical width (l_extendedprice)
    val metaBytes = 200L // column-file commit metadata
    val ioCost = 4096L   // per-io-op byte-equivalent for the modeled speedup

    def tierStats(nFiles: Int, pcts: Seq[Int]): DataFrame = {
      val rowW = length(col("l_returnflag")).cast("long") +
        length(col("l_linestatus")).cast("long") + lit(68L)
      val perFileAggs =
        Seq(count(lit(1)).as("rows"), sum(rowW).as("bytes")) ++
          pcts.map(p => sum(when(col("bucket") < p, 1L).otherwise(0L)).as(s"upd_$p"))
      val perFile = FileModel.withFileId(lineitem, nFiles)
        .withColumn("bucket", col("l_orderkey") % 100)
        .groupBy(col("file_id"))
        .agg(perFileAggs.head, perFileAggs.tail: _*)
      val totalAggs =
        Seq(sum(col("bytes")).as("table_bytes")) ++
          pcts.flatMap(p => Seq(
            sum(col(s"upd_$p")).as(s"upd_rows_$p"),
            sum(when(col(s"upd_$p") > 0, 1L).otherwise(0L)).as(s"touched_$p")))
      perFile.agg(totalAggs.head, totalAggs.tail: _*)
    }

    val base = tierStats(baseFiles, Seq(1, 10, 100))
    val medium = tierStats(mediumFiles, Seq(5)).select(
      col("table_bytes").as("m_table_bytes"),
      col("upd_rows_5").as("m_upd_rows_5"),
      col("touched_5").as("m_touched_5"))

    def scen(label: String, nFiles: Int, pct: Double,
             tableBytes: Column, updRows: Column, touched: Column) =
      struct(lit(label).as("scenario"), lit(nFiles.toLong).as("num_files"),
        lit(pct).as("update_pct"), updRows.as("updated_rows"),
        touched.as("files_touched"), tableBytes.as("full_rewrite_bytes"),
        (updRows * colBytes + metaBytes).as("column_update_bytes"))

    base.crossJoin(broadcast(medium))
      .select(explode(array(
        scen("A_small_update_1pct", baseFiles, 1.0,
          col("table_bytes"), col("upd_rows_1"), col("touched_1")),
        scen("B_partial_update_10pct", baseFiles, 10.0,
          col("table_bytes"), col("upd_rows_10"), col("touched_10")),
        scen("C_full_table_100pct", baseFiles, 100.0,
          col("table_bytes"), col("upd_rows_100"), col("touched_100")),
        scen("D_medium_table_5pct", mediumFiles, 5.0,
          col("m_table_bytes"), col("m_upd_rows_5"), col("m_touched_5")))).as("s"))
      .select(col("s.*"))
      .withColumn("full_rewrite_io_ops", lit(2L))
      .withColumn("column_update_io_ops", lit(3L))
      .withColumn("speedup_model",
        round((col("full_rewrite_bytes") + lit(2L * ioCost)) /
          (col("column_update_bytes") + lit(3L * ioCost)), 4))
      .withColumn("bytes_saved_pct",
        round((col("full_rewrite_bytes") - col("column_update_bytes")) * 100.0 /
          col("full_rewrite_bytes"), 4))
      .withColumn("io_reduction_pct", lit(-50.0))
      .select("scenario", "num_files", "update_pct", "updated_rows",
        "files_touched", "full_rewrite_bytes", "full_rewrite_io_ops",
        "column_update_bytes", "column_update_io_ops", "speedup_model",
        "bytes_saved_pct", "io_reduction_pct")
      .orderBy("scenario")
  }

  /** Commit-time (write-path) cost of the equality-keyed DELETE
    * (`l_partkey % 50 = 7`, the `equalityDeletes` predicate) — the companion
    * to `morCostModel`'s steady-state read/write summary and the write half
    * of the reference's strategy comparison
    * (`poc/test_dv_resolution_strategies.py`: equality deletes exist because
    * they commit without resolving positions). Per strategy, what the
    * *writer* pays at commit time:
    *  - `1_copy_on_write`: read every touched file, rewrite its survivors —
    *    2 io ops per touched file;
    *  - `2_mor_positional`: read every touched file to resolve the predicate
    *    into (file, pos) coordinates, then write one 8 B/position DV per
    *    touched file — also 2 io ops per file, but the write is tiny;
    *  - `3_mor_equality`: write ONE delete file of 16 B key tuples, one per
    *    distinct deleted key, reading nothing — 1 io op total; the deferred
    *    resolution cost is what `morCostModel`'s read column charges.
    * `write_amp` = bytes_written / logically-deleted bytes (round 6) makes
    * the amplification ladder explicit: CoW rewrites every survivor of every
    * touched file (~49× the deleted bytes at this ~2 % hit rate), positional
    * MoR writes 0.08× (8 B vs a 100 B row), equality MoR ~0 but defers.
    *
    * Scale: one map-side-combinable per-file aggregation plus one distinct
    * count over the fact scan, broadcast-joined 1-row summaries, 3-struct
    * explode — never leaves the per-file metadata grain. */
  def eqWriteCost(lineitem: DataFrame, nFiles: Int = 40, rowBytes: Long = 100L): DataFrame = {
    val files = FileModel.withFileId(lineitem, nFiles)
      .withColumn("hit", (col("l_partkey") % 50 === 7).cast("long"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("rows"), sum(col("hit")).as("del_rows"))
    val perFile = files.agg(
      sum(when(col("del_rows") > 0, 1L).otherwise(0L)).as("files_touched"),
      sum(when(col("del_rows") > 0, col("rows") * rowBytes).otherwise(0L)).as("touched_bytes"),
      sum(when(col("del_rows") > 0, (col("rows") - col("del_rows")) * rowBytes)
        .otherwise(0L)).as("survivor_bytes"),
      sum(col("del_rows") * 8L).as("pos_dv_bytes"),
      sum(col("del_rows") * rowBytes).as("deleted_bytes"))
    val keys = lineitem.filter(col("l_partkey") % 50 === 7)
      .agg(count_distinct(col("l_partkey")).as("n_keys"))
    perFile.crossJoin(broadcast(keys))
      .select(explode(array(
        struct(lit("1_copy_on_write").as("strategy"),
          col("files_touched").as("files_read"), col("touched_bytes").as("bytes_read"),
          col("files_touched").as("files_written"), col("survivor_bytes").as("bytes_written"),
          (col("files_touched") * 2L).as("io_ops"), col("deleted_bytes")),
        struct(lit("2_mor_positional").as("strategy"),
          col("files_touched").as("files_read"), col("touched_bytes").as("bytes_read"),
          col("files_touched").as("files_written"), col("pos_dv_bytes").as("bytes_written"),
          (col("files_touched") * 2L).as("io_ops"), col("deleted_bytes")),
        struct(lit("3_mor_equality").as("strategy"),
          lit(0L).as("files_read"), lit(0L).as("bytes_read"),
          lit(1L).as("files_written"), (col("n_keys") * 16L).as("bytes_written"),
          lit(1L).as("io_ops"), col("deleted_bytes")))).as("s"))
      .select(col("s.strategy").as("strategy"), col("s.files_read").as("files_read"),
        col("s.bytes_read").as("bytes_read"), col("s.files_written").as("files_written"),
        col("s.bytes_written").as("bytes_written"), col("s.io_ops").as("io_ops"),
        round(col("s.bytes_written") / col("s.deleted_bytes"), 6).as("write_amp"))
      .orderBy("strategy")
  }

  /** DV-resolution strategy ladder — the deterministic re-expression of the
    * reference's scenario A/B/D headline fields
    * (`poc/test_dv_resolution_strategies.py`,
    * `results/dv_resolution_strategies_results.json`; scenario C's coalesced
    * join is `foldManifests`). One row per manifest-size rung
    * (40/100/200/400 pseudo files), with ~30 % of files carrying a DV
    * (`file_id % 10 < 3` — the reference's `dv_ratio: 0.3` made
    * deterministic):
    *  - scenario A (hash vs positional join): hash-table memory is 200 B per
    *    *matched* entry vs a positional array of 8 B per *file*
    *    (`memory_bytes` 60000/300 and 8000/1000 in the reference run);
    *    `memory_reduction_pct` reproduces the reference's ~86.7 % headline;
    *  - scenario B (separate vs folded DV manifests): 2 manifest requests vs
    *    1 over the same entry bytes (200 B/data entry + 150 B/DV entry) —
    *    the constant `io_reduction_pct: 50`;
    *  - scenario D (order-preserving manifest writes): an ordered manifest
    *    pads a null entry for every DV-less file (`null_entries`), so its
    *    entry count is the file count while the unordered write is just the
    *    DV count — `write_overhead_pct` is the padding ratio.
    *
    * Scale: every rung divides the finest one (40/100/200 all divide 400),
    * so `l_orderkey % r == (l_orderkey % 400) % r` — ONE map-side-combinable
    * fact aggregation at the 400-file grain, then the coarser rungs roll up
    * from that ≤ 400-row table (exploded 4×, still ≤ 1600 rows). No 4×
    * fact-scan amplification; everything after the single shuffle is
    * file-model-bounded. */
  def dvStrategies(lineitem: DataFrame,
                   rungs: Seq[Int] = Seq(40, 100, 200, 400)): DataFrame = {
    val fine = rungs.max
    require(rungs.forall(r => fine % r == 0), "every rung must divide the finest rung")
    val perFine = lineitem
      .select((col("l_orderkey") % fine).as("fine_id"),
        ((col("l_orderkey") * 31 + col("l_linenumber")) % 10 === 3).cast("long").as("del"))
      .groupBy(col("fine_id"))
      .agg(sum(col("del")).as("fine_del"))
    val perFile = perFine
      .select(explode(array(rungs.map(r => lit(r.toLong)): _*)).as("num_files"),
        col("fine_id"), col("fine_del"))
      .withColumn("file_id", col("fine_id") % col("num_files"))
      .groupBy(col("num_files"), col("file_id"))
      .agg(sum(col("fine_del")).as("del_rows"))
      .withColumn("has_dv", (col("file_id") % 10 < 3).cast("long"))
    perFile
      .groupBy(col("num_files"))
      .agg(count(lit(1)).as("files_present"),
        sum(col("has_dv")).as("dv_files"),
        sum(col("has_dv") * col("del_rows")).as("dv_positions"))
      .withColumn("hash_mem_bytes", col("dv_files") * 200L)
      .withColumn("pos_mem_bytes", col("files_present") * 8L)
      // Guarded: a rung with zero DV-carrying files (conceivable only on
      // tiny/filtered inputs) has no hash-strategy footprint to reduce —
      // emit an explicit NULL rather than a ±Infinity ratio; LakeSpec
      // asserts the column non-null on the real corpus so a degenerate
      // input fails loudly instead of reading as 0.0.
      .withColumn("memory_reduction_pct",
        when(col("dv_files") > 0,
          round((col("hash_mem_bytes") - col("pos_mem_bytes")) * 100.0 /
            col("hash_mem_bytes"), 4)))
      .withColumn("manifest_bytes", col("files_present") * 200L + col("dv_files") * 150L)
      .withColumn("separate_requests", lit(2L))
      .withColumn("folded_requests", lit(1L))
      .withColumn("io_reduction_pct", lit(50.0))
      .withColumn("ordered_entries", col("files_present"))
      .withColumn("unordered_entries", col("dv_files"))
      .withColumn("null_entries", col("files_present") - col("dv_files"))
      .withColumn("write_overhead_pct",
        when(col("dv_files") > 0,
          round(col("null_entries") * 100.0 / col("unordered_entries"), 4)))
      .orderBy("num_files")
  }

  /** Byte-accurate Roaring-bitmap cost model for each file's delete vector —
    * the container-level refinement of [[densityPolicy]]'s naive
    * list-vs-bitmap estimate, matching the sizes the reference measures
    * with real roaring bitmaps (reference:
    * poc/test_density_adaptive_policy.py:31,80-122 — array ≈ 2 B/element,
    * bitmap ≈ 8192 B per 65 536-row range, run ≈ 4 B/run).
    *
    * Positions are split into 2¹⁶-row chunks (the Roaring high-16-bit key);
    * per chunk, the three container encodings cost (public
    * RoaringFormatSpec / CRoaring portable serialization):
    *  - array:  2 B per position (only eligible below 4096 cardinality);
    *  - bitmap: fixed 8192 B;
    *  - run:    2 B run-count header + 4 B per run;
    * and the serializer picks run iff strictly smaller than the cheaper of
    * array/bitmap (the runOptimize rule), else array below 4096, else
    * bitmap. The per-file DV size adds the portable-format framing: 4 B
    * cookie + 4 B container count + ceil(n/8) run-flag bitset + 4 B
    * descriptive header per container.
    *
    * Output per file: container census by type, modeled roaring bytes, the
    * naive min(4 B-list, bitset) bytes densityPolicy used, their ratio, and
    * the inline/external decision re-derived from the roaring size (4 KB
    * inline floor — the reference's Byte Floor rule). One chunk-grain
    * window (bounded by 65 536 rows) + two hash aggs; linear at any scale. */
  def roaringDvModel(lineitem: DataFrame, nFiles: Int = 40,
                     inlineThreshold: Long = 4096): DataFrame = {
    val del = syntheticDeletes(lineitem, nFiles)
    val rc = FileModel.withFileId(lineitem, nFiles)
      .groupBy(col("file_id")).agg(count(lit(1)).as("record_count"))
    val w = Window.partitionBy(col("file_id"), col("hi")).orderBy(col("pos"))
    val cont = del.withColumn("hi", (col("pos") / 65536).cast("long"))
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("file_id"), col("hi"))
      .agg(count(lit(1)).as("card"), countDistinct(col("grp")).as("n_runs"))
      .withColumn("arr_b", col("card") * 2)
      .withColumn("run_b", col("n_runs") * 4 + 2)
      .withColumn("ctype",
        when(col("run_b") < least(col("arr_b"), lit(8192L)), "run")
          .when(col("card") < 4096, "array")
          .otherwise("bitmap"))
      .withColumn("cbytes",
        when(col("ctype") === "run", col("run_b"))
          .when(col("ctype") === "array", col("arr_b"))
          .otherwise(lit(8192L)))
    cont.groupBy(col("file_id"))
      .agg(sum(col("card")).as("deleted"),
        count(lit(1)).as("n_containers"),
        sum(when(col("ctype") === "array", 1L).otherwise(0L)).as("n_array"),
        sum(when(col("ctype") === "bitmap", 1L).otherwise(0L)).as("n_bitmap"),
        sum(when(col("ctype") === "run", 1L).otherwise(0L)).as("n_run"),
        sum(col("cbytes")).as("container_bytes"))
      .withColumn("roaring_bytes",
        lit(8L) + ceil(col("n_containers") / 8.0).cast("long") +
          col("n_containers") * 4 + col("container_bytes"))
      .join(rc, Seq("file_id"))
      .withColumn("naive_bytes",
        least(col("deleted") * 4, ceil(col("record_count") / 8.0).cast("long")))
      .withColumn("compression_x",
        round(col("naive_bytes") * 1.0 / col("roaring_bytes"), 4))
      .withColumn("storage",
        when(col("roaring_bytes") <= inlineThreshold, "inline").otherwise("external"))
      .select(col("file_id"), col("deleted"), col("n_containers"), col("n_array"),
        col("n_bitmap"), col("n_run"), col("roaring_bytes"), col("naive_bytes"),
        col("compression_x"), col("storage"))
      .orderBy("file_id")
  }
}
