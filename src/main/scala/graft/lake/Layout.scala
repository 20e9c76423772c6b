package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Writer-organization / data-layout operators (SURVEY.md §2.2).
  *
  * The reference's headline result (README.md:59-62, images/skip_rates.png):
  * unsorted writes give ~0% file skip rate and ~100% per-file domain span,
  * sorted writes give ~99% skip and ~1% span. `skipRateReport` reproduces
  * that comparison analytically from per-file min/max stats; `writeSorted`
  * is the actual sorted writer (range repartition + in-partition sort, the
  * Spark-native way to get clustered parquet files with tight min/max).
  */
object Layout {

  /** Per-layout skip-rate report for a shipdate range predicate.
    *
    * Layout "unsorted": files assigned by key hash (write arrival order) —
    * every file spans nearly the whole shipdate domain.
    * Layout "sorted": files assigned by shipdate rank (what writeSorted
    * produces) — each file covers a narrow slice.
    */
  def skipRateReport(lineitem: DataFrame, lo: String, hi: String, nFiles: Int = 40): DataFrame = {
    // Clustered layout model: equal-width date buckets — pure arithmetic
    // against the (broadcast) global min/max, so unlike an ntile over a
    // global ordering it needs no single-partition sort and survives any
    // scale. (The real writer, writeSorted below, range-partitions instead;
    // both yield files covering narrow, nearly disjoint key slices.)
    // Both layouts' file assignments are emitted from ONE fact scan (a
    // 2-element generator per row) instead of a self-union — the shuffle
    // volume is identical but the scan count halves.
    val global = lineitem.agg(
      min(col("l_shipdate")).as("gmin"), max(col("l_shipdate")).as("gmax"))
    val sortedFid = least(
      floor((unix_date(to_date(col("l_shipdate"))) - unix_date(to_date(col("gmin")))) * nFiles /
        (unix_date(to_date(col("gmax"))) - unix_date(to_date(col("gmin"))) + 1)).cast("long"),
      lit(nFiles - 1L))
    lineitem.join(broadcast(global))
      .select(col("l_shipdate"),
        explode(array(
          struct(lit("unsorted").as("layout"), (col("l_orderkey") % nFiles).as("file_id")),
          struct(lit("sorted").as("layout"), sortedFid.as("file_id")))).as("lf"))
      .select(col("lf.layout").as("layout"), col("lf.file_id").as("file_id"), col("l_shipdate"))
      .groupBy(col("layout"), col("file_id"))
      .agg(min(col("l_shipdate")).as("fmin"), max(col("l_shipdate")).as("fmax"))
      .join(broadcast(global))
      .withColumn("span_pct",
        (unix_date(to_date(col("fmax"))) - unix_date(to_date(col("fmin")))).cast("double") /
          (unix_date(to_date(col("gmax"))) - unix_date(to_date(col("gmin")))).cast("double") * 100.0)
      .withColumn("skipped", col("fmax") < lit(lo).cast("timestamp") || col("fmin") > lit(hi).cast("timestamp"))
      .groupBy(col("layout"))
      .agg(
        count(lit(1)).as("files_total"),
        sum(when(col("skipped"), 1L).otherwise(0L)).as("files_skipped"),
        round(sum(when(col("skipped"), 1L).otherwise(0L)) * 100.0 / count(lit(1)), 4).as("skip_rate_pct"),
        round(avg(col("span_pct")), 4).as("avg_span_pct"))
      .orderBy("layout")
  }

  /** Sort-order evolution: a table whose history mixes write eras — rows
    * with even orderkey were written before the sort-order change (hash
    * arrival layout), odd rows after (date-clustered layout). Per era:
    * file count, average domain span and skip rate for the same range
    * predicate — quantifying how much of the table still pays the unsorted
    * penalty and what a rewrite of the old era would buy (Iceberg tables
    * carry the sort-order id per file for exactly this accounting). */
  def sortOrderEvolution(lineitem: DataFrame, lo: String = "1997-01-01",
                         hi: String = "1997-03-31", nFilesPerEra: Int = 20): DataFrame = {
    val global = lineitem.agg(
      min(unix_date(to_date(col("l_shipdate")))).as("gmin"),
      max(unix_date(to_date(col("l_shipdate")))).as("gmax"))
    val eras = lineitem.join(broadcast(global))
      .withColumn("d", unix_date(to_date(col("l_shipdate"))))
      .withColumn("era", when(col("l_orderkey") % 2 === 0, "v1_unsorted").otherwise("v2_clustered"))
      .withColumn("file_id",
        when(col("era") === "v1_unsorted", (col("l_orderkey") / 2) % nFilesPerEra)
          .otherwise(least(
            floor((col("d") - col("gmin")) * nFilesPerEra / (col("gmax") - col("gmin") + 1)),
            lit(nFilesPerEra - 1L))).cast("long"))
    eras
      .groupBy(col("era"), col("file_id"))
      .agg(min(col("d")).as("fmin"), max(col("d")).as("fmax"),
        min(col("gmin")).as("gmin"), min(col("gmax")).as("gmax"))
      .withColumn("span_pct", round((col("fmax") - col("fmin")) * 100.0 / (col("gmax") - col("gmin")), 4))
      .withColumn("skipped",
        col("fmax") < unix_date(lit(lo).cast("date")) || col("fmin") > unix_date(lit(hi).cast("date")))
      .groupBy(col("era"))
      .agg(count(lit(1)).as("files_total"),
        sum(when(col("skipped"), 1L).otherwise(0L)).as("files_skipped"),
        round(sum(when(col("skipped"), 1L).otherwise(0L)) * 100.0 / count(lit(1)), 4).as("skip_rate_pct"),
        round(avg(col("span_pct")), 4).as("avg_span_pct"))
      .orderBy("era")
  }

  /** Multi-dimensional clustering comparison: linear (one-dim sort) vs
    * Z-order (bit-interleaved two-dim) file layout.
    *
    * Both dims are scaled to 8-bit coordinates (shipdate → equal-width date
    * buckets against the broadcast global min/max; partkey → mod-256), the
    * Z-value interleaves their bits, and files are equal-width slices of the
    * resulting key. The report shows the trade the reference's writer
    * benchmark quantifies for one dimension, extended to two: linear gives
    * minimal shipdate span but ~full partkey span per file; Z-order bounds
    * BOTH spans, so a conjunctive two-dim predicate (x∈[100,131], y∈[0,63])
    * skips far more files. Pure integer arithmetic — no sort, no ntile —
    * identical in the DuckDB oracle. */
  def zorderReport(lineitem: DataFrame, nFiles: Int = 40): DataFrame = {
    val global = lineitem.agg(
      min(unix_date(to_date(col("l_shipdate")))).as("gmin"),
      max(unix_date(to_date(col("l_shipdate")))).as("gmax"))
    val coords = lineitem.join(broadcast(global))
      .withColumn("x", least(
        floor((unix_date(to_date(col("l_shipdate"))) - col("gmin")) * 256 /
          (col("gmax") - col("gmin") + 1)).cast("long"), lit(255L)))
      .withColumn("y", col("l_partkey") % 256)
    val zBits = (0 until 8).map { i =>
      expr(s"shiftleft(shiftright(x, $i) & 1, ${2 * i}) + shiftleft(shiftright(y, $i) & 1, ${2 * i + 1})")
    }.reduce(_ + _)
    val layouts = coords
      .withColumn("z", zBits)
      .select(col("x"), col("y"),
        explode(array(
          struct(lit("linear").as("layout"), (col("x") * nFiles / 256).cast("long").as("file_id")),
          struct(lit("zorder").as("layout"), (col("z") * nFiles / 65536).cast("long").as("file_id"))
        )).as("l"))
      .select(col("l.layout").as("layout"), col("l.file_id").as("file_id"), col("x"), col("y"))
    layouts
      .groupBy(col("layout"), col("file_id"))
      .agg(min(col("x")).as("fxmin"), max(col("x")).as("fxmax"),
           min(col("y")).as("fymin"), max(col("y")).as("fymax"))
      .withColumn("skipped",
        col("fxmax") < 100 || col("fxmin") > 131 || col("fymin") > 63)
      .groupBy(col("layout"))
      .agg(count(lit(1)).as("files_total"),
           round(avg((col("fxmax") - col("fxmin")) * 100.0 / 255.0), 4).as("avg_span_x_pct"),
           round(avg((col("fymax") - col("fymin")) * 100.0 / 255.0), 4).as("avg_span_y_pct"),
           sum(when(col("skipped"), 1L).otherwise(0L)).as("files_skipped"),
           round(sum(when(col("skipped"), 1L).otherwise(0L)) * 100.0 / count(lit(1)), 4).as("skip_rate_pct"))
      .orderBy("layout")
  }

  /** Row-group-granularity pruning: the catalog prunes *files*, but parquet
    * actually skips at *row-group* granularity — the reference reads
    * per-row-group column metadata, not just file stats
    * (poc/test_wide_table_pruning.py:255, images/row_group_ranges.png).
    * Model: `nFiles` files × `rgPerFile` row groups per layout. "sorted"
    * slices the date domain into nFiles·rgPerFile equal-width fine buckets
    * (file = bucket div rgPerFile, row group = bucket mod rgPerFile — the
    * layout a range-partitioning sorted writer produces); "unsorted" assigns
    * both by arrival hash. Report per layout: skip rate with file-level
    * stats vs row-group stats, plus the row groups pruned *inside* files
    * that file-level stats could not skip — the granularity dividend that
    * decides whether a rewrite is worth it. One fact scan (2-element
    * generator); every later stage runs on metadata-sized stats tables. */
  def rowGroupPrune(lineitem: DataFrame, lo: String = "1997-01-01", hi: String = "1997-03-31",
                    nFiles: Int = 20, rgPerFile: Int = 4): DataFrame = {
    val nSlices = nFiles * rgPerFile
    val global = lineitem.agg(
      min(unix_date(to_date(col("l_shipdate")))).as("gmin"),
      max(unix_date(to_date(col("l_shipdate")))).as("gmax"))
    val base = lineitem.join(broadcast(global))
      .withColumn("d", unix_date(to_date(col("l_shipdate"))))
      .withColumn("fine", least(
        floor((col("d") - col("gmin")) * nSlices / (col("gmax") - col("gmin") + 1)),
        lit(nSlices - 1L)))
      .select(col("d"), explode(array(
        struct(lit("unsorted").as("layout"),
          (col("l_orderkey") % nFiles).cast("long").as("file_id"),
          expr(s"(l_orderkey div $nFiles) % $rgPerFile").cast("long").as("rg_id")),
        struct(lit("sorted").as("layout"),
          expr(s"fine div $rgPerFile").cast("long").as("file_id"),
          (col("fine") % rgPerFile).cast("long").as("rg_id")))).as("a"))
      .select(col("a.layout").as("layout"), col("a.file_id").as("file_id"),
        col("a.rg_id").as("rg_id"), col("d"))
    val rg = base.groupBy(col("layout"), col("file_id"), col("rg_id"))
      .agg(min(col("d")).as("rmin"), max(col("d")).as("rmax"))
    val wFile = Window.partitionBy(col("layout"), col("file_id"))
    val loD = unix_date(lit(lo).cast("date"))
    val hiD = unix_date(lit(hi).cast("date"))
    rg
      .withColumn("fmin", min(col("rmin")).over(wFile))
      .withColumn("fmax", max(col("rmax")).over(wFile))
      .withColumn("rg_skip", col("rmax") < loD || col("rmin") > hiD)
      .withColumn("file_skip", col("fmax") < loD || col("fmin") > hiD)
      .groupBy(col("layout"))
      .agg(
        countDistinct(col("file_id")).as("files_total"),
        countDistinct(when(col("file_skip"), col("file_id"))).as("files_skipped"),
        count(lit(1)).as("rowgroups_total"),
        sum(when(col("rg_skip"), 1L).otherwise(0L)).as("rowgroups_skipped"),
        sum(when(col("rg_skip") && !col("file_skip"), 1L).otherwise(0L)).as("rg_extra_skipped"))
      .withColumn("file_skip_pct", round(col("files_skipped") * 100.0 / col("files_total"), 4))
      .withColumn("rg_skip_pct", round(col("rowgroups_skipped") * 100.0 / col("rowgroups_total"), 4))
      .orderBy("layout")
  }

  /** Clustering-depth report: the sweep-line overlap metric clustering
    * maintenance tools use to decide when to re-sort. Per layout, each
    * file's [min,max] shipdate interval contributes +1/-1 boundary events;
    * a running sum over the ordered boundaries gives how many files overlap
    * each date — avg (day-weighted) and max depth. A well-clustered layout
    * has depth ≈ 1 (disjoint files); an unsorted one has depth ≈ file count.
    * The sweep is over 2·files boundary rows (metadata scale, same class as
    * the commit-log cumulative sums — see Snapshots' scale note), not data
    * rows; no pairwise file join ever forms. */
  def clusteringDepth(lineitem: DataFrame, nFiles: Int = 40): DataFrame = {
    val global = lineitem.agg(
      min(unix_date(to_date(col("l_shipdate")))).as("gmin"),
      max(unix_date(to_date(col("l_shipdate")))).as("gmax"))
    val unsorted = FileModel.withFileId(lineitem, nFiles)
      .select(lit("unsorted").as("layout"), col("file_id"), col("l_shipdate"))
    val sorted = lineitem.join(broadcast(global))
      .withColumn("file_id", least(
        floor((unix_date(to_date(col("l_shipdate"))) - col("gmin")) * nFiles /
          (col("gmax") - col("gmin") + 1)).cast("long"),
        lit(nFiles - 1L)))
      .select(lit("sorted").as("layout"), col("file_id"), col("l_shipdate"))
    val files = unsorted.unionAll(sorted)
      .groupBy(col("layout"), col("file_id"))
      .agg(min(unix_date(to_date(col("l_shipdate")))).as("dmin"),
           max(unix_date(to_date(col("l_shipdate")))).as("dmax"))
    val events = files
      .select(col("layout"), explode(array(
        struct(col("dmin").as("day"), lit(1L).as("delta")),
        struct((col("dmax") + 1).as("day"), lit(-1L).as("delta")))).as("e"))
      .groupBy(col("layout"), col("e.day").as("day"))
      .agg(sum(col("e.delta")).as("net"))
    val wRun = Window.partitionBy(col("layout")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOrd = Window.partitionBy(col("layout")).orderBy(col("day"))
    events
      .withColumn("depth", sum(col("net")).over(wRun))
      .withColumn("width", lead(col("day"), 1).over(wOrd) - col("day"))
      .filter(col("width").isNotNull && col("depth") > 0)
      .groupBy(col("layout"))
      .agg(count(lit(1)).as("n_intervals"),
           max(col("depth")).as("max_depth"),
           round(sum(col("depth") * col("width")) * 1.0 / sum(col("width")), 4).as("avg_depth"))
      .orderBy("layout")
  }

  /** Bucket-transform layout planning: Iceberg's `bucket(N, key)` partition
    * transform routes each key to exactly one of N buckets, so a point
    * lookup opens 1/N of the table; an arrival-ordered layout scatters the
    * key everywhere and (since file stats carry no partkey locality) forces
    * a full-file-set scan. Per probe key: matching rows, rows/files the scan
    * touches under each layout, and the read-amplification ratio — the
    * numbers that justify bucketing a 100 TB fact on its lookup key. The
    * bucket function is a plain modulus (engine-portable stand-in for the
    * transform's Murmur3) and every stage is a key-grouped aggregate over
    * the single fact scan; probe keys and per-bucket sizes broadcast. */
  def bucketPruning(lineitem: DataFrame, nBuckets: Int = 16, nProbes: Int = 10): DataFrame = {
    val bucketSizes = lineitem
      .groupBy((col("l_partkey") % nBuckets).as("bucket_id"))
      .agg(count(lit(1)).as("bucket_rows"))
    val tot = lineitem.agg(count(lit(1)).as("total_rows"))
    lineitem
      .filter(col("l_partkey") <= nProbes)
      .groupBy(col("l_partkey").as("probe_key"))
      .agg(count(lit(1)).as("match_rows"),
        countDistinct(col("l_orderkey") % nBuckets).as("unbucketed_files_w_key"))
      .withColumn("bucket_id", col("probe_key") % nBuckets)
      .join(broadcast(bucketSizes), "bucket_id")
      .crossJoin(broadcast(tot))
      .select(col("probe_key"), col("bucket_id"), col("match_rows"),
        lit(1L).as("bucketed_files_scanned"),
        col("bucket_rows").as("bucketed_rows_scanned"),
        lit(nBuckets.toLong).as("unbucketed_files_scanned"),
        col("total_rows").as("unbucketed_rows_scanned"),
        col("unbucketed_files_w_key"),
        round(col("bucket_rows") * 1.0 / col("match_rows"), 4).as("bucketed_amplification"),
        round(col("total_rows") * 1.0 / col("match_rows"), 4).as("unbucketed_amplification"))
      .orderBy("probe_key")
  }

  /** Sort-key advisor: how well would clustering the table on each
    * candidate key serve the shipdate-range workload? Each candidate layout
    * slices its own key's domain into `nFiles` equal-width files, then the
    * report *measures* the resulting shipdate span/skip per file instead of
    * assuming — catching hidden correlations (arrival order ≈ time) that
    * make a non-obvious key serve a time predicate, exactly what a layout
    * advisor must detect before recommending an expensive rewrite. One fact
    * scan (3-element generator over the broadcast min/max row); everything
    * downstream is file-count-sized. */
  def sortKeyChoice(lineitem: DataFrame, lo: String = "1997-01-01",
                    hi: String = "1997-03-31", nFiles: Int = 40): DataFrame = {
    val global = lineitem.agg(
      min(unix_date(to_date(col("l_shipdate")))).as("dmin"),
      max(unix_date(to_date(col("l_shipdate")))).as("dmax"),
      min(col("l_partkey")).as("pmin"), max(col("l_partkey")).as("pmax"),
      min(col("l_orderkey")).as("omin"), max(col("l_orderkey")).as("omax"))
    def fid(v: org.apache.spark.sql.Column, lo0: org.apache.spark.sql.Column,
            hi0: org.apache.spark.sql.Column) =
      least(floor((v - lo0) * nFiles / (hi0 - lo0 + 1)), lit(nFiles - 1L)).cast("long")
    val base = lineitem.join(broadcast(global))
      .withColumn("d", unix_date(to_date(col("l_shipdate"))))
      .select(col("d"), explode(array(
        struct(lit("1_shipdate").as("sort_key"), fid(col("d"), col("dmin"), col("dmax")).as("file_id")),
        struct(lit("2_orderkey").as("sort_key"), fid(col("l_orderkey"), col("omin"), col("omax")).as("file_id")),
        struct(lit("3_partkey").as("sort_key"), fid(col("l_partkey"), col("pmin"), col("pmax")).as("file_id"))
      )).as("a"))
      .select(col("a.sort_key").as("sort_key"), col("a.file_id").as("file_id"), col("d"))
    val loD = unix_date(lit(lo).cast("date"))
    val hiD = unix_date(lit(hi).cast("date"))
    base.groupBy(col("sort_key"), col("file_id"))
      .agg(min(col("d")).as("fmin"), max(col("d")).as("fmax"))
      .join(broadcast(global.select(col("dmin"), col("dmax"))))
      .withColumn("skipped", col("fmax") < loD || col("fmin") > hiD)
      .groupBy(col("sort_key"))
      .agg(count(lit(1)).as("files_total"),
        sum(when(col("skipped"), 1L).otherwise(0L)).as("files_skipped"),
        round(sum(when(col("skipped"), 1L).otherwise(0L)) * 100.0 / count(lit(1)), 4).as("skip_rate_pct"),
        // Exact integer Σ of per-file spans, divided once: avg() over the
        // non-representable per-file doubles is summation-order-sensitive and
        // can flake a 4-dp oracle boundary (the text_heaps/readability class).
        round(sum(col("fmax") - col("fmin")) * 100.0 /
          (count(lit(1)) * (max(col("dmax")) - max(col("dmin")))), 4).as("avg_span_pct"))
      .orderBy("sort_key")
  }

  /** Partition-size skew report: per month partition, its share of table
    * bytes and ratio to the mean — the planner-facing answer to "is this
    * partitioning key safe to shuffle on, and which partitions need
    * salting/splitting". Hot partitions (>2× mean) are flagged the way AQE's
    * skew-join detector flags shuffle blocks. One fact scan → month-key
    * aggregate (bounded by calendar span); the stats row broadcasts. */
  def partitionSkew(lineitem: DataFrame): DataFrame = {
    val parts = lineitem
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("part_month"))
      .agg((count(lit(1)) * 100L).as("part_bytes"))
    val stats = parts.agg(sum(col("part_bytes")).as("tot_bytes"),
      count(lit(1)).as("n_parts"), max(col("part_bytes")).as("max_bytes"))
    // Flags compare exact integers (bytes·n vs 2·total) — no double boundary.
    parts.crossJoin(broadcast(stats))
      .select(col("part_month"), col("part_bytes"),
        round(col("part_bytes") * 100.0 / col("tot_bytes"), 4).as("pct_of_total"),
        round(col("part_bytes") * col("n_parts") * 1.0 / col("tot_bytes"), 4).as("ratio_to_avg"),
        (col("part_bytes") * 2L > col("max_bytes")).as("near_hottest"),
        (col("part_bytes") * col("n_parts") > col("tot_bytes") * 2L).as("is_hot"))
      .orderBy("part_month")
  }

  /** The real sorted writer: range-repartition by the clustering key then
    * sort within partitions → each output parquet file holds a tight,
    * non-overlapping key range (used by LayoutSpec against a tmp dir). */
  def writeSorted(df: DataFrame, sortCol: String, outDir: String, numFiles: Int = 8): Unit =
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode(SaveMode.Overwrite).parquet(outDir)
}
