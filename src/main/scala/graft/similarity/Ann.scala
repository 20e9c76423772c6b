package graft.similarity

import graft.plans.Checkpoints._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2.4).
  *
  * Three tiers, mirroring how ANN actually scales:
  *  - `bruteForceTopK`: exact baseline — a bounded query set joined against
  *    the corpus (the query side broadcasts; the corpus streams). Linear per
  *    query, the reference answer for recall measurement.
  *  - `lshTopK`: deterministic random-hyperplane LSH — corpus is bucketed by
  *    a CORPUS-ADAPTIVE signature ([[lshPlanes]]: plane count grows with
  *    log₂(n/64) so per-bucket occupancy stays ~64), candidates come only
  *    from the query's bucket. Sub-linear; the 100 TB path (bucket count
  *    scales with corpus size, so candidate volume per query does not).
  *  - `centroidTopK`-style IVF assignment (`centroidAssign`): partition the
  *    corpus into cells around label centroids; search only within a cell.
  *
  * Determinism: dot products are sequential array folds (bit-identical to
  * the oracle's list_reduce), rankings order by cosine rounded to 6 dp with
  * id tie-breaks, hyperplane weights are closed-form integers.
  */
object Ann {

  /** Doubles + norm, shared prep (graft_dot is the codegen'd sequential
    * dot product — bit-identical to the oracle's list_reduce fold). */
  private def prep(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))

  private val dotExpr = "graft_dot(qv, v)"

  /** Exact top-k cosine neighbors for queries `vec_id < nQueries`. */
  def bruteForceTopK(embeddings: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val base = prep(embeddings)
    val queries = base.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = base.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(expr(dotExpr) / (col("qn") * col("nrm")), 6))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rk"), col("cos"))
      .orderBy("q_id", "rk")
  }

  /** Filtered (hybrid) search: a metadata predicate composed with vector
    * top-k — "nearest neighbors among vectors with the same label", the
    * filtered-ANN surface every vector store exposes. The filter lands
    * *before* candidate scoring as a hash-join on the label key, so the
    * pruning is planned by Catalyst like any relational predicate (at scale
    * the label would be the partition key and the join collapses into
    * partition pruning); scoring and ranking reuse the brute-force shape
    * over the reduced candidate set. */
  def filteredTopK(embeddings: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val base = prep(embeddings)
    val queries = base.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("label"), col("v").as("qv"), col("nrm").as("qn"))
    base.join(broadcast(queries), Seq("label"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(expr(dotExpr) / (col("qn") * col("nrm")), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("label").cast("long").as("label"),
        col("vec_id").as("neighbor_id"), col("rk"), col("cos"))
      .orderBy("q_id", "rk")
  }

  /** Corpus-adaptive hyperplane count — the fix for the defect the r9
    * scale-trend harness flagged on `knn_lsh` (cpu exponent 1.50): with a
    * FIXED 8-plane/256-bucket signature, per-bucket occupancy grows ∝ n, so
    * candidates per query — and total join work — grow linearly in corpus
    * size and the "index" degrades into a 1/256 scan at 100 TB. The same
    * scaling law as [[graft.dedup.Dedup.embBandParams]] instead holds
    * occupancy at ~64 vectors per bucket by growing the plane count with
    * log₂(ceil(n/64)) — an integer-exact ladder (no float log) so the SQL
    * oracle reproduces it bit-for-bit. Clamped to [3, 48]: ≥3 keeps the
    * signature meaningful on toy corpora, ≤48 keeps `1L << j` and the
    * bucket sum comfortably inside int64. */
  def lshPlanes(nVectors: Long): Int = {
    val m = math.max(1L, (nVectors + 63L) / 64L)
    var p = 0
    while ((1L << p) < m) p += 1
    math.min(48, math.max(3, p))
  }

  /** Deterministic integer weight in [-10, 10] for plane j, 1-based dim p1.
    * Large-prime double-mod (15485863 = the 10⁶th prime, 32452843 = the
    * 2·10⁶th) decorrelates planes at ANY plane count — the previous
    * `(j*73 + i*37) % 21` form repeats planes with period 21 in j, which a
    * fixed 8-plane signature never noticed but an adaptive ladder would
    * (identical planes = duplicate signature bits = collapsed buckets).
    * Shared with the oracle, which inlines the same literals. */
  def lshPlaneWeight(j: Int, p1: Int): Double =
    (((j * 15485863L + p1 * 32452843L) % 1000003L) % 21L - 10L).toDouble

  /** All hyperplanes as ONE array<array<double>> literal sized to the actual
    * embedding dimension. A single Literal node beats per-row
    * `array(lit, …)` constructions — the nPlanes×dim literal tree is pure
    * Janino compile cost (graft_dot throws on length mismatch, so dimension
    * drift still fails loudly). */
  private def planesLit(dim: Int, nPlanes: Int) = typedlit(
    Seq.tabulate(nPlanes)(j => Seq.tabulate(dim)(p0 => lshPlaneWeight(j, p0 + 1))))

  /** Embedding dimension read from the data (one 1-row job at plan-build
    * time; the table's dim is schema-stable so any row is authoritative). */
  private def embeddingDim(embeddings: DataFrame): Int =
    embeddings.select(size(col("embedding"))).head().getInt(0)

  /** Adaptive LSH bucket signature for every vector (one transform over the
    * plane-matrix literal computes all projections in a single pass);
    * returns the bucketed frame plus the plane count the corpus selected
    * (multi-probe needs it for its Hamming-1 expansion). */
  def withBucket(embeddings: DataFrame): (DataFrame, Int) = {
    val base = prep(embeddings)
    val dim = embeddingDim(embeddings)
    val nPlanes = lshPlanes(embeddings.count())
    val withProj = base.withColumn("proj",
      transform(planesLit(dim, nPlanes), p => call_function("graft_dot", col("v"), p)))
    val bucket = (0 until nPlanes)
      .map(j => when(element_at(col("proj"), j + 1) > 0, lit(1L << j)).otherwise(0L))
      .reduce(_ + _)
    (withProj.withColumn("bucket", bucket).drop("proj"), nPlanes)
  }

  /** LSH-bucketed ANN: candidates restricted to the query's bucket. */
  def lshTopK(embeddings: DataFrame, nQueries: Int = 10, k: Int = 3): DataFrame = {
    val (bucketed, _) = withBucket(embeddings)
    val queries = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"), col("bucket"))
    bucketed.join(queries, Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(expr(dotExpr) / (col("qn") * col("nrm")), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("bucket"), col("vec_id").as("neighbor_id"), col("rk"), col("cos"))
      .orderBy("q_id", "rk")
  }

  /** Multi-probe LSH: each query probes its own bucket plus every bucket at
    * Hamming distance 1 (one hyperplane flipped) — the standard recall
    * recovery for bucketed ANN without rebuilding the index. Probe expansion
    * is an (nPlanes+1)-element generator on the query side (queries are the
    * small side), candidates still come only from bucket-equality joins; the
    * flip count tracks the adaptive plane ladder so probe volume stays
    * O(log n) per query. */
  def multiProbeTopK(embeddings: DataFrame, nQueries: Int = 10, k: Int = 3): DataFrame = {
    val (bucketed, nPlanes) = withBucket(embeddings)
    val probes = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"), col("bucket"))
      .select(col("q_id"), col("qv"), col("qn"),
        explode(array(col("bucket") +: (0 until nPlanes).map(j => col("bucket").bitwiseXOR(lit(1L << j))): _*))
          .as("bucket"))
    bucketed.join(probes, Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(expr(dotExpr) / (col("qn") * col("nrm")), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rk"), col("cos"))
      .orderBy("q_id", "rk")
  }

  /** Recall report: per query, how many of the exact top-k neighbors the
    * bucketed LSH search recovered (the standard ANN quality metric,
    * computed as a semi-join of the two result sets). */
  def lshRecall(embeddings: DataFrame, nQueries: Int = 10, k: Int = 3): DataFrame = {
    val exact = bruteForceTopK(embeddings, nQueries, k)
      .select(col("q_id"), col("neighbor_id"))
    val approx = lshTopK(embeddings, nQueries, k)
      .select(col("q_id"), col("neighbor_id"))
    exact
      .join(approx.withColumn("hit", lit(1L)), Seq("q_id", "neighbor_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("k"),
           sum(coalesce(col("hit"), lit(0L))).as("recovered"))
      .withColumn("recall", round(col("recovered") / col("k"), 6))
      .orderBy("q_id")
  }

  /** Assign every vector to its max-cosine centroid (6-dp rounded, cell-id
    * tie-break); keeps v/nrm so the result can feed a recompute round. */
  /** Argmax-by-(cos desc, cell asc) per vector as a hash aggregation
    * (max_by over the unique (cos, -cell) ordering key) — map-side partials
    * and no per-partition sort, unlike a row_number window. */
  private def assignCells(base: DataFrame, cent: DataFrame): DataFrame =
    base.join(broadcast(cent))
      .withColumn("cos", round(expr("graft_dot(v, cv)") / (col("nrm") * col("cn")), 6))
      .groupBy(col("vec_id"))
      .agg(max_by(
        struct(col("label"), col("nrm"), col("v"), col("cell"), col("cos")),
        struct(col("cos"), (-col("cell")).as("ncell"))).as("best"))
      .select(col("vec_id"), col("best.label").as("label"), col("best.nrm").as("nrm"),
        col("best.v").as("v"), col("best.cell").as("cell"), col("best.cos").as("cos"))

  /** Trained IVF: deterministic k-means (init = vectors 0..k-1, `iters`
    * Lloyd rounds of assign → mean-recompute) and the final cell × label
    * composition. This is the index-build path for centroid ANN — each
    * round is one broadcast of k centroid vectors against the corpus plus
    * one per-cell aggregation, so a round costs a single corpus pass at any
    * scale and never materialises pairwise distances. Centroid means round
    * to 9 dp at the aggregation boundary (engine-independent, like
    * centroidAssign). */
  def kmeansCells(embeddings: DataFrame, k: Int = 4, iters: Int = 2): DataFrame = {
    val base = prep(embeddings)
    var cent = base.filter(col("vec_id") < k)
      .select(col("vec_id").as("cell"), col("v").as("cv"), col("nrm").as("cn"))
    for (_ <- 1 until iters) {
      val assigned = assignCells(base, cent)
      cent = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(round(avg(col("x")), 9).as("c"))
        .groupBy(col("cell"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)").as("cv"))
        .withColumn("cn", expr("sqrt(graft_dot(cv, cv))"))
    }
    // avg over already-6dp-quantized cos values goes through an exact integer
    // sum (micro-units) — a float avg is summation-order-dependent and flips
    // the 6dp rounding on boundary means (observed once in the oracle's
    // parallel avg); integer sums are order-free on any engine.
    assignCells(base, cent)
      .groupBy(col("cell"), col("label"))
      .agg(count(lit(1)).as("n"),
        round(sum(round(col("cos") * 1e6, 0).cast("long")) / (count(lit(1)) * 1e6), 6).as("avg_cos"))
      .orderBy("cell", "label")
  }

  /** IVF probe sweep: recall@k as a function of how many coarse cells each
    * query probes — the nprobe knob every IVF deployment tunes (probe few
    * cells → fast but lossy; more cells → recall approaches exact). Cells
    * are the label-mean centroids (same fragment as `centroidAssign`);
    * vectors are assigned to their max-cosine cell, queries rank cells the
    * same way, and for nprobe = 1..`maxProbe` the candidate set is the
    * union of the query's top-nprobe cells. Ground truth is the exact
    * brute-force top-k. Candidate generation is an equi-join on the cell
    * key — the sweep never scores more than (nprobe/k_cells) of the corpus
    * per query, which is the whole point at 100 TB. */
  def probeSweep(embeddings: DataFrame, nQueries: Int = 10, k: Int = 5,
                 maxProbe: Int = 3): DataFrame = {
    val base = prep(embeddings)
    val exploded = base.select(col("vec_id"), col("label"), posexplode(col("v")).as(Seq("pos", "x")))
    val cent = exploded
      .groupBy(col("label").as("cell"), col("pos"))
      .agg(round(avg(col("x")), 9).as("c"))
      .groupBy(col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)").as("cv"))
      .withColumn("cn", expr("sqrt(graft_dot(cv, cv))"))
    val cells = assignCells(base, cent)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    val queries = base.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val qcells = queries.join(broadcast(cent))
      .withColumn("qcos", round(expr("graft_dot(qv, cv)") / (col("qn") * col("cn")), 6))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("qcos").desc, col("cell"))).cast("long"))
      .filter(col("crk") <= maxProbe)
      .select(col("q_id"), col("qv"), col("qn"), col("cell"), col("crk"))
    val probes = qcells
      .select(col("q_id"), col("qv"), col("qn"), col("cell"), col("crk"),
        explode(array((1 to maxProbe).map(p => lit(p.toLong)): _*)).as("nprobe"))
      .filter(col("crk") <= col("nprobe"))
    val approx = probes.join(cells, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(expr(dotExpr) / (col("qn") * col("nrm")), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("nprobe"), col("q_id")).orderBy(col("cos").desc, col("vec_id"))).cast("long"))
      .filter(col("rk") <= k)
      .select(col("nprobe"), col("q_id"), col("vec_id").as("neighbor_id"))
    val exact = bruteForceTopK(embeddings, nQueries, k)
      .select(col("q_id"), col("neighbor_id"))
      .crossJoin(broadcast(
        embeddings.sparkSession.range(1, maxProbe + 1).select(col("id").as("nprobe"))))
    exact.join(approx.withColumn("hit", lit(1L)), Seq("nprobe", "q_id", "neighbor_id"), "left")
      .groupBy(col("nprobe"))
      .agg(countDistinct(col("q_id")).as("n_queries"),
        count(lit(1)).as("expected"),
        sum(coalesce(col("hit"), lit(0L))).as("recovered"))
      .withColumn("recall_pct", round(col("recovered") * 100.0 / col("expected"), 4))
      .orderBy("nprobe")
  }

  /** Threshold (range) search: every corpus vector with cosine ≥ `minCos`
    * for each query in the bounded query set — the "all matches above τ"
    * complement to top-k. Brute force against the broadcast query side here;
    * the LSH-bucket join (`lshTopK`) is the sub-linear path when the corpus
    * outgrows a single pass. */
  def rangeSearch(embeddings: DataFrame, nQueries: Int = 20, minCos: Double = 0.35): DataFrame = {
    val base = prep(embeddings)
    val queries = base.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    base.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(expr(dotExpr) / (col("qn") * col("nrm")), 6))
      .filter(col("cos") >= minCos)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy("q_id", "neighbor_id")
  }

  /** Product quantization: the vector is split into `nSub` contiguous
    * subvectors; each subspace gets a deterministic codebook (the mean
    * subvector per label — a "trained" codebook without iteration, rounded
    * at the aggregation boundary like the IVF centroids) and every
    * subvector is assigned to its nearest codeword by squared L2. The
    * report is per-subspace quantization error + codebook usage — the
    * memory/recall trade PQ buys at 100 TB (64 floats → 8 codes). The
    * distance fold is the same sequential zip-fold as the oracle
    * (bit-identical); sub/codebook tables explode by nSub, never pairwise
    * over the corpus (codebooks broadcast). */
  def pqQuantize(embeddings: DataFrame, nSub: Int = 8): DataFrame = {
    val base = prep(embeddings)
    val dim = embeddingDim(embeddings)
    val w = dim / nSub
    val sub = base.select(col("vec_id"), col("label"),
      explode(expr(s"transform(sequence(0, ${nSub - 1}), s -> struct(s AS sub_id, slice(v, s * $w + 1, $w) AS sv))"))
        .as("p"))
      .select(col("vec_id"), col("label"), col("p.sub_id").as("sub_id"), col("p.sv").as("sv"))
    val codebook = sub
      .select(col("sub_id"), col("label").as("code"), posexplode(col("sv")).as(Seq("pos", "x")))
      .groupBy(col("sub_id"), col("code"), col("pos"))
      .agg(round(avg(col("x")), 9).as("c"))
      .groupBy(col("sub_id"), col("code"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)").as("cv"))
    // Nearest codeword = lexicographic min of (sq_err, code) — an aggregation
    // with map-side partials, not a window sort.
    val assigned = sub.join(broadcast(codebook), Seq("sub_id"))
      .withColumn("sq_err",
        round(expr("aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)), 0D, (a, b) -> a + b)"), 9))
      .groupBy(col("vec_id"), col("sub_id"))
      .agg(min(struct(col("sq_err"), col("code"))).as("best"))
      .select(col("vec_id"), col("sub_id"),
        col("best.code").as("code"), col("best.sq_err").as("sq_err"))
    // sq_err is 9dp-quantized → exact nano-unit integer sum for the average
    // (order-free; see centroid avg_cos note).
    assigned
      .groupBy(col("sub_id").cast("long").as("sub_id"))
      .agg(count(lit(1)).as("n_vectors"),
        countDistinct(col("code")).as("codes_used"),
        round(sum(round(col("sq_err") * 1e9, 0).cast("long")) / (count(lit(1)) * 1e9), 6).as("avg_sq_err"),
        round(max(col("sq_err")), 6).as("max_sq_err"))
      .orderBy("sub_id")
  }

  /** IVF-PQ composite (the FAISS-style index shape for billion-vector ANN):
    * vectors are assigned to label-centroid cells (IVF), the cell centroid
    * is subtracted, and the *residual* is product-quantized — `nSub`
    * subspaces, a deterministic per-(subspace, label) codebook of mean
    * residual subvectors, nearest codeword by squared L2. Report per cell:
    * membership, residual energy before quantization, and the PQ
    * reconstruction error after — the accuracy the residual trick buys over
    * PQ on raw vectors (same storage: 8 codes/vector). Every stage is one
    * corpus pass + a broadcast of dim-bounded centroid/codebook tables;
    * averages of quantized values go through exact nano-unit integer sums
    * (order-free, see pqQuantize). */
  def ivfPq(embeddings: DataFrame, nSub: Int = 8): DataFrame = {
    val base = prep(embeddings)
    val dim = embeddingDim(embeddings)
    val w = dim / nSub
    val exploded = base.select(col("vec_id"), col("label"), col("nrm"),
      posexplode(col("v")).as(Seq("pos", "x")))
    val centroids = exploded
      .groupBy(col("label").as("clabel"), col("pos"))
      .agg(round(avg(col("x")), 9).as("c"))
    val cvec = centroids
      .groupBy(col("clabel"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)").as("cv"))
      .withColumn("cn", expr("sqrt(graft_dot(cv, cv))"))
    // Cell assignment is an argmax aggregation (see assignCells), the
    // residual computed once on the single surviving row per vector.
    val assigned = base.join(broadcast(cvec))
      .withColumn("cos", round(expr("graft_dot(v, cv)") / (col("nrm") * col("cn")), 6))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("label"), col("clabel"), col("v"), col("cv")),
        struct(col("cos"), (-col("clabel")).as("nc"))).as("best"))
      .select(col("vec_id"), col("best.label").as("label"),
        col("best.clabel").as("cell"),
        expr("zip_with(best.v, best.cv, (a, b) -> a - b)").as("res"))
      .stableCheckpoint()
    val sub = assigned.select(col("vec_id"), col("label"), col("cell"),
      explode(expr(s"transform(sequence(0, ${nSub - 1}), s -> struct(s AS sub_id, slice(res, s * $w + 1, $w) AS sv))"))
        .as("p"))
      .select(col("vec_id"), col("label"), col("cell"),
        col("p.sub_id").as("sub_id"), col("p.sv").as("sv"))
    val codebook = sub
      .select(col("sub_id"), col("label").as("code"), posexplode(col("sv")).as(Seq("pos", "x")))
      .groupBy(col("sub_id"), col("code"), col("pos"))
      .agg(round(avg(col("x")), 9).as("c"))
      .groupBy(col("sub_id"), col("code"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)").as("cbv"))
    // res_sq depends only on the subvector (identical across candidate
    // codes), so max() recovers it; codeword choice is the (sq_err, code)
    // lexicographic min — both plain aggregations, no window sort.
    val coded = sub.join(broadcast(codebook), Seq("sub_id"))
      .withColumn("res_sq",
        round(expr("aggregate(sv, 0D, (a, b) -> a + b * b)"), 9))
      .withColumn("sq_err",
        round(expr("aggregate(zip_with(sv, cbv, (x, y) -> (x - y) * (x - y)), 0D, (a, b) -> a + b)"), 9))
      .groupBy(col("vec_id"), col("sub_id"), col("cell"))
      .agg(max(col("res_sq")).as("res_sq"),
        min(struct(col("sq_err"), col("code"))).as("best"))
      .select(col("vec_id"), col("sub_id"), col("cell"),
        col("res_sq"), col("best.sq_err").as("sq_err"))
    coded
      .groupBy(col("vec_id"), col("cell"))
      .agg(round(sum(col("res_sq")), 9).as("res_energy"),
        round(sum(col("sq_err")), 9).as("pq_err"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"),
        round(sum(round(col("res_energy") * 1e9, 0).cast("long")) / (count(lit(1)) * 1e9), 6).as("avg_res_energy"),
        round(sum(round(col("pq_err") * 1e9, 0).cast("long")) / (count(lit(1)) * 1e9), 6).as("avg_pq_err"))
      .orderBy("cell")
  }

  /** Matryoshka truncation quality: top-k retrieval with only the first
    * `prefixDim` dimensions vs the full vector, reported as recall@k per
    * query — the quality/cost curve of prefix-truncated (MRL-style)
    * embeddings, where a shorter prefix means proportionally less I/O and
    * compute at 100 TB. Both rankings reuse the bounded-query broadcast
    * join; the overlap is a semi-join of two k-row-per-query tables. */
  def matryoshkaRecall(embeddings: DataFrame, nQueries: Int = 10, k: Int = 5,
                       prefixDim: Int = 16): DataFrame = {
    def topk(base: DataFrame, vcol: String => String): DataFrame = {
      val queries = base.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      base.join(broadcast(queries), col("vec_id") =!= col("q_id"))
        .withColumn("cos", round(expr(vcol("qv")) / (col("qn") * col("nrm")), 6))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))))
        .filter(col("rk") <= k)
        .select(col("q_id"), col("vec_id"))
    }
    val full = topk(prep(embeddings), qv => s"graft_dot($qv, v)")
    val truncBase = prep(embeddings)
      .withColumn("v", expr(s"slice(v, 1, $prefixDim)"))
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
    val trunc = topk(truncBase, qv => s"graft_dot($qv, v)")
      .select(col("q_id").as("t_q"), col("vec_id").as("t_id"))
    val hits = full
      .join(trunc, col("q_id") === col("t_q") && col("vec_id") === col("t_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("hits"))
    full.select(col("q_id")).distinct()
      .join(hits, Seq("q_id"), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .withColumn("recall_at_k", round(col("hits") * 1.0 / k, 6))
      .orderBy("q_id")
  }

  /** Two-stage retrieve-then-rerank — the production ANN serving shape: a
    * cheap COARSE pass scores every vector with only the first `prefixDim`
    * dimensions (the matryoshka I/O tier — at 100 TB the coarse scan reads
    * `prefixDim/dim` of the bytes; with PQ codes it would be the ADC pass)
    * and keeps the top `coarseC` candidates per query; only those C get the
    * exact full-dimension rerank that produces the served top-k. Reported
    * per query: recall@k against the exact full-scan ground truth for BOTH
    * the coarse-only top-k and the reranked top-k — the gap between the two
    * columns is what the rerank stage buys, and `hits_rerank ≥ hits_coarse`
    * structurally (both rankings draw from the same candidate set; the
    * exact ordering surfaces every true top-k member that survived the
    * coarse cut, the coarse ordering may bury it below rank k).
    *
    * Scale shape: queries are a bounded broadcast; the coarse scan is the
    * only corpus-wide pass (narrow vectors), the rerank joins `C` rows per
    * query back to full vectors by id — an equi-join whose left side is
    * query-bounded. Rounding/tie conventions as everywhere (6 dp, id
    * tie-break). */
  def rerankTopK(embeddings: DataFrame, nQueries: Int = 10, k: Int = 5,
                 coarseC: Int = 50, prefixDim: Int = 8): DataFrame = {
    val base = prep(embeddings)
    val narrow = base
      .withColumn("v8", expr(s"slice(v, 1, $prefixDim)"))
      .withColumn("n8", expr("sqrt(graft_dot(v8, v8))"))
      .select(col("vec_id"), col("v8"), col("n8"))
    val qN = narrow.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v8").as("qv8"), col("n8").as("qn8"))
    // coarse candidates: top-C per query by prefix-dim cosine
    val cand = narrow.join(broadcast(qN), col("vec_id") =!= col("q_id"))
      .withColumn("ccos", round(expr("graft_dot(qv8, v8)") / (col("qn8") * col("n8")), 6))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("ccos").desc, col("vec_id"))).cast("long"))
      .filter(col("crk") <= coarseC)
      .select(col("q_id"), col("vec_id"), col("crk"))
      // cand feeds the rerank join AND the coarse-top-k branch — cut it so
      // the corpus-wide coarse scan + per-query window runs once
      // (query-bounded: ≤ nQueries×coarseC rows).
      .stableCheckpoint()
    // exact rerank of the C candidates only
    val qF = base.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val rerank = cand
      .join(base.select(col("vec_id"), col("v"), col("nrm")), Seq("vec_id"))
      .join(broadcast(qF), Seq("q_id"))
      .withColumn("cos", round(expr(dotExpr) / (col("qn") * col("nrm")), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id"))
    val coarseTop = cand.filter(col("crk") <= k).select(col("q_id"), col("vec_id"))
    // exact full-scan ground truth
    val exact = base.join(broadcast(qF), col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(expr(dotExpr) / (col("qn") * col("nrm")), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id"))
    val hc = exact.join(coarseTop.select(col("q_id").as("cq"), col("vec_id").as("cid")),
        col("q_id") === col("cq") && col("vec_id") === col("cid"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("hits_coarse"))
    val hr = exact.join(rerank.select(col("q_id").as("rq"), col("vec_id").as("rid")),
        col("q_id") === col("rq") && col("vec_id") === col("rid"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("hits_rerank"))
    exact.select(col("q_id")).distinct()
      .join(hc, Seq("q_id"), "left")
      .join(hr, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("hits_coarse"), lit(0L)).as("hits_coarse"),
        round(coalesce(col("hits_coarse"), lit(0L)) * 1.0 / k, 6).as("recall_coarse"),
        coalesce(col("hits_rerank"), lit(0L)).as("hits_rerank"),
        round(coalesce(col("hits_rerank"), lit(0L)) * 1.0 / k, 6).as("recall_rerank"))
      .orderBy("q_id")
  }

  /** Scalar (int8) quantization: per-dimension [min, max] over the corpus
    * (a dim-bounded broadcast table), each component mapped to a 0..255 code
    * by floor, dequantized back, and the reconstruction error reported per
    * label — the 4×-compression/error trade SQ buys before PQ is needed.
    * Ranges come from min/max (order-independent), the error terms are
    * rounded at 9 dp before the final averages (the same double-rounding
    * convention as the centroid/PQ codebooks). */
  def sq8Quantize(embeddings: DataFrame): DataFrame = {
    val base = prep(embeddings)
    val byDim = base.select(col("vec_id"), col("label"), posexplode(col("v")).as(Seq("pos", "x")))
    val ranges = byDim.groupBy(col("pos")).agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val quantized = byDim.join(broadcast(ranges), "pos")
      .withColumn("code",
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(floor((col("x") - col("lo")) * 255.0 / (col("hi") - col("lo"))), lit(255.0)).cast("long")))
      .withColumn("deq", col("lo") + col("code") * (col("hi") - col("lo")) / 255.0)
      .withColumn("sq", round((col("x") - col("deq")) * (col("x") - col("deq")), 9))
    // mse is 9dp-quantized → exact nano-unit integer sum for the per-label
    // average (order-free; see centroid avg_cos note). codes_used is already
    // an integer, so its avg is an exact integer sum on both engines.
    quantized
      .groupBy(col("vec_id"), col("label"))
      .agg(round(avg(col("sq")), 9).as("mse"), countDistinct(col("code")).as("codes_used"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"),
        round(sum(round(col("mse") * 1e9, 0).cast("long")) / (count(lit(1)) * 1e9), 6).as("avg_mse"),
        round(max(col("mse")), 6).as("max_mse"),
        round(avg(col("codes_used")), 6).as("avg_codes_used"))
      .orderBy("label")
  }

  /** Mutual (reciprocal) top-k over the banded LSH candidate graph — the
    * SemDeDup-style verification primitive: an edge survives only if each
    * endpoint ranks the other inside its own top-`k` candidate list. One-way
    * high-cosine hits from a hub vector (near-dup clusters, templated docs)
    * fail the reciprocity test, which is what makes mutual-kNN the standard
    * screen between "candidate pair" and "semantic duplicate".
    *
    * Scale shape: the candidate graph is the memoized banded pair set
    * (`Dedup.embeddingNearDup` at the shared `EmbPairFloor`), so nothing here
    * is O(n²). The per-vector ranking is a window partitioned by the source
    * vector whose state is bounded by the LSH bucket sizes (tunable via
    * bands/rows, see `dedup_lsh_tuning`), and the reciprocity check is an
    * equi self-join of two rank-filtered edge sets on (src, dst). */
  def mutualTopK(embeddings: DataFrame, k: Int = 3): DataFrame = {
    val pairs = graft.dedup.Dedup.embeddingNearDup(embeddings, graft.dedup.Dedup.EmbPairFloor)
    val directed = pairs.select(col("vec_a").as("src"), col("vec_b").as("dst"), col("cos"))
      .union(pairs.select(col("vec_b").as("src"), col("vec_a").as("dst"), col("cos")))
    val ranked = directed
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))).cast("long"))
      .filter(col("rk") <= k)
    val reverse = ranked.select(col("dst").as("src"), col("src").as("dst"), col("rk").as("rk_b"))
    ranked.join(reverse, Seq("src", "dst"))
      .filter(col("src") < col("dst"))
      .select(col("src").as("vec_a"), col("dst").as("vec_b"), col("cos"),
        col("rk").as("rk_a"), col("rk_b"))
      .orderBy("vec_a", "vec_b")
  }

  /** IVF-style centroid assignment: label centroids (rounded to 9 dp so the
    * aggregation boundary is engine-independent), each vector assigned to its
    * max-cosine centroid; returns the label × assigned confusion counts. */
  def centroidAssign(embeddings: DataFrame): DataFrame = {
    val base = prep(embeddings)
    val exploded = base.select(col("vec_id"), col("label"), col("nrm"),
      posexplode(col("v")).as(Seq("pos", "x")))
    val centroids = exploded
      .groupBy(col("label").as("clabel"), col("pos"))
      .agg(round(avg(col("x")), 9).as("c"))
    val cvec = centroids
      .groupBy(col("clabel"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)").as("cv"))
      .withColumn("cn", expr("sqrt(graft_dot(cv, cv))"))
    val scored = base.join(broadcast(cvec))
      .withColumn("cos", round(expr("graft_dot(v, cv)") / (col("nrm") * col("cn")), 6))
    // Argmax per vector as a hash aggregation (see assignCells).
    scored
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("label"), col("clabel")),
        struct(col("cos"), (-col("clabel")).as("nc"))).as("best"))
      .groupBy(col("best.label").as("label"), col("best.clabel").as("assigned"))
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "assigned")
  }

  /** IVF list-balance audit — the index-health metric that decides when an
    * IVF index needs retraining: per-list populations from the same
    * argmax-cosine assignment as [[centroidAssign]], with FAISS's imbalance
    * factor (max_list · k / N; 1.0 = perfectly even) and the expected
    * nprobe=1 scan cost under list-mass-proportional query routing
    * (Σ lᵢ²/N — the quantity skew actually inflates: a query landing in a
    * hot list scans that whole list). The list table is k-bounded, so the
    * global stats are a 1-row broadcast onto ≤ k rows; assignment itself is
    * the linear broadcast-centroid scan. */
  def ivfBalance(embeddings: DataFrame): DataFrame = {
    val exploded = prep(embeddings).select(col("vec_id"), col("label"), col("nrm"),
      posexplode(col("v")).as(Seq("pos", "x")))
    val centroids = exploded
      .groupBy(col("label").as("clabel"), col("pos"))
      .agg(round(avg(col("x")), 9).as("c"))
    val cvec = centroids
      .groupBy(col("clabel"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)").as("cv"))
      .withColumn("cn", expr("sqrt(graft_dot(cv, cv))"))
    val lists = prep(embeddings).join(broadcast(cvec))
      .withColumn("cos", round(expr("graft_dot(v, cv)") / (col("nrm") * col("cn")), 6))
      .groupBy(col("vec_id"))
      .agg(max_by(col("clabel"), struct(col("cos"), (-col("clabel")).as("nc"))).as("assigned"))
      .groupBy(col("assigned")).agg(count(lit(1)).as("n_vecs"))
    val globals = lists.agg(count(lit(1)).as("k_lists"), sum(col("n_vecs")).as("n_total"),
      max(col("n_vecs")).as("max_list"),
      sum(col("n_vecs") * col("n_vecs")).as("sum_sq"))
    lists.crossJoin(broadcast(globals))
      .select(col("assigned"), col("n_vecs"),
        round(col("n_vecs") * 100.0 / col("n_total"), 6).as("pct"),
        round(col("max_list") * col("k_lists") * 1.0 / col("n_total"), 6).as("imbalance_x"),
        round(col("sum_sq") * 1.0 / col("n_total"), 4).as("exp_probe_cost"))
      .orderBy("assigned")
  }

  /** Greedy MMR (maximal-marginal-relevance) diversity rerank — the
    * production serving step that stops a result page being five copies of
    * the same document: pick_1 = argmax relevance; pick_i = argmax
    * 0.7·rel(d) − 0.3·max_{s∈picked} sim(d, s). The greedy loop is
    * PER-QUERY-LOCAL work over a bounded candidate set, so it runs at row
    * grain, not as k global rounds: candidates and their C×C pairwise sims
    * collapse to one row per query (arrays bounded by C and C², corpus-size
    * independent) and a single higher-order `aggregate` fold executes all k
    * argmax steps inside one codegen'd projection — one shuffle to query
    * grain, no iterative jobs (a k-round DataFrame loop measured 16.5 s of
    * pure stage-scheduling overhead at sf0.1; this shape runs in ~1 s).
    * Scores are exact integers over micro-cosines (7·rel_µ − 3·max sim_µ),
    * so comparisons and the shown score (÷1e7) carry no float
    * half-boundary; ties break on vec_id — the greedy trajectory is
    * bit-deterministic, and the argmax reducer is commutative-associative
    * over distinct ids so collect_list order cannot matter. */
  def mmrTopK(embeddings: DataFrame, nQueries: Int = 10, coarseC: Int = 20,
              k: Int = 5): DataFrame = {
    val base = prep(embeddings)
    val qF = base.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val cand = base.join(broadcast(qF), col("vec_id") =!= col("q_id"))
      .withColumn("rel_u", round(expr(dotExpr) / (col("qn") * col("nrm")) * 1e6, 0).cast("long"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("rel_u").desc, col("vec_id"))))
      .filter(col("rk") <= coarseC)
      .select(col("q_id"), col("vec_id"), col("v"), col("nrm"), col("rel_u"))
      .stableCheckpoint()
    val candRows = cand.groupBy(col("q_id"))
      .agg(expr("collect_list(struct(vec_id, rel_u))").as("cands"))
    val simRows = cand.as("a")
      .join(cand.as("b"),
        col("a.q_id") === col("b.q_id") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.q_id").as("q_id"), col("a.vec_id").as("d_id"),
        col("b.vec_id").as("s_id"),
        round(expr("graft_dot(a.v, b.v)") / (col("a.nrm") * col("b.nrm")) * 1e6, 0)
          .cast("long").as("sim_u"))
      .groupBy(col("q_id"))
      .agg(expr("collect_list(struct(d_id, s_id, sim_u))").as("simarr"))
    // Fold over picks 1..k: each step scores the still-unselected
    // candidates (penalty = max sim to the selected set, absent → 0) and
    // appends the argmax (ties → lowest id). Sentinel id −1 can only win if
    // a query has fewer than k candidates (not possible at C ≥ k).
    val greedy =
      s"""aggregate(
         |  sequence(1, $k),
         |  cast(array() as array<struct<id: bigint, score_u: bigint>>),
         |  (sel, i) -> array_append(sel,
         |    aggregate(
         |      transform(
         |        filter(cands, c -> NOT exists(sel, s -> s.id = c.vec_id)),
         |        c -> struct(c.vec_id as id,
         |          7 * c.rel_u - coalesce(3 * array_max(transform(
         |            filter(simarr, p -> p.d_id = c.vec_id
         |                        AND exists(sel, s -> s.id = p.s_id)),
         |            p -> p.sim_u)), cast(0 as bigint)) as score_u)),
         |      struct(cast(-1 as bigint) as id, cast(${-(1L << 62)} as bigint) as score_u),
         |      (best, c) -> IF(c.score_u > best.score_u
         |                      OR (c.score_u = best.score_u AND c.id < best.id), c, best))))""".stripMargin
    candRows.join(simRows, Seq("q_id"))
      .select(col("q_id"), posexplode(expr(greedy)).as(Seq("pos", "s")))
      .select(col("q_id"), col("s.id").as("vec_id"),
        (col("pos") + 1).cast("long").as("pick"),
        (col("s.score_u") / 1e7).as("score"))
      .filter(col("vec_id") >= 0)
      .orderBy("q_id", "pick")
  }

  /** Greedy k-center CORESET selection (Gonzalez farthest-point traversal,
    * a 2-approximation of the k-center objective) — the diversity-sampling
    * step a training-data pipeline runs to pick a maximally-spread
    * representative subset of an embedding corpus (seed dedup'd batches,
    * eval probes, active-learning pools). Per pick: seed = min vec_id,
    * then repeatedly take the point FARTHEST (cosine distance) from the
    * chosen set; `dist_when_chosen` is that max-min distance and
    * `coverage_after` the radius the selection guarantees after the pick —
    * monotone non-increasing, the curve that says when adding centers
    * stops buying coverage.
    *
    * Distributed shape: k rounds of ONE linear argmax pass each — the
    * round-i pass computes every point's min distance to the i chosen
    * centers (center vectors ride as broadcast literals; i·dim doubles)
    * and `orderBy(mind desc, vec_id).limit(1)` is a distributed
    * TakeOrdered, so nothing pairwise ever materializes (the oracle's n²
    * unrolled CTE chain is oracle-only). Work Σ i·n = O(k²·n/2) dots —
    * linear in corpus size for fixed k. Distances round to 6 dp before
    * every compare and ties break on vec_id, so the greedy trajectory is
    * bit-identical on any engine. */
  def kCenterCoreset(embeddings: DataFrame, k: Int = 6): DataFrame = {
    val base = prep(embeddings)
    val spark = embeddings.sparkSession
    import spark.implicits._
    def distTo(cv: Seq[Double], cn: Double) =
      round(lit(1.0) - call_function("graft_dot", col("v"), typedLit(cv)) /
        (col("nrm") * lit(cn)), 6)
    val seed = base.orderBy("vec_id").limit(1).collect()(0)
    def vecOf(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getSeq[Double](r.fieldIndex("v")).toVector: Seq[Double],
        r.getAs[Double]("nrm"))
    var centers = Vector(vecOf(seed))
    // (sel_order, center_id, label, dist_when_chosen)
    var picks = Vector((1L, centers.head._1, centers.head._2, Option.empty[Double]))
    var coverages = Vector.empty[Double]
    (1 to k).foreach { i =>
      val mind = centers.map(c => distTo(c._3, c._4)).reduce(least(_, _))
      val top = base
        .filter(!col("vec_id").isin(centers.map(_._1): _*))
        .withColumn("mind", mind)
        .orderBy(col("mind").desc, col("vec_id"))
        .limit(1).collect()(0)
      coverages :+= top.getAs[Double]("mind")
      if (i < k) {
        centers :+= vecOf(top)
        picks :+= ((i + 1L, top.getAs[Long]("vec_id"), top.getAs[Int]("label"),
          Some(top.getAs[Double]("mind"))))
      }
    }
    picks.zip(coverages)
      .map { case ((sel, id, lab, d), cov) => (sel, id, lab, d, cov) }
      .toDF("sel_order", "center_id", "label", "dist_when_chosen", "coverage_after")
      .orderBy("sel_order")
  }
}
