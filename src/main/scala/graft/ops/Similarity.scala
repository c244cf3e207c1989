package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`array<float>`,
  * dim 64).
  *
  * Two paths, per the north star: brute-force cosine top-k as the
  * exact baseline, and a random-hyperplane-LSH bucketed variant as the
  * scale path (bucket-local search → work per query proportional to
  * bucket size, not corpus size).
  */
object Similarity {

  /** Left-to-right double dot product via the native fused-loop
    * [[graft.functions.DotProductDouble]] expression — same fold order
    * as DuckDB's list_inner_product (and as the builtin
    * `aggregate(zip_with(...))` composition it replaced), so oracle
    * values match bit-for-bit before rounding.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorOps.dotProduct(a, b)

  /** No `Tables.spread` here: hashing/scoring a 64-dim vector is a few
    * thousand FLOPs per row, so even the single-split fixture scan is
    * compute-trivial, and at production scale the corpus arrives
    * pre-split — the repartition would only add an exchange ahead of
    * every similarity query.
    */
  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables
      .embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))

  /** s1 — brute-force cosine top-k: a fixed query set (vec_id < 20)
    * broadcast against the full corpus, ranked per query with a
    * row_number window (per-partition top-k heaps, no global sort).
    */
  def s1KnnBruteForce(s: SparkSession, dir: String): DataFrame = {
    val all = vecs(s, dir)
    val queries = all
      .filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qnorm"))

    val w = Window
      .partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)

    all
      .join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"), round(col("cos"), 4).as("cosine"))
      .orderBy("q_id", "rank")
  }

  /** Multi-table random-hyperplane LSH: L tables × k planes each.
    * Per-table collision prob for angle θ is (1-θ/π)^k; union over L
    * tables gives recall 1-(1-p)^L. k=4/L=12 ⇒ ~0.83 expected
    * recall@5 on this corpus's top-neighbor cosines (~0.33) while each
    * table still prunes to 1/16 of the corpus per bucket.
    */
  private val PlanesPerTable = 4
  private val NumTables = 12
  private val Dim = 64

  /** Deterministic pseudo-random hyperplanes from a fixed 64-bit LCG —
    * no RNG state, reproducible across runs and engines. Shared by s2's
    * kNN probing and d10's near-dup pair generation (different seeds /
    * table shapes).
    */
  private[graft] def lcgPlanes(
      seed: Long,
      tables: Int,
      planes: Int,
      dim: Int): Array[Array[Array[Double]]] = {
    var state = seed
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      // top 53 bits → [0,1) → [-1,1)
      ((state >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    Array.fill(tables, planes, dim)(next())
  }

  private[ops] lazy val hyperplanes: Array[Array[Array[Double]]] =
    lcgPlanes(0x9E3779B97F4A7C15L /* golden-ratio seed */, NumTables, PlanesPerTable, Dim)

  /** The declarative composition, kept as the independent reference
    * implementation the FunctionsSpec pins the fused kernel against.
    */
  private[graft] def bucketColForSpec(v: Column, planes: Array[Array[Double]]): Column =
    bucketColFor(v, planes)

  /** Sign-bucket of a vector against one table's plane set. */
  private[ops] def bucketColFor(v: Column, planes: Array[Array[Double]]): Column =
    planes.indices
      .map(j => when(dot(v, typedlit(planes(j).toSeq)) > 0, lit(1 << j)).otherwise(lit(0)))
      .reduce(_ + _)

  /** All (table, bucket) keys of a vector as an array column — the
    * fused [[graft.functions.HyperplaneBuckets]] kernel (one loop nest
    * over all tables' planes) wrapped into the (t, b) struct shape the
    * band joins key on. The declarative per-plane composition
    * ([[bucketColFor]], kept for spec cross-checks) builds
    * tables×planes separate dot trees — past codegen budgets at d10's
    * 16×12 layout, which decayed the whole signature stage to
    * interpreted eval (8.7 s → 1.6 s at sf0.1).
    */
  private[ops] def tableBucketsFor(
      v: Column,
      tables: Array[Array[Array[Double]]]): Column =
    transform(
      graft.functions.HyperplaneBuckets.buckets(v, tables),
      (b, i) => struct(i.as("t"), b.as("b")))

  /** Sign-bucket of a vector in s2's LSH table `t`. */
  private def bucketCol(v: Column, t: Int): Column = bucketColFor(v, hyperplanes(t))

  private def tableBuckets(v: Column): Column = tableBucketsFor(v, hyperplanes)

  /** s2 — LSH-bucketed approximate top-k: queries probe only the union
    * of their L sign buckets. At 100 TB this is the shape that works —
    * the corpus is hash-partitioned by (table, bucket); each query
    * touches L buckets instead of the full table, and the candidate
    * union is deduped before scoring so each survivor is scored once.
    * Approximate w.r.t. brute force (the unit spec pins recall ≥ 0.6),
    * but the output itself is deterministic — fixed LCG planes, fixed
    * tie-breaks — so the DuckDB oracle ([[s2OracleSql]]) recomputes the
    * buckets from literal-embedded planes and must hash-match exactly.
    */
  def s2KnnLsh(s: SparkSession, dir: String): DataFrame = {
    val all = vecs(s, dir)
    val banded = all
      .select(col("vec_id"), col("v"), col("norm"), explode(tableBuckets(col("v"))).as("tb"))
    val queries = banded
      .filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qnorm"), col("tb"))

    val w = Window
      .partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)

    banded
      .join(broadcast(queries), Seq("tb"))
      .filter(col("vec_id") =!= col("q_id"))
      // Score BEFORE the q_id exchange: a candidate surviving in L
      // buckets is scored L times (a few hundred extra FLOPs), but the
      // shuffle then carries (q_id, vec_id, cos) — ~24 bytes — instead
      // of both 64-dim double vectors per row. At corpus scale the
      // narrow exchange is the win; the duplicate scores are bit-equal
      // (same expression, same inputs), so the dedup after the
      // exchange is unaffected.
      .select(
        col("q_id"),
        col("vec_id"),
        (dot(col("qv"), col("v")) / (col("qnorm") * col("norm"))).as("cos"))
      // one hash exchange on q_id serves BOTH the pair dedup and the
      // ranking window: HashPartitioning(q_id) satisfies the
      // (q_id, vec_id) clustering dropDuplicates needs, so
      // EnsureRequirements inserts no second shuffle
      .repartition(col("q_id"))
      .dropDuplicates("q_id", "vec_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"), round(col("cos"), 4).as("cosine"))
      .orderBy("q_id", "rank")
  }

  /** s3 — IVF (inverted-file) approximate top-k: the coarse-quantizer
    * scale path. Every corpus vector is assigned to its nearest of K
    * centroid cells; a query scores only the vectors in its `nprobe`
    * closest cells. At 100 TB the corpus is hash-partitioned by cell,
    * so a query touches nprobe partitions instead of the full table —
    * same contract as s2 but with data-adaptive cells instead of
    * oblivious hyperplanes.
    *
    * Centroids here are K deterministic corpus samples (every
    * (N/K)-th vector) rather than trained k-means — centroid quality
    * affects recall, not the operator shape, and keeps the op
    * dependency-free. Determinism also makes the approximate OUTPUT
    * itself oracle-checkable: the DuckDB oracle recomputes cells,
    * probes and bucket-local rankings and must hash-match; recall vs
    * s1 stays pinned in the unit spec.
    */
  def s3KnnIvf(s: SparkSession, dir: String): DataFrame = {
    val k = 16
    val nprobe = 4
    val all = vecs(s, dir)
    // deterministic coarse centroids: every (N/K)-th vector (N=2000 fixture)
    val centroids = all
      .filter(pmod(col("vec_id"), lit(125)) === 0)
      .withColumn("cell", (col("vec_id") / 125).cast("int"))
      // the vec_id conjunct restates cell < k on the RAW key so the
      // standing broadcast-hint gate can SEE the K-bound (cell is
      // derived; the gate only trusts literal ranges on id columns)
      .filter(col("cell") < k && col("vec_id") < 125L * k)
      .select(col("cell"), col("v").as("cv"), col("norm").as("cnorm"))

    // assign each vector to its nearest centroid cell (argmax cosine)
    val byVec = Window
      .partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cell").asc)
    val assigned = all
      .crossJoin(broadcast(centroids))
      .withColumn("ccos", dot(col("v"), col("cv")) / (col("norm") * col("cnorm")))
      .withColumn("crn", row_number().over(byVec))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("v"), col("norm"), col("cell"))

    // queries probe their nprobe closest cells
    val queries = all
      .filter(col("vec_id") < 20)
      .crossJoin(broadcast(centroids))
      .withColumn("ccos", dot(col("v"), col("cv")) / (col("norm") * col("cnorm")))
      .withColumn("crn", row_number().over(byVec))
      .filter(col("crn") <= nprobe)
      .select(
        col("vec_id").as("q_id"),
        col("v").as("qv"),
        col("norm").as("qnorm"),
        col("cell"))

    val w = Window
      .partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)

    assigned
      .join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"), round(col("cos"), 4).as("cosine"))
      .orderBy("q_id", "rank")
  }

  /** s4 — per-cell vector centroids via the typed
    * [[graft.functions.VectorMean]] `Aggregator` (the engine's UDAF
    * surface): exactly the training step an IVF index runs per
    * k-means iteration, as a partial+final aggregation with map-side
    * combine. Cells here are a deterministic mod-partition so the
    * oracle can reproduce the grouping. The centroid vector is
    * posexploded to one `(cell, n, dim, value)` row per dimension so
    * the result is all-scalar and hash-comparable by the oracle gate
    * (array-typed result columns are unhashable driver-side).
    */
  def s4CellCentroids(s: SparkSession, dir: String): DataFrame = {
    val vectorMean = udaf(graft.functions.VectorMean)
    Tables
      .spread(Tables.embeddings(s, dir))
      .select(
        pmod(col("vec_id"), lit(8)).cast("int").as("cell"),
        col("embedding").cast("array<double>").as("v"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), vectorMean(col("v")).as("centroid"))
      .select(
        col("cell"),
        col("n"),
        posexplode(transform(col("centroid"), x => round(x, 4))))
      .withColumnRenamed("pos", "dim")
      .withColumnRenamed("col", "value")
      .orderBy("cell", "dim")
  }

  /** s5 — int8 scalar quantization of the embedding column (the 4×
    * storage/bandwidth reduction an embedding corpus takes before
    * ANN serving) plus per-vector reconstruction-error accounting.
    * Everything is per-row higher-order-function arithmetic — zero
    * shuffles; the scan streams through codegen'd transforms.
    *
    * Cross-engine determinism: quantization uses `floor(x + 0.5)`
    * (identical IEEE semantics in Spark and DuckDB) rather than
    * `round` (HALF_UP vs banker's), the error fold is the same
    * sequential left fold in both engines, and constant vectors
    * (scale = 0) short-circuit to q = 0.
    */
  def s5Quantize(s: SparkSession, dir: String): DataFrame = {
    val v = col("embedding").cast("array<double>")
    Tables
      .embeddings(s, dir)
      .filter(col("vec_id") < 200)
      .select(col("vec_id"), v.as("v"))
      .select(
        col("vec_id"),
        col("v"),
        array_min(col("v")).as("mn"),
        ((array_max(col("v")) - array_min(col("v"))) / 255.0).as("scale"))
      .select(
        col("vec_id"),
        round(col("scale"), 6).as("scale_r"),
        transform(
          col("v"),
          x =>
            when(col("scale") === 0.0, lit(0.0))
              .otherwise(floor((x - col("mn")) / col("scale") + 0.5))).as("q"),
        transform(
          col("v"),
          x =>
            abs(
              x - (col("mn") +
                when(col("scale") === 0.0, lit(0.0))
                  .otherwise(floor((x - col("mn")) / col("scale") + 0.5)) *
                col("scale")))).as("errs"))
      .select(
        col("vec_id"),
        col("scale_r"),
        array_min(col("q")).cast("int").as("q_min"),
        array_max(col("q")).cast("int").as("q_max"),
        round(
          aggregate(col("errs"), lit(0.0), (acc, x) => acc + x) / size(col("errs")),
          6).as("mean_abs_err"),
        round(array_max(col("errs")), 6).as("max_abs_err"))
      .orderBy("vec_id")
  }

  /** s6 — nearest-centroid assignment (the IVF/k-means E-step) under
    * the exact-oracle gate: every vector is assigned to its best of 8
    * fixed seed centroids by cosine. The centroid table broadcasts (k
    * rows at any corpus size), scoring is the codegen'd native dot
    * product scan-side, and the only shuffles carry (vec_id, cos)
    * pairs for the argmax — never vectors. Argmax is max-join +
    * min(cid) so centroid ties (only possible for duplicate centroid
    * vectors) resolve deterministically in both engines; the unrounded
    * doubles agree bit-for-bit because both engines fold the dot
    * product left-to-right over identical floats.
    */
  def s6CentroidAssign(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
    val cents = e
      .filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("c"), col("norm").as("cnorm"))
    val scored = e
      .crossJoin(broadcast(cents))
      .select(
        col("vec_id"),
        col("cid"),
        (dot(col("v"), col("c")) / (col("norm") * col("cnorm"))).as("cos"))
    val best = scored.groupBy(col("vec_id")).agg(max(col("cos")).as("bc"))
    scored
      .join(best, "vec_id")
      .filter(col("cos") === col("bc"))
      .groupBy(col("vec_id"))
      .agg(
        min(col("cid")).as("centroid_id"),
        round(max(col("cos")), 4).as("cosine"))
      .orderBy("vec_id")
  }

  /** s13 — cluster-quality report (simplified silhouette): for every
    * vector, a = cosine DISTANCE (1 − cos) to its assigned centroid,
    * b = distance to the best OTHER centroid, s = (b − a)/max(a, b);
    * per-cluster mean silhouette + mean assignment cosine + margin —
    * the "is k right / which cluster is mushy" diagnostic a
    * clustering pipeline (s10/d14/d15 consumers) reads before
    * trusting assignments. Centroids are s6's deterministic sample
    * (the 8 lowest-id vectors) so both engines rebuild them exactly;
    * assignment ties resolve min-cid (s6's rule), and the
    * second-best is a max over the non-assigned centroids — all
    * doubles from identical expressions, masked at round(4). Plan:
    * centroids broadcast, scoring scan-side (one 8-way cross per
    * row), ONE vec-sized exchange for the argmax, then an 8-group
    * rollup. At 100 TB this is a broadcast pass over the corpus —
    * silhouette against sampled centroids, never pairwise.
    */
  def s13ClusterQuality(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
    val cents = e
      .filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("c"), col("norm").as("cnorm"))
    val scored = e
      .crossJoin(broadcast(cents))
      .select(
        col("vec_id"),
        col("cid"),
        (dot(col("v"), col("c")) / (col("norm") * col("cnorm"))).as("cos"))
    val best = scored.groupBy(col("vec_id")).agg(max(col("cos")).as("bc"))
    val assigned = scored
      .join(best, "vec_id")
      .filter(col("cos") === col("bc"))
      .groupBy(col("vec_id"))
      .agg(min(col("cid")).as("cid"), max(col("cos")).as("own_cos"))
    val other = scored
      .join(assigned.select(col("vec_id"), col("cid").as("acid")), "vec_id")
      .filter(col("cid") =!= col("acid"))
      .groupBy(col("vec_id"))
      .agg(max(col("cos")).as("other_cos"))
    assigned
      .join(other, "vec_id")
      .withColumn("a", lit(1.0) - col("own_cos"))
      .withColumn("b", lit(1.0) - col("other_cos"))
      .withColumn("sil", (col("b") - col("a")) / greatest(col("a"), col("b")))
      .groupBy(col("cid"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("own_cos")), 4).as("mean_cos"),
        round(avg(col("other_cos")), 4).as("mean_other_cos"),
        round(avg(col("sil")), 4).as("mean_silhouette"))
      .orderBy("cid")
  }

  /** s7 — product quantization encode (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): the 64-dim vector
    * splits into M=8 contiguous 8-dim subvectors, each assigned to its
    * nearest of K=16 per-subspace codebook entries — 8 nibbles replace
    * 256 bytes of floats (64:1), the memory step that makes
    * billion-vector ANN (IVFADC) fit in RAM. Output per vector: the
    * code word and the total squared reconstruction error (the
    * quantity PQ training minimizes and ADC lookup tables are built
    * from).
    *
    * The codebook here is a deterministic sample (subvectors of the 16
    * lowest-id vectors, id-sorted) so both engines rebuild it exactly;
    * production training iterates per-subspace k-means with s4's
    * partial+final UDAF machinery — this operator is its E-step plus
    * the encode contract. Ties in the argmin resolve to the lowest
    * code in both engines (`array_position` / `list_position` return
    * the FIRST index of the minimum); the distances agree bit-for-bit
    * because both engines fold (x−y)² left-to-right over identical
    * doubles.
    *
    * At 100 TB: the codebook is one broadcast row (K·dim doubles
    * regardless of corpus size) and the encode is pure scan-side
    * arithmetic — zero data shuffles before the output sort; encoded
    * vectors downstream shuffle 8 bytes instead of 256.
    */
  private val PqM = 8 // subspaces
  private val PqD = 8 // dims per subspace

  /** Per-vector PQ distance table: (vec_id, label, v, cents, dd) where
    * dd(m)(j) is the squared L2 distance of subvector m to codebook
    * entry j. The codebook (16 lowest-id vectors, id-sorted) is ONE
    * broadcast row; the table is pure scan-side arithmetic. Shared by
    * the encode (s7) and the ADC search (s8).
    */
  private def pqDistances(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .embeddings(s, dir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    val cents = e
      .filter(col("vec_id") < 16)
      .agg(
        transform(
          array_sort(collect_list(struct(col("vec_id"), col("v")))),
          c => c.getField("v")).as("cents"))
    e.crossJoin(broadcast(cents))
      .select(
        col("vec_id"),
        col("label"),
        col("v"),
        col("cents"),
        transform(
          sequence(lit(0), lit(PqM - 1)),
          m =>
            transform(
              col("cents"),
              cv =>
                // fused native kernel — bit-identical to the
                // aggregate(zip_with((x−y)²)) composition it replaced,
                // which dispatched an interpreted lambda per element
                graft.functions.VectorOps.squaredDistance(
                  slice(col("v"), m * PqD + 1, lit(PqD)),
                  slice(cv, m * PqD + 1, lit(PqD))))).as("dd"))
      // Generate barrier (t7's lesson): the distance table is read
      // several times downstream (code word + error sum / codes + rec)
      .select(
        col("vec_id"),
        col("label"),
        col("v"),
        col("cents"),
        explode(array(col("dd"))).as("dd"))
  }

  def s7PqEncode(s: SparkSession, dir: String): DataFrame =
    pqDistances(s, dir)
      .select(
        col("vec_id"),
        col("label"),
        concat_ws(
          "-",
          transform(col("dd"), d => (array_position(d, array_min(d)) - 1).cast("string")))
          .as("code"),
        round(aggregate(transform(col("dd"), d => array_min(d)), lit(0.0), (a, b) => a + b), 6)
          .as("quant_err"))
      .orderBy("vec_id")

  /** s8 — ADC approximate k-NN (the "AD" in IVFADC): queries stay
    * exact floats, the corpus is represented ONLY by its PQ codes —
    * each corpus vector is reconstructed as the concatenation of its
    * assigned codebook entries, and the asymmetric distance
    * ‖q − rec(x)‖² ranks neighbors. Because the reconstruction is a
    * concatenation, the per-subspace lookup-table sum and the full
    * 64-dim squared distance are the SAME number — this query computes
    * it directly, which is also how both engines stay bit-identical.
    *
    * Deterministic end-to-end (codes from s7's argmin, distances
    * left-to-right folds, ties broken by vec_id), so unlike the
    * recall-dependent s2/s3 this approximate index is fully
    * hash-checked by the oracle; the recall-vs-exact contract is
    * pinned separately in the spec against s1.
    *
    * At 100 TB: corpus vectors cross NO exchange (scan-side encode +
    * reconstruct, queries broadcast); ranking is the s1 window shape —
    * per-partition top-k heaps via WindowGroupLimit, one (q_id-keyed)
    * shuffle of scored candidate rows.
    *
    * Honest recall note: with the untrained 16-entry sampled codebook
    * over this unstructured corpus (neighbor cosines barely above
    * random), recall@5 vs s1 is quantization-limited (~0.2 measured),
    * though ADC picks still average cosine ~0.21 vs ~0.00 for random
    * pairs (spec-pinned). Production recall comes from k-means-trained
    * codebooks (s4's machinery) on clustered embeddings, where
    * within-cell variance — and thus quant_err — is orders of
    * magnitude smaller.
    */
  /** PQ-reconstructed corpus `(vec_id, rec)` — each vector replaced by
    * the concatenation of its assigned codebook entries. Shared by the
    * pure-ADC ranking (s8) and the shortlist-refine pipeline (s17).
    */
  private def pqReconstructed(s: SparkSession, dir: String): DataFrame =
    pqDistances(s, dir)
      .select(
        col("vec_id"),
        col("cents"),
        transform(col("dd"), d => array_position(d, array_min(d)).cast("int")).as("codes"))
      // barrier: codes is read PqM times by the reconstruction
      .select(col("vec_id"), col("cents"), explode(array(col("codes"))).as("codes"))
      .select(
        col("vec_id"),
        flatten(
          transform(
            sequence(lit(0), lit(PqM - 1)),
            m =>
              slice(
                element_at(col("cents"), element_at(col("codes"), m + 1)),
                m * PqD + 1,
                lit(PqD)))).as("rec"))

  def s8PqAdcSearch(s: SparkSession, dir: String): DataFrame = {
    val base = pqReconstructed(s, dir)
    val queries = Tables
      .embeddings(s, dir)
      .filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").cast("array<double>").as("qv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc").asc, col("vec_id").asc)
    base
      .join(broadcast(queries), col("vec_id") =!= col("q_id"))
      // fused native squared distance (same fold order as the
      // zip_with composition — bit-identical, but one tight loop per
      // pair instead of 64 interpreted lambda dispatches)
      .withColumn(
        "adc",
        graft.functions.VectorOps.squaredDistance(col("qv"), col("rec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(
        col("q_id"),
        col("vec_id").as("neighbor_id"),
        col("rank"),
        round(col("adc"), 6).as("adc_dist"))
      .orderBy("q_id", "rank")
  }

  /** s9 — radius (range) search: every corpus vector within cosine
    * ≥ 0.25 of each query — the retrieval primitive behind
    * threshold-based dedup candidates and "all sufficiently similar"
    * context lookup, where top-k's fixed k is the wrong contract. The
    * query set broadcasts, the threshold evaluates scan-side per
    * corpus partition (no window, no per-query ranking state, no
    * global sort — unlike top-k there's nothing to rank), and the
    * output is dimension-sized. At 100 TB the corpus side stays
    * partition-parallel with zero shuffles before the final
    * result-sized sort; the bucketed variant (s2's tables) prunes
    * candidates when the radius is tight.
    */
  def s9RadiusSearch(s: SparkSession, dir: String): DataFrame = {
    val all = vecs(s, dir)
    val queries = all
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qnorm"))
    all
      .join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
      .filter(col("cos") >= 0.25)
      .select(
        col("q_id"),
        col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cosine"))
      .orderBy("q_id", "neighbor_id")
  }

  /** s10 — Lloyd's k-means TRAINING loop: the composition s3/s6/d14
    * all deferred (their centroids are deterministic samples; this op
    * trains them). Three fixed rounds, each a full E-step (nearest
    * centroid by squared L2) and M-step (per-cell [[graft.functions
    * .VectorMean]] centroid, the s4 aggregator) — the iterative shape
    * q90 pins for graphs, here for vector indexing.
    *
    * Portable arithmetic (the q90 rule): vectors quantize once to
    * integer-valued doubles at scale 1e6, so every (vi−ci)² fold and
    * every per-dim sum stays an EXACT integer below 2^53 — addition
    * order (Spark partial/final vs DuckDB sequential) cannot change a
    * bit, per-row d2 casts to long before the obj sum (whose exact
    * value passes 2^53), and the M-step mean is one correctly-rounded
    * division of exact operands, floored back to integers on both
    * engines. The oracle unrolls all three iterations as CTEs and
    * hash-checks every round's cluster sizes, objective, and centroid
    * checksum — not just the final state. At 1e12-row clusters the
    * per-dim double sums would pass 2^53; the production escape hatch
    * is the same as q92's: a decimal/long vector-sum accumulator,
    * same shape, wider lanes.
    *
    * Scale: centroids are K rows — they localCheckpoint per round
    * (bounded lineage, q90's pattern) and broadcast into the E-step
    * crossJoin, so each round is ONE corpus-sized exchange (the
    * min-combine argmin carrying the vector to its cell) and the
    * M-step's map-side-combined partial aggregation; vectors never
    * join-back. Empty cells drop out (standard Lloyd's degeneracy);
    * init is the s3 sample rule (every 62nd vector, K=8) so both
    * engines rebuild the seed set exactly. Monotone non-increasing
    * total objective across rounds is pinned in OpsSpec.
    */
  /** The corpus quantized once to integer-valued doubles at scale 1e6
    * — the exact-arithmetic space s10's training and s11's search
    * share (see [[s10KmeansTrain]] for why this is bit-portable).
    */
  private def quantized(s: SparkSession, dir: String): DataFrame =
    Tables
      .embeddings(s, dir)
      .select(
        col("vec_id"),
        transform(
          col("embedding").cast("array<double>"),
          x => floor(x * 1000000 + 0.5).cast("double")).as("v"))

  /** Shared Lloyd's loop for s10/s11: returns the per-round summary
    * frames and the FINAL trained centroid table (cell, c). Centroids
    * localCheckpoint per round (K rows), so consumers read a flat
    * K-row local relation, not a 3-round lineage.
    */
  private def kmeansRounds(s: SparkSession, dir: String): (Seq[DataFrame], DataFrame) = {
    val k = 8
    val stride = 62
    val iters = 3
    val vectorMean = udaf(graft.functions.VectorMean)
    val ints = quantized(s, dir)
    var cents = ints
      .filter(pmod(col("vec_id"), lit(stride)) === 0 && col("vec_id") < k.toLong * stride)
      .select((col("vec_id") / stride).cast("int").as("cell"), col("v").as("c"))
    val rounds = (1 to iters).map { t =>
      val scored = ints
        .crossJoin(broadcast(cents))
        .select(
          col("vec_id"),
          col("cell"),
          col("v"),
          graft.functions.VectorOps
            .squaredDistance(col("v"), col("c"))
            .cast("long")
            .as("d2"))
      // argmin with the s6 tie rule: lexicographic (d2, cell) min is
      // deterministic because cell is unique per candidate row
      val assigned = scored
        .groupBy(col("vec_id"))
        .agg(
          min(struct(col("d2"), col("cell"))).as("m"),
          min_by(col("v"), struct(col("d2"), col("cell"))).as("v"))
        .select(col("vec_id"), col("m.cell").as("cell"), col("m.d2").as("bd"), col("v"))
      val g = assigned
        .groupBy(col("cell"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("bd")).as("obj"),
          vectorMean(col("v")).as("cm"))
        .select(
          col("cell"),
          col("n"),
          col("obj"),
          transform(col("cm"), x => floor(x).cast("double")).as("c"))
        .localCheckpoint() // K rows; caps lineage like q90's rank table
      cents = g.select(col("cell"), col("c"))
      g.select(
        lit(t).as("iter"),
        col("cell"),
        col("n"),
        col("obj"),
        aggregate(col("c"), lit(0.0), (a, x) => a + x).cast("long").as("csum"))
    }
    (rounds, cents)
  }

  def s10KmeansTrain(s: SparkSession, dir: String): DataFrame = {
    val (rounds, _) = kmeansRounds(s, dir)
    rounds.reduce(_ unionAll _).orderBy("iter", "cell")
  }

  /** s11 — IVF search over TRAINED centroids: the end-to-end
    * composition a real IVF index runs, closing the gap s3 documents
    * (its coarse centroids are corpus samples): s10's three Lloyd
    * rounds produce the codebook, the corpus assigns to the trained
    * cells, queries probe their nprobe=3 nearest cells, and candidates
    * rank by squared L2 — ALL in the shared 1e6-scaled integer space,
    * so every distance is an exact integer and the full pipeline
    * (training included) is hash-checked by one unrolled oracle.
    *
    * Scale: the codebook is K checkpointed rows broadcast into both
    * the corpus assignment (one exchange: the min-combined argmin) and
    * the query probe (20 rows); candidate generation is a cell
    * equi-join — work ∝ probed-cell occupancy, never corpus × queries
    * — and the top-5 ranks inside per-query windows after a DISTINCT
    * that collapses candidates reached through both probed cells.
    */
  def s11IvfTrainedSearch(s: SparkSession, dir: String): DataFrame = {
    val (_, cents) = kmeansRounds(s, dir)
    val ints = quantized(s, dir)
    val scored = ints
      .crossJoin(broadcast(cents))
      .select(
        col("vec_id"),
        col("cell"),
        col("v"),
        graft.functions.VectorOps
          .squaredDistance(col("v"), col("c"))
          .cast("long")
          .as("d2"))
    val asg = scored
      .groupBy(col("vec_id"))
      .agg(
        min(struct(col("d2"), col("cell"))).as("m"),
        min_by(col("v"), struct(col("d2"), col("cell"))).as("v"))
      .select(col("vec_id"), col("m.cell").as("cell"), col("v"))
    val byQ = Window.partitionBy(col("vec_id")).orderBy(col("d2").asc, col("cell").asc)
    val qp = scored
      .filter(col("vec_id") < 20)
      .withColumn("rn", row_number().over(byQ))
      .filter(col("rn") <= 3)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("cell"))
    val cand = qp
      .join(asg, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(
        col("q_id"),
        col("vec_id"),
        graft.functions.VectorOps
          .squaredDistance(col("qv"), col("v"))
          .cast("long")
          .as("d2"))
      .distinct()
    val byRank = Window.partitionBy(col("q_id")).orderBy(col("d2").asc, col("vec_id").asc)
    cand
      .withColumn("rank", row_number().over(byRank))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"), col("d2"))
      .orderBy("q_id", "rank")
  }

  /** s12 — kNN majority-vote classification: label each held-out query
    * vector by the majority label of its k=9 nearest corpus neighbors
    * (cosine) — the label-propagation/auto-labeling primitive a
    * training-data pipeline runs to extend a small labeled seed over an
    * unlabeled corpus. Out-of-sample by construction: queries
    * (vec_id < 20) are excluded from the corpus side, so no vector
    * votes for itself. Both rankings are totally ordered (cos desc,
    * vec_id asc; then votes desc, label asc) so the prediction is
    * deterministic and the oracle recomputes it exactly — ties
    * included. Plan: the bounded query set broadcasts (the s1 shape);
    * per-query top-k via row_number = per-partition heaps; the vote
    * count is a |queries|×|labels| aggregate — nothing downstream of
    * the scored join scales with the corpus.
    */
  def s12KnnClassify(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .embeddings(s, dir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
    val queries = e
      .filter(col("vec_id") < 20)
      .select(
        col("vec_id").as("q_id"),
        col("label").as("true_label"),
        col("v").as("qv"),
        col("norm").as("qnorm"))
    val corpus = e.filter(col("vec_id") >= 20)
    val byCos = Window
      .partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val votes = corpus
      .join(broadcast(queries))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
      .withColumn("rank", row_number().over(byCos))
      .filter(col("rank") <= 9)
      .groupBy(col("q_id"), col("true_label"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
    val byVotes = Window
      .partitionBy(col("q_id"))
      .orderBy(col("n_votes").desc, col("label").asc)
    votes
      .withColumn("vr", row_number().over(byVotes))
      .filter(col("vr") === 1)
      .select(col("q_id"), col("true_label"), col("label").as("pred_label"), col("n_votes"))
      .orderBy("q_id")
  }

  /** s16 — MMR (maximal marginal relevance) diversified top-k: for
    * each query, greedily pick 4 results maximizing
    * `λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)` over a 12-candidate pool
    * — the retrieval diversifier (Carbonell & Goldstein 1998) that
    * dedups a result list AT QUERY TIME (three near-identical
    * passages score high on relevance; MMR admits one), the same
    * primitive a training-data curator uses to draw a DIVERSE
    * example set rather than k copies of the densest cluster.
    *
    * The greedy loop is FIXED-k (4 steps), so it unrolls into one
    * static plan — no driver actions, no convergence checks; each
    * step is an anti-join (drop selected), a max-penalty aggregate
    * against the selected set, and an argmax window, all over the
    * query-count × 12 candidate table. The candidate pool and its
    * pairwise-sim table are localCheckpointed once (60 / 660 rows) so
    * the unrolled steps reread tiny materialized tables instead of
    * re-deriving the corpus scan per step. Scale: the corpus is
    * touched EXACTLY ONCE (the s1-shaped candidate generation); at
    * 100 TB everything after the pool is query-count-sized, which is
    * the whole point of rerank-style diversification. Determinism:
    * sims via the shared left-to-right dot fold (bit-equal to
    * list_inner_product), λ = 0.7 exact doubles on both engines, all
    * argmaxes tie-broken by vec_id, output rounded at 4.
    */
  def s16MmrDiversify(s: SparkSession, dir: String): DataFrame = {
    val lam = 0.7
    val nCand = 12
    val k = 4
    val all = vecs(s, dir)
    val queries = all
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    val cands = all
      .join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nCand)
      .select(col("q_id"), col("vec_id"), col("cos"), col("v"), col("norm"))
      .localCheckpoint()
    val cc = cands
      .as("a")
      .join(
        cands.as("b"),
        col("a.q_id") === col("b.q_id") && col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.q_id").as("q_id"),
        col("a.vec_id").as("id_a"),
        col("b.vec_id").as("id_b"),
        (dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm"))).as("sim"))
      .localCheckpoint()
    val pool = cands.select(col("q_id"), col("vec_id"), col("cos"))
    // step 1: pure relevance argmax (empty selected set, zero penalty)
    var sel = pool
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("q_id"), col("vec_id"), lit(1).as("rank"), (lit(lam) * col("cos")).as("score"))
    for (step <- 2 to k) {
      val scored = pool
        .join(sel.select(col("q_id"), col("vec_id")), Seq("q_id", "vec_id"), "left_anti")
        .join(cc.withColumnRenamed("id_a", "vec_id"), Seq("q_id", "vec_id"))
        .join(
          sel.select(col("q_id"), col("vec_id").as("id_b")),
          Seq("q_id", "id_b"))
        .groupBy(col("q_id"), col("vec_id"), col("cos"))
        .agg(max(col("sim")).as("pen"))
        // 0.3 as a LITERAL, not `1 - lam`: IEEE 1−0.7 is
        // 0.30000000000000004, the 0.3 literal is not — the oracle
        // writes 0.3, so the Scala side must ship the same double
        .withColumn("score", lit(lam) * col("cos") - lit(0.3) * col("pen"))
        .withColumn(
          "rn",
          row_number().over(
            Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id").asc)))
        .filter(col("rn") === 1)
        .select(col("q_id"), col("vec_id"), lit(step).as("rank"), col("score"))
      sel = sel.unionAll(scored)
    }
    sel
      .select(
        col("q_id"),
        col("rank"),
        col("vec_id").as("neighbor_id"),
        round(col("score"), 4).as("mmr_score"))
      .orderBy("q_id", "rank")
  }

  /** s17 — two-stage shortlist-refine search (the IVFADC+refine /
    * "re-ranking" production pattern): the CHEAP representation (PQ
    * codes, s8's ADC distance) ranks the whole corpus and keeps a
    * 50-deep shortlist; only those 50 rows per query fetch their FULL
    * vector for an exact re-rank, and the final top-5 is by TRUE
    * squared L2. This is the operator that makes lossy indexes
    * shippable: the coarse stage's quantization error (s8's honest
    * ~0.2 recall@5) is repaired wherever the true neighbor made the
    * shortlist at all, at the cost of 50 full-vector reads per query
    * instead of N.
    *
    * Scale: stage 1 touches only codes (corpus vectors cross no
    * exchange — s8's shape); stage 2's full-vector fetch is a join of
    * the QUERY-COUNT-sized shortlist (50·|Q| rows — broadcast is
    * legitimate, it never scales with the corpus) against the vector
    * store, reading 50·|Q| vectors total. Both stages deterministic
    * (ADC and L2 folds bit-identical across engines, ties by vec_id),
    * so the refined ranking is fully hash-checked; the
    * refine-beats-ADC recall contract is pinned in the spec vs s1.
    */
  def s17AdcRefine(s: SparkSession, dir: String): DataFrame = {
    val shortlistK = 50
    val e = Tables
      .embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val queries = e
      .filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val wAdc = Window.partitionBy(col("q_id")).orderBy(col("adc").asc, col("vec_id").asc)
    val shortlist = pqReconstructed(s, dir)
      .join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("adc", graft.functions.VectorOps.squaredDistance(col("qv"), col("rec")))
      .withColumn("adc_rank", row_number().over(wAdc))
      .filter(col("adc_rank") <= shortlistK)
      .select(col("q_id"), col("qv"), col("vec_id"), col("adc"), col("adc_rank"))
    val wExact = Window.partitionBy(col("q_id")).orderBy(col("d2").asc, col("vec_id").asc)
    e.join(broadcast(shortlist), "vec_id") // shortlist is |Q|·50 rows — never corpus-scaled
      .withColumn("d2", graft.functions.VectorOps.squaredDistance(col("qv"), col("v")))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= 5)
      .select(
        col("q_id"),
        col("vec_id").as("neighbor_id"),
        col("rank"),
        round(col("d2"), 6).as("l2_sq"),
        col("adc_rank"))
      .orderBy("q_id", "rank")
  }

  /** s18 — IVF index PERSISTENCE and serving (the build/serve split
    * every production vector store runs): s10's trained centroids and
    * the corpus cell assignments are WRITTEN to parquet as two
    * id-only tables — centroids posexploded to scalar (cell, dim,
    * val) rows, assignments as (vec_id, cell); a fresh reader then
    * reconstructs the index and serves s11's exact search against it,
    * re-fetching candidate VECTORS from the base table by id (the
    * index never stores vectors twice — the production layout). The
    * served top-5 must equal the in-memory s11 ranking bit-for-bit —
    * quantized-integer doubles round-trip parquet losslessly — so the
    * oracle IS s11's SQL. At scale: the assignment table is the only
    * corpus-sized artifact (2 longs/row), centroids are K·dim rows,
    * and serving reads `nprobe/K` of the corpus via the cell join.
    */
  def s18IvfPersist(s: SparkSession, dir: String): DataFrame = {
    val (_, cents) = kmeansRounds(s, dir)
    val ints = quantized(s, dir)
    val scored = ints
      .crossJoin(broadcast(cents))
      .select(
        col("vec_id"),
        col("cell"),
        graft.functions.VectorOps
          .squaredDistance(col("v"), col("c"))
          .cast("long")
          .as("d2"))
    val asg = scored
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cell"))).as("m"))
      .select(col("vec_id"), col("m.cell").as("cell"))

    val tmp = Tables.scratchDir("graft-s18-ivf")
    val centPath = new java.io.File(tmp, "centroids").getAbsolutePath
    val asgPath = new java.io.File(tmp, "assignments").getAbsolutePath
    cents
      .select(col("cell"), posexplode(col("c")).as(Seq("dim", "val")))
      .write
      .mode("overwrite")
      .parquet(centPath)
    asg.write.mode("overwrite").parquet(asgPath)

    // ---- serve path: ONLY the loaded index + the base vector table ----
    val loadedCents = s.read
      .parquet(centPath)
      .groupBy(col("cell"))
      .agg(
        transform(array_sort(collect_list(struct(col("dim"), col("val")))), c =>
          c.getField("val")).as("c"))
    val loadedAsg = s.read.parquet(asgPath)
    val byQ = Window.partitionBy(col("q_id")).orderBy(col("d2c").asc, col("cell").asc)
    val qp = ints
      .filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
      .crossJoin(broadcast(loadedCents))
      .withColumn(
        "d2c",
        graft.functions.VectorOps.squaredDistance(col("qv"), col("c")).cast("long"))
      .withColumn("rn", row_number().over(byQ))
      .filter(col("rn") <= 3)
      .select(col("q_id"), col("qv"), col("cell"))
    val byRank = Window.partitionBy(col("q_id")).orderBy(col("d2").asc, col("vec_id").asc)
    qp.join(loadedAsg, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .join(ints, "vec_id") // candidate vectors re-fetched from the base table
      .select(
        col("q_id"),
        col("vec_id"),
        graft.functions.VectorOps
          .squaredDistance(col("qv"), col("v"))
          .cast("long")
          .as("d2"))
      .distinct()
      .withColumn("rank", row_number().over(byRank))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"), col("d2"))
      .orderBy("q_id", "rank")
  }

  /** s19 — FILTERED vector search (attribute-constrained ANN): s3's
    * IVF probe with a metadata predicate — neighbors must share the
    * query's `label` — pushed INTO the candidate scan. This is the
    * production-critical variant every vector store ships
    * (tenant/language/recency filters): post-filtering an unfiltered
    * top-k silently starves queries whose matches are rare in the
    * top-k, so the filter must apply BEFORE ranking, inside the
    * probed cells — exactly what the label equi-condition on the
    * cell join does here. Deterministic end-to-end (s3's centroids,
    * ties by vec_id), so the filtered ranking itself is
    * hash-checked; queries whose probed cells hold fewer than 5
    * same-label neighbors return short — the honest contract, pinned
    * in the spec. At 100 TB the label predicate rides the same cell
    * partition (or a (cell, label) sub-partition) and prunes
    * candidate I/O, never recall-after-the-fact.
    */
  def s19FilteredSearch(s: SparkSession, dir: String): DataFrame = {
    val k = 16
    val nprobe = 4
    val all = vecs(s, dir)
      .join(Tables.embeddings(s, dir).select(col("vec_id"), col("label")), "vec_id")
    val centroids = all
      .filter(pmod(col("vec_id"), lit(125)) === 0)
      .withColumn("cell", (col("vec_id") / 125).cast("int"))
      // the vec_id conjunct restates cell < k on the RAW key so the
      // standing broadcast-hint gate can SEE the K-bound (cell is
      // derived; the gate only trusts literal ranges on id columns)
      .filter(col("cell") < k && col("vec_id") < 125L * k)
      .select(col("cell"), col("v").as("cv"), col("norm").as("cnorm"))
    val byVec = Window
      .partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cell").asc)
    val assigned = all
      .crossJoin(broadcast(centroids))
      .withColumn("ccos", dot(col("v"), col("cv")) / (col("norm") * col("cnorm")))
      .withColumn("crn", row_number().over(byVec))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("v"), col("norm"), col("label"), col("cell"))
    val queries = all
      .filter(col("vec_id") < 20)
      .crossJoin(broadcast(centroids))
      .withColumn("ccos", dot(col("v"), col("cv")) / (col("norm") * col("cnorm")))
      .withColumn("crn", row_number().over(byVec))
      .filter(col("crn") <= nprobe)
      .select(
        col("vec_id").as("q_id"),
        col("v").as("qv"),
        col("norm").as("qnorm"),
        col("label").as("q_label"),
        col("cell").as("qcell"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    assigned
      // the filter is part of the join condition — candidates prune
      // BEFORE scoring, the pre-filtered (not post-filtered) contract
      .join(
        broadcast(queries),
        col("cell") === col("qcell") && col("label") === col("q_label"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(
        col("q_id"),
        col("vec_id").as("neighbor_id"),
        col("q_label").as("label"),
        col("rank"),
        round(col("cos"), 4).as("cosine"))
      .orderBy("q_id", "rank")
  }

  /** s20 — classification evaluation report: s12's kNN auto-labeler
    * rolled into the per-class precision / recall / F1 table (the
    * sklearn `classification_report` shape) — the eval artifact that
    * decides whether machine labels are good enough to train on,
    * joining the retrieval-eval harnesses (s14/s15 recall) on the
    * classification side. Everything integer: per-class tp/fp/fn by
    * conditional aggregation, metrics as basis points by
    * cross-multiplied floor division, F1 as the bp-level harmonic
    * mean `2·p·r div (p+r)`, −1 sentinel where a class was never
    * predicted (0/0 has no defensible value and NULL semantics
    * differ). Scale: the report is classes² bounded — two
    * conditional aggregates over the prediction stream, label-sized
    * joins.
    */
  def s20ClassifyEval(s: SparkSession, dir: String): DataFrame = {
    val preds = s12KnnClassify(s, dir).select(col("true_label"), col("pred_label"))
    val classes = preds
      .select(col("true_label").as("cls"))
      .unionAll(preds.select(col("pred_label").as("cls")))
      .distinct()
    val byTrue = preds
      .groupBy(col("true_label").as("cls"))
      .agg(
        count(lit(1)).as("support"),
        sum(when(col("true_label") === col("pred_label"), 1L).otherwise(0L)).as("tp"))
    val byPred = preds
      .groupBy(col("pred_label").as("cls"))
      .agg(count(lit(1)).as("predicted"))
    classes
      .join(byTrue, Seq("cls"), "left")
      .join(byPred, Seq("cls"), "left")
      .select(
        col("cls").as("label"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("predicted"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fp"),
        (coalesce(col("support"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fn"),
        coalesce(col("predicted"), lit(0L)).as("predicted"))
      .withColumn(
        "precision_bp",
        when(col("predicted") > 0L, expr("(tp * 10000L) div predicted")).otherwise(lit(-1L)))
      .withColumn(
        "recall_bp",
        when(col("support") > 0L, expr("(tp * 10000L) div support")).otherwise(lit(-1L)))
      .withColumn(
        "f1_bp",
        when(
          col("precision_bp") >= 0L && col("recall_bp") >= 0L &&
            col("precision_bp") + col("recall_bp") > 0L,
          expr("(2 * precision_bp * recall_bp) div (precision_bp + recall_bp)"))
          .otherwise(lit(-1L)))
      .select(
        col("label"),
        col("support"),
        col("tp"),
        col("fp"),
        col("fn"),
        col("precision_bp"),
        col("recall_bp"),
        col("f1_bp"))
      .orderBy("label")
  }

  /** s21 — embedding-distribution drift monitor: did the vector
    * population move between two corpus snapshots (here the vec_id
    * parity halves)? Two signals per IVF cell — the ML-ops extension
    * of q141's scalar PSI into vector space: (1) cell-population PSI
    * contribution under Laplace +1 smoothing (so an empty cell on one
    * half cannot produce ln(0) on any fixture), and (2) the L2 shift
    * between the halves' per-cell centroids. Exactness: assignments
    * use s3's deterministic sampled centroids; centroid means come
    * from the 1e6-quantized integer space (s10's convention), so the
    * per-dimension numerator `sa·n_b − sb·n_a` is an exact long,
    * its square accumulates in DECIMAL(38,0) (order-independent —
    * a double dot here would be summation-order-dependent), and
    * doubles appear only in the two published columns. Scale: one
    * corpus-sized assignment pass, one (cell, dim) exchange; output
    * is K rows.
    */
  def s21EmbeddingDrift(s: SparkSession, dir: String): DataFrame = {
    val k = 16
    val all = vecs(s, dir)
    val centroids = all
      .filter(pmod(col("vec_id"), lit(125)) === 0)
      .withColumn("cell", (col("vec_id") / 125).cast("int"))
      // the vec_id conjunct restates cell < k on the RAW key so the
      // standing broadcast-hint gate can SEE the K-bound (cell is
      // derived; the gate only trusts literal ranges on id columns)
      .filter(col("cell") < k && col("vec_id") < 125L * k)
      .select(col("cell"), col("v").as("cv"), col("norm").as("cnorm"))
    val byVec = Window
      .partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cell").asc)
    val assigned = all
      .crossJoin(broadcast(centroids))
      .withColumn("ccos", dot(col("v"), col("cv")) / (col("norm") * col("cnorm")))
      .withColumn("crn", row_number().over(byVec))
      .filter(col("crn") === 1)
      .select(col("vec_id"), (col("vec_id") % 2L).as("half"), col("cell"))
    val counts = assigned
      .groupBy(col("cell"))
      .agg(
        sum(when(col("half") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("half") === 1L, 1L).otherwise(0L)).as("n_b"))
    val totals = counts.agg(
      sum(col("n_a")).as("ta"),
      sum(col("n_b")).as("tb"))
    val dims = assigned
      .join(quantized(s, dir), "vec_id")
      .select(col("cell"), col("half"), posexplode(col("v")).as(Seq("dim", "val")))
      .groupBy(col("cell"), col("dim"))
      .agg(
        sum(when(col("half") === 0L, col("val")).otherwise(lit(0.0)))
          .cast("long")
          .as("sa"),
        sum(when(col("half") === 1L, col("val")).otherwise(lit(0.0)))
          .cast("long")
          .as("sb"))
    val shift = dims
      .join(broadcast(counts), "cell")
      .select(
        col("cell"),
        expr("CAST(sa * n_b - sb * n_a AS DECIMAL(38,0))").as("num"),
        col("n_a"),
        col("n_b"))
      .groupBy(col("cell"))
      .agg(sum(expr("num * num")).as("d2"), max(col("n_a") * col("n_b")).as("nab"))
      .select(
        col("cell"),
        expr("""round(sqrt(CAST(d2 AS DOUBLE)) / CAST(nab AS DOUBLE)
               |      / CAST(1000000 AS DOUBLE), 4)""".stripMargin)
          .as("centroid_shift"))
    counts
      .crossJoin(broadcast(totals))
      .select(
        col("cell"),
        col("n_a"),
        col("n_b"),
        expr("""round((CAST(n_a + 1 AS DOUBLE) / CAST(ta + 16 AS DOUBLE)
               |  - CAST(n_b + 1 AS DOUBLE) / CAST(tb + 16 AS DOUBLE))
               | * ln((CAST(n_a + 1 AS DOUBLE) / CAST(ta + 16 AS DOUBLE))
               |      / (CAST(n_b + 1 AS DOUBLE) / CAST(tb + 16 AS DOUBLE))), 6)"""
          .stripMargin).as("psi_contrib"))
      .join(shift, "cell")
      .orderBy("cell")
  }

  /** s22 — recall@k CURVE for the LSH index (k = 1..5): s14 reports
    * the single recall@5 number; the curve says WHERE the index
    * loses neighbors — a rank-1 miss (wrong top hit) is a different
    * failure than a rank-5 tail miss, and the tuning response
    * (more tables vs deeper re-rank) differs accordingly. One pass:
    * the exact and LSH rankings join once on (query, neighbor) with
    * BOTH rank columns, and every k-level is a conditional count
    * `max(exact_rank, lsh_rank) ≤ k` over that same join — never 5
    * recomputations. All integers; rates in basis points. Output is
    * 5 rows.
    */
  def s22RecallCurve(s: SparkSession, dir: String): DataFrame = {
    val exact = s1KnnBruteForce(s, dir).select(
      col("q_id"),
      col("neighbor_id"),
      col("rank").as("er"))
    val approx = s2KnnLsh(s, dir).select(
      col("q_id"),
      col("neighbor_id"),
      col("rank").as("ar"))
    val nq = exact
      .select(col("q_id"))
      .distinct()
      .agg(count(lit(1)).as("nq")) // 1-row; broadcast back, no driver action
    val joined = exact.join(approx, Seq("q_id", "neighbor_id"))
    val sums =
      (1 to 5).map(k =>
        sum(when(greatest(col("er"), col("ar")) <= k, 1L).otherwise(0L)).as(s"h$k"))
    val agg = joined.agg(sums.head, sums.tail: _*)
    val cells = (1 to 5).map(k => s"${k}L, h$k").mkString(", ")
    agg
      .selectExpr(s"stack(5, $cells) AS (k, hits)")
      .crossJoin(broadcast(nq))
      .select(
        col("k"),
        col("hits"),
        expr("(hits * 10000L) div (nq * k)").as("recall_bp"))
      .orderBy("k")
  }

  /** s28 — VOTE-SHARE CALIBRATION of the kNN classifier (the
    * reliability-diagram half of the eval harness s20's
    * precision/recall report doesn't cover): a classifier's
    * confidence is only useful if "9 of 9 neighbors agree" actually
    * MEANS more than "5 of 9" — selective prediction, active-learning
    * triage and auto-labeling pipelines all threshold on it. Every
    * 5th vector holds out as a query, the rest vote (s12's 9-NN,
    * identical cosine tie-breaks); per winning-vote-count bin the
    * report compares claimed confidence (votes/9) against measured
    * accuracy, both in integer basis points — the per-bin |gap| is
    * the ECE integrand, and a bin whose acc_bp sits far under its
    * conf_bp is exactly where an auto-labeler must abstain.
    *
    * Determinism: cosine ranks tie-break by vec_id and votes by
    * label (s12's verified convention — both engines share the
    * left-to-right dot fold); bins, counts and basis points are
    * exact integers. Scale: the hold-out is eval-set-sized and
    * BROADCASTS; the corpus is scanned once; everything after the
    * per-query argmax is ≤ 9 rows. The per-query top-9 window
    * partitions by q_id — never global.
    */
  def s28VoteCalibration(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .embeddings(s, dir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
    val queries = e
      .filter(col("vec_id") % 5 === 0)
      .select(
        col("vec_id").as("q_id"),
        col("label").as("true_label"),
        col("v").as("qv"),
        col("norm").as("qnorm"))
    val corpus = e.filter(col("vec_id") % 5 =!= 0)
    val byCos = Window
      .partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val votes = corpus
      .join(broadcast(queries))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
      .withColumn("rank", row_number().over(byCos))
      .filter(col("rank") <= 9)
      .groupBy(col("q_id"), col("true_label"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
    val byVotes = Window
      .partitionBy(col("q_id"))
      .orderBy(col("n_votes").desc, col("label").asc)
    votes
      .withColumn("vr", row_number().over(byVotes))
      .filter(col("vr") === 1)
      .groupBy(col("n_votes").as("conf_votes"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("label") === col("true_label"), 1L).otherwise(0L)).as("n_correct"))
      .select(
        col("conf_votes"),
        col("n"),
        col("n_correct"),
        expr("n_correct * 10000 div n").as("acc_bp"),
        expr("conf_votes * 10000 div 9").as("conf_bp"),
        expr("abs(n_correct * 10000 div n - conf_votes * 10000 div 9)").as("gap_bp"))
      .orderBy("conf_votes")
  }

  /** s29 — MULTI-PROBE LSH (Lv, Josephson, Wang, Charikar & Li, VLDB
    * 2007): instead of probing only the query's own sign-bucket in
    * each table, also probe the PlanesPerTable Hamming-1 buckets (one
    * plane's sign flipped) — the buckets a near-miss neighbor most
    * likely fell into. The trade is the paper's headline: probes
    * (compute) substitute for tables (index memory) — here 3 tables ×
    * 5 probes reach the recall regime of many more single-probe
    * tables while storing a QUARTER of s2's 12-table index. The
    * report measures exactly that on this corpus: per query,
    * candidate count and truth-top-5 hits for single-probe-3-tables
    * vs multi-probe-3-tables, side by side (the d26/s22 "efficiency
    * audit as data" doctrine; s14 already prices 12-table
    * single-probe).
    *
    * Plan: buckets come from the fused [[tableBucketsFor]] kernel
    * over the FIRST 3 hyperplane tables only (never computes the 9
    * unused); the probe fan-out is a literal 5-way explode on the
    * 20-query side, which stays broadcast; candidate joins are
    * (t, bucket) equi-joins against the same banded corpus layout s2
    * uses. Everything after candidate generation is query-count-sized.
    * At 100 TB the index is hash-partitioned by (t, bucket) and a
    * query touches 15 buckets instead of 3 — bounded fan-out, no new
    * shuffle shape.
    */
  def s29MultiprobeLsh(s: SparkSession, dir: String): DataFrame = {
    val nT = 3
    val all = vecs(s, dir)
    val banded = all
      .select(
        col("vec_id"),
        col("v"),
        col("norm"),
        explode(tableBucketsFor(col("v"), hyperplanes.take(nT))).as("tb"))
      .select(
        col("vec_id"),
        col("v"),
        col("norm"),
        col("tb.t").as("t"),
        col("tb.b").as("b"))
      .localCheckpoint() // corpus side + query side + two candidate joins
    val qb = banded
      .filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("t"), col("b"))
    // probe -1 = the query's own bucket; probes 0..k-1 flip one plane
    val probes = qb
      .select(
        col("q_id"),
        col("t"),
        col("b"),
        explode(array((-1 until PlanesPerTable).map(lit): _*)).as("j"))
      .select(
        col("q_id"),
        col("t"),
        when(col("j") === -1, col("b"))
          .otherwise(expr("b ^ shiftleft(1, j)")).as("b"))
    def candidates(probeSide: DataFrame): DataFrame =
      banded
        .join(broadcast(probeSide), Seq("t", "b"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"))
        .distinct()
    val qv = all
      .filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qnorm"))
    def top5(cand: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
      cand
        .join(all.select(col("vec_id"), col("v"), col("norm")), "vec_id")
        .join(broadcast(qv), "q_id")
        .withColumn("cos", dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("vec_id").as("neighbor_id"))
    }
    val truth = s1KnnBruteForce(s, dir).select(col("q_id"), col("neighbor_id"))
    def hitsOf(ap: DataFrame, name: String): DataFrame =
      truth
        .join(ap, Seq("q_id", "neighbor_id"))
        .groupBy(col("q_id"))
        .agg(count(lit(1)).as(name))
    val single = candidates(qb)
    val multi = candidates(probes)
    qv.select(col("q_id"))
      .join(single.groupBy(col("q_id")).agg(count(lit(1)).as("n_cand_single")), Seq("q_id"), "left")
      .join(multi.groupBy(col("q_id")).agg(count(lit(1)).as("n_cand_multi")), Seq("q_id"), "left")
      .join(hitsOf(top5(single), "hits_single"), Seq("q_id"), "left")
      .join(hitsOf(top5(multi), "hits_multi"), Seq("q_id"), "left")
      .select(
        col("q_id"),
        coalesce(col("n_cand_single"), lit(0L)).as("n_cand_single"),
        coalesce(col("n_cand_multi"), lit(0L)).as("n_cand_multi"),
        coalesce(col("hits_single"), lit(0L)).as("hits_single"),
        coalesce(col("hits_multi"), lit(0L)).as("hits_multi"))
      .orderBy("q_id")
  }

  /** s30 — kNN-GRAPH construction + reciprocity audit: every corpus
    * vector's exact top-5 cosine neighbors as a directed graph, then
    * per-node in-degree and reciprocal-edge count — the structure
    * underneath graph-ANN indexes (NSW/HNSW build on exactly this
    * graph's navigability) and the standard hubness diagnostic: a
    * high-in-degree "hub" vector appears in everyone's lists while
    * contributing few reciprocal edges (Radovanović et al. 2010),
    * which s7's PQ and s2's LSH both degrade on. Out-degree is 5 by
    * construction; in-degree and reciprocity are the data. Integer
    * outputs only — cosine is used solely for RANKING through the
    * bit-identical fused dot kernel with the (cos desc, vec_id)
    * tie-break, so no float ever crosses the hash.
    *
    * Plan: the corpus×corpus scored join is the s1 exact-control
    * posture on the FIXED 500-vector embeddings table (oracle-scale
    * control, like d26's exhaustive arm); the scale path is s2/s29's
    * banded candidates feeding this same rank → in-degree →
    * reciprocity tail, which is two hash aggregates and one
    * edge-edge self-join on the (≤ 5·n)-row edge set — all linear in
    * nodes. Reciprocity joins on the reversed edge key; no window
    * touches more than one query's candidate list.
    */
  def s30KnnGraph(s: SparkSession, dir: String): DataFrame = {
    val all = vecs(s, dir)
    val w = Window
      .partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val edges = all
      .join(
        all.select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qnorm")),
        col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id").as("src"), col("vec_id").as("dst"))
      .localCheckpoint() // three consumers: in-degree, both reciprocity sides
    val indeg = edges.groupBy(col("dst").as("vec_id")).agg(count(lit(1)).as("in_degree"))
    val recip = edges
      .join(
        edges.select(col("src").as("dst"), col("dst").as("src")),
        Seq("src", "dst"))
      .groupBy(col("src").as("vec_id"))
      .agg(count(lit(1)).as("n_reciprocal"))
    all
      .select(col("vec_id"))
      .join(indeg, Seq("vec_id"), "left")
      .join(recip, Seq("vec_id"), "left")
      .select(
        col("vec_id"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"),
        coalesce(col("n_reciprocal"), lit(0L)).as("n_reciprocal"))
      .orderBy("vec_id")
  }

  /** s31 — Matryoshka dimension-truncation recall curve (Kusupati et
    * al. 2022): score the s1 query set with only the FIRST d
    * coordinates, d ∈ {8, 16, 32, 64}, against full-width top-5 truth
    * — the operating curve behind prefix-truncatable embeddings,
    * where a 100 TB index stores d = 64 but serves most traffic from
    * a d = 8 prefix scan (8× bandwidth saved) and re-ranks the
    * shortlist at full width (s17's shortlist-refine shape applied to
    * DIMENSIONS instead of PQ codes). Completes the compression
    * column along its missing axis: s23 quantizes CODES, s26
    * quantizes VALUES, d36 quantizes SKETCHES — s31 truncates
    * DIMENSIONS. This corpus's embeddings are not Matryoshka-trained,
    * so the curve shows what truncation costs when the prefix does
    * NOT concentrate information — the honesty number (s23's
    * doctrine) that says "train for it or keep the dims".
    *
    * Exactness: every truncated score is the same fused left-to-right
    * double dot on a `slice` prefix, ranked with the (cos desc,
    * vec_id) tie-break; recall hits are exact integers over the
    * 20 × 5 truth set. Scale: 4 unrolled brute-force passes on the
    * fixed query set (the s1 control posture); production serves the
    * prefix scan from the same storage via column pruning — no
    * second index.
    */
  /** s31's oracle: the same 4 truncated brute-force rankings (list
    * slices, identical tie-break) semi-joined against the full-width
    * truth.
    */
  private def s31OracleSql: String = {
    def arm(d: Int): String =
      s"""SELECT $d AS d, CAST(count(*) AS BIGINT) AS hits,
         |  CAST(count(*) * 10000 // 100 AS BIGINT) AS recall_bp
         |FROM (
         |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
         |    row_number() OVER (
         |      PARTITION BY q.vec_id
         |      ORDER BY list_inner_product(q.v[1:$d], c.v[1:$d]) /
         |        (sqrt(list_inner_product(q.v[1:$d], q.v[1:$d])) *
         |         sqrt(list_inner_product(c.v[1:$d], c.v[1:$d]))) DESC,
         |      c.vec_id ASC) AS rank
         |  FROM n q JOIN n c ON q.vec_id < 20 AND c.vec_id <> q.vec_id) a
         |JOIN truth t ON t.q_id = a.q_id AND t.neighbor_id = a.neighbor_id
         |WHERE a.rank <= 5""".stripMargin
    s"""WITH n AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |truth AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (
       |        PARTITION BY q.vec_id
       |        ORDER BY list_inner_product(q.v, c.v) /
       |          (sqrt(list_inner_product(q.v, q.v)) *
       |           sqrt(list_inner_product(c.v, c.v))) DESC,
       |        c.vec_id ASC) AS rank
       |    FROM n q JOIN n c ON q.vec_id < 20 AND c.vec_id <> q.vec_id)
       |  WHERE rank <= 5)
       |${Seq(8, 16, 32, 64).map(arm).mkString("\n|UNION ALL\n|")}
       |ORDER BY d""".stripMargin
  }

  def s31MatryoshkaRecall(s: SparkSession, dir: String): DataFrame = {
    val all = vecs(s, dir).localCheckpoint() // 4 truncations + truth read it
    def top5(d: Int): DataFrame = {
      val sliced = all.select(
        col("vec_id"),
        slice(col("v"), 1, d).as("v"))
      val withNorm = sliced.withColumn("norm", sqrt(dot(col("v"), col("v"))))
      val queries = withNorm
        .filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qnorm"))
      val w = Window
        .partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id").asc)
      withNorm
        .join(broadcast(queries), col("vec_id") =!= col("q_id"))
        .withColumn("cos", dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("vec_id").as("neighbor_id"))
    }
    val truth = top5(64).localCheckpoint() // joined against all 4 arms
    val arms = Seq(8, 16, 32, 64).map { d =>
      top5(d)
        .join(truth, Seq("q_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .select(
          lit(d).as("d"),
          col("hits"),
          expr("hits * 10000 div 100").as("recall_bp"))
    }
    arms.reduce(_.unionAll(_)).orderBy("d")
  }

  /** s32 — Matryoshka SHORTLIST-REFINE recall: the production arm s31
    * motivates — scan with the cheap d = 8 prefix to a shortlist of K,
    * re-rank the shortlist at full width, keep top-5; recall vs exact
    * truth per K ∈ {5, 10, 25, 50}. s31 measured raw truncation at
    * 900 bp recall; this curve shows how much of it a K-deep refine
    * buys back — the same shortlist-refine economics as s17 (PQ → ADC
    * → exact) applied to prefix DIMENSIONS, where the scan reads 8/64
    * of the bytes and the refine pays full cost on only K rows per
    * query. The K where the curve saturates IS the operating point.
    *
    * One scored candidate frame serves all four arms: rank once at
    * d = 8 (keep rank ≤ 50), join the full-width vectors of exactly
    * those candidates, then each K is a filter + per-query re-rank of
    * ≤ K rows — never a second corpus scan. Exactness: both ranks use
    * the fused left-to-right double dot with the (cos desc, vec_id)
    * tie-break; hits are exact integers over the 20 × 5 truth set.
    */
  /** s32's oracle: the same d=8 rank-50 candidates, full-width
    * re-rank per shortlist K, identical tie-breaks.
    */
  private def s32OracleSql: String = {
    def arm(k: Int): String =
      s"""SELECT $k AS shortlist_k, CAST(count(*) AS BIGINT) AS hits,
         |  CAST(count(*) * 10000 // 100 AS BIGINT) AS recall_bp
         |FROM (
         |  SELECT q_id, vec_id,
         |    row_number() OVER (
         |      PARTITION BY q_id ORDER BY cos64 DESC, vec_id ASC) AS rr
         |  FROM scored WHERE rank8 <= $k) a
         |JOIN truth t ON t.q_id = a.q_id AND t.neighbor_id = a.vec_id
         |WHERE a.rr <= 5""".stripMargin
    s"""WITH n AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cand AS (
       |  SELECT q_id, vec_id, rank8 FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
       |      row_number() OVER (
       |        PARTITION BY q.vec_id
       |        ORDER BY list_inner_product(q.v[1:8], c.v[1:8]) /
       |          (sqrt(list_inner_product(q.v[1:8], q.v[1:8])) *
       |           sqrt(list_inner_product(c.v[1:8], c.v[1:8]))) DESC,
       |        c.vec_id ASC) AS rank8
       |    FROM n q JOIN n c ON q.vec_id < 20 AND c.vec_id <> q.vec_id)
       |  WHERE rank8 <= 50),
       |scored AS (
       |  SELECT cand.q_id, cand.vec_id, cand.rank8,
       |    list_inner_product(q.v, c.v) /
       |      (sqrt(list_inner_product(q.v, q.v)) *
       |       sqrt(list_inner_product(c.v, c.v))) AS cos64
       |  FROM cand
       |  JOIN n q ON q.vec_id = cand.q_id
       |  JOIN n c ON c.vec_id = cand.vec_id),
       |truth AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (
       |        PARTITION BY q.vec_id
       |        ORDER BY list_inner_product(q.v, c.v) /
       |          (sqrt(list_inner_product(q.v, q.v)) *
       |           sqrt(list_inner_product(c.v, c.v))) DESC,
       |        c.vec_id ASC) AS rank
       |    FROM n q JOIN n c ON q.vec_id < 20 AND c.vec_id <> q.vec_id)
       |  WHERE rank <= 5)
       |${Seq(5, 10, 25, 50).map(arm).mkString("\n|UNION ALL\n|")}
       |ORDER BY shortlist_k""".stripMargin
  }

  def s32MatryoshkaRefine(s: SparkSession, dir: String): DataFrame = {
    val all = vecs(s, dir).localCheckpoint() // prefix arm + full arm + truth
    val pre = all.select(
      col("vec_id"),
      slice(col("v"), 1, 8).as("v8"))
      .withColumn("norm8", sqrt(dot(col("v8"), col("v8"))))
    val queries8 = pre
      .filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("v8").as("qv8"), col("norm8").as("qnorm8"))
    val w8 = Window
      .partitionBy(col("q_id"))
      .orderBy(col("cos8").desc, col("vec_id").asc)
    val cand = pre
      .join(broadcast(queries8), col("vec_id") =!= col("q_id"))
      .withColumn("cos8", dot(col("qv8"), col("v8")) / (col("qnorm8") * col("norm8")))
      .withColumn("rank8", row_number().over(w8))
      .filter(col("rank8") <= 50)
      .select(col("q_id"), col("vec_id"), col("rank8"))
    val fullQ = all
      .filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val scored = cand
      .join(all, "vec_id")
      .join(broadcast(fullQ), "q_id")
      .withColumn("cos64", dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
      .select(col("q_id"), col("vec_id"), col("rank8"), col("cos64"))
      .localCheckpoint() // four K arms re-rank it
    val truth = s1KnnBruteForce(s, dir)
      .select(col("q_id"), col("neighbor_id"))
      .localCheckpoint()
    val arms = Seq(5, 10, 25, 50).map { k =>
      val wk = Window
        .partitionBy(col("q_id"))
        .orderBy(col("cos64").desc, col("vec_id").asc)
      scored
        .filter(col("rank8") <= k)
        .withColumn("rr", row_number().over(wk))
        .filter(col("rr") <= 5)
        .select(col("q_id"), col("vec_id").as("neighbor_id"))
        .join(truth, Seq("q_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .select(
          lit(k).as("shortlist_k"),
          col("hits"),
          expr("hits * 10000 div 100").as("recall_bp"))
    }
    arms.reduce(_.unionAll(_)).orderBy("shortlist_k")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s32_matryoshka_refine" -> s32MatryoshkaRefine,
    "s31_matryoshka_recall" -> s31MatryoshkaRecall,
    "s30_knn_graph" -> s30KnnGraph,
    "s29_multiprobe_lsh" -> s29MultiprobeLsh,
    "s28_vote_calibration" -> s28VoteCalibration,
    "s22_recall_curve" -> s22RecallCurve,
    "s21_embedding_drift" -> s21EmbeddingDrift,
    "s26_int8_recall" -> s26Int8Recall,
    "s27_effective_dim" -> s27EffectiveDim,
    "s20_classify_eval" -> s20ClassifyEval,
    "s19_filtered_search" -> s19FilteredSearch,
    "s18_ivf_persist" -> s18IvfPersist,
    "s17_adc_refine" -> s17AdcRefine,
    "s16_mmr_diversify" -> s16MmrDiversify,
    "s12_knn_classify" -> s12KnnClassify,
    "s11_ivf_trained_search" -> s11IvfTrainedSearch,
    "s10_kmeans_train" -> s10KmeansTrain,
    "s9_radius_search" -> s9RadiusSearch,
    "s14_lsh_recall" -> s14LshRecall,
    "s25_hybrid_rrf" -> s25HybridRrf,
    "s24_nprobe_curve" -> s24NprobeCurve,
    "s23_pq_recall" -> s23PqRecall,
    "s15_ivf_recall" -> s15IvfRecall,
    "s13_cluster_quality" -> s13ClusterQuality,
    "s6_centroid_assign" -> s6CentroidAssign,
    "s7_pq_encode" -> s7PqEncode,
    "s8_pq_adc_search" -> s8PqAdcSearch,
    "s1_knn_bruteforce" -> s1KnnBruteForce,
    "s2_knn_lsh" -> s2KnnLsh,
    "s3_knn_ivf" -> s3KnnIvf,
    "s4_cell_centroids" -> s4CellCentroids,
    "s5_quantize" -> s5Quantize
  )

  /** s14 — ANN recall evaluation: per query, how many of the exact
    * top-5 (s1) the LSH index (s2) actually returned — recall@5, THE
    * number that decides whether an approximate index is shippable
    * (the spec-pinned recall ≥ 0.6 floor, now as an oracle-checked
    * QUERY so the evaluation harness itself is part of the engine).
    * Pure composition: both rankings are deterministic (fixed planes,
    * fixed tie-breaks), so their intersection is too — the oracle
    * replays BOTH pipelines and must hash-match per query. Plan: the
    * two pipelines share the embeddings scan; the intersection join
    * and per-query rollup ride query-count-sized rows.
    */
  def s14LshRecall(s: SparkSession, dir: String): DataFrame = {
    val exact = s1KnnBruteForce(s, dir).select(col("q_id"), col("neighbor_id"))
    val approx = s2KnnLsh(s, dir).select(col("q_id"), col("neighbor_id"))
    val hits = exact
      .join(approx, Seq("q_id", "neighbor_id"))
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("hits"))
    exact
      .select(col("q_id"))
      .distinct()
      .join(hits, Seq("q_id"), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .select(
        col("q_id"),
        col("hits"),
        round(col("hits").cast("double") / 5.0, 4).as("recall_at_5"))
      .orderBy("q_id")
  }

  /** s15 — IVF recall evaluation: s14's harness pointed at the
    * coarse-quantizer index (s3, nprobe=4) instead of the hyperplane
    * tables — together they answer "which index family holds recall
    * on THIS corpus" from two oracle-checked reports. Same
    * composition shape: deterministic rankings, intersection per
    * query, query-count-sized everything after the shared scan.
    */
  def s15IvfRecall(s: SparkSession, dir: String): DataFrame = {
    val exact = s1KnnBruteForce(s, dir).select(col("q_id"), col("neighbor_id"))
    val approx = s3KnnIvf(s, dir).select(col("q_id"), col("neighbor_id"))
    val hits = exact
      .join(approx, Seq("q_id", "neighbor_id"))
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("hits"))
    exact
      .select(col("q_id"))
      .distinct()
      .join(hits, Seq("q_id"), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .select(
        col("q_id"),
        col("hits"),
        round(col("hits").cast("double") / 5.0, 4).as("recall_at_5"))
      .orderBy("q_id")
  }

  /** s23 — PQ/ADC recall evaluation: s14/s15's harness pointed at the
    * product-quantized index (s7/s8), completing the recall trilogy —
    * hyperplane LSH (s14), coarse IVF (s15), and now PQ compression.
    * Unlike the first two, PQ's loss has a different CAUSE (metric
    * distortion from 64-dim → 8-codeword reconstruction, not candidate
    * pruning), so its recall number answers a different design
    * question: how much top-5 agreement survives 32× compression.
    * Same composition shape: two deterministic rankings, intersection
    * per query, query-count-sized everything after the shared scan;
    * at 100 TB the eval runs on a sampled query set and the exact arm
    * is the only brute-force pass (the price of ground truth — s1's
    * scaladoc). Measured at sf0.01: mean recall@5 = 0.17 — the
    * random-uniform fixture has no cluster structure for 16 codewords
    * to exploit, the honest "PQ alone is a compressor, not an index"
    * number that motivates s17's ADC-then-exact-refine two-stage.
    */
  def s23PqRecall(s: SparkSession, dir: String): DataFrame = {
    val exact = s1KnnBruteForce(s, dir).select(col("q_id"), col("neighbor_id"))
    val approx = s8PqAdcSearch(s, dir).select(col("q_id"), col("neighbor_id"))
    val hits = exact
      .join(approx, Seq("q_id", "neighbor_id"))
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("hits"))
    exact
      .select(col("q_id"))
      .distinct()
      .join(hits, Seq("q_id"), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .select(
        col("q_id"),
        col("hits"),
        round(col("hits").cast("double") / 5.0, 4).as("recall_at_5"))
      .orderBy("q_id")
  }

  /** s26 — int8 scalar-quantization recall: s14/s15/s23's harness
    * pointed at SYMMETRIC int8 search, completing the compression
    * column of the recall table — hyperplane LSH (s14, pruning loss),
    * coarse IVF (s15, pruning loss), PQ (s23, 32× compression,
    * recall 0.17 on this structureless fixture) and now per-vector
    * scalar quantization (4× compression). Scoring uses the standard
    * integer-dot-plus-correction identity: with x̂ᵢ = mn + qᵢ·s,
    * ⟨x̂,ŷ⟩ = mnₓmnᵧD + mnₓsᵧΣq ᵧ + mnᵧsₓΣqₓ + sₓsᵧ⟨qₓ,qᵧ⟩ — the bulk
    * of the work is ONE dot product over small integer codes (the
    * SIMD-friendly form production int8 engines run), the corrections
    * are four per-vector scalars. All code values and their sums are
    * exact small integers in doubles, so both engines agree bit-for-
    * bit and the ranking is deterministic ((cos desc, id) total
    * order). Measured at sf0.01: mean recall@5 = 0.99 (18/20 queries
    * perfect, worst 0.8) — int8 reconstruction barely reorders the
    * top-5 — next to s23's 0.17, the one-read "quantize before you
    * PQ" capacity table. Plan shape: s1's broadcast query×corpus
    * score, query-count-sized everything after the shared scan.
    */
  def s26Int8Recall(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val p = e.select(
      col("vec_id"),
      col("v"),
      array_min(col("v")).as("mn"),
      ((array_max(col("v")) - array_min(col("v"))) / 255.0).as("scale"))
    val q = p
      .select(
        col("vec_id"),
        col("mn"),
        col("scale"),
        transform(
          col("v"),
          x =>
            when(col("scale") === 0.0, lit(0.0))
              .otherwise(floor((x - col("mn")) / col("scale") + 0.5))).as("qv"))
      .withColumn("sq", aggregate(col("qv"), lit(0.0), (acc, x) => acc + x))
      .withColumn("sqq", aggregate(col("qv"), lit(0.0), (acc, x) => acc + x * x))
      .withColumn(
        "rnorm",
        sqrt(
          col("mn") * col("mn") * 64 + lit(2.0) * col("mn") * col("scale") * col("sq") +
            col("scale") * col("scale") * col("sqq")))
    val qs = q
      .filter(col("vec_id") < 20)
      .select(
        col("vec_id").as("q_id"),
        col("mn").as("mna"),
        col("scale").as("sa"),
        col("qv").as("qa"),
        col("sq").as("sqa"),
        col("rnorm").as("rna"))
    val cos =
      (col("mna") * col("mnb") * 64 + col("mna") * col("sb") * col("sqb") +
        col("mnb") * col("sa") * col("sqa") +
        col("sa") * col("sb") * dot(col("qa"), col("qb"))) / (col("rna") * col("rnb"))
    val byQ = Window.partitionBy(col("q_id")).orderBy(col("acos").desc, col("neighbor_id").asc)
    // corpus side stays distributed; the 20-query side broadcasts
    // (s1's shape — never the reverse at 100 TB)
    val approx = q
      .select(
        col("vec_id").as("neighbor_id"),
        col("mn").as("mnb"),
        col("scale").as("sb"),
        col("qv").as("qb"),
        col("sq").as("sqb"),
        col("rnorm").as("rnb"))
      .join(broadcast(qs), col("neighbor_id") =!= col("q_id"))
      .withColumn("acos", cos)
      .withColumn("rank", row_number().over(byQ))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("neighbor_id"))
    val exact = s1KnnBruteForce(s, dir).select(col("q_id"), col("neighbor_id"))
    val hits = exact
      .join(approx, Seq("q_id", "neighbor_id"))
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("hits"))
    exact
      .select(col("q_id"))
      .distinct()
      .join(hits, Seq("q_id"), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .select(
        col("q_id"),
        col("hits"),
        round(col("hits").cast("double") / 5.0, 4).as("recall_at_5"))
      .orderBy("q_id")
  }

  /** s27 — effective-dimensionality report: per-coordinate variance
    * of the embedding corpus, each dimension's share of total variance
    * (basis points, with the cumulative running share), and the
    * PARTICIPATION RATIO PR = (Σσ²)²/Σσ⁴ — the "how many dimensions
    * actually carry signal" number (isotropic 64-dim ⇒ PR ≈ 64; rank-
    * collapsed embeddings ⇒ PR ≪ dim) that decides whether PCA-style
    * projection should run BEFORE the s5/s7 quantizers in the
    * compression stack. Diagonal-covariance PR, the standard cheap
    * proxy — full spectral PR needs an eigensolve no SQL engine runs.
    *
    * Determinism: coordinates quantize ONCE to integer micro-units
    * (floor(x·10⁶ + 0.5) — q68's integer-moments posture), so every
    * per-dim moment is an EXACT integer sum in DECIMAL(38,0) (Σx²
    * passes 2^63 well before 100 TB vectors) and the variance algebra
    * is exact cross-multiplied integers; the published share/PR are
    * fixed double expressions over those exact operands. Plan: one
    * posexplode + ONE 64-group aggregate; the spectrum table is
    * dim-sized, the rest is windows over 64 rows.
    */
  def s27EffectiveDim(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val m = Tables
      .embeddings(s, dir)
      .select(posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
      .select(col("dim"), expr("CAST(floor(x * 1000000 + 0.5) AS BIGINT)").as("xq"))
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).cast(dec).as("n"),
        sum(col("xq").cast(dec)).as("sx"),
        sum(col("xq").cast(dec) * col("xq").cast(dec)).as("sxx"))
      // n·Σx² − (Σx)² = n²·variance — exact integers throughout
      .select(col("dim"), (col("n") * col("sxx") - col("sx") * col("sx")).as("v2"))
    val tot = m.agg(
      sum(col("v2")).as("tv"),
      sum(col("v2").cast("double") * col("v2").cast("double")).as("tv2"))
    val wCum = Window.orderBy(col("v2").desc, col("dim").asc)
    m.crossJoin(broadcast(tot))
      .select(
        col("dim"),
        expr("CAST(v2 * 10000 div tv AS BIGINT)").as("var_share_bp"),
        sum(expr("CAST(v2 * 10000 div tv AS BIGINT)"))
          .over(wCum)
          .as("cum_share_bp"),
        expr("round(CAST(tv AS DOUBLE) * CAST(tv AS DOUBLE) / tv2, 3)")
          .as("participation_ratio"))
      .orderBy(col("var_share_bp").desc, col("dim").asc)
  }

  /** s24 — IVF nprobe operating curve: recall@5 as a function of how
    * many cells a query probes (1..8) — d21's threshold-sweep idea
    * pointed at ANN tuning. The trick that makes this ONE pass instead
    * of eight searches: a true exact-top-5 neighbor is found by IVF at
    * probe depth p iff its ASSIGNED cell ranks ≤ p in the query's
    * probe order (within a probed cell nothing outscores a true
    * top-5 member, so candidate-set membership is the only gate) — so
    * the whole curve is "rank of the neighbor's cell" histogrammed and
    * forward-cumulated, the d21 running-sum shape. s15's nprobe=4
    * point must sit ON this curve (pinned in OpsSpec). Exact integer
    * counts; basis points by nonneg div; cell ranks use s3's
    * deterministic (cosine desc, cell asc) order. At 100 TB: one
    * centroid broadcast, one exact-arm pass (the price of ground
    * truth), the probe table is queries × 16 rows.
    */
  def s24NprobeCurve(s: SparkSession, dir: String): DataFrame = {
    val k = 16
    val all = vecs(s, dir)
    val centroids = all
      .filter(pmod(col("vec_id"), lit(125)) === 0)
      .withColumn("cell", (col("vec_id") / 125).cast("int"))
      // the vec_id conjunct restates cell < k on the RAW key so the
      // standing broadcast-hint gate can SEE the K-bound (cell is
      // derived; the gate only trusts literal ranges on id columns)
      .filter(col("cell") < k && col("vec_id") < 125L * k)
      .select(col("cell"), col("v").as("cv"), col("norm").as("cnorm"))
    val byVec = Window
      .partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cell").asc)
    val ranked = all
      .crossJoin(broadcast(centroids))
      .withColumn("ccos", dot(col("v"), col("cv")) / (col("norm") * col("cnorm")))
      .withColumn("crn", row_number().over(byVec))
    val assigned = ranked
      .filter(col("crn") === 1)
      .select(col("vec_id").as("neighbor_id"), col("cell"))
    val cellRank = ranked
      .filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("cell"), col("crn"))
    val exact = s1KnnBruteForce(s, dir).select(col("q_id"), col("neighbor_id"))
    val byRank = exact
      .join(assigned, "neighbor_id")
      .join(cellRank, Seq("q_id", "cell"))
      .groupBy(col("crn"))
      .agg(count(lit(1)).as("cnt"))
    val tot = exact.agg(count(lit(1)).as("n_possible"))
    s.range(1, 9)
      .select(col("id").as("nprobe"))
      .join(byRank, col("crn") <= col("nprobe"), "left")
      .groupBy(col("nprobe"))
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("n_hits"))
      .crossJoin(broadcast(tot))
      .select(
        col("nprobe"),
        col("n_hits"),
        col("n_possible"),
        expr("n_hits * 10000L div n_possible").as("recall_bp"))
      .orderBy("nprobe")
  }

  /** s25 — hybrid retrieval via reciprocal-rank fusion: the standard
    * two-tower serving pattern (a lexical BM25 arm and a dense
    * vector arm retrieve independently; RRF merges the rankings with
    * score = Σ 1/(60+rank) — Cormack et al. 2009's k=60), which is
    * how production RAG retrieval actually ships: neither arm alone,
    * never a trained re-ranker on the first hop. Arms: t26's BM25
    * top-15 (text arm, its exact replay) and cosine-vs-query-vector
    * top-15 over the documents' embeddings (vec_id = doc_id, m15's
    * pairing; query = vector 0). Fusion math: ranks are exact ints;
    * each RRF term is ONE IEEE division and the two-term sum is
    * written in fixed (text + vec) order, so both engines produce the
    * identical double — no order-dependent float aggregation
    * anywhere. Scale: each arm is its own production shape (t26's
    * corpus-wide scan, one broadcast query vector); the fusion joins
    * two 15-row lists.
    */
  def s25HybridRrf(s: SparkSession, dir: String): DataFrame = {
    val textArm = graft.ops.TextAnalysis
      .t26Bm25(s, dir)
      .select(
        col("doc_id"),
        row_number()
          .over(Window.orderBy(col("bm25").desc, col("doc_id").asc))
          .cast("long")
          .as("rank_text"))
    val docVecs = vecs(s, dir)
      .join(
        Tables.documents(s, dir).select(col("doc_id")),
        col("vec_id") === col("doc_id"))
    val qv = vecs(s, dir)
      .filter(col("vec_id") === 0)
      .select(col("v").as("qv"), col("norm").as("qnorm"))
    val vecArm = docVecs
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("norm") * col("qnorm")))
      .withColumn(
        "rank_vec",
        row_number().over(Window.orderBy(col("cos").desc, col("vec_id").asc)).cast("long"))
      .filter(col("rank_vec") <= 15)
      .select(col("doc_id"), col("rank_vec"))
    textArm
      .join(vecArm, Seq("doc_id"), "full_outer")
      .withColumn(
        "rrf",
        expr("coalesce(CAST(1 AS DOUBLE) / (60 + rank_text), CAST(0 AS DOUBLE)) + " +
          "coalesce(CAST(1 AS DOUBLE) / (60 + rank_vec), CAST(0 AS DOUBLE))"))
      .withColumn("rk", row_number().over(Window.orderBy(col("rrf").desc, col("doc_id").asc)))
      .filter(col("rk") <= 10)
      .select(
        col("doc_id"),
        col("rank_text"),
        col("rank_vec"),
        round(col("rrf"), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
  }

  /** s25's oracle: t26's replay as the text arm, the cosine ranking as
    * the vector arm, the same fixed-order two-term RRF sum.
    */
  private def s25OracleSql: String =
    s"""WITH t26 AS (${graft.ops.TextAnalysis.t26OracleSql}),
       |ta AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank_text
       |  FROM t26),
       |e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm
       |      FROM e),
       |dv AS (
       |  SELECT n.* FROM n JOIN documents ON vec_id = doc_id),
       |q AS (SELECT v AS qv, norm AS qnorm FROM n WHERE vec_id = 0),
       |va AS (
       |  SELECT vec_id AS doc_id, rank_vec FROM (
       |    SELECT dv.vec_id,
       |      row_number() OVER (
       |        ORDER BY list_inner_product(dv.v, q.qv) / (dv.norm * q.qnorm)
       |          DESC, dv.vec_id ASC) AS rank_vec
       |    FROM dv, q WHERE dv.vec_id <> 0)
       |  WHERE rank_vec <= 15),
       |fused AS (
       |  SELECT COALESCE(ta.doc_id, va.doc_id) AS doc_id,
       |    CAST(rank_text AS BIGINT) AS rank_text,
       |    CAST(rank_vec AS BIGINT) AS rank_vec,
       |    COALESCE(CAST(1 AS DOUBLE) / (60 + rank_text), CAST(0 AS DOUBLE)) +
       |    COALESCE(CAST(1 AS DOUBLE) / (60 + rank_vec), CAST(0 AS DOUBLE))
       |      AS rrf
       |  FROM ta FULL OUTER JOIN va ON ta.doc_id = va.doc_id)
       |SELECT doc_id, rank_text, rank_vec, round(rrf, 6) AS rrf FROM (
       |  SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS rk
       |  FROM fused)
       |WHERE rk <= 10
       |ORDER BY rrf DESC, doc_id ASC""".stripMargin

  /** s24's oracle: the same cell-rank histogram forward-cumulated over
    * the probe depths.
    */
  private def s24OracleSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm
       |      FROM e),
       |cent AS (
       |  SELECT CAST(vec_id // 125 AS INTEGER) AS cell, v AS cv,
       |    norm AS cnorm
       |  FROM n WHERE vec_id % 125 = 0 AND vec_id // 125 < 16),
       |assign0 AS (
       |  SELECT n.vec_id, c.cell,
       |    row_number() OVER (PARTITION BY n.vec_id
       |      ORDER BY list_inner_product(n.v, c.cv) / (n.norm * c.cnorm)
       |        DESC, c.cell ASC) AS crn
       |  FROM n, cent c),
       |assigned AS (
       |  SELECT vec_id AS neighbor_id, cell FROM assign0 WHERE crn = 1),
       |cellrank AS (
       |  SELECT vec_id AS q_id, cell, crn FROM assign0 WHERE vec_id < 20),
       |s1r AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (
       |        PARTITION BY q.vec_id
       |        ORDER BY list_inner_product(q.v, c.v) / (q.norm * c.norm)
       |          DESC, c.vec_id ASC) AS rank
       |    FROM n q JOIN n c ON q.vec_id < 20 AND c.vec_id <> q.vec_id)
       |  WHERE rank <= 5),
       |need AS (
       |  SELECT s1r.q_id, cr.crn
       |  FROM s1r
       |  JOIN assigned a USING (neighbor_id)
       |  JOIN cellrank cr ON cr.q_id = s1r.q_id AND cr.cell = a.cell),
       |byrank AS (SELECT crn, count(*) AS cnt FROM need GROUP BY 1),
       |tot AS (SELECT count(*) AS n_possible FROM s1r),
       |probes AS (SELECT unnest(range(1, 9)) AS nprobe)
       |SELECT p.nprobe,
       |  CAST(COALESCE(sum(b.cnt), 0) AS BIGINT) AS n_hits,
       |  (SELECT CAST(n_possible AS BIGINT) FROM tot) AS n_possible,
       |  CAST(COALESCE(sum(b.cnt), 0) * 10000 //
       |    (SELECT n_possible FROM tot) AS BIGINT) AS recall_bp
       |FROM probes p LEFT JOIN byrank b ON b.crn <= p.nprobe
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** s23's oracle: the s14 harness with s8's replay as the approximate
    * arm.
    */
  /** s26's oracle: s1's exact arm intersected with the full int8
    * symmetric-search replay — quantization (s5's construction over
    * the whole corpus), code sums, the correction-term identity in
    * the same operand order, the same total tie-break.
    */
  private def s26OracleSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |p AS (
      |  SELECT vec_id, v, list_min(v) AS mn,
      |    (list_max(v) - list_min(v)) / 255.0 AS scale
      |  FROM e),
      |q8 AS (
      |  SELECT vec_id, mn, scale,
      |    list_transform(v, x -> CASE WHEN scale = 0 THEN 0.0
      |      ELSE floor((x - mn) / scale + 0.5) END) AS qv
      |  FROM p),
      |m AS (
      |  SELECT vec_id, mn, scale, qv, list_sum(qv) AS sq,
      |    list_inner_product(qv, qv) AS sqq
      |  FROM q8),
      |n8 AS (
      |  SELECT vec_id, mn, scale, qv, sq,
      |    sqrt(mn * mn * 64 + 2.0 * mn * scale * sq + scale * scale * sqq)
      |      AS rnorm
      |  FROM m),
      |ascored AS (
      |  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
      |    row_number() OVER (
      |      PARTITION BY a.vec_id
      |      ORDER BY (a.mn * b.mn * 64 + a.mn * b.scale * b.sq
      |                + b.mn * a.scale * a.sq
      |                + a.scale * b.scale * list_inner_product(a.qv, b.qv))
      |               / (a.rnorm * b.rnorm) DESC,
      |               b.vec_id ASC) AS rank
      |  FROM n8 a JOIN n8 b ON a.vec_id < 20 AND b.vec_id <> a.vec_id),
      |approx AS (SELECT q_id, neighbor_id FROM ascored WHERE rank <= 5),
      |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm FROM e),
      |escored AS (
      |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
      |    row_number() OVER (
      |      PARTITION BY q.vec_id
      |      ORDER BY list_inner_product(q.v, c.v) / (q.norm * c.norm) DESC,
      |               c.vec_id ASC) AS rank
      |  FROM n q JOIN n c ON q.vec_id < 20 AND c.vec_id <> q.vec_id),
      |exact AS (SELECT q_id, neighbor_id FROM escored WHERE rank <= 5),
      |h AS (
      |  SELECT exact.q_id, count(*) AS hits
      |  FROM exact JOIN approx USING (q_id, neighbor_id) GROUP BY 1),
      |qs AS (SELECT DISTINCT q_id FROM exact)
      |SELECT qs.q_id, COALESCE(h.hits, 0) AS hits,
      |  round(COALESCE(h.hits, 0)::DOUBLE / 5.0, 4) AS recall_at_5
      |FROM qs LEFT JOIN h USING (q_id) ORDER BY qs.q_id""".stripMargin

  private def s23OracleSql: String =
    s"""WITH s1r AS (
       |  SELECT q_id, neighbor_id FROM (
       |    WITH e AS (
       |      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |    n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm
       |          FROM e),
       |    scored AS (
       |      SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
       |        row_number() OVER (
       |          PARTITION BY q.vec_id
       |          ORDER BY list_inner_product(q.v, c.v) / (q.norm * c.norm)
       |                     DESC,
       |                   c.vec_id ASC) AS rank
       |      FROM n q JOIN n c ON q.vec_id < 20 AND c.vec_id <> q.vec_id)
       |    SELECT q_id, neighbor_id FROM scored WHERE rank <= 5)),
       |s8r AS (
       |  SELECT q_id, neighbor_id FROM ($s8OracleSql)),
       |h AS (
       |  SELECT s1r.q_id, count(*) AS hits
       |  FROM s1r JOIN s8r USING (q_id, neighbor_id) GROUP BY 1),
       |qs AS (SELECT DISTINCT q_id FROM s1r)
       |SELECT qs.q_id, COALESCE(h.hits, 0) AS hits,
       |  round(COALESCE(h.hits, 0)::DOUBLE / 5.0, 4) AS recall_at_5
       |FROM qs LEFT JOIN h USING (q_id) ORDER BY qs.q_id""".stripMargin

  /** s15's oracle: s1 + the full s3 pipeline, intersected per query. */
  private def s15OracleSql: String =
    s"""WITH s1r AS (
       |  SELECT q_id, neighbor_id FROM (
       |    WITH e AS (
       |      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |    n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm
       |          FROM e),
       |    scored AS (
       |      SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
       |        row_number() OVER (
       |          PARTITION BY q.vec_id
       |          ORDER BY list_inner_product(q.v, c.v) / (q.norm * c.norm)
       |                     DESC,
       |                   c.vec_id ASC) AS rank
       |      FROM n q JOIN n c ON q.vec_id < 20 AND c.vec_id <> q.vec_id)
       |    SELECT q_id, neighbor_id FROM scored WHERE rank <= 5)),
       |s3r AS (
       |  SELECT q_id, neighbor_id FROM ($s3OracleSql)),
       |h AS (
       |  SELECT s1r.q_id, count(*) AS hits
       |  FROM s1r JOIN s3r USING (q_id, neighbor_id) GROUP BY 1),
       |qs AS (SELECT DISTINCT q_id FROM s1r)
       |SELECT qs.q_id, COALESCE(h.hits, 0) AS hits,
       |  round(COALESCE(h.hits, 0)::DOUBLE / 5.0, 4) AS recall_at_5
       |FROM qs LEFT JOIN h USING (q_id) ORDER BY qs.q_id""".stripMargin

  /** s3's oracle as a reusable def (also composed into s15's). */
  private def s3OracleSql: String =
    """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm FROM e),
        |cent AS (
        |  SELECT CAST(vec_id // 125 AS INTEGER) AS cell, v AS cv,
        |    norm AS cnorm
        |  FROM n WHERE vec_id % 125 = 0 AND vec_id // 125 < 16),
        |assign0 AS (
        |  SELECT n.vec_id, n.norm, c.cell,
        |    row_number() OVER (PARTITION BY n.vec_id
        |      ORDER BY list_inner_product(n.v, c.cv) / (n.norm * c.cnorm)
        |        DESC, c.cell ASC) AS crn
        |  FROM n, cent c),
        |assigned AS (
        |  SELECT vec_id, cell FROM assign0 WHERE crn = 1),
        |qprobe AS (
        |  SELECT vec_id AS q_id, cell
        |  FROM assign0 WHERE vec_id < 20 AND crn <= 4),
        |scored AS (
        |  SELECT q.q_id, a.vec_id AS neighbor_id,
        |    list_inner_product(qn.v, an.v) / (qn.norm * an.norm) AS cos,
        |    row_number() OVER (PARTITION BY q.q_id
        |      ORDER BY list_inner_product(qn.v, an.v) / (qn.norm * an.norm)
        |        DESC, a.vec_id ASC) AS rank
        |  FROM qprobe q
        |  JOIN assigned a USING (cell)
        |  JOIN n qn ON q.q_id = qn.vec_id
        |  JOIN n an ON a.vec_id = an.vec_id
        |  WHERE a.vec_id <> q.q_id)
        |SELECT q_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
        |  round(cos, 4) AS cosine
        |FROM scored WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin

  /** s14's oracle: the s1 ranking and the full s2 pipeline replayed as
    * nested CTE subqueries, intersected per query.
    */
  /** s22's oracle: s1 and s2 replayed WITH their rank columns; every
    * k-level is a conditional count over the single rank join.
    */
  private def s22OracleSql: String = {
    val levels = (1 to 5)
      .map(k =>
        s"""    CAST(sum(CASE WHEN greatest(er, ar) <= $k THEN 1 ELSE 0 END)
         |         AS BIGINT) AS h$k""".stripMargin)
      .mkString(",\n")
    val union = (1 to 5)
      .map(k => s"  SELECT $k AS k, h$k AS hits FROM a")
      .mkString("\n  UNION ALL\n")
    s"""WITH ex AS (
       |  SELECT q_id, neighbor_id, rank AS er FROM (
       |    WITH e AS (
       |      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |    n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm
       |          FROM e),
       |    scored AS (
       |      SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
       |        row_number() OVER (
       |          PARTITION BY q.vec_id
       |          ORDER BY list_inner_product(q.v, c.v) / (q.norm * c.norm)
       |                     DESC,
       |                   c.vec_id ASC) AS rank
       |      FROM n q JOIN n c ON q.vec_id < 20 AND c.vec_id <> q.vec_id)
       |    SELECT q_id, neighbor_id, rank FROM scored WHERE rank <= 5)),
       |ap AS (
       |  SELECT q_id, neighbor_id, rank AS ar FROM ($s2OracleSql)),
       |j AS (
       |  SELECT ex.q_id, ex.er, ap.ar
       |  FROM ex JOIN ap USING (q_id, neighbor_id)),
       |nqs AS (SELECT CAST(count(DISTINCT q_id) AS BIGINT) AS nq FROM ex),
       |a AS (
       |  SELECT
       |$levels
       |  FROM j),
       |u AS (
       |$union)
       |SELECT CAST(k AS BIGINT) AS k, hits,
       |  CAST((hits * 10000) // (nqs.nq * k) AS BIGINT) AS recall_bp
       |FROM u, nqs ORDER BY k""".stripMargin
  }

  /** s8's DuckDB oracle — standalone so s23's recall harness can
    * embed the same replay as a subquery (the s14/s2 pattern).
    */
  private def s8OracleSql: String =
    """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT list(v ORDER BY vec_id) AS cents FROM e WHERE vec_id < 16),
        |enc AS (
        |  SELECT vec_id,
        |    list_transform(range(0, 8), m ->
        |      list_transform(c.cents, cv ->
        |        list_reduce(list_prepend(0.0, list_transform(range(1, 9),
        |          k -> (v[m * 8 + k] - cv[m * 8 + k]) *
        |               (v[m * 8 + k] - cv[m * 8 + k]))), (a, b) -> a + b))) AS dd
        |  FROM e, c),
        |codes AS (
        |  SELECT vec_id,
        |    list_transform(dd, d -> list_position(d, list_min(d))) AS code
        |  FROM enc),
        |rec AS (
        |  SELECT vec_id,
        |    flatten(list_transform(range(0, 8),
        |      m -> c.cents[code[m + 1]][m * 8 + 1 : m * 8 + 8])) AS rec
        |  FROM codes, c),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 20),
        |scored AS (
        |  SELECT q_id, r.vec_id AS neighbor_id,
        |    list_reduce(list_prepend(0.0, list_transform(range(1, 65),
        |      k -> (qv[k] - rec[k]) * (qv[k] - rec[k]))), (a, b) -> a + b) AS adc
        |  FROM q JOIN rec r ON r.vec_id <> q_id),
        |ranked AS (
        |  SELECT q_id, neighbor_id, adc,
        |    row_number() OVER (
        |      PARTITION BY q_id ORDER BY adc ASC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT q_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
        |  round(adc, 6) AS adc_dist
        |FROM ranked WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin

  private def s14OracleSql: String =
    s"""WITH s1r AS (
       |  SELECT q_id, neighbor_id FROM (
       |    WITH e AS (
       |      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |    n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm
       |          FROM e),
       |    scored AS (
       |      SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
       |        row_number() OVER (
       |          PARTITION BY q.vec_id
       |          ORDER BY list_inner_product(q.v, c.v) / (q.norm * c.norm)
       |                     DESC,
       |                   c.vec_id ASC) AS rank
       |      FROM n q JOIN n c ON q.vec_id < 20 AND c.vec_id <> q.vec_id)
       |    SELECT q_id, neighbor_id FROM scored WHERE rank <= 5)),
       |s2r AS (
       |  SELECT q_id, neighbor_id FROM ($s2OracleSql)),
       |h AS (
       |  SELECT s1r.q_id, count(*) AS hits
       |  FROM s1r JOIN s2r USING (q_id, neighbor_id) GROUP BY 1),
       |qs AS (SELECT DISTINCT q_id FROM s1r)
       |SELECT qs.q_id, COALESCE(h.hits, 0) AS hits,
       |  round(COALESCE(h.hits, 0)::DOUBLE / 5.0, 4) AS recall_at_5
       |FROM qs LEFT JOIN h USING (q_id) ORDER BY qs.q_id""".stripMargin

  /** s2's DuckDB oracle, constructed programmatically: the 12×4 LCG
    * hyperplanes embed as `(t, j, DOUBLE[])` literal rows
    * (Double.toString is guaranteed to round-trip the IEEE value, and
    * DuckDB's decimal→double parse is correctly rounded, so the SQL
    * planes are bit-identical to the Scala arrays). Bucket codes,
    * candidate generation and ranking then mirror the Spark plan
    * exactly — the oracle checks the full approximate OUTPUT, not just
    * row counts.
    */
  /** The session's 12×4 hyperplane set as DuckDB VALUES rows
    * `(t, j, pv)` — shared by every oracle that replays the sign
    * buckets in SQL (s2, s29, and d40's banded threshold-sweep arm).
    */
  private[ops] def planeRowsSql: String =
    hyperplanes.zipWithIndex
      .flatMap { case (tbl, t) =>
        tbl.zipWithIndex.map { case (plane, j) =>
          s"($t, $j, [${plane.map(_.toString).mkString(", ")}]::DOUBLE[])"
        }
      }
      .mkString(", ")

  private def s2OracleSql: String = {
    val planeRows = planeRowsSql
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm FROM e),
       |planes(t, j, pv) AS (VALUES $planeRows),
       |bkt AS (
       |  SELECT n.vec_id, p.t,
       |    CAST(sum(CASE WHEN list_inner_product(n.v, p.pv) > 0
       |             THEN 1 << p.j ELSE 0 END) AS INTEGER) AS bk
       |  FROM n, planes p GROUP BY n.vec_id, p.t),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS vec_id
       |  FROM bkt q JOIN bkt c ON q.t = c.t AND q.bk = c.bk
       |  WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
       |scored AS (
       |  SELECT cand.q_id, cand.vec_id,
       |    list_inner_product(qn.v, cn.v) / (qn.norm * cn.norm) AS cos,
       |    row_number() OVER (PARTITION BY cand.q_id
       |      ORDER BY list_inner_product(qn.v, cn.v) / (qn.norm * cn.norm)
       |        DESC, cand.vec_id ASC) AS rank
       |  FROM cand
       |  JOIN n qn ON cand.q_id = qn.vec_id
       |  JOIN n cn ON cand.vec_id = cn.vec_id)
       |SELECT q_id, vec_id AS neighbor_id, CAST(rank AS INTEGER) AS rank,
       |  round(cos, 4) AS cosine
       |FROM scored WHERE rank <= 5
       |ORDER BY q_id, rank""".stripMargin
  }

  /** s29's DuckDB oracle: s2's literal-plane machinery restricted to
    * the first 3 tables, the Hamming-1 probe expansion via xor, both
    * candidate tiers ranked and scored against the inline brute-force
    * truth — the full side-by-side report recomputed from scratch.
    */
  private def s29OracleSql: String = {
    val planeRows = hyperplanes
      .take(3)
      .zipWithIndex
      .flatMap { case (tbl, t) =>
        tbl.zipWithIndex.map { case (plane, j) =>
          s"($t, $j, [${plane.map(_.toString).mkString(", ")}]::DOUBLE[])"
        }
      }
      .mkString(", ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm FROM e),
       |planes(t, j, pv) AS (VALUES $planeRows),
       |bkt AS (
       |  SELECT n.vec_id, p.t,
       |    CAST(sum(CASE WHEN list_inner_product(n.v, p.pv) > 0
       |             THEN 1 << p.j ELSE 0 END) AS INTEGER) AS bk
       |  FROM n, planes p GROUP BY n.vec_id, p.t),
       |qb AS (SELECT vec_id AS q_id, t, bk FROM bkt WHERE vec_id < 20),
       |pr AS (
       |  SELECT q_id, t, bk AS pb FROM qb
       |  UNION ALL
       |  SELECT q_id, t, xor(bk, (1 << j)::INTEGER) AS pb
       |  FROM qb, (SELECT unnest(range(0, 4)) AS j)),
       |cs AS (
       |  SELECT DISTINCT q.q_id, c.vec_id
       |  FROM qb q JOIN bkt c ON c.t = q.t AND c.bk = q.bk
       |  WHERE c.vec_id <> q.q_id),
       |cm AS (
       |  SELECT DISTINCT p.q_id, c.vec_id
       |  FROM pr p JOIN bkt c ON c.t = p.t AND c.bk = p.pb
       |  WHERE c.vec_id <> p.q_id),
       |truth AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_inner_product(q.v, c.v) / (q.norm * c.norm) DESC,
       |                 c.vec_id ASC) AS rank
       |    FROM n q JOIN n c ON q.vec_id < 20 AND c.vec_id <> q.vec_id)
       |  WHERE rank <= 5),
       |t5s AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT cs.q_id, cs.vec_id,
       |      row_number() OVER (PARTITION BY cs.q_id
       |        ORDER BY list_inner_product(qn.v, cn.v) / (qn.norm * cn.norm)
       |          DESC, cs.vec_id ASC) AS rank
       |    FROM cs JOIN n qn ON cs.q_id = qn.vec_id
       |            JOIN n cn ON cs.vec_id = cn.vec_id)
       |  WHERE rank <= 5),
       |t5m AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT cm.q_id, cm.vec_id,
       |      row_number() OVER (PARTITION BY cm.q_id
       |        ORDER BY list_inner_product(qn.v, cn.v) / (qn.norm * cn.norm)
       |          DESC, cm.vec_id ASC) AS rank
       |    FROM cm JOIN n qn ON cm.q_id = qn.vec_id
       |            JOIN n cn ON cm.vec_id = cn.vec_id)
       |  WHERE rank <= 5),
       |hs AS (
       |  SELECT truth.q_id, count(*) AS hits
       |  FROM truth JOIN t5s ON t5s.q_id = truth.q_id
       |    AND t5s.vec_id = truth.neighbor_id GROUP BY 1),
       |hm AS (
       |  SELECT truth.q_id, count(*) AS hits
       |  FROM truth JOIN t5m ON t5m.q_id = truth.q_id
       |    AND t5m.vec_id = truth.neighbor_id GROUP BY 1),
       |ncs AS (SELECT q_id, count(*) AS nc FROM cs GROUP BY 1),
       |ncm AS (SELECT q_id, count(*) AS nc FROM cm GROUP BY 1),
       |qs AS (SELECT vec_id AS q_id FROM e WHERE vec_id < 20)
       |SELECT qs.q_id,
       |  CAST(coalesce(ncs.nc, 0) AS BIGINT) AS n_cand_single,
       |  CAST(coalesce(ncm.nc, 0) AS BIGINT) AS n_cand_multi,
       |  CAST(coalesce(hs.hits, 0) AS BIGINT) AS hits_single,
       |  CAST(coalesce(hm.hits, 0) AS BIGINT) AS hits_multi
       |FROM qs LEFT JOIN ncs USING (q_id) LEFT JOIN ncm USING (q_id)
       |  LEFT JOIN hs USING (q_id) LEFT JOIN hm USING (q_id)
       |ORDER BY qs.q_id""".stripMargin
  }

  /** s10's DuckDB oracle: three unrolled Lloyd rounds. d2 uses the
    * inner-product identity ‖v‖²−2v·c+‖c‖² — algebraically different
    * from Spark's (vi−ci)² fold but EQUAL here because every
    * intermediate is an exact integer below 2^53 (both engines compute
    * the true mathematical value). Argmin, floor-mean, and checksums
    * mirror the Spark plan CTE for CTE.
    */
  private def s10OracleSql: String = {
    def round(t: Int, prevC: String): String =
      s"""s$t AS (
         |  SELECT v.vec_id, c.cell,
         |    list_inner_product(v.v, v.v) - 2 * list_inner_product(v.v, c.c)
         |      + list_inner_product(c.c, c.c) AS d2
         |  FROM v, $prevC c),
         |a$t AS (SELECT vec_id, min(d2) AS bd FROM s$t GROUP BY 1),
         |b$t AS (
         |  SELECT s.vec_id, min(s.cell) AS cell, min(a.bd) AS bd
         |  FROM s$t s JOIN a$t a ON s.vec_id = a.vec_id AND s.d2 = a.bd
         |  GROUP BY 1),
         |g$t AS (
         |  SELECT cell, count(*) AS n, CAST(sum(CAST(bd AS BIGINT)) AS BIGINT) AS obj
         |  FROM b$t GROUP BY 1),
         |m$t AS (
         |  SELECT cell, list(cv ORDER BY dim) AS c FROM (
         |    SELECT b.cell, t.dim, floor(sum(vv.v[CAST(t.dim AS INT)]) / count(*)) AS cv
         |    FROM b$t b JOIN v vv ON b.vec_id = vv.vec_id, range(1, 65) AS t(dim)
         |    GROUP BY b.cell, t.dim) GROUP BY cell),
         |u$t AS (
         |  SELECT $t AS iter, g.cell, CAST(g.n AS BIGINT) AS n, g.obj,
         |    CAST(list_reduce(list_prepend(0.0, m.c), (a, b) -> a + b) AS BIGINT) AS csum
         |  FROM g$t g JOIN m$t m ON g.cell = m.cell)""".stripMargin
    s"""WITH v AS (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> floor(x * 1000000 + 0.5)) AS v
       |  FROM embeddings),
       |c0 AS (
       |  SELECT CAST(vec_id // 62 AS INT) AS cell, v AS c
       |  FROM v WHERE vec_id % 62 = 0 AND vec_id // 62 < 8),
       |${round(1, "c0")},
       |${round(2, "m1")},
       |${round(3, "m2")}""".stripMargin
  }

  private def s10FinalSql: String =
    s"""$s10OracleSql
       |SELECT * FROM (
       |  SELECT * FROM u1 UNION ALL SELECT * FROM u2 UNION ALL SELECT * FROM u3)
       |ORDER BY iter, cell""".stripMargin

  /** s11's oracle: s10's full training CTEs (m3 = trained codebook),
    * then assignment/probe/rank in the same exact-integer algebra.
    * row_number over (d2, cell) == Spark's min-struct argmin (cell is
    * unique per candidate row, so the order is total).
    */
  private def s11OracleSql: String =
    s"""$s10OracleSql,
       |srch AS (
       |  SELECT vv.vec_id, c.cell,
       |    row_number() OVER (PARTITION BY vv.vec_id ORDER BY
       |      list_inner_product(vv.v, vv.v) - 2 * list_inner_product(vv.v, c.c)
       |        + list_inner_product(c.c, c.c) ASC, c.cell ASC) AS rn
       |  FROM v vv, m3 c),
       |asg AS (SELECT vec_id, cell FROM srch WHERE rn = 1),
       |qp AS (SELECT vec_id AS q_id, cell FROM srch WHERE rn <= 3 AND vec_id < 20),
       |cand AS (
       |  SELECT DISTINCT qp.q_id, a.vec_id
       |  FROM qp JOIN asg a ON qp.cell = a.cell AND a.vec_id <> qp.q_id),
       |scored AS (
       |  SELECT c.q_id, c.vec_id,
       |    list_inner_product(qa.v, qa.v) - 2 * list_inner_product(qa.v, vb.v)
       |      + list_inner_product(vb.v, vb.v) AS d2
       |  FROM cand c JOIN v qa ON c.q_id = qa.vec_id JOIN v vb ON c.vec_id = vb.vec_id),
       |rk AS (
       |  SELECT q_id, vec_id, d2,
       |    row_number() OVER (PARTITION BY q_id ORDER BY d2 ASC, vec_id ASC) AS rank
       |  FROM scored)
       |SELECT q_id, vec_id AS neighbor_id, CAST(rank AS INTEGER) AS rank,
       |  CAST(d2 AS BIGINT) AS d2
       |FROM rk WHERE rank <= 5
       |ORDER BY q_id, rank""".stripMargin

  val oracles: Map[String, String] = Map(
    "s32_matryoshka_refine" -> s32OracleSql,
    "s31_matryoshka_recall" -> s31OracleSql,
    // the same exact top-5 edge set ((cos desc, vec_id) tie-break),
    // reversed-key reciprocity join, zero-filled isolates
    "s30_knn_graph" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm FROM e),
        |scored AS (
        |  SELECT q.vec_id AS src, c.vec_id AS dst,
        |    row_number() OVER (
        |      PARTITION BY q.vec_id
        |      ORDER BY list_inner_product(q.v, c.v) / (q.norm * c.norm) DESC,
        |               c.vec_id ASC) AS rank
        |  FROM n q JOIN n c ON c.vec_id <> q.vec_id),
        |edges AS (SELECT src, dst FROM scored WHERE rank <= 5),
        |indeg AS (
        |  SELECT dst AS vec_id, CAST(count(*) AS BIGINT) AS in_degree
        |  FROM edges GROUP BY 1),
        |recip AS (
        |  SELECT a.src AS vec_id, CAST(count(*) AS BIGINT) AS n_reciprocal
        |  FROM edges a JOIN edges b ON b.src = a.dst AND b.dst = a.src
        |  GROUP BY 1)
        |SELECT e.vec_id,
        |  coalesce(indeg.in_degree, 0) AS in_degree,
        |  coalesce(recip.n_reciprocal, 0) AS n_reciprocal
        |FROM e
        |LEFT JOIN indeg ON indeg.vec_id = e.vec_id
        |LEFT JOIN recip ON recip.vec_id = e.vec_id
        |ORDER BY e.vec_id""".stripMargin,
    "s29_multiprobe_lsh" -> s29OracleSql,
    // s12's cosine/vote/tie-break replay on the %5 hold-out, rolled
    // up per winning-vote bin with the same integer basis points
    "s28_vote_calibration" ->
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |        sqrt(list_inner_product(v, v)) AS norm FROM e),
        |q AS (SELECT vec_id AS q_id, label AS true_label, v AS qv,
        |        norm AS qn FROM n WHERE vec_id % 5 = 0),
        |c AS (SELECT * FROM n WHERE vec_id % 5 <> 0),
        |sc AS (
        |  SELECT q.q_id, q.true_label, c.vec_id, c.label,
        |    list_inner_product(q.qv, c.v) / (q.qn * c.norm) AS cos
        |  FROM q, c),
        |tk AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, vec_id ASC) AS rk FROM sc)
        |  WHERE rk <= 9),
        |v AS (
        |  SELECT q_id, true_label, label, count(*) AS n_votes
        |  FROM tk GROUP BY 1, 2, 3),
        |win AS (
        |  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY q_id
        |          ORDER BY n_votes DESC, label ASC) AS vr FROM v)
        |  WHERE vr = 1)
        |SELECT CAST(n_votes AS BIGINT) AS conf_votes,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN label = true_label THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_correct,
        |  CAST(sum(CASE WHEN label = true_label THEN 1 ELSE 0 END)
        |    * 10000 // count(*) AS BIGINT) AS acc_bp,
        |  CAST(n_votes * 10000 // 9 AS BIGINT) AS conf_bp,
        |  CAST(abs(sum(CASE WHEN label = true_label THEN 1 ELSE 0 END)
        |    * 10000 // count(*) - n_votes * 10000 // 9) AS BIGINT) AS gap_bp
        |FROM win GROUP BY n_votes ORDER BY conf_votes""".stripMargin,
    "s22_recall_curve" -> s22OracleSql,
    // same assignment replay, same exact integer centroid numerators
    // (HUGEINT squares mirror DECIMAL(38,0)), same smoothed PSI text
    "s21_embedding_drift" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm
        |      FROM e),
        |cent AS (
        |  SELECT CAST(vec_id // 125 AS INTEGER) AS cell, v AS cv,
        |    norm AS cnorm
        |  FROM n WHERE vec_id % 125 = 0 AND vec_id // 125 < 16),
        |assign0 AS (
        |  SELECT n.vec_id, c.cell,
        |    row_number() OVER (PARTITION BY n.vec_id
        |      ORDER BY list_inner_product(n.v, c.cv) / (n.norm * c.cnorm)
        |        DESC, c.cell ASC) AS crn
        |  FROM n, cent c),
        |asg AS (
        |  SELECT vec_id, vec_id % 2 AS half, cell
        |  FROM assign0 WHERE crn = 1),
        |cnt AS (
        |  SELECT cell,
        |    CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM asg GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
        |               CAST(sum(n_b) AS BIGINT) AS tb FROM cnt),
        |q AS (
        |  SELECT vec_id,
        |    list_transform(v, x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))
        |      AS qv
        |  FROM e),
        |dm0 AS (
        |  SELECT q.vec_id, u.dim, u.val
        |  FROM q,
        |    unnest([{'dim': k, 'val': qv[k]}
        |            FOR k IN range(1, len(qv) + 1)]) AS s(u)),
        |dm AS (
        |  SELECT asg.cell, dm0.dim,
        |    CAST(sum(CASE WHEN asg.half = 0 THEN dm0.val ELSE 0 END)
        |         AS BIGINT) AS sa,
        |    CAST(sum(CASE WHEN asg.half = 1 THEN dm0.val ELSE 0 END)
        |         AS BIGINT) AS sb
        |  FROM asg JOIN dm0 ON asg.vec_id = dm0.vec_id
        |  GROUP BY 1, 2),
        |sh AS (
        |  SELECT dm.cell,
        |    sum(CAST(dm.sa * cnt.n_b - dm.sb * cnt.n_a AS HUGEINT)
        |        * (dm.sa * cnt.n_b - dm.sb * cnt.n_a)) AS d2,
        |    max(cnt.n_a * cnt.n_b) AS nab
        |  FROM dm JOIN cnt ON dm.cell = cnt.cell
        |  GROUP BY 1)
        |SELECT cnt.cell, cnt.n_a, cnt.n_b,
        |  round((CAST(cnt.n_a + 1 AS DOUBLE) / CAST(tot.ta + 16 AS DOUBLE)
        |    - CAST(cnt.n_b + 1 AS DOUBLE) / CAST(tot.tb + 16 AS DOUBLE))
        |   * ln((CAST(cnt.n_a + 1 AS DOUBLE) / CAST(tot.ta + 16 AS DOUBLE))
        |        / (CAST(cnt.n_b + 1 AS DOUBLE) / CAST(tot.tb + 16 AS DOUBLE))),
        |    6) AS psi_contrib,
        |  round(sqrt(CAST(sh.d2 AS DOUBLE)) / CAST(sh.nab AS DOUBLE)
        |        / CAST(1000000 AS DOUBLE), 4) AS centroid_shift
        |FROM cnt CROSS JOIN tot JOIN sh ON cnt.cell = sh.cell
        |ORDER BY cnt.cell""".stripMargin,
    // s12's prediction replay + the integer classification report
    "s20_classify_eval" ->
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |        sqrt(list_inner_product(v, v)) AS norm FROM e),
        |q AS (SELECT vec_id AS q_id, label AS true_label, v AS qv,
        |        norm AS qn FROM n WHERE vec_id < 20),
        |c AS (SELECT * FROM n WHERE vec_id >= 20),
        |sc AS (
        |  SELECT q.q_id, q.true_label, c.vec_id, c.label,
        |    list_inner_product(q.qv, c.v) / (q.qn * c.norm) AS cos
        |  FROM q, c),
        |tk AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, vec_id ASC) AS rk FROM sc)
        |  WHERE rk <= 9),
        |v AS (
        |  SELECT q_id, true_label, label, count(*) AS n_votes
        |  FROM tk GROUP BY 1, 2, 3),
        |preds AS (
        |  SELECT q_id, true_label, label AS pred_label
        |  FROM (SELECT *, row_number() OVER (PARTITION BY q_id
        |          ORDER BY n_votes DESC, label ASC) AS vr FROM v)
        |  WHERE vr = 1),
        |cls AS (
        |  SELECT DISTINCT true_label AS cls FROM preds
        |  UNION SELECT DISTINCT pred_label FROM preds),
        |bt AS (
        |  SELECT true_label AS cls, CAST(count(*) AS BIGINT) AS support,
        |    CAST(sum(CASE WHEN true_label = pred_label THEN 1 ELSE 0 END)
        |         AS BIGINT) AS tp
        |  FROM preds GROUP BY 1),
        |bp AS (
        |  SELECT pred_label AS cls, CAST(count(*) AS BIGINT) AS predicted
        |  FROM preds GROUP BY 1),
        |r AS (
        |  SELECT cls.cls AS label,
        |    coalesce(bt.support, 0) AS support,
        |    coalesce(bt.tp, 0) AS tp,
        |    coalesce(bp.predicted, 0) - coalesce(bt.tp, 0) AS fp,
        |    coalesce(bt.support, 0) - coalesce(bt.tp, 0) AS fn,
        |    coalesce(bp.predicted, 0) AS predicted
        |  FROM cls LEFT JOIN bt ON cls.cls = bt.cls
        |  LEFT JOIN bp ON cls.cls = bp.cls),
        |m AS (
        |  SELECT label, support, tp, fp, fn,
        |    CASE WHEN predicted > 0 THEN (tp * 10000) // predicted
        |         ELSE -1 END AS precision_bp,
        |    CASE WHEN support > 0 THEN (tp * 10000) // support
        |         ELSE -1 END AS recall_bp
        |  FROM r)
        |SELECT label, CAST(support AS BIGINT) AS support,
        |  CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
        |  CAST(fn AS BIGINT) AS fn,
        |  CAST(precision_bp AS BIGINT) AS precision_bp,
        |  CAST(recall_bp AS BIGINT) AS recall_bp,
        |  CAST(CASE WHEN precision_bp >= 0 AND recall_bp >= 0
        |              AND precision_bp + recall_bp > 0
        |       THEN (2 * precision_bp * recall_bp) // (precision_bp + recall_bp)
        |       ELSE -1 END AS BIGINT) AS f1_bp
        |FROM m ORDER BY label""".stripMargin,
    // s3's replay with the label predicate inside the candidate join
    "s19_filtered_search" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
        |  FROM embeddings),
        |n AS (SELECT vec_id, v, label,
        |        sqrt(list_inner_product(v, v)) AS norm FROM e),
        |cent AS (
        |  SELECT CAST(vec_id // 125 AS INTEGER) AS cell, v AS cv,
        |    norm AS cnorm
        |  FROM n WHERE vec_id % 125 = 0 AND vec_id // 125 < 16),
        |assign0 AS (
        |  SELECT n.vec_id, n.label, c.cell,
        |    row_number() OVER (PARTITION BY n.vec_id
        |      ORDER BY list_inner_product(n.v, c.cv) / (n.norm * c.cnorm)
        |        DESC, c.cell ASC) AS crn
        |  FROM n, cent c),
        |assigned AS (
        |  SELECT vec_id, label, cell FROM assign0 WHERE crn = 1),
        |qprobe AS (
        |  SELECT vec_id AS q_id, label AS q_label, cell
        |  FROM assign0 WHERE vec_id < 20 AND crn <= 4),
        |scored AS (
        |  SELECT q.q_id, a.vec_id AS neighbor_id, q.q_label,
        |    list_inner_product(qn.v, an.v) / (qn.norm * an.norm) AS cos,
        |    row_number() OVER (PARTITION BY q.q_id
        |      ORDER BY list_inner_product(qn.v, an.v) / (qn.norm * an.norm)
        |        DESC, a.vec_id ASC) AS rank
        |  FROM qprobe q
        |  JOIN assigned a ON q.cell = a.cell AND a.label = q.q_label
        |  JOIN n qn ON q.q_id = qn.vec_id
        |  JOIN n an ON a.vec_id = an.vec_id
        |  WHERE a.vec_id <> q.q_id)
        |SELECT q_id, neighbor_id, q_label AS label,
        |  CAST(rank AS INTEGER) AS rank, round(cos, 4) AS cosine
        |FROM scored WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    // the persisted-and-reloaded index must serve s11's exact ranking
    // (lossless integer-double round-trip), so the oracle IS s11's SQL
    "s18_ivf_persist" -> s11OracleSql,
    // the same fixed-4 greedy unrolled as chained CTEs: per step an
    // anti-membership filter, a max-penalty aggregate against the
    // selected set, and a (score desc, vec_id) argmax; 0.7/0.3 double
    // literals and the list_inner_product fold match the Spark side
    // bit-for-bit before round(4)
    "s16_mmr_diversify" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm FROM e),
        |q AS (SELECT vec_id AS q_id, v AS qv, norm AS qnorm FROM n WHERE vec_id < 5),
        |c0 AS (
        |  SELECT q.q_id, n.vec_id,
        |    list_inner_product(q.qv, n.v) / (q.qnorm * n.norm) AS cos,
        |    row_number() OVER (PARTITION BY q.q_id
        |      ORDER BY list_inner_product(q.qv, n.v) / (q.qnorm * n.norm)
        |        DESC, n.vec_id ASC) AS rn
        |  FROM q, n WHERE n.vec_id <> q.q_id),
        |cand AS (SELECT q_id, vec_id, cos FROM c0 WHERE rn <= 12),
        |cc AS (
        |  SELECT a.q_id, a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_inner_product(na.v, nb.v) / (na.norm * nb.norm) AS sim
        |  FROM cand a JOIN cand b ON a.q_id = b.q_id AND a.vec_id <> b.vec_id
        |  JOIN n na ON na.vec_id = a.vec_id
        |  JOIN n nb ON nb.vec_id = b.vec_id),
        |s1 AS (
        |  SELECT q_id, vec_id, 1 AS rank, 0.7 * cos AS score FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, vec_id ASC) AS rn FROM cand)
        |  WHERE rn = 1),
        |s2 AS (
        |  SELECT q_id, vec_id, 2 AS rank, score FROM (
        |    SELECT g.*, row_number() OVER (PARTITION BY q_id
        |      ORDER BY score DESC, vec_id ASC) AS rn FROM (
        |      SELECT c.q_id, c.vec_id, 0.7 * c.cos - 0.3 * max(cc.sim) AS score
        |      FROM cand c
        |      JOIN cc ON cc.q_id = c.q_id AND cc.id_a = c.vec_id
        |      JOIN s1 ON s1.q_id = cc.q_id AND s1.vec_id = cc.id_b
        |      WHERE NOT EXISTS (SELECT 1 FROM s1 x
        |                        WHERE x.q_id = c.q_id AND x.vec_id = c.vec_id)
        |      GROUP BY c.q_id, c.vec_id, c.cos) g)
        |  WHERE rn = 1),
        |sel2 AS (SELECT q_id, vec_id FROM s1 UNION ALL SELECT q_id, vec_id FROM s2),
        |s3 AS (
        |  SELECT q_id, vec_id, 3 AS rank, score FROM (
        |    SELECT g.*, row_number() OVER (PARTITION BY q_id
        |      ORDER BY score DESC, vec_id ASC) AS rn FROM (
        |      SELECT c.q_id, c.vec_id, 0.7 * c.cos - 0.3 * max(cc.sim) AS score
        |      FROM cand c
        |      JOIN cc ON cc.q_id = c.q_id AND cc.id_a = c.vec_id
        |      JOIN sel2 ON sel2.q_id = cc.q_id AND sel2.vec_id = cc.id_b
        |      WHERE NOT EXISTS (SELECT 1 FROM sel2 x
        |                        WHERE x.q_id = c.q_id AND x.vec_id = c.vec_id)
        |      GROUP BY c.q_id, c.vec_id, c.cos) g)
        |  WHERE rn = 1),
        |sel3 AS (SELECT q_id, vec_id FROM sel2 UNION ALL SELECT q_id, vec_id FROM s3),
        |s4 AS (
        |  SELECT q_id, vec_id, 4 AS rank, score FROM (
        |    SELECT g.*, row_number() OVER (PARTITION BY q_id
        |      ORDER BY score DESC, vec_id ASC) AS rn FROM (
        |      SELECT c.q_id, c.vec_id, 0.7 * c.cos - 0.3 * max(cc.sim) AS score
        |      FROM cand c
        |      JOIN cc ON cc.q_id = c.q_id AND cc.id_a = c.vec_id
        |      JOIN sel3 ON sel3.q_id = cc.q_id AND sel3.vec_id = cc.id_b
        |      WHERE NOT EXISTS (SELECT 1 FROM sel3 x
        |                        WHERE x.q_id = c.q_id AND x.vec_id = c.vec_id)
        |      GROUP BY c.q_id, c.vec_id, c.cos) g)
        |  WHERE rn = 1)
        |SELECT q_id, rank, vec_id AS neighbor_id, round(score, 4) AS mmr_score
        |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
        |      UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4)
        |ORDER BY q_id, rank""".stripMargin,
    // same left-to-right dot fold (list_inner_product), same total
    // orders on both rankings — prediction matches tie-for-tie
    "s12_knn_classify" ->
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |        sqrt(list_inner_product(v, v)) AS norm FROM e),
        |q AS (SELECT vec_id AS q_id, label AS true_label, v AS qv,
        |        norm AS qn FROM n WHERE vec_id < 20),
        |c AS (SELECT * FROM n WHERE vec_id >= 20),
        |sc AS (
        |  SELECT q.q_id, q.true_label, c.vec_id, c.label,
        |    list_inner_product(q.qv, c.v) / (q.qn * c.norm) AS cos
        |  FROM q, c),
        |tk AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, vec_id ASC) AS rk FROM sc)
        |  WHERE rk <= 9),
        |v AS (
        |  SELECT q_id, true_label, label, count(*) AS n_votes
        |  FROM tk GROUP BY 1, 2, 3)
        |SELECT q_id, true_label, label AS pred_label,
        |  CAST(n_votes AS BIGINT) AS n_votes
        |FROM (SELECT *, row_number() OVER (PARTITION BY q_id
        |        ORDER BY n_votes DESC, label ASC) AS vr FROM v)
        |WHERE vr = 1
        |ORDER BY q_id""".stripMargin,
    "s11_ivf_trained_search" -> s11OracleSql,
    "s10_kmeans_train" -> s10FinalSql,
    // Same unrounded-cosine threshold predicate; the dot product folds
    // left-to-right in both engines so the boundary is bit-identical.
    "s9_radius_search" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm FROM e)
        |SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
        |  round(list_inner_product(q.v, c.v) / (q.norm * c.norm), 4)
        |    AS cosine
        |FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
        |WHERE list_inner_product(q.v, c.v) / (q.norm * c.norm) >= 0.25
        |ORDER BY q_id, neighbor_id""".stripMargin,
    // Same codebook (vec_id < 16, id-sorted), same left-to-right
    // (x−y)² fold, same first-index-of-minimum argmin. DuckDB's
    // list_position is 1-based like Spark's array_position.
    "s7_pq_encode" ->
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT list(v ORDER BY vec_id) AS cents FROM e WHERE vec_id < 16),
        |enc AS (
        |  SELECT vec_id, label,
        |    list_transform(range(0, 8), m ->
        |      list_transform(c.cents, cv ->
        |        list_reduce(list_prepend(0.0, list_transform(range(1, 9),
        |          k -> (v[m * 8 + k] - cv[m * 8 + k]) *
        |               (v[m * 8 + k] - cv[m * 8 + k]))), (a, b) -> a + b))) AS dd
        |  FROM e, c)
        |SELECT vec_id, label,
        |  array_to_string(list_transform(dd,
        |    d -> (list_position(d, list_min(d)) - 1)::VARCHAR), '-') AS code,
        |  round(list_reduce(list_prepend(0.0, list_transform(dd, d -> list_min(d))),
        |    (a, b) -> a + b), 6) AS quant_err
        |FROM enc ORDER BY vec_id""".stripMargin,
    // Recomputes s7's codes, reconstructs each corpus vector from its
    // codebook entries, ranks by exact 64-dim squared distance to the
    // (float-exact) query — the ADC identity. Ties break on vec_id.
    // s8's replay, shortlist widened to 50, then the exact-L2 re-rank
    // over the fetched full vectors; both folds bit-identical
    "s17_adc_refine" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT list(v ORDER BY vec_id) AS cents FROM e WHERE vec_id < 16),
        |enc AS (
        |  SELECT vec_id,
        |    list_transform(range(0, 8), m ->
        |      list_transform(c.cents, cv ->
        |        list_reduce(list_prepend(0.0, list_transform(range(1, 9),
        |          k -> (v[m * 8 + k] - cv[m * 8 + k]) *
        |               (v[m * 8 + k] - cv[m * 8 + k]))), (a, b) -> a + b))) AS dd
        |  FROM e, c),
        |codes AS (
        |  SELECT vec_id,
        |    list_transform(dd, d -> list_position(d, list_min(d))) AS code
        |  FROM enc),
        |rec AS (
        |  SELECT vec_id,
        |    flatten(list_transform(range(0, 8),
        |      m -> c.cents[code[m + 1]][m * 8 + 1 : m * 8 + 8])) AS rec
        |  FROM codes, c),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 20),
        |scored AS (
        |  SELECT q_id, r.vec_id AS neighbor_id,
        |    list_reduce(list_prepend(0.0, list_transform(range(1, 65),
        |      k -> (qv[k] - rec[k]) * (qv[k] - rec[k]))), (a, b) -> a + b) AS adc
        |  FROM q JOIN rec r ON r.vec_id <> q_id),
        |shortlist AS (
        |  SELECT q_id, neighbor_id, adc,
        |    row_number() OVER (
        |      PARTITION BY q_id ORDER BY adc ASC, neighbor_id ASC) AS adc_rank
        |  FROM scored QUALIFY adc_rank <= 50),
        |refined AS (
        |  SELECT s.q_id, s.neighbor_id, s.adc_rank,
        |    list_reduce(list_prepend(0.0, list_transform(range(1, 65),
        |      k -> (q.qv[k] - e.v[k]) * (q.qv[k] - e.v[k]))), (a, b) -> a + b)
        |      AS d2
        |  FROM shortlist s
        |  JOIN e ON e.vec_id = s.neighbor_id
        |  JOIN q ON q.q_id = s.q_id),
        |ranked AS (
        |  SELECT q_id, neighbor_id, d2, adc_rank,
        |    row_number() OVER (
        |      PARTITION BY q_id ORDER BY d2 ASC, neighbor_id ASC) AS rank
        |  FROM refined)
        |SELECT q_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
        |  round(d2, 6) AS l2_sq, CAST(adc_rank AS INTEGER) AS adc_rank
        |FROM ranked WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    "s8_pq_adc_search" -> s8OracleSql,
    // both deterministic pipelines replayed and intersected; the
    // recall table hash-matches per query
    "s14_lsh_recall" -> s14OracleSql,
    "s25_hybrid_rrf" -> s25OracleSql,
    "s24_nprobe_curve" -> s24OracleSql,
    "s23_pq_recall" -> s23OracleSql,
    "s26_int8_recall" -> s26OracleSql,
    // integer micro-unit moments (exact), cross-multiplied variance,
    // shares by hugeint floor division — identical algebra
    "s27_effective_dim" ->
      """WITH x AS (
        |  SELECT CAST(t.i - 1 AS INTEGER) AS dim,
        |    CAST(floor(v[t.i] * 1000000 + 0.5) AS BIGINT) AS xq
        |  FROM (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |    range(1, 65) t(i)),
        |m AS (
        |  SELECT dim, count(*) AS n, sum(xq) AS sx, sum(xq * xq) AS sxx
        |  FROM x GROUP BY dim),
        |v AS (SELECT dim, n * sxx - sx * sx AS v2 FROM m),
        |tot AS (
        |  SELECT sum(v2) AS tv,
        |    sum(CAST(v2 AS DOUBLE) * CAST(v2 AS DOUBLE)) AS tv2
        |  FROM v)
        |SELECT dim, CAST(v2 * 10000 // tv AS BIGINT) AS var_share_bp,
        |  CAST(sum(v2 * 10000 // tv) OVER (
        |    ORDER BY v2 DESC, dim ASC ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS cum_share_bp,
        |  round(CAST(tv AS DOUBLE) * CAST(tv AS DOUBLE) / tv2, 3)
        |    AS participation_ratio
        |FROM v, tot
        |ORDER BY var_share_bp DESC, dim""".stripMargin,
    "s15_ivf_recall" -> s15OracleSql,
    // s6's deterministic centroids + assignment rule; silhouette from
    // the same double expressions, masked at round(4)
    "s13_cluster_quality" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm FROM e),
        |c AS (SELECT vec_id AS cid, v AS cv, norm AS cnorm
        |      FROM n WHERE vec_id < 8),
        |sc AS (
        |  SELECT n.vec_id, c.cid,
        |    list_inner_product(n.v, c.cv) / (n.norm * c.cnorm) AS cos
        |  FROM n, c),
        |best AS (SELECT vec_id, max(cos) AS bc FROM sc GROUP BY 1),
        |asg AS (
        |  SELECT sc.vec_id, min(sc.cid) AS cid, max(sc.cos) AS own_cos
        |  FROM sc JOIN best USING (vec_id)
        |  WHERE sc.cos = best.bc GROUP BY sc.vec_id),
        |oth AS (
        |  SELECT sc.vec_id, max(sc.cos) AS other_cos
        |  FROM sc JOIN asg USING (vec_id)
        |  WHERE sc.cid <> asg.cid GROUP BY sc.vec_id),
        |sil AS (
        |  SELECT asg.cid, asg.own_cos, oth.other_cos,
        |    ((1.0 - oth.other_cos) - (1.0 - asg.own_cos)) /
        |      greatest(1.0 - asg.own_cos, 1.0 - oth.other_cos) AS s
        |  FROM asg JOIN oth USING (vec_id))
        |SELECT cid, count(*) AS n,
        |  round(avg(own_cos), 4) AS mean_cos,
        |  round(avg(other_cos), 4) AS mean_other_cos,
        |  round(avg(s), 4) AS mean_silhouette
        |FROM sil GROUP BY cid ORDER BY cid""".stripMargin,
    "s6_centroid_assign" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm FROM e),
        |c AS (SELECT vec_id AS cid, v AS cv, norm AS cnorm
        |      FROM n WHERE vec_id < 8),
        |sc AS (
        |  SELECT n.vec_id, c.cid,
        |    list_inner_product(n.v, c.cv) / (n.norm * c.cnorm) AS cos
        |  FROM n, c),
        |best AS (SELECT vec_id, max(cos) AS bc FROM sc GROUP BY 1)
        |SELECT sc.vec_id, min(sc.cid) AS centroid_id,
        |  round(max(sc.cos), 4) AS cosine
        |FROM sc JOIN best USING (vec_id)
        |WHERE sc.cos = best.bc
        |GROUP BY sc.vec_id
        |ORDER BY sc.vec_id""".stripMargin,
    "s1_knn_bruteforce" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm FROM e),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
        |    list_inner_product(q.v, c.v) / (q.norm * c.norm) AS cos,
        |    row_number() OVER (
        |      PARTITION BY q.vec_id
        |      ORDER BY list_inner_product(q.v, c.v) / (q.norm * c.norm) DESC,
        |               c.vec_id ASC) AS rank
        |  FROM n q JOIN n c ON q.vec_id < 20 AND c.vec_id <> q.vec_id)
        |SELECT q_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
        |  round(cos, 4) AS cosine
        |FROM scored
        |WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    // s2/s3 are approximate w.r.t. brute force (recall pinned in
    // OpsSpec), but their OUTPUTS are deterministic — fixed LCG
    // hyperplanes / fixed sample centroids, deterministic tie-breaks —
    // so both carry FULL oracles: s3's is pure SQL; s2's embeds the 48
    // plane vectors as double literals (Double.toString round-trips
    // IEEE754 exactly, and both engines fold dots left-to-right).
    "s2_knn_lsh" -> s2OracleSql,
    "s3_knn_ivf" -> s3OracleSql,
    "s4_cell_centroids" ->
      """WITH e AS (
        |  SELECT CAST(vec_id % 8 AS INTEGER) AS cell,
        |    CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |per_dim AS (
        |  SELECT cell, CAST(t.i - 1 AS INTEGER) AS dim,
        |    round(avg(v[t.i]), 4) AS value
        |  FROM e, range(1, 65) t(i)
        |  GROUP BY cell, t.i),
        |cnt AS (SELECT cell, count(*) AS n FROM e GROUP BY cell)
        |SELECT p.cell, cnt.n, p.dim, p.value
        |FROM per_dim p JOIN cnt USING (cell)
        |ORDER BY p.cell, p.dim""".stripMargin,
    "s5_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id < 200),
        |p AS (
        |  SELECT vec_id, v, list_min(v) AS mn,
        |    (list_max(v) - list_min(v)) / 255.0 AS scale
        |  FROM e),
        |q AS (
        |  SELECT vec_id, round(scale, 6) AS scale_r,
        |    list_transform(v, x -> CASE WHEN scale = 0 THEN 0.0
        |      ELSE floor((x - mn) / scale + 0.5) END) AS qv,
        |    list_transform(v, x -> abs(x - (mn +
        |      CASE WHEN scale = 0 THEN 0.0
        |        ELSE floor((x - mn) / scale + 0.5) END * scale))) AS errs
        |  FROM p)
        |SELECT vec_id, scale_r,
        |  CAST(list_min(qv) AS INTEGER) AS q_min,
        |  CAST(list_max(qv) AS INTEGER) AS q_max,
        |  round(list_sum(errs) / len(errs), 6) AS mean_abs_err,
        |  round(list_max(errs), 6) AS max_abs_err
        |FROM q
        |ORDER BY vec_id""".stripMargin
  )
}
