package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data-layout maintenance: the jobs that keep a 100 TB
  * parquet lake scannable. The reference writes one parquet per route
  * and stops there (reference: src/processor.rs:78-91); at scale the
  * two chronic layout problems are small files (per-file open/footer
  * overhead dominates the scan) and multi-dimensional scatter (row
  * -group min/max stats prune nothing because every file spans the
  * whole key space). Both are fixed by REWRITING layout, not by
  * touching query code — these operators are that rewrite.
  */
object Layout {

  /** Bit-interleaved Z-value of two dimension columns (each already
    * quantized to `[0, 2^bits)` ints). Sorting by the Z-value gives
    * the space-filling-curve layout: files cover compact RECTANGLES
    * of (a, b) space instead of slabs of one dimension, so parquet
    * min/max stats prune scans filtered on EITHER dimension. Pure
    * bit arithmetic — codegen'd, no UDF.
    */
  def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits)
      .map { i =>
        val aBit = shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        val bBit = shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
        aBit.bitwiseOR(bBit)
      }
      .reduce(_.bitwiseOR(_))

  /** Quantize a long column into `[0, 2^bits)` given its global
    * bounds — rank-free normalization, one pass, no extra shuffle.
    */
  def quantize(c: Column, min: Long, max: Long, bits: Int): Column = {
    val span = math.max(max - min, 1L)
    val buckets = 1L << bits
    least(
      ((c - min) * buckets / (span + 1)).cast("long"),
      lit(buckets - 1))
  }

  /** Z-order rewrite: lay `df` out as `numFiles` files sorted along
    * the (dimA, dimB) space-filling curve. `repartitionByRange` on
    * the Z-value splits the curve into contiguous runs (one exchange)
    * and the within-partition sort finishes the clustering; each
    * output file then covers a tight bounding box in (dimA, dimB),
    * which is what lets row-group stats prune multi-dimensional
    * filters. Bounds are taken from the frame in one tiny aggregate.
    */
  def zorderWrite(
      df: DataFrame,
      dimA: String,
      dimB: String,
      outDir: String,
      numFiles: Int,
      bits: Int = 12
  ): Unit = {
    val b = df
      .agg(
        min(col(dimA)).as("a0"), max(col(dimA)).as("a1"),
        min(col(dimB)).as("b0"), max(col(dimB)).as("b1"))
      .head()
    val z = zValue(
      quantize(col(dimA), b.getLong(0), b.getLong(1), bits),
      quantize(col(dimB), b.getLong(2), b.getLong(3), bits),
      bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write
      .mode("overwrite")
      .parquet(outDir)
  }

  /** Small-file compaction: rewrite a directory of many small parquet
    * files into `targetFiles` files. Content-preserving; the only
    * change is the file boundary layout. (A production compactor
    * picks `targetFiles` from `totalBytes / targetFileSize` and
    * swaps directories atomically; the rewrite itself is this.)
    */
  def compact(
      spark: SparkSession,
      dir: String,
      outDir: String,
      targetFiles: Int
  ): Unit =
    spark.read
      .parquet(dir)
      .repartition(targetFiles)
      .write
      .mode("overwrite")
      .parquet(outDir)

  /** Scratch dir for a layout rewrite, keyed by the input fixture dir
    * so sf0.001/sf0.01 runs never read each other's layout.
    */
  private def scratch(dir: String, tag: String): String =
    new java.io.File(
      sys.props("java.io.tmpdir"),
      s"graft_${tag}_" + dir.replaceAll("[^A-Za-z0-9]", "_")).getAbsolutePath

  /** q108 — z-order rewrite + multi-dimensional range scan, under the
    * oracle gate: lay lineitem out along the (l_partkey, l_suppkey)
    * Z-curve, then answer a 2-D range-predicate aggregate FROM THE
    * REWRITTEN LAYOUT. The oracle runs the same aggregate on the
    * ORIGINAL table — layout rewrites are content-preserving, so a
    * hash match proves the rewrite lost/duplicated/mangled nothing
    * (the correctness half; the pruning half — files covering tight
    * (a, b) bounding boxes so row-group stats skip most of the data —
    * is pinned in PlanSpec with scan-metric counts, since it is a
    * plan property, not a result property). This is the 100 TB layout
    * story made first-class: the query pays one curve-sorted exchange
    * at write time and every later multi-dimensional scan prunes.
    */
  def q108ZorderScan(s: SparkSession, dir: String): DataFrame = {
    val out = scratch(dir, "q108z")
    zorderWrite(
      Tables
        .lineitem(s, dir)
        .select(
          col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice")),
      "l_partkey",
      "l_suppkey",
      out,
      numFiles = 16)
    s.read
      .parquet(out)
      .filter(col("l_partkey").between(40, 160) && col("l_suppkey").between(2, 7))
      .groupBy(col("l_suppkey"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("qty"),
        sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy("l_suppkey")
  }

  /** q109 — small-file compaction round-trip, under the oracle gate:
    * shatter documents into 64 tiny files (the pathological layout a
    * streaming ingest leaves behind), [[compact]] them to 4, and
    * answer a rollup FROM THE COMPACTED LAYOUT; the oracle computes
    * the same rollup from the original table, so the hash match pins
    * content preservation across both rewrites. File counts are
    * asserted in the spec (a result can't see them).
    */
  def q109CompactScan(s: SparkSession, dir: String): DataFrame = {
    val small = scratch(dir, "q109s")
    val packed = scratch(dir, "q109c")
    Tables
      .documents(s, dir)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .repartition(64)
      .write
      .mode("overwrite")
      .parquet(small)
    compact(s, small, packed, targetFiles = 4)
    s.read
      .parquet(packed)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_total"))
      .orderBy("source", "lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q108_zorder_scan" -> q108ZorderScan,
    "q109_compact_scan" -> q109CompactScan
  )

  val oracles: Map[String, String] = Map(
    // Content preservation: the oracle reads the ORIGINAL lineitem —
    // same rows must come back out of the z-ordered layout.
    "q108_zorder_scan" ->
      """SELECT l_suppkey,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |FROM lineitem
        |WHERE l_partkey BETWEEN 40 AND 160 AND l_suppkey BETWEEN 2 AND 7
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q109_compact_scan" ->
      """SELECT source, lang,
        |  count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_total
        |FROM documents
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin
  )
}
