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
}
