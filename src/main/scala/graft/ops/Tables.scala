package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Typed accessors for the harness star schema (TESTDATA.md).
  *
  * Every query takes `(SparkSession, sfDir)` and reads through here so
  * scans stay parquet-native (vectorized reader, pushdown, pruning).
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame = read(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame = read(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = read(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = read(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = read(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame = read(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = read(s, dir, "lineitem")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in some fixture
    * generations and as non-UTC-adjusted TIMESTAMP(MICROS) (NTZ) in
    * others; normalize every flavor to a plain `TimestampType` instant
    * under the session's pinned UTC zone:
    *  - NANOS: read as a raw nanosecond long (`nanosAsLong`) and
    *    convert with integer `div` (no double round-trip — epoch-nanos
    *    exceed 2^53). Truncation matches DuckDB's TIMESTAMP_NS →
    *    TIMESTAMP narrowing, keeping the oracle comparable.
    *  - NTZ: [[GraftSession]] disables NTZ inference so the scan
    *    itself yields TIMESTAMP (ts predicates keep pushing down); the
    *    cast below only fires on sessions built without our config,
    *    where NTZ→LTZ under UTC preserves the stored wall-clock value
    *    — exactly DuckDB's naive-timestamp reading.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = read(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = read(s, dir, "embeddings")

  private def read(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Round-robin spread of a COMPACT derived table across the cluster.
    *
    * The fixture tables arrive as one single-row-group parquet file, so
    * every pre-shuffle stage (signature computation, pair enumeration)
    * would otherwise run as ONE task no matter how many cores exist.
    * Production-scale inputs arrive pre-split, where this becomes a
    * cheap rebalance of small feature rows. Call it on the compact
    * per-entity projection (ids + signatures/vectors), never on a raw
    * corpus scan — the point is to parallelize downstream compute, not
    * to shuffle bulk data.
    */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
