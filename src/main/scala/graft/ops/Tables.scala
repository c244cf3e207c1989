package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
    * default; read it as a raw nanosecond long and convert to a
    * microsecond timestamp with integer `div` (no double round-trip —
    * epoch-nanos exceed 2^53). Truncation matches DuckDB's TIMESTAMP_NS
    * → TIMESTAMP narrowing, keeping the oracle comparable.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(s, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
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
