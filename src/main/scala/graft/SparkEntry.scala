package graft

import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join + broadcast dim + aggregate: exercises scan, shuffle and
    * broadcast paths in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03RevenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Dedup.queries ++ Similarity.queries ++
      TextAnalysis.queries ++ Multimodal.queries ++ Corpus.queries ++
      Layout.queries ++ graft.streaming.Streams.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Dedup.oracles ++ Similarity.oracles ++
      TextAnalysis.oracles ++ Multimodal.oracles ++ Corpus.oracles ++
      Layout.oracles ++ graft.streaming.Streams.oracles
}
