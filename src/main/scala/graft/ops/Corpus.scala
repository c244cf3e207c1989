package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composite training-data pipeline: the operators composed the way a
  * real corpus-preparation job chains them — quality gate → exact
  * dedup (deterministic representative) → per-language accounting.
  * One declarative plan end-to-end, so Catalyst pipelines the gate
  * into the dedup shuffle's map side.
  */
object Corpus {

  /** p1 — clean-corpus accounting: per language, how many documents
    * survive the quality gate (≥ 25 tokens), how many survive exact
    * dedup on content (keeping the smallest doc_id per fingerprint),
    * and the kept documents' average length.
    */
  def p1CorpusClean(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables
      .documents(s, dir)
      .withColumn("nt", size(split(col("text"), " ")))

    val totals = docs
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"))

    val quality = docs.filter(col("nt") >= 25)

    val kept = quality
      .groupBy(col("lang"), md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), first(col("nt")).as("nt"))

    val qualityCounts = quality
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_quality"))

    val keptStats = kept
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_kept"),
        round(avg(col("nt")), 2).as("avg_tokens_kept"))

    totals
      .join(qualityCounts, Seq("lang"))
      .join(keptStats, Seq("lang"))
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_corpus_clean" -> p1CorpusClean
  )

  val oracles: Map[String, String] = Map(
    "p1_corpus_clean" ->
      """WITH d AS (
        |  SELECT doc_id, lang, text,
        |    len(string_split(text, ' ')) AS nt
        |  FROM documents),
        |q AS (SELECT * FROM d WHERE nt >= 25),
        |kept AS (
        |  SELECT lang, md5(text) AS fp, min(doc_id) AS keep_id,
        |    min(nt) AS nt
        |  FROM q GROUP BY lang, md5(text)),
        |t AS (SELECT lang, count(*) AS n_total FROM d GROUP BY lang),
        |qc AS (SELECT lang, count(*) AS n_quality FROM q GROUP BY lang),
        |ks AS (
        |  SELECT lang, count(*) AS n_kept,
        |    round(avg(nt), 2) AS avg_tokens_kept
        |  FROM kept GROUP BY lang)
        |SELECT t.lang, n_total, n_quality, n_kept, avg_tokens_kept
        |FROM t JOIN qc ON t.lang = qc.lang JOIN ks ON t.lang = ks.lang
        |ORDER BY t.lang""".stripMargin
  )
}
