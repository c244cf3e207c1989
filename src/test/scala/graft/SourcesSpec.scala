package graft

import org.apache.spark.sql.functions._

/** DataSource V2 connector behavior: split planning, connector-level
  * column pruning, and partition-invariant determinism.
  */
class SourcesSpec extends SparkSpec {

  private def synth(rows: Long, partitions: Int) =
    spark.read
      .format("graft.sources.SynthDocs")
      .option("rows", rows)
      .option("partitions", partitions)
      .load()

  test("scan plans the requested number of input partitions") {
    val df = synth(1000, 8)
    assert(df.count() == 1000L)
    assert(df.rdd.getNumPartitions == 8)
  }

  test("rows are a pure function of doc_id: content invariant under repartitioning") {
    val a = synth(200, 3).collect().map(_.toSeq).toSet
    val b = synth(200, 8).collect().map(_.toSeq).toSet
    assert(a == b)
    assert(a.size == 200)
  }

  test("column pruning reaches the connector: text column absent from a lang-only scan") {
    val df = synth(500, 4).groupBy(col("lang")).agg(count(lit(1)).as("n"))
    df.collect()
    val scanDesc = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("SynthDocs rows=")).mkString
    assert(scanDesc.contains("cols=[lang]"),
      s"connector still asked for unneeded columns: $scanDesc")
  }

  test("connector output composes with the relational surface") {
    val perLang = synth(1000, 8)
      .withColumn("nt", size(split(col("text"), " ")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), round(avg(col("nt")), 2).as("avg_tokens"))
    val rows = perLang.collect()
    assert(rows.map(_.getLong(1)).sum == 1000L)
    assert(rows.forall(r => r.getDouble(2) >= 5.0 && r.getDouble(2) <= 36.0))
  }
}
