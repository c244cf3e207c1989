package graft

import graft.ops.Tables
import org.apache.spark.sql.functions._

/** Approximate aggregates: sketch results can't hash-match a DuckDB
  * oracle (different HLL implementations), so the spec pins the error
  * bound instead.
  */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct lands within 10% of exact at default rsd") {
    val li = Tables.lineitem(spark, Sf)
    val row = li
      .agg(
        countDistinct(col("l_orderkey")).as("exact"),
        approx_count_distinct(col("l_orderkey")).as("approx"))
      .head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.10,
      s"approx=$approx exact=$exact")
  }

  test("approximate quantiles bracket the exact median") {
    val li = Tables.lineitem(spark, Sf)
    val Array(q50) = li.stat.approxQuantile("l_quantity", Array(0.5), 0.01)
    val n = li.count()
    val below = li.filter(col("l_quantity") <= q50).count().toDouble / n
    assert(below >= 0.45 && below <= 0.56, s"median split $below")
  }
}
