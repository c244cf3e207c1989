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

  test("HLL sketches are mergeable: per-shard sketch union equals the one-shot estimate") {
    // The property 100 TB relies on: partial sketches computed per
    // shard/partition merge without losing the error bound, so
    // distinct counts compose across files, days and reruns without
    // re-scanning history. (Union is not bit-identical to a one-shot
    // sketch — DataSketches' union path promotes representations in a
    // different order — but both sit inside the same rsd envelope.)
    val li = Tables.lineitem(spark, Sf).select(col("l_orderkey"), col("l_suppkey"))
    val oneShot = li
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_orderkey"))).as("est"))
      .head().getLong(0)
    val merged = li
      .groupBy(col("l_suppkey")) // shard by supplier, sketch each shard
      .agg(hll_sketch_agg(col("l_orderkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    assert(math.abs(merged - oneShot).toDouble / oneShot <= 0.01,
      s"merged=$merged oneShot=$oneShot")
    val exact = li.select("l_orderkey").distinct().count().toDouble
    assert(math.abs(merged - exact) / exact <= 0.05,
      s"estimate $merged vs exact $exact")
  }
}
