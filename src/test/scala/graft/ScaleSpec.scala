package graft

import graft.ops.Tables
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Storage-layout techniques for 100 TB: partitioned layouts pruning
  * at the scan, and bucketed tables co-locating joins so the shuffle
  * disappears.
  */
class ScaleSpec extends SparkSpec {

  test("partitioned parquet write: predicate prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft-part").resolve("orders").toString
    Tables
      .orders(spark, Sf)
      .write
      .mode("overwrite")
      .partitionBy("o_orderstatus")
      .parquet(dir)

    val statuses = new java.io.File(dir).list().count(_.startsWith("o_orderstatus="))
    assert(statuses >= 2, "expected multiple partition directories")

    val filtered = spark.read.parquet(dir).filter(col("o_orderstatus") === "F")
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("o_orderstatus"),
      s"partition filter missing from scan:\n${scan.take(1200)}")
    // pruned scan must agree with the unpartitioned filter
    assert(filtered.count() ==
      Tables.orders(spark, Sf).filter(col("o_orderstatus") === "F").count())
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    // The 100-TB shape: fact partitioned on the join key, dim filter
    // known only after the dim scan — DPP turns it into a runtime
    // partition filter on the fact instead of a full scan. Static
    // pruning (the test above) can't do this; the pruning value is
    // not in the query text.
    val dir = Files.createTempDirectory("graft-dpp").resolve("orders").toString
    Tables
      .orders(spark, Sf)
      .write
      .mode("overwrite")
      .partitionBy("o_orderpriority")
      .parquet(dir)
    import spark.implicits._
    // the dim must be a FILE relation: a local Seq folds its filter
    // into the LocalRelation before the PartitionPruning rule runs,
    // and DPP then sees no selective predicate to propagate
    val dimDir = Files.createTempDirectory("graft-dpp-dim").resolve("dim").toString
    Seq(
      ("1-URGENT", "hot"), ("2-HIGH", "hot"), ("3-MEDIUM", "warm"),
      ("4-NOT SPECIFIED", "cold"), ("5-LOW", "cold"))
      .toDF("prio", "tier")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val fact = spark.read.parquet(dir)
    val q = fact
      .join(dim, fact("o_orderpriority") === dim("prio"))
      .filter(col("tier") === "hot")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic pruning subquery on the fact scan:\n${plan.take(1500)}")
    val expected = Tables
      .orders(spark, Sf)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .count()
    assert(q.count() == expected, "pruned join must keep exactly the hot-tier rows")
  }

  test("bucketed tables: equi-join on the bucket key plans without a shuffle") {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    assert(warehouse.nonEmpty)
    spark.sql("DROP TABLE IF EXISTS cust_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Tables
      .customer(spark, Sf)
      .select("c_custkey", "c_name", "c_nationkey")
      .write
      .bucketBy(4, "c_custkey")
      .sortBy("c_custkey")
      .saveAsTable("cust_b")
    Tables
      .orders(spark, Sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write
      .bucketBy(4, "o_custkey")
      .sortBy("o_custkey")
      .saveAsTable("ord_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark
        .table("cust_b")
        .join(spark.table("ord_b"), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey"))
        .agg(sum(col("o_totalprice")).as("spend"))
      val plan = joined.queryExecution.executedPlan.toString
      val joinSection = plan.split("HashAggregate").last
      assert(joinSection.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(1500)}")
      assert(!joinSection.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(1500)}")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS cust_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("runtime bloom-filter pruning injects on a selective shuffle join") {
    // At cluster scale a selective dim filter should prune the fact
    // scan BEFORE the shuffle: Spark's runtime-filter rule injects a
    // bloom might_contain on the fact side, built from the filtered
    // dim. Fixture tables are below the size thresholds, so the spec
    // lowers them to prove the mechanism the 100 TB posture relies on.
    val prev = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.get(k))
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle-join path
    try {
      val li = Tables.lineitem(spark, Sf)
      val o = Tables.orders(spark, Sf).filter(col("o_totalprice") > 450000)
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).count()
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"runtime bloom filter not injected:\n${plan.take(1500)}")
      j.collect() // and it still computes
    } finally {
      prev.foreach { case (k, v) => spark.conf.set(k, v) }
    }
  }

  test("compaction: many small files rewrite to the target count, content identical") {
    val src = Files.createTempDirectory("graft-small").toString
    val li = Tables.lineitem(spark, Sf).select("l_orderkey", "l_linenumber", "l_quantity")
    li.repartition(37).write.mode("overwrite").parquet(src)
    val out = Files.createTempDirectory("graft-compact").toString
    graft.ops.Layout.compact(spark, src, out, 3)
    val files = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 3, s"expected 3 files, got $files")
    // sort on every column: (orderkey, linenumber) is not unique in
    // the synthetic fixture, and ties would make the compare flaky
    val a = spark.read.parquet(src).orderBy("l_orderkey", "l_linenumber", "l_quantity").collect()
    val b = spark.read.parquet(out).orderBy("l_orderkey", "l_linenumber", "l_quantity").collect()
    assert(a.sameElements(b))
  }

  test("z-order layout: per-file bounding boxes shrink on BOTH dimensions vs naive") {
    import org.apache.spark.sql.DataFrame
    // average per-file (max-min) span of each dimension, normalized
    // by the global span — the proxy for min/max-stats prunability
    def avgSpans(dir: String): (Double, Double) = {
      val df = spark.read.parquet(dir)
        .select(col("l_partkey"), col("l_suppkey"), input_file_name().as("f"))
      val g = df.agg(
        (max("l_partkey") - min("l_partkey")).cast("double").as("ga"),
        (max("l_suppkey") - min("l_suppkey")).cast("double").as("gb")).head()
      val per = df.groupBy("f").agg(
        (max("l_partkey") - min("l_partkey")).cast("double").as("sa"),
        (max("l_suppkey") - min("l_suppkey")).cast("double").as("sb"))
        .agg(avg("sa").as("sa"), avg("sb").as("sb")).head()
      (per.getDouble(0) / g.getDouble(0), per.getDouble(1) / g.getDouble(1))
    }
    val li = Tables.lineitem(spark, Sf).select("l_partkey", "l_suppkey", "l_quantity")
    val naive = Files.createTempDirectory("graft-naive").toString
    li.repartition(8).write.mode("overwrite").parquet(naive)
    val zed = Files.createTempDirectory("graft-zorder").toString
    graft.ops.Layout.zorderWrite(li, "l_partkey", "l_suppkey", zed, 8)
    val (na, nb) = avgSpans(naive)
    val (za, zb) = avgSpans(zed)
    // naive round-robin files span ~the whole space on both dims;
    // z-ordered files must cover tight boxes on both simultaneously
    assert(za < na * 0.8 && zb < nb * 0.8,
      s"z-order did not shrink boxes: naive=($na,$nb) zorder=($za,$zb)")
  }
}
