package graft

import graft.ops.{Skew, Tables}
import org.apache.spark.sql.functions._

/** Salting must never change results — only the partitioning. */
class SkewSpec extends SparkSpec {

  test("saltedJoin is row-identical to the plain equi-join") {
    val orders = Tables.orders(spark, Sf).select("o_orderkey", "o_custkey")
    val customer = Tables.customer(spark, Sf).select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
      .select("o_orderkey", "o_custkey", "c_name")
    val salted = Skew.saltedJoin(orders, customer, "o_custkey", salts = 8)
      .select("o_orderkey", "o_custkey", "c_name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedSumAgg matches the direct aggregation") {
    val li = Tables.lineitem(spark, Sf)
    val direct = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_l_quantity"))
      .orderBy("l_returnflag")
      .collect()
    val salted = Skew.saltedSumAgg(li, "l_returnflag", salts = 8, Seq("l_quantity"))
      .orderBy("l_returnflag")
      .collect()
    assert(direct.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      salted.map(r => (r.getString(0), r.getLong(1))).toSeq)
    // float sums: same values merged in different order — compare rounded
    direct.zip(salted).foreach { case (d, s) =>
      assert(math.abs(d.getDouble(2) - s.getDouble(2)) < 1e-6)
    }
  }

  test("degreeSaltedContributions is row-identical to the plain join on a planted-hub graph") {
    import spark.implicits._
    // 200 cold nodes in a ring + node 0 wired to everyone (the hub)
    val ring = (1L until 200L).map(i => (i, i % 199 + 1))
    val hub = (1L until 200L).map(i => (0L, i))
    val edges = (ring ++ hub).toDF("src", "dst")
    val ranks = (0L until 200L).map(i => (i, i * 10L + 1L)).toDF("src", "rank")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // hub deg = 199, cold deg = 1: hotDegree 50 salts ONLY the hub
    val salted = Skew
      .degreeSaltedContributions(edges, ranks, deg, hotDegree = 50L, salts = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val plain = Skew
      .plainContributions(edges, ranks)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(salted == plain, "salting must only change partitioning, never values")
    // the hot set the broadcast carries is pigeonhole-bounded: here 1
    assert(deg.filter(col("outdeg") >= 50).count() == 1L)
  }
}
