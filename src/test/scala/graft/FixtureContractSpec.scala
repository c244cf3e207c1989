package graft

import org.apache.spark.sql.types._
import graft.ops.Tables

/** Pins the query-facing schema contract of every fixture table.
  *
  * The driver regenerates the fixture parquet between rounds and its
  * physical types have drifted before — a TIMESTAMP(NANOS) → NTZ
  * MICROS flip cost eight events-time queries a full round because the
  * failure surfaced only in the driver's verify run, after the fact.
  * `Tables.conform` normalizes known drift; this spec makes any NEW
  * drift (a type no normalization covers, a dropped column) fail
  * loudly in `sbt test` instead.
  */
class FixtureContractSpec extends SparkSpec {

  private def fieldTypes(name: String, df: org.apache.spark.sql.DataFrame) =
    df.schema.fields.map(f => s"$name.${f.name}" -> f.dataType).toMap

  test("time/vector columns conform to the canonical types queries are written against") {
    val got =
      fieldTypes("orders", Tables.orders(spark, Sf)) ++
        fieldTypes("lineitem", Tables.lineitem(spark, Sf)) ++
        fieldTypes("events", Tables.events(spark, Sf)) ++
        fieldTypes("embeddings", Tables.embeddings(spark, Sf))
    val want = Map(
      "orders.o_orderdate" -> TimestampType,
      "lineitem.l_shipdate" -> TimestampType,
      "events.ts" -> TimestampType,
      "embeddings.embedding" -> ArrayType(FloatType)
    )
    for ((c, t) <- want)
      assert(got.get(c).contains(t), s"$c is ${got.get(c)}, queries need $t")
  }

  test("every table still carries the columns the query surface references") {
    val want = Map(
      "region" -> Seq("r_regionkey", "r_name"),
      "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
      "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
      "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"),
      "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
      "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Seq("vec_id", "embedding", "label")
    )
    val load: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
      Map(
        "region" -> Tables.region, "nation" -> Tables.nation,
        "customer" -> Tables.customer, "supplier" -> Tables.supplier,
        "part" -> Tables.part, "orders" -> Tables.orders,
        "lineitem" -> Tables.lineitem, "events" -> Tables.events,
        "documents" -> Tables.documents, "embeddings" -> Tables.embeddings
      )
    for ((t, cols) <- want) {
      val have = load(t)(spark, Sf).columns.toSet
      val missing = cols.filterNot(have)
      assert(missing.isEmpty, s"fixture table $t lost columns: ${missing.mkString(",")}")
    }
  }

  test("timestamps read as UTC instants matching DuckDB's naive reading") {
    // A fixed row's wall-clock must be stable across fixture
    // generations: take the global min ts and check it formats the
    // same under the session UTC zone as the parquet statistics say.
    import org.apache.spark.sql.functions._
    val r = Tables.events(spark, Sf)
      .agg(min("ts").cast("string").as("lo"), max("ts").cast("string").as("hi"))
      .head()
    // value sanity, not exact pin: fixture covers a ~month of 2024
    assert(r.getString(0).startsWith("202"), s"min ts looks wrong: ${r.getString(0)}")
    assert(r.getString(1) > r.getString(0))
  }
}
