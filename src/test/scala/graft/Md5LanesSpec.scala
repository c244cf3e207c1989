package graft

import graft.functions.Md5Lanes.md5Lanes
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Pins the q206 lane-extraction identity: [[graft.functions.Md5Lanes]]
  * (byte-level digests + integer big-endian lane slicing) is
  * element-for-element equal to the portable-hash SQL spelling
  * `conv(substring(md5(concat(k, ':', g)), 1+8j, 8), 16, 10)` that the
  * DuckDB oracle keeps — the proof obligation for the round-13
  * q206 rewrite (same h values → same Poisson weights → bit-identical
  * replicate means).
  */
class Md5LanesSpec extends SparkSpec {
  import spark.implicits._

  /** The exact SQL formulation q206 used before the rewrite. */
  private val sqlLanes: String =
    """flatten(transform(sequence(0, 7), g ->
      |  transform(sequence(0, 3), j ->
      |    CAST(conv(substring(
      |      md5(concat(CAST(k AS STRING), ':', CAST(g AS STRING))),
      |      1 + 8 * j, 8), 16, 10) AS BIGINT))))""".stripMargin

  test("md5_lanes == conv(substring(md5(concat)),16,10) on edge keys") {
    val keys = Seq(0L, 1L, 9L, 10L, 4242L, 599999L, -1L, -987654321L,
      Long.MaxValue, Long.MinValue)
    val rows = keys.toDF("k")
      .select(col("k"), md5Lanes(col("k"), 8).as("fast"), expr(sqlLanes).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"key ${r.getLong(0)}")
    }
  }

  test("md5_lanes == SQL spelling (property over random longs)") {
    val p = Prop.forAllNoShrink(Gen.listOfN(16, Gen.chooseNum(Long.MinValue, Long.MaxValue))) { ks =>
      val rows = ks.toDF("k")
        .select(md5Lanes(col("k"), 8).as("fast"), expr(sqlLanes).as("ref"))
        .collect()
      rows.forall(r => r.getSeq[Long](0) == r.getSeq[Long](1))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), p)
    assert(res.passed, res.status.toString)
  }

  test("md5_lanes: lane values are unsigned 32-bit, 4*groups long, null-safe") {
    val out = Seq(Tuple1(Option(123L)), Tuple1(Option.empty[Long])).toDF("k")
      .select(md5Lanes(col("k"), 3).as("lanes"))
      .collect()
    val lanes = out(0).getSeq[Long](0)
    assert(lanes.length == 12)
    assert(lanes.forall(h => h >= 0L && h < (1L << 32)))
    assert(out(1).isNullAt(0))
  }
}
