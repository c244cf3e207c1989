package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench harness guard logic (round-12 verdict mandates #1/#2): the
  * outlier guard's cross-run prior must be un-clobberable by subset
  * A/B runs, refuse stale/foreign detail files, and apply the tighter
  * 2× threshold to measure-once streaming gates. Pure-function tests —
  * no SparkSession, no working-directory mutation.
  */
class BenchSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"

  private def detailJson(
      queries: Map[String, Double],
      sfDir: String = sf,
      format: Option[Int] = Some(Bench.DetailFormat)): String = {
    val fmt = format.map(f => s""""detail_format":$f,""").getOrElse("")
    val q = queries.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    s"""{"metric":"total",$fmt"value":1.0,"queries":$q,"queries_min":$q,"sf":"$sfDir"}"""
  }

  test("subset runs are routed to a different detail file") {
    assert(Bench.detailFileNameFor(subset = true) === "bench_detail_subset.json")
    assert(Bench.detailFileNameFor(subset = false) === "bench_detail.json")
    assert(Bench.detailFileNameFor(subset = true) !== Bench.detailFileNameFor(subset = false))
  }

  test("outlier threshold: 2x for measure-once streaming gates, 3x otherwise") {
    assert(Bench.outlierThreshold(measureOnceStream = true) === 2.0)
    assert(Bench.outlierThreshold(measureOnceStream = false) === 3.0)
  }

  test("extractFlatMap parses the machine-written span and drops failed (-1) entries") {
    val s = detailJson(Map("q1" -> 1.5, "q2" -> -1.0, "q3" -> 0.25))
    assert(Bench.extractFlatMap(s, "queries") === Map("q1" -> 1.5, "q3" -> 0.25))
    assert(Bench.extractFlatMap(s, "absent_key") === Map.empty)
  }

  test("prior loader refuses a subset detail covering <90% of the query set") {
    // The round-12 failure: a 9-query audit run replaced the prior and
    // q210's 50.6 s stall went unguarded. A file like that must now be
    // rejected outright even if it lands in bench_detail.json.
    val selected = (1 to 400).map(i => s"q$i").toSet
    val subset = detailJson((1 to 9).map(i => s"q$i" -> 1.0).toMap)
    assert(Bench.priorFromJson(subset, sf, selected) === Map.empty)
    val full = detailJson(selected.map(_ -> 1.0).toMap)
    assert(Bench.priorFromJson(full, sf, selected).size === 400)
    // exactly at the bar: 360/400 = 90% is accepted, 359 is not
    val at = detailJson((1 to 360).map(i => s"q$i" -> 1.0).toMap)
    assert(Bench.priorFromJson(at, sf, selected).size === 360)
    val under = detailJson((1 to 359).map(i => s"q$i" -> 1.0).toMap)
    assert(Bench.priorFromJson(under, sf, selected) === Map.empty)
  }

  test("prior loader refuses wrong sf and missing/old format stamps") {
    val selected = Set("q1", "q2")
    val ok = detailJson(Map("q1" -> 1.0, "q2" -> 2.0))
    assert(Bench.priorFromJson(ok, sf, selected).size === 2)
    assert(Bench.priorFromJson(ok, "/root/testdata/sf0.01", selected) === Map.empty)
    val unstamped = detailJson(Map("q1" -> 1.0, "q2" -> 2.0), format = None)
    assert(Bench.priorFromJson(unstamped, sf, selected) === Map.empty)
    val oldFormat = detailJson(Map("q1" -> 1.0, "q2" -> 2.0), format = Some(Bench.DetailFormat - 1))
    assert(Bench.priorFromJson(oldFormat, sf, selected) === Map.empty)
  }

  test("full-run merge keeps absent keys; current values win; cross-sf merges nothing") {
    val existing = detailJson(Map("a" -> 1.0, "b" -> 2.0, "c" -> 3.0))
    val merged = Bench.mergeMap(Some(existing), sf, "queries", Map("b" -> 9.0))
    assert(merged === Map("a" -> 1.0, "b" -> 9.0, "c" -> 3.0))
    val crossSf = Bench.mergeMap(Some(existing), "/root/testdata/sf0.01", "queries", Map("b" -> 9.0))
    assert(crossSf === Map("b" -> 9.0))
    assert(Bench.mergeMap(None, sf, "queries", Map("b" -> 9.0)) === Map("b" -> 9.0))
  }

  test("end-to-end: a subset run leaves the full-map prior intact on disk") {
    // Simulates the round-12 close-session sequence with real files in
    // a temp dir: (1) a full run writes bench_detail.json, (2) a
    // subset A/B run writes to its OWN routed filename, (3) the next
    // full run's prior loader still sees the complete map.
    val dir = java.nio.file.Files.createTempDirectory("bench-guard")
    val fullNames = (1 to 40).map(i => s"q$i").toSet
    val fullPath = dir.resolve(Bench.detailFileNameFor(subset = false))
    java.nio.file.Files.write(
      fullPath,
      detailJson(fullNames.map(_ -> 1.0).toMap).getBytes("UTF-8"))
    val subsetPath = dir.resolve(Bench.detailFileNameFor(subset = true))
    java.nio.file.Files.write(
      subsetPath,
      detailJson(Map("q1" -> 0.5)).getBytes("UTF-8"))
    val prior = Bench.priorFromJson(
      new String(java.nio.file.Files.readAllBytes(fullPath), "UTF-8"),
      sf,
      fullNames)
    assert(prior.keySet === fullNames)
    assert(prior("q1") === 1.0) // the subset run's 0.5 never touched the prior
  }
}
