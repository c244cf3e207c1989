package graft

import graft.etl.Pipeline
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap

/** Orchestration-level pipeline tests: the bounded-parallel route
  * executor must overlap route work while keeping the sequential
  * mode's fail-soft semantics, per-route outcomes and result order.
  * The injected fetcher stands in for HTTP so the test is hermetic.
  */
class PipelineSpec extends SparkSpec {

  private val cfgJson =
    """{"apis":{"a":{
      |  "base_url":"https://localhost:1",
      |  "endpoints":{"g":{
      |     "root_path":"resultado",
      |     "r1":"/d1", "r2":"/d2", "r3":"/d3", "r4":"/d4",
      |     "tmpl":"/x/{id}"
      |}}}}}""".stripMargin

  /** Fake fetch: writes a 3-row envelope keyed by the route path, and
    * records the [start, end] nanos of a deliberate dwell so the test
    * can assert whether route executions overlapped in time.
    */
  private def fakeFetch(
      intervals: ConcurrentHashMap[String, (Long, Long)],
      dwellMs: Long
  ): (String, java.nio.file.Path, graft.ingest.Http.Progress) => Either[graft.etl.GraftError, Long] =
    (url, dest, _) => {
      val t0 = System.nanoTime()
      Thread.sleep(dwellMs)
      Files.createDirectories(dest.getParent)
      val route = url.substring(url.lastIndexOf('/') + 1)
      val body =
        s"""{"resultado":[{"route":"$route","v":1},{"route":"$route","v":2},{"route":"$route","v":3}]}"""
      Files.write(dest, body.getBytes("UTF-8"))
      intervals.put(route, (t0, System.nanoTime()))
      Right(body.length.toLong)
    }

  test("parallel orchestration overlaps routes and preserves per-route results") {
    val cfg = graft.config.Config.loadFromString(cfgJson).toOption.get

    val seqIv = new ConcurrentHashMap[String, (Long, Long)]()
    val seqOut = Files.createTempDirectory("graft-pipe-seq").toString
    val sequential = Pipeline.run(spark, cfg, seqOut, parallelism = 1, fetch = fakeFetch(seqIv, 200))

    val parIv = new ConcurrentHashMap[String, (Long, Long)]()
    val parOut = Files.createTempDirectory("graft-pipe-par").toString
    val parallel = Pipeline.run(spark, cfg, parOut, parallelism = 4, fetch = fakeFetch(parIv, 200))

    // identical route order and identical per-route outcomes
    assert(sequential.map(_.key) == parallel.map(_.key))
    assert(sequential.map(r => r.key -> r.outcome.map(_ => ())) ==
      parallel.map(r => r.key -> r.outcome.map(_ => ())))
    val okKeys = parallel.filter(_.outcome.isRight).map(_.key)
    assert(okKeys == Seq("r1", "r2", "r3", "r4"), s"got $okKeys")
    assert(parallel.find(_.key == "tmpl").get.outcome.left.exists(_.message.contains("templated")))
    // row counts written by both modes match (and the parquet is real)
    for (k <- okKeys) {
      val s = spark.read.parquet(s"$seqOut/a/g/$k.parquet").count()
      val p = spark.read.parquet(s"$parOut/a/g/$k.parquet").count()
      assert(s == 3 && p == 3, s"$k: seq=$s par=$p")
    }
    // staging cleanup still post-success-only: no *_temp.json remains
    for (k <- okKeys)
      assert(!Files.exists(Paths.get(s"$parOut/a/g/${k}_temp.json")))

    // the sequential dwells are disjoint; the parallel ones overlap
    import scala.jdk.CollectionConverters._
    def overlaps(m: ConcurrentHashMap[String, (Long, Long)]): Int = {
      val iv = m.values.asScala.toSeq
      iv.combinations(2).count { case Seq((a0, a1), (b0, b1)) => a0 < b1 && b0 < a1 }
    }
    assert(overlaps(seqIv) == 0, "sequential mode must not overlap route dwells")
    assert(overlaps(parIv) > 0,
      s"parallel mode must overlap route dwells: ${parIv.asScala.toMap}")
  }

  test("parallel orchestration stays fail-soft when the fetcher throws") {
    val cfg = graft.config.Config.loadFromString(cfgJson).toOption.get
    val out = Files.createTempDirectory("graft-pipe-throw").toString
    val boom: (String, java.nio.file.Path, graft.ingest.Http.Progress) => Either[graft.etl.GraftError, Long] =
      (url, _, _) =>
        if (url.endsWith("/d2")) throw new RuntimeException("fetcher exploded")
        else Left(graft.etl.ProcessorError.Config("skipped"))
    val results = Pipeline.run(spark, cfg, out, parallelism = 3, fetch = boom)
    assert(results.size == 5)
    assert(results.forall(_.outcome.isLeft), "every route must fail soft")
    assert(results.find(_.key == "r2").get.outcome.left.exists(_.message.contains("fetcher exploded")))
  }
}
