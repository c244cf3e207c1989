package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = GraftSession
      .builder(master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
    // Ad-hoc conf overrides for A/B tuning: "k=v;k=v". Segments without
    // '=' (e.g. from a trailing ';') are ignored rather than aborting
    // the whole bench run with a MatchError.
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => builder.config(k, v)
        case _                         => ()
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Full materialization via the noop sink — count() would let
    // Catalyst prune final projections out of the measurement.
    // A query that throws must read as a FAILURE in the emitted JSON,
    // not as a fast valid measurement: failed names go to `failed`,
    // their per-query value is -1, and they are excluded from totals.
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    // Post-cleanup residual storage, sampled after every measurement:
    // localCheckpoint blocks released between queries must leave the
    // block manager FLAT across the sweep — a rising peak here means a
    // query leaked persisted state past its own action.
    var storagePeakResidual = 0L
    def run(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      System.gc() // JMH-style: keep accumulated garbage out of the next measurement
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        // outside the timed window: drop this query's checkpoint blocks
        GraftSession.releaseQueryState(spark)
        storagePeakResidual = math.max(storagePeakResidual, GraftSession.storageBytes(spark))
        dt
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failed += name
          GraftSession.releaseQueryState(spark)
          -1.0
      }
    }
    // Pass 1 (untimed): JVM JIT + whole-stage-codegen compilation +
    // shuffle-service warmup. Then SPARK_GRAFT_PASSES (default 3) warm
    // passes; the reported per-query number is the MEDIAN so a single
    // GC pause or JIT deopt can't masquerade as a plan regression —
    // single-pass numbers swing ±25% run-to-run, which round 2's q12
    // "regression" turned out to be. `queries_min` carries the
    // best-case floor for reference.
    // Optional comma-separated filter for fast single-query iteration.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Non-numeric/absurd values fall back to the default instead of
    // aborting the whole bench with a NumberFormatException (the same
    // hardening the SPARK_GRAFT_CONF parser above has).
    // Default 5 passes since round 5: the round-4 record showed a broad
    // ~30% median inflation on queries no commit touched (m4_resize
    // 0.53→0.97 s) that a same-code re-run could not reproduce (1.02×
    // round-3 on the 46 recoverable shared queries) — ambient load
    // during the driver session, not plan regressions. More passes +
    // the recorded load average below make that attribution readable
    // straight from the bench artifact next time.
    val passes = sys.env
      .get("SPARK_GRAFT_PASSES")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .getOrElse(5)
      .max(1)
    // 1-minute system load average, sampled before and after the run:
    // distinguishes "the plans regressed" from "the box was busy" when
    // comparing rounds (load ≈ cpus when this bench is the only tenant).
    def loadAvg(): Double =
      try java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
      catch { case _: Exception => -1.0 }
    val loadStart = loadAvg()
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    val cold = selected.map { case (n, f) => n -> run(n, f) }
    val warm: Seq[Map[String, Double]] =
      (1 to passes).map(_ => selected.map { case (n, f) => n -> run(n, f) }.toMap)
    def medianOf(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0).sorted
      if (ok.isEmpty) -1.0
      else if (ok.size % 2 == 1) ok(ok.size / 2)
      else (ok(ok.size / 2 - 1) + ok(ok.size / 2)) / 2.0 // true median, not upper-middle
    }
    val names = selected.keys.toSeq
    val med = names.map(n => n -> medianOf(warm.map(_(n)))).toMap
    val mn = names.map(n => n -> {
      val ok = warm.map(_(n)).filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.min
    }).toMap
    // Solo floor pass: the warm medians are taken mid-sweep, under the
    // heap/GC residue of 140+ other queries — round 5's audit measured
    // q90 at 3.19 s in-sweep vs 2.28 s solo, and attributing that gap
    // cost a manual re-run. Approximate the solo number in-run: for the
    // K most expensive queries (the ones a plan audit reads), take the
    // best of two extra runs behind an aggressive quiesce (double GC +
    // settle). K stays small so the contract line stays within the
    // driver's stdout-tail capture budget; the full floor map would
    // re-create round 3's truncation.
    // Coverage: the top-K by median, UNIONED with every query whose
    // median is ≥ 2 s — the round-7 audit had to do manual forensics on
    // t17 (the slowest query) because rank-based top-10 happened to
    // capture it in one round and not the next; the absolute threshold
    // makes "every query a plan audit reads has a floor" a stable
    // contract. FLOOR_K=0 still disables the pass entirely.
    val floorK = sys.env
      .get("SPARK_GRAFT_FLOOR_K")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .getOrElse(10)
      .max(0)
    val ranked = names.filter(med(_) >= 0).sortBy(-med(_))
    val floorNames =
      if (floorK == 0) Seq.empty
      else (ranked.take(floorK) ++ ranked.filter(med(_) >= 2.0)).distinct
    val floor = floorNames.map { n =>
      val runs = (1 to 2).map { _ =>
        System.gc(); System.gc()
        Thread.sleep(200)
        run(n, selected(n))
      }.filter(_ >= 0)
      n -> (if (runs.isEmpty) -1.0 else runs.min)
    }.toMap
    def jmapOf(ks: Seq[String], m: Map[String, Double]): String =
      ks.map(k => s"\"" + k + "\":" + m(k)).mkString("{", ",", "}")
    val floorJson = jmapOf(floorNames, floor)
    def jmap(m: Map[String, Double]): String =
      names.map(k => s"\"" + k + "\":" + m(k)).mkString("{", ",", "}")
    val total = med.values.filter(_ >= 0).sum
    val coldTotal = cold.values.filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // The driver captures a bounded TAIL of stdout, so the contract
    // line must stay small: per-query MEDIANS only. The full detail
    // (medians + mins + cold pass) goes to bench_detail.json next to
    // the build for offline analysis — round 3's emitted line carried
    // both maps and was long enough that its head got truncated out of
    // the driver's capture window.
    val loadEnd = loadAvg()
    val loadJson = s""""load_1m_start":$loadStart,"load_1m_end":$loadEnd"""
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","cold_total":$coldTotal,"passes":$passes,$loadJson,"failed":$failedJson,"queries_floor_topk":$floorJson,"queries":${jmap(med)},"sf":"$sfDir"}"""
    val detail =
      s"""{"metric":"total","value":$total,"unit":"sec","cold_total":$coldTotal,"passes":$passes,$loadJson,"storage_bytes_peak_residual":$storagePeakResidual,"failed":$failedJson,"queries":${jmap(med)},"queries_min":${jmap(mn)},"queries_cold":${jmap(cold.toMap)},"queries_floor_topk":$floorJson,"sf":"$sfDir"}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_detail.json"),
      detail.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception => System.err.println(s"[bench] detail write failed: ${e.getMessage}") }
    println(line)
    spark.stop()
  }
}
