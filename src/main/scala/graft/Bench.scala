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
    // No per-run System.gc(): round 12 measured it at ~0.75 s × 396
    // queries ≈ 300 s PER PASS of untimed wall — the single reason the
    // budget afforded one warm pass instead of three. Cross-query GC
    // noise is what the 3-pass medians, the quiesced floor pass and
    // the outlier guard are for; a full GC still runs at every pass
    // boundary and before every quiesced measurement.
    def run(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
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
    def envInt(key: String, default: Int): Int =
      sys.env.get(key).flatMap(v => scala.util.Try(v.trim.toInt).toOption).getOrElse(default)
    // ---- Budget-aware schedule ------------------------------------------
    // Round 10 shipped with NO driver bench numbers: 388 queries ×
    // (cold + 5 warm + an 89-query floor sweep) overran the driver's
    // time budget and the run was killed at rc=124. The schedule is
    // sized from its OWN measurements against an explicit wall-clock
    // budget instead of assuming the fixed round-3 shape:
    //   * cold pass (always, measures every query once),
    //   * warm passes planned ADAPTIVELY: the first plan divides the
    //     remaining budget by the COLD pass cost, then each completed
    //     warm pass replaces the estimate with its own measured wall —
    //     cold includes JIT/codegen warmup and overestimates a warm
    //     pass by ~30%, which is exactly why round 11 planned only ONE
    //     warm pass and its medians degenerated to single samples.
    //     SPARK_GRAFT_PASSES still caps the count for A/B runs,
    //   * floor set is rank-K ONLY (the "∪ every query ≥ 2 s" rule had
    //     grown to 89 queries), skipped per-query once the budget is
    //     spent.
    // The budget covers THIS main()'s wall only; sbt/JVM startup is the
    // caller's overhead (measured ~20 s in round 12). 2,650 keeps the
    // worst-case sbt wall under the round-9 measured 2,770 s envelope
    // while affording cold + 3 warm passes on a loaded box (round 12
    // measured a pass at ~620 s under ambient load 13 vs ~500 quiet);
    // the scheduler stops early when the box is fast, so the higher
    // ceiling costs nothing on quiet runs.
    val budgetS = envInt("SPARK_GRAFT_BUDGET_S", 2650).max(60)
    val benchT0 = System.nanoTime()
    def spentS: Double = (System.nanoTime() - benchT0) / 1e9
    // Run-to-completion streaming gates are deterministic micro-batch
    // JOBS (feed write → checkpointed query → sink), not plans being
    // JIT-warmed: pass-to-pass variance is dominated by file-system and
    // RocksDB setup that re-runs identically every time, and at
    // 75.9 s/pass they were a third of round 10's sweep. Measure them
    // ONCE in the cold pass and reuse that number as their median;
    // SPARK_GRAFT_STREAM_REWARM=1 restores the old behavior for A/B.
    val streamNames: Set[String] = graft.streaming.Streams.queries.keySet
    val rewarmStreams = sys.env.get("SPARK_GRAFT_STREAM_REWARM").contains("1")
    // Optional comma-separated filter for fast single-query iteration.
    // Subset runs write their detail to bench_detail_subset.json so a
    // tiny A/B sweep can never clobber the full-map cross-run prior —
    // round 12's close session lost the q210 stall guard exactly that
    // way (a 9-query audit run had just replaced bench_detail.json).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val detailFile = detailFileNameFor(subset = only.isDefined)
    // 1-minute system load average, sampled before and after the run:
    // distinguishes "the plans regressed" from "the box was busy" when
    // comparing rounds (load ≈ cpus when this bench is the only tenant).
    def loadAvg(): Double =
      try java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
      catch { case _: Exception => -1.0 }
    val loadStart = loadAvg()
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    // Prior committed detail run at the SAME sf, when present: the
    // cross-run partner the outlier guard uses for measure-once
    // streaming gates, which have no same-run partner of their own.
    // Trusted only when format-stamped AND covering >=90% of the
    // current query set (round-12 verdict: a subset detail file or a
    // stale pre-format file must not seed the guard).
    val prior: Map[String, Double] = priorDetailQueries(sfDir, selected.keySet)
    // Pass 1: cold — JVM JIT + whole-stage-codegen compilation + shuffle
    // warmup, and the sole measurement for streaming gates.
    val cold = selected.map { case (n, f) => n -> run(n, f) }
    val warmSelected = if (rewarmStreams) selected else selected.filter { case (n, _) => !streamNames(n) }
    // K=5 (round-12): the rank-10 reserve (2.2 × ~96 s cold) was a
    // quarter of the post-cold budget and the guard's cross-run prior
    // now covers what ranks 6–10 caught.
    val floorK = envInt("SPARK_GRAFT_FLOOR_K", 5).max(0)
    // Reserve for the floor pass before committing to warm passes: two
    // quiesced runs of the top-K FLOOR-ELIGIBLE queries, estimated from
    // cold times. Round-11 ADVICE: taking the top-K of ALL queries let
    // the (floor-excluded) streaming gates inflate the reserve and
    // understate the affordable warm passes.
    val eligibleCold = warmSelected.keys.map(cold(_)).filter(_ >= 0).toSeq
    val floorReserve =
      if (floorK == 0) 0.0
      else 2.2 * eligibleCold.sorted.takeRight(floorK).sum
    val passCap = envInt("SPARK_GRAFT_PASSES", 5).max(1)
    // Medians beat floors when the budget can't buy both: a 3-sample
    // median is the artifact round-over-round comparison reads, while
    // a skipped floor is recorded in floor_skipped and the outlier
    // guard still has the prior run's detail as a partner. So when the
    // reserve-respecting plan lands under 3 passes but a reserve-free
    // plan reaches it, take the passes and let the floor loop's own
    // per-query budget check decide what floor work still fits.
    val targetPasses = 3
    // Warm passes: the reported per-query number is the MEDIAN of these
    // so a single GC pause or JIT deopt can't masquerade as a plan
    // regression — single-pass numbers swing ±25% run-to-run, which
    // round 2's q12 "regression" turned out to be.
    val warm = scala.collection.mutable.ArrayBuffer.empty[Map[String, Double]]
    var passCostEst = eligibleCold.sum
    def affordable(reserve: Double): Int =
      if (passCostEst <= 0) 0
      else ((budgetS - spentS - reserve) / passCostEst).toInt
    def planFrom(done: Int): Int = {
      val withReserve = math.min(passCap, done + affordable(floorReserve))
      val planned =
        if (withReserve >= targetPasses) withReserve
        else math.min(targetPasses, math.min(passCap, done + affordable(0.0)))
      math.max(math.max(1, done), planned)
    }
    var passesPlanned = planFrom(0)
    var p = 0
    while (p < passesPlanned) {
      System.gc() // pass boundary: drop the previous pass's garbage
      val t0 = spentS
      warm += warmSelected.map { case (n, f) => n -> run(n, f) }.toMap
      p += 1
      // replan from the measured pass wall, never below what already ran
      passCostEst = spentS - t0
      passesPlanned = planFrom(p)
    }
    val passesRun = warm.size
    def medianOf(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0).sorted
      if (ok.isEmpty) -1.0
      else if (ok.size % 2 == 1) ok(ok.size / 2)
      else (ok(ok.size / 2 - 1) + ok(ok.size / 2)) / 2.0 // true median, not upper-middle
    }
    val names = selected.keys.toSeq
    def samples(n: String): Seq[Double] =
      if (warmSelected.contains(n)) warm.toSeq.map(_(n)) else Seq(cold(n))
    val med = names.map(n => n -> medianOf(samples(n))).toMap
    val mn = names.map(n => n -> {
      val ok = samples(n).filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.min
    }).toMap
    // Solo floor pass: the warm medians are taken mid-sweep, under the
    // heap/GC residue of 380+ other queries — round 5's audit measured
    // q90 at 3.19 s in-sweep vs 2.28 s solo, and attributing that gap
    // cost a manual re-run. Approximate the solo number in-run: for the
    // K most expensive queries (the ones a plan audit reads), take the
    // best of two extra runs behind an aggressive quiesce (double GC +
    // settle). Rank-K only — bounded coverage is what keeps this pass
    // inside the budget now that 89 queries sit above the old 2 s
    // threshold. FLOOR_K=0 disables the pass entirely.
    // Streaming gates are deterministic jobs (see above): under
    // measure-once they are excluded here too — a quiesced re-run would
    // just repeat the same feed-write + checkpoint work, not reveal a
    // cleaner plan number.
    val ranked = names
      .filter(n => med(n) >= 0 && (rewarmStreams || !streamNames(n)))
      .sortBy(-med(_))
    val floorNames = ranked.take(floorK)
    var floorSkipped = List.empty[String]
    val floor = floorNames.flatMap { n =>
      if (spentS + 2.2 * med(n) > budgetS) { floorSkipped ::= n; None }
      else {
        val runs = (1 to 2).map { _ =>
          System.gc(); System.gc()
          Thread.sleep(200)
          run(n, selected(n))
        }.filter(_ >= 0)
        Some(n -> (if (runs.isEmpty) -1.0 else runs.min))
      }
    }.toMap
    // ---- Outlier re-measure guard (round-11 VERDICT) --------------------
    // A single disk-stalled sample must not be the number of record —
    // round 11 committed q164 at 107.5 s where a solo re-measure said
    // 22.1 s. Any query whose official number exceeds 3× its best
    // same-run partner (solo floor, or the min of ≥2 sweep samples) or
    // — for measure-once streaming gates, which have only one sample —
    // 2× the previous committed detail run at the same sf, gets ONE
    // quiesced re-run. The tighter streaming threshold is the round-12
    // verdict's mandate: q229/q204 shipped at 2.44×/1.60× their true
    // cost, under the old uniform 3× bar — and streaming gates always
    // have the cross-run prior as partner now, so 2× is safe from
    // false positives (the guard records both numbers anyway). BOTH
    // numbers are recorded: the raw outlier in `queries_outlier_raw`,
    // the better number as official.
    def outlierXFor(n: String): Double =
      outlierThreshold(measureOnceStream = streamNames(n) && !rewarmStreams)
    val official = scala.collection.mutable.Map(med.toSeq: _*)
    val outlierRaw = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def partnerOf(n: String): Option[Double] = {
      val multi = { val ok = samples(n).filter(_ >= 0); if (ok.size >= 2) Some(ok.min) else None }
      val cands = (floor.get(n).toSeq ++ multi.toSeq ++ prior.get(n).toSeq).filter(_ > 0)
      if (cands.isEmpty) None else Some(cands.min)
    }
    names
      .filter(n => official(n) >= 0 && partnerOf(n).exists(pv => official(n) > outlierXFor(n) * pv))
      .sortBy(-official(_))
      .take(10) // bounded: the guard exists for a handful of stalls, not a re-sweep
      .foreach { n =>
        if (spentS + 1.3 * official(n) <= budgetS) {
          System.gc(); System.gc()
          Thread.sleep(200)
          val r = run(n, selected(n))
          if (r >= 0) {
            outlierRaw(n) = official(n)
            official(n) = math.min(official(n), r)
          }
        }
      }
    def jmapOf(ks: Seq[String], m: collection.Map[String, Double]): String =
      ks.map(k => s"\"" + k + "\":" + m(k)).mkString("{", ",", "}")
    val floorJson = jmapOf(floorNames.filter(floor.contains), floor)
    val outlierJson = jmapOf(outlierRaw.keys.toSeq, outlierRaw)
    def jmap(m: collection.Map[String, Double]): String =
      names.map(k => s"\"" + k + "\":" + m(k)).mkString("{", ",", "}")
    val total = names.map(official(_)).filter(_ >= 0).sum
    val coldTotal = cold.values.filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // The driver captures a bounded TAIL of stdout, so the contract
    // line must stay small: per-query numbers only. The full detail
    // (officials + mins + cold pass) goes to bench_detail.json next to
    // the build for offline analysis — round 3's emitted line carried
    // both maps and was long enough that its head got truncated out of
    // the driver's capture window.
    val loadEnd = loadAvg()
    val loadJson = s""""load_1m_start":$loadStart,"load_1m_end":$loadEnd"""
    val schedJson =
      s""""budget_s":$budgetS,"spent_s":${math.round(spentS)},"passes":$passesRun,"passes_planned":$passesPlanned,"stream_measure_once":${!rewarmStreams},"floor_skipped":${floorSkipped.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","cold_total":$coldTotal,$schedJson,$loadJson,"failed":$failedJson,"queries_outlier_raw":$outlierJson,"queries_floor_topk":$floorJson,"queries":${jmap(official)},"sf":"$sfDir"}"""
    // Full runs MERGE the three per-query maps over the existing
    // same-sf detail file: keys this run didn't measure (a failed
    // query, or an older full map after a partial sweep) survive, so
    // the outlier guard's cross-run prior can only grow, never shrink.
    // Subset runs never reach here with the full filename (routed
    // above), so a tiny A/B sweep cannot clobber the prior either way.
    val existingDetail: Option[String] =
      if (only.isDefined) None
      else
        try {
          val p0 = java.nio.file.Paths.get(detailFile)
          if (java.nio.file.Files.exists(p0))
            Some(new String(java.nio.file.Files.readAllBytes(p0), java.nio.charset.StandardCharsets.UTF_8))
          else None
        } catch { case _: Exception => None }
    val mergedOfficial = mergeMap(existingDetail, sfDir, "queries", names.map(n => n -> official(n)).toMap)
    val mergedMin = mergeMap(existingDetail, sfDir, "queries_min", names.map(n => n -> mn(n)).toMap)
    val mergedCold = mergeMap(existingDetail, sfDir, "queries_cold", cold.toMap)
    val mergedPriorN = (mergedOfficial.keySet -- names.toSet).size
    def jmapAll(m: Map[String, Double]): String =
      m.keys.toSeq.sorted.map(k => "\"" + k + "\":" + m(k)).mkString("{", ",", "}")
    val detail =
      s"""{"metric":"total","detail_format":$DetailFormat,"merged_prior_n":$mergedPriorN,"value":$total,"unit":"sec","cold_total":$coldTotal,$schedJson,$loadJson,"storage_bytes_peak_residual":$storagePeakResidual,"failed":$failedJson,"queries_outlier_raw":$outlierJson,"queries":${jmapAll(mergedOfficial)},"queries_min":${jmapAll(mergedMin)},"queries_cold":${jmapAll(mergedCold)},"queries_floor_topk":$floorJson,"sf":"$sfDir"}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(detailFile),
      detail.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception => System.err.println(s"[bench] detail write failed: ${e.getMessage}") }
    println(line)
    // The LAST stdout line is a SMALL machine-readable summary: the
    // driver keeps a bounded tail of stdout, and round 11's ~15 KB
    // single contract line put the headline "value" field at the HEAD
    // — truncated out of the capture, so BENCH_r11.json carried
    // rc=0 but parsed:null. The tail-capture always keeps the last
    // line; the full per-query map stays on the big line above.
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","cold_total":$coldTotal,"passes":$passesRun,"failed_n":${failed.size},"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Format marker stamped into bench_detail.json. Bumped whenever the
    * file's semantics change; [[priorFromJson]] refuses files without
    * the CURRENT marker, so a stale detail written by an older code
    * version can never seed the outlier guard with obsolete partner
    * times (round-12 ADVICE).
    */
  private[graft] val DetailFormat = 2

  /** Detail runs are routed by scope: a `SPARK_GRAFT_ONLY` subset A/B
    * run must never overwrite the full-map cross-run prior.
    */
  private[graft] def detailFileNameFor(subset: Boolean): String =
    if (subset) "bench_detail_subset.json" else "bench_detail.json"

  /** Outlier-guard threshold: 3× for queries with same-run partners,
    * 2× for measure-once streaming gates (single cold sample; their
    * partner is the cross-run prior — round-12 verdict mandate).
    */
  private[graft] def outlierThreshold(measureOnceStream: Boolean): Double =
    if (measureOnceStream) 2.0 else 3.0

  /** Flat `"name":number` map at `"key":{...}` inside a machine-written
    * detail JSON (hand-rolled: no JSON lib on the classpath). Negative
    * values (failed measurements) are dropped.
    */
  private[graft] def extractFlatMap(s: String, key: String): Map[String, Double] = {
    val marker = "\"" + key + "\":{"
    val i = s.indexOf(marker)
    if (i < 0) Map.empty
    else {
      val body = s.substring(i + marker.length, s.indexOf('}', i + marker.length))
      body
        .split(",")
        .flatMap { kv =>
          kv.split(":") match {
            case Array(k, v) =>
              scala.util.Try(k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble).toOption
            case _ => None
          }
        }
        .filter(_._2 >= 0)
        .toMap
    }
  }

  /** Cross-run prior from a detail JSON string, or empty unless ALL of:
    * same sf dir, current [[DetailFormat]] stamp, and coverage of at
    * least 90% of the currently selected query names. The coverage bar
    * is the round-12 mandate: a 9-query audit subset had replaced the
    * prior and q210's 50.6 s stall went unguarded.
    */
  private[graft] def priorFromJson(json: String, sfDir: String, selected: Set[String]): Map[String, Double] =
    if (!json.contains(s""""sf":"$sfDir"""")) Map.empty
    else if (!json.contains(s""""detail_format":$DetailFormat""")) Map.empty
    else {
      val m = extractFlatMap(json, "queries")
      val covered = selected.count(m.contains)
      if (selected.nonEmpty && covered * 10 < selected.size * 9) Map.empty else m
    }

  /** Merge a current per-query map over the same-named map of an
    * existing same-sf detail file: existing keys survive, current
    * values win. Cross-sf or unparseable files merge nothing.
    */
  private[graft] def mergeMap(
      existingJson: Option[String],
      sfDir: String,
      key: String,
      cur: Map[String, Double]): Map[String, Double] = {
    val prior = existingJson
      .filter(_.contains(s""""sf":"$sfDir""""))
      .map(extractFlatMap(_, key))
      .getOrElse(Map.empty)
    prior ++ cur
  }

  /** `queries` map of the previously committed bench_detail.json when
    * it exists in the working directory, records the same sf dir,
    * carries the current format stamp, and covers ≥90% of `selected`;
    * empty otherwise (see [[priorFromJson]]).
    */
  private def priorDetailQueries(sfDir: String, selected: Set[String]): Map[String, Double] =
    try {
      val p = java.nio.file.Paths.get("bench_detail.json")
      if (!java.nio.file.Files.exists(p)) Map.empty
      else
        priorFromJson(
          new String(java.nio.file.Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8),
          sfDir,
          selected)
    } catch { case _: Exception => Map.empty }
}
