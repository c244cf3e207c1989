package graft

import graft.streaming.Streams
import graft.streaming.Streams.{Event, Session}
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming behavior: incremental ingest parity with the
  * batch pipeline, watermarked window finalization + late-data drop,
  * and gap sessionization via flatMapGroupsWithState.
  */
class StreamsSpec extends SparkSpec {

  private def ts(minutes: Int): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  test("incremental ingest: staged envelope files stream through normalize exactly once") {
    val staging = Files.createTempDirectory("graft-staging")
    val out = Files.createTempDirectory("graft-stream-out").resolve("data")
    val ckpt = Files.createTempDirectory("graft-ckpt")

    def stage(name: String, rows: String): Unit =
      Files.writeString(
        staging.resolve(name),
        s"""{"resultado":[$rows],"totalRegistros":9,"links":["self"]}""")

    stage("a.json", """{"id":1,"v":"x"},{"id":2,"v":"y"}""")
    stage("b.json", """{"id":3,"v":"z"}""")

    val schema = graft.etl.Normalize
      .readEnvelope(spark, staging.resolve("a.json").toString)
      .schema

    def runOnce(): Unit = {
      val q = Streams.incrementalIngest(
        spark, staging.toString, schema, Some("resultado"),
        out.toString, ckpt.toString)
      q.awaitTermination()
    }
    runOnce()
    val first = spark.read.parquet(out.toString)
    assert(first.columns.sorted.toSeq == Seq("id", "v"))
    assert(first.count() == 3)

    // a third file arrives; only IT should be appended on the next run
    stage("c.json", """{"id":4,"v":"w"},{"id":5,"v":"q"}""")
    runOnce()
    val second = spark.read.parquet(out.toString)
    assert(second.count() == 5)
    assert(second.select(sum("id")).head().getLong(0) == 15L)
  }

  test("windowed counts: watermark finalizes windows and drops late data") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val agg = Streams.windowedEventCounts(
      in.toDF().toDF("ts", "event_type", "value"),
      watermarkDelay = "10 minutes",
      windowLength = "1 hour")
    val q = agg.writeStream
      .format("memory")
      .queryName("win_counts")
      .outputMode("append")
      .start()
    try {
      // two events in the 00:00-01:00 window
      in.addData((ts(5), "click", 1.0), (ts(20), "click", 2.0))
      q.processAllAvailable()
      // nothing finalized yet (watermark still inside the window)
      assert(spark.table("win_counts").count() == 0)

      // an event far ahead advances the watermark past the first window
      in.addData((ts(180), "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[String]("event_type") == "click")
      assert(rows.head.getAs[Long]("n") == 2L)

      // a late event behind the watermark is dropped, not re-emitted
      in.addData((ts(25), "click", 9.0))
      q.processAllAvailable()
      assert(spark.table("win_counts").count() == 1)
    } finally q.stop()
  }

  test("stream-stream join: purchases match in-window clicks only, state stays bounded") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val joined = Streams.clickAttribution(
      clicks.toDF().toDF("user_id", "event_id", "ts"),
      purchases.toDF().toDF("user_id", "event_id", "ts"),
      watermarkDelay = "5 minutes",
      attributionWindow = "30 minutes")
    val q = joined.writeStream
      .format("memory")
      .queryName("attrib")
      .outputMode("append")
      .start()
    try {
      // user 1 clicks at t0 and t10; purchases at t20 (within 30 min of
      // both clicks) and t50 (40+ min after both → matches neither);
      // user 2 purchases with no click at all.
      clicks.addData((1L, 100L, ts(0)), (1L, 101L, ts(10)))
      purchases.addData((1L, 200L, ts(20)), (1L, 201L, ts(50)), (2L, 202L, ts(20)))
      q.processAllAvailable()
      // advance both watermarks so results finalize (distinct users so
      // the sentinels can't join with each other)
      clicks.addData((8L, 999L, ts(600)))
      purchases.addData((9L, 998L, ts(600)))
      q.processAllAvailable()
      val rows = spark.table("attrib")
        .select("purchase_id", "click_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      // t20 purchase matches both clicks (100, 101); t50 and user-2
      // purchases match nothing
      assert(rows == Set((200L, 100L), (200L, 101L)), s"got $rows")
    } finally q.stop()
  }

  test("outer stream-stream join: unattributed purchases emit null clicks after the watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val joined = Streams.clickAttribution(
      clicks.toDF().toDF("user_id", "event_id", "ts"),
      purchases.toDF().toDF("user_id", "event_id", "ts"),
      watermarkDelay = "5 minutes",
      attributionWindow = "30 minutes",
      joinType = "rightOuter")
    val q = joined.writeStream
      .format("memory")
      .queryName("attrib_outer")
      .outputMode("append")
      .start()
    try {
      clicks.addData((1L, 100L, ts(0)))
      // user 1 purchase within window (matches); user 2 purchase with
      // no click ever (must still emit, with nulls, once finalized)
      purchases.addData((1L, 200L, ts(20)), (2L, 201L, ts(20)))
      q.processAllAvailable()
      val early = spark.table("attrib_outer")
        .filter(col("purchase_id") === 201L).count()
      assert(early == 0L,
        "unmatched purchase must not emit before the click watermark passes its range")
      // push both watermarks far past the join range
      clicks.addData((8L, 999L, ts(600)))
      purchases.addData((9L, 998L, ts(600)))
      q.processAllAvailable()
      val rows = spark.table("attrib_outer")
        .select("purchase_id", "click_id")
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
      assert(rows == Set((200L, 100L), (201L, -1L)), s"got $rows")
    } finally q.stop()
  }

  test("streaming dedup: duplicate keys within the watermark emit once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = Streams
      .streamingDedup(
        in.toDF().toDF("doc_id", "ts", "text"),
        Seq("doc_id"),
        watermarkDelay = "10 minutes")
      .writeStream
      .format("memory")
      .queryName("dedup_stream")
      .outputMode("append")
      .start()
    try {
      in.addData((1L, ts(0), "a"), (2L, ts(1), "b"), (1L, ts(2), "a-dup"))
      q.processAllAvailable()
      in.addData((1L, ts(5), "a-dup2"), (3L, ts(6), "c"))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("transformWithState: per-user running totals accumulate across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // transformWithState stores each state variable in its own column
    // family — RocksDB provider required (HDFS-backed can't do CFs)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[(Long, Double)]
    val q = Streams.runningTotals(in.toDS())
      .writeStream
      .format("memory")
      .queryName("running_totals")
      .outputMode("update")
      .start()
    try {
      in.addData((1L, 10.0), (1L, 5.0), (2L, 1.0))
      q.processAllAvailable()
      in.addData((1L, 2.5), (3L, 7.0))
      q.processAllAvailable()
      // update mode: keep the LAST emission per user
      val latest = spark.table("running_totals").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
      assert(latest == Map(
        1L -> ((3L, 17.5)), // state carried across the two batches
        2L -> ((1L, 1.0)),
        3L -> ((1L, 7.0))))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming near-dup gate flags copies across batches, passes unique docs") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val nearCopy = (1 to 60).map(i => if (i == 30) "CHANGED" else s"token$i").mkString(" ")
    val unrelated = (1 to 60).map(i => s"other${i * 7}").mkString(" ")
    val in = MemoryStream[(Long, String)]
    val q = Streams
      .streamingNearDupGate(in.toDF().toDF("doc_id", "text"))
      .writeStream
      .format("memory")
      .queryName("neardup_gate")
      .outputMode("update")
      .start()
    try {
      in.addData((1L, base), (2L, unrelated))
      q.processAllAvailable()
      // batch 2: an exact copy and a near copy of doc 1, plus a fresh doc
      in.addData((3L, base), (4L, nearCopy), (5L, (1 to 60).map(i => s"fresh$i").mkString(" ")))
      q.processAllAvailable()
      val hits = spark.table("neardup_gate").as[(Long, Int, Long)].collect()
      val byDoc = hits.groupBy(_._1)
      // the exact copy collides in EVERY band, always against doc 1
      assert(byDoc.get(3L).exists(_.length == 32), s"exact copy hits: ${byDoc.get(3L).map(_.length)}")
      assert(byDoc(3L).forall(_._3 == 1L))
      // the near copy (59/60 tokens shared) collides in >=1 band
      assert(byDoc.contains(4L), "near copy must hit at least one bucket")
      assert(byDoc(4L).forall(_._3 == 1L))
      // unique docs never collide — cross-batch state held doc 1/2's buckets
      assert(!byDoc.contains(1L) && !byDoc.contains(2L) && !byDoc.contains(5L))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("near-dup gate: a LOWER doc_id arriving at an occupied bucket still emits the collision") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val in = MemoryStream[(Long, String)]
    val q = Streams
      .streamingNearDupGate(in.toDF().toDF("doc_id", "text"))
      .writeStream
      .format("memory")
      .queryName("neardup_gate_ooo")
      .outputMode("update")
      .start()
    try {
      // doc 5 registers the buckets first; its exact copy doc 0 arrives
      // LATER with a smaller id, displacing the representative. Round 4
      // dropped this collision entirely (emissions depended on arrival
      // order); now the displaced occupant must be emitted against the
      // new representative in every band.
      in.addData((5L, base))
      q.processAllAvailable()
      in.addData((0L, base))
      q.processAllAvailable()
      val hits = spark.table("neardup_gate_ooo").as[(Long, Int, Long)].collect()
      assert(hits.nonEmpty, "out-of-order copy must still produce collisions")
      // displaced representative 5 emitted against new representative 0
      assert(hits.count(h => h._1 == 5L && h._3 == 0L) == 32,
        s"displaced occupant must collide in every band: ${hits.toSeq}")
      // the covered pair set is exactly {0,5} in some orientation
      assert(hits.forall(h => Set(h._1, h._3) == Set(0L, 5L)), s"got ${hits.toSeq}")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("near-dup gate state survives a query restart from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-gate-ckpt").toString
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val in = MemoryStream[(Long, String)]
    StreamsSpecGateBuf.hits.clear()
    def start() = Streams
      .streamingNearDupGate(in.toDF().toDF("doc_id", "text"))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[Streams.BandHit], _: Long) =>
        StreamsSpecGateBuf.hits ++= ds.collect()
        ()
      }
      .start()
    try {
      // run 1: the original registers its buckets, then the query dies
      val q1 = start()
      in.addData((1L, base))
      q1.processAllAvailable()
      q1.stop()
      assert(StreamsSpecGateBuf.hits.isEmpty, "the original must not self-collide")
      // run 2, same checkpoint: an exact copy arrives AFTER the restart —
      // it must collide against state recovered from the RocksDB store
      val q2 = start()
      in.addData((2L, base))
      q2.processAllAvailable()
      q2.stop()
      val hits = StreamsSpecGateBuf.hits.toSeq
      assert(hits.nonEmpty, "copy must collide against recovered bucket state")
      assert(hits.forall(h => h.doc_id == 2L && h.rep_doc_id == 1L),
        s"collisions must point at the pre-restart representative: $hits")
      assert(hits.length == 32, s"exact copy collides in every band: ${hits.length}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("custom streaming source feeds the cleaning stack end-to-end") {
    // SynthDocs micro-batches → quality gate → per-lang accounting:
    // the engine's own connector driving the engine's own operators
    val counts = spark.readStream
      .format("graft.sources.SynthDocs")
      .option("rows", "400")
      .option("partitions", "4")
      .option("rowsPerBatch", "150")
      .load()
      .filter(size(split(col("text"), " ")) >= 10) // quality gate
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"))
    val q = counts.writeStream
      .format("memory")
      .queryName("clean_feed")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("clean_feed").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // must equal the batch computation over the same generator
      val expected = spark.read
        .format("graft.sources.SynthDocs")
        .option("rows", "400").option("partitions", "4").load()
        .filter(size(split(col("text"), " ")) >= 10)
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"stream=$got batch=$expected")
    } finally q.stop()
  }

  test("stream-static enrichment: feed rows gain dim columns, missing keys survive") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "trial")).toDF("user_id", "segment")
    val in = MemoryStream[(Long, Long, Double)]
    val q = Streams
      .enrichStream(in.toDF().toDF("event_id", "user_id", "value"), dim, Seq("user_id"))
      .writeStream
      .format("memory")
      .queryName("enriched")
      .outputMode("append")
      .start()
    try {
      in.addData((10L, 1L, 5.0), (11L, 2L, 6.0), (12L, 7L, 7.0))
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select("event_id", "segment").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(rows == Map(10L -> Some("gold"), 11L -> Some("trial"), 12L -> None))
    } finally q.stop()
  }

  test("as-of enrichment: latest version at event time wins across watermark advances") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = MemoryStream[(Long, Timestamp, Double)]
    val dims = MemoryStream[(Long, Timestamp, String)]
    val q = Streams
      .asOfEnrich(
        events.toDF().toDF("key", "ts", "payload"),
        dims.toDF().toDF("key", "ts", "attr"),
        watermarkDelay = "5 minutes")
      .writeStream
      .format("memory")
      .queryName("asof")
      .outputMode("append")
      .start()
    try {
      // version A in force from t0; events at t15 (key 1) and t15
      // (key 2, which has NO dimension at all)
      dims.addData((1L, ts(0), "A"))
      events.addData((1L, ts(15), 1.0), (2L, ts(15), 9.0))
      q.processAllAvailable()
      // watermark (15-5=10) hasn't passed the events: nothing final
      assert(spark.table("asof").count() == 0, "events must buffer until the watermark passes them")

      // a version arriving AFTER the event row but timestamped BEFORE
      // it (t12 < t15) — as-of must pick it over A, which is the whole
      // point of holding emission until the watermark
      dims.addData((1L, ts(12), "B"))
      q.processAllAvailable()
      assert(spark.table("asof").count() == 0)

      // sentinel advances the watermark past t15 → both events finalize
      events.addData((99L, ts(60), 0.0))
      q.processAllAvailable()
      val first = spark.table("asof")
        .filter(col("key") < 99)
        .collect()
        .map(r => (r.getLong(0), Option(r.getString(3)), Option(r.getTimestamp(4))))
        .toSet
      assert(
        first == Set(
          (1L, Some("B"), Some(ts(12))),
          (2L, None, None)),
        s"got $first")

      // next cycle (above the advanced watermark of 55): version C@t70
      // then an event at t75 → C wins over the retained B; the
      // evicted-versions invariant (only latest <= W kept) must not
      // have dropped anything reachable
      dims.addData((1L, ts(70), "C"))
      events.addData((1L, ts(75), 2.0))
      q.processAllAvailable()
      events.addData((99L, ts(150), 0.0))
      q.processAllAvailable()
      val second = spark.table("asof")
        .filter(col("key") === 1 && col("payload") === 2.0)
        .collect()
        .map(r => (Option(r.getString(3)), Option(r.getTimestamp(4))))
        .toSet
      assert(second == Set((Some("C"), Some(ts(70)))), s"got $second")
    } finally q.stop()
  }

  test("sessionization: gap closes a session, state emits once, new session opens") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams
      .sessionize(in.toDS(), gapMinutes = 30, watermarkDelay = "5 minutes")
      .writeStream
      .format("memory")
      .queryName("sessions")
      .outputMode("append")
      .start()
    try {
      // user 1: two events 10 min apart (one session), then a 60-min gap
      in.addData(
        Event(1L, ts(0), "click"),
        Event(1L, ts(10), "view"),
        Event(1L, ts(70), "click"))
      q.processAllAvailable()
      // second batch far ahead advances watermark → first session times out
      in.addData(Event(2L, ts(300), "click"))
      q.processAllAvailable()
      val sessions = spark.table("sessions").as[Session].collect()
      val u1 = sessions.filter(_.user_id == 1L)
      assert(u1.exists(s =>
        s.session_start == ts(0) && s.session_end == ts(10) && s.n_events == 2),
        s"got ${u1.mkString(", ")}")
    } finally q.stop()
  }

  test("delivery-contract violations bump the LateArrivals counters; in-order stays silent") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    Streams.LateArrivals.reset("last_touch")
    Streams.LateArrivals.reset("funnel")
    val in = MemoryStream[Streams.TouchEvent]
    val q = Streams
      .streamingAttributionGate(in.toDS())
      .writeStream.format("memory").queryName("late_counter_attr")
      .outputMode("update").start()
    try {
      // in-order: touch at t=100, purchase at t=200 -> no late rows
      in.addData(Streams.TouchEvent(1L, 100L, 1L, Some("email"), None))
      q.processAllAvailable()
      in.addData(Streams.TouchEvent(1L, 200L, 2L, None, Some(500L)))
      q.processAllAvailable()
      assert(Streams.LateArrivals.count("last_touch") == 0L,
        "ordered delivery must not count as late")
      // a touch OLDER than the retained state arrives in a later
      // trigger: silently dropped before, now counted
      in.addData(Streams.TouchEvent(1L, 50L, 3L, Some("social"), None))
      q.processAllAvailable()
      assert(Streams.LateArrivals.count("last_touch") == 1L,
        "out-of-order touch must bump the counter")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      Streams.LateArrivals.reset("last_touch")
    }
  }
}

/** Streaming-vs-batch consistency on the real events table: the same
  * windowed aggregate over a bounded file stream (AvailableNow) must
  * account for every batch row.
  */
class StreamBatchParitySpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("windowed counts over a file stream equal the batch totals") {
    val batch = graft.ops.Tables.events(spark, Sf)
    val schema = spark.read
      .option("mergeSchema", "false")
      .parquet(s"$Sf/events.parquet")
      .schema

    // file streams require a directory source
    val dir = java.nio.file.Files.createTempDirectory("graft-parity")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf/events.parquet"),
      dir.resolve("events.parquet"))

    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val events = schema("ts").dataType.typeName match {
      case "long" => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case "timestamp_ntz" =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }

    val q = graft.streaming.Streams
      .windowedEventCounts(events, watermarkDelay = "1 minute", windowLength = "1 hour")
      .writeStream
      .format("memory")
      .queryName("parity_counts")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("parity_counts")
    assert(streamed.agg(sum("n")).head().getLong(0) == batch.count())
    // per-type totals agree with the batch group-by
    val sTypes = streamed.groupBy("event_type").agg(sum("n").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bTypes = batch.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sTypes == bTypes)
  }

  test("incremental corpus clean: shards dedup against the corpus-so-far via foreachBatch") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft-inc-in")
    val out = java.nio.file.Files.createTempDirectory("graft-inc-out").resolve("corpus")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-inc-ckpt")

    def doc(id: Long, words: Int, tag: String): (Long, String) =
      id -> Seq.tabulate(words)(i => s"$tag${i % 7}").mkString(" ")

    // shard 1: two keepers + one below the quality gate
    val s1 = Seq(doc(1, 30, "a"), doc(2, 40, "b"), doc(3, 5, "tiny"))
    // shard 2: one new keeper, one exact dup of shard 1's doc 1, one in-shard dup pair
    val s2 = Seq(doc(4, 35, "c"), doc(5, 30, "a"), doc(6, 28, "d"), doc(7, 28, "d"))
    s1.toDF("doc_id", "text").repartition(1).write.parquet(in.resolve("p1").toString)
    s2.toDF("doc_id", "text").repartition(1).write.parquet(in.resolve("p2").toString)

    val schema = spark.read.parquet(in.resolve("p1").toString).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in.toString + "/*")
    val q = graft.streaming.Streams
      .incrementalCorpusClean(spark, stream, out.toString, ckpt.toString)
    q.awaitTermination()

    val corpus = spark.read.parquet(out.toString)
    val fps = corpus.select("fp").collect().map(_.getString(0))
    assert(fps.length == fps.distinct.length, "corpus contains duplicate fingerprints")
    // quality gate dropped doc 3; cross-shard dup (5≡1) and one of the
    // in-shard pair (6,7) dropped — 4 distinct texts survive
    assert(corpus.count() == 4, corpus.select("doc_id", "text").collect().mkString(", "))
    val texts = corpus.select("text").collect().map(_.getString(0)).toSet
    assert(texts == (s1.take(2) ++ s2.take(1) :+ doc(6, 28, "d")).map(_._2).toSet)
  }

  test("streaming heavy-hitter gate matches an exact CMS simulation; heavy keys never missed") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val threshold = 5L
    // batch 1: user 1 ×3, user 3 ×6 (crosses in-batch), noise keys once each
    // batch 2: user 1 ×4 (crosses cumulatively), user 2 ×4 (stays below)
    val b1 = Seq.fill(3)(1L) ++ Seq.fill(6)(3L) ++ (100L to 119L)
    val b2 = Seq.fill(4)(1L) ++ Seq.fill(4)(2L)
    val in = MemoryStream[Long]
    val q = graft.streaming.Streams
      .streamingHeavyHitterGate(in.toDF().toDF("user_id"), threshold)
      .writeStream
      .format("memory")
      .queryName("heavy_gate")
      .outputMode("update")
      .start()
    try {
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      val got = spark.table("heavy_gate").as[(Long, Long)].collect().toSet

      // exact simulation of the processor over the same batch splits
      import graft.ops.Relational.{cmsBucket, CmsHashes, CmsWidth}
      val cells = scala.collection.mutable.Map
        .empty[Int, Array[Long]] // shard -> d×w
      val flaggedSim = scala.collection.mutable.Set.empty[Long]
      val expected = scala.collection.mutable.Set.empty[(Long, Long)]
      Seq(b1, b2).foreach { batch =>
        batch.groupBy(k => (k % 32).toInt).foreach { case (shard, ks) =>
          val arr = cells.getOrElseUpdate(
            shard, new Array[Long](CmsHashes.length * CmsWidth))
          val m = ks.groupBy(identity).view.mapValues(_.size.toLong)
          m.foreach { case (k, n) =>
            CmsHashes.foreach { case (d, a, b) =>
              arr(d * CmsWidth + cmsBucket(a, b, k)) += n
            }
          }
          m.keys.toSeq.sorted.foreach { k =>
            val est = CmsHashes.map { case (d, a, b) =>
              arr(d * CmsWidth + cmsBucket(a, b, k))
            }.min
            if (est >= threshold && !flaggedSim(k)) {
              flaggedSim += k
              expected += ((k, est))
            }
          }
        }
      }
      assert(got == expected.toSet, s"got $got expected $expected")
      // the one-sided guarantee: truly-heavy keys are always flagged
      val exactCounts = (b1 ++ b2).groupBy(identity).view.mapValues(_.size)
      exactCounts.filter(_._2 >= threshold).keys.foreach { k =>
        assert(got.exists(_._1 == k), s"heavy key $k was never flagged")
      }
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("cmsBucket stays in [0, w) for negative and wrap-range keys (all surfaces agree)") {
    import graft.ops.Relational.{cmsBucket, CmsHashes, CmsPrime, CmsWidth}
    // Long.MinValue, below-zero, above-p, and the ~8.4e9 class where a
    // raw key*a wraps Long — the keys that turned the bucket negative
    // before the reduce-first/floorMod fix.
    val keys = Seq(Long.MinValue, -8400000000L, -7L, -1L, 0L, 1L,
      CmsPrime - 1, CmsPrime, 8400000000L, Long.MaxValue)
    for (k <- keys; (_, a, b) <- CmsHashes) {
      val bkt = cmsBucket(a, b, k)
      assert(bkt >= 0 && bkt < CmsWidth, s"bucket $bkt out of range for key=$k a=$a")
    }
    // and the Column algebra lands in the same cell as the scalar twin
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = keys.toDF("k")
    CmsHashes.foreach { case (_, a, b) =>
      val got = df
        .select(
          col("k"),
          (pmod(pmod(col("k"), lit(CmsPrime)) * lit(a) + lit(b), lit(CmsPrime)) %
            lit(CmsWidth.toLong)).as("bucket"))
        .as[(Long, Long)]
        .collect()
        .toMap
      keys.foreach { k =>
        assert(got(k) == cmsBucket(a, b, k), s"column/scalar cell mismatch key=$k a=$a")
      }
    }
  }

  test("heavy-hitter gate survives negative keys (no negative array index)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Long]
    val q = graft.streaming.Streams
      .streamingHeavyHitterGate(in.toDF().toDF("user_id"), threshold = 4L)
      .writeStream
      .format("memory")
      .queryName("neg_gate")
      .outputMode("update")
      .start()
    try {
      in.addData(Seq.fill(5)(-7L) ++ Seq.fill(5)(8400000000L) ++ (-120L to -100L))
      q.processAllAvailable()
      val got = spark.table("neg_gate").as[(Long, Long)].collect().toMap
      assert(got.contains(-7L), s"heavy negative key not flagged: $got")
      assert(got.contains(8400000000L), s"heavy wrap-range key not flagged: $got")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("decontamination gate matches the batch Bloom verdicts, no false negatives") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.ops.Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val evalSide = docs.filter(col("doc_id") % 10 === 0).select(col("text"))
    val trainRows = docs.filter(col("doc_id") % 10 =!= 0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // stream the training side in two batches through the stateless gate
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.Streams
      .streamingDecontaminationGate(in.toDF().toDF("doc_id", "text"), evalSide)
      .writeStream
      .format("memory")
      .queryName("decon_gate")
      .outputMode("append")
      .start()
    val got =
      try {
        in.addData(trainRows.filter(_._1 % 2 == 0).toSeq); q.processAllAvailable()
        in.addData(trainRows.filter(_._1 % 2 == 1).toSeq); q.processAllAvailable()
        spark.table("decon_gate").collect()
          .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
      } finally q.stop()
    // batch ground truth: identical position algebra over the same split
    val posSet = {
      val hashes = graft.ops.Relational.CmsHashes.take(3).map { case (_, a, b) => (a, b) }
      val fs = evalSide
        .select(explode(graft.functions.RollingFingerprints
          .rollingFingerprints(split(col("text"), " "), 8)).as("f"))
        .distinct().collect().map(_.getLong(0))
      fs.flatMap(f => hashes.map { case (a, b) => ((f * a + b) % 1000000007L) % 1048576L }).toSet
    }
    val hashes = graft.ops.Relational.CmsHashes.take(3).map { case (_, a, b) => (a, b) }
    val trainFps = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), graft.functions.RollingFingerprints
        .rollingFingerprints(split(col("text"), " "), 8).as("fs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    val evalFpSet = evalSide
      .select(explode(graft.functions.RollingFingerprints
        .rollingFingerprints(split(col("text"), " "), 8)).as("f"))
      .distinct().collect().map(_.getLong(0)).toSet
    trainFps.foreach { case (id, fps) =>
      val expected = fps.count(f =>
        hashes.forall { case (a, b) => posSet(((f * a + b) % 1000000007L) % 1048576L) })
      assert(got(id)._1 == expected, s"doc $id: gate flagged ${got(id)._1}, batch says $expected")
      assert(got(id)._2 == (expected > 0))
      // one-sided guarantee: any TRUE shared shingle must be flagged
      if (fps.exists(evalFpSet))
        assert(got(id)._2, s"doc $id shares a real shingle but passed the gate")
    }
    assert(got.size == trainFps.length, "one verdict row per streamed doc")
  }

  test("near-dup gate matches batch d2 candidate components across two batch splits") {
    // The gate's per-bucket hit graph is star-shaped around the (mutable)
    // representative, so the EDGE set legitimately varies with arrival
    // order; the order-free invariant the displacement rule guarantees is
    // CONNECTIVITY — every multi-occupied bucket's docs form one connected
    // hit component. Batch d2's candidate graph is a clique per bucket, so
    // the two graphs must have identical connected components over the
    // same corpus, for ANY batch split. Pin it for two different splits.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docs = graft.ops.Tables.documents(spark, Sf)
        .select(col("doc_id"), col("text"))
        .filter(size(split(col("text"), " ")) >= 3)
      // batch candidate graph: the same sig/band arithmetic the gate uses
      val banded = docs
        .select(
          col("doc_id"),
          graft.functions.MinHashFromHashes
            .minhashFromHashes(
              graft.functions.WordNgramHashes
                .wordNgramHashes(split(col("text"), " "), 3),
              64)
            .as("sig"))
        .select(col("doc_id"), explode(graft.ops.Dedup.bandKeys(32, 2)).as("bk"))
      val batchPairs = banded.as("a")
        .join(banded.as("b"),
          col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"))
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batchPairs.nonEmpty, "fixture must produce band collisions")

      def components(edges: Set[(Long, Long)]): Map[Long, Long] = {
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        parent.keys.map(k => k -> find(k)).toMap
      }
      val batchComp = components(batchPairs)

      val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      val splits: Seq[Seq[Array[(Long, String)]]] = Seq(
        // split 1: two batches, high ids first (forces displacements)
        Seq(rows.filter(_._1 % 2 == 1).sortBy(-_._1), rows.filter(_._1 % 2 == 0).sortBy(-_._1)),
        // split 2: three batches by doc_id mod 3
        Seq(rows.filter(_._1 % 3 == 2), rows.filter(_._1 % 3 == 0), rows.filter(_._1 % 3 == 1)))
      splits.zipWithIndex.foreach { case (batches, i) =>
        val in = MemoryStream[(Long, String)]
        val q = graft.streaming.Streams
          .streamingNearDupGate(in.toDF().toDF("doc_id", "text"))
          .writeStream
          .format("memory")
          .queryName(s"parity_gate_$i")
          .outputMode("update")
          .start()
        try {
          batches.foreach { b => in.addData(b.toSeq); q.processAllAvailable() }
          val streamPairs = spark.table(s"parity_gate_$i")
            .select(col("doc_id"), col("rep_doc_id"))
            .collect()
            .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1))))
            .toSet
          // every stream edge is a genuine batch candidate...
          assert((streamPairs -- batchPairs).isEmpty,
            s"split $i emitted non-candidate pairs: ${(streamPairs -- batchPairs).take(5)}")
          // ...and connectivity (hence doc coverage) is identical
          assert(components(streamPairs) == batchComp,
            s"split $i: stream components diverge from batch candidate components")
        } finally q.stop()
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming KMV gate: estimates are a pure function of the set — any order, any split") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val k = 128
      val M = 1000000007L
      // (event_type, user_id) stream off the fixture, with replays
      val rows = graft.ops.Tables.events(spark, Sf)
        .select(col("event_type"), col("user_id")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      // batch reference: same KMV algebra on the distinct element sets
      val expected = rows.distinct.groupBy(_._1).map { case (g, es) =>
        // the ONE hash expression all KMV surfaces share (q79/q106/gate)
        val hs = es.map(e => ((e._2 % M) * 1103515245L + 12345L) % M)
          .distinct.sorted.take(k)
        g -> (if (hs.length < k) hs.length.toLong else ((k - 1).toLong * M) / hs.last)
      }
      val deliveries = Seq(
        ("fwd", rows.grouped(400).toSeq),
        // reversed batches AND a full replay of the first half appended
        ("rev", rows.reverse.grouped(350).toSeq ++ Seq(rows.take(rows.size / 2))))
      for ((name, batches) <- deliveries) {
        val in = MemoryStream[(String, Long)]
        val q = graft.streaming.Streams.streamingDistinctCountGate(in.toDS(), k)
          .writeStream.format("memory").queryName(s"kmv_$name")
          .outputMode("update").start()
        try {
          batches.foreach { b => in.addData(b); q.processAllAvailable() }
          // update mode: the LAST emission per group is the final state
          val got = spark.table(s"kmv_$name")
            .collect().zipWithIndex
            .groupBy(_._1.getString(0))
            .map { case (g, emits) => g -> emits.maxBy(_._2)._1.getLong(1) }
          assert(got == expected, s"$name delivery diverged from the batch KMV")
        } finally q.stop()
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming EWMA gate: final scores match the batch dyadic algebra exactly") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val horizon = 16
    // (user, epoch_day, cents) off the fixture — same cents convention
    // as batch q113 (floor(value*100+0.5))
    val rows = graft.ops.Tables.events(spark, Sf)
      .select(
        col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // batch reference: per-user daily totals, newest-first horizon,
    // exact dyadic num/den — the q113 algebra with a per-user anchor
    val expected = rows
      .groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(_._3).sum).toSeq
      .map { case ((u, d), c) => (u, d, c) }
      .groupBy(_._1).map { case (u, ds) =>
        val kept = ds.sortBy(-_._2).take(horizon)
        val num = kept.zipWithIndex.map { case ((_, _, c), j) =>
          c * (1L << (horizon - 1 - j)) }.sum
        val den = kept.indices.map(j => 1L << (horizon - 1 - j)).sum
        u -> ((kept.length, kept.head._2, num, den))
      }
    // day-ordered delivery (the documented contract): batches split by
    // day; WITHIN a day rows arrive shuffled and split across batches
    val byDay = rows.sortBy(_._2)
    val mid = byDay.count(_._2 <= byDay(byDay.size / 2)._2)
    val batches = Seq(
      byDay.take(mid).reverse, // within-horizon reordering is fine
      byDay.drop(mid).grouped(97).toSeq.flatten)
      .flatMap(b => Seq(b.take(b.size / 2), b.drop(b.size / 2)))
    val in = MemoryStream[(Long, Long, Long)]
    val q = graft.streaming.Streams.streamingEwmaGate(in.toDS(), horizon)
      .writeStream.format("memory").queryName("ewma_gate")
      .outputMode("update").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      val got = spark.table("ewma_gate")
        .collect().zipWithIndex
        .groupBy(_._1.getLong(0))
        .map { case (u, emits) =>
          val last = emits.maxBy(_._2)._1
          u -> ((last.getInt(1), last.getLong(2), last.getLong(3), last.getLong(4)))
        }
      assert(got == expected, "streaming EWMA diverged from the batch dyadic algebra")
      // the derived double is the one num/den division
      spark.table("ewma_gate").collect().foreach { r =>
        assert(r.getDouble(5) == r.getLong(3).toDouble / r.getLong(4))
      }
    } finally q.stop()
    } finally {
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("streaming CDC gate: latest image matches batch max_by under ANY arrival order") {
    import spark.implicits._
    import graft.streaming.Streams.{CdcChange, CdcImage}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // q102's synthesized log, as change events
      val o = graft.ops.Tables.orders(spark, Sf)
        .select(col("o_orderkey").as("k"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      def batchOf(seq: Long, op: String, rows: Seq[(Long, Long)]): Seq[CdcChange] =
        rows.map { case (k, c) =>
          CdcChange(k, seq, op, if (op == "D") None else Some(c))
        }
      val batches = Seq(
        batchOf(1L, "U", o.filter(_._1 % 10 == 1).map { case (k, c) => (k, c + 111L) }),
        batchOf(2L, "D", o.filter(_._1 % 20 == 2).toSeq),
        batchOf(3L, "I", o.filter(_._1 % 4 == 0).toSeq),
        batchOf(4L, "U", o.filter(_._1 % 40 == 22).map { case (k, c) => (k, c + 999L) }))
      // reference: latest image per key by SEQUENCE over the whole log
      val expected = batches.flatten
        .groupBy(_.k)
        .map { case (k, cs) =>
          val last = cs.maxBy(_.seq); k -> ((last.seq, last.op, last.cents))
        }

      // deliver in order, then in REVERSED trigger order — the
      // maintained state must be a function of the change set only
      for ((order, name) <- Seq((batches, "ordered"), (batches.reverse, "reversed"))) {
        val in = MemoryStream[CdcChange]
        val q = graft.streaming.Streams.streamingCdcGate(in.toDS())
          .writeStream.format("memory").queryName(s"cdc_$name")
          .outputMode("update").start()
        try {
          order.foreach { b => in.addData(b); q.processAllAvailable() }
          val got = spark.table(s"cdc_$name").as[CdcImage].collect()
            .groupBy(_.k)
            .map { case (k, imgs) =>
              val last = imgs.maxBy(_.seq); k -> ((last.seq, last.op, last.cents))
            }
          assert(got == expected, s"$name delivery diverged from batch compaction")
        } finally q.stop()
      }
      // the semantics the log was built to pin: deletes tombstone,
      // later updates resurrect
      val deletedStay = o.filter(t => t._1 % 20 == 2 && t._1 % 40 != 22).map(_._1)
      val resurrected = o.filter(_._1 % 40 == 22).map(_._1)
      assert(deletedStay.nonEmpty && resurrected.nonEmpty, "fixture must cover both paths")
      deletedStay.foreach(k => assert(expected(k)._2 == "D"))
      resurrected.foreach(k => assert(expected(k)._2 == "U" && expected(k)._3.isDefined))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming as-of enrich matches the batch AsOfJoin operator on the fixture") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // split the real events table into an event stream and a derived
    // dimension-version stream (every 5th event becomes a version);
    // versions dedup per (key, micros) so the as-of tie is unambiguous
    // on BOTH surfaces (AsOfJoinExec tie-breaks same-(key,time) rows
    // arbitrarily, by documented contract)
    val raw = graft.ops.Tables.events(spark, Sf)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
      .collect()
    def us(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    val dimRows = raw.filter(_.getLong(0) % 5 == 0)
      .map(r => (r.getLong(1), r.getTimestamp(2), r.getString(3)))
      .groupBy(t => (t._1, us(t._2))).map(_._2.maxBy(_._3)).toSeq
    val evRows = raw.filter(_.getLong(0) % 5 != 0)
      .map(r => (r.getLong(1), r.getTimestamp(2), r.getDouble(4))).toSeq

    // batch twin: the custom AsOfJoinExec over epoch micros
    graft.plans.GraftExtensions.install(spark)
    val evDf = evRows.toDF("key", "ts", "payload")
      .select(col("key").as("e_key"), unix_micros(col("ts")).as("e_us"), col("payload"))
    val dimDf = dimRows.toDF("key", "ts", "attr")
      .select(col("key").as("v_key"), unix_micros(col("ts")).as("v_us"), col("attr"))
    val expected = graft.plans.AsOfJoin(evDf, dimDf, "e_key", "v_key", "e_us", "v_us")
      .select(col("e_key"), col("e_us"), col("payload"), col("attr"), col("v_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        Option(r.getString(3)), if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .groupBy(identity).view.mapValues(_.size).toMap

    val events = MemoryStream[(Long, Timestamp, Double)]
    val dims = MemoryStream[(Long, Timestamp, String)]
    val q = graft.streaming.Streams
      .asOfEnrich(
        events.toDF().toDF("key", "ts", "payload"),
        dims.toDF().toDF("key", "ts", "attr"),
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("asof_parity")
      .outputMode("append").start()
    try {
      // one batch holds everything — no row can be late-dropped, so the
      // comparison is about SEMANTICS, not delivery accidents
      events.addData(evRows)
      dims.addData(dimRows)
      q.processAllAvailable()
      // sentinel dim far past max(ts)+delay finalizes every event;
      // dims alone emit nothing, and we exclude its key anyway
      val maxTs = raw.map(r => r.getTimestamp(2).getTime).max
      dims.addData((-1L, new Timestamp(maxTs + 3600L * 1000L), "Z"))
      q.processAllAvailable()
      val got = spark.table("asof_parity")
        .filter(col("key") =!= -1L)
        .collect()
        .map(r => (r.getLong(0), us(r.getTimestamp(1)), r.getDouble(2),
          Option(r.getString(3)), Option(r.getTimestamp(4)).map(us)))
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(got == expected,
        s"stream != batch; only-stream=${(got.keySet -- expected.keySet).take(3)}, " +
          s"only-batch=${(expected.keySet -- got.keySet).take(3)}")
    } finally q.stop()
  }

  test("streaming sessionize matches the batch gap-window formulation on the fixture") {
    import spark.implicits._
    import graft.streaming.Streams.{Event, Session}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val gapMin = 30
    val evDf = graft.ops.Tables.events(spark, Sf)
      .select(col("user_id"), col("ts"), col("event_type"))

    // batch twin — q17's lag/gap shape in exact micros, emitting one
    // row PER SESSION so the compare pins starts/ends, not just counts
    val byTime = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"))
    val expected = evDf
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev", lag(col("us"), 1).over(byTime))
      .withColumn(
        "new_s",
        when(col("prev").isNull || col("us") - col("prev") > gapMin * 60L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn(
        "sid",
        sum(col("new_s")).over(
          byTime.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("us")).as("s"), max(col("us")).as("e"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

    def us(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    val rows = evDf.collect()
      .map(r => Event(r.getLong(0), r.getTimestamp(1), r.getString(2)))
      .sortBy(e => us(e.ts)) // event-time order: nothing can be late-dropped
    val in = MemoryStream[Event]
    val q = graft.streaming.Streams
      .sessionize(in.toDS(), gapMinutes = gapMin, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sess_parity")
      .outputMode("append").start()
    try {
      rows.grouped(400).foreach { b => in.addData(b.toSeq); q.processAllAvailable() }
      // sentinel advances the watermark past every last+gap → all real
      // sessions close via their event-time timers
      val far = new Timestamp(rows.last.ts.getTime + 6L * 3600L * 1000L)
      in.addData(Event(-1L, far, "x"))
      q.processAllAvailable()
      val got = spark.table("sess_parity").as[Session].collect()
        .filter(_.user_id != -1L)
        .map(s => (s.user_id, us(s.session_start), us(s.session_end), s.n_events.toLong))
        .toSet
      assert(got == expected,
        s"stream != batch; only-stream=${(got -- expected).take(3)}, " +
          s"only-batch=${(expected -- got).take(3)}")
    } finally q.stop()
  }

  test("streaming last-touch attribution matches batch q122 per purchase on the fixture") {
    import spark.implicits._
    import graft.streaming.Streams.{Attribution, TouchEvent}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evDf = graft.ops.Tables.events(spark, Sf)
      .filter(col("event_type").isin("click", "view", "purchase"))
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("us"),
        col("event_id"),
        col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))

    // batch twin — q122's merged-stream window at PER-PURCHASE
    // granularity, so the compare pins each attribution, not just the
    // channel rollup
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val sevenDaysUs = 7L * 86400L * 1000000L
    val expected = evDf
      .withColumn(
        "touch",
        when(col("event_type").isin("click", "view"), col("event_type")))
      .withColumn("last_touch", last(col("touch"), ignoreNulls = true).over(w))
      .withColumn(
        "last_us",
        last(when(col("touch").isNotNull, col("us")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn(
        "channel",
        when(
          col("last_touch").isNull || col("last_us") < col("us") - sevenDaysUs,
          lit("none")).otherwise(col("last_touch")))
      .select(col("user_id"), col("event_id"), col("channel"), col("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet

    val rows = evDf.collect()
      .map { r =>
        val et = r.getString(3)
        TouchEvent(
          r.getLong(0),
          r.getLong(1),
          r.getLong(2),
          if (et == "purchase") None else Some(et),
          if (et == "purchase") Some(r.getLong(4)) else None)
      }
      .sortBy(e => (e.ts_us, e.event_id)) // the gate's delivery contract
    // transformWithState needs the RocksDB provider (column families)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[TouchEvent]
    val q = Streams
      .streamingAttributionGate(in.toDS())
      .writeStream.format("memory").queryName("attr_parity")
      .outputMode("update").start()
    try {
      rows.grouped(500).foreach { b => in.addData(b.toSeq); q.processAllAvailable() }
      val got = spark.table("attr_parity").as[Attribution].collect()
        .map(a => (a.user_id, a.event_id, a.channel, a.cents))
        .toSet
      assert(got == expected,
        s"stream != batch; only-stream=${(got -- expected).take(3)}, " +
          s"only-batch=${(expected -- got).take(3)}")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming PSI gate's final table matches batch q141 on the fixture") {
    import spark.implicits._
    import graft.streaming.Streams.PsiBucket
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // reference = first half (q141's construction), live = second half
    val mid = graft.ops.Tables.events(spark, Sf)
      .agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
      .selectExpr("date_add(d0, CAST(datediff(d1, d0) div 2 AS INT)) AS mid")
      .head.getDate(0)
    val e = graft.ops.Tables.events(spark, Sf)
      .select(
        floor(col("value") * 100 + 0.5).cast("long").as("v"),
        (to_date(col("ts")) <= lit(mid)).as("in_a"))
    val bounds = e.filter(col("in_a"))
      .agg(expr("percentile(v, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"))
      .head.getSeq[Double](0).toArray
    def bucketOf(v: Long): Int = {
      var b = 0
      while (b < bounds.length && v > bounds(b)) b += 1
      b
    }
    val refCounts = Array.fill(bounds.length + 1)(0L)
    e.filter(col("in_a")).select("v").collect()
      .foreach(r => refCounts(bucketOf(r.getLong(0))) += 1L)

    val expected = graft.ops.Relational.q141PsiDrift(spark, Sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap

    val live = e.filter(!col("in_a")).select("v").collect().map(_.getLong(0))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Long]
    val q = Streams
      .streamingPsiGate(in.toDS(), bounds, refCounts)
      .writeStream.format("memory").queryName("psi_parity")
      .outputMode("update").start()
    try {
      live.grouped(500).foreach { b => in.addData(b.toSeq); q.processAllAvailable() }
      // the CURRENT table per bucket = the emission with the highest
      // live count (monotone; sink row order is not contractual)
      val got = spark.table("psi_parity").as[PsiBucket].collect()
        .groupBy(_.bucket).map { case (b, rows) => b.toLong -> rows.maxBy(_.n_live) }
      expected.foreach { case (bucket, (nf, ns, psi)) =>
        val g = got(bucket)
        assert(g.n_ref == nf, s"bucket $bucket: ref ${g.n_ref} != $nf")
        assert(g.n_live == ns, s"bucket $bucket: live ${g.n_live} != $ns")
        assert(g.psi_contrib == psi, s"bucket $bucket: psi ${g.psi_contrib} != $psi")
      }
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming anomaly gate verdicts match batch q134's flagged set on the fixture") {
    import spark.implicits._
    import graft.streaming.Streams.{AnomalyVerdict, DayTotal}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val daily = graft.ops.Tables.events(spark, Sf)
      .select(
        col("event_type"),
        to_date(col("ts")).as("day"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("c"))
      .withColumn("epoch_day", datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))

    // batch twin: q134's flagged (type, day) set
    val expectedFlagged = graft.ops.Relational.q134RollingAnomaly(spark, Sf)
      .select(
        col("event_type"),
        datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"),
        col("direction"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet
    // scored support: every day with 7 present predecessors
    val nScored = daily.collect().groupBy(_.getString(0))
      .map { case (_, rs) => math.max(0, rs.length - 7) }.sum

    val rows = daily.collect()
      .map(r => DayTotal(r.getString(0), r.getLong(3), r.getLong(2)))
      .sortBy(_.epoch_day) // the gate's delivery contract
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[DayTotal]
    val q = Streams
      .streamingAnomalyGate(in.toDS())
      .writeStream.format("memory").queryName("anomaly_parity")
      .outputMode("update").start()
    try {
      rows.grouped(25).foreach { b => in.addData(b.toSeq); q.processAllAvailable() }
      val got = spark.table("anomaly_parity").as[AnomalyVerdict].collect()
      assert(got.length == nScored, s"scored ${got.length} days, expected $nScored")
      val gotFlagged = got.filter(_.flagged)
        .map(v => (v.event_type, v.epoch_day, v.direction)).toSet
      assert(gotFlagged == expectedFlagged,
        s"stream != batch; only-stream=${(gotFlagged -- expectedFlagged).take(3)}, " +
          s"only-batch=${(expectedFlagged -- gotFlagged).take(3)}")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming funnel gate crossings match batch q120 stage timestamps and counts") {
    import spark.implicits._
    import graft.streaming.Streams.{FunnelEvent, StageCross}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evDf = graft.ops.Tables.events(spark, Sf)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))

    // batch twin — q120's per-stage min-aggregate chain at per-user
    // granularity (stage, first qualifying ts)
    val v = evDf.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("tv"))
    val c = evDf.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("us") > col("tv") && col("us") <= col("tv") + 3600000000L)
      .groupBy(col("user_id")).agg(min(col("us")).as("tc"))
    val p = evDf.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("us") > col("tc") && col("us") <= col("tc") + 24L * 3600000000L)
      .groupBy(col("user_id")).agg(min(col("us")).as("tp"))
    val expected =
      v.collect().map(r => (r.getLong(0), 1, r.getLong(1))).toSet ++
        c.collect().map(r => (r.getLong(0), 2, r.getLong(1))).toSet ++
        p.collect().map(r => (r.getLong(0), 3, r.getLong(1))).toSet

    val rows = evDf.collect()
      .map(r => FunnelEvent(r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_.ts_us) // the gate's delivery contract
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[FunnelEvent]
    val q = graft.streaming.Streams
      .streamingFunnelGate(in.toDS())
      .writeStream.format("memory").queryName("funnel_parity")
      .outputMode("update").start()
    try {
      rows.grouped(500).foreach { b => in.addData(b.toSeq); q.processAllAvailable() }
      val got = spark.table("funnel_parity").as[StageCross].collect()
        .map(sc => (sc.user_id, sc.stage, sc.ts_us))
        .toSet
      assert(got == expected,
        s"stream != batch; only-stream=${(got -- expected).take(3)}, " +
          s"only-batch=${(expected -- got).take(3)}")
      // and the live populations equal q120's published counts (a
      // stage nobody reached emits no crossings but q120 reports 0)
      val counts = got.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val q120 = graft.ops.Relational.q120FunnelWindowed(spark, Sf).collect()
        .map(r => r.getLong(0).toInt -> r.getLong(2)).toMap
      assert(q120.forall { case (stage, n) => counts.getOrElse(stage, 0L) == n },
        s"stage counts $counts != q120 $q120")
    } finally {
      q.stop()
      prev match {
        case Some(v2) => spark.conf.set(key, v2)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming wallet gate replays q189's batch fold exactly") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // the batch twin's exact input, in the contract's event-time order
    val evs = graft.ops.Tables.events(spark, Sf)
      .filter(col("event_type").isin("signup", "click", "purchase"))
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id"),
        when(col("event_type") === "purchase",
          -floor(col("value") * 100 + 0.5).cast("long"))
          .otherwise(floor(col("value") * 100 + 0.5).cast("long")).as("delta"))
      .collect()
      .map(r => graft.streaming.Streams.WalletEvent(
        r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(e => (e.ts_us, e.event_id))
    val in = MemoryStream[graft.streaming.Streams.WalletEvent]
    val q = graft.streaming.Streams.streamingWalletGate(in.toDS())
      .writeStream
      .format("memory")
      .queryName("wallet_gate")
      .outputMode("update")
      .start()
    try {
      // two triggers split mid-history: state must carry across
      val (first, second) = evs.splitAt(evs.length / 2)
      in.addData(first.toSeq)
      q.processAllAvailable()
      in.addData(second.toSeq)
      q.processAllAvailable()
      val latest = spark.table("wallet_gate").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).maxBy(_._1) }
      val batch = graft.ops.Relational.q189ClampedBalance(spark, Sf).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      assert(latest == batch,
        "the streamed wallet snapshots must equal q189's batch rows bit-for-bit")
      assert(graft.streaming.Streams.LateArrivals.count("wallet") == 0L,
        "ordered delivery must not trip the late counter")
    } finally {
      q.stop()
      prev match {
        case Some(v2) => spark.conf.set(key, v2)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("q207 gate: the run-to-completion sessionize rollup equals its batch twin") {
    val gapUs = 30L * 60L * 1000000L
    val byTime = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"))
    val sessions = graft.ops.Tables.events(spark, Sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag(col("us"), 1).over(byTime))
      .withColumn("new_s",
        when(col("prev").isNull || col("us") - col("prev") > gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        byTime.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("us")).as("s"), max(col("us")).as("e"), count(lit(1)).as("n"))
    val umax = sessions.groupBy(col("user_id")).agg(max(col("e")).as("mx"))
    val expected = sessions
      .join(umax, "user_id")
      .filter(col("e") < col("mx")) // the gate's non-final filter
      .groupBy((col("user_id") % 10L).as("bucket"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"),
        sum(col("e") - col("s")).as("dur_us_total"), max(col("n")).as("max_session_events"))
      .orderBy("bucket")
      .collect().map(_.toString)
    val got = graft.streaming.Streams.q207StreamSessionize(spark, Sf)
      .collect().map(_.toString)
    assert(got.nonEmpty, "gate emitted no non-final sessions on the fixture")
    assert(got.sameElements(expected),
      s"gate rollup != batch twin; got=${got.take(3).mkString(";")} expected=${expected.take(3).mkString(";")}")
  }

  test("q237 gate: the streamed left-outer rollup equals the batch left join exactly") {
    val out = graft.streaming.Streams.q237StreamLeftJoin(spark, Sf).collect()
    val ev = graft.ops.Tables.events(spark, Sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .filter(col("click_ts") <= lit(java.sql.Timestamp.valueOf("2024-01-24 00:00:00")))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"), col("ts").as("pts"))
    val batch = c.join(p,
        col("user_id") === col("pu") && col("pts") >= col("click_ts") &&
          col("pts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"), "left")
      .groupBy((col("user_id") % 10L).as("bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("purchase_id").isNotNull, 1L).otherwise(0L)).as("n_matched"),
        countDistinct(col("click_id")).as("n_clicks"),
        sum(when(col("purchase_id").isNull, 1L).otherwise(0L)).as("n_orphans"))
      .orderBy("bucket")
      .collect()
    assert(out.length == batch.length, "bucket sets must agree")
    out.zip(batch).foreach { case (s, b) =>
      assert(s.getLong(0) == b.getLong(0) && s.getLong(1) == b.getLong(1) &&
        s.getLong(2) == b.getLong(2) && s.getLong(3) == b.getLong(3) &&
        s.getLong(4) == b.getLong(4), s"bucket ${s.getLong(0)} stream/batch divergence")
    }
    // the outer path must actually fire on the fixture
    assert(out.map(_.getLong(4)).sum > 0L, "expected unmatched clicks")
  }

  test("chronoFidx: file-level chronology without any Window in the plan") {
    import org.apache.spark.sql.functions._
    val ev = graft.ops.Tables
      .events(spark, Sf)
      .select(col("event_id"), col("ts"))
    val split = graft.streaming.Streams.chronoFidx(ev, unix_micros(col("ts")))
    // the round-11 feed builders planned an unpartitioned ntile Window
    // over the events fact — the replacement must plan NO Window at all
    val hasWindow = split.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(hasWindow.isEmpty, "chronoFidx must not plan a Window")
    // every row lands in a bucket, buckets partition the input
    val perBucket = split
      .groupBy(col("fidx"))
      .agg(
        count(lit(1)).as("n"),
        min(unix_micros(col("ts"))).as("mn"),
        max(unix_micros(col("ts"))).as("mx"))
      .orderBy("fidx")
      .collect()
    // FIXTURE-dependent pin, not contract (round-12 ADVICE): a skewed
    // event-time distribution could legally leave a value-range bucket
    // empty (gates stay correct — chronology and the final watermark
    // are bucket-boundary invariant). This asserts the CURRENT uniform
    // fixture still exercises the full 3-micro-batch replay depth; if
    // it ever fails on a regenerated fixture, deepen chronoFidx to
    // quantile boundaries rather than weakening the check.
    assert(perBucket.map(_.getInt(0)).toSeq == Seq(1, 2, 3), "three buckets, all occupied")
    assert(perBucket.map(_.getLong(1)).sum == ev.count(), "buckets partition the feed")
    // THE contract the order-sensitive gates rely on: every event time
    // in file k strictly precedes every event time in file k+1
    perBucket.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(3) < b.getLong(2),
          s"file ${a.getInt(0)} max ts must precede file ${b.getInt(0)} min ts")
      case _ => ()
    }
  }

  test("appendFeedFiles: one file per part, strictly increasing mtimes, contents and sort preserved") {
    import spark.implicits._
    val feed = Files.createTempDirectory("graft-feedspec").toFile
    // checkpoint-fed parts land within one clock tick — exactly the
    // regime the round-13 helper must force write-order replay for
    val parts = Seq(
      Seq((5L, "c"), (1L, "a"), (3L, "b")).toDF("k", "v").localCheckpoint(),
      Seq((9L, "z")).toDF("k", "v").localCheckpoint(),
      Seq((7L, "y"), (6L, "x")).toDF("k", "v").localCheckpoint())
    Streams.appendFeedFiles(feed, parts, sortCols = Seq(col("k")))
    val files = feed.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 3, "exactly one parquet file per part")
    // mtime order must be strict — FileStreamSource tiebreaks
    // nondeterministically on the random part names
    val byM = files.sortBy(_.lastModified)
    assert(byM.sliding(2).forall { case Array(a, b) => a.lastModified < b.lastModified },
      "mtimes strictly increase in write order")
    // the k-th oldest file holds exactly the k-th part, sorted by k
    val want = Seq(Seq(1L, 3L, 5L), Seq(9L), Seq(6L, 7L))
    byM.zip(want).foreach { case (f, ks) =>
      val got = spark.read.parquet(f.getAbsolutePath).collect().map(_.getLong(0)).toSeq
      assert(got == ks, s"file ${f.getName} rows in sorted order: got $got want $ks")
    }
    // a streaming read over the feed replays the parts in write order
    val seen = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val q = spark.readStream
      .schema("k BIGINT, v STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(feed.getAbsolutePath)
      .writeStream
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        seen.synchronized { seen += b.collect().map(_.getLong(0)).sorted.toSeq; () }
      }
      .start()
    q.awaitTermination()
    assert(seen.toSeq == Seq(Seq(1L, 3L, 5L), Seq(9L), Seq(6L, 7L)),
      "micro-batches arrive in forced-mtime write order")
  }

  test("gate state-partition scope: results partition-count independent, conf restored") {
    // the withGateParts contract behind every Streams.queries entry
    // (round 13): the scoped shuffle-partition count is a pure
    // constant factor — gate VALUES must be identical at any setting
    // — and the session's previous value must survive the gate.
    val k = "spark.sql.shuffle.partitions"
    val kk = "spark.graft.stream.statePartitions"
    val before = spark.conf.get(k)
    def runAt(n: String): Seq[String] = {
      spark.conf.set(kk, n)
      try graft.streaming.Streams
        .queries("q155_stream_window_agg")(spark, Sf)
        .collect().map(_.toString).toSeq
      finally spark.conf.unset(kk)
    }
    val a = runAt("3")
    val b = runAt("5")
    assert(a.nonEmpty, "gate emitted nothing on the fixture")
    assert(a == b, s"gate rollup depends on the state-partition count: ${a.take(2)} vs ${b.take(2)}")
    assert(spark.conf.get(k) == before, "shuffle partitions not restored after the gate scope")
  }
}

/** Companion buffer for the gate-restart test: foreachBatch closures
  * serialize, so the sink must live outside the spec instance.
  */
object StreamsSpecGateBuf {
  val hits = scala.collection.mutable.ArrayBuffer.empty[graft.streaming.Streams.BandHit]

}
