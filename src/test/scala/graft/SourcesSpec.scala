package graft

import org.apache.spark.sql.functions._

/** DataSource V2 connector behavior: split planning, connector-level
  * column pruning, and partition-invariant determinism.
  */
class SourcesSpec extends SparkSpec {

  private def synth(rows: Long, partitions: Int) =
    spark.read
      .format("graft.sources.SynthDocs")
      .option("rows", rows)
      .option("partitions", partitions)
      .load()

  test("scan plans the requested number of input partitions") {
    val df = synth(1000, 8)
    assert(df.count() == 1000L)
    assert(df.rdd.getNumPartitions == 8)
  }

  test("rows are a pure function of doc_id: content invariant under repartitioning") {
    val a = synth(200, 3).collect().map(_.toSeq).toSet
    val b = synth(200, 8).collect().map(_.toSeq).toSet
    assert(a == b)
    assert(a.size == 200)
  }

  test("column pruning reaches the connector: text column absent from a lang-only scan") {
    val df = synth(500, 4).groupBy(col("lang")).agg(count(lit(1)).as("n"))
    df.collect()
    val scanDesc = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("SynthDocs range=")).mkString
    assert(scanDesc.contains("cols=[lang]"),
      s"connector still asked for unneeded columns: $scanDesc")
  }

  test("doc_id range filters prune splits: partitions outside the range never plan") {
    val df = synth(10000, 8).filter(col("doc_id") >= 9000 && col("doc_id") < 9100)
    assert(df.count() == 100L)
    // the 100-row residual range replans onto its own splits — far
    // fewer rows per split than the unpruned 1250
    val parts = df.rdd.getNumPartitions
    assert(parts <= 8, s"$parts")
    val desc = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("SynthDocs range=")).mkString
    assert(desc.contains("range=[9000,9100)"),
      s"pushed range not reflected in the scan: $desc")
  }

  test("lang equality evaluates inside the reader and rows still match post-filter") {
    val pushed = synth(2000, 4).filter(col("lang") === "en")
    val baseline = synth(2000, 4).collect().filter(_.getString(1) == "en")
    val got = pushed.collect()
    assert(got.map(_.getLong(0)).toSet == baseline.map(_.getLong(0)).toSet)
    val desc = pushed.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("SynthDocs range=")).mkString
    assert(desc.contains("lang=en"), s"lang filter not pushed: $desc")
  }

  test("combined pushdown: range + lang + pruned columns in one scan") {
    val df = synth(5000, 8)
      .filter(col("doc_id") < 1000 && col("lang") === "de")
      .select(col("doc_id"))
    val ids = df.collect().map(_.getLong(0))
    assert(ids.nonEmpty && ids.forall(_ < 1000))
    val desc = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("SynthDocs range=")).mkString
    assert(desc.contains("range=[0,1000)") && desc.contains("lang=de"))
  }

  test("ungrouped count/min/max push into the connector as O(1) range arithmetic") {
    val df = synth(100000, 8)
      .filter(col("doc_id") >= 1000 && col("doc_id") < 60000)
      .agg(count(lit(1)).as("n"), min("doc_id").as("lo"), max("doc_id").as("hi"))
    val row = df.collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((59000L, 1000L, 59999L)))
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("AGG-PUSHED"),
      s"aggregation not answered by the connector:\n${desc.take(1500)}")
  }

  test("aggregate pushdown declines when a lang residual forces row enumeration") {
    val df = synth(2000, 4)
      .filter(col("lang") === "en")
      .agg(count(lit(1)).as("n"))
    val n = df.collect().head.getLong(0)
    val baseline = synth(2000, 4).collect().count(_.getString(1) == "en")
    assert(n == baseline)
    assert(!df.queryExecution.executedPlan.toString.contains("AGG-PUSHED"),
      "count over a lang filter cannot be answered from the key range")
  }

  test("V2 streaming source: micro-batches advance by offset, exactly-once total") {
    val q = spark.readStream
      .format("graft.sources.SynthDocs")
      .option("rows", "250")
      .option("partitions", "4")
      .option("rowsPerBatch", "100")
      .load()
      .writeStream
      .format("memory")
      .queryName("synth_stream")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable() // drains 100, 100, 50, then 0-row batches
      val ids = spark.table("synth_stream")
        .select("doc_id").collect().map(_.getLong(0)).sorted
      assert(ids.length == 250, s"expected 250 rows, got ${ids.length}")
      assert(ids.toSeq == (0L until 250L), "every doc exactly once, no gaps, no dupes")
      // the batch and streaming faces generate identical content
      val batchRow = synth(250, 4).filter(col("doc_id") === 123L).head()
      val streamRow = spark.table("synth_stream").filter(col("doc_id") === 123L).head()
      assert(batchRow.getString(2) == streamRow.getString(2))
    } finally q.stop()
  }

  test("V2 streaming source: restart from checkpoint resumes without dupes or gaps") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    // memory sink is non-recoverable by design; the file sink's
    // manifest commit log is what makes restart exactly-once
    val out = java.nio.file.Files.createTempDirectory("graft-resume").toString
    def start(totalRows: Int) =
      spark.readStream
        .format("graft.sources.SynthDocs")
        .option("rows", totalRows.toString).option("partitions", "4")
        .option("rowsPerBatch", "60")
        .load()
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    // run 1: only 100 rows exist yet; drains them and shuts down
    val q1 = start(100)
    q1.awaitTermination()
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst == 100, s"first run should drain 100 rows, got $afterFirst")
    // run 2, same checkpoint, 150 new rows arrived while down:
    // must resume at the committed offset — no replay of 0..99
    val q2 = start(250)
    q2.awaitTermination()
    val ids = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.length == 250 && ids.toSeq == (0L until 250L),
      s"resume must continue at the committed offset: got ${ids.length} rows")
  }

  test("V2 sink commit protocol: all rows publish exactly once on success") {
    import spark.implicits._
    graft.sources.MemSink.clear("t_ok")
    (1 to 100).map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .repartition(4)
      .write.format("graft.sources.MemSink")
      .option("name", "t_ok").mode("append").save()
    val got = graft.sources.MemSink.rows("t_ok")
    assert(got.size == 100)
    assert(got.map(_.head.asInstanceOf[Long]).sorted == (1L to 100L))
  }

  test("V2 sink commit protocol: a failed job publishes NOTHING (abort drops staging)") {
    import spark.implicits._
    graft.sources.MemSink.clear("t_fail")
    val boom = org.apache.spark.sql.functions.udf { (i: Long) =>
      if (i == 42L) throw new RuntimeException("poison row") else i
    }
    intercept[Exception] {
      (1 to 100).map(_.toLong).toDF("id")
        .repartition(4)
        .withColumn("id", boom($"id"))
        .write.format("graft.sources.MemSink")
        .option("name", "t_fail").mode("append").save()
    }
    assert(graft.sources.MemSink.rows("t_fail").isEmpty,
      "staged rows from non-failing tasks must never become visible")
  }

  test("connector output composes with the relational surface") {
    val perLang = synth(1000, 8)
      .withColumn("nt", size(split(col("text"), " ")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), round(avg(col("nt")), 2).as("avg_tokens"))
    val rows = perLang.collect()
    assert(rows.map(_.getLong(1)).sum == 1000L)
    assert(rows.forall(r => r.getDouble(2) >= 5.0 && r.getDouble(2) <= 36.0))
  }

  // ---- AvroLite: the Avro container reader over the core jars ----

  private def writeAvro(dir: java.io.File, name: String, lo: Int, hi: Int): Unit = {
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema: Schema = SchemaBuilder
      .record("ev").fields()
      .requiredLong("id")
      .requiredString("kind")
      .requiredDouble("score")
      .requiredBoolean("ok")
      .optionalString("note") // [null, string]
      .requiredBytes("blob")
      .endRecord()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(dir, name))
    try (lo until hi).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("id", i.toLong)
      r.put("kind", if (i % 2 == 0) "even" else "odd")
      r.put("score", i * 0.5)
      r.put("ok", i % 3 == 0)
      r.put("note", if (i % 4 == 0) null else s"n$i")
      r.put("blob", java.nio.ByteBuffer.wrap(Array[Byte](i.toByte, (i + 1).toByte)))
      w.append(r)
    } finally w.close()
  }

  test("AvroLite: schema inference, values, nulls and binary round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avro").toFile
    writeAvro(dir, "a.avro", 0, 50)
    val df = spark.read.format("graft.sources.AvroLite").load(dir.getAbsolutePath)
    assert(df.schema.fieldNames.toSeq ==
      Seq("id", "kind", "score", "ok", "note", "blob"))
    assert(df.schema("note").nullable)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 50)
    assert(rows(3).getLong(0) == 3L && rows(3).getString(1) == "odd")
    assert(rows(4).isNullAt(4) && rows(5).getString(4) == "n5")
    assert(rows(2).getAs[Array[Byte]](5).toSeq == Seq[Byte](2, 3))
    assert(rows.count(_.getBoolean(3)) == 17) // i % 3 == 0 in [0, 50)
  }

  test("AvroLite: one split per file; multi-file directory reads every row once") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-multi").toFile
    writeAvro(dir, "p1.avro", 0, 40)
    writeAvro(dir, "p2.avro", 40, 90)
    writeAvro(dir, "p3.avro", 90, 100)
    val df = spark.read.format("graft.sources.AvroLite").load(dir.getAbsolutePath)
    assert(df.rdd.getNumPartitions == 3, "expected one input partition per file")
    assert(df.count() == 100)
    assert(df.agg(sum(col("id"))).head().getLong(0) == (0 until 100).map(_.toLong).sum)
  }

  test("AvroLite: column pruning projects the Avro reader schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-prune").toFile
    writeAvro(dir, "a.avro", 0, 30)
    val df = spark.read.format("graft.sources.AvroLite").load(dir.getAbsolutePath)
      .select("kind", "score")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("columns=kind,score"),
      s"reader schema not pruned to the projection:\n${plan.take(800)}")
    val got = df.collect()
    assert(got.length == 30 && got.forall(_.length == 2))
    // joins into the relational surface work: enrich fixture docs by id
    val docs = graft.ops.Tables.documents(spark, Sf).select(col("doc_id"))
    val joined = spark.read.format("graft.sources.AvroLite").load(dir.getAbsolutePath)
      .join(docs, col("id") === col("doc_id"))
    assert(joined.count() == 30, "avro rows must join against the parquet tables")
  }

  test("AvroLite write: distributed DSv2 sink round-trips flat + nested rows, staging never published") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-write").toFile
    val df = (0L until 100L)
      .map(i => (
        i,
        s"name$i",
        if (i % 4 == 0) None else Some(i * 1.5),
        (i % 3, s"tag$i"),
        Seq(i, i + 1),
        Map("k" -> i)))
      .toDF("id", "nm", "score", "st", "arr", "mp")
      .repartition(4) // multiple writer tasks -> multiple part files
    df.write.format("graft.sources.AvroLite").mode("append").save(dir.getAbsolutePath)
    val files = dir.listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == 4, s"expected 4 part files, got ${files.map(_.getName).toSeq}")
    assert(!dir.listFiles().exists(_.getName.startsWith("_staging")),
      "staging dir must be cleaned on commit")
    val back = spark.read.format("graft.sources.AvroLite").load(dir.getAbsolutePath)
    assert(back.count() == 100)
    // schema round-trip: nullable double, nested struct/array/map
    assert(back.schema("score").nullable)
    assert(back.schema("st").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    val r7 = back.filter(col("id") === 7L)
      .select(col("nm"), col("score"), col("st._2"), element_at(col("arr"), 2),
        element_at(col("mp"), "k"))
      .head()
    assert(r7.getString(0) == "name7" && r7.getDouble(1) == 10.5 &&
      r7.getString(2) == "tag7" && r7.getLong(3) == 8L && r7.getLong(4) == 7L)
    assert(back.filter(col("id") === 8L).select(col("score")).head().isNullAt(0))
    // aggregate over the full round-trip
    assert(back.agg(sum(col("id"))).head().getLong(0) == (0L until 100L).sum)
  }

  test("AvroLite: two-level nested record with nulls, array<record> and map round-trip") {
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    // the CDC-envelope shape: {id, geo: record{code, detail: record}?, tags: array<record>, attrs: map<long>}
    val detail: Schema = SchemaBuilder.record("detail").fields()
      .requiredString("city").optionalLong("pop").endRecord()
    val geo: Schema = SchemaBuilder.record("geo").fields()
      .requiredLong("code").name("d").`type`(detail).noDefault().endRecord()
    val tag: Schema = SchemaBuilder.record("tag").fields()
      .requiredString("k").requiredLong("v").endRecord()
    val env: Schema = SchemaBuilder.record("env").fields()
      .requiredLong("id")
      .name("geo").`type`().optional().`type`(geo) // [null, geo]
      .name("tags").`type`().array().items(tag).noDefault()
      .name("attrs").`type`().map().values().longType().noDefault()
      .endRecord()
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-nested").toFile
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](env))
    w.create(env, new java.io.File(dir, "n.avro"))
    try (0 until 20).foreach { i =>
      val r = new GenericData.Record(env)
      r.put("id", i.toLong)
      if (i % 5 == 0) r.put("geo", null)
      else {
        val d = new GenericData.Record(detail)
        d.put("city", s"c$i")
        d.put("pop", if (i % 3 == 0) null else java.lang.Long.valueOf(i * 100L))
        val g = new GenericData.Record(geo)
        g.put("code", i.toLong % 4)
        g.put("d", d)
        r.put("geo", g)
      }
      val tags = new java.util.ArrayList[GenericRecord]()
      (0 until i % 3).foreach { j =>
        val t = new GenericData.Record(tag)
        t.put("k", s"t$j"); t.put("v", (i * 10 + j).toLong); tags.add(t)
      }
      r.put("tags", tags)
      val m = new java.util.HashMap[String, java.lang.Long]()
      m.put("len", i.toLong); m.put("sq", (i * i).toLong)
      r.put("attrs", m)
      w.append(r)
    } finally w.close()

    val df = spark.read.format("graft.sources.AvroLite").load(dir.getAbsolutePath)
    // inferred shape: struct nullability + nested types
    assert(df.schema("geo").nullable && !df.schema("tags").nullable)
    assert(df.schema("geo").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]("d")
      .dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    // two-level field access, null propagation at both levels
    val got = df
      .select(
        col("id"),
        col("geo.code"),
        col("geo.d.city").as("city"),
        col("geo.d.pop").as("pop"),
        size(col("tags")).as("ntags"),
        element_at(col("attrs"), "sq").as("sq"))
      .orderBy("id")
      .collect()
    assert(got.length == 20)
    assert(got(0).isNullAt(1) && got(0).isNullAt(2), "null geo must propagate to sub-fields")
    assert(got(7).getLong(1) == 3L && got(7).getString(2) == "c7" && got(7).getLong(3) == 700L)
    assert(got(9).isNullAt(3), "nested optional pop must be null at depth 2 (i%3==0)")
    assert(got(8).getInt(4) == 2 && got(8).getLong(5) == 64L)
    // explode of the nested array<record>
    val tagSum = df.select(explode(col("tags")).as("t"))
      .agg(sum(col("t.v"))).head().getLong(0)
    val expected = (0 until 20).flatMap(i => (0 until i % 3).map(j => i * 10L + j)).sum
    assert(tagSum == expected, s"exploded tag sum $tagSum != $expected")
  }

  test("AvroLite: logical types decode — timestamp-millis/micros, date, decimal, nullable unions") {
    import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.spark.sql.types._
    val tsMs = LogicalTypes.timestampMillis().addToSchema(Schema.create(Schema.Type.LONG))
    val tsUs = LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    val dt = LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    val dec = LogicalTypes.decimal(10, 3).addToSchema(Schema.create(Schema.Type.BYTES))
    val rec: Schema = SchemaBuilder.record("lt").fields()
      .requiredLong("id")
      .name("ts_ms").`type`(tsMs).noDefault()
      .name("ts_us").`type`(tsUs).noDefault()
      .name("d").`type`(dt).noDefault()
      .name("amt").`type`(dec).noDefault()
      .name("maybe_ts").`type`(Schema.createUnion(Schema.create(Schema.Type.NULL), tsUs))
      .withDefault(null)
      .endRecord()
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-logical").toFile
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](rec))
    w.create(rec, new java.io.File(dir, "lt.avro"))
    def decBytes(unscaled: Long): java.nio.ByteBuffer =
      java.nio.ByteBuffer.wrap(java.math.BigInteger.valueOf(unscaled).toByteArray)
    try (0 until 4).foreach { i =>
      val r = new GenericData.Record(rec)
      r.put("id", i.toLong)
      r.put("ts_ms", 1700000000000L + i) // epoch millis
      r.put("ts_us", 1700000000000000L + i) // epoch micros
      r.put("d", 19700 + i) // days since epoch
      r.put("amt", decBytes(if (i == 3) -1234567L else 1000L * i + 5)) // scale 3
      r.put("maybe_ts", if (i % 2 == 0) null else java.lang.Long.valueOf(1700000000000000L + i))
      w.append(r)
    } finally w.close()
    val df = spark.read.format("graft.sources.AvroLite").load(dir.getAbsolutePath)
    assert(df.schema("ts_ms").dataType == TimestampType)
    assert(df.schema("ts_us").dataType == TimestampType)
    assert(df.schema("d").dataType == DateType)
    assert(df.schema("amt").dataType == DecimalType(10, 3))
    assert(df.schema("maybe_ts").dataType == TimestampType && df.schema("maybe_ts").nullable)
    val got = df
      .select(
        col("id"),
        unix_micros(col("ts_ms")).as("ms_us"),
        unix_micros(col("ts_us")).as("us_us"),
        datediff(col("d"), lit("1970-01-01").cast("date")).as("days"),
        col("amt"),
        col("maybe_ts"))
      .orderBy("id")
      .collect()
    assert(got(1).getLong(1) == 1700000000001000L, "millis must scale to Catalyst micros")
    assert(got(1).getLong(2) == 1700000000000001L, "micros must pass through unscaled")
    assert(got(2).getInt(3) == 19702, "date days must pass through")
    assert(got(2).getDecimal(4) == new java.math.BigDecimal("2.005"))
    assert(got(3).getDecimal(4) == new java.math.BigDecimal("-1234.567"),
      "negative unscaled decimal must decode with its sign")
    assert(got(0).isNullAt(5) && !got(1).isNullAt(5), "nullable logical union")
  }

  test("AvroLite write: logical types round-trip through the DSv2 sink; two append jobs coexist") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-lt-write").toFile
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789123"),
        java.sql.Date.valueOf("2024-03-01"), BigDecimal("12345.67")),
      (2L, java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999"),
        java.sql.Date.valueOf("1969-12-31"), BigDecimal("-0.01")))
      .toDF("id", "ts", "d", "amt")
      .select(col("id"), col("ts"), col("d"), col("amt").cast(DecimalType(12, 2)).as("amt"))
    df.write.format("graft.sources.AvroLite").mode("append").save(dir.getAbsolutePath)
    val back = spark.read.format("graft.sources.AvroLite").load(dir.getAbsolutePath)
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.schema("d").dataType == DateType)
    assert(back.schema("amt").dataType == DecimalType(12, 2))
    val o = df.orderBy("id").collect()
    val b = back.orderBy("id").collect()
    assert(o.sameElements(b), "logical-typed rows must round-trip bit-exactly")
    // ADVICE closure: published names are job-unique, so a SECOND
    // append job must add files, not silently replace the first
    // job's (local rename(2) replaces; HDFS fails the commit)
    val firstFiles = dir.listFiles().filter(_.getName.endsWith(".avro")).map(_.getName).toSet
    df.write.format("graft.sources.AvroLite").mode("append").save(dir.getAbsolutePath)
    val afterFiles = dir.listFiles().filter(_.getName.endsWith(".avro")).map(_.getName).toSet
    assert(firstFiles.subsetOf(afterFiles) && afterFiles.size > firstFiles.size,
      s"second append must not overwrite: before=$firstFiles after=$afterFiles")
    val twice = spark.read.format("graft.sources.AvroLite").load(dir.getAbsolutePath)
    assert(twice.count() == 4, "both jobs' rows must survive")
  }
}
