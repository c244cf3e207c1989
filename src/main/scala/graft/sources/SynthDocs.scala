package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  Batch,
  InputPartition,
  PartitionReader,
  PartitionReaderFactory,
  Scan,
  ScanBuilder,
  SupportsPushDownFilters,
  SupportsPushDownRequiredColumns
}
import org.apache.spark.sql.sources.{
  EqualTo,
  Filter,
  GreaterThan,
  GreaterThanOrEqual,
  IsNotNull,
  LessThan,
  LessThanOrEqual
}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector: a deterministic synthetic `documents`
  * generator — the engine's template for plugging a custom format or
  * service into Catalyst as a first-class table.
  *
  * The reference's only source is an HTTP download staged to disk
  * (reference: src/api.rs:56-117), which the engine mirrors driver-side
  * in [[graft.ingest.Http]]. This connector shows the other, fully
  * distributed shape: the scan itself is planned as `numPartitions`
  * independent [[InputPartition]]s (no driver materialization, no
  * single-split ceiling — each executor generates/fetches only its
  * slice), and column pruning is pushed INTO the connector
  * ([[SupportsPushDownRequiredColumns]]), so `select(count)`-style
  * plans never pay for the text column. Those two properties — split
  * planning and connector-level pruning — are exactly what make a
  * source usable at 100 TB.
  *
  * Rows are a pure function of `doc_id` (split-mix hash → token
  * sequence), so output is identical regardless of partitioning —
  * pinned by the spec.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.SynthDocs")
  *     .option("rows", 1000).option("partitions", 8).load()
  * }}}
  */
class SynthDocs extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthDocs.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthDocsTable(
      rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      numPartitions = Option(properties.get("partitions")).map(_.toInt).getOrElse(8))
}

object SynthDocs {
  val schema: StructType = new StructType()
    .add("doc_id", LongType, nullable = false)
    .add("lang", StringType, nullable = false)
    .add("text", StringType, nullable = false)

  private val langs = Array("en", "de", "fr", "pt", "es")
  private val words = Array(
    "data", "spark", "query", "plan", "shuffle", "join", "scan", "token",
    "corpus", "vector", "stream", "batch", "column", "row", "hash", "sort")

  /** splitmix64 finalizer — stateless, so any partition can generate
    * any row without coordination.
    */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  // floorMod, not .toInt.abs %: when the truncated lower 32 bits are
  // 0x80000000, Int.MinValue.abs is still negative (~2^-32 per row —
  // reachable at the row counts this connector advertises).
  def langOf(docId: Long): String =
    langs(java.lang.Math.floorMod(mix(docId) >>> 8, langs.length.toLong).toInt)

  def textOf(docId: Long): String = {
    val h = mix(docId)
    val n = 5 + (h & 0x1F).toInt // 5..36 tokens
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(words((mix(docId * 131 + i) & 0xF).toInt))
      i += 1
    }
    sb.toString
  }
}

private class SynthDocsTable(rows: Long, numPartitions: Int)
    extends Table
    with SupportsRead {
  override def name(): String = s"synth_docs($rows)"
  override def schema(): StructType = SynthDocs.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthDocsScanBuilder(
      rows,
      numPartitions,
      Option(options.get("rowsPerBatch")).map(_.toLong).getOrElse(1000L))
}

private class SynthDocsScanBuilder(rows: Long, numPartitions: Int, rowsPerBatch: Long = 1000L)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  private var required: StructType = SynthDocs.schema
  private var pushed: Array[Filter] = Array.empty
  private var aggPushed: Option[
    org.apache.spark.sql.connector.expressions.aggregate.Aggregation] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** doc_id comparisons narrow the generated key range — SPLIT
    * PRUNING: partitions wholly outside the range are never planned,
    * the connector-level analog of parquet row-group/partition
    * pruning. lang equality can't prune splits (lang is
    * hash-scattered across doc_ids) but is evaluated inside the
    * reader, so filtered rows never surface to Spark. Everything
    * else is left to Spark as a residual.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition {
      case EqualTo("doc_id", _: Long) => true
      case GreaterThan("doc_id", _: Long) => true
      case GreaterThanOrEqual("doc_id", _: Long) => true
      case LessThan("doc_id", _: Long) => true
      case LessThanOrEqual("doc_id", _: Long) => true
      case EqualTo("lang", _: String) => true
      case IsNotNull("doc_id" | "lang" | "text") => true // nothing is ever null
      case _ => false
    }
    pushed = sup
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  // fold doc_id comparisons into one [lo, hi) bound
  private def bounds: (Long, Long, Option[String]) = {
    var lo = 0L
    var hi = rows
    var langEq: Option[String] = None
    pushed.foreach {
      case EqualTo("doc_id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case GreaterThan("doc_id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v)
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, v + 1)
      case EqualTo("lang", v: String) => langEq = Some(v)
      case _ => ()
    }
    (lo, math.max(lo, hi), langEq)
  }

  /** Aggregate pushdown, the connector analog of parquet's
    * count-from-metadata: every doc_id in [lo, hi) exists exactly
    * once, so ungrouped COUNT(*) / MIN(doc_id) / MAX(doc_id) are
    * O(1) arithmetic on the (filter-narrowed) key range — the scan
    * answers the whole query with ONE generated row and zero data
    * movement. Declines when a lang equality is pushed (rows would
    * have to be enumerated anyway) or any grouping/other aggregate
    * appears; Spark then falls back to the ordinary row scan.
    */
  private def canPushAgg(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    val (_, _, langEq) = bounds
    langEq.isEmpty && agg.groupByExpressions.isEmpty &&
    agg.aggregateExpressions.nonEmpty &&
    agg.aggregateExpressions.forall {
      case _: CountStar => true
      case m: Min => m.column.toString == "doc_id"
      case m: Max => m.column.toString == "doc_id"
      case _ => false
    }
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    canPushAgg(agg)

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (canPushAgg(agg)) { aggPushed = Some(agg); true }
    else false
  }

  override def build(): Scan = {
    val (lo, hi, langEq) = bounds
    aggPushed match {
      case Some(agg) => new SynthDocsAggScan(lo, hi, agg)
      case None =>
        new SynthDocsScan(lo, hi, numPartitions, required, langEq, rowsPerBatch)
    }
  }
}

/** Single-row scan answering a completely-pushed aggregation from the
  * key-range arithmetic alone.
  */
private class SynthDocsAggScan(
    lo: Long,
    hi: Long,
    agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
    extends Scan
    with Batch {
  import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}

  override def readSchema(): StructType =
    agg.aggregateExpressions.zipWithIndex.foldLeft(new StructType()) {
      case (st, (_: CountStar, i)) => st.add(s"count_$i", LongType, nullable = false)
      case (st, (_, i)) => st.add(s"agg_$i", LongType, nullable = true)
    }

  override def toBatch: Batch = this
  override def description(): String =
    s"SynthDocs AGG-PUSHED range=[$lo,$hi) ${agg.aggregateExpressions.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    Array(SynthDocsAggPartition(lo, hi))

  override def createReaderFactory(): PartitionReaderFactory = {
    val values: Array[Any] = agg.aggregateExpressions.map {
      case _: CountStar => (hi - lo): Any
      case _: Min => if (hi > lo) (lo: Any) else null
      case _: Max => if (hi > lo) ((hi - 1): Any) else null
      case other => throw new IllegalStateException(s"unpushable agg $other")
    }
    new SynthDocsAggReaderFactory(values)
  }
}

private case class SynthDocsAggPartition(lo: Long, hi: Long) extends InputPartition

private class SynthDocsAggReaderFactory(values: Array[Any])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = !emitted && { emitted = true; true }
      override def get(): InternalRow = InternalRow.fromSeq(values.toSeq)
      override def close(): Unit = ()
    }
}

private class SynthDocsScan(
    lo: Long,
    hi: Long,
    numPartitions: Int,
    required: StructType,
    langEq: Option[String],
    rowsPerBatch: Long = 1000L)
    extends Scan
    with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SynthDocs range=[$lo,$hi) cols=[${required.fieldNames.mkString(",")}]" +
      langEq.map(l => s" lang=$l").getOrElse("")

  override def planInputPartitions(): Array[InputPartition] = {
    val span = math.max(hi - lo, 0L)
    val per = math.max((span + numPartitions - 1) / numPartitions, 1L)
    (0 until numPartitions).toArray.flatMap { i =>
      val start = lo + i * per
      val end = math.min(start + per, hi)
      if (start < end) Some(SynthDocsPartition(start, end, langEq): InputPartition)
      else None
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthDocsReaderFactory(required)

  /** Streaming face of the same scan: doc_id IS the offset. Each
    * trigger advances the committed position by at most
    * `rowsPerBatch` (per-trigger admission control, the
    * `maxFilesPerTrigger` analog), `planInputPartitions(start, end)`
    * splits exactly the new id range across the same partition
    * planner as the batch path, and pushed filters / pruned columns
    * apply unchanged. Offsets serialize as plain longs; Spark's
    * checkpoint replays the last uncommitted range after a crash and
    * gets identical rows back (generation is a pure function of
    * doc_id) — the exactly-once source contract with zero
    * source-side state.
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SynthDocsMicroBatchStream(lo, hi, numPartitions, required, langEq, rowsPerBatch)
}

private case class SynthDocsOffset(pos: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = pos.toString
}

private class SynthDocsMicroBatchStream(
    lo: Long,
    hi: Long,
    numPartitions: Int,
    required: StructType,
    langEq: Option[String],
    rowsPerBatch: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  override def initialOffset(): Offset = SynthDocsOffset(lo)

  /** Admission-control form: the engine hands us the start position,
    * so the available end is pure arithmetic — no source-side state
    * to drift from the checkpoint across restarts. The ReadLimit must
    * be honored, not assumed: Trigger.AvailableNow snapshots its
    * drain target through ReadAllAvailable, and answering it with one
    * batch's worth would truncate the drain.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    import org.apache.spark.sql.connector.read.streaming.{ReadAllAvailable, ReadMaxRows}
    val s0 = start.asInstanceOf[SynthDocsOffset].pos
    val end = limit match {
      case r: ReadMaxRows => math.min(s0 + r.maxRows(), hi)
      case _: ReadAllAvailable => hi
      case _ => math.min(s0 + rowsPerBatch, hi)
    }
    SynthDocsOffset(end)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control source: latestOffset(start, limit)")

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  override def deserializeOffset(json: String): Offset =
    SynthDocsOffset(json.toLong)

  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s0 = start.asInstanceOf[SynthDocsOffset].pos
    val e0 = end.asInstanceOf[SynthDocsOffset].pos
    val span = math.max(e0 - s0, 0L)
    val per = math.max((span + numPartitions - 1) / numPartitions, 1L)
    (0 until numPartitions).toArray.flatMap { i =>
      val st = s0 + i * per
      val en = math.min(st + per, e0)
      if (st < en) Some(SynthDocsPartition(st, en, langEq): InputPartition)
      else None
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthDocsReaderFactory(required)

  override def stop(): Unit = ()
}

private case class SynthDocsPartition(start: Long, end: Long, langEq: Option[String])
    extends InputPartition

private class SynthDocsReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SynthDocsPartition]
    // resolve field positions once per partition, not per row
    val fields = required.fieldNames
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      override def next(): Boolean = {
        cur += 1
        // connector-side residual: skip rows failing the pushed lang
        // equality so they never cross into Spark
        while (cur < p.end && p.langEq.exists(_ != SynthDocs.langOf(cur)))
          cur += 1
        cur < p.end
      }
      override def get(): InternalRow =
        InternalRow.fromSeq(fields.toSeq.map {
          case "doc_id" => cur
          case "lang" => UTF8String.fromString(SynthDocs.langOf(cur))
          case "text" => UTF8String.fromString(SynthDocs.textOf(cur))
        })
      override def close(): Unit = ()
    }
  }
}
