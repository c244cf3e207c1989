package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{
  BatchWrite,
  DataWriter,
  DataWriterFactory,
  LogicalWriteInfo,
  PhysicalWriteInfo,
  Write,
  WriteBuilder,
  WriterCommitMessage
}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path: the engine's template for a transactional
  * sink, the mirror of [[SynthDocs]]'s read template.
  *
  * What it demonstrates is the V2 commit protocol — the contract that
  * makes distributed writes atomic at any scale:
  *
  *  1. every task gets its own [[DataWriter]] and STAGES rows locally;
  *  2. a task that succeeds seals its staging into a
  *     [[WriterCommitMessage]] (here: the rows; for a real sink: file
  *     manifests / transaction ids);
  *  3. only the DRIVER's [[BatchWrite.commit]] publishes the union of
  *     sealed messages, atomically;
  *  4. any task/job failure routes to `abort`, and staged-but-
  *     uncommitted output is never visible — no torn writes, and
  *     speculative/retried tasks can't double-publish because only
  *     the messages the driver received count.
  *
  * Storage here is an in-JVM map keyed by the `name` option (local
  * -mode semantics, right-sized for specs — a production sink stages
  * to files/object-store parts and commits a manifest; the protocol
  * shape is identical and that is the part this template pins).
  */
class MemSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // accepts whatever schema the query writes

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MemSinkTable(
      Option(properties.get("name")).getOrElse("default"),
      schema)
}

object MemSink {
  /** name → committed rows (publish happens only in commit()). */
  private val committed = new ConcurrentHashMap[String, Seq[Seq[Any]]]()

  def rows(name: String): Seq[Seq[Any]] =
    Option(committed.get(name)).getOrElse(Seq.empty)

  def clear(name: String): Unit = committed.remove(name)

  private[sources] def publish(name: String, rows: Seq[Seq[Any]]): Unit =
    committed.merge(name, rows, (a, b) => a ++ b)
}

private class MemSinkTable(name: String, schema0: StructType)
    extends Table
    with SupportsWrite {
  override def name(): String = s"mem_sink($name)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new MemSinkBatchWrite(name, info.schema())
      }
    }
}

/** Commit message: the sealed output of one successful task attempt. */
private case class MemSinkCommit(rows: Seq[Seq[Any]]) extends WriterCommitMessage

private class MemSinkBatchWrite(name: String, schema: StructType)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new MemSinkWriterFactory(schema)

  /** The ONLY publication point: driver-side, after every task sealed
    * its staging. Atomic with respect to readers of [[MemSink.rows]].
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    MemSink.publish(
      name,
      messages.toSeq.flatMap(_.asInstanceOf[MemSinkCommit].rows))

  /** Failure path: staged rows lived only in the (now dead) task
    * JVMs / unsent messages — dropping them IS the abort.
    */
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private class MemSinkWriterFactory(schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val staged = Seq.newBuilder[Seq[Any]]
      private val fields = schema.fields

      override def write(record: InternalRow): Unit =
        staged += fields.indices.map { i =>
          val v = record.get(i, fields(i).dataType)
          v match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.toString
            case other => other
          }
        }

      override def commit(): WriterCommitMessage = MemSinkCommit(staged.result())
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
