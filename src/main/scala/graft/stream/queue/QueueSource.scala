package graft.stream.queue

import java.util
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Message-queue streaming source with the reference consumer's delivery
  * protocol (consumer.py:55-221), as a native DataSource V2 MicroBatchStream.
  *
  * Queue model: a directory where each FILE is one message (body = file
  * content, message id = file name). Producers must write-then-rename
  * (atomic appearance) with monotonically increasing names (sequence or
  * timestamp prefix) — the same contract SQS FIFO gives its consumers.
  *
  * Delivery semantics mapped onto Spark's epoch machinery:
  *   - receive_message        -> `latestOffset` lists visible message files;
  *     the micro-batch claims everything up to the high-water name.
  *   - delete_message on
  *     success (ack)          -> `commit(offset)` deletes claimed files only
  *     after the epoch's sink work committed — exactly the reference's
  *     "delete only after process_job returns" (consumer.py:152-156).
  *     NOTE Spark issues the source-commit for epoch N while constructing
  *     epoch N+1, so the ack for the LAST processed batch lands one trigger
  *     cycle later (seconds, for a running stream). Until then the message
  *     is processed-but-visible — indistinguishable from an SQS redelivery
  *     race, and safe for the same reason: processing is idempotent
  *     (COMPLETED short-circuit + row-hash anti-join, README ADR-001).
  *   - visibility timeout /
  *     redelivery             -> a failed or interrupted epoch never commits,
  *     so its files survive and the restarted query replays them
  *     (consumer.py:171-177: "Don't delete message - it will become visible
  *     again").
  *   - poison pills           -> malformed JSON is dropped (and acked) by the
  *     pipeline's parse/disposition stage, mirroring "delete invalid message
  *     to prevent infinite retries" (consumer.py:180-190).
  *
  * Emits (message_id STRING, value STRING); `value` feeds
  * [[graft.stream.JobDispatch.parseMessages]] unchanged.
  */
object QueueSource {
  val schema: StructType = StructType(Seq(
    StructField("message_id", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** Message files: visible = not hidden, not a temp being staged. */
  private[queue] def isVisible(name: String): Boolean =
    !name.startsWith(".") && !name.startsWith("_") && !name.endsWith(".tmp")
}

class QueueSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-queue"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = QueueSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "graft-queue requires a directory path")
    new QueueTable(path)
  }
}

class QueueTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft-queue:$dir"
  override def schema(): StructType = QueueSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = QueueSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new QueueMicroBatchStream(dir)
      }
    }
}

/** Offset = the lexicographically greatest message name claimed so far
  * ("" before any). Monotonic by the producer naming contract. */
case class QueueOffset(last: String) extends Offset {
  override def json(): String = {
    val esc = last.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"last":"$esc"}"""
  }
}

class QueueMicroBatchStream(dir: String) extends MicroBatchStream {

  private val dirPath = new Path(dir)
  private def fs = dirPath.getFileSystem(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  /** High-water mark survives across triggers within a run; after a restart
    * it rebuilds from the directory listing + the checkpointed start offset
    * (planInputPartitions/commit push it up), so an emptied queue never
    * regresses the offset. */
  @volatile private var maxSeen: String = ""

  private def visibleFiles(): Seq[String] =
    if (!fs.exists(dirPath)) Seq.empty
    else fs.listStatus(dirPath).iterator
      .filter(_.isFile)
      .map(_.getPath.getName)
      .filter(QueueSource.isVisible)
      .toSeq.sorted

  override def initialOffset(): Offset = QueueOffset("")

  override def latestOffset(): Offset = {
    val names = visibleFiles()
    if (names.nonEmpty && names.last > maxSeen) maxSeen = names.last
    QueueOffset(maxSeen)
  }

  override def deserializeOffset(json: String): Offset = {
    val m = """\{"last":"(.*)"\}""".r
    json match {
      case m(v) =>
        val last = v.replace("\\\"", "\"").replace("\\\\", "\\")
        if (last > maxSeen) maxSeen = last
        QueueOffset(last)
      case _ => throw new IllegalArgumentException(s"bad queue offset: $json")
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[QueueOffset].last
    val hi = end.asInstanceOf[QueueOffset].last
    if (hi > maxSeen) maxSeen = hi
    visibleFiles()
      .filter(n => n > lo && n <= hi)
      .map(n => QueueMessagePartition(new Path(dirPath, n).toString, n): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new QueueReaderFactory

  /** Ack: the epoch's sink work is durably committed — delete every claimed
    * message. Failed/interrupted epochs never reach here, so their messages
    * stay visible for redelivery (the visibility-timeout analog). */
  override def commit(end: Offset): Unit = {
    val hi = end.asInstanceOf[QueueOffset].last
    if (hi > maxSeen) maxSeen = hi
    visibleFiles().filter(_ <= hi)
      .foreach(n => fs.delete(new Path(dirPath, n), false))
  }

  override def stop(): Unit = ()
}

case class QueueMessagePartition(filePath: String, messageId: String) extends InputPartition

class QueueReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[QueueMessagePartition]
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = !done
      override def get(): InternalRow = {
        done = true
        val path = new Path(p.filePath)
        val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val in = fs.open(path)
        val body =
          try {
            val out = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            var n = in.read(buf)
            while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
            new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
          } finally in.close()
        InternalRow(UTF8String.fromString(p.messageId), UTF8String.fromString(body))
      }
      override def close(): Unit = ()
    }
  }
}
