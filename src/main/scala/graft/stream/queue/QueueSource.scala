package graft.stream.queue

import java.util
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
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
  *   - redrive policy / DLQ   -> with options `deadLetterDir` (+ optional
  *     `maxReceives`, default 5), a message PLANNED into more than
  *     maxReceives epochs — i.e. one whose epochs keep failing before
  *     commit — is MOVED to the dead-letter dir instead of redelivering
  *     forever (the reference delegates exactly this to SQS's redrive
  *     policy, consumer.py:85-87). Delivery counts persist under the
  *     checkpoint (`graft-receipts`), so crash-loops across restarts
  *     count; acked messages' counters are cleaned on commit.
  *     GRANULARITY CAVEAT: a "receive" is epoch membership, so when one
  *     message deterministically crashes its epoch, every cohort member
  *     redelivers with it and their counters rise in lockstep — the whole
  *     cohort would dead-letter together. Transient infra failures don't
  *     care (counters sweep on the eventual ack); for crash-prone
  *     payloads set `maxFilesPerTrigger=1`, which is exactly SQS's
  *     per-message receive granularity (BenchStreamDlq's drill runs so).
  *
  * Emits (message_id STRING, value STRING); `value` feeds
  * [[graft.stream.JobDispatch.parseMessages]] unchanged.
  */
object QueueSource {
  val schema: StructType = StructType(Seq(
    StructField("message_id", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** Message files: visible = not hidden, not a temp being staged, and no
    * control characters — offsets embed the name in single-line JSON that
    * the checkpoint log stores line-oriented, so a name with a newline
    * would corrupt the offset log and brick the restart. Such names are
    * outside the producer contract; skipping them beats checkpoint
    * corruption. */
  private[queue] def isVisible(name: String): Boolean =
    !name.startsWith(".") && !name.startsWith("_") && !name.endsWith(".tmp") &&
      !name.exists(_ < ' ')
}

class QueueSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-queue"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = QueueSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // Spark's convention is case-insensitive source options; a raw map
    // lookup would silently drop .option("maxfilespertrigger", ...).
    val opts = new CaseInsensitiveStringMap(properties)
    val path = opts.get("path")
    require(path != null && path.nonEmpty, "graft-queue requires a directory path")
    val maxFiles = Option(opts.get("maxFilesPerTrigger")).map(_.toInt)
    maxFiles.foreach(m => require(m > 0, s"maxFilesPerTrigger must be > 0, got $m"))
    // SQS redrive-policy analog (consumer.py:85-87 delegates this to the
    // queue itself): with a deadLetterDir, a message DELIVERED more than
    // maxReceives times (default 5) is moved there instead of being
    // redelivered forever.
    val dlqDir = Option(opts.get("deadLetterDir")).filter(_.nonEmpty)
    val maxReceives = Option(opts.get("maxReceives")).map(_.toInt)
    maxReceives.foreach(m => require(m > 0, s"maxReceives must be > 0, got $m"))
    require(maxReceives.isEmpty || dlqDir.isDefined,
      "maxReceives requires deadLetterDir (nowhere to route otherwise)")
    new QueueTable(path, maxFiles, dlqDir, maxReceives.getOrElse(5))
  }
}

class QueueTable(
    dir: String,
    maxFilesPerTrigger: Option[Int] = None,
    deadLetterDir: Option[String] = None,
    maxReceives: Int = 5)
    extends Table with SupportsRead {
  override def name(): String = s"graft-queue:$dir"
  override def schema(): StructType = QueueSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = QueueSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new QueueMicroBatchStream(dir, checkpointLocation, maxFilesPerTrigger,
            deadLetterDir, maxReceives)
      }
    }
}

/** Offset = (lexicographically greatest message name claimed so far — ""
  * before any — monotonic by the producer naming contract) + an epoch
  * counter. The counter lets the offset ADVANCE when only late low-sorting
  * names (producer clock skew) are pending: Spark constructs a batch only
  * on offset change, so without it a late message would starve until
  * unrelated fresh traffic arrived. */
case class QueueOffset(last: String, epoch: Long = 0L) extends Offset {
  override def json(): String = {
    val esc = last.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"last":"$esc","epoch":$epoch}"""
  }
}

class QueueMicroBatchStream(
    dir: String,
    checkpointLocation: String,
    maxFilesPerTrigger: Option[Int] = None,
    deadLetterDir: Option[String] = None,
    maxReceives: Int = 5)
    extends MicroBatchStream
    with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val dirPath = new Path(dir)
  private def hadoopConf =
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
  private def fs = dirPath.getFileSystem(hadoopConf)

  /** High-water mark survives across triggers within a run; after a restart
    * it rebuilds from the directory listing + the checkpointed start offset
    * (planInputPartitions/commit push it up), so an emptied queue never
    * regresses the offset. */
  @volatile private var maxSeen: String = ""

  /** Monotonic epoch counter (see [[QueueOffset]]); restored from the
    * checkpointed offset on restart via deserializeOffset. */
  @volatile private var curEpoch: Long = 0L

  /** Per-epoch claim records (SQS receipt-handle analog): one file per
    * epoch, named by the epoch's end offset, listing the message names
    * actually PLANNED into it. `commit` acks exactly these — a name that
    * merely sorts at or below the high-water mark (producer clock skew, a
    * late retried write) was never delivered and MUST NOT be deleted.
    * Persisted under the stream's checkpoint location because Spark issues
    * the source-commit for the last epoch of a run on the NEXT run's first
    * trigger — a fresh stream instance that never planned that epoch. */
  private val claimsPath = new Path(checkpointLocation, "graft-claims")
  private def claimsFs = claimsPath.getFileSystem(hadoopConf)

  /** Claim files are keyed by zero-padded epoch number — lexicographic
    * order IS numeric order, and a replayed epoch reuses its number. */
  private def claimName(epoch: Long): String = f"$epoch%020d"

  private def writeClaim(epoch: Long, names: Seq[String]): Unit = {
    val cfs = claimsFs
    cfs.mkdirs(claimsPath)
    val target = new Path(claimsPath, claimName(epoch))
    val tmp = new Path(claimsPath, s".${claimName(epoch)}.tmp")
    val out = cfs.create(tmp, true)
    try out.write(names.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // rename-onto-existing returns false on HDFS-like filesystems (a
    // replayed epoch overwriting its stale claim) — silently ignoring it
    // would leave the old claim in place and re-deliver swept files.
    if (!cfs.rename(tmp, target)) {
      cfs.delete(target, false)
      if (!cfs.rename(tmp, target))
        throw new java.io.IOException(s"graft-queue: cannot write claim $target")
    }
  }

  private def readFully(f: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val in = f.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  private def readClaim(p: Path): Seq[String] =
    readFully(claimsFs, p).split("\n").toSeq.filter(_.nonEmpty)

  /** Per-message delivery counters (the SQS ApproximateReceiveCount
    * analog), persisted under the checkpoint so they survive restarts —
    * each counter file holds how many epochs PLANNED that message.
    * Deleted on ack (bounded storage) and on dead-letter routing. */
  private val receiptsPath = new Path(checkpointLocation, "graft-receipts")
  private def receiptsFs = receiptsPath.getFileSystem(hadoopConf)

  /** Whether ack must also sweep receipt counters. Computed ONCE: with the
    * DLQ on, receipts are being written this run; with it off, this run can
    * never create new receipts, so the single startup `exists` (stale
    * counters from a previous DLQ-enabled run?) stays valid for the life of
    * the stream — no per-commit filesystem RPC on the hot ack path. */
  private lazy val sweepReceipts: Boolean =
    deadLetterDir.isDefined || receiptsFs.exists(receiptsPath)

  /** One delivery = one stream instance planning the message: Spark may
    * re-plan the same uncommitted epoch several times inside one run
    * (restart recovery reconstructs it, then execution plans it again),
    * and counting those as separate receives would race a message to the
    * DLQ in half the intended attempts. */
  private val bumpedThisRun = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def currentReceipt(name: String): Int = {
    val rfs = receiptsFs
    val p = new Path(receiptsPath, name)
    if (rfs.exists(p)) readFully(rfs, p).trim.toIntOption.getOrElse(0) else 0
  }

  private def receiveCount(name: String): Int =
    if (bumpedThisRun.add(name)) bumpReceipt(name) else currentReceipt(name)

  private def bumpReceipt(name: String): Int = {
    val rfs = receiptsFs
    rfs.mkdirs(receiptsPath)
    val p = new Path(receiptsPath, name)
    val next = currentReceipt(name) + 1
    val tmp = new Path(receiptsPath, s".$name.tmp")
    val out = rfs.create(tmp, true)
    try out.write(next.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!rfs.rename(tmp, p)) {
      rfs.delete(p, false)
      if (!rfs.rename(tmp, p))
        throw new java.io.IOException(s"graft-queue: cannot write receipt for $name")
    }
    next
  }

  /** Redrive: messages delivered more than `maxReceives` times move to the
    * dead-letter dir (atomic rename — the body survives byte-exact for a
    * human or a redrive job) instead of being planned again. Returns the
    * names that stay deliverable. No-op without a deadLetterDir — the
    * redeliver-forever contract stands.
    *
    * The dead-letter dir MUST live on the same FileSystem as the queue dir
    * (enforced below): Hadoop `rename` cannot cross filesystems, and a
    * persistently-false rename silently dropped from this batch would leave
    * the message both un-dead-lettered and un-delivered. A move that still
    * fails after the retry keeps the message IN the batch and keeps its
    * receipt counter (it re-routes next epoch), and logs at error — loud
    * redelivery beats a log line claiming a move that never happened. */
  private def routeDeadLetters(names: Seq[String]): Seq[String] =
    deadLetterDir.fold(names) { dlq =>
      val dlqPath = new Path(dlq)
      require(dlqPath.getFileSystem(hadoopConf).getUri == fs.getUri,
        s"deadLetterDir $dlq must be on the same FileSystem as the queue " +
          s"dir $dir (Hadoop rename cannot move a message across filesystems)")
      names.filter { n =>
        val receives = receiveCount(n)
        if (receives <= maxReceives) true
        else {
          val f = fs
          f.mkdirs(dlqPath)
          val target = new Path(dlqPath, n)
          val moved = f.rename(new Path(dirPath, n), target) || {
            // rename-onto-existing (a re-dead-lettered replay) returns false
            // on HDFS-like filesystems: clear the stale copy and retry.
            f.delete(target, false)
            f.rename(new Path(dirPath, n), target)
          }
          if (moved) {
            receiptsFs.delete(new Path(receiptsPath, n), false)
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"graft-queue: message $n exceeded maxReceives=$maxReceives " +
                s"($receives deliveries); moved to dead-letter dir $dlq")
          } else
            org.slf4j.LoggerFactory.getLogger(getClass).error(
              s"graft-queue: could not move $n to dead-letter dir $dlq " +
                s"(rename failed); keeping it in the batch — it stays " +
                s"visible and will re-route next epoch")
          !moved
        }
      }
    }

  /** (epoch number, claimed names) for every not-yet-committed epoch.
    * Only the exact zero-padded 20-digit [[claimName]] format is accepted;
    * anything else in the directory is a claim written by a pre-epoch
    * version of this source (named by message name). Treating such a name
    * leniently is dangerous both ways — a non-numeric name would orphan
    * its messages' acks, and a NUMERIC legacy message name would parse as
    * a bogus far-future epoch whose names are never swept but eventually
    * deleted by commit. Deleting the stale claim instead redelivers its
    * messages (they are still visible in the queue dir) — exactly the
    * at-least-once answer. */
  private def allClaims(): Seq[(Long, Seq[String])] = {
    val cfs = claimsFs
    if (!cfs.exists(claimsPath)) Seq.empty
    else cfs.listStatus(claimsPath).iterator
      .filter(_.isFile)
      .map(_.getPath)
      .filter(p => QueueSource.isVisible(p.getName))
      .flatMap { p =>
        val name = p.getName
        if (name.length == 20 && name.forall(_.isDigit))
          name.toLongOption.map(_ -> readClaim(p))
        else {
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"graft-queue: dropping legacy/foreign claim file $name; " +
              "its messages stay visible and will be redelivered")
          cfs.delete(p, false)
          None
        }
      }
      .toSeq
  }

  private def visibleFiles(): Seq[String] =
    if (!fs.exists(dirPath)) Seq.empty
    else fs.listStatus(dirPath).iterator
      .filter(_.isFile)
      .map(_.getPath.getName)
      .filter(QueueSource.isVisible)
      .toSeq.sorted

  override def initialOffset(): Offset = QueueOffset("", 0L)

  /** Snapshot taken by Trigger.AvailableNow at query start: the run drains
    * messages up to this name (in capped batches when maxFilesPerTrigger is
    * set) and then terminates, ignoring later arrivals — Spark's
    * SupportsTriggerAvailableNow contract. */
  @volatile private var availableNowTarget: Option[String] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    val v = visibleFiles()
    availableNowTarget = Some(if (v.nonEmpty && v.last > maxSeen) v.last else maxSeen)
  }

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(m => ReadLimit.maxFiles(m)).getOrElse(ReadLimit.allAvailable())

  /** Admission control: advance the high-water mark by at most the read
    * limit's file count per trigger, so a backlog (outage recovery, burst
    * producer) drains as bounded micro-batches instead of one unbounded
    * epoch — the same contract as the file source's maxFilesPerTrigger.
    * Under AvailableNow, additionally never pass the start-of-run target.
    *
    * The epoch counter ALSO advances when no fresh name exists but an
    * unclaimed late name (<= maxSeen) does: the offset must change for
    * Spark to construct the batch that sweeps it — otherwise a clock-skewed
    * producer's message would starve until unrelated fresh traffic arrived
    * (and an AvailableNow run would terminate without draining it). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val visible = visibleFiles()
    val fresh0 = visible.filter(_ > maxSeen)
    val fresh = availableNowTarget.fold(fresh0)(t => fresh0.filter(_ <= t))
    val admitted = limit match {
      case m: ReadMaxFiles => fresh.take(m.maxFiles())
      case _ => fresh
    }
    if (admitted.nonEmpty) {
      maxSeen = admitted.last
      curEpoch += 1
    } else {
      val claims = allClaims()
      val claimed = claims.iterator.flatMap(_._2).toSet
      val sweepable = visible.exists(n => n <= maxSeen && !claimed(n))
      // Under AvailableNow, also flush PENDING ACKS: Spark only fires
      // source.commit(N) while constructing batch N+1, so without one
      // final (empty) epoch a drain-and-terminate run would exit with its
      // last batch processed but never acked — the next run would replay
      // it (safe but wasteful). One bump per pending claim set; the empty
      // epoch writes no claim, so this terminates.
      val pendingAck = availableNowTarget.isDefined && claims.exists(_._2.nonEmpty)
      if (sweepable || pendingAck) curEpoch += 1
    }
    QueueOffset(maxSeen, curEpoch)
  }

  /** The true newest visible name, regardless of admission caps (progress
    * reporting / lag metrics). */
  override def reportLatestOffset(): Offset = {
    val v = visibleFiles()
    QueueOffset(if (v.nonEmpty && v.last > maxSeen) v.last else maxSeen, curEpoch)
  }

  override def latestOffset(): Offset =
    throw new IllegalStateException(
      "latestOffset(Offset, ReadLimit) should be called (SupportsAdmissionControl)")

  override def deserializeOffset(json: String): Offset = {
    val withEpoch = """\{"last":"(.*)","epoch":(\d+)\}""".r
    val legacy = """\{"last":"(.*)"\}""".r
    def unesc(v: String) = v.replace("\\\"", "\"").replace("\\\\", "\\")
    json match {
      case withEpoch(v, e) =>
        val last = unesc(v)
        if (last > maxSeen) maxSeen = last
        if (e.toLong > curEpoch) curEpoch = e.toLong
        QueueOffset(last, e.toLong)
      case legacy(v) => // checkpoint written before the epoch counter existed
        val last = unesc(v)
        if (last > maxSeen) maxSeen = last
        QueueOffset(last, 0L)
      case _ => throw new IllegalArgumentException(s"bad queue offset: $json")
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[QueueOffset].last
    val endOff = end.asInstanceOf[QueueOffset]
    val hi = endOff.last
    if (hi > maxSeen) maxSeen = hi
    if (endOff.epoch > curEpoch) curEpoch = endOff.epoch
    val visible = visibleFiles()
    // A visible name at/below the start offset that no in-flight epoch has
    // claimed is a LATE writer (producer clock skew / retried write): it was
    // never delivered, so sweep it into this batch — redelivery beats the
    // silent loss of assuming every low-sorting name was already handled.
    // (Names of the just-processed previous epoch are still visible until
    // its commit fires one trigger later, but they sit in its claim record,
    // so the sweep never double-plans them. Batch content for a replayed
    // offset range may thus gain a late file — at-least-once, idempotent
    // sink.)
    val alreadyClaimed = allClaims().iterator
      .filter { case (epoch, _) => epoch != endOff.epoch } // replan overwrites self
      .flatMap(_._2).toSet
    val inRange = visible.filter(n => n > lo && n <= hi)
    // The sweep honors maxFilesPerTrigger too: the admitted range already
    // respects the cap, so late names only fill the REMAINING budget; the
    // rest stay unclaimed and the epoch-counter liveness path drains them
    // over subsequent capped batches.
    val sweepBudget = maxFilesPerTrigger
      .map(m => math.max(0, m - inRange.length)).getOrElse(Int.MaxValue)
    val swept = visible
      .filter(n => n <= lo && !alreadyClaimed(n)).take(sweepBudget)
    val names = routeDeadLetters(inRange ++ swept)
    // No claim for an empty epoch (the ack-flush batch) — an empty claim
    // would itself read as pending and loop the flush forever.
    if (names.nonEmpty) writeClaim(endOff.epoch, names)
    else claimsFs.delete(new Path(claimsPath, claimName(endOff.epoch)), false)
    names
      .map(n => QueueMessagePartition(new Path(dirPath, n).toString, n): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new QueueReaderFactory

  /** Ack: the epoch's sink work is durably committed — delete exactly the
    * messages PLANNED into epochs at or below this offset, never every name
    * that happens to sort below it (a never-planned late writer would be
    * silently lost otherwise; it is instead swept into a later batch by
    * planInputPartitions and logged here). Failed/interrupted epochs never
    * reach here, so their messages stay visible for redelivery (the
    * visibility-timeout analog). */
  override def commit(end: Offset): Unit = {
    val endOff = end.asInstanceOf[QueueOffset]
    if (endOff.last > maxSeen) maxSeen = endOff.last
    if (endOff.epoch > curEpoch) curEpoch = endOff.epoch
    val (acked, inFlight) = allClaims().partition { case (epoch, _) => epoch <= endOff.epoch }
    // Receipts are deleted on ack UNCONDITIONALLY (when a receipts dir
    // exists at all), not only when THIS run has the DLQ options: counters
    // written by a previous DLQ-enabled run would otherwise leak under the
    // checkpoint forever — and silently resume counting if the option were
    // re-enabled, racing an innocent redelivered message to the DLQ.
    acked.iterator.flatMap(_._2).foreach { n =>
      fs.delete(new Path(dirPath, n), false)
      if (sweepReceipts)
        receiptsFs.delete(new Path(receiptsPath, n), false)
    }
    acked.foreach { case (epoch, _) =>
      claimsFs.delete(new Path(claimsPath, claimName(epoch)), false)
    }
    // Late names already swept into a still-in-flight epoch are claimed,
    // not stray.
    val inFlightNames = inFlight.iterator.flatMap(_._2).toSet
    val strays = visibleFiles().filter(n => n <= endOff.last && !inFlightNames(n))
    if (strays.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"graft-queue: ${strays.size} late message(s) at/below the committed " +
          s"offset were never planned (producer naming-contract violation?); " +
          s"kept for the next batch's sweep: ${strays.take(5).mkString(", ")}")
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
