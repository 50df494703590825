package graft.stream.queue

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** One received remote-queue message. `receiptHandle` is the ack token
  * (SQS semantics: deleting by receipt, not by id). */
case class QueueMessage(id: String, receiptHandle: String, body: String)

/** Minimal remote-queue client surface — the SQS subset the reference
  * consumer uses (long-poll receive + delete-by-receipt,
  * `/root/reference/src/consumer.py:55-64,152-156`). A production binding
  * wraps the AWS SDK `SqsClient` 1:1 behind this trait; the build carries
  * no SDK dependency (none exists in this environment), which is exactly
  * the point of the seam: tests drive a recording fake through the same
  * calls the SDK binding would receive. */
trait QueueClient {
  /** Long-poll: up to `max` messages, waiting up to `waitSeconds`. An
    * un-deleted message becomes visible again after its visibility
    * timeout (the at-least-once contract the drainer leans on). */
  def receive(max: Int, waitSeconds: Int): Seq[QueueMessage]

  /** Ack one message; it will never be redelivered. */
  def delete(receiptHandle: String): Unit
}

/** SQS → queue-directory bridge: the deploy shim that feeds the
  * [[QueueSource]] DSv2 stream from a real remote queue. Each received
  * message lands as one FILE in the queue dir under the source's producer
  * contract — written to a hidden `.tmp` then renamed (atomic
  * appearance), with monotonically increasing zero-padded sequence names
  * (restart-safe: the sequence resumes above the highest name already in
  * the dir).
  *
  * Delivery protocol, in order, per message:
  *   1. receive from the remote queue;
  *   2. write + rename into the queue dir (now durably visible to the
  *      Spark stream);
  *   3. delete (ack) on the remote queue.
  * A crash between 2 and 3 leaves the message both landed AND
  * undeleted → the remote queue redelivers it after the visibility
  * timeout and it lands AGAIN under a new higher name — at-least-once,
  * absorbed downstream by the pipeline's idempotency (COMPLETED
  * short-circuit + row-hash anti-join, README ADR-001), the same
  * duplicate-delivery story the reference accepts from SQS itself.
  * Poison bodies pass through byte-exact: disposition is the parse
  * stage's job ([[graft.stream.JobDispatch.parseMessages]]), not the
  * transport's.
  *
  * The dir is any Hadoop FileSystem path — local, HDFS, or s3a — so the
  * landing zone itself can be object storage. */
class SqsDrainer(
    client: QueueClient,
    hadoopConf: Configuration,
    queueDir: String) {

  private val dirPath = new Path(queueDir)
  private def fs = dirPath.getFileSystem(hadoopConf)

  private val seq = new java.util.concurrent.atomic.AtomicLong(initialSeq())

  /** Resume numbering above whatever a previous drainer left behind, so
    * names stay monotonic across restarts (the source's offset
    * high-water requires it). */
  private def initialSeq(): Long = {
    val f = fs
    if (!f.exists(dirPath)) { f.mkdirs(dirPath); 0L }
    else {
      val seqs = f.listStatus(dirPath).toSeq.map(_.getPath.getName)
        .filter(QueueSource.isVisible)
        .flatMap { n =>
          val digits = n.takeWhile(_.isDigit)
          if (digits.isEmpty) None else scala.util.Try(digits.toLong).toOption
        }
      seqs.foldLeft(-1L)(math.max) + 1
    }
  }

  /** Message ids become file-name suffixes; keep them inside the
    * source's visible-name contract (no control chars, no leading dot). */
  private def sanitize(id: String): String =
    id.map(c => if (c.isLetterOrDigit || c == '-' || c == '.') c else '_').take(80)

  /** One long-poll round: land every received message, acking each only
    * AFTER its file is visible. Returns the number landed. Throws on
    * filesystem failure with the message UN-acked — it redelivers. */
  def drainOnce(max: Int = 10, waitSeconds: Int = 20): Int = {
    val msgs = client.receive(max, waitSeconds)
    val f = fs
    if (msgs.nonEmpty && !f.exists(dirPath)) f.mkdirs(dirPath)
    msgs.foreach { m =>
      val name = f"${seq.getAndIncrement()}%020d-${sanitize(m.id)}"
      val tmp = new Path(dirPath, s".$name.tmp")
      val out = f.create(tmp, true)
      try out.write(m.body.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      val target = new Path(dirPath, name)
      if (!f.rename(tmp, target)) {
        // rename-onto-existing returns false on HDFS-like filesystems;
        // clear and retry once (same recovery as the QueueSource tests'
        // producer helper).
        f.delete(target, false)
        if (!f.rename(tmp, target))
          throw new java.io.IOException(
            s"cannot stage message ${m.id} into $queueDir")
      }
      client.delete(m.receiptHandle) // ack strictly after visibility
    }
    msgs.size
  }

  /** Long-poll loop until `stop()` returns true; sleeps `idleSleepMs`
    * after an empty round (long-polling already absorbs most idle time).
    * Returns total messages landed. */
  def run(
      stop: () => Boolean,
      max: Int = 10,
      waitSeconds: Int = 20,
      idleSleepMs: Long = 0L): Long = {
    var landed = 0L
    while (!stop()) {
      val n = drainOnce(max, waitSeconds)
      landed += n
      if (n == 0 && idleSleepMs > 0) Thread.sleep(idleSleepMs)
    }
    landed
  }
}

object SqsDrainer {
  /** Deploy entry point:
    * `runMain graft.stream.queue.SqsDrainer <clientClass> <queueDir> [maxPerPoll] [waitSeconds]`
    *
    * `clientClass` is a no-arg-constructible [[QueueClient]]
    * implementation on the classpath — in production, a thin AWS-SDK
    * binding configured via its own environment (queue URL, region,
    * credentials provider chain); the engine itself never links the SDK.
    * Runs until the process is killed; every landed file appears
    * atomically, so a concurrently-running stream never sees a torn
    * message. */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: SqsDrainer <queueClientClass> <queueDir> [maxPerPoll] [waitSeconds]")
    val client = Class.forName(args(0)).getDeclaredConstructor()
      .newInstance().asInstanceOf[QueueClient]
    val drainer = new SqsDrainer(client, new Configuration(), args(1))
    val max = if (args.length > 2) args(2).toInt else 10
    val wait = if (args.length > 3) args(3).toInt else 20
    drainer.run(() => false, max, wait)
  }
}
