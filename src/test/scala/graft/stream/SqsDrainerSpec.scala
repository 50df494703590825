package graft.stream

import java.net.URI
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.stream.queue.{QueueClient, QueueMessage, SqsDrainer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** A Hadoop FileSystem registered under a custom scheme, backed by the
  * local disk — the filesystem-contract stand-in for s3a (no hadoop-aws
  * jar exists in this environment): any code that works through a
  * `graftfs://` path is using the FileSystem abstraction, which is the
  * exact seam an s3a:// deployment plugs into. Top-level class —
  * Hadoop instantiates it reflectively. */
class GraftTestFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: URI = URI.create("graftfs:///")
  override def getScheme: String = "graftfs"
}

/** SQS→queue-dir bridge: atomic landing, ack-only-after-visible,
  * at-least-once redelivery on crash, restart-safe monotonic naming, and
  * end-to-end preservation of poison semantics through the graft-queue
  * stream. */
class SqsDrainerSpec extends SparkSpec {
  import spark.implicits._

  /** Recording fake with SQS visibility semantics: an un-deleted message
    * stays receivable (visibility timeout elapsed between rounds). */
  private class FakeQueue(
      initial: Seq[(String, String)], queueDir: String) extends QueueClient {
    private val pending =
      scala.collection.mutable.LinkedHashMap[String, String]() ++= initial
    val events = scala.collection.mutable.ArrayBuffer[String]()
    var failDeletesOnce: Set[String] = Set.empty

    override def receive(max: Int, waitSeconds: Int): Seq[QueueMessage] =
      pending.take(max).toSeq.map { case (id, body) =>
        events += s"receive:$id"
        QueueMessage(id, s"rh-$id", body)
      }

    override def delete(rh: String): Unit = {
      val id = rh.stripPrefix("rh-")
      // The drainer's contract: by ack time the message file is VISIBLE.
      val landed = Files.list(Paths.get(queueDir)).iterator()
      val names = scala.collection.mutable.ArrayBuffer[String]()
      while (landed.hasNext) names += landed.next().getFileName.toString
      assert(names.exists(n => n.endsWith(s"-$id") && !n.endsWith(".tmp")),
        s"ack for $id before its file was visible: $names")
      if (failDeletesOnce(id)) {
        failDeletesOnce -= id
        events += s"delete-fail:$id"
        throw new RuntimeException(s"network blip deleting $id")
      }
      pending -= id
      events += s"delete:$id"
    }

    def visible: Seq[String] = pending.keys.toSeq
  }

  private def hconf = spark.sparkContext.hadoopConfiguration

  /** Visible queue files — the QueueSource contract's view (hidden names
    * like Hadoop's local `.crc` sidecars and staged `.tmp`s are invisible
    * to the stream and to this listing). */
  private def listDir(dir: String): Seq[String] = {
    val s = Files.list(Paths.get(dir))
    try {
      val it = s.iterator()
      val acc = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) acc += it.next().getFileName.toString
      acc.toSeq.sorted
        .filterNot(n => n.startsWith(".") || n.startsWith("_") || n.endsWith(".tmp"))
    } finally s.close()
  }

  test("drainOnce: atomic landing, byte-exact bodies, monotonic names, ack after visible") {
    val dir = Files.createTempDirectory("drainer").toString
    val msgs = Seq(
      "ma" -> """{"job_id": 1, "s3_key": "a.csv"}""",
      "mb" -> """not json at all""",
      "mc" -> """{"job_id": 2}""")
    val q = new FakeQueue(msgs, dir)
    val n = new SqsDrainer(q, hconf, dir).drainOnce(max = 10, waitSeconds = 0)
    assert(n === 3)
    val files = listDir(dir)
    assert(files.forall(f => !f.endsWith(".tmp") && !f.startsWith(".")), files)
    assert(files.map(_.takeWhile(_.isDigit).toLong) === Seq(0L, 1L, 2L))
    val bodies = files.map(f => Files.readString(Paths.get(s"$dir/$f")))
    assert(bodies === msgs.map(_._2)) // byte-exact, in order
    assert(q.visible.isEmpty) // everything acked
  }

  test("crash between landing and ack: message redelivers, lands again, at-least-once") {
    val dir = Files.createTempDirectory("drainer_retry").toString
    val q = new FakeQueue(Seq("mx" -> """{"job_id": 9, "s3_key": "x.csv"}"""), dir)
    q.failDeletesOnce = Set("mx")
    val d = new SqsDrainer(q, hconf, dir)
    intercept[RuntimeException] { d.drainOnce(waitSeconds = 0) }
    // landed but unacked -> still visible remotely
    assert(listDir(dir).size === 1 && q.visible === Seq("mx"))
    // visibility timeout elapses; the next round redelivers and acks
    assert(d.drainOnce(waitSeconds = 0) === 1)
    assert(q.visible.isEmpty)
    val files = listDir(dir)
    assert(files.size === 2, files) // duplicate file = at-least-once
    assert(files.map(_.takeWhile(_.isDigit).toLong) === Seq(0L, 1L))
    // Downstream absorbs the duplicate: both copies parse VALID for the
    // same job, and the pipeline's COMPLETED short-circuit (QueueSourceSpec
    // "replayed message is an idempotent no-op") makes the second a no-op.
    val parsed = JobDispatch.parseMessages(
      files.map(f => Files.readString(Paths.get(s"$dir/$f"))).toDF("value"))
    assert(parsed.select("disposition").as[String].collect().toSeq ===
      Seq("VALID", "VALID"))
  }

  test("restart resumes the sequence above existing names (offset monotonicity)") {
    val dir = Files.createTempDirectory("drainer_restart").toString
    val q1 = new FakeQueue(Seq("a" -> "1", "b" -> "2"), dir)
    new SqsDrainer(q1, hconf, dir).drainOnce(waitSeconds = 0)
    val q2 = new FakeQueue(Seq("c" -> "3"), dir)
    new SqsDrainer(q2, hconf, dir).drainOnce(waitSeconds = 0)
    assert(listDir(dir).map(_.takeWhile(_.isDigit).toLong) === Seq(0L, 1L, 2L))
  }

  test("e2e: drained messages flow through graft-queue with poison semantics intact") {
    val root = Files.createTempDirectory("drainer_e2e").toString
    val dir = s"$root/queue"
    Files.createDirectories(Paths.get(dir))
    val q = new FakeQueue(Seq(
      "ok" -> """{"job_id": 3, "s3_key": "f.csv"}""",
      "poison" -> """{{{ garbage""",
      "partial" -> """{"job_id": 4}"""), dir)
    new SqsDrainer(q, hconf, dir).drainOnce(waitSeconds = 0)

    val got = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val stream = spark.readStream.format("graft-queue").load(dir)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/cp")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        got ++= JobDispatch.parseMessages(batch)
          .select("body", "disposition").as[(String, String)].collect()
        ()
      }.start()
    stream.awaitTermination(120000); stream.stop()

    assert(got.toMap === Map(
      """{"job_id": 3, "s3_key": "f.csv"}""" -> "VALID",
      """{{{ garbage""" -> "POISON_MALFORMED",
      """{"job_id": 4}""" -> "POISON_MISSING_FIELD"))
  }

  test("filesystem contract: the drainer and CSV ingest work through a non-file scheme") {
    // graftfs:// resolves through Hadoop's FileSystem registry exactly the
    // way s3a:// would — this pins that both the drainer's landing zone
    // and the ingest read path go through the FS abstraction, never
    // java.io directly.
    hconf.set("fs.graftfs.impl", classOf[GraftTestFileSystem].getName)
    val local = Files.createTempDirectory("graftfs").toString
    val dir = s"graftfs://$local/queue"
    val q = new FakeQueue(Seq("m1" -> """{"job_id": 1, "s3_key": "k"}"""),
      s"$local/queue")
    assert(new SqsDrainer(q, hconf, dir).drainOnce(waitSeconds = 0) === 1)
    assert(listDir(s"$local/queue").size === 1)

    Files.writeString(Paths.get(s"$local/in.csv"),
      "email;first_name;last_name;company\na@b.co;Ann;Bee;Acme\n")
    val df = graft.ingest.CsvSource.read(spark, s"graftfs://$local/in.csv")
    assert(df.count() === 1)
    assert(df.columns.contains("email"))
  }
}
