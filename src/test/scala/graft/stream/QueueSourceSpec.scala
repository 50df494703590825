package graft.stream

import graft.SparkSpec
import graft.io.ParquetTableStore
import graft.model.Schemas.JobStatus
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths}

/** Native queue source (graft-queue) protocol tests: delivery, ack-on-commit
  * (message deletion), poison handling, and redelivery of messages from an
  * epoch that failed before commit — the reference consumer's
  * visibility-timeout contract (consumer.py:55-221).
  *
  * Spark's commit cadence acks epoch N while constructing epoch N+1; under
  * Trigger.AvailableNow the source flushes pending acks with one final empty
  * epoch before the run terminates (SQS drain-then-shutdown), so an
  * AvailableNow run ends with every processed message deleted.
  */
class QueueSourceSpec extends SparkSpec {
  import spark.implicits._

  private def enqueue(dir: String, name: String, body: String): Unit = {
    // Producer contract: atomic appearance (write temp, then rename in).
    val tmp = Files.writeString(Paths.get(s"$dir/.$name.tmp"), body)
    Files.move(tmp, Paths.get(s"$dir/$name"))
  }

  private def queueFiles(dir: String): Seq[String] = {
    val s = Files.list(Paths.get(dir))
    try {
      val it = s.iterator()
      val acc = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) acc += it.next().getFileName.toString
      acc.toSeq.sorted
    } finally s.close()
  }

  test("messages are delivered once; ack deletes them on the next epoch") {
    val root = Files.createTempDirectory("graft_queue").toString
    val store = new ParquetTableStore(spark, root + "/tables")
    Files.createDirectories(Paths.get(root + "/queue"))
    Files.createDirectories(Paths.get(root + "/uploads"))
    store.overwrite("jobs", Seq((1, "u1", JobStatus.Pending))
      .toDF("job_id", "job_user_id", "job_status"))
    Files.writeString(Paths.get(root + "/uploads/f1.csv"),
      "email,first_name,last_name,company\nok@b.co,Ann,Bee,Acme\n")

    enqueue(root + "/queue", "m001", """{"job_id": 1, "s3_key": "f1.csv"}""")
    enqueue(root + "/queue", "m002", """this is not json""")

    def run(): Unit = {
      val q = JobDispatch.startQueue(
        spark, store, root + "/queue", root + "/cp",
        key => s"$root/uploads/$key", Trigger.AvailableNow())
      q.awaitTermination(120000); q.stop()
    }
    run()
    assert(store.load("jobs").select("job_status").as[String].head() === JobStatus.Completed)
    assert(store.load("contacts").count() === 1)

    // The AvailableNow drain flushes the ack before terminating: m001
    // (success) and m002 (poison) are both deleted by the time the run ends.
    assert(queueFiles(root + "/queue").isEmpty,
      s"unacked messages left after drain: ${queueFiles(root + "/queue")}")

    // A replayed message is an idempotent no-op (COMPLETED short-circuit)
    // and is itself acked on the way out.
    enqueue(root + "/queue", "m003", """{"job_id": 1, "s3_key": "f1.csv"}""")
    run()
    assert(queueFiles(root + "/queue").isEmpty)
    assert(store.load("contacts").count() === 1)
  }

  test("a failed epoch never acks: messages stay visible and are redelivered") {
    val root = Files.createTempDirectory("graft_queue_retry").toString
    Files.createDirectories(Paths.get(root + "/queue"))
    enqueue(root + "/queue", "m001", """{"job_id": 5, "s3_key": "x.csv"}""")

    // First attempt: the batch processor throws AFTER seeing the message —
    // the epoch fails, commit never runs, the message must survive.
    @volatile var attempts = 0
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    def run(failFirst: Boolean) = {
      val q = spark.readStream.format("graft-queue").load(root + "/queue")
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", root + "/cp")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val bodies = batch.select("value").as[String](implicitly).collect()
          if (bodies.nonEmpty) {
            attempts += 1
            if (failFirst && attempts == 1) sys.error("simulated processing failure")
            seen ++= bodies
          }
          ()
        }
        .start()
      try q.awaitTermination(120000)
      catch { case _: Exception => () } // first run fails by design
      q.stop()
    }

    run(failFirst = true)
    assert(attempts === 1)
    assert(queueFiles(root + "/queue") === Seq("m001"),
      "message was acked by a FAILED epoch")

    // Restart with the same checkpoint: the uncommitted message is
    // redelivered (visibility-timeout analog), processed exactly once, and
    // acked by the run's drain flush.
    run(failFirst = false)
    assert(seen.toSeq === Seq("""{"job_id": 5, "s3_key": "x.csv"}"""))
    assert(queueFiles(root + "/queue").isEmpty, "redelivered message not acked")
  }

  test("redrive policy: a crash-looping message moves to the DLQ after maxReceives") {
    val root = Files.createTempDirectory("graft_queue_dlq").toString
    Files.createDirectories(Paths.get(root + "/queue"))
    enqueue(root + "/queue", "m-poison", """{"job_id": 7, "s3_key": "loop.csv"}""")

    val seen = scala.collection.mutable.ArrayBuffer[String]()
    def run(fail: Boolean): Unit = {
      val q = spark.readStream.format("graft-queue")
        .option("deadLetterDir", root + "/dlq")
        .option("maxReceives", "2")
        .load(root + "/queue")
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", root + "/cp")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val bodies = batch.select("value").as[String](implicitly).collect()
          if (fail && bodies.nonEmpty) sys.error("simulated sink failure")
          seen ++= bodies
          ()
        }
        .start()
      try q.awaitTermination(120000)
      catch { case _: Exception => () }
      q.stop()
    }

    run(fail = true)  // delivery 1 — epoch fails, message survives
    run(fail = true)  // delivery 2 (redelivery) — fails again
    assert(queueFiles(root + "/queue") === Seq("m-poison"))
    // Third attempt would be delivery 3 > maxReceives=2: the message is
    // ROUTED to the DLQ at plan time — the sink never sees it again.
    run(fail = false)
    assert(seen.isEmpty, s"dead-lettered message reached the sink: $seen")
    assert(queueFiles(root + "/queue").isEmpty, "message not removed from queue")
    assert(queueFiles(root + "/dlq") === Seq("m-poison"), "message not in DLQ")
    // Body survives byte-exact for a human or a redrive job.
    assert(Files.readString(Paths.get(root + "/dlq/m-poison")) ===
      """{"job_id": 7, "s3_key": "loop.csv"}""")

    // The stream keeps working after routing: a healthy message processes
    // normally and its delivery counter is cleaned on ack.
    enqueue(root + "/queue", "m-ok", "healthy")
    run(fail = false)
    assert(seen.toSeq === Seq("healthy"))
    assert(queueFiles(root + "/queue").isEmpty)
    // Receipts live under the source's resolved checkpoint subpath
    // (cp/sources/N/graft-receipts); after the ack they must be empty.
    val receiptDirs = {
      val s = Files.walk(Paths.get(root + "/cp"))
      try {
        val it = s.iterator()
        val acc = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName.toString == "graft-receipts") acc += p
        }
        acc.toSeq
      } finally s.close()
    }
    assert(receiptDirs.nonEmpty, "receipts dir never created")
    assert(receiptDirs.forall(d => queueFiles(d.toString).isEmpty),
      "acked message left a receipt counter behind")
  }

  test("redrive under dispatch load: crash-looper dead-letters, healthy jobs complete") {
    // End-to-end DLQ through the WAVE DISPATCH path: 6 healthy ingest jobs
    // + 1 message that crashes its epoch every time (simulated infra death
    // while holding the message — the SQS consumer-crash shape; per-JOB
    // failures are isolated by dispatch and never redeliver).
    // maxFilesPerTrigger=1 gives per-message epochs, the strict SQS
    // receive granularity, so the crash-looper's delivery counter rises
    // alone and healthy messages are never co-punished.
    val root = Files.createTempDirectory("graft_queue_dlq_load").toString
    val store = new ParquetTableStore(spark, root + "/tables")
    Files.createDirectories(Paths.get(root + "/queue"))
    Files.createDirectories(Paths.get(root + "/uploads"))
    store.overwrite("jobs", (1 to 6).map(i => (i, s"u$i", JobStatus.Pending))
      .toDF("job_id", "job_user_id", "job_status"))
    Files.writeString(Paths.get(root + "/uploads/f.csv"),
      "email,first_name,last_name,company\nok@b.co,Ann,Bee,Acme\n")
    (1 to 3).foreach(i =>
      enqueue(root + "/queue", f"m$i%03d", s"""{"job_id": $i, "s3_key": "f.csv"}"""))
    enqueue(root + "/queue", "m004-crash-me", """{"job_id": 99, "s3_key": "f.csv"}""")
    (4 to 6).foreach(i =>
      enqueue(root + "/queue", f"m${i + 1}%03d", s"""{"job_id": $i, "s3_key": "f.csv"}"""))

    def drainOnce(): Unit = {
      val q = spark.readStream.format("graft-queue")
        .option("deadLetterDir", root + "/dlq")
        .option("maxReceives", "2")
        .option("maxFilesPerTrigger", "1")
        .load(root + "/queue")
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", root + "/cp")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val ids = batch.select("message_id").as[String](implicitly).collect()
          if (ids.exists(_.contains("crash-me"))) sys.error("injected infra crash")
          JobDispatch.processBatch(spark, store, batch.select("value"),
            key => s"$root/uploads/$key")
          ()
        }.start()
      try q.awaitTermination(180000) catch { case _: Exception => () }
      q.stop()
    }
    // run 1: healthy up to the crasher complete, crash epoch kills the run
    // (delivery 1); run 2: delivery 2; run 3: 3 > maxReceives -> DLQ, and
    // the remaining healthy messages drain.
    var runs = 0
    while (runs < 6 && queueFiles(root + "/queue").nonEmpty) { drainOnce(); runs += 1 }
    assert(queueFiles(root + "/queue").isEmpty, s"queue not drained after $runs runs")
    assert(queueFiles(root + "/dlq") === Seq("m004-crash-me"))
    val statuses = store.load("jobs")
      .select("job_id", "job_status").as[(Int, String)].collect().toMap
    assert((1 to 6).forall(statuses(_) == JobStatus.Completed),
      s"healthy jobs not all completed: $statuses")
    assert(store.load("contacts").count() === 6L)
  }

  test("a deadLetterDir on a different FileSystem is rejected, not silently dropped") {
    // Hadoop rename cannot cross filesystems: the old code ignored the
    // rename result, logged "moved", dropped the message from the batch
    // and reset its counter — redelivering forever while claiming it was
    // dead-lettered. The contract is now validated loudly instead.
    val root = Files.createTempDirectory("graft_queue_xfs").toString
    Files.createDirectories(Paths.get(root + "/queue"))
    enqueue(root + "/queue", "m1", "body")
    val q = spark.readStream.format("graft-queue")
      .option("deadLetterDir", "hdfs://localhost:1/dlq")
      .option("maxReceives", "1")
      .load(root + "/queue")
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", root + "/cp")
      .foreachBatch { (_: DataFrame, _: Long) => () }.start()
    val err = intercept[Exception] { q.awaitTermination(120000) }
    q.stop()
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("same FileSystem")),
      s"expected the same-FileSystem contract error, got: ${messages(err)}")
    // and the message is still there — nothing was silently lost
    assert(queueFiles(root + "/queue") === Seq("m1"))
  }

  test("receipts from a DLQ-enabled run are swept by a later DLQ-less ack") {
    // A counter written under the checkpoint by a DLQ-enabled run must not
    // leak forever when the stream is restarted without the DLQ options —
    // a stale counter would silently resume counting if they return.
    val root = Files.createTempDirectory("graft_queue_stale_rcpt").toString
    Files.createDirectories(Paths.get(root + "/queue"))
    enqueue(root + "/queue", "m1", "body")
    def run(dlq: Boolean, fail: Boolean): Unit = {
      val reader = spark.readStream.format("graft-queue")
      val withOpts = if (dlq)
        reader.option("deadLetterDir", root + "/dlq").option("maxReceives", "5")
      else reader
      val q = withOpts.load(root + "/queue")
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", root + "/cp")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (fail && batch.count() > 0) sys.error("boom")
          ()
        }.start()
      try q.awaitTermination(120000) catch { case _: Exception => () }
      q.stop()
    }
    run(dlq = true, fail = true) // delivery 1: counter written, epoch fails
    val receiptDirs = {
      val s = Files.walk(Paths.get(root + "/cp"))
      try {
        val it = s.iterator()
        val acc = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName.toString == "graft-receipts") acc += p
        }
        acc.toSeq
      } finally s.close()
    }
    assert(receiptDirs.nonEmpty && receiptDirs.exists(d => queueFiles(d.toString).nonEmpty),
      "precondition: the DLQ-enabled failed run should have written a counter")
    run(dlq = false, fail = false) // DLQ-less restart processes + acks
    assert(queueFiles(root + "/queue").isEmpty)
    assert(receiptDirs.forall(d => queueFiles(d.toString).isEmpty),
      "ack without DLQ options leaked the stale receipt counter")
  }

  test("without a deadLetterDir the redeliver-forever contract stands") {
    val root = Files.createTempDirectory("graft_queue_nodlq").toString
    Files.createDirectories(Paths.get(root + "/queue"))
    enqueue(root + "/queue", "m1", "body")
    def run(fail: Boolean): Unit = {
      val q = spark.readStream.format("graft-queue").load(root + "/queue")
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", root + "/cp")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (fail && batch.count() > 0) sys.error("boom")
          ()
        }.start()
      try q.awaitTermination(120000) catch { case _: Exception => () }
      q.stop()
    }
    (1 to 6).foreach(_ => run(fail = true)) // way past any default cap
    assert(queueFiles(root + "/queue") === Seq("m1"), "message was dropped")
    run(fail = false)
    assert(queueFiles(root + "/queue").isEmpty)
  }

  test("late-arriving messages are picked up by subsequent triggers") {
    val root = Files.createTempDirectory("graft_queue_late").toString
    Files.createDirectories(Paths.get(root + "/queue"))
    val seen = scala.collection.mutable.ArrayBuffer[String]()

    enqueue(root + "/queue", "m001", "first")
    def drain(): Unit = {
      val q = spark.readStream.format("graft-queue").load(root + "/queue")
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", root + "/cp")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          seen ++= batch.select("value").as[String](implicitly).collect()
          ()
        }
        .start()
      q.awaitTermination(120000); q.stop()
    }
    drain()
    enqueue(root + "/queue", "m002", "second")
    drain()
    assert(seen.sorted === Seq("first", "second"))
    // Each AvailableNow run drains its own acks before terminating.
    assert(queueFiles(root + "/queue").isEmpty)
  }

  test("maxFilesPerTrigger bounds each micro-batch; AvailableNow still drains all") {
    // Outage-recovery admission control: a 5-message backlog with a cap of 2
    // must drain as ceil(5/2)=3 bounded batches, not one unbounded epoch.
    val root = Files.createTempDirectory("graft_queue_cap").toString
    Files.createDirectories(Paths.get(root + "/queue"))
    (1 to 5).foreach(i => enqueue(root + "/queue", f"m$i%03d", s"msg$i"))
    val batches = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    val q = spark.readStream.format("graft-queue")
      .option("maxFilesPerTrigger", "2")
      .load(root + "/queue")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", root + "/cp")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.select("value").as[String](implicitly).collect().toSeq
        if (rows.nonEmpty) batches += rows
        ()
      }
      .start()
    q.awaitTermination(120000); q.stop()
    assert(batches.flatten.sorted === (1 to 5).map(i => s"msg$i"))
    assert(batches.forall(_.size <= 2), s"batch over cap: ${batches.map(_.size)}")
    assert(batches.size === 3)
  }

  test("a late LOW-sorting message survives commit and is swept into the next batch") {
    // Producer clock skew: a name that sorts BELOW the already-committed
    // high-water mark appears after that epoch processed. The old-style
    // "delete everything <= hi" ack would silently destroy it; the claim
    // records must preserve it AND a later batch must actually deliver it.
    val root = Files.createTempDirectory("graft_queue_skew").toString
    Files.createDirectories(Paths.get(root + "/queue"))
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    def drain(): Unit = {
      val q = spark.readStream.format("graft-queue").load(root + "/queue")
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", root + "/cp")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          seen ++= batch.select("value").as[String](implicitly).collect()
          ()
        }
        .start()
      q.awaitTermination(120000); q.stop()
    }

    enqueue(root + "/queue", "m100", "on-time")
    drain()
    assert(seen.toSeq === Seq("on-time"))

    // Late writer lands below the m100 mark (m100 itself is already acked
    // by the first run's drain); m200 arrives as fresh traffic alongside.
    enqueue(root + "/queue", "m050", "late-low")
    enqueue(root + "/queue", "m200", "next")
    drain()
    // The sweep delivered both new messages, and the drain acked exactly
    // the claimed pair — the old "delete everything <= hi" ack would have
    // destroyed m050 before it was ever read.
    assert(seen.sorted === Seq("late-low", "next", "on-time"))
    assert(queueFiles(root + "/queue").isEmpty,
      "late low-sorting message was not acked by the epoch that processed it")
  }

  test("a late LOW-sorting message is delivered even with NO fresh traffic after it") {
    // Liveness: the epoch counter must advance the offset when only a
    // below-high-water name is pending — without it, an AvailableNow run
    // would terminate having drained nothing (and a continuous stream
    // would starve the message until unrelated traffic arrived).
    val root = Files.createTempDirectory("graft_queue_starve").toString
    Files.createDirectories(Paths.get(root + "/queue"))
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    def drain(): Unit = {
      val q = spark.readStream.format("graft-queue").load(root + "/queue")
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", root + "/cp")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          seen ++= batch.select("value").as[String](implicitly).collect()
          ()
        }
        .start()
      q.awaitTermination(120000); q.stop()
    }

    enqueue(root + "/queue", "m100", "on-time")
    drain()
    assert(seen.toSeq === Seq("on-time"))

    // ONLY the clock-skewed writer arrives — nothing sorts above m100.
    enqueue(root + "/queue", "m050", "late-low")
    drain()
    assert(seen.sorted === Seq("late-low", "on-time"),
      "late low-sorting message starved without fresh traffic")

    // And it acks once its epoch commits (flushed by the next run).
    drain()
    assert(queueFiles(root + "/queue").isEmpty,
      s"expected empty queue, got ${queueFiles(root + "/queue")}")
  }

  test("a legacy (pre-epoch) claim file is dropped and its message redelivered") {
    // Claims used to be keyed by message NAME; a numeric legacy name would
    // otherwise parse as a bogus far-future epoch (never swept, eventually
    // deleted unprocessed). The source must delete the foreign claim and
    // let the still-visible message redeliver — at-least-once, never loss.
    val root = Files.createTempDirectory("graft_queue_legacy").toString
    Files.createDirectories(Paths.get(root + "/queue"))
    Files.createDirectories(Paths.get(root + "/cp/sources/0/graft-claims"))
    enqueue(root + "/queue", "1699999999", "numeric-name")
    // legacy claim: named by the message name, listing that message
    Files.writeString(
      Paths.get(root + "/cp/sources/0/graft-claims/1699999999"), "1699999999")

    val seen = scala.collection.mutable.ArrayBuffer[String]()
    val q = spark.readStream.format("graft-queue").load(root + "/queue")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", root + "/cp")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        seen ++= batch.select("value").as[String](implicitly).collect()
        ()
      }
      .start()
    q.awaitTermination(120000); q.stop()

    assert(seen.toSeq === Seq("numeric-name"), "legacy-claimed message not redelivered")
    assert(queueFiles(root + "/queue").isEmpty, "redelivered message not acked")
    assert(queueFiles(root + "/cp/sources/0/graft-claims")
      .forall(n => n.length == 20 && n.forall(_.isDigit)),
      "legacy claim file survived")
  }

  test("message names with control characters are ignored (offset-log safety)") {
    val root = Files.createTempDirectory("graft_queue_ctl").toString
    Files.createDirectories(Paths.get(root + "/queue"))
    enqueue(root + "/queue", "m001", "good")
    Files.writeString(Paths.get(root + "/queue/m0\n2"), "bad-name")
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    val q = spark.readStream.format("graft-queue").load(root + "/queue")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", root + "/cp")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        seen ++= batch.select("value").as[String](implicitly).collect()
        ()
      }
      .start()
    q.awaitTermination(120000); q.stop()
    assert(seen.toSeq === Seq("good"), "control-char name was planned into a batch")
    // the out-of-contract file is left alone, never deleted
    assert(queueFiles(root + "/queue").contains("m0\n2"))
  }
}
