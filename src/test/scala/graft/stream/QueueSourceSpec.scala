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
  * Spark's commit cadence acks epoch N while constructing epoch N+1, so
  * deletion asserts run after a follow-up batch (see QueueSource scaladoc).
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

    // The ack for the processed epoch is issued when the NEXT epoch is
    // constructed: enqueue a replay message (idempotent no-op) and run again.
    // m001 (success) and m002 (poison) must both be deleted.
    enqueue(root + "/queue", "m003", """{"job_id": 1, "s3_key": "f1.csv"}""")
    run()
    assert(queueFiles(root + "/queue") === Seq("m003"))
    // Replay stayed a no-op (COMPLETED short-circuit):
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
    // redelivered (visibility-timeout analog) and processed exactly once.
    run(failFirst = false)
    assert(seen.toSeq === Seq("""{"job_id": 5, "s3_key": "x.csv"}"""))

    // A follow-up epoch flushes the ack for the (now committed) redelivery.
    enqueue(root + "/queue", "m002", "flush")
    run(failFirst = false)
    assert(queueFiles(root + "/queue") === Seq("m002"), "redelivered message not acked")
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
    // m001's ack flushed with m002's epoch; m002's own ack is pending.
    assert(queueFiles(root + "/queue") === Seq("m002"))
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

    // Late writer lands below the m100 mark; m200 advances the offset so the
    // next run has a batch to construct (and to flush m100's pending ack).
    enqueue(root + "/queue", "m050", "late-low")
    enqueue(root + "/queue", "m200", "next")
    drain()
    // The commit for m100's epoch fired during this run and must NOT have
    // taken m050 with it; the sweep delivered both new messages.
    assert(seen.sorted === Seq("late-low", "next", "on-time"))

    // Flush the (m050, m200) epoch's ack: both get deleted, nothing else.
    enqueue(root + "/queue", "m300", "flush")
    drain()
    assert(seen.sorted === Seq("flush", "late-low", "next", "on-time"))
    assert(queueFiles(root + "/queue") === Seq("m300"),
      "late low-sorting message was not acked by the epoch that processed it")
  }
}
