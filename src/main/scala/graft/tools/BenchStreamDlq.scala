package graft.tools

import graft.io.ParquetTableStore
import graft.model.Schemas.JobStatus
import graft.stream.JobDispatch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** DLQ-enabled streaming dispatch record — two measurements
  * ([[BenchStream]] is the no-DLQ throughput record):
  *
  *   A. `dlq_overhead`: the SAME healthy drain as BenchStream but with
  *      the redrive policy active (deadLetterDir + maxReceives), so every
  *      message pays its delivery-counter write + ack sweep. Proves the
  *      DLQ bookkeeping keeps the drain inside the jobs/min band.
  *
  *   B. `dlq_drill`: a drain where injected messages CRASH their epoch
  *      every delivery (simulated infra death holding the message — the
  *      shape SQS's redrive policy exists for; per-JOB failures are
  *      isolated by dispatch and never redeliver). Run with
  *      maxFilesPerTrigger=1 — the strict SQS per-message receive
  *      granularity, so crash-loopers' counters rise alone; with wider
  *      batches an epoch's whole cohort shares the crasher's failures
  *      and would dead-letter WITH it (documented in QueueSource).
  *      Asserts: every crasher in the DLQ, every healthy job COMPLETED,
  *      queue empty.
  *
  *   C. (`sustained` mode) the round-8 sustained record (500 jobs +
  *      compaction) WITH poison in the queue: nCrash crash-every-delivery
  *      messages named to sort FIRST, swept into the DLQ at strict
  *      per-message granularity (the redrive policy working — each
  *      crasher's counter rises alone), then the FULL healthy drain at
  *      wave width with the redrive bookkeeping still active and storage
  *      maintenance on (maintainEvery=4, the r8 sustained shape).
  *      Asserts: DLQ holds exactly the crashers BYTE-EXACT (dead-letter
  *      is an atomic rename — name and body survive), every healthy job
  *      COMPLETED, contacts exact, queue empty. The sweep runs first
  *      because redelivery granularity is the EPOCH: a crasher inside a
  *      wide healthy wave dead-letters its whole cohort (documented in
  *      QueueSource) — strict granularity while poison is present, wave
  *      width after, is the operational contract.
  *
  * Usage: BenchStreamDlq [sfDir] [nJobs] [nCrash] [sustained]
  */
object BenchStreamDlq {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nJobs = if (args.length > 1) args(1).toInt else 100
    val nCrash = if (args.length > 2) args(2).toInt else 2
    val sustained = args.length > 3 && args(3) == "sustained"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def newRig(n: Int): (String, ParquetTableStore, Int) = {
      val root = Files.createTempDirectory("graft_stream_dlq").toString
      Files.createDirectories(Paths.get(s"$root/queue"))
      Files.createDirectories(Paths.get(s"$root/uploads"))
      val store = new ParquetTableStore(spark, s"$root/tables")
      store.overwrite("jobs", (1 to n).map(i => (i, s"u$i", JobStatus.Pending))
        .toDF("job_id", "job_user_id", "job_status"))
      val keys = spark.read.parquet(s"$sfDir/customer.parquet")
        .select(col("c_custkey").cast("long")).as[Long].collect().sorted
      val csv = ("email,first_name,last_name,company" +:
        keys.map(k => s"c$k@example.com,First$k,Last$k,Comp$k")).mkString("\n")
      Files.writeString(Paths.get(s"$root/uploads/data.csv"), csv)
      (1 to n).foreach { i =>
        val tmp = Files.writeString(Paths.get(f"$root/queue/.m$i%05d.tmp"),
          s"""{"job_id": $i, "s3_key": "data.csv"}""")
        Files.move(tmp, Paths.get(f"$root/queue/m$i%05d"))
      }
      (root, store, keys.length)
    }
    def queueCount(dir: String): Long = {
      val s = Files.list(Paths.get(dir)); try s.count() finally s.close()
    }

    if (sustained) {
      // ---- C: sustained drain (jobs + compaction) with poison swept -----
      val (root, store, rowsPerCsv) = newRig(nJobs)
      val crashBodies = (1 to nCrash).map { i =>
        val name = f"a$i%05d-crash"
        val body = s"""{"crasher": $i, "note": "crashes every delivery"}"""
        val tmp = Files.writeString(Paths.get(s"$root/queue/.$name.tmp"), body)
        Files.move(tmp, Paths.get(s"$root/queue/$name"))
        name -> body
      }.toMap
      val tAll = System.nanoTime()
      // Poison sweep: strict per-message granularity; the foreachBatch
      // dies on a crasher (simulated infra death) and STOPS at the first
      // healthy epoch (poison drained — hand over to the wave drain
      // without committing the healthy message).
      final class PoisonDrained extends RuntimeException("poison drained")
      def sweepOnce(): Unit = {
        val q = spark.readStream.format("graft-queue")
          .option("deadLetterDir", s"$root/dlq")
          .option("maxReceives", "2")
          .option("maxFilesPerTrigger", "1")
          .load(s"$root/queue")
          .writeStream.trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/cp_sweep")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val ids = batch.select("message_id").as[String](implicitly).collect()
            if (ids.exists(_.contains("crash"))) sys.error("injected infra crash")
            if (ids.nonEmpty) throw new PoisonDrained
            ()
          }.start()
        try q.awaitTermination(1800000) catch { case _: Exception => () }
        q.stop()
      }
      def dlqCountNow(): Long =
        if (Files.exists(Paths.get(s"$root/dlq"))) queueCount(s"$root/dlq") else 0L
      var sweeps = 0
      while (dlqCountNow() < nCrash && sweeps < 4 + 3 * nCrash) {
        sweepOnce(); sweeps += 1
      }
      val sweepSec = (System.nanoTime() - tAll) / 1e9
      // Byte-exact DLQ gate: exactly the injected names, bodies verbatim.
      val dlqFiles = {
        val s = Files.list(Paths.get(s"$root/dlq"))
        try s.iterator().asScala.map(_.getFileName.toString).toVector.sorted
        finally s.close()
      }
      val dlqExact = dlqFiles == crashBodies.keys.toVector.sorted &&
        dlqFiles.forall(n =>
          Files.readString(Paths.get(s"$root/dlq/$n")) == crashBodies(n))
      // Wave-width drain of the 500 healthy jobs: redrive bookkeeping
      // active, storage maintenance every 4 batches (the r8 sustained
      // shape). Fresh checkpoint: the sweep's receipts die with it, and
      // the queue dir now holds only healthy messages.
      val tDrain = System.nanoTime()
      val q = JobDispatch.startQueue(
        spark, store, s"$root/queue", s"$root/cp",
        _ => s"$root/uploads/data.csv", Trigger.AvailableNow(),
        maintainEvery = 4,
        queueOptions = Map("deadLetterDir" -> s"$root/dlq", "maxReceives" -> "3"))
      q.awaitTermination(3600000)
      q.stop()
      val drainSec = (System.nanoTime() - tDrain) / 1e9
      val totalSec = (System.nanoTime() - tAll) / 1e9
      val completed = store.load("jobs").select("job_status").as[String]
        .collect().count(_ == JobStatus.Completed)
      val contacts = store.load("contacts").count()
      val ok = dlqExact && completed == nJobs &&
        contacts == nJobs.toLong * rowsPerCsv &&
        queueCount(s"$root/queue") == 0 && dlqCountNow() == nCrash.toLong
      println(s"""{"metric":"stream_jobs_per_min_sustained_dlq",""" +
        s""""value":${nJobs / (drainSec / 60)},"unit":"jobs/min",""" +
        s""""jobs":$nJobs,"crashers":$nCrash,"rows_per_csv":$rowsPerCsv,""" +
        s""""sweep_sec":$sweepSec,"sweeps":$sweeps,"drain_sec":$drainSec,""" +
        s""""total_sec":$totalSec,"dlq_byte_exact":$dlqExact,""" +
        s""""completed":$completed,"contacts":$contacts,"ok":$ok}""")
      spark.stop()
      if (!ok) sys.exit(1)
      return
    }

    // ---- A: healthy drain with the redrive policy active ----------------
    val (rootA, storeA, rowsPerCsv) = newRig(nJobs)
    val t0 = System.nanoTime()
    val qa = JobDispatch.startQueue(
      spark, storeA, s"$rootA/queue", s"$rootA/cp",
      _ => s"$rootA/uploads/data.csv", Trigger.AvailableNow(),
      queueOptions = Map("deadLetterDir" -> s"$rootA/dlq", "maxReceives" -> "3"))
    qa.awaitTermination(3600000)
    qa.stop()
    val secsA = (System.nanoTime() - t0) / 1e9
    val completedA = storeA.load("jobs").select("job_status").as[String]
      .collect().count(_ == JobStatus.Completed)
    val okA = completedA == nJobs &&
      storeA.load("contacts").count() == nJobs.toLong * rowsPerCsv &&
      queueCount(s"$rootA/queue") == 0

    // ---- B: crash-injected drill at per-message granularity -------------
    val (rootB, storeB, _) = newRig(nJobs / 10 max 4)
    val nHealthyB = nJobs / 10 max 4
    (1 to nCrash).foreach { i =>
      val tmp = Files.writeString(Paths.get(f"$rootB/queue/.x$i%05d-crash.tmp"), "{}")
      Files.move(tmp, Paths.get(f"$rootB/queue/x$i%05d-crash"))
    }
    val t1 = System.nanoTime()
    def drillOnce(): Unit = {
      val q = spark.readStream.format("graft-queue")
        .option("deadLetterDir", s"$rootB/dlq")
        .option("maxReceives", "2")
        .option("maxFilesPerTrigger", "1")
        .load(s"$rootB/queue")
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$rootB/cp")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val ids = batch.select("message_id").as[String](implicitly).collect()
          if (ids.exists(_.contains("crash"))) sys.error("injected infra crash")
          JobDispatch.processBatch(spark, storeB, batch.select("value"),
            _ => s"$rootB/uploads/data.csv")
          ()
        }.start()
      try q.awaitTermination(1800000) catch { case _: Exception => () }
      q.stop()
    }
    var runs = 0
    while (runs < 4 + 3 * nCrash && queueCount(s"$rootB/queue") > 0) {
      drillOnce(); runs += 1
    }
    val secsB = (System.nanoTime() - t1) / 1e9
    val dlqCount = if (Files.exists(Paths.get(s"$rootB/dlq"))) queueCount(s"$rootB/dlq") else 0L
    val completedB = storeB.load("jobs").select("job_status").as[String]
      .collect().count(_ == JobStatus.Completed)
    val okB = dlqCount == nCrash.toLong && completedB == nHealthyB &&
      queueCount(s"$rootB/queue") == 0

    println(s"""{"metric":"stream_jobs_per_min_dlq","value":${nJobs / (secsA / 60)},""" +
      s""""unit":"jobs/min","jobs":$nJobs,"rows_per_csv":$rowsPerCsv,""" +
      s""""drain_sec":$secsA,"ok_overhead":$okA,""" +
      s""""drill":{"healthy":$nHealthyB,"crashers":$nCrash,"runs":$runs,""" +
      s""""sec":$secsB,"dead_lettered":$dlqCount,"completed":$completedB,"ok":$okB}}""")
    spark.stop()
    if (!okA || !okB) sys.exit(1)
  }
}
