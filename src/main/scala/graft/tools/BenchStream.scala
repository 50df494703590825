package graft.tools

import graft.io.ParquetTableStore
import graft.model.Schemas.JobStatus
import graft.stream.JobDispatch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths}

/** Streaming dispatch throughput record: enqueue N ingest jobs on the
  * native `graft-queue` source, drain them under `Trigger.AvailableNow`
  * (the SQS drain-then-shutdown shape), and report jobs/min plus the
  * end-to-end correctness gates — every job COMPLETED, contacts row count
  * = jobs × CSV rows, and the queue fully acked (empty directory) after
  * the final epoch flush. Numbers land in BASELINE.md.
  *
  * Each job is its own tenant (user u<i>), so the tenant-scoped
  * EXISTING_EMAIL check keeps jobs independent; the CSV derives
  * deterministically from the sf dir's customer table.
  *
  * Usage: BenchStream [sfDir] [nJobs]
  */
object BenchStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nJobs = if (args.length > 1) args(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Let AQE re-partition CACHED plans: each job's classify frame is
      // cached, and without this the cache pins every tiny per-job frame at
      // the static shuffle-partition count — a 40-job wave then scans
      // 40 x 32 near-empty partitions per commit action.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = Files.createTempDirectory("graft_stream_bench").toString
    Files.createDirectories(Paths.get(s"$root/queue"))
    Files.createDirectories(Paths.get(s"$root/uploads"))
    val store = new ParquetTableStore(spark, s"$root/tables")
    store.overwrite("jobs", (1 to nJobs).map(i => (i, s"u$i", JobStatus.Pending))
      .toDF("job_id", "job_user_id", "job_status"))

    // One shared CSV (every job is a distinct tenant): rows derive from the
    // customer table so the payload is the sf's real row count and shape.
    val keys = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").cast("long")).as[Long].collect().sorted
    val csv = ("email,first_name,last_name,company" +:
      keys.map(k => s"c$k@example.com,First$k,Last$k,Comp$k")).mkString("\n")
    Files.writeString(Paths.get(s"$root/uploads/data.csv"), csv)
    (1 to nJobs).foreach { i =>
      val tmp = Files.writeString(Paths.get(f"$root/queue/.m$i%05d.tmp"),
        s"""{"job_id": $i, "s3_key": "data.csv"}""")
      Files.move(tmp, Paths.get(f"$root/queue/m$i%05d"))
    }

    val t0 = System.nanoTime()
    val q = JobDispatch.startQueue(
      spark, store, s"$root/queue", s"$root/cp",
      _ => s"$root/uploads/data.csv", Trigger.AvailableNow())
    q.awaitTermination(3600000)
    q.stop()
    val secs = (System.nanoTime() - t0) / 1e9

    val statuses = store.load("jobs").select("job_status").as[String].collect()
    val completed = statuses.count(_ == JobStatus.Completed)
    val contacts = store.load("contacts").count()
    val queueLeft = {
      val s = Files.list(Paths.get(s"$root/queue"))
      try s.count() finally s.close()
    }
    val ok = completed == nJobs && contacts == nJobs.toLong * keys.length &&
      queueLeft == 0
    println(s"""{"metric":"stream_jobs_per_min","value":${nJobs / (secs / 60)},""" +
      s""""unit":"jobs/min","jobs":$nJobs,"rows_per_csv":${keys.length},""" +
      s""""drain_sec":$secs,"completed":$completed,"contacts":$contacts,""" +
      s""""queue_left":$queueLeft,"ok":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
