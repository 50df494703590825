package graft.stream

import graft.SparkSpec
import graft.io.ParquetTableStore
import graft.model.Schemas.JobStatus
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Regression guard for snapshot-store lifecycle ordering: several jobs
  * processed sequentially against ONE store. Single-job tests cannot catch
  * "plan materialized after its snapshot was replaced" bugs — the first job
  * runs against empty tables and always passes. */
class MultiJobSpec extends SparkSpec {
  import spark.implicits._

  test("five sequential jobs against one store: commits never read replaced snapshots") {
    val root = Files.createTempDirectory("graft_multi").toString
    val store = new ParquetTableStore(spark, root + "/tables")
    Files.createDirectories(Paths.get(root + "/uploads"))
    store.overwrite("jobs", (1 to 5).map(i => (i, "u1", JobStatus.Pending))
      .toDF("job_id", "job_user_id", "job_status"))
    (1 to 5).foreach { i =>
      val extra = if (i == 3) "\n,missing,Cee,Biz" else ""
      Files.writeString(Paths.get(s"$root/uploads/f$i.csv"),
        s"email,first_name,last_name,company\nu$i@b.co,F,L,C$extra\n")
    }
    val outcomes = (1 to 5).map { i =>
      i -> JobDispatch.processOne(spark, store, i, s"f$i.csv", k => s"$root/uploads/$k").outcome
    }.toMap
    assert(outcomes.count(_._2 == JobStatus.Completed) === 4)
    assert(outcomes(3) === JobStatus.NeedsReview)
    assert(store.load("contacts").count() === 4)
    // metadata written for every job from per-job (pre-commit) counters:
    val meta = store.load("jobs").select("job_id", "job_total_rows")
      .as[(Int, Long)].collect().toMap
    assert(meta(3) === 2L)
    assert((1 to 5).filterNot(_ == 3).forall(meta(_) === 1L))
  }

  test("a job's own consolidation cannot re-classify its staging (commit reads pre-commit snapshots)") {
    // Regression: the commit appends this job's contacts and THEN writes its
    // staging partition. Spark invalidates + re-caches any cached plan on a
    // write to a path it reads, so if the contacts append ran as a separate
    // mutation first, the staging plan's classify subtree would re-evaluate
    // against post-append contacts and flip the job's own READY rows to
    // EXISTING_EMAIL — committed staging saying ISSUE for a COMPLETED job.
    // Needs the contacts table to EXIST at plan time (else classify reads
    // an empty local relation and is immune), hence the two jobs.
    val root = Files.createTempDirectory("graft_selfreclass").toString
    val store = new ParquetTableStore(spark, root + "/tables")
    Files.createDirectories(Paths.get(root + "/uploads"))
    store.overwrite("jobs", Seq((1, "u1", JobStatus.Pending), (2, "u1", JobStatus.Pending))
      .toDF("job_id", "job_user_id", "job_status"))
    Files.writeString(Paths.get(s"$root/uploads/f1.csv"),
      "email,first_name,last_name,company\na@b.co,F,L,C\n")
    Files.writeString(Paths.get(s"$root/uploads/f2.csv"),
      "email,first_name,last_name,company\nb@b.co,F,L,C\n")
    assert(JobDispatch.processOne(spark, store, 1, "f1.csv",
      k => s"$root/uploads/$k").outcome === JobStatus.Completed)
    assert(JobDispatch.processOne(spark, store, 2, "f2.csv",
      k => s"$root/uploads/$k").outcome === JobStatus.Completed)
    val statuses = store.load("staging")
      .select("staging_job_id", "staging_status").as[(Int, String)].collect().toSet
    assert(statuses === Set(1 -> "SUCCESS", 2 -> "SUCCESS"))
    assert(!store.exists("issues") || store.load("issues").count() === 0)
  }

  test("per-job commit leaves other jobs' partition files byte-identical") {
    val root = Files.createTempDirectory("graft_partcommit").toString
    val store = new ParquetTableStore(spark, root + "/tables")
    Files.createDirectories(Paths.get(root + "/uploads"))
    store.overwrite("jobs", Seq((1, "u1", JobStatus.Pending), (2, "u1", JobStatus.Pending))
      .toDF("job_id", "job_user_id", "job_status"))
    // Job 1 carries an issue row so staging/issues/issue_items partitions all exist.
    Files.writeString(Paths.get(s"$root/uploads/f1.csv"),
      "email,first_name,last_name,company\na@b.co,F,L,C\n,missing,Cee,Biz\n")
    Files.writeString(Paths.get(s"$root/uploads/f2.csv"),
      "email,first_name,last_name,company\nb@b.co,F,L,C\n")
    JobDispatch.processOne(spark, store, 1, "f1.csv", k => s"$root/uploads/$k")

    // Fingerprint every data file in job 1's partitions (path, size, mtime).
    def job1Files(): Map[String, (Long, Long)] = {
      val it = Files.walk(Paths.get(root + "/tables")).iterator()
      val acc = scala.collection.mutable.Map[String, (Long, Long)]()
      while (it.hasNext) {
        val p = it.next()
        if (Files.isRegularFile(p) && p.toString.contains("_job_id=1"))
          acc(p.toString) = (Files.size(p), Files.getLastModifiedTime(p).toMillis)
      }
      acc.toMap
    }
    val before = job1Files()
    assert(before.nonEmpty, "job 1 partitions missing")

    JobDispatch.processOne(spark, store, 2, "f2.csv", k => s"$root/uploads/$k")
    assert(job1Files() === before,
      "another job's commit rewrote job 1's partition files")
    // Both jobs' rows are present and correct after the partitioned commits:
    assert(store.load("staging").select("staging_job_id").distinct().count() === 2)
    assert(store.load("issues").filter(col("issues_job_id") === 1).count() === 1)
  }

  test("per-job staging read prunes to the job's partition at the scan") {
    val root = Files.createTempDirectory("graft_prune").toString
    val store = new ParquetTableStore(spark, root + "/tables")
    store.overwrite("staging", Seq(
      (1, 1L, "a@b.co"), (1, 2L, "b@b.co"), (2, 3L, "c@b.co"))
      .toDF("staging_job_id", "staging_id", "staging_email"))
    val q = store.load("staging").filter(col("staging_job_id") === 2)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // Hive-partitioned layout: the filter must land in PartitionFilters (file
    // pruning before any IO) — not as a post-scan Filter over all jobs' rows.
    assert("PartitionFilters: \\[[^\\]]*staging_job_id".r.findFirstIn(plan).isDefined,
      s"job filter not applied as a partition filter:\n${plan.take(500)}")
    // Same for the wave's tenant-scoped contacts read (the filter
    // JobDispatch applies before the keyed flows): tenant isin must prune
    // contacts partitions, not scan the corpus.
    store.overwrite("contacts", Seq(
      (1L, "u1", "a@b.co"), (2L, "u2", "b@b.co"), (3L, "u3", "c@b.co"))
      .toDF("staging_id", "contacts_user_id", "contact_email"))
    val cq = store.load("contacts")
      .filter(col("contacts_user_id").isin("u1", "u3"))
    cq.collect()
    val cplan = cq.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*contacts_user_id".r.findFirstIn(cplan).isDefined,
      s"tenant filter not applied as a partition filter:\n${cplan.take(500)}")
  }

  test("25 queued jobs drain under AvailableNow; contacts match the sequential batch reference") {
    import org.apache.spark.sql.streaming.Trigger
    val nJobs = 25
    val rows = 20
    def seed(root: String): ParquetTableStore = {
      Files.createDirectories(Paths.get(s"$root/uploads"))
      val store = new ParquetTableStore(spark, s"$root/tables")
      store.overwrite("jobs", (1 to nJobs).map(i => (i, s"u$i", JobStatus.Pending))
        .toDF("job_id", "job_user_id", "job_status"))
      val csv = ("email,first_name,last_name,company" +:
        (1 to rows).map(r => s"r$r@ex.co,F$r,L$r,C$r")).mkString("\n")
      Files.writeString(Paths.get(s"$root/uploads/data.csv"), csv)
      store
    }
    def contactsOf(store: ParquetTableStore): Set[(String, String, String)] =
      store.load("contacts")
        .select("contacts_user_id", "contact_email", "contact_company")
        .as[(String, String, String)].collect().toSet

    // Streaming drain: all 25 jobs through the native queue source.
    val sRoot = Files.createTempDirectory("graft_stream_tput").toString
    val sStore = seed(sRoot)
    Files.createDirectories(Paths.get(s"$sRoot/queue"))
    (1 to nJobs).foreach { i =>
      val tmp = Files.writeString(Paths.get(f"$sRoot/queue/.m$i%03d.tmp"),
        s"""{"job_id": $i, "s3_key": "data.csv"}""")
      Files.move(tmp, Paths.get(f"$sRoot/queue/m$i%03d"))
    }
    val q = JobDispatch.startQueue(
      spark, sStore, s"$sRoot/queue", s"$sRoot/cp",
      _ => s"$sRoot/uploads/data.csv", Trigger.AvailableNow())
    q.awaitTermination(600000)
    q.stop()

    val statuses = sStore.load("jobs").select("job_status").as[String].collect()
    assert(statuses.length === nJobs)
    assert(statuses.forall(_ === JobStatus.Completed))
    assert(sStore.load("contacts").count() === nJobs.toLong * rows)
    // AvailableNow flushes the final ack epoch: every message deleted.
    val left = { val s = Files.list(Paths.get(s"$sRoot/queue"))
      try s.count() finally s.close() }
    assert(left === 0L, "queue not fully acked after AvailableNow drain")

    // Batch reference: identical jobs run sequentially on a fresh store.
    val bRoot = Files.createTempDirectory("graft_batch_ref").toString
    val bStore = seed(bRoot)
    (1 to nJobs).foreach { i =>
      val o = JobDispatch.processOne(spark, bStore, i, "data.csv",
        _ => s"$bRoot/uploads/data.csv")
      assert(o.outcome === JobStatus.Completed, s"batch job $i")
    }
    assert(contactsOf(sStore) === contactsOf(bStore),
      "streaming and batch runs disagree on the consolidated contacts")
  }

  test("job lifecycle: process_start on PROCESSING, process_end cleared on restart") {
    val root = Files.createTempDirectory("graft_lifecycle").toString
    val store = new ParquetTableStore(spark, root + "/tables")
    Files.createDirectories(Paths.get(root + "/uploads"))
    store.overwrite("jobs", Seq((1, "u1", JobStatus.Pending), (2, "u1", JobStatus.Pending))
      .toDF("job_id", "job_user_id", "job_status"))
    Files.writeString(Paths.get(s"$root/uploads/clean.csv"),
      "email,first_name,last_name,company\na@b.co,F,L,C\n")
    Files.writeString(Paths.get(s"$root/uploads/issue.csv"),
      "email,first_name,last_name,company\n,missing,Cee,Biz\n")

    JobDispatch.processOne(spark, store, 1, "clean.csv", k => s"$root/uploads/$k")
    val done = store.load("jobs").filter(col("job_id") === 1).head()
    assert(done.getAs[java.sql.Timestamp]("job_process_start") != null)
    assert(done.getAs[java.sql.Timestamp]("job_process_end") != null)

    JobDispatch.processOne(spark, store, 2, "issue.csv", k => s"$root/uploads/$k")
    val review = store.load("jobs").filter(col("job_id") === 2).head()
    assert(review.getAs[String]("job_status") === JobStatus.NeedsReview)
    val firstStart = review.getAs[java.sql.Timestamp]("job_process_start")
    assert(firstStart != null)
    assert(review.getAs[java.sql.Timestamp]("job_process_end") == null)

    // Simulate a stale process_end, then restart (reprocess route): entering
    // PROCESSING must clear it (job_repository.py:58-61) and re-stamp start.
    store.overwrite("jobs", store.load("jobs").withColumn("job_process_end",
      when(col("job_id") === 2, current_timestamp()).otherwise(col("job_process_end"))))
    JobDispatch.processOne(spark, store, 2, "issue.csv", k => s"$root/uploads/$k")
    val restarted = store.load("jobs").filter(col("job_id") === 2).head()
    assert(restarted.getAs[java.sql.Timestamp]("job_process_end") == null,
      "stale process_end survived a restart")
    assert(!restarted.getAs[java.sql.Timestamp]("job_process_start").before(firstStart))
  }
}
