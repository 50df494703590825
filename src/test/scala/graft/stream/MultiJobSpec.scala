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
}
