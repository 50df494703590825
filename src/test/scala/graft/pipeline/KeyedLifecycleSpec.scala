package graft.pipeline

import graft.SparkSpec
import graft.model.Schemas.StagingStatus
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The keyed (multi-job, single-plan) lifecycle flows must be ROW-FOR-ROW
  * equal to the per-job flows unioned — the wave dispatch rides on this
  * equality (one Catalyst plan for N jobs instead of N plans). Exercises
  * every validation class across jobs that share emails (dup/existing sets
  * must stay job-scoped) and tenants with pre-existing contacts. */
class KeyedLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def csvFrame(rows: Seq[(String, String, String, String)]): DataFrame =
    rows.zipWithIndex
      .map { case ((e, f, l, c), i) => (i + 1L, e, f, l, c) }
      .toDF("row_number", "email", "first_name", "last_name", "company")

  // Shared fixture: 3 jobs, 3 tenants. Job 1 clean; job 2 has a duplicate
  // pair + a missing field; job 3 re-imports an email its tenant already has
  // AND an email that duplicates within the batch. The same address
  // "x@b.co" appears in ALL jobs — keyed dup/existing sets must not leak
  // across jobs.
  private val job1 = csvFrame(Seq(("x@b.co", "F", "L", "C")))
  private val job2 = csvFrame(Seq(
    ("x@b.co", "F", "L", "C"), ("x@b.co", "F2", "L2", "C2"), ("", "miss", "L", "C")))
  private val job3 = csvFrame(Seq(
    ("x@b.co", "F", "L", "C"), ("bad-email", "F", "L", "C")))
  private val users = Map(1 -> "u1", 2 -> "u2", 3 -> "u3")
  private def contacts =
    Seq((900L, "u3", "x@b.co", "P", "Q", "R"))
      .toDF("staging_id", "contacts_user_id", "contact_email",
        "contact_first_name", "contact_last_name", "contact_company")

  private def emptyStaging = Seq.empty[(Long, Int, String, String, String, String, String, String)]
    .toDF("staging_id", "staging_job_id", "staging_email", "staging_first_name",
      "staging_last_name", "staging_company", "staging_status", "staging_row_hash")
  private def emptyIssues = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("issues_job_id", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("issue_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("issue_key", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("issue_description", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("issue_resolved", org.apache.spark.sql.types.BooleanType))))
  private def emptyItems = Seq.empty[(Int, String, String, Long)]
    .toDF("issues_job_id", "issue_type", "issue_key", "item_staging_id")

  private def sortedSet(df: DataFrame, cols: Seq[String]): Set[Seq[Any]] =
    df.select(cols.map(col): _*).collect().map(_.toSeq).toSet

  test("initialProcessKeyed == per-job initialProcess unioned (staging/issues/items/candidates/counters)") {
    val inputs = Map(1 -> job1, 2 -> job2, 3 -> job3)
    val perJob = inputs.toSeq.sortBy(_._1).map { case (id, in) =>
      id -> Lifecycle.initialProcess(in, id, users(id),
        emptyStaging, emptyIssues, emptyItems, contacts, checkNonEmpty = false)
    }
    val keyedInput = inputs.toSeq.sortBy(_._1)
      .map { case (id, in) => in.withColumn("job_id", lit(id)) }
      .reduce(_.unionByName(_))
    val jobUsers = users.toSeq.map { case (id, u) => (id, u) }.toDF("job_id", "job_user_id")
    val keyed = Lifecycle.initialProcessKeyed(
      keyedInput, jobUsers, emptyStaging, emptyIssues, emptyItems, contacts)

    val stagingCols = Seq("staging_id", "staging_job_id", "staging_email",
      "staging_status", "staging_row_hash")
    assert(sortedSet(keyed.stagingPre, stagingCols) ===
      perJob.map(_._2.stagingPre).map(sortedSet(_, stagingCols)).reduce(_ ++ _))

    val issueCols = Seq("issues_job_id", "issue_type", "issue_key",
      "issue_description", "issue_resolved")
    assert(sortedSet(keyed.issues, issueCols) ===
      perJob.map(_._2.issues).map(sortedSet(_, issueCols)).reduce(_ ++ _))

    val itemCols = Seq("issues_job_id", "issue_type", "issue_key", "item_staging_id")
    assert(sortedSet(keyed.issueItems, itemCols) ===
      perJob.map(_._2.issueItems).map(sortedSet(_, itemCols)).reduce(_ ++ _))

    // Candidates: keyed keeps staging_job_id; compare the canonical columns.
    val candCols = Seq("staging_id", "contacts_user_id", "contact_email",
      "contact_first_name", "contact_last_name", "contact_company")
    assert(sortedSet(keyed.contactCandidates, candCols) ===
      perJob.map(_._2.contactCandidates).map(sortedSet(_, candCols)).reduce(_ ++ _))

    // Counters: keyed one-row-per-job == each per-job 1-row frame.
    val cKeyed = keyed.counters.collect().map(r => r.getAs[Int]("job_id") -> r).toMap
    perJob.foreach { case (id, r) =>
      val exp = r.counters.collect().head
      val got = cKeyed(id)
      Seq("total_rows", "ready_rows", "issue_rows", "discard_rows",
        "success_rows", "total_issues", "unresolved_issues").foreach { c =>
        assert(got.getAs[Long](c) === exp.getAs[Long](c), s"job $id counter $c")
      }
    }
    // Job-scoped semantics spot-checks: x@b.co is NOT a dup in jobs 1/3
    // (single occurrence per job), IS a dup pair in job 2, and an
    // EXISTING_EMAIL only for tenant u3.
    val byJob = keyed.issues.select("issues_job_id", "issue_type")
      .as[(Int, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(!byJob.contains(1))
    assert(byJob(2) === Set("DUPLICATE_EMAIL", "MISSING_REQUIRED_FIELD"))
    assert(byJob(3) === Set("EXISTING_EMAIL", "INVALID_EMAIL"))
    keyed.unpersist(); perJob.foreach(_._2.unpersist())
  }

  test("reprocessKeyed == per-job reprocess unioned, DISCARD preserved per job") {
    // Seed staging for two jobs via initial runs, then flip each job's bad
    // row to DISCARD and reprocess both in one keyed plan.
    val seeds = Map(
      1 -> csvFrame(Seq(("a@b.co", "F", "L", "C"), ("", "m", "L", "C"))),
      2 -> csvFrame(Seq(("b@b.co", "F", "L", "C"), ("bad", "F", "L", "C"))))
    val seeded = seeds.map { case (id, in) =>
      id -> Lifecycle.initialProcess(in, id, users(id),
        emptyStaging, emptyIssues, emptyItems, contacts, checkNonEmpty = false)
    }
    def discarded(id: Int) = seeded(id).stagingPre.withColumn("staging_status",
      when(col("staging_status") === StagingStatus.Issue, StagingStatus.Discard)
        .otherwise(col("staging_status")))

    val perJob = seeds.keys.toSeq.sorted.map { id =>
      id -> Lifecycle.reprocess(
        discarded(id), seeded(id).issues, seeded(id).issueItems,
        contacts, id, users(id), checkNonEmpty = false)
    }
    val jobUsers = users.toSeq.map { case (id, u) => (id, u) }.toDF("job_id", "job_user_id")
    val keyed = Lifecycle.reprocessKeyed(
      seeds.keys.toSeq.sorted.map(discarded).reduce(_.unionByName(_)),
      seeds.keys.toSeq.sorted.map(id => seeded(id).issues).reduce(_.unionByName(_)),
      seeds.keys.toSeq.sorted.map(id => seeded(id).issueItems).reduce(_.unionByName(_)),
      contacts, jobUsers)

    val stagingCols = Seq("staging_id", "staging_job_id", "staging_email", "staging_status")
    assert(sortedSet(keyed.stagingPre, stagingCols) ===
      perJob.map(_._2.stagingPre).map(sortedSet(_, stagingCols)).reduce(_ ++ _))
    val issueCols = Seq("issues_job_id", "issue_type", "issue_key", "issue_resolved")
    assert(sortedSet(keyed.issues, issueCols) ===
      perJob.map(_._2.issues).map(sortedSet(_, issueCols)).reduce(_ ++ _))
    val cKeyed = keyed.counters.collect().map(r => r.getAs[Int]("job_id") -> r).toMap
    perJob.foreach { case (id, r) =>
      val exp = r.counters.collect().head
      Seq("total_rows", "discard_rows", "unresolved_issues").foreach { c =>
        assert(cKeyed(id).getAs[Long](c) === exp.getAs[Long](c), s"job $id counter $c")
      }
    }
    keyed.unpersist(); perJob.foreach(_._2.unpersist()); seeded.foreach(_._2.unpersist())
  }
}
