package graft.ops

import graft.SparkSpec
import graft.model.Schemas.{IssueType, StagingStatus}
import org.apache.spark.sql.functions._

/** Specs for issue derivation/merge/resolution (J5-J7, W3-W5). */
class IssuesSpec extends SparkSpec {
  import spark.implicits._

  private val classified = Seq(
    (1L, "dup@b.co", IssueType.DuplicateEmail, "Duplicate email in CSV: dup@b.co"),
    (2L, "dup@b.co", IssueType.DuplicateEmail, "Duplicate email in CSV: DUP@b.co"),
    (3L, "", IssueType.MissingRequiredField, "Missing required field: email"),
    (4L, "ok@b.co", null, null)
  ).toDF("row_number", "norm_email", "issue_type", "issue_message")
    .withColumn("job_id", lit(1))

  test("deriveIssues dedupes by (job, type, key), keeps first row's message") {
    val issues = Issues.deriveIssues(classified).collect()
    assert(issues.length === 2)
    val byKey = issues.map(r => r.getAs[String]("issue_key") -> r).toMap
    assert(byKey("dup@b.co").getAs[String]("issue_description")
      === "Duplicate email in CSV: dup@b.co") // min row_number wins
    assert(byKey("row_3").getAs[String]("issue_type") === IssueType.MissingRequiredField)
    assert(issues.forall(!_.getAs[Boolean]("issue_resolved")))
  }

  test("deriveIssueItems links every flagged row (both duplicate copies)") {
    val items = Issues.deriveIssueItems(classified)
      .select("issue_key", "item_staging_id").as[(String, Long)].collect().toSet
    assert(items === Set(("dup@b.co", 1L), ("dup@b.co", 2L), ("row_3", 3L)))
  }

  test("mergeIssues is an idempotent get_or_create (anti-join insert)") {
    val existing = Issues.deriveIssues(classified)
    val merged = Issues.mergeIssues(existing, Issues.deriveIssues(classified))
    assert(merged.count() === existing.count()) // re-merge adds nothing
    val extra = Seq((1, IssueType.InvalidEmail, "bad", "Invalid email format: bad", false))
      .toDF("issues_job_id", "issue_type", "issue_key", "issue_description", "issue_resolved")
    assert(Issues.mergeIssues(existing, extra).count() === existing.count() + 1)
  }

  test("recomputeResolution: resolved iff no linked staging row still ISSUE") {
    val issues = Issues.deriveIssues(classified)
    val items = Issues.deriveIssueItems(classified)
    // User fixed rows 1 and 2 (now READY) but row 3 still ISSUE:
    val staging = Seq(
      (1L, StagingStatus.Ready), (2L, StagingStatus.Ready), (3L, StagingStatus.Issue)
    ).toDF("staging_id", "staging_status")
    val resolved = Issues.recomputeResolution(issues, items, staging)
      .select("issue_key", "issue_resolved").as[(String, Boolean)].collect().toMap
    assert(resolved("dup@b.co") === true)   // both copies fixed -> resolved
    assert(resolved("row_3") === false)     // still failing -> (stays/flips back) unresolved
  }

  test("recomputeResolution flips a resolved issue back when a row re-fails") {
    val issues = Issues.deriveIssues(classified)
      .withColumn("issue_resolved", lit(true)) // previously resolved by user pass
    val items = Issues.deriveIssueItems(classified)
    val staging = Seq(
      (1L, StagingStatus.Issue), (2L, StagingStatus.Ready), (3L, StagingStatus.Ready)
    ).toDF("staging_id", "staging_status")
    val resolved = Issues.recomputeResolution(issues, items, staging)
      .select("issue_key", "issue_resolved").as[(String, Boolean)].collect().toMap
    assert(resolved("dup@b.co") === false) // un-resolve path (processor.py:529-559)
    assert(resolved("row_3") === true)
  }
}
