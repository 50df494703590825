package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.Schemas.StagingStatus

/** Issue derivation, merge, and resolution recompute — the set-based
  * replacement for the reference's get_or_create / link / resolve-unresolve
  * procedural paths (issue_repository.py:19-114, 163-272;
  * processor.py:499-567).
  */
object Issues {

  import Normalize._

  /** Derive the deduplicated issue set from a classified batch (J6 / W3).
    *
    * One issue per distinct (job_id, issue_type, issue_key); the description
    * kept is the first triggering row's (reference get_or_create keeps the
    * message of the row that created the issue — row order — reproduced with
    * min_by over row_number).
    *
    * `fallbackPrefix` is "row_" for initial processing (key = row_number,
    * processor.py:261-262) and "staging_" for reprocessing (key = staging_id,
    * processor.py:518-519); pass the matching id column name in `fallbackId`.
    */
  def deriveIssues(
      classified: DataFrame,
      fallbackPrefix: String = "row_",
      fallbackId: String = "row_number"): DataFrame =
    classified
      .filter(col("issue_type").isNotNull)
      .withColumn("issue_key", issueKey(col("norm_email"), fallbackPrefix, col(fallbackId)))
      .groupBy(col("job_id").as("issues_job_id"), col("issue_type"), col("issue_key"))
      .agg(
        expr(s"min_by(issue_message, $fallbackId)").as("issue_description"),
        lit(false).as("issue_resolved"))

  /** Derive the issue->staging link set (J7 / W5): one (issue_key, issue_type,
    * staging id) pair per flagged row; pair-uniqueness is structural (each
    * row appears once). Join against the issue table's surrogate ids at merge
    * time.
    */
  def deriveIssueItems(
      classified: DataFrame,
      fallbackPrefix: String = "row_",
      fallbackId: String = "row_number"): DataFrame =
    classified
      .filter(col("issue_type").isNotNull)
      .withColumn("issue_key", issueKey(col("norm_email"), fallbackPrefix, col(fallbackId)))
      .select(
        col("job_id").as("issues_job_id"),
        col("issue_type"),
        col("issue_key"),
        col(fallbackId).as("item_staging_id"))

  /** MERGE new issues into an existing issue table: insert only keys not
    * already present (anti-join on the natural key) — the set-based
    * get_or_create (issue_repository.py:19-74). */
  def mergeIssues(existing: DataFrame, derived: DataFrame): DataFrame = {
    val key = Seq("issues_job_id", "issue_type", "issue_key")
    val fresh = derived.join(existing.select(key.map(col): _*).distinct(), key, "left_anti")
    existing.unionByName(fresh, allowMissingColumns = true)
  }

  /** Resolution recompute (J5 / A7 / W4): an issue is resolved iff zero of
    * its linked staging rows are still in status ISSUE
    * (issue_repository.py:241-272, processor.py:499-567). Replaces both the
    * procedural resolve and un-resolve paths with one deterministic column.
    *
    * `issues`:      issues_job_id, issue_type, issue_key (+ any carried cols)
    * `issueItems`:  issue linkage with item_staging_id
    * `staging`:     staging_id, staging_status
    *
    * Returns the issues frame with a recomputed `issue_resolved` +
    * `unresolved_items` count, plus the system-resolution audit trail the
    * reference writes on resolve (issue_repository.py:190-194, 267-268):
    * `issue_resolved_at` = now, `issue_resolved_by` = "system",
    * `issue_resolution_comment` — stamped on resolved issues, nulled on
    * unresolved ones (un-resolve clears the trail, matching the recompute
    * semantics of the procedural resolve/un-resolve pair).
    */
  val SystemResolvedBy = "system"
  val SystemResolutionComment = "All related staging records resolved during reprocessing"

  def recomputeResolution(
      issues: DataFrame,
      issueItems: DataFrame,
      staging: DataFrame): DataFrame = {
    val key = Seq("issues_job_id", "issue_type", "issue_key")
    val unresolvedPerIssue = issueItems
      .join(staging, issueItems("item_staging_id") === staging("staging_id"), "left")
      .groupBy(key.map(issueItems(_)): _*)
      .agg(sum(when(col("staging_status") === StagingStatus.Issue, 1).otherwise(0))
        .cast("long").as("unresolved_items"))

    issues
      .drop("issue_resolved", "unresolved_items",
        "issue_resolved_at", "issue_resolved_by", "issue_resolution_comment")
      .join(unresolvedPerIssue, key, "left")
      .withColumn("unresolved_items", coalesce(col("unresolved_items"), lit(0L)))
      .withColumn("issue_resolved", col("unresolved_items") === 0L)
      .withColumn("issue_resolved_at",
        when(col("issue_resolved"), current_timestamp()).otherwise(lit(null).cast("timestamp")))
      .withColumn("issue_resolved_by",
        when(col("issue_resolved"), lit(SystemResolvedBy)).otherwise(lit(null).cast("string")))
      .withColumn("issue_resolution_comment",
        when(col("issue_resolved"), lit(SystemResolutionComment)).otherwise(lit(null).cast("string")))
  }
}
