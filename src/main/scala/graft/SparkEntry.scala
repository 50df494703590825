package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Consolidate, Issues, Normalize, Validate}
import graft.StandIn._

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one (or one cluster) of SURVEY.md §2's
  * operator inventory over the deterministic testdata stand-ins (mapping in
  * FIXTURES.md §4 / StandIn.scala); `oracleSql` carries the equivalent
  * DuckDB SQL. Every computed column is aliased identically on both sides;
  * every query is deterministically ordered on both sides.
  */
object SparkEntry {

  import Normalize._

  /** Flagship: full initial-processing classification (SURVEY.md §7.2) on
    * sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Validate.classify(csvInput(spark, dir), contactsStandIn(spark, dir), "u1")
  }

  private def withCtes(body: String): String =
    s"WITH $inputCte,\n$contactsCte,\n$classifySql\n$body"

  private def classified(s: SparkSession, dir: String): DataFrame =
    Validate.classify(csvInput(s, dir), contactsStandIn(s, dir), "u1")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S7/S8 — trim + drop-empty-rows (clean pass)
    "q_clean_rows" -> ((s, dir) => {
      val in = csvInput(s, dir)
      val fields = Seq("email", "first_name", "last_name", "company")
      in.select(col("row_number") +: fields.map(f => trimmed(col(f)).as(f)): _*)
        .filter(fields.map(f => col(f) =!= "").reduce(_ || _))
        .orderBy("row_number")
    }),

    // F1/V5 — email normalization
    "q_norm_email" -> ((s, dir) =>
      csvInput(s, dir)
        .select(col("row_number"), normEmail(col("email")).as("norm_email"))
        .orderBy("row_number")),

    // H1 — deterministic row hash (python-json-canonical sha256)
    "q_row_hash" -> ((s, dir) =>
      csvInput(s, dir)
        .select(
          col("row_number"),
          rowHash(col("job_id"), col("row_number"), col("email"),
            col("first_name"), col("last_name"), col("company")).as("row_hash"))
        .orderBy("row_number")),

    // A1/J3/V3 — duplicate-email detection (agg, both copies flagged)
    "q_dup_emails" -> ((s, dir) =>
      csvInput(s, dir)
        .select(normEmail(col("email")).as("norm_email"))
        .filter(col("norm_email") =!= "")
        .groupBy("norm_email").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1)
        .orderBy("norm_email")),

    // J2/P4 — existing-contact semi-join (tenant-scoped)
    "q_existing_emails" -> ((s, dir) =>
      Validate.existingEmails(csvInput(s, dir), contactsStandIn(s, dir), "u1")
        .orderBy("contact_email")),

    // V1-V4 — the full first-failure-wins classification (flagship)
    "q_classify" -> ((s, dir) =>
      classified(s, dir)
        .select("row_number", "norm_email", "staging_status", "issue_type", "issue_message")
        .orderBy("row_number")),

    // J1 — idempotency anti-join (skip already-staged rows by hash)
    "q_idempotent_skip" -> ((s, dir) => {
      val h = csvInput(s, dir).withColumn(
        "staging_row_hash",
        rowHash(col("job_id"), col("row_number"), col("email"),
          col("first_name"), col("last_name"), col("company")))
      val staged = h.filter(col("row_number") % 3 === 0)
        .select("job_id", "staging_row_hash")
      h.join(staged, Seq("job_id", "staging_row_hash"), "left_anti")
        .select("row_number").orderBy("row_number")
    }),

    // J6/W3 — issue derivation + dedupe merge (get_or_create, set-based)
    "q_issues" -> ((s, dir) =>
      Issues.deriveIssues(classified(s, dir))
        .select("issues_job_id", "issue_type", "issue_key", "issue_description")
        .orderBy("issue_type", "issue_key")),

    // J7/W5 — issue->staging link set
    "q_issue_items" -> ((s, dir) =>
      Issues.deriveIssueItems(classified(s, dir))
        .orderBy("issue_type", "issue_key", "item_staging_id")),

    // A4/A8 — one-pass status histogram
    "q_status_counts" -> ((s, dir) =>
      Consolidate.statusCounts(classified(s, dir)).orderBy("staging_status")),

    // A5/A6/W8 — job-level counters incl. the gating unresolved count
    "q_job_counters" -> ((s, dir) => {
      val c = classified(s, dir)
      Consolidate.jobCounters(c, Issues.deriveIssues(c))
    }),

    // J8/W6 — consolidation projection (READY -> contacts)
    "q_consolidate" -> ((s, dir) => {
      val c = classified(s, dir)
      val staging = c.select(
        col("row_number").as("staging_id"),
        trimmed(col("email")).as("staging_email"),
        trimmed(col("first_name")).as("staging_first_name"),
        trimmed(col("last_name")).as("staging_last_name"),
        trimmed(col("company")).as("staging_company"),
        col("staging_status"))
      Consolidate.readyToContacts(staging, "u1").orderBy("staging_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_clean_rows" -> withCtes(
      """SELECT row_number, trim(email) AS email, trim(first_name) AS first_name,
        |       trim(last_name) AS last_name, trim(company) AS company
        |FROM input
        |WHERE trim(email) <> '' OR trim(first_name) <> ''
        |   OR trim(last_name) <> '' OR trim(company) <> ''
        |ORDER BY row_number""".stripMargin),

    "q_norm_email" -> withCtes(
      "SELECT row_number, lower(trim(email)) AS norm_email FROM input ORDER BY row_number"),

    "q_row_hash" -> withCtes(
      s"SELECT row_number, $rowHashSql AS row_hash FROM input ORDER BY row_number"),

    "q_dup_emails" -> withCtes(
      """SELECT lower(trim(email)) AS norm_email, CAST(count(*) AS BIGINT) AS cnt
        |FROM input WHERE trim(email) <> ''
        |GROUP BY 1 HAVING count(*) > 1
        |ORDER BY norm_email""".stripMargin),

    "q_existing_emails" -> withCtes(
      """SELECT contact_email FROM existing
        |WHERE contact_email IN (
        |  SELECT DISTINCT lower(trim(email)) FROM input WHERE trim(email) <> '')
        |ORDER BY contact_email""".stripMargin),

    "q_classify" -> withCtes(
      """SELECT row_number, norm_email, staging_status, issue_type, issue_message
        |FROM classified ORDER BY row_number""".stripMargin),

    "q_idempotent_skip" -> withCtes(
      s""", hashes AS (SELECT row_number, $rowHashSql AS h FROM input)
         |SELECT row_number FROM hashes
         |WHERE h NOT IN (SELECT h FROM hashes WHERE row_number % 3 = 0)
         |ORDER BY row_number""".stripMargin),

    "q_issues" -> withCtes(
      """, flagged AS (
        |  SELECT *, CASE WHEN norm_email <> '' THEN norm_email
        |                 ELSE 'row_' || CAST(row_number AS VARCHAR) END AS issue_key
        |  FROM classified WHERE issue_type IS NOT NULL)
        |SELECT job_id AS issues_job_id, issue_type, issue_key,
        |       arg_min(issue_message, row_number) AS issue_description
        |FROM flagged GROUP BY 1, 2, 3
        |ORDER BY issue_type, issue_key""".stripMargin),

    "q_issue_items" -> withCtes(
      """, flagged AS (
        |  SELECT *, CASE WHEN norm_email <> '' THEN norm_email
        |                 ELSE 'row_' || CAST(row_number AS VARCHAR) END AS issue_key
        |  FROM classified WHERE issue_type IS NOT NULL)
        |SELECT job_id AS issues_job_id, issue_type, issue_key, row_number AS item_staging_id
        |FROM flagged
        |ORDER BY issue_type, issue_key, item_staging_id""".stripMargin),

    "q_status_counts" -> withCtes(
      """SELECT staging_status, CAST(count(*) AS BIGINT) AS n
        |FROM classified GROUP BY 1 ORDER BY staging_status""".stripMargin),

    "q_job_counters" -> withCtes(
      """, s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS total_rows,
        |         CAST(coalesce(sum(CASE WHEN staging_status = 'READY' THEN 1 ELSE 0 END), 0) AS BIGINT) AS ready_rows,
        |         CAST(coalesce(sum(CASE WHEN staging_status = 'ISSUE' THEN 1 ELSE 0 END), 0) AS BIGINT) AS issue_rows,
        |         CAST(coalesce(sum(CASE WHEN staging_status = 'DISCARD' THEN 1 ELSE 0 END), 0) AS BIGINT) AS discard_rows,
        |         CAST(coalesce(sum(CASE WHEN staging_status = 'SUCCESS' THEN 1 ELSE 0 END), 0) AS BIGINT) AS success_rows
        |  FROM classified),
        |i AS (
        |  SELECT CAST(count(*) AS BIGINT) AS total_issues,
        |         CAST(count(*) AS BIGINT) AS unresolved_issues
        |  FROM (
        |    SELECT DISTINCT job_id, issue_type,
        |           CASE WHEN norm_email <> '' THEN norm_email
        |                ELSE 'row_' || CAST(row_number AS VARCHAR) END AS issue_key
        |    FROM classified WHERE issue_type IS NOT NULL))
        |SELECT * FROM s, i""".stripMargin),

    "q_consolidate" -> withCtes(
      """SELECT row_number AS staging_id, 'u1' AS contacts_user_id,
        |       trim(email) AS contact_email, trim(first_name) AS contact_first_name,
        |       trim(last_name) AS contact_last_name, trim(company) AS contact_company
        |FROM classified
        |WHERE staging_status = 'READY'
        |  AND trim(email) <> '' AND trim(first_name) <> ''
        |  AND trim(last_name) <> '' AND trim(company) <> ''
        |ORDER BY staging_id""".stripMargin)
  )
}
