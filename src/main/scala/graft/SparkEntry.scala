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

    // §3.2 reprocess + J5/W4 — user edits, DISCARD exclusion, issue merge,
    // deterministic resolution recompute
    "q_reprocess_resolution" -> ((s, dir) => {
      val c = classified(s, dir)
      val staging0 = c.select(
        col("row_number").as("staging_id"),
        col("job_id"),
        trimmed(col("email")).as("staging_email"),
        trimmed(col("first_name")).as("staging_first_name"),
        trimmed(col("last_name")).as("staging_last_name"),
        trimmed(col("company")).as("staging_company"),
        col("staging_status"),
        col("issue_type").as("issue_type0"))
      // Simulated user edits: fix INVALID_EMAIL rows, discard blank-email rows.
      val edited = staging0
        .withColumn("staging_email",
          when(col("issue_type0") === "INVALID_EMAIL",
            concat(lit("fixed"), col("staging_id").cast("string"), lit("@example.com")))
            .otherwise(col("staging_email")))
        .withColumn("staging_status",
          when(col("staging_email") === "", lit("DISCARD"))
            .otherwise(col("staging_status")))
      val working = edited.filter(col("staging_status") =!= "DISCARD")
        .select(col("staging_id").as("row_number"), col("staging_id"), col("job_id"),
          col("staging_email").as("email"), col("staging_first_name").as("first_name"),
          col("staging_last_name").as("last_name"), col("staging_company").as("company"))
      val reclass = Validate.classify(working, contactsStandIn(s, dir), "u1")
      val newStatus = edited.select("staging_id")
        .join(reclass.select(col("staging_id"), col("staging_status").as("ns")),
          Seq("staging_id"), "left")
        .select(col("staging_id"), coalesce(col("ns"), lit("DISCARD")).as("staging_status"))
      val issuesAll = Issues.mergeIssues(
        Issues.deriveIssues(c, "row_", "row_number"),
        Issues.deriveIssues(reclass, "staging_", "staging_id"))
      val items0 = Issues.deriveIssueItems(c, "row_", "row_number")
      val derived2 = Issues.deriveIssueItems(reclass, "staging_", "staging_id")
      val itemsAll = items0.unionByName(derived2.join(items0,
        Seq("issues_job_id", "issue_type", "issue_key", "item_staging_id"), "left_anti"))
      Issues.recomputeResolution(issuesAll, itemsAll, newStatus)
        .select("issue_type", "issue_key", "unresolved_items", "issue_resolved")
        .orderBy("issue_type", "issue_key")
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

    "q_reprocess_resolution" -> withCtes(
      s""", staging0 AS (
         |  SELECT row_number AS staging_id, job_id, trim(email) AS staging_email,
         |         trim(first_name) AS staging_first_name, trim(last_name) AS staging_last_name,
         |         trim(company) AS staging_company, staging_status, issue_type AS issue_type0
         |  FROM classified),
         |edited AS (
         |  SELECT staging_id, job_id,
         |    CASE WHEN issue_type0 = 'INVALID_EMAIL'
         |         THEN 'fixed' || CAST(staging_id AS VARCHAR) || '@example.com'
         |         ELSE staging_email END AS email,
         |    staging_first_name AS first_name, staging_last_name AS last_name,
         |    staging_company AS company, staging_status
         |  FROM staging0),
         |edited2 AS (
         |  SELECT *, CASE WHEN email = '' THEN 'DISCARD' ELSE staging_status END AS status1
         |  FROM edited),
         |working AS (SELECT * FROM edited2 WHERE status1 <> 'DISCARD'),
         |dups2 AS (
         |  SELECT lower(trim(email)) AS ne FROM working
         |  WHERE trim(email) <> '' GROUP BY 1 HAVING count(*) > 1),
         |reclass AS (
         |  SELECT w.staging_id, lower(trim(w.email)) AS norm_email2,
         |    CASE WHEN trim(w.email) = '' THEN 'MISSING_REQUIRED_FIELD'
         |         WHEN trim(w.first_name) = '' THEN 'MISSING_REQUIRED_FIELD'
         |         WHEN trim(w.last_name) = '' THEN 'MISSING_REQUIRED_FIELD'
         |         WHEN trim(w.company) = '' THEN 'MISSING_REQUIRED_FIELD'
         |         WHEN NOT regexp_matches(trim(w.email), '$emailRegexSql') THEN 'INVALID_EMAIL'
         |         WHEN d.ne IS NOT NULL THEN 'DUPLICATE_EMAIL'
         |         WHEN e.contact_email IS NOT NULL THEN 'EXISTING_EMAIL'
         |         ELSE NULL END AS issue_type2
         |  FROM working w
         |  LEFT JOIN dups2 d ON lower(trim(w.email)) = d.ne
         |  LEFT JOIN existing e ON lower(trim(w.email)) = e.contact_email),
         |status_all AS (
         |  SELECT e2.staging_id,
         |         CASE WHEN r.staging_id IS NULL THEN 'DISCARD'
         |              WHEN r.issue_type2 IS NULL THEN 'READY'
         |              ELSE 'ISSUE' END AS staging_status
         |  FROM edited2 e2 LEFT JOIN reclass r ON e2.staging_id = r.staging_id),
         |flagged0 AS (
         |  SELECT *, CASE WHEN norm_email <> '' THEN norm_email
         |                 ELSE 'row_' || CAST(row_number AS VARCHAR) END AS issue_key
         |  FROM classified WHERE issue_type IS NOT NULL),
         |flagged2 AS (
         |  SELECT *, CASE WHEN norm_email2 <> '' THEN norm_email2
         |                 ELSE 'staging_' || CAST(staging_id AS VARCHAR) END AS issue_key
         |  FROM reclass WHERE issue_type2 IS NOT NULL),
         |issues_all AS (
         |  SELECT issue_type, issue_key FROM flagged0
         |  UNION
         |  SELECT issue_type2, issue_key FROM flagged2),
         |items_all AS (
         |  SELECT issue_type, issue_key, row_number AS item_staging_id FROM flagged0
         |  UNION
         |  SELECT issue_type2, issue_key, staging_id FROM flagged2)
         |SELECT i.issue_type, i.issue_key,
         |  CAST(coalesce(sum(CASE WHEN sa.staging_status = 'ISSUE' THEN 1 ELSE 0 END), 0) AS BIGINT) AS unresolved_items,
         |  coalesce(sum(CASE WHEN sa.staging_status = 'ISSUE' THEN 1 ELSE 0 END), 0) = 0 AS issue_resolved
         |FROM issues_all i
         |LEFT JOIN items_all it ON i.issue_type = it.issue_type AND i.issue_key = it.issue_key
         |LEFT JOIN status_all sa ON it.item_staging_id = sa.staging_id
         |GROUP BY 1, 2
         |ORDER BY i.issue_type, i.issue_key""".stripMargin),

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
