package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.io.File
import java.nio.file.{Files, Paths}
import scala.sys.process._

/** Executes the engine's PostgreSQL-dialect SQL against a LIVE Postgres
  * server — the dialect the reference actually targets
  * (staging_repository.py:47-66 upserts into Postgres).
  *
  * The sandbox ships Postgres server binaries but no JDBC driver jar (zero
  * egress), so a full Spark-JDBC round trip can't run here; what CAN run —
  * and never had before round 7 — is the exact SQL text the engine emits:
  * [[JdbcUpsert.upsertSql]]'s `ON CONFLICT` statement (Postgres-only
  * syntax, untestable on embedded Derby) and [[JdbcTableStore]]'s
  * partition-commit `DELETE ... WHERE col IN (...)` + `INSERT ... SELECT`
  * pair, with the same delimited-identifier quoting Spark's JDBC writer
  * produces. Statements are executed via psql over a private unix-socket
  * cluster (initdb'd per suite, run as `nobody` since Postgres refuses
  * root), with `?` placeholders substituted by literals — the text around
  * them stays byte-identical to what the JDBC path prepares.
  *
  * Cancels (not fails) when the server binaries are unavailable.
  */
class PostgresDialectSpec extends PostgresCluster {

  /** Substitute `?` placeholders with SQL literals, in order — the psql
    * stand-in for PreparedStatement binds. Splits on the placeholders
    * FIRST so a '?' inside an earlier-bound literal can never be consumed
    * as the next placeholder. */
  private def fill(sql: String, args: Seq[Any]): String = {
    val parts = sql.split("\\?", -1)
    assert(parts.length == args.length + 1,
      s"${parts.length - 1} placeholders for ${args.length} args in:\n$sql")
    val lits = args.map {
      case null => "NULL"
      case s0: String => "'" + s0.replace("'", "''") + "'"
      case b: Boolean => if (b) "TRUE" else "FALSE"
      case v => String.valueOf(v)
    }
    parts.head + lits.zip(parts.tail).map { case (l, p) => l + p }.mkString
  }

  test("ON CONFLICT upsert (staging status W2): insert then conflicting update") {
    psql("""CREATE TABLE staging ("staging_id" BIGINT PRIMARY KEY,
           |  "staging_status" VARCHAR(32), "staging_email" VARCHAR(256))""".stripMargin)
    val cols = Seq("staging_id", "staging_status", "staging_email")
    val (sql, bindOrder) = JdbcUpsert.upsertSql("staging", cols, Seq("staging_id"))
    assert(bindOrder == cols)
    def row(vals: Map[String, Any]) = fill(sql, bindOrder.map(vals))
    psql(row(Map("staging_id" -> 1L, "staging_status" -> "READY",
      "staging_email" -> "a@b.co")))
    psql(row(Map("staging_id" -> 2L, "staging_status" -> "ISSUE",
      "staging_email" -> "x@b.co")))
    // Conflicting re-insert of key 1 must UPDATE, not error or duplicate.
    psql(row(Map("staging_id" -> 1L, "staging_status" -> "SUCCESS",
      "staging_email" -> "a2@b.co")))
    assert(psql("""SELECT "staging_id" || ':' || "staging_status" || ':' || "staging_email"
                  |FROM staging ORDER BY "staging_id"""".stripMargin)
      == "1:SUCCESS:a2@b.co\n2:ISSUE:x@b.co")
  }

  test("ON CONFLICT upsert (jobs W7/W8): composite update columns converge on replay") {
    psql("""CREATE TABLE jobs ("job_id" INTEGER PRIMARY KEY,
           |  "job_status" VARCHAR(32), "job_total_rows" BIGINT,
           |  "job_issue_count" BIGINT)""".stripMargin)
    val cols = Seq("job_id", "job_status", "job_total_rows", "job_issue_count")
    val (sql, bindOrder) = JdbcUpsert.upsertSql("jobs", cols, Seq("job_id"))
    val done = fill(sql, bindOrder.map(
      Map("job_id" -> 7, "job_status" -> "COMPLETED",
        "job_total_rows" -> 120L, "job_issue_count" -> 0L)))
    psql(fill(sql, bindOrder.map(
      Map("job_id" -> 7, "job_status" -> "PROCESSING",
        "job_total_rows" -> 0L, "job_issue_count" -> 0L))))
    psql(done)
    psql(done) // at-least-once replay: idempotent by construction
    assert(psql("""SELECT "job_status" || ':' || "job_total_rows" FROM jobs""")
      == "COMPLETED:120")
  }

  test("partition commit: DELETE IN + INSERT..SELECT swaps only the named jobs' rows") {
    psql("""CREATE TABLE pstaging ("staging_job_id" INTEGER, "staging_email" VARCHAR(64));
           |INSERT INTO pstaging VALUES (1, 'old1'), (2, 'old2'), (3, 'keep3');
           |CREATE TABLE pstaging_ctmp_x ("staging_job_id" INTEGER, "staging_email" VARCHAR(64));
           |INSERT INTO pstaging_ctmp_x VALUES (1, 'new1'), (2, 'new2')""".stripMargin)
    // The statement pair JdbcTableStore.overwritePartitionsAll emits for a
    // multi-job wave commit (one transaction; quoted identifiers).
    psql("""BEGIN;
           |DELETE FROM pstaging WHERE "staging_job_id" IN (1, 2);
           |INSERT INTO pstaging ("staging_job_id", "staging_email")
           |SELECT "staging_job_id", "staging_email" FROM pstaging_ctmp_x;
           |COMMIT""".stripMargin)
    assert(psql("""SELECT "staging_job_id" || ':' || "staging_email"
                  |FROM pstaging ORDER BY "staging_job_id"""".stripMargin)
      == "1:new1\n2:new2\n3:keep3")
  }

  test("snapshot swap: DELETE all + INSERT..SELECT in one transaction") {
    psql("""CREATE TABLE sjobs ("job_id" INTEGER, "job_status" VARCHAR(32));
           |INSERT INTO sjobs VALUES (1, 'PENDING'), (2, 'PENDING');
           |CREATE TABLE sjobs_otmp_x ("job_id" INTEGER, "job_status" VARCHAR(32));
           |INSERT INTO sjobs_otmp_x VALUES (1, 'COMPLETED'), (2, 'NEEDS_REVIEW')""".stripMargin)
    psql("""BEGIN;
           |DELETE FROM sjobs;
           |INSERT INTO sjobs ("job_id", "job_status")
           |SELECT "job_id", "job_status" FROM sjobs_otmp_x;
           |COMMIT""".stripMargin)
    assert(psql("""SELECT "job_id" || ':' || "job_status" FROM sjobs ORDER BY "job_id"""")
      == "1:COMPLETED\n2:NEEDS_REVIEW")
  }
}
