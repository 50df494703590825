package graft.io

import java.sql.{Connection, DriverManager, PreparedStatement}
import org.apache.spark.sql.{DataFrame, Row}

/** Batched JDBC upsert — the custom sink helper for the UPDATE-shaped writes
  * the reference performs (staging status W2, issue resolve W4, job counters
  * W7/W8; SURVEY.md §7.4). Spark's JDBC writer is insert-only, so each
  * partition opens one connection and executes batched
  * `INSERT ... ON CONFLICT (keys) DO UPDATE SET ...` statements — set-based
  * write amplification (one round-trip per batch) instead of the reference's
  * per-row commit (staging_repository.py:106).
  *
  * Executor-side `foreachPartition`: connections scale with partitions, not
  * rows; idempotent by construction (re-running a batch converges), which is
  * what makes at-least-once message replay safe (README ADR-001).
  */
object JdbcUpsert {

  /** Upsert statement for one row, plus the column bind order its `?`
    * placeholders expect. Two dialects:
    *   - "postgres": INSERT ... ON CONFLICT (keys) DO UPDATE (the
    *     reference's target database)
    *   - "merge": ANSI MERGE against a 1-row dummy table (Derby/DB2 shape;
    *     also what the embedded-Derby spec drives, since ON CONFLICT is
    *     Postgres-only)
    */
  def upsertSql(
      table: String,
      cols: Seq[String],
      keyCols: Seq[String],
      dialect: String = "postgres",
      dummyTable: String = "SYSIBM.SYSDUMMY1"): (String, Seq[String]) = {
    val updatable = cols.filterNot(keyCols.contains)
    // Spark's JDBC writer creates DELIMITED (case-exact) column identifiers,
    // so every column reference must be quoted the same way — unquoted names
    // would be case-folded by the database (Derby upper, Postgres lower)
    // and miss. The table name is passed through as the caller wrote it
    // (it may be schema-qualified).
    def q(id: String) = "\"" + id + "\""
    dialect match {
      case "postgres" =>
        val sql =
          s"""INSERT INTO $table (${cols.map(q).mkString(", ")})
             |VALUES (${cols.map(_ => "?").mkString(", ")})
             |ON CONFLICT (${keyCols.map(q).mkString(", ")})
             |DO UPDATE SET ${updatable.map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")}"""
            .stripMargin
        (sql, cols)
      case "merge" =>
        val sql =
          s"""MERGE INTO $table t
             |USING $dummyTable
             |ON ${keyCols.map(k => s"t.${q(k)} = ?").mkString(" AND ")}
             |WHEN MATCHED THEN UPDATE SET ${updatable.map(c => s"${q(c)} = ?").mkString(", ")}
             |WHEN NOT MATCHED THEN INSERT (${cols.map(q).mkString(", ")})
             |VALUES (${cols.map(_ => "?").mkString(", ")})"""
            .stripMargin
        (sql, keyCols ++ updatable ++ cols)
      case other => throw new IllegalArgumentException(s"unknown upsert dialect: $other")
    }
  }

  def upsert(
      df: DataFrame,
      url: String,
      table: String,
      keyCols: Seq[String],
      props: java.util.Properties,
      batchSize: Int = 1000,
      dialect: String = "postgres"): Unit = {
    val cols = df.columns.toSeq
    val (sql, bindOrder) = upsertSql(table, cols, keyCols, dialect)
    val user = Option(props.getProperty("user"))
    val password = Option(props.getProperty("password"))

    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn: Connection = (user, password) match {
          case (Some(u), Some(p)) => DriverManager.getConnection(url, u, p)
          case _ => DriverManager.getConnection(url)
        }
        try {
          conn.setAutoCommit(false)
          val st: PreparedStatement = conn.prepareStatement(sql)
          var n = 0
          rows.foreach { r =>
            bindOrder.zipWithIndex.foreach { case (c, i) =>
              st.setObject(i + 1, r.getAs[Any](c))
            }
            st.addBatch()
            n += 1
            if (n % batchSize == 0) { st.executeBatch(); conn.commit() }
          }
          st.executeBatch()
          conn.commit()
        } catch {
          case e: Throwable =>
            // Roll back the open transaction so close() doesn't throw
            // "transaction still active" and mask the real failure.
            try conn.rollback() catch { case _: Exception => () }
            throw e
        } finally conn.close()
      }
    }
  }
}
