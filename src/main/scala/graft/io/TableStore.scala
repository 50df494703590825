package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path

/** Storage abstraction for the five engine tables (jobs, staging, issues,
  * issue_items, contacts).
  *
  * The reference mutates rows in place in Postgres; our dataflow recomputes
  * derived state per run and persists snapshots/appends (SURVEY.md §7.5 —
  * removes the read-modify-write races the reference avoids only by being
  * single-threaded). Two impls: parquet (testdata/oracle harness, local
  * runs) and JDBC (production parity — see [[JdbcUpsert]] for the
  * UPDATE-shaped writes Spark's JDBC writer lacks).
  */
trait TableStore {
  def load(table: String): DataFrame
  def exists(table: String): Boolean
  /** Replace the table content atomically (snapshot semantics). */
  def overwrite(table: String, df: DataFrame): Unit
  /** Append rows (insert-only path, e.g. contacts batch insert W6). */
  def append(table: String, df: DataFrame): Unit
  /** Replace several tables whose plans may READ each other's current
    * content: all plans must be materialized before any target is replaced.
    * Default is sequential (safe only for independent plans); snapshot
    * stores override with a two-phase write-then-swap. */
  def overwriteAll(tables: Seq[(String, DataFrame)]): Unit =
    tables.foreach { case (t, df) => overwrite(t, df) }
}

/** Parquet-backed store. `overwrite` writes to a temp dir then swaps, so a
  * snapshot can be rebuilt from a plan that reads the same table (Spark
  * cannot overwrite a path it is concurrently reading), and a crash mid-write
  * never leaves a half-replaced table. At scale, tables that are filtered by
  * job/tenant (`staging`, `contacts`) should be written with
  * `partitionByCols` so per-job reads prune partitions.
  */
class ParquetTableStore(
    spark: SparkSession,
    root: String,
    partitionByCols: Map[String, Seq[String]] = Map(
      "staging" -> Seq("staging_job_id"),
      "contacts" -> Seq("contacts_user_id"))
) extends TableStore {

  private def dir(table: String) = s"$root/$table"

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def exists(table: String): Boolean = fs.exists(new Path(dir(table)))

  override def load(table: String): DataFrame = spark.read.parquet(dir(table))

  private def writeTmp(table: String, df: DataFrame): Path = {
    val tmp = new Path(dir(table) + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
    val writer = partitionByCols.get(table) match {
      case Some(cols) if cols.forall(df.columns.contains) => df.write.partitionBy(cols: _*)
      case _ => df.write
    }
    writer.parquet(tmp.toString)
    tmp
  }

  private def swap(table: String, tmp: Path): Unit = {
    val target = new Path(dir(table))
    if (fs.exists(target)) fs.delete(target, true)
    fs.rename(tmp, target)
  }

  override def overwrite(table: String, df: DataFrame): Unit =
    swap(table, writeTmp(table, df))

  /** Two-phase: materialize EVERY plan into its tmp dir while all source
    * files still exist, then swap. A FlowResult's staging/issues/contacts
    * plans all read the pre-run snapshots — replacing one table before the
    * others are written would yield FileNotFound stage failures. */
  override def overwriteAll(tables: Seq[(String, DataFrame)]): Unit = {
    val tmps = tables.map { case (t, df) => t -> writeTmp(t, df) }
    tmps.foreach { case (t, tmp) => swap(t, tmp) }
  }

  override def append(table: String, df: DataFrame): Unit = {
    // An empty partitioned write emits no schema-bearing files (only
    // _SUCCESS), which would poison later reads — nothing to append anyway.
    if (df.isEmpty) return
    val writer = partitionByCols.get(table) match {
      case Some(cols) if cols.forall(df.columns.contains) => df.write.partitionBy(cols: _*)
      case _ => df.write
    }
    writer.mode("append").parquet(dir(table))
  }
}

/** JDBC-backed store (Postgres parity). Reads push the table/user predicate
  * down via the `query` option; appends use the stock JDBC writer; UPDATE-
  * shaped writes go through [[JdbcUpsert]]. */
class JdbcTableStore(
    spark: SparkSession,
    url: String,
    props: java.util.Properties) extends TableStore {

  override def exists(table: String): Boolean = true // DDL-managed

  override def load(table: String): DataFrame =
    spark.read.jdbc(url, table, props)

  override def overwrite(table: String, df: DataFrame): Unit =
    df.write.mode("overwrite").option("truncate", "true").jdbc(url, table, props)

  override def append(table: String, df: DataFrame): Unit =
    df.write.mode("append").jdbc(url, table, props)
}
