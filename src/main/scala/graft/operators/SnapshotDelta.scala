package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change capture between two corpus snapshots — the incremental-ingestion
  * pass of a crawl pipeline: nightly snapshot N+1 arrives, and only the
  * added + changed documents should re-enter cleaning/dedup/indexing, not
  * the whole 100 TB.
  */
object SnapshotDelta {

  /** Classify every key across two snapshots as `added` (only in `cur`),
    * `removed` (only in `old`), `changed` (both, content differs) or
    * `unchanged`.
    *
    * Scale shape: both sides are first projected to (key, content-hash) —
    * the wide payload (document text, binary columns) NEVER shuffles; the
    * full-outer join moves two narrow hash columns. Content equality is
    * md5 over the `contentCols` joined with a 0x01 separator (same
    * framing as the exact-dedup family), so "changed" means any of the
    * listed columns differs. One shuffle per side.
    */
  def delta(
      old: DataFrame, cur: DataFrame,
      keyCol: String, contentCols: Seq[String]): DataFrame = {
    def hashed(df: DataFrame, hashName: String) =
      df.select(col(keyCol),
        md5(concat_ws("\u0001", contentCols.map(c => col(c).cast("string")): _*))
          .as(hashName))
    val o = hashed(old, "old_hash")
    val c = hashed(cur, "new_hash")
    o.join(c, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") =!= col("new_hash"), lit("changed"))
          .otherwise(lit("unchanged")).as("change"),
        col("old_hash"), col("new_hash"))
  }
}
