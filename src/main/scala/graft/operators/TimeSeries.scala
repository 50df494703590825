package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over event streams: count-anomaly detection and
  * event-time rolling aggregates — the monitoring half of a large-scale
  * ingest pipeline (is today's crawl volume normal? what's the 7-day
  * trend per source?).
  *
  * Scale notes (100 TB):
  *   - both operators aggregate the raw events ONCE into a per-(key,
  *     grain) frame — the only shuffle proportional to input size; every
  *     later step runs on the tiny rollup (|keys| x |grains| rows).
  *   - anomaly stats are single-pass algebraic moments (n, sum, sum of
  *     squares of exact integer counts), map-side combinable and merge-
  *     associative, then BROADCAST back — no second scan, no window over
  *     the raw data.
  *   - rolling windows use a RANGE frame over the integer day index, so
  *     calendar gaps are honored (a missing day shrinks the window
  *     instead of silently widening it to the last 7 ROWS).
  */
object TimeSeries {

  /** Hour-grain count anomalies per key: flag buckets whose count exceeds
    * `mean + z * stddev` of that key's bucket counts (sample stddev).
    *
    * The moments are exact BIGINTs (counts and squared counts), so the
    * derived mean/stddev/z-score doubles are bit-identical across engines
    * (IEEE +,-,*,/,sqrt are exactly rounded) — oracle-verifiable without
    * rounding tricks. Keys with fewer than two buckets have no sample
    * variance and are never flagged.
    */
  def countAnomalies(
      events: DataFrame, tsCol: String, keyCol: String,
      grain: String = "hour", z: Double = 2.0): DataFrame = {
    val buckets = events
      .groupBy(date_trunc(grain, col(tsCol)).as("bucket"), col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"))
    val stats = buckets.groupBy(keyCol).agg(
      count(lit(1)).cast("long").as("n_buckets"),
      sum(col("n")).cast("long").as("s1"),
      sum(col("n") * col("n")).cast("long").as("s2"))
    val mean = col("s1").cast("double") / col("n_buckets").cast("double")
    val variance =
      (col("s2").cast("double") -
        col("s1").cast("double") * col("s1").cast("double") /
          col("n_buckets").cast("double")) /
        (col("n_buckets") - 1).cast("double")
    buckets.join(broadcast(stats), Seq(keyCol))
      .filter(col("n_buckets") > 1)
      .withColumn("zscore", (col("n").cast("double") - mean) / sqrt(variance))
      .filter(col("zscore") > lit(z))
      .select(col(keyCol), col("bucket"), col("n"),
        round(col("zscore"), 6).as("zscore"))
  }

  /** Day-grain rolling count per key: for every (key, day) with data, the
    * event count that day, the count over the trailing `days`-day window,
    * and the average over the days PRESENT in that window (RANGE frame on
    * the epoch-day index — calendar-aware, not row-count-based).
    */
  def rollingDailyCounts(
      events: DataFrame, tsCol: String, keyCol: String,
      days: Int = 7): DataFrame = {
    require(days >= 1, s"days must be >= 1, got $days")
    val daily = events
      .groupBy(to_date(col(tsCol)).as("day"), col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"))
      .withColumn("day_num",
        datediff(col("day"), to_date(lit("1970-01-01"))).cast("long"))
    val w = Window.partitionBy(keyCol).orderBy("day_num")
      .rangeBetween(-(days - 1), 0)
    daily
      .withColumn("n_window", sum(col("n")).over(w).cast("long"))
      .withColumn("days_present", count(col("n")).over(w).cast("long"))
      .withColumn("avg_window",
        round(col("n_window").cast("double") /
          col("days_present").cast("double"), 6))
      .select(col(keyCol), col("day"), col("n"),
        col("n_window"), col("days_present"), col("avg_window"))
  }
}
