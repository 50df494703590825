package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:15:00")

  test("countAnomalies: flags only the spiked bucket, z-score matches hand calc") {
    // key "a": ten 1-count hours + one 20-count hour. (A single outlier's
    // z-score is bounded by (n-1)/sqrt(n), so few buckets can never trip a
    // 2-sigma gate — 11 buckets put the spike at z ~ 3.0.)
    val rows =
      (1 to 10).map(h => (ts(1, h), "a")) ++         // ten 1-count hours
        Seq.fill(20)((ts(1, 11), "a")) ++            // one 20-count hour
        Seq.fill(3)((ts(1, 1), "b"))                 // single-bucket key: no variance
    val out = TimeSeries.countAnomalies(
        rows.toDF("ts", "event_type"), "ts", "event_type", z = 2.0)
      .select("event_type", "n", "zscore")
      .as[(String, Long, Double)].collect()

    assert(out.length === 1)
    val (key, n, zscore) = out.head
    assert(key === "a" && n === 20L)
    // n_buckets=11, s1=30, s2=410: mean = 30/11, var = (410 - 900/11)/10
    val mean = 30.0 / 11
    val varS = (410.0 - 30.0 * 30.0 / 11) / 10
    assert(math.abs(zscore - BigDecimal(
      (20 - mean) / math.sqrt(varS)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble) < 1e-12)
  }

  test("countAnomalies: single-bucket keys are never flagged (no sample variance)") {
    val rows = Seq.fill(100)((ts(1, 1), "only"))
    val out = TimeSeries.countAnomalies(
      rows.toDF("ts", "event_type"), "ts", "event_type", z = 0.0)
    assert(out.count() === 0)
  }

  test("rollingDailyCounts: RANGE frame honors calendar gaps") {
    // key "a": days 1, 2, 10 — day 10's trailing week must NOT see days 1-2.
    val rows = Seq(
      (ts(1, 1), "a"), (ts(1, 2), "a"),   // day 1: n=2
      (ts(2, 1), "a"),                    // day 2: n=1
      (ts(10, 1), "a"))                   // day 10: n=1, alone in its window
    val out = TimeSeries.rollingDailyCounts(
        rows.toDF("ts", "event_type"), "ts", "event_type", days = 7)
      .orderBy("day")
      .select("n", "n_window", "days_present", "avg_window")
      .as[(Long, Long, Long, Double)].collect().toSeq

    assert(out === Seq(
      (2L, 2L, 1L, 2.0),   // day 1
      (1L, 3L, 2L, 1.5),   // day 2: window = {day1, day2}
      (1L, 1L, 1L, 1.0)))  // day 10: gap > 7 days, window resets
  }

  test("rollingDailyCounts: keys are windowed independently") {
    val rows = Seq((ts(1, 1), "a"), (ts(2, 1), "b"))
    val out = TimeSeries.rollingDailyCounts(
        rows.toDF("ts", "event_type"), "ts", "event_type", days = 7)
      .select("event_type", "n_window").as[(String, Long)].collect().toMap
    assert(out === Map("a" -> 1L, "b" -> 1L))
  }
}
