package graft.functions

import graft.SparkSpec

/** Exact-quantile histogram refinement vs sorted-array ground truth. */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def disc(xs: Seq[Double], q: Double): Double = {
    val sorted = xs.sorted
    sorted(math.max(1, math.ceil(q * xs.size).toInt) - 1)
  }

  test("matches sorted-array rank selection across iterations and edge quantiles") {
    // 10007 distinct-ish values in scrambled order; tiny directLimit/bins
    // force several refinement rounds.
    val xs = (0 until 10007).map(i => ((i * 7919) % 10007).toDouble / 3.0)
    val df = xs.toDF("value")
    val qs = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0)
    val got = Quantiles.exactQuantilesDisc(df, "value", qs, bins = 8, directLimit = 32)
    qs.zip(got).foreach { case (q, g) =>
      assert(g === disc(xs, q), s"q=$q")
    }
  }

  test("heavy duplicates and all-equal columns") {
    val dup = Seq.fill(5000)(42.0) ++ Seq.fill(10)(7.0) ++ Seq.fill(10)(99.0)
    val got = Quantiles.exactQuantilesDisc(dup.toDF("value"), "value",
      Seq(0.001, 0.5, 0.999), bins = 4, directLimit = 16)
    assert(got === Seq(disc(dup, 0.001), disc(dup, 0.5), disc(dup, 0.999)))
    assert(got === Seq(7.0, 42.0, 99.0))
    val same = Quantiles.exactQuantilesDisc(Seq.fill(100)(5.5).toDF("value"),
      "value", Seq(0.5), bins = 4, directLimit = 8)
    assert(same === Seq(5.5))
  }

  test("nulls excluded; ranks computed over non-null count") {
    val df = (Seq.fill(50)(Some(1.0)) ++ Seq.fill(50)(Some(3.0)) ++ Seq.fill(30)(None))
      .toDF("value")
    val got = Quantiles.exactQuantilesDisc(df, "value", Seq(0.5, 1.0), bins = 4, directLimit = 8)
    assert(got === Seq(1.0, 3.0))
  }

  test("one histogram scan per round serves ALL ranks (never rounds × |qs|)") {
    val xs = (0 until 20011).map(i => ((i * 104729) % 20011).toDouble)
    val df = xs.toDF("value")
    val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    val (got, scans) = Quantiles.exactQuantilesDiscWithStats(
      df, "value", qs, bins = 8, directLimit = 32, maxIters = 8)
    qs.zip(got).foreach { case (q, g) => assert(g === disc(xs, q), s"q=$q") }
    // bins=8 over 20011 rows needs several refinement rounds; the scan
    // count must be bounded by maxIters alone. The per-quantile formulation
    // would burn rounds × 5 scans here (>= 15).
    assert(scans > 0 && scans <= 8, s"histogram scans = $scans")

    // Independent, non-self-reported check: count Spark jobs for the whole
    // call. Budget = 1 stats + maxIters histograms + |qs| final selections
    // (+1 slack); the per-quantile formulation needs >= rounds*|qs| extra.
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Quantiles.exactQuantilesDisc(df, "value", qs, bins = 8, directLimit = 32)
      // Deterministic drain of the async listener bus (no fixed sleep).
      org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
      val jobs = counter.get()
      // AQE runs ~2 jobs per aggregation (shuffle stage + final); budget =
      // 2 × (1 stats + maxIters histograms + |qs| finals). The per-quantile
      // formulation costs 2 × rounds × |qs| ≈ 40+ extra jobs here.
      assert(jobs <= 2 * (1 + 8 + qs.length), s"jobs = $jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
