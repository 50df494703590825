package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hexThreshold: 8-hex-char encoding of the rate, 'g' at and above 1.0") {
    assert(Sampling.hexThreshold(0.25) === "40000000")
    assert(Sampling.hexThreshold(0.5) === "80000000")
    assert(Sampling.hexThreshold(0.0) === "00000000")
    assert(Sampling.hexThreshold(1.0) === "g")
    assert(Sampling.hexThreshold(2.0) === "g")
  }

  test("stratifiedSample: deterministic, layout-independent, rate-proportional") {
    val df = (0L until 2000L).map(i => (i, s"src${i % 2}")).toDF("id", "stratum")
    val rates = Map("src0" -> 0.2, "src1" -> 0.8)
    val once = Sampling.stratifiedSample(df, "id", "stratum", rates)
      .select("id").as[Long].collect().toSet
    // Re-run under a different partitioning: identical selection.
    val again = Sampling.stratifiedSample(df.repartition(7), "id", "stratum", rates)
      .select("id").as[Long].collect().toSet
    assert(once === again)
    val bySrc = Sampling.stratifiedSample(df, "id", "stratum", rates)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    // 1000 per stratum; md5 is uniform, so the kept counts concentrate near
    // rate * 1000 (3-sigma ~ 38 for p=0.2).
    assert(math.abs(bySrc("src0") - 200L) < 60, s"src0 kept ${bySrc("src0")}")
    assert(math.abs(bySrc("src1") - 800L) < 60, s"src1 kept ${bySrc("src1")}")
  }

  test("stratifiedSample: rate 0 drops everything, rate 1 keeps everything") {
    val df = (0L until 100L).map(i => (i, "s")).toDF("id", "stratum")
    assert(Sampling.stratifiedSample(df, "id", "stratum", Map("s" -> 0.0)).count() === 0L)
    assert(Sampling.stratifiedSample(df, "id", "stratum", Map("s" -> 1.0)).count() === 100L)
    // default rate applies to strata absent from the map
    assert(Sampling.stratifiedSample(df, "id", "stratum", Map.empty, defaultRate = 1.0)
      .count() === 100L)
  }

  test("capPerKey: keeps the cap lowest-priority rows per key, all when under cap") {
    val df = Seq(
      ("a", 3L), ("a", 1L), ("a", 2L), ("a", 4L),
      ("b", 10L)).toDF("key", "ord")
    val out = Sampling.capPerKey(df, "key", "ord", cap = 2)
      .as[(String, Long)].collect().toSet
    assert(out === Set(("a", 1L), ("a", 2L), ("b", 10L)))
    assert(Sampling.capPerKey(df, "key", "ord", cap = 10).count() === 5L)
  }

  test("weightedSampleTopK: deterministic, layout-independent, respects k") {
    val df = (0L until 500L).map(i => (i, s"s${i % 2}", 1.0 + (i % 10)))
      .toDF("id", "stratum", "w")
    val once = Sampling.weightedSampleTopK(df, "id", "stratum", "w", k = 25)
      .select("id").as[Long].collect().toSet
    val again = Sampling.weightedSampleTopK(df.repartition(7), "id", "stratum", "w", k = 25)
      .select("id").as[Long].collect().toSet
    assert(once === again)
    val perStratum = Sampling.weightedSampleTopK(df, "id", "stratum", "w", k = 25)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(perStratum.values.forall(_ === 25L))
    // k above the group size keeps everything
    assert(Sampling.weightedSampleTopK(df, "id", "stratum", "w", k = 1000).count() === 500L)
  }

  test("weightedSampleTopK: weights steer inclusion probability") {
    // One row with overwhelming weight vs 99 unit-weight rows: its sort key
    // ln(u)/w is ~0 (beats any unit-weight row whose u isn't ~1.0), so it
    // must be selected; deterministic hashing makes this assertion stable.
    val df = ((1L to 99L).map(i => (i, "s", 1.0)) :+ (100L, "s", 1e9))
      .toDF("id", "stratum", "w")
    val kept = Sampling.weightedSampleTopK(df, "id", "stratum", "w", k = 10)
      .select("id").as[Long].collect().toSet
    assert(kept.contains(100L))
    // And the heavy-weight row ranks first
    val top = Sampling.weightedSampleTopK(df, "id", "stratum", "w", k = 10)
      .filter(col("rnk") === 1).select("id").as[Long].head()
    assert(top === 100L)
  }
}
