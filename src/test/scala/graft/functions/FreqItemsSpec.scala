package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Misra–Gries sketch + exact two-pass heavy hitters. */
class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  // 100 "hot", 50 "warm", 30 "cool", and 40 distinct singletons: a skewed
  // stream whose distinct count (43) far exceeds the sketch capacities used
  // below — the decrement path must fire.
  private def skewed = (
    Seq.fill(100)("hot") ++ Seq.fill(50)("warm") ++ Seq.fill(30)("cool") ++
      (1 to 40).map(i => s"one_$i")
  ).toDF("w")

  test("heavyHitters equals the exact vocabulary aggregation (capacity < distinct)") {
    // n = 220; threshold 0.1 -> cnt >= 22: {hot, warm, cool}. capacity 16
    // satisfies the recall bound (0.1 >= 1/17) while 43 distinct keys force
    // constant eviction in the sketch.
    val got = FreqItems.heavyHitters(skewed, "w", capacity = 16, minFraction = 0.1)
      .as[(String, Long, Double)].collect().sortBy(-_._2)
    assert(got.map(r => r._1 -> r._2).toSeq ===
      Seq("hot" -> 100L, "warm" -> 50L, "cool" -> 30L))
    assert(got.head._3 === (100.0 / 220.0 * 1e6).round / 1e6)
  }

  test("heavyHitters is partitioning-independent") {
    val expected = FreqItems.heavyHitters(skewed.coalesce(1), "w", 16, 0.1)
      .as[(String, Long, Double)].collect().toSet
    for (p <- Seq(3, 7)) {
      val got = FreqItems.heavyHitters(skewed.repartition(p), "w", 16, 0.1)
        .as[(String, Long, Double)].collect().toSet
      assert(got === expected, s"partitions=$p")
    }
  }

  test("MG candidate set is a superset of every key above the recall bound") {
    // Direct sketch-level property: every key with freq > n/(capacity+1)
    // must survive pass 1, under any partitioning.
    val mg = udaf(new MisraGriesAggregator(8))
    for (p <- Seq(1, 5)) {
      val cands = skewed.repartition(p).agg(mg(col("w")).as("c"))
        .select(explode(col("c.keys")).as("w")).as[String].collect().toSet
      // n = 220, capacity 8 -> bound 220/9 = 24.4: hot, warm, cool must survive
      assert(Set("hot", "warm", "cool").subsetOf(cands), s"partitions=$p got $cands")
    }
  }

  test("heavyHitters rejects thresholds at or below the sketch recall bound") {
    intercept[IllegalArgumentException] {
      FreqItems.heavyHitters(skewed, "w", capacity = 4, minFraction = 0.1)
    }
    // Exact equality is ALSO rejected: at minFraction == 1/(capacity+1) a
    // key exactly at threshold can be evicted yet belong in the output
    // (capacity=1, stream a,b,a,b -> empty candidates, brute force = both).
    intercept[IllegalArgumentException] {
      FreqItems.heavyHitters(skewed, "w", capacity = 1, minFraction = 0.5)
    }
  }
}
