package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  test("logisticScore matches the scalar sigmoid on known inputs") {
    val df = Seq((1.0, 2.0), (0.0, 0.0), (-3.0, 5.0)).toDF("a", "b")
    val got = df.select(
      QualityModel.logisticScore(0.5, Seq(col("a") -> 2.0, col("b") -> -1.0)).as("s"))
      .as[Double].collect()
    val want = Seq((1.0, 2.0), (0.0, 0.0), (-3.0, 5.0)).map { case (a, b) =>
      1.0 / (1.0 + math.exp(-(0.5 + 2.0 * a - 1.0 * b)))
    }
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
    // range sanity: a sigmoid stays strictly inside (0, 1)
    got.foreach(s => assert(s > 0.0 && s < 1.0))
  }

  test("perGroupPercentile: rank is per group, in [0,1], monotone in the score") {
    val df = Seq(
      ("s1", 10L, 1L), ("s1", 20L, 2L), ("s1", 30L, 3L), ("s1", 40L, 4L), ("s1", 50L, 5L),
      ("s2", 5L, 6L), ("s2", 15L, 7L)
    ).toDF("src", "fp", "id")
    val got = QualityModel.perGroupPercentile(df, "src", "fp", "id")
      .select("src", "fp", "pct_rank").as[(String, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // 5-row group: percent_rank = (rank-1)/(n-1) = 0, .25, .5, .75, 1
    assert(got("s1") === Seq(0.0, 0.25, 0.5, 0.75, 1.0))
    // 2-row group ranks independently of the other group
    assert(got("s2") === Seq(0.0, 1.0))
  }

  test("perGroupPercentile: fixed-point ties broken deterministically by the tie column") {
    val df = Seq(("s", 10L, 2L), ("s", 10L, 1L), ("s", 20L, 3L)).toDF("src", "fp", "id")
    val got = QualityModel.perGroupPercentile(df, "src", "fp", "id")
      .select("id", "pct_rank").as[(Long, Double)].collect().toMap
    // the tie column is part of the ORDER BY, so equal-fp rows get distinct,
    // deterministic ranks (id 1 sorts before id 2)
    assert(got(1L) === 0.0 && got(2L) === 0.5)
    assert(got(3L) === 1.0)
  }
}
