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

  // A separable 1-feature fixture: positives at x ~ 0.8, negatives at
  // x ~ 0.2 (with a little deterministic jitter so gradients aren't
  // degenerate). GD from zero must push w_x positive and fit it.
  private def lrFixture = (0 until 200).map { i =>
    val y = i % 2
    val x = (if (y == 1) 0.8 else 0.2) + (i % 7 - 3) * 0.01
    (i.toLong, x, y.toDouble)
  }.toDF("id", "x", "y")

  test("logisticTrain: loss decreases with steps, accuracy beats the base rate, " +
    "informative feature takes a positive weight") {
    val feats = Seq("x" -> col("x"))
    val r1 = QualityModel.logisticTrain(lrFixture, feats, col("y"), steps = 1, lr = 2.0)
      .collect().head
    val r5 = QualityModel.logisticTrain(lrFixture, feats, col("y"), steps = 5, lr = 2.0)
      .collect().head
    val loss1 = r1.getAs[Double]("log_loss")
    val loss5 = r5.getAs[Double]("log_loss")
    assert(loss5 < loss1, s"loss did not decrease: step1 $loss1 -> step5 $loss5")
    assert(loss5 < math.log(2.0), s"final loss $loss5 not below the zero-model ln 2")
    assert(r5.getAs[Double]("w_x") > 0.0, "separating feature should get a positive weight")
    assert(r5.getAs[Double]("train_acc") > 0.9, s"acc ${r5.getAs[Double]("train_acc")}")
  }

  test("logisticTrain: bit-identical to a local scalar replay of the same " +
    "fixed-point algebra (scaler included), and layout-independent") {
    val feats = Seq("x" -> col("x"))
    val rows = lrFixture.select("x", "y").as[(Double, Double)].collect()
    // QualityModel's pure-IEEE floor-form rounding, replayed in scalars
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    def fp(v: Double): Long = math.floor(v * 1e6 + 0.5).toLong
    val n = rows.length.toDouble
    // the scaler replay: one-pass fixed-point mean / E[x^2] - mean^2 std
    val xs = rows.map { case (x0, _) => r6(x0) }
    val mean = r6(xs.map(fp).sum.toDouble / (n * 1e6))
    val std = r6(math.sqrt(math.max(
      r6(xs.map(x => fp(x * x)).sum.toDouble / (n * 1e6) - mean * mean), 0.0)))
    val std1 = if (std < 1e-6) 1.0 else std
    val zs = rows.map { case (x0, y) => (r6((r6(x0) - mean) / std1), y) }
    var (wx, b) = (0.0, 0.0)
    for (_ <- 1 to 5) {
      var (gx, gb) = (0L, 0L)
      zs.foreach { case (x, y) =>
        val p = 1.0 / (1.0 + math.exp(-(b + wx * x)))
        gx += fp((p - y) * x); gb += fp(p - y)
      }
      wx = r6(wx - 2.0 * (gx.toDouble / (n * 1e6)))
      b = r6(b - 2.0 * (gb.toDouble / (n * 1e6)))
    }
    val got = QualityModel.logisticTrain(lrFixture, feats, col("y"), steps = 5, lr = 2.0)
      .collect().head
    assert(got.getAs[Double]("mean_x") === mean && got.getAs[Double]("std_x") === std,
      "scaler must match the scalar replay exactly")
    assert(got.getAs[Double]("w_x") === wx, "w_x must match the scalar replay exactly")
    assert(got.getAs[Double]("bias") === b, "bias must match the scalar replay exactly")
    val re = QualityModel.logisticTrain(
      lrFixture.repartition(13), feats, col("y"), steps = 5, lr = 2.0).collect().head
    assert(re.getAs[Double]("w_x") === wx && re.getAs[Double]("bias") === b,
      "training must be partition-layout-independent")
  }

  test("scoreWith: scores are the sigmoid of the trained model (scaler replayed), in (0,1)") {
    val feats = Seq("x" -> col("x"))
    val w = QualityModel.logisticTrain(lrFixture, feats, col("y"), steps = 5, lr = 2.0)
    val wrow = w.collect().head
    val (wx, b) = (wrow.getAs[Double]("w_x"), wrow.getAs[Double]("bias"))
    val (mean, std) = (wrow.getAs[Double]("mean_x"), wrow.getAs[Double]("std_x"))
    val std1 = if (std < 1e-6) 1.0 else std
    val scored = QualityModel.scoreWith(lrFixture, w, feats)
      .select("x", "score").as[(Double, Double)].collect()
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    scored.foreach { case (x0, s) =>
      val x = r6((r6(x0) - mean) / std1)
      val want = r6(1.0 / (1.0 + math.exp(-(b + wx * x))))
      assert(s === want, s"score at z=$x")
      assert(s > 0.0 && s < 1.0)
    }
    // the fit actually separates: positives score clearly above negatives
    // (5 full-batch steps at lr=2 open a ~0.17 mean gap on this fixture;
    // the bias term converges slower than the slope, so absolute levels
    // still straddle 0.5)
    val byY = QualityModel.scoreWith(lrFixture, w, feats)
      .groupBy("y").agg(avg("score").as("m")).as[(Double, Double)].collect().toMap
    assert(byY(1.0) - byY(0.0) > 0.15,
      s"mean score gap ${byY(1.0) - byY(0.0)} too small")
  }

  test("logisticTrain: degenerate inputs stay finite — one-class labels fit " +
    "without NaN, constant features standardize to 0 and take zero weight") {
    // All-positive labels: GD drives the bias up; loss and metrics must
    // stay finite (sigmoid never reaches 1.0 in double at these scales)
    // and accuracy must hit 1.0. A CONSTANT feature (zero variance) must
    // ride the std<1e-6 stand-in: standardized value 0 everywhere, so its
    // weight stays exactly 0 through every step.
    val df = (0 until 50).map(i => (i.toLong, 0.2 + (i % 5) * 0.1, 7.5))
      .toDF("id", "x", "const")
    val feats = Seq("x" -> col("x"), "const" -> col("const"))
    val r = QualityModel.logisticTrain(df, feats, lit(1.0), steps = 10, lr = 2.0)
      .collect().head
    assert(!r.getAs[Double]("log_loss").isNaN && !r.getAs[Double]("log_loss").isInfinite)
    assert(r.getAs[Double]("train_acc") === 1.0)
    assert(r.getAs[Double]("std_const") === 0.0, "constant feature must report std 0")
    assert(r.getAs[Double]("w_const") === 0.0,
      "a zero-variance feature must never accumulate weight")
    assert(r.getAs[Double]("bias") > 0.5, "all-positive labels should push the bias up")
  }

  test("domainReweight: harder-than-average domains gain share, weights " +
    "renormalize to ~1, and the update is layout-independent") {
    // key A: mean loss 4.0 (hard), key B: 2.0 (easy), 100 docs each.
    val perDoc = (0 until 200).map { i =>
      val hard = i < 100
      (if (hard) "A" else "B", (if (hard) 4.0 else 2.0) + (i % 5 - 2) * 0.001)
    }.toDF("src", "loss")
    val got = Sampling.domainReweight(perDoc, "src", "loss", eta = 1.0)
      .collect().map(r => r.getAs[String]("key") -> r).toMap
    val (a, bRow) = (got("A"), got("B"))
    assert(a.getAs[Double]("excess") > 0.9 && bRow.getAs[Double]("excess") === 0.0,
      "only the harder-than-average domain carries excess")
    assert(a.getAs[Double]("old_share") === 0.5 && bRow.getAs[Double]("old_share") === 0.5)
    assert(a.getAs[Double]("new_weight") > 0.7,
      s"hard domain should gain share, got ${a.getAs[Double]("new_weight")}")
    val sum = a.getAs[Double]("new_weight") + bRow.getAs[Double]("new_weight")
    assert(math.abs(sum - 1.0) < 1e-5, s"weights should renormalize, sum $sum")
    // multiplicative form: new_A/new_B ~ exp(eta * (excess_A - excess_B))
    val ratio = a.getAs[Double]("new_weight") / bRow.getAs[Double]("new_weight")
    val want = math.exp(a.getAs[Double]("excess") - bRow.getAs[Double]("excess"))
    assert(math.abs(ratio - want) < 0.01, s"ratio $ratio vs exp(excess delta) $want")
    val re = Sampling.domainReweight(perDoc.repartition(11), "src", "loss", eta = 1.0)
      .collect().map(r => r.getAs[String]("key") -> r.getAs[Double]("new_weight")).toMap
    assert(re("A") === a.getAs[Double]("new_weight"), "layout-independent")
  }
}
