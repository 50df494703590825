package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-based quality scoring: TRAINING and inference of a linear
  * (logistic) document-quality classifier, plus the per-source percentile
  * normalization that turns raw scores into a threshold-free keep/drop
  * policy. This is the fasttext/GPT-3-style "quality classifier" stage of
  * a training-data pipeline (Brown et al. 2020 appendix A trains a
  * logistic classifier over document features to filter CommonCrawl;
  * CCNet's is a fasttext LM), distinct from
  * [[TextAnalysis.qualityScore]]'s hand-tuned heuristic.
  */
object QualityModel {

  /** 1e-6 rounding as PURE IEEE arithmetic — floor(x·1e6 + 0.5)/1e6 —
    * instead of Spark's BigDecimal-based round(): the GD quantities in
    * this family live on exact decimal grids (weights are 1e-6 multiples,
    * gradients 1/(n·1e6) multiples), so round-half boundaries are HIT in
    * practice (~1/n per rounding), and Spark's decimal-expansion HALF_UP
    * can disagree with another engine's multiply-then-round there. floor,
    * multiply and add are IEEE-defined, so any engine computes this
    * bit-identically. Half-way values round toward +inf on both sides. */
  private[graft] def r6(c: Column): Column =
    floor(c * 1e6 + lit(0.5)) / 1e6

  /** The fixed-point 1e-6 LONG contract ([[Similarity.kmeansTrain]]) in
    * the same pure-IEEE form. */
  private[graft] def fp6(c: Column): Column =
    floor(c * 1e6 + lit(0.5)).cast("long")

  /** sigmoid(bias + Σ wᵢ·featureᵢ) — pure column arithmetic, codegen'd,
    * zero shuffles: classifier inference over 100 TB is embarrassingly
    * parallel and should never leave the scan stage. */
  def logisticScore(bias: Double, features: Seq[(Column, Double)]): Column = {
    val z = features.foldLeft(lit(bias): Column) {
      case (acc, (c, w)) => acc + c.cast("double") * lit(w)
    }
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Per-group percentile normalization: percent_rank of `scoreFp` (a
    * fixed-point long — rank on the ROUNDED score so the ordering is
    * identical on any engine/architecture, ties broken by `tieCol`) within
    * each `groupCol`. A fixed absolute score threshold keeps different
    * fractions of each source (a clean source would lose nothing, a noisy
    * one everything); ranking WITHIN the source expresses "drop the worst
    * X% of every source", which is the policy large corpus builds actually
    * use. Cost: one shuffle by group + a per-group sort. */
  def perGroupPercentile(
      df: DataFrame, groupCol: String, scoreFpCol: String, tieCol: String,
      out: String = "pct_rank"): DataFrame =
    df.withColumn(out,
      percent_rank().over(Window.partitionBy(groupCol)
        .orderBy(col(scoreFpCol), col(tieCol))))

  /** IN-ENGINE training of the logistic classifier: z-score feature
    * standardization (one aggregation pass — raw document statistics are
    * correlated and near-constant, so unscaled full-batch GD oscillates;
    * standardizing is what makes a fixed small learning rate safe on any
    * corpus), then `steps` rounds of full-batch gradient descent from
    * zero weights, each round ONE map-side-combinable aggregation over
    * the (cached) standardized frame — the fit that produces the weights
    * [[logisticScore]] consumes. This is how the classifier-filter stage
    * closes the loop without leaving the engine: label a seed set (here,
    * any boolean column), fit, score the corpus, filter.
    *
    * Scale: cost is `steps + 2` scans of an f+1-column double frame (one
    * for the scaler stats, one for the final loss/accuracy), each a pure
    * aggregation — no shuffle wider than one row, no window, no collect;
    * the per-step weight frame is ONE row, localCheckpoint'd so lineage
    * stays linear in `steps` (the [[Similarity.kmeansTrain]] discipline).
    * At 100 TB you fit on a sample (full-batch GD gains nothing past
    * ~10⁶ rows); the dataflow is identical — swap `df` for
    * `df.sample(...)`.
    *
    * Determinism & oracle-ability (the [[Similarity.kmeansTrain]]
    * fixed-point contract): features are rounded to 1e-6 on entry;
    * scaler means/stds come from fixed-point 1e-6 long sums (variance by
    * the one-pass E[x²] − mean² form — both sums from the SAME pass,
    * order-independent) and are rounded to 1e-6; standardized values
    * re-round to 1e-6; per-row gradient contributions are fixed-pointed
    * to 1e-6 LONGS before summing; weights re-round to 1e-6 after every
    * step — so both engines enter each step with IDENTICAL weights and
    * the only cross-engine drift is one libm `exp` ulp inside a quantity
    * rounded to 1e-6. A zero-variance feature standardizes to 0 (std
    * stands in as 1), never NaN.
    *
    * Output: one row — `step` (= steps), one `w_<name>` per feature
    * (in STANDARDIZED space), `bias`, the scaler (`mean_<name>`,
    * `std_<name>` — the model artifact includes it; [[scoreWith]]
    * replays it), `log_loss` (mean, at the FINAL weights), `train_acc`
    * (score-at-0.5 threshold), all rounded to 1e-6. */
  def logisticTrain(
      df: DataFrame, features: Seq[(String, Column)], label: Column,
      steps: Int, lr: Double): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val names = features.map(_._1)
    val raw = df.select(
      features.map { case (n, c) => r6(c.cast("double")).as(n) } :+
        label.cast("double").as("__y"): _*)
    val fpS = (c: Column) => sum(fp6(c))
    val sums = raw.agg(
      count(lit(1)).as("__n"),
      names.flatMap(n => Seq(
        fpS(col(n)).as("sx_" + n), fpS(col(n) * col(n)).as("sxx_" + n))): _*)
    val withMeans = sums.select(
      col("__n") +:
        names.flatMap(n => Seq(
          r6(col("sx_" + n).cast("double")
            / (col("__n").cast("double") * 1e6)).as("mean_" + n),
          col("sxx_" + n))): _*)
    val stats = withMeans.select(
      names.flatMap(n => Seq(
        col("mean_" + n),
        r6(sqrt(greatest(
          r6(col("sxx_" + n).cast("double") / (col("__n").cast("double") * 1e6)
            - col("mean_" + n) * col("mean_" + n)), lit(0.0))))
          .as("std_" + n))): _*)
      .localCheckpoint()
    val stdOr1 = (n: String) =>
      when(col("std_" + n) < 1e-6, lit(1.0)).otherwise(col("std_" + n))
    val feats = raw.crossJoin(broadcast(stats)).select(
      names.map(n => r6((col(n) - col("mean_" + n)) / stdOr1(n)).as(n)) :+
        col("__y"): _*).cache()
    val spark = df.sparkSession
    // z/p rebuilt per step from the step's weight columns; the fold order
    // (declared feature order, bias first) is mirrored verbatim in the
    // oracle SQL so double arithmetic associates identically.
    def zCol: Column = names.foldLeft(col("bias")) {
      (acc, n) => acc + col("w_" + n) * col(n)
    }
    def pCol: Column = lit(1.0) / (lit(1.0) + exp(-zCol))
    val fp = (c: Column) => sum(fp6(c))
    var w = spark.range(1).select(
      names.map(n => lit(0.0).as("w_" + n)) :+ lit(0.0).as("bias"): _*)
    for (_ <- 1 to steps) {
      // The incoming weights are constant over the crossJoin (one weight
      // row), so max() carries them through the aggregate unchanged.
      val g = feats.crossJoin(broadcast(w)).agg(
        count(lit(1)).as("__n"),
        names.map(n => fp((pCol - col("__y")) * col(n)).as("g_" + n)) ++
          (names.map(n => max(col("w_" + n)).as("w_" + n)) :+
            max(col("bias")).as("bias") :+
            fp(pCol - col("__y")).as("g_bias")): _*)
      val unfix = (s: Column) =>
        s.cast("double") / (col("__n").cast("double") * 1e6)
      w = g.select(
        names.map(n =>
          r6(col("w_" + n) - lit(lr) * unfix(col("g_" + n))).as("w_" + n)) :+
          r6(col("bias") - lit(lr) * unfix(col("g_bias"))).as("bias"): _*)
        .localCheckpoint()
    }
    val metrics = feats.crossJoin(broadcast(w)).agg(
      count(lit(1)).as("__n"),
      names.map(n => max(col("w_" + n)).as("w_" + n)) ++
        (max(col("bias")).as("bias") +:
          fp(-col("__y") * log(pCol) - (lit(1.0) - col("__y")) * log(lit(1.0) - pCol))
            .as("l_fp") +:
          fp(when((r6(pCol) >= 0.5) === (col("__y") >= 0.5), 1.0).otherwise(0.0))
            .as("a_fp") +: Nil): _*)
    val outCols: Seq[Column] =
      Seq(lit(steps.toLong).as("step")) ++
        names.map(n => col("w_" + n)) ++ Seq(col("bias")) ++
        names.flatMap(n => Seq(col("mean_" + n), col("std_" + n))) ++
        Seq(
          r6(col("l_fp").cast("double") / (col("__n").cast("double") * 1e6))
            .as("log_loss"),
          r6(col("a_fp").cast("double") / (col("__n").cast("double") * 1e6))
            .as("train_acc"))
    // The model row is MATERIALIZED (training is eager by nature — the
    // per-step localCheckpoints above already ran): consumers like
    // [[scoreWith]] broadcast a 1-row checkpoint scan instead of
    // re-running the metrics pass, and the feature cache can be released
    // here rather than leaking one frame per fit in a long-lived session
    // (the DriftAlarm release discipline).
    val model = metrics.crossJoin(broadcast(stats)).select(outCols: _*)
      .localCheckpoint()
    feats.unpersist(blocking = false)
    model
  }

  /** Score `df` with a 1-row model frame from [[logisticTrain]] (weights
    * AND scaler): the broadcast-crossJoin inference pass (still zero
    * shuffles — the model row rides to every task). Features are rounded,
    * standardized with the model's own scaler (the std<1e-6→1 stand-in
    * replayed), and pushed through the sigmoid.
    * Appends `score` = round(sigmoid, 6). */
  def scoreWith(
      df: DataFrame, model: DataFrame,
      features: Seq[(String, Column)]): DataFrame = {
    val names = features.map(_._1)
    val withF = features.foldLeft(df) {
      case (d, (n, c)) => d.withColumn(n, r6(c.cast("double")))
    }
    val stdOr1 = (n: String) =>
      when(col("std_" + n) < 1e-6, lit(1.0)).otherwise(col("std_" + n))
    val z = names.foldLeft(col("bias")) { (acc, n) =>
      acc + col("w_" + n) * r6((col(n) - col("mean_" + n)) / stdOr1(n))
    }
    val modelCols = names.map(n => col("w_" + n)) ++
      names.flatMap(n => Seq(col("mean_" + n), col("std_" + n))) :+ col("bias")
    withF.crossJoin(broadcast(model.select(modelCols: _*)))
      .withColumn("score", r6(lit(1.0) / (lit(1.0) + exp(-z))))
      .drop(names.flatMap(n =>
        Seq("w_" + n, "mean_" + n, "std_" + n)) :+ "bias": _*)
  }

  /** The classifier-filter feature set the oracle fixture uses: mean word
    * length (scaled /10), alphabetic fraction, digit fraction, and
    * log-length (scaled /10) — all O(1)-bounded string statistics
    * computable identically in Spark and ANSI SQL. Centralized so the
    * train and score queries can never drift apart. */
  def docFeatures(textCol: Column, nCharsCol: Column): Seq[(String, Column)] = Seq(
    "mwl" -> (length(regexp_replace(textCol, "\\s+", ""))
      / size(split(textCol, "\\s+")).cast("double") / 10.0),
    "alpha" -> (length(regexp_replace(textCol, "[^A-Za-z]", "")).cast("double")
      / greatest(length(textCol), lit(1)).cast("double")),
    "digit" -> (length(regexp_replace(textCol, "[^0-9]", "")).cast("double")
      / greatest(length(textCol), lit(1)).cast("double")),
    "loglen" -> (log(lit(1.0) + nCharsCol.cast("double")) / 10.0))
}
