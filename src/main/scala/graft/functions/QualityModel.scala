package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-based quality scoring: INFERENCE of a trained linear (logistic)
  * document-quality classifier, plus the per-source percentile
  * normalization that turns raw scores into a threshold-free keep/drop
  * policy. This is the fasttext-style "quality classifier" stage of a
  * training-data pipeline (weights come from offline training; here they
  * are fixed constants), distinct from [[TextAnalysis.qualityScore]]'s
  * hand-tuned heuristic.
  */
object QualityModel {

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
}
