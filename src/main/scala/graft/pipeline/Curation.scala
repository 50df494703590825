package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, TextAnalysis}

/** End-to-end corpus-curation composition with per-stage attribution —
  * the funnel report a nightly training-data pipeline monitors (how many
  * documents each gate dropped), not just the final keep set that
  * `q_corpus_prep` emits.
  *
  * Every gate is one of the engine's standalone operators; gates are
  * computed INDEPENDENTLY over the full corpus and applied sequentially
  * (a document is "in" at stage k iff it passed gates 1..k-1). That is the
  * production-monitoring convention: per-stage drop counts stay
  * attributable without recomputing upstream operators per stage, and the
  * whole funnel stays one Catalyst plan.
  *
  * Scale: the expensive inputs (near-dup pair frame) are shared with the
  * rest of the pipeline; everything added here is id-keyed joins plus ONE
  * single-row aggregate exploded into the stage rows. No window over the
  * corpus, no driver-side loop.
  */
object Curation {

  /** Four-stage funnel: exact dedup → near-dup best-representative →
    * language-mismatch gate → quality threshold. Returns one row per stage:
    * (stage_order, stage, docs_in, docs_kept, docs_dropped).
    *
    * @param pairs near-dup pair frame (id_a, id_b) — e.g. the production
    *              LSH output; quality for best-rep survivorship comes from
    *              `qualityProxyCol` (integral, e.g. n_chars). */
  def funnel(
      docs: DataFrame, idCol: String, textCol: String, langCol: String,
      qualityProxyCol: String, pairs: DataFrame,
      qualityMin: Double): DataFrame = {
    val d1 = Dedup.exact(docs, idCol, textCol)
      .select(col(idCol), col("is_duplicate").as("g1_drop"))
    val d2 = Dedup.bestRepresentative(
      docs.select(col(idCol), col(qualityProxyCol)),
      idCol, qualityProxyCol, pairs)
      .select(col(idCol), (!col("is_kept")).as("g2_drop"))
    val d3 = TextAnalysis.langMismatch(docs, idCol, textCol, langCol)
      .select(col(idCol), col("is_mismatch").as("g3_drop"))
    val d4 = docs.select(col(idCol),
      (TextAnalysis.qualityScore(col(textCol),
        TextAnalysis.stopwordHits(col(textCol),
          TextAnalysis.stopwords.head._2)) < qualityMin).as("g4_drop"))

    val gated = docs.select(col(idCol))
      .join(d1, idCol).join(d2, idCol).join(d3, idCol).join(d4, idCol)
    val one = gated.agg(
      count(lit(1)).cast("long").as("n0"),
      sum(when(!col("g1_drop"), 1L).otherwise(0L)).cast("long").as("k1"),
      sum(when(!col("g1_drop") && !col("g2_drop"), 1L).otherwise(0L))
        .cast("long").as("k2"),
      sum(when(!col("g1_drop") && !col("g2_drop") && !col("g3_drop"), 1L)
        .otherwise(0L)).cast("long").as("k3"),
      sum(when(!col("g1_drop") && !col("g2_drop") && !col("g3_drop") &&
        !col("g4_drop"), 1L).otherwise(0L)).cast("long").as("k4"))

    def stage(order: Int, name: String, in: String, kept: String) =
      struct(lit(order.toLong).as("stage_order"), lit(name).as("stage"),
        col(in).as("docs_in"), col(kept).as("docs_kept"),
        (col(in) - col(kept)).as("docs_dropped"))

    one.select(explode(array(
      stage(1, "exact_dedup", "n0", "k1"),
      stage(2, "near_dup_best_rep", "k1", "k2"),
      stage(3, "lang_mismatch", "k2", "k3"),
      stage(4, "quality_min", "k3", "k4"))).as("s"))
      .select(col("s.stage_order"), col("s.stage"), col("s.docs_in"),
        col("s.docs_kept"), col("s.docs_dropped"))
  }
}
