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
  /** Per-document gate flags (g1_drop..g4_drop), shared by [[funnel]]
    * (aggregates them) and [[keptSet]] (filters on them). The three
    * text-derived gates (exact-dup hash, language mismatch, quality) are
    * computed in ONE projection over ONE scan: at 100 TB the text column
    * dominates IO, so evaluating the gates as separate operator subtrees
    * would triple the corpus read for no added information.
    * PlanQualitySpec pins the single-text-scan shape. */
  private def gateFlags(
      docs: DataFrame, idCol: String, textCol: String, langCol: String,
      qualityProxyCol: String, pairs: DataFrame,
      qualityMin: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = TextAnalysis.langScores(textCol).foldLeft(docs) {
      case (d, (name, c)) => d.withColumn(name, c)
    }
    val base = scored.select(col(idCol),
      md5(regexp_replace(lower(trim(col(textCol))), "\\s+", " ")).as("__th"),
      (col(langCol) =!= TextAnalysis.langPredict(
        TextAnalysis.stopwords.map(l => s"hits_${l._1}"))).as("g3_drop"),
      (TextAnalysis.qualityScore(col(textCol),
        TextAnalysis.stopwordHits(col(textCol),
          TextAnalysis.stopwords.head._2)) < qualityMin).as("g4_drop"))
    // Same survivor rule as Dedup.exact (min id per normalized-text hash),
    // expressed over the shared base so no second text read happens.
    val g1 = base.withColumn("g1_drop",
      col(idCol) =!= min(col(idCol)).over(Window.partitionBy("__th")))
    // Best-rep needs only (id, quality proxy) — a text-free pruned scan.
    val d2 = Dedup.bestRepresentative(
      docs.select(col(idCol), col(qualityProxyCol)),
      idCol, qualityProxyCol, pairs)
      .select(col(idCol), (!col("is_kept")).as("g2_drop"))
    g1.join(d2, Seq(idCol))
  }

  /** The funnel's actionable output: ids of documents surviving ALL gates
    * — what actually ships to tokenization. Same gate computation as
    * [[funnel]], so the kept count always equals the funnel's final
    * docs_kept. */
  def keptSet(
      docs: DataFrame, idCol: String, textCol: String, langCol: String,
      qualityProxyCol: String, pairs: DataFrame,
      qualityMin: Double): DataFrame =
    gateFlags(docs, idCol, textCol, langCol, qualityProxyCol, pairs, qualityMin)
      .filter(!col("g1_drop") && !col("g2_drop") &&
        !col("g3_drop") && !col("g4_drop"))
      .select(col(idCol))

  def funnel(
      docs: DataFrame, idCol: String, textCol: String, langCol: String,
      qualityProxyCol: String, pairs: DataFrame,
      qualityMin: Double): DataFrame = {
    val gated = gateFlags(docs, idCol, textCol, langCol, qualityProxyCol,
      pairs, qualityMin)
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
