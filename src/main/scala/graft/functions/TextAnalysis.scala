package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language identification, and document
  * fingerprinting (SURVEY.md §7.6 / BASELINE.json north-star).
  *
  * Every operator is pure Spark built-ins (codegen'd, shuffle only where an
  * aggregation is inherent) and has a DuckDB-expressible mirror so the
  * oracle harness can hash-verify it. Designed for very wide inputs: all
  * per-document ops are narrow (no shuffle), so they scale linearly with
  * input splits at 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokenization (split on runs of whitespace). */
  def words(text: Column): Column = split(text, "\\s+")

  def wordCount(text: Column): Column = size(words(text))

  /** BPE-ish subword count: greedy 1-3 char alnum chunks — a deterministic,
    * tokenizer-free proxy for subword token counts. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]{1,3}"), lit(0)))

  /** Punctuation ratio over characters. */
  def punctRatio(text: Column): Column = {
    val stripped = regexp_replace(text, "[^A-Za-z0-9\\s]", "")
    round((length(text) - length(stripped)).cast("double") /
      greatest(length(text), lit(1)).cast("double"), 6)
  }

  /** Tiny per-language stopword lists (public-knowledge function words).
    * Deliberately small: the operator contract is deterministic counting,
    * not linguistic coverage — swap lists freely. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "las", "una", "y"),
    "fr" -> Seq("le", "les", "et", "est", "dans"),
    "zh" -> Seq("的", "是", "了", "和", "在"))

  /** Per-language stopword hit counts over the token array (no shuffle:
    * higher-order array filter, not explode+groupBy). */
  def stopwordHits(text: Column, wordsOf: Seq[String]): Column =
    size(filter(words(text), w => w.isInCollection(wordsOf)))

  /** Language-ID by stopword voting: argmax of per-language hit counts with
    * a fixed priority order (en, de, es, fr, zh) as the deterministic
    * tie-break. Returns (hit-count columns, predicted-language column). */
  def langScores(textCol: String): Seq[(String, Column)] =
    stopwords.map { case (lang, ws) =>
      s"hits_$lang" -> stopwordHits(col(textCol), ws)
    }

  def langPredict(hitCols: Seq[String]): Column = {
    // CASE w >= all-others in priority order — first max wins.
    val langs = stopwords.map(_._1)
    langs.zip(hitCols).foldRight(lit(langs.last)) { case ((lang, c), els) =>
      val beatsAll = hitCols.filter(_ != c)
        .map(o => col(c) >= col(o))
        .reduceOption(_ && _).getOrElse(lit(true))
      when(beatsAll, lit(lang)).otherwise(els)
    }
  }

  /** Composite quality score in [0,1]:
    * 0.4 * min(words,100)/100  (length credit)
    * + 0.3 * (1 - punct_ratio) (cleanliness)
    * + 0.3 * min(5*stopword_ratio, 1) (natural-language-ness).
    * Rounded to 6 decimals for cross-engine float determinism. */
  def qualityScore(text: Column, stopHits: Column): Column = {
    val nWords = wordCount(text).cast("double")
    val lengthCredit = least(nWords, lit(100.0)) / lit(100.0)
    val cleanliness = lit(1.0) - punctRatio(text)
    val stopRatio = stopHits.cast("double") / greatest(nWords, lit(1.0))
    round(lit(0.4) * lengthCredit + lit(0.3) * cleanliness +
      lit(0.3) * least(stopRatio * lit(5.0), lit(1.0)), 6)
  }

  /** Word n-gram shingles via posexplode + lead windows — the same shape the
    * DuckDB oracle can express (unnest WITH ORDINALITY + lead). The window
    * is partitioned by document, so it shuffles by doc_id once and scales
    * with documents, never with corpus size per partition. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // Deliberately a lead()-over-Window formulation, NOT a row-local
    // transform(sequence, slice) chain: the window costs one exchange on
    // doc_id, but downstream self-joins then REUSE that exchange
    // (ReusedExchange), whereas higher-order array functions are interpreted
    // (not codegen'd) and re-evaluate once per plan reference — measured
    // ~1.5x slower across the dedup family at sf0.1.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(idCol).orderBy("pos")
    val exploded = df.select(col(idCol), posexplode(words(col(textCol))).as(Seq("pos", "w")))
    val withLeads = (1 until n).foldLeft(exploded) { (d, i) =>
      d.withColumn(s"w$i", lead(col("w"), i).over(w))
    }
    val parts = col("w") +: (1 until n).map(i => col(s"w$i"))
    withLeads
      .filter(parts.map(_.isNotNull).reduce(_ && _))
      .select(col(idCol), col("pos"), concat_ws(" ", parts: _*).as("shingle"))
  }

  /** Rolling-hash document fingerprint: min(md5(4-gram shingle)) — a
    * winnowing-style representative hash; equal fingerprints are strong
    * near-duplicate candidates. Falls back to md5(text) for documents
    * shorter than one shingle. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String, n: Int = 4): DataFrame = {
    val sh = shingles(df, idCol, textCol, n)
      .groupBy(idCol).agg(min(md5(col("shingle"))).as("fp"))
    df.select(col(idCol), md5(col(textCol)).as("whole_fp"))
      .join(sh, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("fp"), col("whole_fp")).as("fingerprint"))
  }

  /** Token-budget sequence packing — the pretraining batch-assembly shape:
    * documents are assigned to fixed-token-budget packs greedily in id order
    * WITHIN deterministic shards (`shard = id / shardSize`). Sharding is the
    * two-level form of a parallel prefix sum: the running-total window is
    * partitioned (bounded partitions — no global single-partition window at
    * 100 TB) while assignment stays deterministic and SQL-expressible. A
    * document lands in the pack where its cumulative START offset falls, so
    * a pack may overflow by at most one document — the standard greedy
    * packing contract.
    */
  def packTokens(
      df: DataFrame, idCol: String, textCol: String,
      budgetTokens: Int, shardSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy(idCol)
    df.select(col(idCol), wordCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("shard", floor(col(idCol) / shardSize).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w).cast("long"))
      .withColumn("pack_id",
        floor((col("cum_tokens") - col("n_tokens")) / budgetTokens).cast("long"))
      .select(col(idCol), col("shard"), col("pack_id"), col("n_tokens"), col("cum_tokens"))
  }
}
