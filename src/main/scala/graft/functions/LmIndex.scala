package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.io.TableStore

/** Persisted Kneser-Ney bigram language model over a
  * [[graft.io.TableStore]] — the train-offline / score-online split the
  * REAL CCNet deployment runs (Wenzek et al. 2020: the KenLM model is
  * trained ONCE on a clean reference corpus, then every crawl shard is
  * scored against the frozen model): the corpus-scale counting pass
  * happens at [[build]] time and lands as model TABLES; scoring any
  * later document set reads only those vocabulary-bounded tables. The
  * LM twin of [[LexIndex]]/[[AnnIndex]]'s build/serve posture.
  *
  * Unlike the in-corpus scorer ([[TextAnalysis.knBigramLogProb]], which
  * by construction never meets an unseen event), a frozen model scoring
  * NEW text needs total out-of-vocabulary semantics. The recipe, every
  * branch deterministic and oracle-replayable:
  *
  *   - continuation: P_cont(w) = N1+(•,w)/btypes when w was ever a
  *     bigram continuation, else 0.5/btypes (half of one type's mass —
  *     the reserved-OOV convention, mirroring [[build]]'s docs);
  *   - document-initial token: MLE unigram c1/total, else 0.5/total;
  *   - seen context `prev`: P = max(c(prev,w) − D, 0)/cc +
  *     D·N1+(prev,•)/cc · P_cont(w) — with c(prev,w) defaulting to 0,
  *     this is the textbook absolute-discount interpolation covering
  *     both the seen-pair and unseen-pair cases in one expression;
  *   - unseen context: full backoff to P_cont(w).
  *
  * Scoring the training corpus itself never reaches an OOV branch, so
  * [[crossScore]](train, train) == [[TextAnalysis.knBigramLogProb]]
  * bit-for-bit (spec-pinned, and q_kn_persisted shares q_kn_bigram's
  * oracle SQL verbatim).
  *
  * Scale: model tables are vocabulary-bounded (Heaps' law), written
  * key-sorted; the scoring joins stay UNHINTED — statically a 100 TB
  * corpus can never vocab-broadcast (the [[TextAnalysis]] joinVocab
  * rationale), and AQE broadcasts the SMALLER side from measured bytes
  * (for a micro-batch gate that is the batch's token frame, which is
  * exactly right). The three KN aggregates derive from the bigram
  * table, localCheckpoint'ed once at build so the corpus tokenizes
  * exactly once ([[LexIndex.build]]'s discipline).
  *
  * Model tables (under `prefix`):
  *   - `<prefix>_uni` (w, c1) — unigram counts
  *   - `<prefix>_big` (prev, w, c2) — bigram counts
  *   - `<prefix>_ctx` (prev, cc, n1f) — per-context total + distinct
  *     followers
  *   - `<prefix>_cont` (w, n1c) — continuation counts
  *   - `<prefix>_stats` (total_tokens, bigram_types) — ONE row, longs
  */
object LmIndex {

  /** The five model frames, derivable inline from a training corpus or
    * loaded from a store — the single scoring input shape. */
  private[graft] final case class KnModel(
      uni: DataFrame, big: DataFrame, ctx: DataFrame, cont: DataFrame,
      stats: DataFrame)

  private def tokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      posexplode(TextAnalysis.words(col(textCol))).as(Seq("pos", "w")))

  private def withPrev(toks: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(idCol).orderBy("pos")
    toks.withColumn("prev", lag(col("w"), 1).over(win))
  }

  /** Model frames computed LAZILY from a training corpus (no jobs fire
    * here; [[build]] adds the one-tokenize checkpoint discipline). */
  private[graft] def modelFrames(
      train: DataFrame, idCol: String, textCol: String): KnModel = {
    val toks = tokens(train, idCol, textCol)
    val pt = withPrev(toks, idCol)
    val uni = toks.groupBy("w").agg(count(lit(1)).cast("long").as("c1"))
    val big = pt.filter(col("prev").isNotNull)
      .groupBy("prev", "w").agg(count(lit(1)).cast("long").as("c2"))
    val ctx = big.groupBy("prev").agg(
      sum(col("c2")).cast("long").as("cc"),
      count(lit(1)).cast("long").as("n1f"))
    val cont = big.groupBy("w").agg(count(lit(1)).cast("long").as("n1c"))
    val stats = uni.agg(sum(col("c1")).cast("long").as("total_tokens"))
      .crossJoin(big.agg(count(lit(1)).cast("long").as("bigram_types")))
    KnModel(uni, big, ctx, cont, stats)
  }

  /** Score `docs` against a frozen model — the shared recipe every
    * entry point funnels through (the hashUniform single-sourcing
    * principle). Output: (idCol, n_tokens, logprob), the
    * [[TextAnalysis.knBigramLogProb]] contract (1e-6 fixed-point
    * per-token longs, one division at the end). */
  private[graft] def scoreFrames(
      m: KnModel, docs: DataFrame, idCol: String, textCol: String,
      discount: Double): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0, 1), got $discount")
    val pt = withPrev(tokens(docs, idCol, textCol), idCol)
    val total = col("total_tokens").cast("double")
    val btypes = col("bigram_types").cast("double")
    // Degenerate-model guards live INSIDE the OOV branches (the lazy
    // CaseWhen discipline from mknBigramLogProb — ANSI mode errors on
    // double division by zero, and only these branches can divide by a
    // zero stat: a seen continuation/unigram implies its denominator is
    // positive). A model with no bigram types (single-token training
    // docs) or no tokens at all fails with guidance, not DIVIDE_BY_ZERO.
    val pcont = when(col("n1c").isNotNull,
      col("n1c").cast("double") / btypes)
      .otherwise(when(btypes > 0.0, lit(0.5) / btypes)
        .otherwise(raise_error(lit("LmIndex: model has no bigram types — " +
          "trained on single-token documents? Rebuild on a corpus with " +
          "adjacent tokens")).cast("double")))
    val uniP = when(col("c1").isNotNull,
      col("c1").cast("double") / total)
      .otherwise(when(total > 0.0, lit(0.5) / total)
        .otherwise(raise_error(lit("LmIndex: model is empty (zero " +
          "training tokens)")).cast("double")))
    val knP = greatest(coalesce(col("c2"), lit(0L)).cast("double")
        - lit(discount), lit(0.0)) / col("cc").cast("double") +
      lit(discount) * col("n1f").cast("double") / col("cc").cast("double") * pcont
    val p = when(col("prev").isNull, uniP)
      .when(col("cc").isNotNull, knP)
      .otherwise(pcont)
    // The token frame is the fat side — every model join is one exchange
    // of it. The two w-keyed tables fold into ONE probe (cont's keys are
    // a subset of uni's: a continuation word IS a word), so the corpus
    // shuffles three times (w, (prev,w), prev), not four. ctx must stay
    // its own join: an unseen (prev,w) pair with a SEEN context needs
    // cc/n1f without a bigram-row hit.
    val wM = m.uni.join(m.cont, Seq("w"), "left")
    pt.join(wM, Seq("w"), "left")
      .join(m.big, Seq("prev", "w"), "left")
      .join(m.ctx, Seq("prev"), "left")
      .crossJoin(broadcast(m.stats))
      .select(col(idCol), round(log(p) * 1e6, 0).cast("long").as("lp"))
      .groupBy(idCol)
      .agg(sum(col("lp")).as("s"), count(lit(1)).cast("long").as("n_tokens"))
      .select(col(idCol), col("n_tokens"),
        round(col("s").cast("double") / col("n_tokens").cast("double") / 1e6, 6)
          .as("logprob"))
  }

  /** Inline train-on-A / score-B — no store. With `docs eq train` this
    * is exactly [[TextAnalysis.knBigramLogProb]] (no OOV branch can
    * fire in-corpus; spec-pinned). */
  def crossScore(
      train: DataFrame, docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame =
    scoreFrames(modelFrames(train, idCol, textCol), docs, idCol, textCol,
      discount)

  /** Build (or rebuild) the model tables from `train`. The bigram table
    * feeds three derived tables and `overwriteAll` evaluates each write
    * as its own job, so it is localCheckpoint'ed once — ONE tokenize
    * pass over the corpus (build-time only; swap for reliable
    * checkpoint() on a real cluster — the [[LexIndex.build]] note). */
  def build(
      store: TableStore, prefix: String,
      train: DataFrame, idCol: String, textCol: String): Unit = {
    val m0 = modelFrames(train, idCol, textCol)
    val big = m0.big.localCheckpoint()
    val ctx = big.groupBy("prev").agg(
      sum(col("c2")).cast("long").as("cc"),
      count(lit(1)).cast("long").as("n1f"))
    val cont = big.groupBy("w").agg(count(lit(1)).cast("long").as("n1c"))
    val uni = m0.uni.localCheckpoint()
    val stats = uni.agg(sum(col("c1")).cast("long").as("total_tokens"))
      .crossJoin(big.agg(count(lit(1)).cast("long").as("bigram_types")))
    try
      store.overwriteAll(Seq(
        s"${prefix}_uni" -> uni.sortWithinPartitions("w"),
        s"${prefix}_big" -> big.sortWithinPartitions("prev", "w"),
        s"${prefix}_ctx" -> ctx.sortWithinPartitions("prev"),
        s"${prefix}_cont" -> cont.sortWithinPartitions("w"),
        s"${prefix}_stats" -> stats))
    finally {
      big.unpersist()
      uni.unpersist()
      ()
    }
  }

  /** Count-merge core shared by [[append]] (sign +1) and [[deleteDocs]]
    * (sign −1): merge the delta's unigram/bigram counts into the stored
    * tables, re-derive the three KN aggregates from the MERGED bigram
    * table, and swap all five tables. Every frame here is
    * vocabulary-bounded — maintenance never rescans the training corpus,
    * only tokenizes the delta. Merged tables localCheckpoint BEFORE the
    * overwrite (plans derived from store tables must materialize before
    * the store swaps them — the round-1 storage invariant). */
  private def mergeCounts(
      store: TableStore, prefix: String,
      delta: DataFrame, idCol: String, textCol: String, sign: Long): Unit = {
    val d = modelFrames(delta, idCol, textCol)
    val uni = store.load(s"${prefix}_uni")
      .unionByName(d.uni.select(col("w"), (col("c1") * lit(sign)).as("c1")))
      .groupBy("w").agg(sum(col("c1")).cast("long").as("c1"))
      .filter(col("c1") =!= 0L)
      .localCheckpoint()
    val big = store.load(s"${prefix}_big")
      .unionByName(d.big.select(col("prev"), col("w"),
        (col("c2") * lit(sign)).as("c2")))
      .groupBy("prev", "w").agg(sum(col("c2")).cast("long").as("c2"))
      .filter(col("c2") =!= 0L)
      .localCheckpoint()
    try {
      // A negative merged count means the delta was NOT a subset of what
      // the model was trained on (deleting text never added, or adding a
      // negative ghost) — the un-tombstoning lesson from LexIndex: fail
      // loudly BEFORE the swap, never persist a corrupt model. Both
      // probes run on the checkpointed (vocabulary-bounded) tables.
      require(uni.filter(col("c1") < 0L).isEmpty &&
        big.filter(col("c2") < 0L).isEmpty,
        "LmIndex delta drives a count negative — deletes must carry " +
          "exactly previously-added documents (GDPR-erasure contract); " +
          "rebuild the model if the original text is gone")
      val ctx = big.groupBy("prev").agg(
        sum(col("c2")).cast("long").as("cc"),
        count(lit(1)).cast("long").as("n1f"))
      val cont = big.groupBy("w").agg(count(lit(1)).cast("long").as("n1c"))
      val stats = uni.agg(sum(col("c1")).cast("long").as("total_tokens"))
        .crossJoin(big.agg(count(lit(1)).cast("long").as("bigram_types")))
      store.overwriteAll(Seq(
        s"${prefix}_uni" -> uni.sortWithinPartitions("w"),
        s"${prefix}_big" -> big.sortWithinPartitions("prev", "w"),
        s"${prefix}_ctx" -> ctx.sortWithinPartitions("prev"),
        s"${prefix}_cont" -> cont.sortWithinPartitions("w"),
        s"${prefix}_stats" -> stats))
    } finally {
      uni.unpersist()
      big.unpersist()
      ()
    }
  }

  /** Add documents to the persisted model WITHOUT retraining: the
    * delta's counts merge additively and the KN aggregates re-derive
    * from the merged bigram table — append == full rebuild on the
    * grown corpus, table-for-table (spec-pinned and oracle-pinned:
    * q_kn_append scores against the oracle's train-on-union replay).
    * Counts are content-based (no per-doc records), so appending the
    * same documents twice double-counts — idempotency is the CALLER's
    * ledger, exactly as with a real KenLM count merge. */
  def append(
      store: TableStore, prefix: String,
      delta: DataFrame, idCol: String, textCol: String): Unit =
    mergeCounts(store, prefix, delta, idCol, textCol, sign = 1L)

  /** Remove previously-added documents from the persisted model (the
    * GDPR-erasure path): their counts subtract, zero-count rows drop,
    * and the KN aggregates re-derive — delete == rebuild-without-deleted
    * (spec- and oracle-pinned). The delta must be exactly text the model
    * was trained on; a delta that drives any count negative fails loudly
    * before the swap. */
  def deleteDocs(
      store: TableStore, prefix: String,
      docs: DataFrame, idCol: String, textCol: String): Unit =
    mergeCounts(store, prefix, docs, idCol, textCol, sign = -1L)

  /** Versioned rebuild under live serving — the [[LexIndex
    * .rebuildVersioned]] posture: [[build]] writes five tables through
    * SEQUENTIAL atomic swaps, so a serve loading mid-rebuild could pair
    * new bigram counts with old stats; the versioned path builds into a
    * fresh `<name>_g<N>` prefix and publishes it with ONE manifest swap,
    * last ([[graft.io.VersionedIndex]] — CAS-claimed, crash-drilled). */
  def rebuildVersioned(
      store: TableStore, name: String,
      train: DataFrame, idCol: String, textCol: String): String =
    graft.io.VersionedIndex.rebuild(store, name, train.sparkSession)(
      p => build(store, p, train, idCol, textCol))

  /** Model frames of the CURRENT generation, pinned: the manifest is
    * resolved once, here — a rebuild publishing mid-serve cannot
    * retarget the returned frames (they read the resolved generation's
    * prefix). Feed to [[scoreFrames]] via [[scoreVersioned]], or pass
    * the resolved prefix to a standing [[graft.stream.EventAnalytics
    * .pplGateEachBatch]]. */
  def loadModelVersioned(store: TableStore, name: String): KnModel =
    loadModel(store, graft.io.VersionedIndex.currentPrefix(store, name))

  /** [[score]] against the current generation (resolved once per call). */
  def scoreVersioned(
      store: TableStore, name: String,
      docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame =
    scoreFrames(loadModelVersioned(store, name), docs, idCol, textCol,
      discount)

  /** Load the model frames from a store (lazy table reads). */
  def loadModel(store: TableStore, prefix: String): KnModel =
    KnModel(
      uni = store.load(s"${prefix}_uni"),
      big = store.load(s"${prefix}_big"),
      ctx = store.load(s"${prefix}_ctx"),
      cont = store.load(s"${prefix}_cont"),
      stats = store.load(s"${prefix}_stats"))

  /** Score `docs` against the persisted model — reads ONLY the model
    * tables; the training corpus is never touched. The model tables scan
    * in full: right for CORPUS-scale scoring (the CCNet posture — score
    * everything; every vocabulary row is needed). For a small probe
    * batch use [[scoreBatch]], whose table reads prune to the batch's
    * own words. */
  def score(
      store: TableStore, prefix: String,
      docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame =
    scoreFrames(loadModel(store, prefix), docs, idCol, textCol, discount)

  /** [[score]] for a QUERY-BATCH-sized document set — the probed serve
    * shape ([[LexIndex.bm25TopK]]'s convention): the batch's DISTINCT
    * words collect once (batch-bounded by construction, never
    * corpus-bounded) and push down as static `IN` filters on every
    * model table — the key-sorted parquet layout turns them into
    * row-group skipping, so serve cost is the probed slices, not the
    * vocabulary. Row-identical to [[score]] (pruning only drops rows
    * the left joins could never hit — every w/prev outside the batch's
    * vocabulary; spec-pinned, and q_kn_probed shares the cross-score
    * oracle SQL). One batch-tokenization job per call, the documented
    * serve-call cost. */
  def scoreBatch(
      store: TableStore, prefix: String,
      docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    import docs.sparkSession.implicits._
    val m = loadModel(store, prefix)
    val batchWords: Array[String] = docs
      .select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .distinct().as[String].collect()
    val pruned = KnModel(
      uni = m.uni.filter(col("w").isin(batchWords: _*)),
      big = m.big.filter(col("prev").isin(batchWords: _*) &&
        col("w").isin(batchWords: _*)),
      ctx = m.ctx.filter(col("prev").isin(batchWords: _*)),
      cont = m.cont.filter(col("w").isin(batchWords: _*)),
      stats = m.stats)
    scoreFrames(pruned, docs, idCol, textCol, discount)
  }
}
