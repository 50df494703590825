package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.TableStore

/** Persisted BM25 lexical index over a [[graft.io.TableStore]] — the
  * build/serve split a standing retrieval endpoint runs: the corpus
  * tokenize + aggregate pass happens ONCE at build time and lands as
  * index TABLES; every query batch afterwards reads ONLY those tables,
  * so serving cost is proportional to the probed postings, never to
  * re-deriving term statistics from 100 TB of raw text per batch (which
  * is what the inline [[TextAnalysis.bm25TopK]] does — correct, and the
  * right shape for a one-shot job, but wrong for a standing index).
  * The lexical twin of [[AnnIndex]], with the same maintenance surface:
  * [[append]] (frozen tokenizer, additive stats), [[deleteDocs]]
  * (tombstones, stats decremented at delete time), [[compact]] (fold
  * tombstones in, restore the term-sorted layout). A hybrid retrieval
  * deployment stands both indexes up over the same corpus and fuses
  * with [[rrfFuse]].
  *
  * Build and serve share [[TextAnalysis.bm25Search]] verbatim, and the
  * serve path derives document frequency FROM THE PROBED POSTINGS SLICE
  * — exactly the inline recipe — so df is correct by construction under
  * any append/delete history (no standing df table to go stale).
  * q_bm25_persisted pins built-then-served == inline against the shared
  * oracle; q_bm25_append / q_bm25_delete pin append == rebuild and
  * delete-then-query == rebuild-without-deleted; PlanQualitySpec gates
  * that no raw-corpus scan appears in a persisted serve plan.
  *
  * Index tables (under `prefix`; the document id column is normalized
  * to `doc_id`):
  *   - `<prefix>_postings` (term, doc_id, tf) — written REPARTITIONED BY
  *     term and SORTED by term within files, so the serve path's
  *     `term IN (query terms)` filter turns into parquet row-group
  *     min/max skipping (term cardinality is far too high for hive
  *     partitioning — ordering inside the files is the pruning lever).
  *     Appended batches are term-sorted within themselves; [[compact]]
  *     restores the global layout.
  *   - `<prefix>_doclens` (doc_id, dl) — per-document token counts.
  *   - `<prefix>_lexstats` (sum_dl, ndocs) — ONE row, ADDITIVE: appends
  *     add their batch sums, deletes subtract the deleted documents'
  *     lengths, so avgdl = sum_dl/ndocs is always the live corpus mean
  *     (exact: token counts are integers, long addition is exact).
  *   - `<prefix>_tombstones` (doc_id) — ids deleted since the last
  *     rebuild/compaction; the serve path anti-joins it.
  *   - `<prefix>_fwd` (term, doc_id, tf) — OPTIONAL forward index
  *     (`build(forwardIndex = true)`): the same rows laid out by doc_id,
  *     so per-document term gathers (the RM3/PRF feedback step) prune by
  *     `doc_id IN (...)` instead of streaming the term-sorted postings.
  *     ~2× index storage; maintained by append/compact when present.
  *
  * Writing goes through the store's two-phase `commitAll`/`overwriteAll`:
  * each TABLE's swap is atomic (temp-dir rename), but multi-table
  * sequences swap SEQUENTIALLY — a crash between swaps, or a serve that
  * loads tables while a rebuild is mid-swap, can pair new postings with
  * old stats. A standing deployment that rebuilds under live serving
  * must therefore use the ENFORCED generation discipline:
  * [[rebuildVersioned]] builds into a fresh `<name>_g<N>` prefix and
  * publishes it with one atomic manifest swap, LAST;
  * [[snapshotVersioned]] pins a serve to the generation current at
  * snapshot time ([[graft.io.VersionedIndex]] — same posture as
  * [[AnnIndex]] rebuilds, spec-pinned for both).
  */
object LexIndex {

  /** Build (or rebuild) the index tables from `corpus`.
    *
    * The postings aggregate feeds all three tables, and `overwriteAll`
    * evaluates each table as its own write job, so the frame is
    * localCheckpoint'ed once — ONE tokenize pass over the corpus instead
    * of three (build-time only; swap for reliable checkpoint() on a real
    * cluster, the [[Dedup.clusterLabels]] convention) — and released
    * once the tables are on disk. `sortFiles` controls the postings file
    * count the term-ordered layout is spread over — size it so each
    * file's row groups stay skip-friendly. */
  def build(
      store: TableStore, prefix: String,
      corpus: DataFrame, idCol: String, textCol: String,
      sortFiles: Int = 32, forwardIndex: Boolean = false): Unit = {
    require(sortFiles >= 1, s"sortFiles must be >= 1, got $sortFiles")
    val tf = TextAnalysis.bm25Postings(corpus, idCol, textCol)
      .select(col("term"), col(idCol).as("doc_id"), col("tf"))
      .localCheckpoint()
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    store.overwriteAll(Seq(
      s"${prefix}_postings" ->
        tf.repartition(sortFiles, col("term")).sortWithinPartitions("term"),
      s"${prefix}_doclens" -> dl,
      s"${prefix}_lexstats" -> statsOf(dl),
      // Rebuild resets the tombstone set: the new tables already exclude
      // anything the caller dropped from the corpus.
      s"${prefix}_tombstones" -> emptyTombstones(corpus, idCol)) ++
      // Optional FORWARD index: the same (term, doc_id, tf) rows laid out
      // by doc_id — one more write of the already-checkpointed aggregate,
      // ~2× index storage. What it buys: a per-DOCUMENT term gather (the
      // RM3/PRF feedback step) becomes a `doc_id IN (...)` row-group-
      // skipped probe instead of streaming the whole term-keyed postings
      // table per serve batch — at corpus scale, the difference between
      // a bounded read and a full index scan per query batch.
      (if (forwardIndex) Seq(s"${prefix}_fwd" ->
        tf.repartition(sortFiles, col("doc_id"))
          .sortWithinPartitions("doc_id"))
       else Nil))
    // The checkpointed postings blocks have no consumer once the tables
    // are on disk — release them, or they pin executor memory for the
    // rest of the session (corpus-scale at build time).
    tf.unpersist()
    ()
  }

  /** The index's table suffixes — what [[graft.io.VersionedIndex.prune]]
    * needs to garbage-collect a superseded generation. */
  val TableSuffixes: Seq[String] =
    Seq("postings", "doclens", "lexstats", "tombstones", "fwd")

  /** Rebuild into a FRESH GENERATION and publish it LAST — the enforced
    * form of the rebuild-under-serve posture the class scaladoc
    * describes: the new generation's tables are written under a prefix no
    * reader resolves, then one atomic manifest swap
    * ([[graft.io.VersionedIndex]]) retargets future snapshots. A serve
    * pinned on [[snapshotVersioned]] keeps reading its own generation's
    * files throughout (and after) the rebuild; a crash anywhere before
    * the manifest swap leaves the old generation serving, untouched.
    * Returns the published prefix. */
  def rebuildVersioned(
      store: TableStore, name: String,
      corpus: DataFrame, idCol: String, textCol: String,
      sortFiles: Int = 32, forwardIndex: Boolean = false): String =
    graft.io.VersionedIndex.rebuild(store, name, corpus.sparkSession)(
      p => build(store, p, corpus, idCol, textCol, sortFiles, forwardIndex))

  /** [[snapshot]] of the CURRENT generation: the manifest is resolved
    * once, here, and the snapshot is pinned to that generation's prefix —
    * a rebuild publishing mid-serve cannot retarget it. */
  def snapshotVersioned(store: TableStore, name: String): LexSnapshot =
    snapshot(store, graft.io.VersionedIndex.currentPrefix(store, name))

  /** INCREMENTAL maintenance: tokenize a new document batch (the frozen
    * tokenizer — same contract as [[AnnIndex.appendIvf]]'s frozen
    * geometry), append its postings and doclens, and add its sums into
    * the stats row. One two-phase store commit: the appends and the
    * stats replacement all materialize against pre-commit snapshots,
    * then move. Serve-time df is derived from the postings, so appended
    * terms are visible at the next serve with no df table to refresh.
    *
    * Assumes batch ids are disjoint from indexed ids (the
    * [[Dedup.incrementalDedup]] contract — not checked: verifying would
    * scan corpus-sized doclens per append). Re-adding a TOMBSTONED id is
    * checked and REJECTED (one bounded job against the small tombstone
    * set): the deleted doc's old postings are still physical, so
    * un-tombstoning would resurrect them alongside the new rows, and
    * leaving the tombstone would let [[compact]] silently erase the new
    * rows while stats keep their increment. Run [[compact]] first, then
    * the id is genuinely fresh and append is safe. */
  def append(
      store: TableStore, prefix: String,
      batch: DataFrame, idCol: String, textCol: String): Unit = {
    appendStaged(store, prefix,
      stagePostings(batch, idCol, textCol), serve = None)
    ()
  }

  /** The batch's (term, doc_id, tf) postings, checkpointed — the one
    * corpus-reading job of [[append]], split out so a drill can run it
    * concurrently with a preceding build's staged writes (§2.6). */
  private def stagePostings(
      batch: DataFrame, idCol: String, textCol: String): DataFrame =
    TextAnalysis.bm25Postings(batch, idCol, textCol)
      .select(col("term"), col(idCol).as("doc_id"), col("tf"))
      .localCheckpoint()

  /** [[append]]'s commit over an already-staged postings checkpoint,
    * optionally OVERLAPPING a serve with the two-phase commit (§2.6).
    * The serve's snapshot is assembled from the PRE-commit tables plus
    * the staged batch frames — postings ∪ batch tf, doclens ∪ batch dl,
    * the merged stats row (checkpointed, so the serve never reads the
    * lexstats files the commit's snapshot swap deletes) — which is
    * row-identical to the post-commit tables: the commit only MOVES the
    * staged batch files into the (append-only) postings/doclens dirs and
    * swaps in the same merged stats row. Returns the materialized serve
    * frame when a serve was requested. */
  private def appendStaged(
      store: TableStore, prefix: String, tf: DataFrame,
      serve: Option[LexSnapshot => DataFrame]): Option[DataFrame] = {
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    if (store.exists(s"${prefix}_tombstones")) {
      val clashing = dl.select("doc_id")
        .join(store.load(s"${prefix}_tombstones"), Seq("doc_id"))
        .limit(1).count()
      require(clashing == 0L,
        s"append of tombstoned id(s) into $prefix: run compact() first " +
          "(re-adding before compaction would either resurrect the old " +
          "rows or corrupt the stats row at the next compaction)")
    }
    val merged0 = loadStats(store, prefix)
      .unionByName(statsOf(dl))
      .agg(sum(col("sum_dl")).cast("long").as("sum_dl"),
        sum(col("ndocs")).cast("long").as("ndocs"))
    // Only the overlapped serve needs the stats row materialized (the
    // commit's snapshot swap deletes the lexstats files the lazy frame
    // reads); the plain append keeps it lazy — no extra job.
    val merged = if (serve.isDefined) merged0.localCheckpoint() else merged0
    def commit(): Unit = store.commitAll(
      appends = Seq(
        s"${prefix}_postings" -> tf.sortWithinPartitions("term"),
        s"${prefix}_doclens" -> dl) ++
        // The forward index, when this prefix carries one, appends the
        // same batch rows doc-sorted (within the batch; compact restores
        // the global layout, like postings).
        (if (store.exists(s"${prefix}_fwd"))
          Seq(s"${prefix}_fwd" -> tf.sortWithinPartitions("doc_id"))
         else Nil),
      partitions = Nil,
      overwrites = Seq(s"${prefix}_lexstats" -> merged))
    val out = serve match {
      case None =>
        commit()
        None
      case Some(f) =>
        val snap = LexSnapshot(
          minusTombstones(store, prefix,
            store.load(s"${prefix}_postings").unionByName(tf)),
          store.load(s"${prefix}_doclens").unionByName(dl),
          merged.select(
            (col("sum_dl").cast("double") / col("ndocs").cast("double"))
              .as("avgdl"),
            col("ndocs").cast("double").as("ndocs")))
        val Seq(_, served) = graft.functions.Jobs.concurrently[Any](Seq(
          () => { commit(); () },
          () => f(snap).localCheckpoint()))
        Some(served.asInstanceOf[DataFrame])
    }
    tf.unpersist()
    if (serve.isDefined) merged.unpersist()
    out
  }

  /** The incremental-index maintenance drill — [[build]] on `base`,
    * [[append]] `batch`, serve `queries` from the appended index — with
    * both §2.6 overlaps: the batch's postings pass runs concurrently
    * with the build's staged writes (it reads only the corpus), and the
    * serve runs concurrently with the append's two-phase commit (it
    * reads the pre-commit tables plus the staged batch checkpoints —
    * row-identical to the committed tables, see [[appendStaged]]). The
    * physical build and append are unchanged; the append==rebuild oracle
    * keeps pinning the result. Returns the materialized serve frame. */
  private[graft] def buildAppendTopK(
      store: TableStore, prefix: String,
      base: DataFrame, batch: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      overlapServe: Boolean = false): DataFrame = {
    val Seq(_, tfAny) = graft.functions.Jobs.concurrently[Any](Seq(
      () => { build(store, prefix, base, idCol, textCol); () },
      () => stagePostings(batch, idCol, textCol)))
    val tf = tfAny.asInstanceOf[DataFrame]
    // The serve-∥-commit overlap measured FLAT-to-worse at sf0.1
    // (warm-solo 3.64/3.71 vs 3.33/3.39 sequential): the union-snapshot
    // serve plus the stats checkpoint cost what the overlap saves on
    // this small a commit. Kept behind `overlapServe` for corpora where
    // the commit is the tail; the drill default serves sequentially
    // from the committed store.
    if (overlapServe)
      appendStaged(store, prefix, tf,
        serve = Some(snap =>
          bm25TopK(snap, queries, qidCol, qTextCol, k, k1, b,
            pruneTerms = true))).get
    else {
      appendStaged(store, prefix, tf, serve = None)
      bm25TopK(store, prefix, queries, qidCol, qTextCol, k, k1, b)
    }
  }

  /** DELETE documents from the index (GDPR erasure, corpus refresh)
    * without a rebuild: ids land in `<prefix>_tombstones` and the serve
    * path anti-joins them; the stats row is decremented by the deleted
    * documents' lengths IN THE SAME two-phase commit, so
    * delete-then-query is row-identical to rebuild-without-deleted
    * (q_bm25_delete pins it) from the moment this returns. Ids already
    * tombstoned (or absent from the index) are ignored, so repeated
    * deletes never double-decrement. Physical rows remain until
    * [[compact]]. */
  def deleteDocs(
      store: TableStore, prefix: String,
      ids: DataFrame, idCol: String): Unit = {
    val wanted = ids.select(col(idCol).as("doc_id")).distinct()
    val existing =
      if (store.exists(s"${prefix}_tombstones"))
        store.load(s"${prefix}_tombstones")
      else emptyTombstones(ids, idCol)
    // Only ids that are actually in the live index may decrement stats:
    // semi-join against doclens (absent ids contribute nothing), anti-join
    // against prior tombstones (idempotence). Materialized once — it
    // feeds both the tombstone append and the stats delta.
    val newDead = wanted
      .join(existing, Seq("doc_id"), "left_anti")
      .join(store.load(s"${prefix}_doclens"), Seq("doc_id"))
      .localCheckpoint()
    val merged = loadStats(store, prefix)
      .unionByName(newDead.agg(
        (-coalesce(sum(col("dl")), lit(0L))).cast("long").as("sum_dl"),
        (-count(lit(1))).cast("long").as("ndocs")))
      .agg(sum(col("sum_dl")).cast("long").as("sum_dl"),
        sum(col("ndocs")).cast("long").as("ndocs"))
    store.commitAll(
      appends = Seq(s"${prefix}_tombstones" -> newDead.select("doc_id")),
      partitions = Nil,
      overwrites = Seq(s"${prefix}_lexstats" -> merged))
    newDead.unpersist()
    ()
  }

  /** Fold accumulated tombstones into the physical tables: postings and
    * doclens are rewritten without the deleted ids — the postings
    * restored to the term-sorted layout appends dilute — and the
    * tombstone set empties, ONE atomic-per-table two-phase commit.
    * Stats are untouched (already decremented at delete time). Serve
    * results are IDENTICAL before and after; idempotent (rerunning after
    * a crash converges) — FunctionsSpec pins both. */
  def compact(store: TableStore, prefix: String, sortFiles: Int = 32): Unit =
    if (store.exists(s"${prefix}_tombstones")) {
      val tomb = store.load(s"${prefix}_tombstones")
      store.overwriteAll(Seq(
        s"${prefix}_postings" ->
          store.load(s"${prefix}_postings")
            .join(tomb, Seq("doc_id"), "left_anti")
            .repartition(sortFiles, col("term")).sortWithinPartitions("term"),
        s"${prefix}_doclens" ->
          store.load(s"${prefix}_doclens")
            .join(tomb, Seq("doc_id"), "left_anti"),
        s"${prefix}_tombstones" -> tomb.limit(0).repartition(1)) ++
        (if (store.exists(s"${prefix}_fwd"))
          Seq(s"${prefix}_fwd" ->
            store.load(s"${prefix}_fwd")
              .join(tomb, Seq("doc_id"), "left_anti")
              .repartition(sortFiles, col("doc_id"))
              .sortWithinPartitions("doc_id"))
         else Nil))
    }

  /** BM25 top-k per query from the PERSISTED index: reads only the
    * index tables. Row-identical to [[TextAnalysis.bm25TopK]] over the
    * live corpus (built ∪ appended ∖ deleted).
    *
    * With `pruneTerms` (default) the query batch's distinct terms are
    * collected first — bounded by the batch's own text, the [[AnnIndex]]
    * probed-cent_id convention — and land as a static `term IN (...)`
    * filter on the postings scan, which the term-sorted file layout
    * turns into row-group skipping: a serve reads the probed slice of
    * the index, never all of it. Pass false to keep plan construction
    * fully lazy (the probe is then only the broadcast hash join).
    * Document frequency aggregates from the probed (and
    * tombstone-filtered) slice itself — one tiny extra aggregation over
    * rows the probe already reads, in exchange for df that can never go
    * stale. */
  def bm25TopK(
      store: TableStore, prefix: String,
      queries: DataFrame, qidCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      pruneTerms: Boolean = true): DataFrame =
    // Fresh-per-call = serve against uncached just-resolved frames; the
    // probe logic itself is shared verbatim with the pinned path.
    bm25TopK(LexSnapshot(
        minusTombstones(store, prefix, store.load(s"${prefix}_postings")),
        store.load(s"${prefix}_doclens"),
        loadStats(store, prefix).select(
          (col("sum_dl").cast("double") / col("ndocs").cast("double")).as("avgdl"),
          col("ndocs").cast("double").as("ndocs"))),
      queries, qidCol, qTextCol, k, k1, b, pruneTerms)

  /** Index frames resolved ONCE for a serving session — the lexical twin
    * of [[AnnIndex.ivfSnapshot]]: the stats row is materialized into the
    * cache (ONE row, frozen between maintenance writes), the
    * postings/doclens file metadata is resolved now, and tombstones as
    * of now are folded in. The fresh-per-call [[bm25TopK]] re-resolves
    * every table per call — per MICRO-BATCH in a foreachBatch serve
    * loop, which at cluster scale means an object-store LIST of every
    * postings file plus a schema read on each batch.
    *
    * Freshness contract (the trade, stated): appends, deletes, and
    * compaction land at the NEXT snapshot, not the next call — and a
    * compaction or rebuild REPLACES the physical table directories, so a
    * pre-existing snapshot then reads deleted files. Re-snapshot after
    * any maintenance write; [[LexSnapshot.release]] when done. */
  final case class LexSnapshot private[functions] (
      private[functions] val postings: DataFrame,
      private[functions] val doclens: DataFrame,
      private[functions] val stats: DataFrame,
      private[functions] val fwd: Option[DataFrame] = None) {
    /** Unpersist the cached stats row. */
    def release(): Unit = { stats.unpersist(); () }
  }

  /** Resolve the serve frames once (see [[LexSnapshot]]). Picks up the
    * forward index when the prefix carries one (built with
    * `forwardIndex = true`) — the RM3 serve path then gathers feedback
    * terms through it instead of streaming the postings. */
  def snapshot(store: TableStore, prefix: String): LexSnapshot = {
    val stats = loadStats(store, prefix)
      .select(
        (col("sum_dl").cast("double") / col("ndocs").cast("double")).as("avgdl"),
        col("ndocs").cast("double").as("ndocs"))
      .cache()
    stats.count() // materialize at snapshot time, not in the first batch
    LexSnapshot(
      minusTombstones(store, prefix, store.load(s"${prefix}_postings")),
      store.load(s"${prefix}_doclens"), stats,
      if (store.exists(s"${prefix}_fwd")) Some(store.load(s"${prefix}_fwd"))
      else None)
  }

  /** [[bm25TopK]] against a pinned [[snapshot]] — row-identical to the
    * fresh path as of snapshot time (spec-pinned); no store reads
    * besides the snapshot's own frames. */
  def bm25TopK(
      snap: LexSnapshot,
      queries: DataFrame, qidCol: String, qTextCol: String,
      k: Int, k1: Double, b: Double,
      pruneTerms: Boolean): DataFrame = {
    val qTerms0 = TextAnalysis.bm25QueryTerms(queries, qidCol, qTextCol)
    if (pruneTerms) {
      // One query-tokenization job per serve call: the collected
      // (qid, term) rows feed BOTH the static IN pushdown and the
      // broadcast probe side (a lazy qTerms reference in bm25Search
      // would re-run the explode a second time per micro-batch).
      val (local, terms) = collectTerms(qTerms0)
      bm25TopKLocalTerms(snap, local, terms, k, k1, b)
    } else {
      val postings1 = snap.postings
        .join(broadcast(qTerms0.select("term").distinct()), Seq("term"))
      val termDf = postings1
        .groupBy("term").agg(count(lit(1)).cast("double").as("df"))
      TextAnalysis.bm25Search(
        postings1, snap.doclens, termDf, snap.stats, qTerms0, "doc_id",
        k, k1, b)
    }
  }

  /** Collect a (qid, term) frame once and return (local frame, distinct
    * term strings) — the shared serve-path convention: the local frame
    * feeds broadcast probe sides, the strings feed static IN pushdowns. */
  private def collectTerms(qTerms: DataFrame): (DataFrame, Seq[String]) = {
    val rows = qTerms.collect()
    val local = qTerms.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), qTerms.schema)
    val termIdx = qTerms.schema.fieldIndex("term")
    (local, rows.map(_.getString(termIdx)).distinct.toSeq)
  }

  /** The pruned pinned probe over an ALREADY-LOCAL (qid, term) frame —
    * the seam [[bm25Rm3TopK]] reuses so its pass 1 shares the tokenize
    * job with the rest of the call. */
  private def bm25TopKLocalTerms(
      snap: LexSnapshot, qTermsLocal: DataFrame, terms: Seq[String],
      k: Int, k1: Double, b: Double): DataFrame = {
    // The probed slice feeds BOTH the df aggregation (shuffles on term)
    // and the scoring probe (shuffles on doc_id) — the subtrees diverge
    // before any common exchange, so the slice's scan + tombstone
    // anti-join execute once per consumer. Both executions are bounded
    // by query-term selectivity; a long-lived index with a large
    // un-compacted tombstone set should compact to keep the anti-join
    // side small.
    val postings1 = snap.postings.filter(col("term").isin(terms: _*))
    val termDf = postings1
      .groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    TextAnalysis.bm25Search(
      postings1, snap.doclens, termDf, snap.stats, qTermsLocal, "doc_id",
      k, k1, b)
  }

  /** RM3 expanded re-retrieval against a pinned [[snapshot]] — the
    * persisted-index twin of [[TextAnalysis.bm25Rm3TopK]] (row-identical,
    * spec-pinned): pass 1 is the pruned [[bm25TopK]] probe at `fbK`, the
    * RM1 feedback-term model comes from the SNAPSHOT's own postings
    * ([[TextAnalysis.rm1TopTerms]] — the feedback doc-id set broadcasts,
    * the postings never shuffle for it), and pass 2 is the weighted probe
    * over the interpolated term model ([[TextAnalysis.rm3TermWeights]]:
    * originals at `alpha`, normalized expansion at `1 − alpha`).
    *
    * Each bounded intermediate is collected ONCE per call and fed back
    * as a LOCAL frame — the pass-1 feedback set (fbK · |queries| ids),
    * then the interpolated term model (≤ |queries| · (original terms +
    * m) rows): a lazy reference would re-evaluate the whole upstream
    * probe chain once per downstream consumer (the ivfTopKFrames
    * double-evaluation lesson; rm1's own plan references its feedback
    * frame twice, the term model feeds both pass 2's static IN pushdown
    * and its broadcast probe side). Measured in BenchLexServe's rm3
    * phase: the two-pass serve lands at a small multiple of the pinned
    * single-pass, not the ~7× the fully-lazy composition cost.
    * Output: (qid, doc_id, rm3, rnk). */
  def bm25Rm3TopK(
      snap: LexSnapshot,
      queries: DataFrame, qidCol: String, qTextCol: String,
      k: Int, fbK: Int = 5, m: Int = 5, alpha: Double = 0.6,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val spark = queries.sparkSession
    def localize(df: DataFrame): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(df.collect(): _*), df.schema)
    // ONE query-tokenization job for the whole call: the local (qid,
    // term) frame feeds pass 1's probe, the RM1 anti-join, and the RM3
    // original-term weights — a lazy qTerms reference would re-run the
    // batch's upstream plan once per consumer (three times per trigger
    // in a serve loop).
    val (qTerms, qTermStrings) = collectTerms(
      TextAnalysis.bm25QueryTerms(queries, qidCol, qTextCol))
    val top = localize(
      bm25TopKLocalTerms(snap, qTerms, qTermStrings, fbK, k1, b)
        .select(col("qid"), col("doc_id")))
    // Feedback-term gather: with a FORWARD index ([[build]]'s
    // forwardIndex=true) the fbK·|queries| doc ids land as a static
    // `doc_id IN (...)` filter on the doc-sorted fwd scan — row-group
    // skipping, a bounded read. Without one, the gather probes the
    // term-keyed postings via broadcast join: correct, but a doc-id
    // lookup in a term-sorted layout streams the WHOLE table per serve
    // batch — the classic PRF cost this option exists to amortize.
    // (No tombstone anti-join on fwd: feedback docs come from pass 1,
    // which is already tombstone-filtered — a deleted doc cannot be a
    // feedback doc.)
    val fbTf = snap.fwd match {
      case Some(fwd) =>
        val ids = top.select("doc_id").collect().map(_.get(0)).distinct.toSeq
        fwd.filter(col("doc_id").isin(ids: _*))
          .join(broadcast(top), Seq("doc_id"))
      case None => snap.postings.join(broadcast(top), Seq("doc_id"))
    }
    val exp = TextAnalysis.rm1TopTermsFrom(
        fbTf, snap.postings, snap.stats.select("ndocs"), qTerms, m)
      .select("qid", "term", "w6")
    val qTermsW0 = TextAnalysis.rm3TermWeights(localize(exp), qTerms, alpha)
    val rows = qTermsW0.collect()
    val local = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), qTermsW0.schema)
    val termIdx = qTermsW0.schema.fieldIndex("term")
    val terms = rows.map(_.getString(termIdx)).distinct.toSeq
    val postings1 = snap.postings.filter(col("term").isin(terms: _*))
    val termDf = postings1
      .groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    TextAnalysis.bm25SearchWeighted(
      postings1, snap.doclens, termDf, snap.stats, local, "doc_id", k, k1, b)
  }

  /** Load the stats row, failing fast with a rebuild hint on an index
    * persisted by the pre-maintenance format (which stored (avgdl,
    * ndocs) and a termdf table): the additive arithmetic needs sum_dl,
    * and silently mis-reading an old row would corrupt every score. */
  private def loadStats(store: TableStore, prefix: String): DataFrame = {
    val stats = store.load(s"${prefix}_lexstats")
    require(stats.columns.contains("sum_dl"),
      s"$prefix was built by an older LexIndex format " +
        s"(lexstats columns: ${stats.columns.mkString(", ")}) — rebuild " +
        "the index with LexIndex.build")
    stats
  }

  /** The additive stats row for a doclens frame: exact long sums. */
  private def statsOf(dl: DataFrame): DataFrame =
    dl.agg(coalesce(sum(col("dl")), lit(0L)).cast("long").as("sum_dl"),
      count(lit(1)).cast("long").as("ndocs"))

  /** Empty tombstone frame whose doc_id TYPE follows the corpus id column
    * — a fixed Long here would poison the parquet schema for indexes
    * keyed by string/int ids once deleteDocs appends real rows. */
  private def emptyTombstones(like: DataFrame, idCol: String): DataFrame =
    like.select(col(idCol).as("doc_id")).limit(0).repartition(1)

  private def minusTombstones(
      store: TableStore, prefix: String, df: DataFrame): DataFrame =
    if (store.exists(s"${prefix}_tombstones"))
      // Keyed anti-join (AQE broadcasts it when the tombstone set is
      // actually small): the set grows with deletions until compaction,
      // so it is never assumed broadcastable.
      df.join(store.load(s"${prefix}_tombstones"), Seq("doc_id"), "left_anti")
    else df

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009): fuse N
    * per-query rankings — each (qid, doc, rank) — into one top-`k` under
    * `score(q,d) = Σ_rankings 1/(c + rank(q,d))`, the standard hybrid-
    * retrieval combiner (BM25 ⊕ ANN). Fusion is RANK-based, so the
    * incomparable score scales of a lexical and a vector retriever fuse
    * without calibration; a document absent from a ranking simply
    * contributes nothing (`n_systems` reports how many rankings carried
    * it). Per-(ranking, query, doc) contributions are 1e-9 fixed-point
    * longs before the sum (terms are O(1/c) — the drift-monitor grain
    * rationale), so the fused ordering is partition-order-independent and
    * oracle-verifiable; ties rank by doc id.
    *
    * Scale: each input is already a top-k (k·|queries| rows), so the
    * union + one keyed aggregation + a qid-partitioned window is
    * query-batch-sized — never corpus-sized. */
  /** PINNED hybrid retrieval with FUSED probe routing — the steady-state
    * dual-encoder endpoint: BM25 over a [[LexSnapshot]] ⊕ probed IVF over
    * an [[AnnIndex.IndexSnapshot]] ⊕ [[rrfFuse]], with the two
    * retrievers' routing gathered in ONE driver round trip. Serving a
    * batch otherwise pays TWO sequential routing jobs — the BM25 term
    * gather and the IVF probe assignment — each a full job-submit +
    * collect over the same (tiny, materialized) query batch; at a few
    * hundred ms of fixed per-job latency apiece, that is the pinned
    * hybrid's micro-batch floor (BenchHybridServe r13: ~2.7 s p50 at
    * batch 64). Here both routing frames — (qid, term) and
    * (cent_id, qid, qv, nq), each bounded by the batch itself — are
    * tagged, UNIONed, and collected as one job, then split driver-side
    * back into the per-retriever local frames the probe paths consume
    * (the collectTerms convention: local frames feed broadcast probe
    * sides, the distinct key strings feed static IN pushdowns).
    * Row-identical to composing the two pinned serves separately
    * (spec-pinned, and BenchHybridServe asserts it per batch before
    * timing). Same query-id/corpus-id disjointness caveat as
    * [[graft.stream.EventAnalytics.hybridProbeEachBatch]]. */
  def hybridTopKPinned(
      lexSnap: LexSnapshot, annSnap: AnnIndex.IndexSnapshot,
      queries: DataFrame, qidCol: String, qTextCol: String, vecCol: String,
      k: Int, nprobe: Int = 4, rrfC: Int = 60,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = queries.sparkSession
    val qTerms = TextAnalysis.bm25QueryTerms(queries, qidCol, qTextCol)
    val probes = Similarity.ivfProbes(annSnap.small, queries, qidCol, vecCol, nprobe)
    val qvType = probes.schema("qv").dataType
    val nulls = Seq(lit(null).cast("long").as("cent_id"),
      lit(null).cast(qvType).as("qv"), lit(null).cast("double").as("nq"))
    val tagged = qTerms.select(
        lit("lex").as("__side") +: col("qid") +: col("term") +: nulls: _*)
      .unionByName(probes.select(lit("ann").as("__side"),
        col("query_id").as("qid"), lit(null).cast("string").as("term"),
        col("cent_id"), col("qv"), col("nq")))
    val rows = tagged.collect() // the ONE routing round trip per batch
    import org.apache.spark.sql.Row
    def local(rs: Seq[Row], schema: org.apache.spark.sql.types.StructType) =
      spark.createDataFrame(java.util.Arrays.asList(rs: _*), schema)
    val (lexRows, annRows) = rows.toSeq.partition(_.getString(0) == "lex")
    val lexLocal = local(lexRows.map(r => Row(r.get(1), r.get(2))), qTerms.schema)
    val annLocal = local(
      annRows.map(r => Row(r.get(3), r.get(1), r.get(4), r.get(5))), probes.schema)
    val terms = lexRows.map(_.getString(2)).distinct
    val probed = annRows.map(_.getLong(3)).distinct
    val lex = bm25TopKLocalTerms(lexSnap, lexLocal, terms, k, k1, b)
      .select(col("qid"), col("doc_id"), col("rnk"))
    // Static cent_id pushdown + broadcast probe side — the ivfTopKFrames
    // pruneProbed recipe over the already-collected routing rows.
    val ann = Similarity.ivfSearchLists(
        annSnap.big.filter(col("cent_id").isin(probed: _*)), annLocal, k)
      .select(col("query_id").as("qid"), col("vec_id").as("doc_id"),
        col("rank").cast("long").as("rnk"))
    rrfFuse(Seq(lex, ann), "qid", "doc_id", "rnk", k, rrfC)
  }

  def rrfFuse(
      rankings: Seq[DataFrame], qidCol: String, docCol: String,
      rankCol: String, k: Int, c: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rankings.nonEmpty, "need at least one ranking")
    require(k >= 1 && c >= 0, s"bad RRF params k=$k c=$c")
    val all = rankings.map(_.select(col(qidCol).as("qid"),
        col(docCol).as("doc_id"),
        round(lit(1e9) / (lit(c.toDouble) + col(rankCol).cast("double")), 0)
          .cast("long").as("c9")))
      .reduce(_ unionByName _)
    val fused = all.groupBy("qid", "doc_id")
      .agg(sum(col("c9")).as("s9"), count(lit(1)).cast("long").as("n_systems"))
    val w = Window.partitionBy("qid").orderBy(col("s9").desc, col("doc_id").asc)
    fused.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("doc_id"),
        round(col("s9").cast("double") / 1e9, 6).as("rrf_score"),
        col("n_systems"), col("rnk"))
  }
}
