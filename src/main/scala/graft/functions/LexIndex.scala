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
  * The lexical twin of [[AnnIndex]]; a hybrid retrieval deployment
  * stands both up over the same corpus.
  *
  * Build and serve share [[TextAnalysis.bm25Search]] verbatim, so
  * built-then-served results are row-identical to the inline path —
  * q_bm25_persisted pins that equality against q_bm25_topk's oracle,
  * and PlanQualitySpec gates that no raw-corpus scan appears in a
  * persisted serve plan.
  *
  * Index tables (under `prefix`; the document id column is normalized
  * to `doc_id`):
  *   - `<prefix>_postings` (term, doc_id, tf) — written REPARTITIONED BY
  *     term and SORTED by term within files, so the serve path's
  *     `term IN (query terms)` filter turns into parquet row-group
  *     min/max skipping (term cardinality is far too high for hive
  *     partitioning — ordering inside the files is the pruning lever).
  *   - `<prefix>_doclens` (doc_id, dl) — per-document token counts.
  *   - `<prefix>_termdf` (term, df) — document frequency, same layout
  *     rationale as the postings.
  *   - `<prefix>_lexstats` (avgdl, ndocs) — ONE row.
  *
  * Writing goes through `overwriteAll`: each TABLE's swap is atomic
  * (the store's temp-dir rename), but the four tables swap
  * SEQUENTIALLY — a crash between swaps, or a serve that loads tables
  * while a rebuild is mid-swap, can pair new postings with old stats.
  * A standing deployment that rebuilds under live serving should
  * rebuild into a FRESH prefix (or a snapshot-keeping store) and flip
  * serves to it — the same posture as [[AnnIndex]] rebuilds.
  */
object LexIndex {

  /** Build (or atomically rebuild) the index tables from `corpus`.
    *
    * The postings aggregate feeds all four tables, and `overwriteAll`
    * evaluates each table as its own write job, so the frame is
    * localCheckpoint'ed once — ONE tokenize pass over the corpus instead
    * of four (build-time only; swap for reliable checkpoint() on a real
    * cluster, the [[Dedup.clusterLabels]] convention). `sortFiles`
    * controls the postings/termdf file count the term-ordered layout is
    * spread over — size it so each file's row groups stay
    * skip-friendly. */
  def build(
      store: TableStore, prefix: String,
      corpus: DataFrame, idCol: String, textCol: String,
      sortFiles: Int = 32): Unit = {
    require(sortFiles >= 1, s"sortFiles must be >= 1, got $sortFiles")
    val tf = TextAnalysis.bm25Postings(corpus, idCol, textCol)
      .select(col("term"), col(idCol).as("doc_id"), col("tf"))
      .localCheckpoint()
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(avg(col("dl")).as("avgdl"),
      count(lit(1)).cast("double").as("ndocs"))
    val termDf = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    store.overwriteAll(Seq(
      s"${prefix}_postings" ->
        tf.repartition(sortFiles, col("term")).sortWithinPartitions("term"),
      s"${prefix}_doclens" -> dl,
      s"${prefix}_termdf" ->
        termDf.repartition(math.min(sortFiles, 4), col("term"))
          .sortWithinPartitions("term"),
      s"${prefix}_lexstats" -> stats))
    // The checkpointed postings blocks have no consumer once the tables
    // are on disk — release them, or they pin executor memory for the
    // rest of the session (corpus-scale at build time).
    tf.unpersist()
    ()
  }

  /** BM25 top-k per query from the PERSISTED index: reads only the four
    * index tables. Row-identical to [[TextAnalysis.bm25TopK]] over the
    * corpus the index was built from.
    *
    * With `pruneTerms` (default) the query batch's distinct terms are
    * collected first — bounded by the batch's own text, the [[AnnIndex]]
    * probed-cent_id convention — and land as a static `term IN (...)`
    * filter on the postings/termdf scans, which the term-sorted file
    * layout turns into row-group skipping: a serve reads the probed
    * slice of the index, never all of it. Pass false to keep plan
    * construction fully lazy (the probe is then only the broadcast hash
    * join; parquet still gets the join's runtime filter when row-level
    * runtime filtering is enabled). */
  def bm25TopK(
      store: TableStore, prefix: String,
      queries: DataFrame, qidCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      pruneTerms: Boolean = true): DataFrame = {
    val qTerms0 = TextAnalysis.bm25QueryTerms(queries, qidCol, qTextCol)
    val postings0 = store.load(s"${prefix}_postings")
    val termDf0 = store.load(s"${prefix}_termdf")
    val (postings, termDf, qTerms) =
      if (pruneTerms) {
        // One query-tokenization job per serve call: the collected
        // (qid, term) rows feed BOTH the static IN pushdown and the
        // broadcast probe side (a lazy qTerms reference in bm25Search
        // would re-run the explode a second time per micro-batch).
        val rows = qTerms0.collect()
        val local = queries.sparkSession.createDataFrame(
          java.util.Arrays.asList(rows: _*), qTerms0.schema)
        val termIdx = qTerms0.schema.fieldIndex("term")
        val terms = rows.map(_.getString(termIdx)).distinct.toSeq
        (postings0.filter(col("term").isin(terms: _*)),
          termDf0.filter(col("term").isin(terms: _*)),
          local)
      } else
        (postings0,
          termDf0.join(broadcast(qTerms0.select("term").distinct()), Seq("term")),
          qTerms0)
    TextAnalysis.bm25Search(
      postings, store.load(s"${prefix}_doclens"), termDf,
      store.load(s"${prefix}_lexstats"), qTerms, "doc_id", k, k1, b)
  }

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
