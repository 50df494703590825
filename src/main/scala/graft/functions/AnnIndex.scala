package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.TableStore

/** Persisted ANN index over a [[graft.io.TableStore]] — the build/serve
  * split a production vector-search deployment actually runs: the corpus
  * pass (coarse-quantizer assignment, PQ encoding) happens ONCE at build
  * time and lands as index TABLES; the query path reads ONLY those tables,
  * so serving cost is proportional to the probed lists / byte codes, never
  * to re-deriving the index from 100 TB of raw embeddings per query (which
  * is what the inline [[Similarity.ivfTopK]] / [[Similarity.pqAdcTopK]]
  * entry points do — correct, and the right shape for one-shot jobs, but
  * wrong for a standing index serving many query batches).
  *
  * Build and serve share the SAME stage functions
  * ([[Similarity.ivfCentroids]]/[[Similarity.ivfInvertedLists]]/
  * [[Similarity.ivfSearch]], [[Similarity.pqCodebook]]/
  * [[Similarity.pqEncodeMelted]]/[[Similarity.pqAdcSearch]]), so
  * built-then-loaded results are row-identical to the inline paths —
  * q_knn_ivf_persisted / q_pq_adc_persisted pin that equality against the
  * inline oracles, and PlanQualitySpec gates that no raw-corpus scan
  * appears in a persisted query plan.
  *
  * Index tables (under `prefix`):
  *   - IVF: `<prefix>_centroids` (cent_id, centv, ncent) and
  *     `<prefix>_lists` (cent_id, vec_id, cv, nc). At cluster scale,
  *     write the lists partitioned by cent_id so a probe prunes to its
  *     nprobe partitions (pass the store a partition spec for the table).
  *   - PQ: `<prefix>_codebook` (cb_id, s, cw) and `<prefix>_codes`
  *     (vec_id, s, code) — the 32×-compressed corpus representation.
  *
  * Writing goes through `overwriteAll`, so a rebuild is atomic against
  * concurrent readers (the store's temp-dir swap), and a crash mid-build
  * never leaves a centroids/lists pair from different corpus versions.
  */
object AnnIndex {

  /** Build (or rebuild) the IVF index tables from `corpus`. */
  def buildIvf(
      store: TableStore, prefix: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16): Unit = {
    val cents = Similarity.ivfCentroids(corpus, idCol, vecCol, nlist)
    store.overwriteAll(Seq(
      s"${prefix}_centroids" -> cents,
      s"${prefix}_lists" ->
        Similarity.ivfInvertedLists(corpus, cents, idCol, vecCol)))
  }

  /** Probed exact top-k from the PERSISTED IVF index: reads only
    * `<prefix>_centroids` / `<prefix>_lists`. Row-identical to
    * [[Similarity.ivfTopK]] over the corpus the index was built from. */
  def ivfTopK(
      store: TableStore, prefix: String,
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int = 4): DataFrame =
    Similarity.ivfSearch(
      store.load(s"${prefix}_centroids"), store.load(s"${prefix}_lists"),
      queries, idCol, vecCol, k, nprobe)

  /** INCREMENTAL maintenance: assign a new `batch` of vectors against the
    * index's PERSISTED centroids and append to the lists table — the
    * daily-ingest path that never rebuilds and never rescans the existing
    * corpus (the batch is the only thing moving). The index geometry is
    * frozen at build time (standard IVF contract: appended vectors join
    * the lists of the ORIGINAL coarse quantizer; rebuild when centroid
    * drift warrants), so a query after append is exactly
    * [[Similarity.ivfSearch]] over (original centroids, union lists) —
    * pinned by the shared oracle in q_knn_ivf_append, which builds on a
    * prefix of the corpus and appends the rest.
    *
    * Assumes batch ids are disjoint from indexed ids (same contract as
    * [[graft.functions.Dedup.incrementalDedup]]). */
  def appendIvf(
      store: TableStore, prefix: String,
      batch: DataFrame, idCol: String, vecCol: String): Unit =
    store.append(s"${prefix}_lists",
      Similarity.ivfInvertedLists(batch,
        store.load(s"${prefix}_centroids"), idCol, vecCol))

  /** INCREMENTAL PQ maintenance: encode a new batch under the PERSISTED
    * codebook and append the codes — same frozen-geometry contract as
    * [[appendIvf]]. */
  def appendPq(
      store: TableStore, prefix: String,
      batch: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int = 8): Unit =
    store.append(s"${prefix}_codes",
      Similarity.pqEncodeWith(batch, store.load(s"${prefix}_codebook"),
        idCol, vecCol, dims, m))

  /** Build (or rebuild) the PQ index tables from `corpus`. */
  def buildPq(
      store: TableStore, prefix: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int = 8, ksub: Int = 16): Unit =
    store.overwriteAll(Seq(
      s"${prefix}_codebook" ->
        Similarity.pqCodebook(corpus, idCol, vecCol, m, dims / m, ksub),
      s"${prefix}_codes" ->
        Similarity.pqEncodeMelted(corpus, idCol, vecCol, dims, m, ksub)))

  /** ADC top-k from the PERSISTED PQ index: reads only
    * `<prefix>_codebook` / `<prefix>_codes` (full-precision vectors exist
    * nowhere in the plan — the serving memory footprint is the byte
    * codes). Row-identical to [[Similarity.pqAdcTopK]] over the corpus
    * the index was built from. */
  def pqAdcTopK(
      store: TableStore, prefix: String,
      queries: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int = 8, k: Int = 3): DataFrame =
    Similarity.pqAdcSearch(
      store.load(s"${prefix}_codes"), store.load(s"${prefix}_codebook"),
      queries, idCol, vecCol, dims, m, k)
}
