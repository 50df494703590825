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
  *     `<prefix>_lists` (cent_id, vec_id, cv, nc). Build the store with
  *     [[partitionSpec]] so the lists land hive-partitioned by cent_id:
  *     a probe then PRUNES the scan to its nprobe partitions (static
  *     `cent_id IN (...)` PartitionFilters from the probe routing, plus
  *     Spark's dynamic partition pruning reusing the probe broadcast) —
  *     at cluster scale the serve path reads nprobe/nlist of the index,
  *     not all of it.
  *   - PQ: `<prefix>_codebook` (cb_id, s, cw) and `<prefix>_codes`
  *     (vec_id, s, code) — the 32×-compressed corpus representation.
  *   - `<prefix>_tombstones` (vec_id): ids DELETED from the index since
  *     the last rebuild/compaction ([[deleteVectors]]). Serve paths
  *     anti-join it; [[compact]] folds it into the physical tables.
  *
  * Writing goes through `overwriteAll`, so a rebuild is atomic against
  * concurrent readers (the store's temp-dir swap), and a crash mid-build
  * never leaves a centroids/lists pair from different corpus versions.
  */
object AnnIndex {

  /** The `partitionByCols` entries a store hosting this index should be
    * constructed with: lists partitioned by cent_id, so probed serves
    * prune. (The melted PQ codes join every code row per query — no
    * selective column to partition by.) */
  def partitionSpec(prefix: String): Map[String, Seq[String]] =
    Map(s"${prefix}_lists" -> Seq("cent_id"))

  /** Suffix-keyed form of [[partitionSpec]] for VERSIONED stores
    * (`ParquetTableStore(partitionBySuffix = ...)`): generation prefixes
    * (`<name>_g<N>_lists`) aren't known at store construction, so the
    * layout rule keys on the stable suffix. */
  val partitionSpecSuffix: Map[String, Seq[String]] =
    Map("_lists" -> Seq("cent_id"))

  /** The IVF index's table suffixes, for
    * [[graft.io.VersionedIndex.prune]]. */
  val IvfTableSuffixes: Seq[String] = Seq("centroids", "lists", "tombstones")

  /** Rebuild the IVF index into a FRESH GENERATION and publish it LAST
    * ([[graft.io.VersionedIndex]]) — the enforced rebuild-under-serve
    * posture: a serve pinned on [[ivfSnapshotVersioned]] keeps reading
    * its own generation's files throughout the rebuild (a same-prefix
    * rebuild REPLACES the physical directories under it — the freshness
    * caveat in [[IndexSnapshot]]'s scaladoc); a crash before the manifest
    * swap leaves the old generation serving, untouched. */
  def rebuildIvfVersioned(
      store: TableStore, name: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16, trainIters: Int = 0): String =
    graft.io.VersionedIndex.rebuild(store, name, corpus.sparkSession)(
      p => buildIvf(store, p, corpus, idCol, vecCol, nlist, trainIters))

  /** [[ivfSnapshot]] of the CURRENT generation — manifest resolved once,
    * snapshot pinned to that generation's prefix. */
  def ivfSnapshotVersioned(store: TableStore, name: String): IndexSnapshot =
    ivfSnapshot(store, graft.io.VersionedIndex.currentPrefix(store, name))

  /** Build (or rebuild) the IVF index tables from `corpus`.
    * `trainIters > 0` trains the coarse quantizer with that many Lloyd's
    * rounds ([[Similarity.kmeansTrain]] — better-fitting cells, higher
    * recall at the same nprobe) instead of the deterministic lowest-id
    * stand-in; both are frozen at build time either way. */
  def buildIvf(
      store: TableStore, prefix: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16, trainIters: Int = 0): Unit = {
    val cents =
      if (trainIters > 0)
        Similarity.kmeansTrain(corpus, idCol, vecCol, nlist, trainIters)
      else Similarity.ivfCentroids(corpus, idCol, vecCol, nlist)
    store.overwriteAll(Seq(
      s"${prefix}_centroids" -> cents,
      s"${prefix}_lists" ->
        Similarity.ivfInvertedLists(corpus, cents, idCol, vecCol)))
  }

  /** Publish an IVF index from ALREADY-COMPUTED centroid and
    * inverted-list frames — the write half of [[buildIvf]], split out so
    * several consumers of one training run (a direct serve and a
    * persisted index) can share the trained frames instead of each
    * re-running Lloyd's + the assignment pass. Identical tables to
    * [[buildIvf]] given the same frames (spec-pinned). */
  def buildIvfFromFrames(
      store: TableStore, prefix: String,
      cents: DataFrame, lists: DataFrame): Unit =
    store.overwriteAll(Seq(
      s"${prefix}_centroids" -> cents,
      s"${prefix}_lists" -> lists))

  /** Probed exact top-k from the PERSISTED IVF index: reads only
    * `<prefix>_centroids` / `<prefix>_lists` (tombstoned ids excluded).
    * Row-identical to [[Similarity.ivfTopK]] over the corpus the index
    * was built from, minus deletions.
    *
    * With `pruneProbed` (default) the probe ROUTING runs first — one
    * bounded job (queries × broadcast centroids; the collected set is at
    * most nlist cent_ids regardless of query-batch size) — and the lists
    * scan carries a static `cent_id IN (probed)` filter, which a
    * [[partitionSpec]]-partitioned lists table turns into partition
    * pruning: the scan reads only the probed nprobe-per-query partitions.
    * Pass false to keep plan construction fully lazy (Spark's dynamic
    * partition pruning still prunes at runtime via the probe broadcast). */
  def ivfTopK(
      store: TableStore, prefix: String,
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int = 4, pruneProbed: Boolean = true): DataFrame =
    ivfTopKFrames(
      store.load(s"${prefix}_centroids"),
      minusTombstones(store, prefix, store.load(s"${prefix}_lists")),
      queries, idCol, vecCol, k, nprobe, pruneProbed)

  private def ivfTopKFrames(
      cents: DataFrame, lists0: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int, pruneProbed: Boolean): DataFrame = {
    val probes0 = Similarity.ivfProbes(cents, queries, idCol, vecCol, nprobe)
    if (pruneProbed) {
      // ONE probe-routing job per serve call: the collected rows feed
      // BOTH the static cent_id pushdown and the search's broadcast
      // probe side (a lazy probes reference in ivfSearchLists would
      // re-run the queries × centroids routing a second time per call —
      // per MICRO-BATCH in annProbeEachBatch). The collect is bounded by
      // the query batch itself (nprobe rows per query, each carrying the
      // query vector the driver already holds) — the LexIndex.bm25TopK
      // pruneTerms convention; a query batch too large to collect should
      // pass pruneProbed = false, which keeps routing fully lazy and
      // distributed (dynamic partition pruning still prunes at runtime).
      val rows = probes0.collect()
      val local = queries.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), probes0.schema)
      val centIdx = probes0.schema.fieldIndex("cent_id")
      val probed = rows.map(_.getLong(centIdx)).distinct.toSeq
      // The cent_id filter sits on the scan side of the tombstone
      // anti-join, so Catalyst pushes it below the join and the
      // partitioned lists table still prunes to the probed partitions.
      Similarity.ivfSearchLists(
        lists0.filter(col("cent_id").isin(probed: _*)), local, k)
    } else Similarity.ivfSearchLists(lists0, probes0, k)
  }

  /** Index frames resolved ONCE for a serving session ([[ivfSnapshot]] /
    * [[pqSnapshot]]). The fresh-per-call serve paths ([[ivfTopK]] /
    * [[pqAdcTopK]]) re-resolve every index table per call — per
    * MICRO-BATCH in a foreachBatch serve loop, which at cluster scale
    * means an object-store LIST of every lists/codes partition plus a
    * schema read on each batch. A snapshot pays that metadata resolution
    * once and pins the small frozen-geometry frames (centroids /
    * codebook) in the cache.
    *
    * Freshness contract (the trade, stated): appends, deletes, and
    * compaction land at the NEXT snapshot, not the next call — and a
    * compaction or rebuild REPLACES the physical table directories (the
    * store's atomic swap), after which a pre-existing snapshot reads
    * deleted files. Re-snapshot after any maintenance write; call
    * [[IndexSnapshot.release]] when done with one. */
  final case class IndexSnapshot private[functions] (
      private[functions] val small: DataFrame,
      private[functions] val big: DataFrame) {
    /** Unpersist the cached small frame (centroids / codebook). */
    def release(): Unit = { small.unpersist(); () }
  }

  /** Resolve the IVF serve frames once: centroids materialized into the
    * cache (nlist rows, frozen between rebuilds), lists' file metadata
    * resolved now, tombstones as of now folded in. */
  def ivfSnapshot(store: TableStore, prefix: String): IndexSnapshot = {
    val cents = store.load(s"${prefix}_centroids").cache()
    cents.count() // materialize at snapshot time, not in the first batch
    IndexSnapshot(cents,
      minusTombstones(store, prefix, store.load(s"${prefix}_lists")))
  }

  /** [[ivfTopK]] against a pinned [[ivfSnapshot]] — row-identical to the
    * fresh path as of snapshot time (AnnIndexSpec pins it); no store
    * reads besides the snapshot's own frames. */
  def ivfTopK(
      snap: IndexSnapshot,
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int, pruneProbed: Boolean): DataFrame =
    ivfTopKFrames(snap.small, snap.big,
      queries, idCol, vecCol, k, nprobe, pruneProbed)

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

  /** The IVF maintenance drill — [[buildIvf]] on `base`, [[appendIvf]]
    * `batch`, serve `queries` from the appended index — with the §2.6
    * overlaps (the q_kn5_append pattern for the ANN family): the index
    * geometry is frozen at build time from the BASE corpus's stand-in
    * centroids (nlist rows, checkpointed once), so the batch's
    * assignment pass is independent of the build's staged writes and
    * runs concurrently with them; the serve reads the checkpointed
    * centroids, the pre-append lists files (the append only ADDS files)
    * and the staged assignment checkpoint — row-identical to the
    * post-append index — so it runs concurrently with the append
    * commit. Physical build and append unchanged; the shared
    * append == rebuild oracle keeps pinning the result. */
  private[graft] def buildAppendTopKIvf(
      store: TableStore, prefix: String,
      base: DataFrame, batch: DataFrame, idCol: String, vecCol: String,
      nlist: Int, queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val cents = Similarity.ivfCentroids(base, idCol, vecCol, nlist)
      .localCheckpoint()
    val Seq(_, assignedAny) = graft.functions.Jobs.concurrently[Any](Seq(
      () => buildIvfFromFrames(store, prefix, cents,
        Similarity.ivfInvertedLists(base, cents, idCol, vecCol)),
      () => Similarity.ivfInvertedLists(batch, cents, idCol, vecCol)
        .localCheckpoint()))
    val assigned = assignedAny.asInstanceOf[DataFrame]
    val lists2 = minusTombstones(store, prefix,
      store.load(s"${prefix}_lists").unionByName(assigned))
    val Seq(_, servedAny) = graft.functions.Jobs.concurrently[Any](Seq(
      () => { store.append(s"${prefix}_lists", assigned); () },
      () => ivfTopKFrames(cents, lists2, queries, idCol, vecCol, k, nprobe,
        pruneProbed = true).localCheckpoint()))
    assigned.unpersist()
    cents.unpersist()
    servedAny.asInstanceOf[DataFrame]
  }

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

  /** DELETE vectors from the index (GDPR erasure, corpus refresh) without
    * a rebuild: ids land in `<prefix>_tombstones` and every serve path
    * anti-joins them — delete-then-query is row-identical to
    * rebuild-without-deleted (q_knn_ivf_delete pins it) from the moment
    * this returns. The physical lists/codes rows remain until
    * [[compact]] folds the tombstones in; repeated deletes append (the
    * serve anti-join is idempotent in duplicates). One tombstone set
    * covers every index family under the prefix — IVF lists and PQ codes
    * both key by vec_id. */
  def deleteVectors(
      store: TableStore, prefix: String,
      ids: DataFrame, idCol: String): Unit =
    store.append(s"${prefix}_tombstones",
      ids.select(col(idCol).cast("long").as("vec_id")).distinct())

  /** Fold accumulated tombstones into the physical index tables: every
    * `<prefix>_lists` / `<prefix>_codes` table that exists is rewritten
    * without the deleted ids and the tombstone set is emptied — ONE
    * atomic multi-table commit (the store's two-phase overwriteAll: all
    * replacement plans materialize against the pre-compaction snapshots,
    * then swap). Idempotent: a crash after the swap leaves an empty
    * tombstone set; a crash before it leaves the old tables + tombstones,
    * and rerunning converges. Serve results are IDENTICAL before and
    * after (the anti-join merely becomes a no-op) — AnnIndexSpec pins
    * both properties. */
  def compact(store: TableStore, prefix: String): Unit =
    if (store.exists(s"${prefix}_tombstones")) {
      val tomb = store.load(s"${prefix}_tombstones")
      val targets = Seq(s"${prefix}_lists", s"${prefix}_codes")
        .filter(store.exists)
      store.overwriteAll(targets.map { t =>
        t -> store.load(t).join(tomb, Seq("vec_id"), "left_anti")
      } :+ (s"${prefix}_tombstones" ->
        tomb.select(col("vec_id")).limit(0).repartition(1)))
    }

  private def minusTombstones(
      store: TableStore, prefix: String, df: DataFrame): DataFrame =
    if (store.exists(s"${prefix}_tombstones"))
      // Keyed anti-join (AQE broadcasts it when the tombstone set is
      // actually small): the set grows with deletions until compaction,
      // so it is never assumed broadcastable.
      df.join(store.load(s"${prefix}_tombstones"), Seq("vec_id"), "left_anti")
    else df

  /** Build (or rebuild) the PQ index tables from `corpus`. */
  def buildPq(
      store: TableStore, prefix: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int = 8, ksub: Int = 16, trainIters: Int = 0): Unit = {
    // trainIters > 0 trains per-subspace codebooks with that many Lloyd's
    // rounds (Similarity.pqCodebookTrained — better cell fit, higher ADC
    // recall) instead of the deterministic lowest-id stand-in; frozen at
    // build time either way, exactly the buildIvf contract.
    val cb =
      if (trainIters > 0)
        Similarity.pqCodebookTrained(corpus, idCol, vecCol, dims, m, ksub, trainIters)
      else Similarity.pqCodebook(corpus, idCol, vecCol, m, dims / m, ksub)
    store.overwriteAll(Seq(
      s"${prefix}_codebook" -> cb,
      s"${prefix}_codes" ->
        Similarity.pqEncodeWith(corpus, cb, idCol, vecCol, dims, m)))
  }

  /** ADC top-k from the PERSISTED PQ index: reads only
    * `<prefix>_codebook` / `<prefix>_codes` (tombstoned ids excluded;
    * full-precision vectors exist nowhere in the plan — the serving
    * memory footprint is the byte codes). Row-identical to
    * [[Similarity.pqAdcTopK]] over the corpus the index was built from,
    * minus deletions. */
  def pqAdcTopK(
      store: TableStore, prefix: String,
      queries: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int = 8, k: Int = 3): DataFrame =
    Similarity.pqAdcSearch(
      minusTombstones(store, prefix, store.load(s"${prefix}_codes")),
      store.load(s"${prefix}_codebook"),
      queries, idCol, vecCol, dims, m, k)

  /** PQ twin of [[ivfSnapshot]]: codebook cached (m×ksub rows, frozen
    * between rebuilds), codes' metadata resolved now, tombstones as of
    * now folded in. Same freshness contract as [[IndexSnapshot]]. */
  def pqSnapshot(store: TableStore, prefix: String): IndexSnapshot = {
    val cb = store.load(s"${prefix}_codebook").cache()
    cb.count()
    IndexSnapshot(cb,
      minusTombstones(store, prefix, store.load(s"${prefix}_codes")))
  }

  /** [[pqAdcTopK]] against a pinned [[pqSnapshot]]. */
  def pqAdcTopK(
      snap: IndexSnapshot,
      queries: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int, k: Int): DataFrame =
    Similarity.pqAdcSearch(snap.big, snap.small,
      queries, idCol, vecCol, dims, m, k)
}
