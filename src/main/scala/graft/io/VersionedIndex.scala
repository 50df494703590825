package graft.io

import org.apache.spark.sql.SparkSession

/** Versioned-prefix index generations over a [[TableStore]] — the
  * ENFORCED form of the rebuild-under-serve posture the LexIndex /
  * AnnIndex scaladocs previously only documented: a multi-table index
  * swap is sequential (each table's rename is atomic, the SEQUENCE is
  * not), so a rebuild into the serving prefix can pair new postings with
  * old stats under a concurrent serve, and a crash between swaps leaves
  * a mixed-generation index on disk.
  *
  * The fix is the standard pointer-swap discipline:
  *   - Generation `g`'s tables live under prefix `<name>_g<g>` — a
  *     rebuild writes generation g+1's tables under a prefix NO reader
  *     resolves yet, so partial state is inert by construction.
  *   - A one-row MANIFEST table `<name>_manifest` (generation BIGINT)
  *     is the single source of truth for "current", and it is swapped
  *     LAST — one atomic table overwrite (the store's temp-dir rename),
  *     after every table of the new generation is fully on disk.
  *   - Serves resolve the manifest once per snapshot ([[currentPrefix]])
  *     and then read only that generation's files; a rebuild completing
  *     mid-serve cannot retarget an already-resolved snapshot.
  *
  * Crash contract: a crash anywhere before the manifest swap leaves the
  * manifest — and therefore every reader — on the old generation, whose
  * tables are never touched by the build; the partial next-generation
  * tables are garbage to collect, not corruption. A crash during the
  * manifest swap itself is the store's single-table atomicity.
  *
  * Storage contract: old generations are NOT auto-deleted (a pinned
  * snapshot may still be reading one). Call [[prune]] on a maintenance
  * schedule that outlives your longest-lived snapshot.
  */
object VersionedIndex {

  private def manifestTable(name: String): String = s"${name}_manifest"

  /** The published generation, if any index has been published. */
  def currentGeneration(store: TableStore, name: String): Option[Long] =
    if (store.exists(manifestTable(name)))
      Some(store.load(manifestTable(name)).head().getLong(0))
    else None

  /** Prefix of the CURRENT generation's tables — what every serve/snapshot
    * should resolve (fails fast if nothing was ever published). */
  def currentPrefix(store: TableStore, name: String): String =
    s"${name}_g${currentGeneration(store, name).getOrElse(
      throw new IllegalStateException(
        s"no published generation for versioned index '$name' — build one " +
          "with VersionedIndex.rebuild first"))}"

  /** Prefix a generation's tables live under. */
  def prefixOf(name: String, generation: Long): String = s"${name}_g$generation"

  private def claimTable(name: String, generation: Long): String =
    s"${prefixOf(name, generation)}_claim"

  /** The claim's first row, read DEFENSIVELY: an EMPTY or half-written
    * claim table (a writer that created it and crashed before its row
    * landed) reads as claimed-by-an-unknown-writer — generation 0 with no
    * token — never as a raw NoSuchElementException. Token is "" for
    * tokenless claims (pre-token format, or rows whose token is null). */
  private def claimRow(store: TableStore, claim: String): (Long, String) =
    store.load(claim).collect().headOption.map { r =>
      val g = r.getLong(r.fieldIndex("generation"))
      val t =
        if (r.schema.fieldNames.contains("token") &&
          !r.isNullAt(r.fieldIndex("token")))
          r.getString(r.fieldIndex("token"))
        else ""
      (g, t)
    }.getOrElse((0L, ""))

  private def claimError(name: String, gen: Long): IllegalStateException =
    new IllegalStateException(
      s"generation $gen of versioned index '$name' is already claimed " +
        s"(${claimTable(name, gen)} holds a live claim) — a concurrent " +
        "rebuild is running, or a crashed one left partial tables behind; " +
        "verify no writer is live, clean up the " +
        s"${prefixOf(name, gen)}_* tables, then release the claim: drop " +
        s"${claimTable(name, gen)} where the store supports drop, or on " +
        "drop-less backends (e.g. the COPY-transport Postgres store) " +
        "overwrite it with the single released-sentinel row " +
        "(generation = -1)")

  /** Build generation current+1 under its own prefix via `build(prefix)`,
    * then publish it by atomically swapping the manifest — the ONLY write
    * that changes what readers resolve, and the LAST one. Returns the new
    * current prefix. If `build` throws, nothing was published and the old
    * generation serves untouched (the claim marker below stays behind as
    * the crashed build's tombstone).
    *
    * SINGLE-WRITER ENFORCEMENT: rebuild CLAIMS its target generation
    * before building, through [[TableStore.createIfAbsent]] — a true
    * compare-and-swap on backends with an atomic create (Postgres DDL,
    * filesystem rename), so two rebuilds racing the same generation
    * resolve to exactly one builder and one [[claimError]]; without the
    * claim they would interleave table writes into the same g+1 prefix —
    * the mixed-generation state this class exists to prevent ([[publish]]
    * is last-write-wins). Two residual windows, both verified after the
    * fact: (a) on default (check-then-act) createIfAbsent stores and (b)
    * when re-taking a RELEASED (-1 sentinel) claim on a drop-less store,
    * the writer re-reads the claim and proceeds only if it still holds
    * its own token — shrinking any race to the one marker write. Crashed
    * builds leave a live claim behind, so a blind retry fails fast; the
    * error message carries the recovery steps. */
  def rebuild(store: TableStore, name: String, spark: SparkSession)(
      build: String => Unit): String = {
    val gen = currentGeneration(store, name).getOrElse(0L) + 1L
    val claim = claimTable(name, gen)
    val token = java.util.UUID.randomUUID().toString
    import spark.implicits._
    def claimDf = Seq((gen, token)).toDF("generation", "token")
    if (store.exists(claim)) {
      // A live claim (generation >= 0, or an empty/half-written table)
      // belongs to another writer; only the released sentinel (-1) may
      // be re-taken — by overwrite, since the table exists.
      if (claimRow(store, claim)._1 >= 0L) throw claimError(name, gen)
      store.overwrite(claim, claimDf)
    } else if (!store.createIfAbsent(claim, claimDf)) throw claimError(name, gen)
    // Post-claim verification closes the residual windows: proceed only
    // if the claim still carries THIS writer's token.
    val (heldGen, heldToken) = claimRow(store, claim)
    if (heldGen != gen || heldToken != token) throw claimError(name, gen)
    val prefix = prefixOf(name, gen)
    build(prefix)
    publish(store, name, spark, gen)
    // Release: drop where the store supports it; otherwise overwrite with
    // the released sentinel — a post-publish release must never fail on a
    // drop-less backend (e.g. the COPY-transport Postgres store).
    try store.drop(claim)
    catch { case _: UnsupportedOperationException =>
      store.overwrite(claim, Seq((-1L, "")).toDF("generation", "token"))
    }
    prefix
  }

  /** Atomically point the manifest at `generation` (its tables must be
    * fully written). Exposed for staged deployments that build and
    * publish in separate steps — [[rebuild]] composes both. */
  def publish(
      store: TableStore, name: String, spark: SparkSession,
      generation: Long): Unit = {
    import spark.implicits._
    store.overwrite(manifestTable(name), Seq(generation).toDF("generation"))
  }

  /** Drop generations older than current − `keepPrevious`. `tableSuffixes`
    * names the index's tables (e.g. `Seq("postings", "doclens",
    * "lexstats", "tombstones")`); only suffixed tables of PRUNED
    * generations are dropped — the current generation (and `keepPrevious`
    * before it, default 1 for still-pinned snapshots) are never touched. */
  def prune(
      store: TableStore, name: String, tableSuffixes: Seq[String],
      keepPrevious: Int = 1): Unit = {
    require(keepPrevious >= 0, s"keepPrevious must be >= 0, got $keepPrevious")
    val cur = currentGeneration(store, name).getOrElse(return)
    // Walk DOWN from the newest prunable generation and stop at the first
    // fully-absent one: generations are pruned oldest-first, so everything
    // below an absent generation was already dropped by an earlier prune —
    // without the stop, maintenance cost would grow linearly with lifetime
    // rebuild count even when there is nothing left to drop.
    ((cur - keepPrevious - 1) to 1L by -1L).iterator
      .map { g => tableSuffixes.map(s => s"${prefixOf(name, g)}_$s")
        .filter(store.exists) }
      .takeWhile(_.nonEmpty)
      .foreach(_.foreach(store.drop))
  }
}
