package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operator family for training-data pipelines: exact,
  * MinHash+LSH, n-gram Jaccard, SimHash (SURVEY.md §7.6).
  *
  * All hashing is md5-based (identical lowercase-hex semantics in Spark and
  * the DuckDB oracle), and minhashes are min-of-hex-strings — a uniform
  * ordering, so lexicographic min is a valid minhash without any bigint
  * conversion.
  *
  * Scale notes (100 TB):
  *   - exact dedup shuffles once by content hash — embarrassingly scalable.
  *   - minhash signatures are one groupBy(doc) over exploded shingles;
  *     LSH banding turns candidate generation into an equi-join on
  *     (band, key) — never all-pairs.
  *   - the Jaccard verifier joins on shingle; a document-frequency cap
  *     (`dfCap`) drops stop-shingles to bound the worst bucket (skew guard);
  *     AQE skew-join handles residual imbalance.
  */
object Dedup {

  /** Exact dedup on normalized content (lower + collapsed whitespace).
    * Survivor = min doc id per content hash. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    df.select(col(idCol), md5(norm).as("text_hash"))
      .withColumn("survivor_id", min(col(idCol)).over(Window.partitionBy("text_hash")))
      .withColumn("is_duplicate", col(idCol) =!= col("survivor_id"))
  }

  /** Exact dedup with a survivor POLICY: within each content-hash family
    * the surviving row is the first by (priority asc, id asc) — e.g. prefer
    * a curated source over a crawl dump when collapsing duplicates, rather
    * than `exact`'s arbitrary min-id. Same single hash shuffle. */
  def exactWithPolicy(
      df: DataFrame, idCol: String, textCol: String, priorityCol: String): DataFrame = {
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    val w = Window.partitionBy("text_hash")
      .orderBy(col(priorityCol).asc, col(idCol).asc)
    df.select(col(idCol), col(priorityCol), md5(norm).as("text_hash"))
      .withColumn("survivor_id", first(col(idCol)).over(w))
      .withColumn("is_duplicate", col(idCol) =!= col("survivor_id"))
  }

  /** Distinct word n-gram shingles per document (delegates to the one
    * definition in [[TextAnalysis.shingleSets]] so the distinct-shingle
    * contract lives in a single place). */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    TextAnalysis.shingleSets(df, idCol, textCol, n)

  /** MinHash signatures: k independent permutations simulated by
    * min(md5("seed:shingle")). Documents shorter than one shingle fall back
    * to hashing the whole text. */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String, n: Int = 4, k: Int = 8): DataFrame = {
    val sh = shingleSets(df, idCol, textCol, n)
    val aggs = (0 until k).map(i =>
      min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"sig_$i"))
    val sigs = sh.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
    val fallbacks = (0 until k).map(i =>
      coalesce(col(s"sig_$i"), md5(concat(lit(s"$i:"), col(textCol)))).as(s"sig_$i"))
    df.select(col(idCol), col(textCol)).join(sigs, Seq(idCol), "left")
      .select(col(idCol) +: fallbacks: _*)
  }

  /** LSH banding over the minhash signature: band key = md5(sig_a||sig_b);
    * two documents are candidates iff they share ANY band bucket. Returns
    * distinct candidate pairs (id_a < id_b).
    *
    * Plan shape: the signature row EXPLODES into its `bands` (band, bkey)
    * rows in one pass (no per-band union), and pairs are expanded
    * bucket-locally from one groupBy (no self-join) — so the expensive
    * shingle→minhash subtree is evaluated exactly ONCE, with no cache needed.
    * Bucket cardinality ~ near-dup family size for CONTENT-driven buckets.
    *
    * `bucketCap` (0 = off) is [[jaccardPairs]]' dfCap twin for the band
    * join, guarding the OTHER degenerate bucket shape: corpus-wide
    * boilerplate (a footer/cookie sentence on a third of all pages) makes
    * every affected document's per-hash minimum collapse to the SAME
    * shared-shingle minimum with probability ~(shared/total shingles), so
    * one (band, bkey) bucket holds an O(corpus) crowd and its bucket-local
    * pair expansion is quadratic — measured: a 14-word sentence planted on
    * 30% of a 5M-doc corpus put ~70k docs in one bucket per band (~10¹⁰
    * candidate pairs; the ×100 hot-band bench ran 25+ min before being
    * killed where the uniform corpus takes ~20 s). Buckets larger than
    * `bucketCap` are STOP BANDS and are dropped whole: a crowd that large
    * is necessarily boilerplate-keyed (a true near-dup family of that size
    * is the leader-clustering regime — [[nearDupLeadersLsh]]), its
    * within-bucket pairs overlap mostly on the shared boilerplate (far
    * below any useful threshold), and a genuine near-dup pair caught in a
    * stop band still collides in each remaining band with probability j^r
    * — miss probability (1-j^r)^(b-s) for s stop bands, the same
    * recall algebra the banding already accepts (exact duplicates stay
    * guaranteed via [[nearDupPairsLsh]]'s content-hash floor).
    * The uncapped form (cap 0) remains the exactness witness
    * (q_dedup_lsh_pairs pins it). */
  def lshCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 4, k: Int = 8, bands: Int = 4, bucketCap: Int = 0): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol, n, k)
    val rowsPerBand = k / bands
    val bandStructs = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat(parts: _*)).as("bkey"))
    }
    val banded = sigs
      .select(col(idCol), explode(array(bandStructs: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val buckets = banded.groupBy("band", "bkey")
      .agg(collect_set(col(idCol)).as("ids"))
      .filter(size(col("ids")) > 1)
    val kept =
      if (bucketCap > 0) buckets.filter(size(col("ids")) <= bucketCap)
      else buckets
    kept
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(filter(col("ids"), x => x > col("id_a"))).as("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard near-dup pairs via inverted shingle index:
    * pairs sharing >= 1 shingle, jaccard = |inter| / |union| >= threshold.
    * `dfCap` (0 = off) drops shingles present in more than dfCap documents
    * from the index — the candidate set loses only pairs whose ONLY overlap
    * is stop-shingles (which can't reach a meaningful threshold anyway) and
    * the join's worst bucket is bounded. */
  /** Exact inverted-index pair intersection: (id_a < id_b, inter, n_a,
    * n_b) for every pair sharing >= 1 shingle — the shared core of the
    * set-similarity family (jaccard and containment scoring both divide
    * these same counts). */
  private[functions] def pairIntersectionSizes(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // The shingle frame feeds THREE consumers below (both self-join
    // sides + the per-doc sizes): as a lazy plan each reference re-ran
    // the scan + explode (guide §5 — localCheckpoint the shared base of
    // a multi-reference subtree; runtime exchange reuse does not cover
    // the pre-exchange explode work). One materialization, three
    // checkpoint scans; lifetime = session (the caller returns a lazy
    // frame, so no unpersist point exists — the same contract as the
    // shared fingerprint/score checkpoints).
    val sh = shingleSets(df, idCol, textCol, n).localCheckpoint()
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
    sh.select(col(idCol).as("id_a"), col("shingle"))
      .join(sh.select(col(idCol).as("id_b"), col("shingle")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
  }

  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 4, threshold: Double = 0.8, dfCap: Int = 0): DataFrame = {
    val withSizes =
      if (dfCap <= 0) {
        // Single-pass exact path: inverted-index self-join on every shingle.
        pairIntersectionSizes(df, idCol, textCol, n)
      } else {
        // Skew-guarded path: stop-shingles (document frequency > dfCap)
        // are dropped ONLY for candidate generation — bounding the join's
        // worst bucket. The EXACT intersection decomposes as
        //   inter = |shared capped shingles| + |shared stop-shingles|,
        // so the capped self-join's own per-pair match count (a groupBy on
        // the join output — no distinct pass) gives the first term, and a
        // pair-keyed join against only the tiny per-doc stop-shingle sets
        // gives the second. This replaces the previous candidates →
        // distinct → re-join-FULL-shingle-sets pipeline whose
        // pairs × shingles-per-doc intermediate dominated ×100-scale cost
        // (measured 1.6× the linear floor; the decomposition restores
        // volume ∝ candidate pairs). A pair whose every shared shingle is
        // a stop-shingle is still lost — same recall contract.
        // The df-annotated shingle frame feeds FIVE consumers (capped
        // self-join ×2, stop joins ×2, per-doc sizes): checkpoint it
        // once so each reads materialized blocks instead of re-running
        // scan + explode + the df window (guide §5; the plan previously
        // evaluated the window subtree four times — 0 ReusedExchange in
        // the dump). Sizes derive from the same frame (row set
        // identical to the raw shingle frame; `df` is just ignored).
        val withDf = shingleSets(df, idCol, textCol, n)
          .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
          .localCheckpoint()
        val sizes = withDf.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
        val capped = withDf.filter(col("df") <= dfCap).drop("df")
        val stop = withDf.filter(col("df") > dfCap).drop("df")
        val interCapped = capped.select(col(idCol).as("id_a"), col("shingle"))
          .join(capped.select(col(idCol).as("id_b"), col("shingle")), Seq("shingle"))
          .filter(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter_c"))
        val interStop = interCapped.select("id_a", "id_b")
          .join(stop.select(col(idCol).as("id_a"), col("shingle")), Seq("id_a"))
          .join(stop.select(col(idCol).as("id_b"), col("shingle")), Seq("id_b", "shingle"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter_s"))
        interCapped
          .join(interStop, Seq("id_a", "id_b"), "left")
          .withColumn("inter", col("inter_c") + coalesce(col("inter_s"), lit(0L)))
          .drop("inter_c", "inter_s")
          .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
          .join(sizes.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      }
    withSizes
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** EXACT Jaccard near-dup pairs via prefix filtering (the AllPairs /
    * PPJoin candidate principle): impose one global token order — document
    * frequency ASC, then shingle (rarest first, the classic heuristic that
    * keeps candidate buckets small) — and index each document by only the
    * FIRST ℓ = |d| - ceil(t·|d|) + 1 of its tokens. Any pair with
    * J ≥ t must (i) pass the size filter t·max(|A|,|B|) ≤ min(|A|,|B|) and
    * (ii) share a prefix token [Xiao et al., PPJoin, Lemma 1 with
    * α = ceil(t·max) ≤ ceil(t·|X|) per side — our per-set prefixes are at
    * least as long as the lemma requires], so joining prefixes alone finds
    * EVERY qualifying pair: the exact answer of [[jaccardPairs]] at a
    * fraction of the index size, with none of [[lshCandidatePairs]]'s
    * false negatives. Candidates are then exact-verified on the full sets
    * (same verify tail as jaccardPairs' guarded path).
    *
    * Cost at scale: two window passes over the (id, shingle) frame (df +
    * per-doc rank — both keyed shuffles), a self-join on the ~(1-t)
    * fraction of tokens that land in prefixes, and the verify join on the
    * (small) candidate set. At t = 0.8 the prefix index is ~20% of the full
    * inverted index, and rarest-first ordering puts exactly the
    * low-frequency tokens there — the worst join bucket shrinks on both
    * counts. */
  def jaccardPrefixFilterPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 4, threshold: Double = 0.8): DataFrame = {
    // The three-window ranked frame feeds FIVE consumers (prefix
    // self-join ×2, verify joins ×2 via its shingle projection, sizes):
    // checkpoint once (guide §5 — each lazy reference re-ran the scan +
    // explode + all three window passes).
    val ranked = shingleSets(df, idCol, textCol, n)
      .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(idCol)))
      .withColumn("ord", row_number().over(
        Window.partitionBy(idCol).orderBy(col("df"), col("shingle"))))
      .localCheckpoint()
    val sh = ranked.select(col(idCol), col("shingle"))
    val prefix = ranked.filter(
      col("ord") <= col("sz") - ceil(col("sz") * threshold) + 1)
    val cand = prefix.select(col(idCol).as("id_a"), col("shingle"), col("sz").as("sz_a"))
      .join(prefix.select(col(idCol).as("id_b"), col("shingle"), col("sz").as("sz_b")),
        Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .filter(least(col("sz_a"), col("sz_b")).cast("double") >=
        greatest(col("sz_a"), col("sz_b")).cast("double") * threshold)
      .select("id_a", "id_b").distinct()
    val sizes = ranked.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
    cand
      .join(sh.select(col(idCol).as("id_a"), col("shingle")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** All exact-duplicate pairs (identical normalized content): one groupBy on
    * the content hash, pairs expanded bucket-locally. Linear in corpus size —
    * the cheap deterministic floor under any sketch-based candidate
    * generator. */
  def exactDupPairs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    df.select(col(idCol), md5(norm).as("__h"))
      .groupBy("__h").agg(collect_set(col(idCol)).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(filter(col("ids"), x => x > col("id_a"))).as("id_b"))
  }

  /** Production near-dup pair generator — the 100 TB path: candidates come
    * from LSH band collisions (linear-ish: one signature pass + an equi-join
    * on band keys) UNIONed with the exact content-hash pairs, and the exact
    * jaccard is computed ONLY for that candidate sliver — never for the full
    * corpus cross-section that an inverted-index join generates.
    *
    * Recall contract: identical documents have identical signatures, so
    * exact duplicates are guaranteed candidates twice over (banding AND the
    * content-hash floor). A borderline pair (jaccard j >= threshold) is
    * missed with probability (1 - j^r)^b per pair (r = k/bands rows per
    * band) — at the default 4x2 configuration and j = 0.875 that is ~0.3%,
    * shrinking fast as j -> 1; raise `bands` (more, narrower bands) to trade
    * candidate-verify work for recall. With `bucketCap` > 0 (the stop-band
    * guard — see [[lshCandidatePairs]]), a pair whose collisions all fell
    * in stop bands is also missed: the same algebra over b - s bands —
    * while exact duplicates remain guaranteed by the content-hash floor
    * regardless of banding (DedupStressSpec pins both properties on a
    * hot-band corpus). The uncapped `jaccardPairs` remains
    * the exactness witness (q_dedup_jaccard) pinning this generator's output
    * on the test corpora.
    *
    * Shingles/sizes are re-referenced by the verify join; the shingle
    * subtree's exchange is reused across references (ReusedExchange), so the
    * expensive shingle generation is evaluated once. Docs shorter than one
    * shingle never verify (empty shingle set => no exact-jaccard row) —
    * identical short docs are still reported via the content-hash floor only
    * if they shingle; this matches the exact-jaccard semantics the oracle
    * computes. */
  def nearDupPairsLsh(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 4, threshold: Double = 0.8, k: Int = 8, bands: Int = 4,
      bucketCap: Int = 0): DataFrame = {
    val sh = shingleSets(df, idCol, textCol, n)
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
    val cand = lshCandidatePairs(df, idCol, textCol, n, k, bands, bucketCap)
      .unionByName(exactDupPairs(df, idCol, textCol))
      .distinct()
    val a = sh.select(col(idCol).as("id_a"), col("shingle"))
    val b = sh.select(col(idCol).as("id_b"), col("shingle"))
    cand.join(a, Seq("id_a"))
      .join(b, Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Leader-clustering text near-dup — the linear-output sibling of
    * [[nearDupPairsLsh]] for corpora with DENSE near-duplicate families
    * (boilerplate farms, template spam), where the all-pairs answer is
    * itself quadratic: a family of 1M near-identical pages is 5·10¹¹
    * pairs nobody wants materialized. Within every LSH band bucket AND
    * every exact-content-hash group, the lowest-id document is the
    * LEADER; each member is exact-jaccard-verified against its leaders
    * ONLY. Candidate volume ≤ (bands + 1) rows per document — linear by
    * construction — and the verify join's volume is candidates ×
    * shingles-per-doc, also linear. Canopy discipline (same trade as
    * [[Similarity.embeddingDedupLeaders]]): member-member chains that
    * both miss their shared leader are not reported. Emits one row per
    * verified (member, leader) pair: (doc_id, leader_id, jaccard ≥
    * threshold); survivors = corpus anti-join on doc_id. Deterministic
    * (leader = min id) — the DuckDB oracle pins it exactly. */
  def nearDupLeadersLsh(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 4, threshold: Double = 0.8, k: Int = 8, bands: Int = 4): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol, n, k)
    val rowsPerBand = k / bands
    val bandStructs = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat(parts: _*)).as("bkey"))
    }
    val banded = sigs.select(col(idCol), explode(array(bandStructs: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val bandLeaders = banded.groupBy("band", "bkey")
      .agg(min(col(idCol)).as("leader_id"))
    val bandCand = banded.join(bandLeaders, Seq("band", "bkey"))
      .filter(col(idCol) =!= col("leader_id"))
      .select(col("leader_id").as("id_a"), col(idCol).as("id_b"))
    // Content-hash floor: identical docs face their hash-group leader
    // independent of banding (mirrors nearDupPairsLsh's floor). Scope
    // caveat shared with that floor and the oracle: a doc shorter than one
    // n-shingle has an EMPTY shingle set, so its hash candidates fall out
    // of the verify join — identical sub-shingle-length docs are not
    // reported by either path (route such rows through Dedup.exact, whose
    // hash dedup has no length floor).
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    val hashed = df.select(col(idCol), md5(norm).as("__h"))
    val hashLeaders = hashed.groupBy("__h").agg(min(col(idCol)).as("leader_id"))
    val hashCand = hashed.join(hashLeaders, Seq("__h"))
      .filter(col(idCol) =!= col("leader_id"))
      .select(col("leader_id").as("id_a"), col(idCol).as("id_b"))
    val cand = bandCand.unionByName(hashCand).distinct()
    val sh = shingleSets(df, idCol, textCol, n)
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
    cand.join(sh.select(col(idCol).as("id_a"), col("shingle")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_b").as("doc_id"), col("id_a").as("leader_id"), col("jaccard"))
  }

  /** Incremental NEAR-dup: candidate pairs between a new `batch` and an
    * existing `corpus` (jaccard >= threshold) — the daily-ingest sibling of
    * [[incrementalDedup]] for near-duplicates. The batch's band keys and
    * shingle sets are small and BROADCAST; the corpus pays one signature
    * pass for candidate generation (at production scale the corpus band
    * index is precomputed at ingest and persisted, leaving zero corpus
    * passes) and shingle-verifies ONLY the docs that collide in a band.
    * Exact cross-duplicates are guaranteed by a content-hash floor; the
    * recall contract for borderline pairs is the same (1-j^r)^b bound as
    * [[nearDupPairsLsh]].
    *
    * Returns (id_a = corpus id, id_b = batch id, jaccard) — callers drop or
    * keep batch rows by policy. Assumes batch and corpus ids are disjoint.
    */
  def incrementalNearDupPairs(
      batch: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String,
      n: Int = 4, threshold: Double = 0.8, k: Int = 8, bands: Int = 4): DataFrame = {
    def banded(df: DataFrame) = {
      val sigs = minhashSignatures(df, idCol, textCol, n, k)
      val rowsPerBand = k / bands
      val bandStructs = (0 until bands).map { b =>
        val parts = (0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}"))
        struct(lit(b).as("band"), md5(concat(parts: _*)).as("bkey"))
      }
      sigs.select(col(idCol), explode(array(bandStructs: _*)).as("bb"))
        .select(col(idCol), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    }
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    def hashed(df: DataFrame) = df.select(col(idCol), md5(norm).as("__h"))
    // Band collisions: corpus streams, batch bands broadcast.
    val lshCand = banded(corpus).join(
        broadcast(banded(batch).select(col(idCol).as("id_b"), col("band"), col("bkey"))),
        Seq("band", "bkey"))
      .select(col(idCol).as("id_a"), col("id_b"))
    // Exact-duplicate floor: identical normalized content always pairs.
    val exactCand = hashed(corpus).join(
        broadcast(hashed(batch).select(col(idCol).as("id_b"), col("__h"))), Seq("__h"))
      .select(col(idCol).as("id_a"), col("id_b"))
    val cand = lshCand.unionByName(exactCand).distinct()
    // Exact verify against the FULL corpus shingle frame: its plan is
    // identical to the signature pass's shingle subtree, so Spark reuses
    // that exchange and the corpus is shingled exactly once in-session (a
    // semi-join prune here would break the reuse and shingle the corpus a
    // second time; with a PRECOMPUTED sig index — the production setup —
    // flip to pruning, since the verify pass is then the only shingler).
    val shA = shingleSets(corpus, idCol, textCol, n)
      .select(col(idCol).as("id_a"), col("shingle"))
    val shB = shingleSets(batch, idCol, textCol, n)
      .select(col(idCol).as("id_b"), col("shingle"))
    val sizesA = shA.groupBy("id_a").agg(count(lit(1)).as("n_a"))
    val sizesB = shB.groupBy("id_b").agg(count(lit(1)).as("n_b"))
    cand.join(shA, Seq("id_a"))
      .join(broadcast(shB), Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(sizesA, Seq("id_a"))
      .join(broadcast(sizesB), Seq("id_b"))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Transitive near-duplicate clusters: connected components over the
    * candidate-pair graph by iterative min-label propagation. Pairs tell you
    * A~B and B~C; survivor selection needs the A,B,C cluster — this labels
    * every node with the minimum reachable id in `iterations` rounds
    * (iterations >= graph diameter; near-dup clusters are tiny, so a small
    * fixed count converges and stays engine-deterministic — the same loop
    * unrolls as oracle SQL).
    *
    * Scale: each round is one equi-join + groupBy-min — the standard
    * large-graph label propagation shape (no driver-side union-find).
    */
  def clusterLabels(
      nodes: DataFrame, idCol: String, pairs: DataFrame, iterations: Int = 5): DataFrame = {
    // Iterative plans MUST truncate lineage: without it each round re-expands
    // the full pair-generation subtree AND the prior rounds' joins, growing
    // the plan multiplicatively (and the optimizer/DAG cost with it). The
    // expensive pair generation is materialized ONCE (checkpointing the
    // union of two projections of `pairs` instead would still evaluate the
    // subtree twice — measured 2x); every round's labels are
    // localCheckpoint'ed (eager), so round i's plan is one join + one
    // aggregate over materialized inputs — constant size. On a real cluster,
    // swap localCheckpoint for reliable checkpoint() if executor loss during
    // the loop must be survivable.
    val p = pairs.select("id_a", "id_b").localCheckpoint()
    val edges = p.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(p.select(col("id_b").as("src"), col("id_a").as("dst")))
    var labels = nodes.select(col(idCol), col(idCol).as("cluster_id")).localCheckpoint()
    var round = 0
    var converged = false
    while (round < iterations && !converged) {
      val nbrMin = edges
        .join(labels.select(col(idCol).as("dst"), col("cluster_id").as("dst_label")), Seq("dst"))
        .groupBy(col("src").as(idCol))
        .agg(min(col("dst_label")).as("nbr_min"))
      val next = labels.join(nbrMin, Seq(idCol), "left")
        .select(col(idCol),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id"))).as("cluster_id"))
        .localCheckpoint()
      // Early exit on fixpoint: a converged round is the identity, so
      // skipping the remaining rounds returns the same labels as running
      // them (the unrolled oracle SQL always runs all rounds — identical
      // result) while sparing useless full passes over the label table.
      converged = next
        .join(labels.select(col(idCol), col("cluster_id").as("prev")), Seq(idCol))
        .filter(col("cluster_id") =!= col("prev"))
        .isEmpty
      labels = next
      round += 1
    }
    labels
  }

  /** Asymmetric containment dedup: containment(A in B) = |A∩B| / |A| —
    * catches a document fully (or mostly) EMBEDDED in a larger one
    * (quotes, mirrored sections, doc+appendix re-posts), which symmetric
    * jaccard misses: a 50-shingle doc inside a 1000-shingle doc has
    * jaccard ≈ 0.05 but containment 1.0. Emits one directed row
    * (id_small-side = the contained doc) per pair with containment >=
    * threshold; `inter` via the same inverted-index equi-join as the
    * jaccard family (a dfCap is deliberately NOT applied here — the
    * contract is exactness; compose with LSH candidates for the capped
    * production path, as guardedPairs does for jaccard). */
  def containmentPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 4, threshold: Double = 0.9): DataFrame = {
    // direct each qualifying pair: the SMALLER shingle set is the
    // contained side (ties -> id_a, deterministic)
    pairIntersectionSizes(df, idCol, textCol, n)
      .withColumn("contained_id",
        when(col("n_a") <= col("n_b"), col("id_a")).otherwise(col("id_b")))
      .withColumn("container_id",
        when(col("n_a") <= col("n_b"), col("id_b")).otherwise(col("id_a")))
      .withColumn("containment",
        round(col("inter").cast("double") /
          least(col("n_a"), col("n_b")).cast("double"), 6))
      .filter(col("containment") >= threshold)
      .select(col("contained_id"), col("container_id"), col("containment"))
  }

  /** Best-representative near-dup survivorship: within each near-dup
    * cluster keep the HIGHEST-quality copy (ties → lowest id), not the
    * arbitrary min-id one — the policy real curation wants when crawl
    * copies differ in truncation/mojibake/boilerplate. Same scale-safe
    * `max(struct(quality, -id))` argmax as the similarity family (a
    * partial-aggregable groupBy, not a cluster-wide window sort).
    * Quality must be integral (cast long) so the tie-break is total and
    * engine-independent. */
  def bestRepresentative(
      nodes: DataFrame, idCol: String, qualityCol: String,
      pairs: DataFrame, iterations: Int = 5): DataFrame = {
    val labels = clusterLabels(nodes.select(col(idCol)), idCol, pairs, iterations)
    val q = nodes.select(col(idCol), col(qualityCol).cast("long").as("__q"))
    val best = labels.join(q, idCol)
      .groupBy("cluster_id")
      .agg(max(struct(col("__q"), (-col(idCol)).as("neg_id"))).as("b"))
      .select(col("cluster_id"), (-col("b.neg_id")).as("survivor_id"))
    labels.join(best, "cluster_id")
      .select(col(idCol), col("cluster_id"), col("survivor_id"),
        (col(idCol) === col("survivor_id")).as("is_kept"))
  }

  /** Train/valid split leakage audit: a holdout document is LEAKED when a
    * near-duplicate of it sits in the training split — its eval loss then
    * measures memorization, not generalization. Joins the near-dup pair
    * frame against the deterministic content-hash split (same
    * `md5(text) < prefix` rule as `holdoutSplitCounts`, so the split never
    * migrates as the corpus grows) and reports every holdout document with
    * its cross-split neighbor count. Decontaminating the eval set = drop
    * rows where `is_leaked`.
    *
    * Scale: the split is a narrow projection (no shuffle); the pair frame
    * is the production LSH output (linear-ish); the audit itself is two
    * id-keyed joins + one aggregation on pair cardinality, all tiny
    * relative to pair generation. */
  def splitLeakage(
      df: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, validHexPrefixBelow: String): DataFrame = {
    val split = df.select(col(idCol),
      (substring(md5(col(textCol)), 1, 2) < validHexPrefixBelow).as("is_valid"))
    val p = pairs.select(col("id_a"), col("id_b"))
      .join(split.select(col(idCol).as("id_a"), col("is_valid").as("va")), "id_a")
      .join(split.select(col(idCol).as("id_b"), col("is_valid").as("vb")), "id_b")
      .filter(col("va") =!= col("vb"))
    val leaked = p
      .select(when(col("va"), col("id_a")).otherwise(col("id_b")).as(idCol))
      .groupBy(idCol).agg(count(lit(1)).cast("long").as("n_train_neighbors"))
    split.filter(col("is_valid"))
      .join(leaked, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_train_neighbors"), lit(0L)).as("n_train_neighbors"),
        col("n_train_neighbors").isNotNull.as("is_leaked"))
  }

  /** Duplicate-aware sampling weights from the near-dup clustering:
    * `sample_weight = 1 / cluster_size`, so each duplicate FAMILY
    * contributes unit mass to downstream sampling / loss weighting instead
    * of being over-represented in proportion to how often it was crawled —
    * the standard correction applied after near-dedup when outright
    * dropping duplicates is too aggressive. One groupBy on cluster id +
    * one keyed join beyond clusterLabels' own cost. */
  def clusterWeights(
      nodes: DataFrame, idCol: String, pairs: DataFrame,
      iterations: Int = 5): DataFrame = {
    val labels = clusterLabels(nodes, idCol, pairs, iterations)
    val sizes = labels.groupBy("cluster_id")
      .agg(count(lit(1)).cast("long").as("cluster_size"))
    labels.join(sizes, "cluster_id")
      .select(col(idCol), col("cluster_id"), col("cluster_size"),
        round(lit(1.0) / col("cluster_size").cast("double"), 6)
          .as("sample_weight"))
  }

  /** Hard-negative pair mining for contrastive / metric training: exact
    * jaccard pairs in a similarity BAND [lo, hi) — related enough to be
    * confusable, but below the duplicate threshold. These near-misses are
    * the pairs an embedding model must learn to separate; random negatives
    * are trivially far.
    *
    * Candidate generation is the DF-CAPPED inverted index ([[jaccardPairs]]
    * with `dfCap` > 0): shingles present in more than `dfCap` documents are
    * dropped from the index before the self-join, bounding the worst join
    * bucket to dfCap·(dfCap−1)/2 pairs. At a low `lo` floor this is the
    * difference between a linear-ish pass and a quadratic stop-shingle
    * blowup — a shingle shared by 1M documents would otherwise expand to
    * 5·10¹¹ candidate rows on one key. MinHash-LSH banding is NOT a usable
    * candidate source here: a band catches a pair with probability
    * ≈ 1−(1−j^r)^b, which at j near `lo` = 0.01 is essentially zero for any
    * affordable (r, b) — the low-similarity band is exactly the regime LSH
    * is designed to discard.
    *
    * Recall contract: a pair is lost only when EVERY shared shingle exceeds
    * `dfCap` — such pairs overlap solely on corpus-wide boilerplate and make
    * degenerate training negatives (both members look like every other
    * document). Corpora smaller than `dfCap` documents (every test SF here)
    * cannot hit the cap, so the exact SQL oracle pins this generator
    * bit-for-bit at verification scale; PlanQualitySpec gates the capped
    * plan shape. */
  def nearMissPairs(
      df: DataFrame, idCol: String, textCol: String, n: Int,
      lo: Double, hi: Double, dfCap: Int = 1000): DataFrame = {
    require(dfCap > 0, "nearMissPairs requires a positive dfCap — the " +
      "uncapped inverted index is quadratic on stop-shingles at a low floor" +
      " (use jaccardPairs(dfCap = 0) explicitly as an exactness witness)")
    jaccardPairs(df, idCol, textCol, n, threshold = lo, dfCap = dfCap)
      .filter(col("jaccard") < hi)
  }

  /** Duplicate-cluster size histogram — the one-glance dedup health report
    * (how much of the corpus sits in families of size 1, 2, 100?): cluster
    * size → number of clusters of that size. Two partial-aggregable
    * groupBys over the label frame; output cardinality = distinct family
    * sizes (tiny at any corpus scale). */
  def clusterSizeHistogram(
      nodes: DataFrame, idCol: String, pairs: DataFrame,
      iterations: Int = 5): DataFrame =
    clusterLabels(nodes, idCol, pairs, iterations)
      .groupBy("cluster_id")
      .agg(count(lit(1)).cast("long").as("cluster_size"))
      .groupBy("cluster_size")
      .agg(count(lit(1)).cast("long").as("n_clusters"))

  /** Incremental exact dedup of a new batch against an existing corpus —
    * the daily-ingest shape at 100 TB: you cannot join every new batch
    * against the full history, so a Bloom filter of the history's content
    * hashes (built once, a few bytes per document) is broadcast and prunes
    * the batch down to POSSIBLE duplicates; only that sliver pays the exact
    * verification join. No false negatives (Bloom guarantees), and false
    * positives are removed by the exact join — so the result is exactly
    * `newDocs ANTI JOIN corpus ON content-hash`, verifiable by a plain
    * anti-join oracle while the plan never shuffles the history.
    *
    * Returns the surviving (non-duplicate) rows of `newDocs`.
    */
  def incrementalDedup(
      newDocs: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String,
      expectedCorpusItems: Long, fpp: Double = 0.01): DataFrame = {
    def hashed(df: DataFrame) = {
      val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
      df.withColumn("__h", md5(norm))
    }
    val corpusH = hashed(corpus).select(col("__h"))
    // Spark's bloomFilter aggregate NPEs on an empty frame; an empty history
    // also simply means nothing can be a duplicate. (isEmpty is a limit-1
    // probe, not a history pass.)
    if (corpusH.isEmpty) return newDocs
    val bloom = corpusH.stat.bloomFilter("__h", math.max(expectedCorpusItems, 1L), fpp)
    val batchH = hashed(newDocs)
    // Post-Bloom sliver: the only batch hashes that can possibly be
    // duplicates (true dups + fpp false positives) — small by construction,
    // so it BROADCASTS. The probe is a native codegen'd Expression (runs
    // once per batch row — a UDF here would break whole-stage codegen on
    // the big side).
    val sliver = batchH.filter(BloomMightContain.probe(col("__h"), bloom))
      .select(col("__h")).distinct()
    // Exact verify: stream the history ONCE through a broadcast semi join.
    // The history side carries NO Exchange — at 100 TB the corpus is never
    // shuffled (and never distinct'ed); only sliver-sized frames move. Two
    // full history passes total: the Bloom build and this verify (at
    // production scale the Bloom is built once at ingest and persisted,
    // leaving one).
    val confirmed = corpusH.join(broadcast(sliver), Seq("__h"), "left_semi").distinct()
    batchH.join(broadcast(confirmed), Seq("__h"), "left_anti").drop("__h")
  }

  /** SimHash near-duplicate pairs with an EXACT banding guarantee: the
    * 32-bit simhash splits into `maxHamming + 1` disjoint bands — two
    * hashes within hamming distance `maxHamming` can differ in at most
    * `maxHamming` bands, so by pigeonhole they AGREE on at least one —
    * banded candidate generation provably finds every qualifying pair
    * (unlike MinHash-LSH, whose recall is probabilistic). Using the FEWEST
    * bands the guarantee allows keeps each band as wide (selective) as
    * possible: maxHamming=1 gives 2x16-bit bands (65k-value keys, tiny
    * buckets), maxHamming=3 gives 4x8-bit. Candidates equi-join on
    * (band, key) with bucket-local pair expansion (no self-join); the
    * exact hamming verify (bit_count of xor) runs only on collisions.
    *
    * Scale: one simhash pass + a (maxHamming+1)x explode + a keyed
    * groupBy — linear-ish; a degenerate band bucket (e.g. thousands of
    * identical docs) expands quadratically, which is intrinsic to the
    * answer size at maxHamming=0.
    */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame =
    simhashPairsFrom(simhash(df, idCol, textCol), idCol, maxHamming)

  /** [[simhashPairs]] over an ALREADY-COMPUTED [[simhash]] frame — the
    * banding half alone, so several consumers of one corpus's 32-bit
    * fingerprints (the per-doc profile, the pair screen, the ensemble's
    * lexical arm) can share ONE fingerprint pass. */
  def simhashPairsFrom(
      hashes: DataFrame, idCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      s"bands need >= 2 bits each for selectivity; got maxHamming=$maxHamming")
    hammingPairs(hashes, idCol, "simhash",
      bits = 32, maxHamming = maxHamming)
  }

  /** Exact hamming-distance-≤k pair recall over any `bits`-wide hash
    * column, by pigeonhole banding: the hash splits into k+1 contiguous
    * bit bands, and two hashes within hamming k MUST agree exactly on at
    * least one band (k flipped bits cannot touch all k+1 bands) — so the
    * candidate join is a (band, band-key) equi-group, never all-pairs,
    * and the in-bucket verify (`bit_count(xor)`) makes the recall EXACT.
    * The shared banding core of [[simhashPairs]] (32-bit text SimHash)
    * and [[Multimodal.perceptualDupPairs]] (64-bit image dHash).
    * Selectivity scales with band width `bits/(k+1)`: keep k well under
    * bits/2 or the bands degenerate to near-empty keys and every bucket
    * is the whole corpus.
    *
    * `extraKeys` columns join the band group key (and lead the output):
    * rows differing on any of them are never candidates — the
    * per-population segregation [[Multimodal.checksumDupPairs]] needs so
    * one population's hash family (e.g. 32-bit stubs, upper bits all
    * zero) can't saturate another population's bands into one degenerate
    * corpus-wide bucket. */
  def hammingPairs(
      hashes: DataFrame, idCol: String, hashCol: String,
      bits: Int, maxHamming: Int, extraKeys: Seq[String] = Nil): DataFrame = {
    require(bits >= 1 && bits <= 64, s"bits must be in [1,64]; got $bits")
    require(maxHamming >= 0 && maxHamming + 1 <= bits,
      s"need maxHamming+1 <= bits bands; got maxHamming=$maxHamming bits=$bits")
    val bands = maxHamming + 1
    val bandStructs = (0 until bands).map { b =>
      val start = b * bits / bands
      val width = (b + 1) * bits / bands - start
      val mask = if (width >= 64) -1L else (1L << width) - 1
      struct(lit(b).as("band"),
        shiftright(col(hashCol), start).bitwiseAND(lit(mask)).as("bkey"))
    }
    val extraCols = extraKeys.map(col)
    val banded = hashes
      .select(col(idCol) +: col(hashCol).as("__ph") +:
        explode(array(bandStructs: _*)).as("bb") +: extraCols: _*)
      .select(col(idCol) +: col("__ph") +: col("bb.band").as("band") +:
        col("bb.bkey").as("bkey") +: extraCols: _*)
    banded.groupBy(col("band") +: col("bkey") +: extraCols: _*)
      .agg(collect_set(struct(col(idCol).as("id"), col("__ph").as("sh"))).as("items"))
      .filter(size(col("items")) > 1)
      .select(explode(col("items")).as("a") +: col("items") +: extraCols: _*)
      .select(col("a") +:
        explode(filter(col("items"), x => x("id") > col("a.id"))).as("b") +: extraCols: _*)
      .select(extraCols ++ Seq(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).cast("long").as("hamming")): _*)
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Cross-document repeated n-gram profile — the substring-level dedup
    * signal (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better", arXiv 2107.06499): for each document, how many of its
    * word n-gram positions carry an n-gram that also occurs in at least
    * `minDocs` distinct documents. High `repeated_frac` marks boilerplate /
    * template spans that whole-document dedup never catches (the docs are
    * distinct; their substrings aren't). `first_rep_pos` (1-based token
    * position, -1 when none) is the span-trimming anchor.
    *
    * Scale: this is the distributed stand-in for the suffix-array pass —
    * one shuffle keyed by shingle (inherent: global substring frequency IS
    * a corpus-wide group-by), doc-frequency via distinct+count (two-level,
    * partial-aggregable), then a semi-join back. The repeated-shingle set is
    * NOT assumed broadcastable (unlike an eval benchmark it grows with the
    * corpus) — the semi-join shuffles by shingle and AQE handles stop-phrase
    * skew. */
  def repeatedNgramProfile(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Int = 2): DataFrame =
    repeatedNgramProfileAgainst(df,
      repeatedShingles(df, idCol, textCol, n, minDocs), idCol, textCol, n)

  /** The profile half of [[repeatedNgramProfile]] against an EXPLICIT
    * repeated-shingle set — [[trimSpansAgainst]]'s split applied to the
    * signal side, so the profile and the excision (and any other
    * consumer) can share ONE corpus-frequency pass
    * ([[repeatedShingles]]) instead of each re-running the
    * distinct+group-by over every shingle position. */
  def repeatedNgramProfileAgainst(
      df: DataFrame, repeated: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val sh = TextAnalysis.shingles(df, idCol, textCol, n)
    val tot = sh.groupBy(idCol).agg(count(lit(1)).as("n_ngrams"))
    val rep = sh.join(repeated.select("shingle"), Seq("shingle"), "left_semi")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_repeated"), (min(col("pos")) + 1).as("first_rep_pos"))
    df.select(col(idCol))
      .join(tot, Seq(idCol), "left")
      .join(rep, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_ngrams"), lit(0L)).cast("long").as("n_ngrams"),
        coalesce(col("n_repeated"), lit(0L)).cast("long").as("n_repeated"),
        round(coalesce(col("n_repeated"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_ngrams"), lit(0L)), lit(1L)).cast("double"), 6)
          .as("repeated_frac"),
        coalesce(col("first_rep_pos"), lit(-1L)).cast("long").as("first_rep_pos"))
  }

  /** Repeated-span REMOVAL — the action step completing
    * [[repeatedNgramProfile]]'s Lee et al. 2022 signal (arXiv 2107.06499):
    * every token covered by a word n-gram that occurs in at least
    * `minDocs` distinct documents is EXCISED, and each document is
    * reconstructed from its surviving tokens in original order
    * (space-joined). Returns one row per input document:
    * `(idCol, n_tokens, n_removed, clean_text)` — `clean_text` is empty
    * when the whole document is boilerplate.
    *
    * Semantics choice, deliberate: covered tokens are removed from EVERY
    * occurrence (C4-style boilerplate excision — the span is noise
    * wherever it appears). The keep-one-copy flavor of substring dedup
    * lives at paragraph granularity in
    * [[TextAnalysis.dedupParagraphs]], which keeps the globally-first
    * chunk; use that when one surviving copy should remain.
    *
    * Scale: the repeated-shingle set is corpus-sized, so it is never
    * broadcast — the membership check is a left-semi join keyed by
    * shingle (AQE absorbs stop-phrase skew). Coverage expansion is a
    * bounded ×n explode of repeated START positions only, the token
    * anti-join is keyed by (doc, pos), and reconstruction is one per-doc
    * aggregation — every stage linear in corpus size. */
  def trimRepeatedSpans(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Int = 2): DataFrame =
    trimSpansAgainst(df, repeatedShingles(df, idCol, textCol, n, minDocs),
      idCol, textCol, n)

  /** The corpus-frequency half of [[trimRepeatedSpans]]: the set of word
    * n-gram shingles occurring in at least `minDocs` distinct documents
    * (one `shingle` column). Persist this from a periodic batch pass and
    * feed it to [[trimSpansAgainst]] — the split that lets a STREAMING
    * micro-batch excise boilerplate against a standing snapshot
    * ([[graft.stream.EventAnalytics.trimSpansEachBatch]]): corpus-wide
    * substring frequency is inherently a batch aggregation; per-document
    * excision is not. */
  def repeatedShingles(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Int = 2): DataFrame =
    TextAnalysis.shingles(df, idCol, textCol, n)
      .select(col(idCol), col("shingle")).distinct()
      .groupBy("shingle").agg(count(lit(1)).as("docs"))
      .filter(col("docs") >= minDocs)
      .select("shingle")

  /** The excision half of [[trimRepeatedSpans]], against an EXPLICIT
    * repeated-shingle set (same dataflow, same keyed-stage guarantees —
    * the membership semi-join never broadcasts the corpus-sized set).
    * Per-document semantics: the result for a document depends only on
    * its own text and `repeated`, so applying this per micro-batch over
    * a stream equals one batch pass over the union — the batch==stream
    * equality EventAnalyticsSpec pins. */
  def trimSpansAgainst(
      df: DataFrame, repeated: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val sh = TextAnalysis.shingles(df, idCol, textCol, n)
    val covered = sh.join(repeated.select("shingle"), Seq("shingle"), "left_semi")
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("pos"))
      .distinct()
    val toks = df.select(col(idCol),
      posexplode(TextAnalysis.words(col(textCol))).as(Seq("pos", "w")))
    val tot = toks.groupBy(idCol).agg(count(lit(1)).cast("long").as("n_tokens"))
    val rebuilt = toks.join(covered, Seq(idCol, "pos"), "left_anti")
      .groupBy(idCol)
      .agg(count(lit(1)).cast("long").as("kept"),
        sort_array(collect_list(struct(col("pos"), col("w")))).as("__arr"))
      .select(col(idCol), col("kept"),
        concat_ws(" ", col("__arr.w")).as("clean_text"))
    df.select(col(idCol))
      .join(tot, Seq(idCol), "left")
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).cast("long").as("n_tokens"),
        (coalesce(col("n_tokens"), lit(0L)) - coalesce(col("kept"), lit(0L)))
          .cast("long").as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** 32-bit SimHash over the word multiset: bit j of the hash is the sign of
    * the sum of (+-1) votes from bit j of each token's md5 (high bit of hex
    * nibble j). One explode + one groupBy(doc) — linear in corpus size. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(TextAnalysis.words(col(textCol))).as("w"))
      .withColumn("h", md5(col("w")))
    val votes = (0 until 32).map { j =>
      sum(when(substring(col("h"), j + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1)
        .otherwise(-1)).as(s"v_$j")
    }
    val summed = toks.groupBy(idCol).agg(votes.head, votes.tail: _*)
    val hashVal = (0 until 32).map { j =>
      when(col(s"v_$j") > 0, lit(1L << (31 - j))).otherwise(lit(0L))
    }.reduce(_ + _)
    summed.select(col(idCol), hashVal.as("simhash"))
  }

  /** 64-bit SimHash — the wide sibling of [[simhash]] for corpora big
    * enough to saturate 32-bit band buckets: the round-9 ×100 audit
    * measured [[simhashPairs]] at 0.57× of its linear floor purely from
    * bucket-occupancy growth (65k keys over 5M docs), and 64 bits square
    * the band key space at IDENTICAL exactness guarantees (the pigeonhole
    * argument is width-agnostic). Vote 2j is the high bit of md5 hex
    * nibble j, vote 2j+1 its second bit — 64 independent hash bits from
    * the same one md5 per token, same linear dataflow. */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(TextAnalysis.words(col(textCol))).as("w"))
      .withColumn("h", md5(col("w")))
    val hiBit = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val bit2 = Seq("4", "5", "6", "7", "c", "d", "e", "f")
    val votes = (0 until 64).map { j =>
      val nibble = substring(col("h"), j / 2 + 1, 1)
      val ones = if (j % 2 == 0) hiBit else bit2
      sum(when(nibble.isin(ones: _*), 1).otherwise(-1)).as(s"v_$j")
    }
    val summed = toks.groupBy(idCol).agg(votes.head, votes.tail: _*)
    // Bit 63 is Long's sign bit; the terms set disjoint bits, so the sum
    // is an OR and never overflows (MinValue + positives stays in range).
    val hashVal = (0 until 64).map { j =>
      when(col(s"v_$j") > 0, lit(1L << (63 - j))).otherwise(lit(0L))
    }.reduce(_ + _)
    summed.select(col(idCol), hashVal.as("simhash"))
  }

  /** BOTH SimHash widths from ONE corpus pass: (idCol, `simhash` 32-bit,
    * `simhash64`) — the explode + per-token md5 is the whole
    * corpus-scale cost of either fingerprint, and the two widths' vote
    * tallies are per-bit sums over the SAME token rows, so computing
    * them together costs one pass instead of two (guide §1.2: don't
    * compute things twice). Moreover [[simhash64]]'s even-indexed votes
    * ARE [[simhash]]'s votes (both are the high bit of md5 hex nibble
    * m), so only 64 distinct sums exist: the 32 high-bit votes feed both
    * hashes, the 32 second-bit votes only the wide one. Bit-for-bit
    * identical to [[simhash]] / [[simhash64]] (spec-pinned). */
  def simhashBoth(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(TextAnalysis.words(col(textCol))).as("w"))
      .withColumn("h", md5(col("w")))
    val hiBit = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val bit2 = Seq("4", "5", "6", "7", "c", "d", "e", "f")
    val hiVotes = (0 until 32).map { m =>
      sum(when(substring(col("h"), m + 1, 1).isin(hiBit: _*), 1)
        .otherwise(-1)).as(s"vh_$m")
    }
    val b2Votes = (0 until 32).map { m =>
      sum(when(substring(col("h"), m + 1, 1).isin(bit2: _*), 1)
        .otherwise(-1)).as(s"vb_$m")
    }
    val summed = toks.groupBy(idCol)
      .agg(hiVotes.head, (hiVotes.tail ++ b2Votes): _*)
    val hash32 = (0 until 32).map { m =>
      when(col(s"vh_$m") > 0, lit(1L << (31 - m))).otherwise(lit(0L))
    }.reduce(_ + _)
    // 64-bit bit 2m is the high-bit vote of nibble m, bit 2m+1 its
    // second-bit vote ([[simhash64]]'s layout); disjoint bits, sum = OR.
    val hash64 = (0 until 32).map { m =>
      when(col(s"vh_$m") > 0, lit(1L << (63 - 2 * m))).otherwise(lit(0L)) +
        when(col(s"vb_$m") > 0, lit(1L << (62 - 2 * m))).otherwise(lit(0L))
    }.reduce(_ + _)
    summed.select(col(idCol), hash32.as("simhash"), hash64.as("simhash64"))
  }

  /** Banded exact hamming-≤k pairs over the 64-bit SimHash — identical
    * contract to [[simhashPairs]] with 2^32× the band key space; the
    * scale path once a fixed 32-bit hash's buckets saturate. */
  def simhashPairs64(
      df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 31,
      s"bands need >= 2 bits each for selectivity; got maxHamming=$maxHamming")
    hammingPairs(simhash64(df, idCol, textCol), idCol, "simhash",
      bits = 64, maxHamming = maxHamming)
  }

  /** [[simhashPairs64]] over an ALREADY-COMPUTED [[simhashBoth]] frame
    * (column `simhash64`) — the banding half alone, so the 64-bit pair
    * screen shares the one combined fingerprint pass with the 32-bit
    * consumers instead of re-running the corpus explode + token hash. */
  def simhashPairs64From(
      hashes: DataFrame, idCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 31,
      s"bands need >= 2 bits each for selectivity; got maxHamming=$maxHamming")
    hammingPairs(
      hashes.select(col(idCol), col("simhash64").as("simhash")),
      idCol, "simhash", bits = 64, maxHamming = maxHamming)
  }

  /** Corpus size above which a 32-bit SimHash's band buckets saturate for
    * `maxHamming`: pigeonhole banding splits 32 bits into (k+1) bands, so
    * expected band-bucket occupancy is n / 2^(32/(k+1)); beyond
    * `targetOccupancy` per bucket, within-bucket pair work grows
    * quadratically (the ×100-measured band-saturation law — BASELINE.md
    * round 9). Integer-exact so the DuckDB oracle derives the identical
    * switch from count(*). */
  def simhashWidthThreshold(maxHamming: Int, targetOccupancy: Long = 64): Long =
    (1L << (32 / (maxHamming + 1))) * targetOccupancy

  /** Width-adaptive SimHash near-dup pairs — THE production entry point:
    * 32-bit fingerprints while the corpus keeps 32-bit band buckets
    * selective ([[simhashWidthThreshold]]), the measured-equivalent
    * 64-bit escape ([[simhashPairs64]]) beyond. Same exactness contract
    * at either width (the pigeonhole argument is width-agnostic); the
    * switch only changes which non-dup pairs never become candidates.
    * Sizing runs an EAGER count at plan-construction time unless the
    * caller passes `rowCount` (the [[Similarity.embeddingDupPairsBucketed]]
    * convention). */
  def simhashPairsAdaptive(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 1, targetOccupancy: Long = 64,
      rowCount: Long = -1L): DataFrame =
    simhashPairsAdaptiveFrom(df, simhash(df, idCol, textCol), idCol, textCol,
      maxHamming, targetOccupancy, rowCount)

  /** [[simhashPairsAdaptive]] with the fingerprint frame supplied by the
    * caller (shared/persisted). `hashes` may be a plain [[simhash]]
    * frame or a combined [[simhashBoth]] frame: when it carries a
    * `simhash64` column the 64-bit escape reads it too
    * ([[simhashPairs64From]]) — BOTH branches are then served by the one
    * shared pass and the escape never re-runs the corpus explode. With a
    * 32-bit-only frame the escape falls back to recomputing
    * [[simhash64]] from the corpus (and, when the caller eagerly
    * materialized `hashes`, that 32-bit cost is amortized by the other
    * consumers of the shared frame, not avoided). Identical switch,
    * identical pairs either way. */
  def simhashPairsAdaptiveFrom(
      df: DataFrame, hashes: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 1, targetOccupancy: Long = 64,
      rowCount: Long = -1L): DataFrame = {
    val n = if (rowCount >= 0) rowCount else df.select(idCol).count()
    if (n <= simhashWidthThreshold(maxHamming, targetOccupancy))
      simhashPairsFrom(hashes, idCol, maxHamming)
    else if (hashes.columns.contains("simhash64"))
      simhashPairs64From(hashes, idCol, maxHamming)
    else simhashPairs64(df, idCol, textCol, maxHamming)
  }
}
