package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage: edit-distance matching restricted to
  * blocking-key groups — the classic entity-resolution shape (match
  * contacts/products/suppliers whose names differ by typos) that none of
  * the hash-based dedup family (exact / MinHash / SimHash) can express,
  * because edit distance is not a set-similarity.
  *
  * Scale notes (100 TB): the naive form is an all-pairs O(N^2) string
  * comparison. Blocking turns it into an EQUI-join on the block key, so
  * candidate pairs are quadratic only in the largest block — choose block
  * keys (category + length band, phonetic code, ...) so blocks stay
  * bounded, exactly like LSH bands bound the jaccard verifier. The
  * levenshtein evaluation itself is a codegen'd built-in inside the join's
  * whole-stage pipeline; AQE's skew handling splits an oversized block.
  */
object Linkage {

  private def sides(
      df: DataFrame, idCol: String, nameCol: String, blockCols: Seq[String])
      : (DataFrame, DataFrame) = {
    val a = df.select(
      blockCols.map(col) ++ Seq(col(idCol).as("id_a"), col(nameCol).as("name_a")): _*)
    val b = df.select(
      blockCols.map(col) ++ Seq(col(idCol).as("id_b"), col(nameCol).as("name_b")): _*)
    (a, b)
  }

  /** Salt + spread a block-keyed pair join so the per-task DP work uses
    * the whole cluster (guide §2.5). Two starvation shapes, one fix:
    *
    *   - SMALL input (the sf0.1 `part` table is ONE 176 KB parquet file
    *     → one scan task): Catalyst broadcasts the b-side, the join +
    *     levenshtein fuse into the scan stage, and the whole quadratic
    *     DP runs on ONE core — measured FLAT from 8 to 32 cores, and a
    *     join-key salt alone changed nothing (a broadcast join never
    *     shuffles the probe side). The explicit-count repartition below
    *     spreads the probe side first; the count is explicit because
    *     AQE legitimately coalesces a tiny keyed exchange back to one
    *     partition (`repartition(col)` without a count is advisory).
    *   - LARGE input under a SHUFFLE join: few distinct block keys pool
    *     one reduce task per block; the salt multiplies the key space
    *     (a-side keyed by xxhash64(id) — never rand(): retried tasks
    *     must re-derive the same bucket; b-side replicated to every
    *     salt value) and the repartition keyed (blocks..., salt) is
    *     exactly the join's partitioning, so it is the join's own
    *     exchange, not an extra one (guide §2.4).
    *
    * Each unordered pair still matches exactly once (the b-replica
    * whose salt equals a's), so the pair set is unchanged (spec-pinned
    * salted == unsalted). Costs `saltBuckets`× the b-side rows through
    * the exchange — block metadata, never the corpus. 1 restores the
    * plain join. */
  private def saltedPairJoin(
      a: DataFrame, b: DataFrame, keys: Seq[String],
      saltBuckets: Int): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    if (saltBuckets == 1) a.join(b, keys)
    else {
      val parallelism = a.sparkSession.sparkContext.defaultParallelism
      val saltKeys = keys :+ "__salt"
      val aS = a.withColumn("__salt",
        pmod(xxhash64(col("id_a")), lit(saltBuckets.toLong)))
        .repartition(parallelism, saltKeys.map(col): _*)
      val bS = b.withColumn("__salt",
        explode(sequence(lit(0L), lit(saltBuckets.toLong - 1L))))
      aS.join(bS, saltKeys).drop("__salt")
    }
  }

  /** Per-record nearest neighbor within its block: (id_a, blockCols...,
    * nn_dist) where nn_dist = min levenshtein to any OTHER record sharing
    * the block key. Records alone in their block are dropped (no neighbor
    * exists). The downstream screen "nn_dist <= k" is the usual
    * candidate-duplicate trigger.
    *
    * Staged-threshold evaluation (exact at any data): pass 1 scores every
    * unordered pair with the THRESHOLD-BOUNDED levenshtein — a banded
    * O(t·min(m,n)) DP with early exit instead of the full O(m·n) table —
    * because for any record with SOME neighbor within t, min over its
    * <=t neighbors IS its true min (every >t neighbor is strictly
    * farther). Only records whose every neighbor exceeds t (pass-1 min
    * still at the sentinel) pay pass 2, the full-width rescan of their
    * block. In entity-resolution data near-duplicates are the point —
    * the residual is a sliver, and the sliver's cost is still blocked,
    * never all-pairs. Pass-1's aggregate feeds both the resolved output
    * and the residual screen with one schema, so the pair scan is one
    * exchange-reusable subtree. */
  def nearestNeighborWithinBlocks(
      df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], stagedThreshold: Int = 3,
      saltBuckets: Int = 16): DataFrame =
    nearestNeighborFromDistances(
      bandedPairDistances(df, idCol, nameCol, blockCols,
        stagedThreshold, saltBuckets),
      df, idCol, nameCol, blockCols)

  /** Pass-1 sentinel value of [[bandedPairDistances]]: the pair's true
    * distance exceeded the banded threshold. */
  val FarSentinel: Long = Int.MaxValue.toLong

  /** The pass-1 pair-distance frame both blocked-linkage operators score:
    * every unordered within-block pair (id_a < id_b) with the
    * THRESHOLD-BOUNDED levenshtein — the banded O(t·min(m,n)) DP with
    * early exit — as `dist` (exact when <= `threshold`, [[FarSentinel]]
    * beyond). Output: (blockCols..., id_a, id_b, dist). Compute (or
    * checkpoint/persist) it ONCE and feed [[nearestNeighborFromDistances]]
    * and [[fuzzyDupPairsFrom]] — the quadratic DP is the whole cost of
    * both operators, and their consumption differs only in the aggregate
    * (per-record min vs <= maxDist screen). */
  def bandedPairDistances(
      df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], threshold: Int = 3,
      saltBuckets: Int = 16): DataFrame = {
    val t = math.max(threshold, 0)
    val (a, b) = sides(df, idCol, nameCol, blockCols)
    saltedPairJoin(a, b, blockCols, saltBuckets)
      .filter(col("id_a") < col("id_b"))
      .withColumn("bdist", levenshtein(col("name_a"), col("name_b"), t))
      .withColumn("dist",
        when(col("bdist") >= 0, col("bdist").cast("long"))
          .otherwise(FarSentinel))
      .select(blockCols.map(col) ++
        Seq(col("id_a"), col("id_b"),
          // Carry the build threshold as column METADATA so a consumer
          // with a stricter bound can validate compatibility instead of
          // silently dropping true pairs (r17 advice) — metadata rides
          // the column through select/filter/checkpoint, costs nothing.
          col("dist").as("dist", new org.apache.spark.sql.types
            .MetadataBuilder().putLong(ThresholdMetaKey, t.toLong)
            .build())): _*)
  }

  /** Metadata key [[bandedPairDistances]] stamps its build threshold
    * under (on the `dist` column). */
  private[graft] val ThresholdMetaKey = "graft.banded.threshold"

  /** The aggregation half of [[nearestNeighborWithinBlocks]] over an
    * explicit [[bandedPairDistances]] frame. */
  def nearestNeighborFromDistances(
      pairDists: DataFrame, df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String]): DataFrame = {
    val (a, b) = sides(df, idCol, nameCol, blockCols)
    // Each UNORDERED pair paid the banded DP once (id_a < id_b halves the
    // join output); a narrow explode credits the distance to both
    // endpoints — edit distance is symmetric. Pairs beyond the threshold
    // carry the sentinel so every non-singleton record stays represented.
    val banded = pairDists
      .select(blockCols.map(col) :+ explode(array(
        struct(col("id_a").as("rid"), col("dist")),
        struct(col("id_b").as("rid"), col("dist")))).as("x"): _*)
      .groupBy(col("x.rid").as("id_a") +: blockCols.map(col): _*)
      .agg(min(col("x.dist")).as("nn_dist"))
    val resolved = banded.filter(col("nn_dist") < FarSentinel)
    // Residual: every neighbor was farther than the threshold — rescan
    // ONLY these records' blocks at full width (id_a =!= id_b: each
    // residual record needs all its neighbors, including pass-1-resolved
    // ones).
    val far = banded.filter(col("nn_dist") === FarSentinel).select(col("id_a"))
      .join(a, Seq("id_a"))
      .join(b, blockCols)
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .groupBy(col("id_a") +: blockCols.map(col): _*)
      .agg(min(col("dist")).cast("long").as("nn_dist"))
    resolved.unionByName(far)
  }

  /** The screen half of [[fuzzyDupPairs]] over an explicit
    * [[bandedPairDistances]] frame whose threshold was >= `maxDist`:
    * dist <= maxDist rows are exact distances by the banded-DP contract,
    * so the screen equals the direct maxDist-bounded computation
    * (spec-pinned). */
  def fuzzyDupPairsFrom(pairDists: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist.toLong < FarSentinel,
      s"maxDist must be a real distance bound, got $maxDist")
    // A frame built with threshold < maxDist has already dropped true
    // pairs to FarSentinel — fail loudly instead of silently screening
    // an incompatible frame (r17 advice). Frames from other producers
    // (no metadata) keep the caller-owns-compatibility contract.
    val meta = pairDists.schema("dist").metadata
    if (meta.contains(ThresholdMetaKey))
      require(meta.getLong(ThresholdMetaKey) >= maxDist.toLong,
        s"fuzzyDupPairsFrom(maxDist=$maxDist) over a pair-distance frame " +
          s"built with threshold ${meta.getLong(ThresholdMetaKey)} — " +
          "pairs beyond the build threshold were already dropped; rebuild " +
          "bandedPairDistances with threshold >= maxDist")
    pairDists.filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Candidate duplicate pairs within blocks: (id_a < id_b, dist) with
    * levenshtein(name_a, name_b) <= maxDist.
    *
    * `lengthBand = true` adds exact length-banding on top of the user
    * blocks: levenshtein(a, b) >= |len(a) - len(b)|, so a true pair's
    * lengths differ by <= maxDist and their floor(len/maxDist) bands by
    * <= 1. Side A is replicated to its band ± 1 and the join key becomes
    * (blockCols, band): each true pair matches on exactly one replica
    * (B's band is a single value), nothing is lost, and the per-bucket
    * quadratic product shrinks from |block|² to ~3·(|block|/bands)·|block|
    * — the same bounded-bucket shape LSH banding gives the jaccard
    * verifier. Use it when name lengths SPREAD (addresses, titles, free
    * text). Default off: on tightly-clustered lengths (e.g. generated
    * catalog names) the band prunes almost nothing and the 3x replication
    * only adds shuffle — measured 6.6 s plain vs 10.9 s banded at sf0.1
    * on `part` with identical output (BASELINE.md session-4). */
  def fuzzyDupPairs(
      df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], maxDist: Int,
      lengthBand: Boolean = false, saltBuckets: Int = 16): DataFrame = {
    val (a0, b0) = sides(df, idCol, nameCol, blockCols)
    val (a, b, keys) =
      if (!lengthBand) (a0, b0, blockCols)
      else {
        val w = math.max(maxDist, 1)
        val aB = a0
          .withColumn("__band0", floor(length(col("name_a")) / w).cast("long"))
          .withColumn("__band",
            explode(array(col("__band0") - 1, col("__band0"), col("__band0") + 1)))
          .drop("__band0")
        val bB = b0
          .withColumn("__band", floor(length(col("name_b")) / w).cast("long"))
        (aB, bB, blockCols :+ "__band")
      }
    // Threshold-bounded levenshtein: banded O(maxDist·min(m,n)) DP with
    // early exit, returning the exact distance when <= maxDist and -1
    // otherwise — same output as compute-then-filter at a fraction of the
    // DP cells (the filter keeps exactly the non-negative rows).
    saltedPairJoin(a, b, keys, saltBuckets)
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
