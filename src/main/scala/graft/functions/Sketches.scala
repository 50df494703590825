package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate query processing and skew-proof aggregation
  * patterns.
  *
  * The KMV (k-minimum-values) distinct-count sketch here is deliberately
  * DETERMINISTIC — hashes come from Knuth multiplicative hashing in exact
  * int64 arithmetic, so the estimate is bit-identical across engines and
  * oracle-verifiable, unlike HLL implementations whose registers differ per
  * engine. (Spark's built-in `approx_count_distinct` HLL++ remains the
  * production default when cross-engine determinism isn't required; this
  * sketch exists where it is.)
  */
object Sketches {

  /** Knuth multiplicative hash of an integer key into [0, 2^31-1). Exact
    * int64 arithmetic — deterministic in any engine. */
  def knuthHash(key: Column): Column =
    pmod(key.cast("long") * lit(2654435761L), lit(2147483647L))

  /** KMV distinct-count estimate: keep the k smallest distinct hash values;
    * estimate = (k-1) * M / h_k where h_k is the k-th smallest hash and M
    * the hash range. One distinct-agg + a top-k — no full distinct count
    * materialization; sketch size is O(k) regardless of cardinality.
    *
    * Returns a 1-row frame: approx_distinct (double, rounded), n_sketch
    * (hashes kept), exact_distinct for comparison.
    */
  def kmvDistinct(df: DataFrame, keyCol: String, k: Int = 256): DataFrame = {
    val hashes = df.select(knuthHash(col(keyCol)).as("hv")).distinct()
    val sketch = hashes.orderBy("hv").limit(k)
    val agg = sketch.agg(
      count(lit(1)).as("n_sketch"),
      max(col("hv")).as("h_k"))
    val exact = df.select(col(keyCol)).distinct().agg(count(lit(1)).as("exact_distinct"))
    agg.crossJoin(exact).select(
      // Under-filled sketch (< k hashes) means we saw every distinct value.
      round(
        when(col("n_sketch") < k, col("n_sketch").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(2147483647.0) / col("h_k").cast("double")),
        4).as("approx_distinct"),
      col("n_sketch"),
      col("exact_distinct"))
  }

  /** KMV sketch SET ALGEBRA (Beyer et al., SIGMOD'07 "On Synopses for
    * Distinct-Value Estimation Under Multiset Operations"): estimate
    * |A ∪ B|, |A ∩ B| and Jaccard(A,B) from the two k-min-value sketches
    * ALONE. Union sketch = k smallest of the merged sketches; the fraction
    * of union-sketch hashes present in both input sketches estimates
    * Jaccard; intersection = that fraction × the union estimate. The
    * full sets never co-shuffle — at 100 TB each source keeps only its
    * O(k) sketch and the combine is k-row arithmetic, which is the whole
    * point of sketch algebra ("what fraction of source A's users does
    * source B share" without a distinct-join). Exact values are computed
    * alongside as the audit columns (cheap at test scale; drop them in
    * production). Deterministic (Knuth hashing, min-k) — oracle-verifiable
    * bit-for-bit. */
  def kmvSetStats(a: DataFrame, b: DataFrame, keyCol: String, k: Int = 256): DataFrame = {
    def sketch(df: DataFrame) =
      df.select(knuthHash(col(keyCol)).as("hv")).distinct().orderBy("hv").limit(k)
    val sa = sketch(a)
    val sb = sketch(b)
    val su = sa.union(sb).distinct().orderBy("hv").limit(k)
    val kint = su.join(sa, Seq("hv"), "left_semi").join(sb, Seq("hv"), "left_semi")
      .agg(count(lit(1)).as("ki"))
    val uagg = su.agg(count(lit(1)).as("nu"), max(col("hv")).as("hk"))
    val ea = a.select(col(keyCol)).distinct()
    val eb = b.select(col(keyCol)).distinct()
    val exact = ea.join(eb, Seq(keyCol), "inner").agg(count(lit(1)).as("exact_i"))
      .crossJoin(ea.union(eb).distinct().agg(count(lit(1)).as("exact_u")))
    val unionEst = when(col("nu") < k, col("nu").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(2147483647.0) / col("hk").cast("double"))
    uagg.crossJoin(kint).crossJoin(exact).select(
      round(unionEst, 4).as("union_est"),
      col("ki").cast("long").as("k_intersect"),
      round(col("ki").cast("double") / col("nu").cast("double"), 6).as("jaccard_est"),
      round(col("ki").cast("double") / col("nu").cast("double") * unionEst, 4)
        .as("intersect_est"),
      round(col("exact_i").cast("double") / col("exact_u").cast("double"), 6)
        .as("exact_jaccard"))
  }

  /** Salted two-phase aggregation: pre-aggregate on (key, salt) so one hot
    * key spreads over `salts` reducers before the final combine — the
    * explicit form of the skew guard for aggregations whose partial
    * aggregation alone can't save (e.g. collect-like or high-cardinality
    * states). For plain counts the result is provably identical to the
    * direct groupBy. Salt derives from a hash of the full row — no RNG, so
    * plans stay deterministic and replayable.
    */
  def saltedCount(df: DataFrame, keyCol: String, salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(hash(df.columns.map(col): _*), lit(salts)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial")).as("cnt"))

  /** Count-min row hash: md5-derived bucket of `key` for sketch row `row`
    * — deterministic and identically computable by the DuckDB oracle
    * (`('0x' || substr(md5(row || ':' || key), 1, 8))::UBIGINT % width`). */
  private def cmsBucket(row: Int, key: Column, width: Int): Column =
    (conv(substring(md5(concat(lit(s"$row:"), key.cast("string"))), 1, 8),
      16, 10).cast("long") % width).cast("long")

  /** Count-min sketch BUILD: the (row, bucket) → count table, depth×width
    * cells total regardless of key cardinality — the point-frequency
    * companion to KMV (distinct counts) and Misra–Gries (heavy hitters).
    * One map-side-combined aggregation over `depth` replicated hashes;
    * cells are longs, so two sketches merge by elementwise addition
    * (union = sum — the property streaming ingestion needs).
    *
    * Deliberately md5-seeded and exact-integer so estimates are
    * bit-identical across engines and oracle-verifiable (unlike
    * engine-internal sketch registers). */
  def cmsBuild(
      df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame =
    df.select(explode(array((0 until depth).map(r =>
        struct(lit(r.toLong).as("row"),
          cmsBucket(r, col(keyCol), width).as("bucket"))): _*)).as("rb"))
      .select(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).cast("long").as("cell_count"))

  /** Count-min ESTIMATE for each key in `keys`: min over sketch rows of
    * the key's cell — an overestimate by construction (collisions only add).
    * The sketch side is depth×width cells (broadcastable at any corpus
    * size); per key the probe is `depth` equi-join lookups + one min.
    * The sketch table stores only touched cells, so the join is LEFT with
    * an empty cell reading 0 — a key absent from the build correctly
    * estimates 0 (its min row) instead of being dropped or inflated by a
    * single collided cell. */
  def cmsEstimate(
      sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame =
    keys.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(array((0 until depth).map(r =>
        struct(lit(r.toLong).as("row"),
          cmsBucket(r, col(keyCol), width).as("bucket"))): _*)).as("rb"))
      .select(col(keyCol), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cell_count"), lit(0L))).cast("long").as("est_count"))
}
