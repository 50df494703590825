package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark SQL lacks as built-ins, implemented in their
  * scale-safe distributed forms (no cross products, no global windows).
  */
object Joins {

  /** Distributed as-of join: for every left row, attach the most recent
    * right row with `right.tsCol <= left.tsCol` within the same `keyCols`
    * group (the time-series "last known value" join; DuckDB/kdb `ASOF JOIN`,
    * pandas `merge_asof`).
    *
    * Shape: instead of an inequality join (which Spark plans as a cross
    * product per key), tag both sides, UNION them, and run ONE partitioned
    * running `last(ignoreNulls)` window ordered by (ts, side) — right rows
    * sort before left rows at equal ts, making the match inclusive. Cost is
    * a single shuffle by key and a streaming window frame (running last is
    * O(1) memory per row) — survives 100 TB as long as no single key holds
    * an unsorted-window-sized slice, the same bound a join would have.
    *
    * Right rows should be unique per (keyCols, tsCol); with duplicates the
    * row sorting last by `rightCols` struct order wins (deterministic but
    * arbitrary). Left rows with no prior right row get NULLs.
    *
    * @param rightCols right-side payload columns to attach, emitted as
    *                  `prefix + name`.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      rightCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val rv = struct(rightCols.map(col): _*)
    val r2 = right
      .select((keyCols :+ tsCol).map(col) :+ rv.as("__rv"): _*)
      .withColumn("__side", lit(0))
    val rvType = r2.schema("__rv").dataType
    val leftPayload = left.columns.filterNot((keyCols :+ tsCol).contains)
    // a payload-less left side (e.g. a generated calendar spine) still needs
    // a placeholder column so both union legs share one schema
    val lp = if (leftPayload.isEmpty) lit(0) else struct(leftPayload.map(col): _*)
    val l2 = left
      .select((keyCols :+ tsCol).map(col) :+ lp.as("__lp"): _*)
      .withColumn("__rv", lit(null).cast(rvType))
      .withColumn("__side", lit(1))
    val unioned = l2.unionByName(r2.withColumn("__lp", lit(null).cast(l2.schema("__lp").dataType)))
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
    val out = keyCols.map(col) ++ Seq(col(tsCol)) ++
      leftPayload.map(c => col(s"__lp.$c").as(c)) ++
      rightCols.map(c => col(s"__match.$c").as(prefix + c))
    filled.where(col("__side") === 1).select(out: _*)
  }

  /** Salted equi-join — the skew guard for joins (the join-side sibling of
    * `Sketches.saltedCount`): when BOTH sides are too large to broadcast and
    * the key distribution is skewed, a plain shuffle join lands every row of
    * a hot key on one reducer. Salting spreads the big side over `salts`
    * reducers per key (salt = deterministic hash of the full row — no RNG,
    * replayable) and replicates the small side once per salt, so the result
    * is EXACTLY the plain join while the hottest reducer shrinks by ~salts.
    * Use AQE skew-join first; reach for explicit salting when the skew is
    * known and stable (e.g. a fixed hot tenant) or AQE's post-shuffle split
    * can't help (aggregation-after-join pipelines).
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame,
      keyCols: Seq[String], salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn(
      "__salt", pmod(hash(big.columns.map(col): _*), lit(salts)))
    val saltedSmall = small.withColumn(
      "__salt", explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(saltedSmall, keyCols :+ "__salt").drop("__salt")
  }

  /** ADAPTIVE salted equi-join: salt only the keys that are actually hot.
    * [[saltedJoin]] replicates the ENTIRE small side `salts`× — the right
    * trade when most keys are skewed, waste when one tenant out of a
    * million is. This variant first measures the big side's per-key counts
    * (one partial-aggregable groupBy — map-side combines keep the hot key
    * from hurting the measuring pass itself) and broadcasts the keys above
    * `hotThreshold`; only those keys' rows get salted and only those keys'
    * small-side rows are replicated. Light keys join on salt 0 exactly as
    * an unsalted join would. Result is EXACTLY the plain join; shuffle
    * volume grows by salts × |hot small rows| instead of salts × |small|.
    * The measuring pass is one extra scan of the big side's key column —
    * amortize it by persisting hot-key sets for known-stable skew. */
  def adaptiveSaltedJoin(
      big: DataFrame, small: DataFrame,
      keyCols: Seq[String], salts: Int = 16, hotThreshold: Long = 100000L): DataFrame = {
    val hot = big.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= hotThreshold)
      .select(keyCols.map(col): _*)
      .withColumn("__hot", lit(true))
    val saltedBig = big.join(broadcast(hot), keyCols, "left")
      .withColumn("__salt",
        when(col("__hot"), pmod(hash(big.columns.map(col): _*), lit(salts)))
          .otherwise(lit(0)))
      .drop("__hot")
    val saltedSmall = small.join(broadcast(hot), keyCols, "left")
      .withColumn("__salt",
        explode(when(col("__hot"), array((0 until salts).map(lit): _*))
          .otherwise(array(lit(0)))))
      .drop("__hot")
    saltedBig.join(saltedSmall, keyCols :+ "__salt").drop("__salt")
  }

  /** Bloom-pruned equi-join (semi-join reduction): filter the big side with
    * a Bloom filter built over the small side's keys BEFORE the join's
    * shuffle, so rows that cannot match never leave their input partition.
    * A plain `big ⋈ small` shuffles ALL of `big` by the key even when the
    * small side only matches a sliver — at 100 TB the pruned shuffle is the
    * difference between moving terabytes and moving the matching gigabytes.
    * Result is EXACTLY the inner join: Bloom false positives (rate `fpp`)
    * pass the probe but are eliminated by the join itself.
    *
    * The probe is [[graft.functions.BloomMightContain]] — a codegen'd
    * Catalyst expression, so the big side's scan → probe → exchange stage
    * stays one WholeStageCodegen span. The filter object is built with one
    * driver-side job over the small side's key column (the small side is
    * read twice: once to build, once to join — by definition cheap relative
    * to the big side) and ships with the plan via `addReferenceObj`.
    *
    * Prefer this over broadcast-join when the small side is too big to
    * broadcast as ROWS but its key set still fits a few-MB Bloom; prefer it
    * over a plain shuffle join whenever the join selectivity on the big
    * side is well under 1. (Spark's own runtime row-level filtering exists
    * behind `spark.sql.optimizer.runtime.bloomFilter.enabled` for adaptive
    * cases; this operator makes the reduction explicit, deterministic and
    * plan-assertable.)
    */
  def bloomPrunedJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    import graft.functions.BloomMightContain
    // Probe and build must hash identical bytes: key canonicalized to its
    // string form on both sides (codegen'd cast, no UDF). That demands the
    // key TYPES match exactly — a plain join would coerce double 500.0 to
    // bigint 500 and match, but their strings ("500.0" vs "500") hash
    // differently and the probe would silently drop the row. Fail loudly
    // instead; cast one side explicitly to opt in.
    require(big.schema(bigKey).dataType == small.schema(smallKey).dataType,
      s"bloomPrunedJoin key types must match exactly: " +
        s"$bigKey is ${big.schema(bigKey).dataType}, " +
        s"$smallKey is ${small.schema(smallKey).dataType}")
    val keyed = small.select(col(smallKey).cast("string").as("__bk"))
    // Spark's bloomFilter aggregate NPEs on an empty frame; an empty small
    // side means an empty inner join, so skip the probe entirely.
    if (keyed.isEmpty) big.limit(0).join(small, col(bigKey) === col(smallKey))
    else {
      val bloom = keyed.stat.bloomFilter("__bk", math.max(expectedItems, 1L), fpp)
      big.filter(BloomMightContain.probe(col(bigKey).cast("string"), bloom))
        .join(small, col(bigKey) === col(smallKey))
    }
  }

  /** Bucketed range (interval-containment) join: attach to each point row
    * the interval rows with `startCol <= pointCol < endCol`. No shared
    * equi-key exists, so a naive formulation is a cross join; instead both
    * sides are mapped onto a bucket grid of `bucketWidth` (long domain —
    * epoch micros, byte offsets, ...): each interval EXPLODES onto the
    * buckets it spans, each point lands in exactly one, and the match
    * becomes an equi-join on bucket + a residual containment filter.
    *
    * Cost: shuffle is |points| + |intervals| * avg-buckets-per-interval;
    * pick `bucketWidth` near the typical interval length so the explode
    * factor stays ~1-2. Intervals spanning many buckets multiply only the
    * (small) interval side. Inner-join semantics: points in no interval
    * drop, points in k overlapping intervals emit k rows.
    */
  def rangeJoinByBucket(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    // Exact long floor-division: x/w through `/` goes via DOUBLE, whose 53
    // significand bits silently misbucket values past 2^53 (the scaladoc
    // advertises byte offsets). (x - pmod(x, w)) is an exact multiple of w
    // (pmod is non-negative, so this floors for negative x too); dividing it
    // as DECIMAL keeps every digit and the final long cast is exact.
    def floorDiv(c: Column): Column = {
      val w = lit(bucketWidth)
      ((c - pmod(c, w)).cast("decimal(38,0)") / w).cast("long")
    }
    val bucketed = intervals
      // an empty interval [s, s) matches nothing, and its bucket sequence
      // would be DESCENDING (sequence auto-steps -1) — junk rows; drop first
      .where(col(endCol) > col(startCol))
      .withColumn(
        "__bucket",
        explode(sequence(
          floorDiv(col(startCol)),
          floorDiv(col(endCol) - 1))))
    points
      .withColumn("__bucket", floorDiv(col(pointCol)))
      .join(bucketed, Seq("__bucket"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }

  /** Hot-key skew report — the advisor feeding [[saltedJoin]] /
    * [[adaptiveSaltedJoin]]: top-K keys by row count with their corpus
    * share and the salt factor that spreads each across `parts`
    * average-sized partitions (`ceil(cnt * parts / total)`, floor 1).
    * Map-side-combined key counts + TakeOrdered top-K (never a global
    * window); the grand total is a one-row broadcast. Two evaluations of
    * the combined count agg — the same accepted price as the vocab
    * coverage query — beat materializing the distinct-key frame. */
  def skewReport(
      df: DataFrame, keyCol: String, topK: Int, parts: Int): DataFrame = {
    val counts = df.groupBy(keyCol).agg(count(lit(1)).cast("long").as("cnt"))
    val total = counts.agg(sum(col("cnt")).cast("long").as("total"))
    counts.orderBy(col("cnt").desc, col(keyCol)).limit(topK)
      .crossJoin(broadcast(total))
      .select(col(keyCol), col("cnt"),
        round(col("cnt").cast("double") / col("total").cast("double"), 6)
          .as("share"),
        greatest(lit(1L),
          ceil(col("cnt").cast("double") * parts /
            col("total").cast("double")).cast("long")).as("salt_factor"))
  }
}
