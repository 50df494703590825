package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact global order statistics WITHOUT a global sort — the 100 TB answer
  * to "what is the corpus-wide p99". A global `percentile()` materializes
  * every group value in one aggregation buffer and a global ORDER BY
  * shuffles the world; this operator instead iterates histogram refinement
  * (the classic distributed k-th-element algorithm, e.g. Blelloch's
  * median-of-medians lineage): each round bins each rank's candidate range
  * into `bins` equi-width buckets (one partial-aggregable groupBy), locates
  * the bucket containing the target rank, and recurses into it. Candidates
  * shrink ~`bins`× per round, so a trillion rows reach a driver-sized
  * remainder in 4-5 scans, each with a RANGE filter Parquet can push down.
  *
  * ALL requested quantiles refine in the SAME scan: each round explodes one
  * (rank, bucket) pair per row per still-active rank and aggregates one
  * combined histogram, so the number of full-data histogram passes is
  * `rounds`, never `rounds × |qs|` — at 100 TB asking for five quantiles
  * costs the same scan IO as asking for one (QuantilesSpec pins this with a
  * job-count gate).
  *
  * The per-round driver collect is an `active × bins`-row histogram —
  * coordination state (like AQE's stats), not data — and the final exact
  * selection is a TakeOrdered over at most `directLimit` rows per rank. The
  * result is an exact ELEMENT of the dataset (discrete quantile, rank =
  * ceil(q*n) — DuckDB's quantile_disc convention), so the oracle verifies
  * it regardless of binning arithmetic.
  */
object Quantiles {

  /** Per-rank refinement state. `filter` is the conjunction of the bucket
    * selections made so far — membership is decided by the SAME clamped
    * bin expression that built each round's histogram, so boundary
    * arithmetic can never disagree between counting and filtering. */
  private final case class RankState(
      idx: Int, r: Long, lo: Double, hi: Double,
      filter: Column, curN: Long, iters: Int) {
    def active(directLimit: Long, maxIters: Int): Boolean =
      curN > directLimit && iters < maxIters && lo < hi
  }

  /** The clamped equi-width bin expression for range [lo, hi).
    * v = hi clamps into the last bucket, and FP rounding in the division
    * can push a value one ulp outside [0, bins) after a previous round's
    * re-basing — an unclamped negative bin would be silently skipped by
    * the rank scan. */
  private def binExpr(lo: Double, width: Double, bins: Int): Column =
    least(lit(bins - 1L),
      greatest(lit(0L), floor((col("v") - lit(lo)) / lit(width)))).cast("long")

  def exactQuantilesDisc(
      df: DataFrame, valueCol: String, qs: Seq[Double],
      bins: Int = 1024, directLimit: Long = 65536, maxIters: Int = 8): Seq[Double] =
    exactQuantilesDiscWithStats(df, valueCol, qs, bins, directLimit, maxIters)._1

  /** As [[exactQuantilesDisc]], also returning the number of full-data
    * histogram refinement scans performed — the scale contract under test:
    * scans grow with refinement depth only, NOT with the number of
    * requested quantiles. */
  def exactQuantilesDiscWithStats(
      df: DataFrame, valueCol: String, qs: Seq[Double],
      bins: Int = 1024, directLimit: Long = 65536, maxIters: Int = 8)
      : (Seq[Double], Int) = {
    qs.foreach(q => require(q >= 0.0 && q <= 1.0, s"quantile $q outside [0,1]"))
    if (qs.isEmpty) return (Nil, 0)
    val vals = df.select(col(valueCol).cast("double").as("v")).filter(col("v").isNotNull)
    val stats = vals.agg(count(col("v")).as("n"), min(col("v")).as("mn"),
      max(col("v")).as("mx")).head()
    val n = stats.getLong(0)
    require(n > 0, "exactQuantilesDisc over an empty column")

    var states = qs.zipWithIndex.map { case (q, i) =>
      RankState(i, math.max(1L, math.ceil(q * n).toLong),
        stats.getDouble(1), stats.getDouble(2), lit(true), n, 0)
    }
    var scans = 0
    // Invariant (per rank): the answer is the r-th smallest of
    // vals.filter(state.filter), which lies in [lo, hi].
    while (states.exists(_.active(directLimit, maxIters))) {
      val act = states.filter(_.active(directLimit, maxIters))
      val widths = act.map(st => st.idx -> (st.hi - st.lo) / bins).toMap
      // ONE combined scan: each row contributes its bucket to every active
      // rank whose current candidate set it belongs to (-1 = not a member).
      val perRank = act.map { st =>
        struct(lit(st.idx).as("i"),
          when(st.filter, binExpr(st.lo, widths(st.idx), bins))
            .otherwise(lit(-1L)).as("b"))
      }
      val histo = vals
        .select(explode(array(perRank: _*)).as("x"))
        .filter(col("x.b") >= 0L)
        .groupBy(col("x.i").as("i"), col("x.b").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (i, rows) =>
          i -> rows.map(r => r.getLong(1) -> r.getLong(2)).toMap
        }
      scans += 1
      states = states.map { st =>
        if (!st.active(directLimit, maxIters)) st
        else {
          val h = histo.getOrElse(st.idx, Map.empty[Long, Long])
          val width = widths(st.idx)
          var acc = 0L
          var b = 0L
          while (acc + h.getOrElse(b, 0L) < st.r) { acc += h.getOrElse(b, 0L); b += 1 }
          st.copy(
            r = st.r - acc,
            curN = h.getOrElse(b, 0L),
            filter = st.filter && (binExpr(st.lo, width, bins) === b),
            hi = if (b == bins - 1) st.hi else st.lo + (b + 1) * width,
            lo = st.lo + b * width,
            iters = st.iters + 1)
        }
      }
    }
    val results = states.sortBy(_.idx).map { st =>
      require(st.r <= Int.MaxValue, s"residual rank ${st.r} exceeds direct-selection range")
      // Exact selection: r-th smallest of the remaining sliver (TakeOrdered —
      // bounded by directLimit except on pathological maxIters exits).
      vals.filter(st.filter).orderBy(col("v").asc).limit(st.r.toInt)
        .agg(max(col("v"))).head().getDouble(0)
    }
    (results, scans)
  }
}
