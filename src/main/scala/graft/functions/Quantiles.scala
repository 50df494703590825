package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact global order statistics WITHOUT a global sort — the 100 TB answer
  * to "what is the corpus-wide p99". A global `percentile()` materializes
  * every group value in one aggregation buffer and a global ORDER BY
  * shuffles the world; this operator instead iterates histogram refinement
  * (the classic distributed k-th-element algorithm, e.g. Blelloch's
  * median-of-medians lineage): each round bins the candidate range into
  * `bins` equi-width buckets (one partial-aggregable groupBy), locates the
  * bucket containing the target rank, and recurses into it. Candidates
  * shrink ~`bins`× per round, so a trillion rows reach a driver-sized
  * remainder in 4-5 scans, each with a RANGE filter Parquet can push down.
  *
  * The per-round driver collect is a `bins`-row histogram — coordination
  * state (like AQE's stats), not data — and the final exact selection is a
  * TakeOrdered over at most `directLimit` rows. The result is an exact
  * ELEMENT of the dataset (discrete quantile, rank = ceil(q*n) — DuckDB's
  * quantile_disc convention), so the oracle verifies it regardless of
  * binning arithmetic.
  */
object Quantiles {

  def exactQuantilesDisc(
      df: DataFrame, valueCol: String, qs: Seq[Double],
      bins: Int = 1024, directLimit: Long = 65536, maxIters: Int = 8): Seq[Double] = {
    val vals = df.select(col(valueCol).cast("double").as("v")).filter(col("v").isNotNull)
    val stats = vals.agg(count(col("v")).as("n"), min(col("v")).as("mn"),
      max(col("v")).as("mx")).head()
    val n = stats.getLong(0)
    require(n > 0, "exactQuantilesDisc over an empty column")

    qs.map { q =>
      require(q >= 0.0 && q <= 1.0, s"quantile $q outside [0,1]")
      var r = math.max(1L, math.ceil(q * n).toLong) // target rank, 1-based
      var lo = stats.getDouble(1)
      var hi = stats.getDouble(2)
      var cur = vals
      var curN = n
      var iters = 0
      // Invariant: the answer is the r-th smallest of `cur`, which lies in
      // [lo, hi]. Each round narrows to one bucket of the current range.
      while (curN > directLimit && iters < maxIters && lo < hi) {
        val width = (hi - lo) / bins
        // v = hi clamps into the last bucket; the filter below reuses the
        // SAME expression, so boundary arithmetic can't disagree with the
        // histogram.
        // Clamp BOTH ends: v == hi floors to `bins`, and FP rounding in the
        // division can push a value one ulp outside [0, bins) after a
        // previous round's re-basing — an unclamped negative bin would be
        // silently skipped by the rank scan below.
        val binCol = least(lit(bins - 1L),
          greatest(lit(0L), floor((col("v") - lit(lo)) / lit(width)))).cast("long")
        val histo = cur.groupBy(binCol.as("b")).agg(count(lit(1)).as("c"))
          .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
        var acc = 0L
        var b = 0L
        while (acc + histo.getOrElse(b, 0L) < r) { acc += histo.getOrElse(b, 0L); b += 1 }
        r -= acc
        curN = histo.getOrElse(b, 0L)
        cur = cur.filter(binCol === b)
        hi = if (b == bins - 1) hi else lo + (b + 1) * width
        lo = lo + b * width
        iters += 1
      }
      require(r <= Int.MaxValue, s"residual rank $r exceeds direct-selection range")
      // Exact selection: r-th smallest of the remaining sliver (TakeOrdered —
      // bounded by directLimit except on pathological maxIters exits).
      cur.orderBy(col("v").asc).limit(r.toInt).agg(max(col("v"))).head().getDouble(0)
    }
  }
}
