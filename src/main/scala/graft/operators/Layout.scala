package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: multi-dimensional clustering for data
  * skipping. A 100 TB table sorted by one column skips files for filters on
  * THAT column only; interleaving the bits of two dimensions into one
  * Z-value (Morton code) and range-partitioning on it keeps rows close in
  * EITHER dimension close on disk, so min/max file statistics prune scans
  * for filters on both — the layout trick behind Delta/Iceberg OPTIMIZE
  * ZORDER, re-expressed as plain Spark partitioning.
  */
object Layout {

  /** Z-value (Morton code) of two non-negative integer dimensions of
    * `bits` bits each: bit i of `x` lands at output position 2i, bit i of
    * `y` at 2i+1. Pure shift/mask/add column arithmetic — codegen'd, narrow
    * (no shuffle), no UDF. Values must sit in [0, 2^bits); map real domains
    * onto that grid first (e.g. `pmod(hash(c), 2^bits)` for categorical,
    * `floor((c - min) / width)` for continuous).
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Bucket id = the top `log2(buckets)` bits of a `2*bits`-wide Z-value.
    * Because Z-values are bucketed by PREFIX, each bucket is one contiguous
    * Z-range (= one aligned square tile of the (x, y) grid): bucket i's
    * max Z < bucket i+1's min Z, which is exactly the property file-level
    * min/max statistics need for pruning. Deterministic arithmetic — no
    * global sort, no sampling pass, unlike `repartitionByRange`. */
  def zBucket(z: Column, bits: Int, buckets: Int): Column = {
    require(buckets >= 1 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    val shift = 2 * bits - java.lang.Integer.numberOfTrailingZeros(buckets)
    require(shift >= 0, s"more buckets ($buckets) than Z-values (4^$bits)")
    shiftright(z, shift)
  }

  /** Rewrite `df` into a Z-ordered layout: range-partition on the Z-value
    * of (`xCol`, `yCol`) and sort each partition by it, so a subsequent
    * parquet write produces files whose (x, y) min/max ranges tile the
    * plane — filters on either column then skip most files. One shuffle
    * (the range exchange samples Z boundaries, adapting to density skew —
    * the write-path counterpart of [[zBucket]]'s fixed grid). */
  def zorderRepartition(
      df: DataFrame, xCol: String, yCol: String,
      bits: Int, numPartitions: Int): DataFrame = {
    val withZ = df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
    withZ.repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
