package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch as a typed [[Aggregator]] — the fifth
  * mergeable sketch classic alongside KMV, Misra–Gries, count-min and
  * DDSketch (Flajolet et al. 2007, "HyperLogLog: the analysis of a
  * near-optimal cardinality estimation algorithm").
  *
  * Registers are a FIXED 2^p bytes per group regardless of cardinality —
  * the property that makes HLL the default COUNT(DISTINCT) replacement at
  * 100 TB: partials are register-wise max, so the shuffle moves 2^p bytes
  * per (group, partition) and merges associatively across any partitioning
  * (a KMV buffer is O(k) values but must stay sorted-distinct; HLL merge
  * is a branch-free byte max).
  *
  * Every step is integer-exact and cross-engine reproducible, so the
  * DuckDB oracle can verify the REGISTER STATE itself, not just a
  * tolerance band:
  *  - input hash: first 15 hex chars of md5 → a 60-bit integer
  *    (`Sketches.md5Hash60`; DuckDB `('0x' || substr(md5(x),1,15))::UBIGINT`)
  *  - bucket = top p bits; w = low (60-p) bits; rho = leading-zero count
  *    of w within the field + 1 = (60-p+1) - length(bin(w)) — `bin` is the
  *    minimal binary string in BOTH engines, so rho is integer-exact
  *  - the harmonic-mean denominator is kept as the SCALED INTEGER
  *    sum(2^(maxRho_field - rho)) (exact in int64), so no float sum order
  *    can diverge; the single final division happens once, in double.
  *
  * Small-range correction (linear counting over empty buckets) applies
  * below 2.5·m, as in the paper.
  */
case class HllBuffer(regs: Array[Byte])

case class HllResult(approx_distinct: Double, s_scaled: Long, zero_buckets: Long)

class HllAggregator(p: Int = 10) extends Aggregator[Long, HllBuffer, HllResult] {
  require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
  private val m = 1 << p
  private val wBits = 60 - p // hash is 60 bits (15 hex chars of md5)
  private val rhoMax = wBits + 1

  override def zero: HllBuffer = HllBuffer(new Array[Byte](m))

  private def rho(w: Long): Int =
    if (w == 0L) rhoMax else rhoMax - (64 - java.lang.Long.numberOfLeadingZeros(w))

  /** Negative input = the null sentinel (a 60-bit hash is non-negative):
    * skipped, so NULLs don't count as a distinct value — callers encode
    * `coalesce(md5Hash60(c), lit(-1L))` and the oracle mirrors with
    * `FILTER (WHERE c IS NOT NULL)`. */
  override def reduce(b: HllBuffer, hv: Long): HllBuffer = {
    if (hv < 0) return b
    val bucket = (hv >>> wBits).toInt
    val r = rho(hv & ((1L << wBits) - 1)).toByte
    if (r > b.regs(bucket)) b.regs(bucket) = r
    b
  }

  override def merge(a: HllBuffer, b: HllBuffer): HllBuffer = {
    var i = 0
    while (i < m) {
      if (b.regs(i) > a.regs(i)) a.regs(i) = b.regs(i)
      i += 1
    }
    a
  }

  /** alpha_m · m² / sum(2^-M_j), the denominator carried as the exact
    * scaled integer sum(2^(rhoMax - M_j)); linear counting below 2.5·m. */
  override def finish(b: HllBuffer): HllResult = {
    var s = 0L
    var zeros = 0L
    var i = 0
    while (i < m) {
      s += 1L << (rhoMax - b.regs(i))
      if (b.regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1 + 1.079 / m.toDouble)
    val scale = (1L << rhoMax).toDouble
    val raw = alpha * m.toDouble * m.toDouble * scale / s.toDouble
    val est =
      if (raw <= 2.5 * m.toDouble && zeros > 0)
        m.toDouble * Math.log(m.toDouble / zeros.toDouble)
      else raw
    HllResult(
      BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
      s, zeros)
  }

  override def bufferEncoder: Encoder[HllBuffer] = Encoders.product[HllBuffer]
  override def outputEncoder: Encoder[HllResult] = Encoders.product[HllResult]
}

object HllAggregator {
  /** 60-bit md5-prefix hash of any column, matching DuckDB
    * `('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15))::UBIGINT` — the
    * shared input contract of [[HllAggregator]] across engines. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10).cast("long")
}
