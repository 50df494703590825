package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** DDSketch buffer: geometric-bucket counts for positive values plus a
  * count of non-positive inputs. Merging is per-bucket SUM — fully
  * commutative and associative, so the result is a pure function of the
  * input MULTISET (partitioning/order independent), unlike rank-based
  * sketches (KLL) whose survivors depend on merge order. */
case class DdBuffer(buckets: Map[Int, Long], zeros: Long)

/** Mergeable relative-error quantile sketch (DDSketch, Masson et al.,
  * VLDB 2019) as a typed [[Aggregator]] — completes the sketch family
  * (KMV distinct, Misra–Gries frequency, CMS counts, DDSketch quantiles)
  * on the same custom-UDAF extension path.
  *
  * A positive value x lands in bucket `ceil(log_gamma(x))` with
  * `gamma = (1+alpha)/(1-alpha)`; the bucket's representative value
  * `2*gamma^i/(gamma+1)` is within relative error `alpha` of every x it
  * covers, so any quantile estimate carries the same guarantee:
  * `|est - exact_q| <= alpha * exact_q`. State is O(log_gamma(max/min))
  * buckets regardless of n — at alpha = 1% that is ~1100 buckets across
  * 15 orders of magnitude — and partials merge by bucket-count sum, so
  * the shuffle moves the sketch, not the rows. Works identically as a
  * per-group batch aggregate and as streaming state (the same contract
  * the KMV/CMS aggregators pin).
  *
  * `finish` returns the quantile BUCKET INDEXES for the requested ranks
  * (rank = ceil(q*n), 1-based; non-positive inputs sort below every
  * bucket and report `Int.MinValue`). Indexes are integers derived from
  * exact counts, so the DuckDB oracle hash-matches them; the
  * value-domain estimates come from [[DdSketchAggregator.valueOf]] and
  * their alpha-guarantee is property-tested against exact quantiles
  * (cross-engine float powers are NOT oracle-safe — a ulp of pow can
  * cross a rounding boundary).
  */
class DdSketchAggregator(alpha: Double, qs: Seq[Double])
    extends Aggregator[Double, DdBuffer, Seq[Int]] {
  require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
  require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"quantiles in (0,1], got $qs")

  private val gamma = (1 + alpha) / (1 - alpha)
  private val logGamma = math.log(gamma)

  private def bucketOf(x: Double): Int =
    math.ceil(math.log(x) / logGamma).toInt

  override def zero: DdBuffer = DdBuffer(Map.empty, 0L)

  override def reduce(b: DdBuffer, x: Double): DdBuffer =
    if (!(x > 0)) b.copy(zeros = b.zeros + 1) // non-positive (incl. NaN) -> zero class
    else {
      val i = bucketOf(x)
      b.copy(buckets = b.buckets.updated(i, b.buckets.getOrElse(i, 0L) + 1L))
    }

  override def merge(a: DdBuffer, b: DdBuffer): DdBuffer =
    DdBuffer(
      b.buckets.foldLeft(a.buckets) { case (m, (i, n)) =>
        m.updated(i, m.getOrElse(i, 0L) + n)
      },
      a.zeros + b.zeros)

  override def finish(b: DdBuffer): Seq[Int] = {
    val n = b.zeros + b.buckets.valuesIterator.sum
    val sorted = b.buckets.toSeq.sortBy(_._1)
    qs.map { q =>
      val rank = math.max(1L, math.ceil(q * n).toLong)
      if (rank <= b.zeros) Int.MinValue
      else {
        var cum = b.zeros
        var out = Int.MinValue
        val it = sorted.iterator
        while (out == Int.MinValue && it.hasNext) {
          val (i, c) = it.next()
          cum += c
          if (cum >= rank) out = i
        }
        out
      }
    }
  }

  override def bufferEncoder: Encoder[DdBuffer] = Encoders.product[DdBuffer]
  override def outputEncoder: Encoder[Seq[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
}

object DdSketchAggregator {
  /** Value-domain representative of bucket `i`: the midpoint (in relative
    * terms) of `(gamma^(i-1), gamma^i]` — within `alpha` of every value
    * the bucket covers. `Int.MinValue` (the zero class) maps to 0.0. */
  def valueOf(alpha: Double, i: Int): Double =
    if (i == Int.MinValue) 0.0
    else {
      val gamma = (1 + alpha) / (1 - alpha)
      2.0 * math.pow(gamma, i) / (gamma + 1)
    }
}
