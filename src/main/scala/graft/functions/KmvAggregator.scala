package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV distinct-count sketch as a typed [[Aggregator]] — the custom-UDAF
  * extension path (SparkSessionExtensions preference order (b): a typed
  * aggregation function when built-ins can't express the semantics).
  *
  * Unlike [[Sketches.kmvDistinct]] (a whole-frame plan for one global
  * count), this form is a first-class aggregate: usable per GROUP, with
  * partial aggregation and merge — each partition maintains an O(k) buffer
  * of the k smallest distinct hashes, partials merge associatively, so the
  * shuffle moves k values per (group, partition) instead of the raw rows.
  * That mergeability is exactly what makes sketches the 100 TB answer to
  * COUNT(DISTINCT) — and the math is the same deterministic estimator as
  * the frame version, so the DuckDB oracle can verify it bit-for-bit.
  *
  * Input = pre-hashed key ([[Sketches.knuthHash]]); buffer = ascending
  * distinct hashes, at most k.
  */
case class KmvBuffer(hs: Seq[Long])

class KmvAggregator(k: Int) extends Aggregator[Long, KmvBuffer, Double] {

  override def zero: KmvBuffer = KmvBuffer(Vector.empty)

  private def insert(hs: Seq[Long], h: Long): Seq[Long] =
    if (hs.length >= k && h >= hs.last) hs
    else {
      val i = hs.search(h)(Ordering.Long)
      i match {
        case scala.collection.Searching.Found(_) => hs // already present
        case scala.collection.Searching.InsertionPoint(p) =>
          val grown = (hs.take(p) :+ h) ++ hs.drop(p)
          if (grown.length > k) grown.take(k) else grown
      }
    }

  override def reduce(b: KmvBuffer, h: Long): KmvBuffer = KmvBuffer(insert(b.hs, h))

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer =
    KmvBuffer(b.hs.foldLeft(a.hs)(insert))

  /** (k-1) * M / h_k, or the exact buffer size when under-filled (we saw
    * every distinct hash). Rounded for cross-engine float determinism. */
  override def finish(b: KmvBuffer): Double =
    if (b.hs.length < k) b.hs.length.toDouble
    else {
      val est = (k - 1).toDouble * 2147483647.0 / b.hs.last.toDouble
      // HALF_UP to match Spark's and DuckDB's round() exactly
      BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

  override def bufferEncoder: Encoder[KmvBuffer] = Encoders.product[KmvBuffer]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
