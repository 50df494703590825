package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a mergeable typed Aggregator — the
  * aggregation-shaped alternative to `row_number().over(Window)`: the
  * window formulation shuffles EVERY row of every group and sorts whole
  * partitions; this aggregator keeps an O(k) ordered buffer per group with
  * partial aggregation, so map-side combine reduces each (group,
  * partition) to at most k rows before the shuffle. When k << group size —
  * the usual case for "top 10 per key" at 100 TB — the shuffle shrinks by
  * the group size / k ratio. Ordering: ord DESC, id ASC tie-break,
  * deterministic and oracle-comparable against a row_number window.
  */
case class TopKItem(ord: Double, id: Long)
case class TopKBuffer(items: Seq[TopKItem])

class TopKAggregator(k: Int) extends Aggregator[TopKItem, TopKBuffer, TopKBuffer] {

  private val ordering: Ordering[TopKItem] =
    Ordering.by((t: TopKItem) => (-t.ord, t.id))

  override def zero: TopKBuffer = TopKBuffer(Vector.empty)

  private def insert(items: Seq[TopKItem], x: TopKItem): Seq[TopKItem] =
    if (items.length >= k && ordering.gteq(x, items.last)) items
    else {
      val p = items.search(x)(ordering).insertionPoint
      val grown = (items.take(p) :+ x) ++ items.drop(p)
      if (grown.length > k) grown.take(k) else grown
    }

  override def reduce(b: TopKBuffer, x: TopKItem): TopKBuffer = TopKBuffer(insert(b.items, x))

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer =
    TopKBuffer(b.items.foldLeft(a.items)(insert))

  override def finish(b: TopKBuffer): TopKBuffer = b

  override def bufferEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
  override def outputEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
}
