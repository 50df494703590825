package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries frequent-items sketch (buffer = at most `capacity` keyed
  * counters) + the exact two-pass heavy-hitters operator built on it.
  *
  * The sketch guarantees that every key with true frequency > n/(capacity+1)
  * survives in the buffer (candidate superset); counts inside the sketch are
  * under-estimates. Merging follows Agarwal et al., "Mergeable Summaries"
  * (PODS'12): sum counters keyed, then subtract the (capacity+1)-th largest
  * count and drop non-positives — the error bound composes, so partial
  * aggregation over any partitioning is safe.
  *
  * [[FreqItems.heavyHitters]] makes the FINAL answer exact and
  * partitioning-independent: pass 1 collects the candidate set (tiny — at
  * most `capacity` keys) with the sketch, pass 2 re-counts ONLY those keys
  * exactly (broadcast semi-join, so the shuffle carries candidate keys, not
  * the corpus vocabulary) and filters by the true threshold. Because the
  * candidate set is a guaranteed superset of every key above threshold, the
  * output equals the full exact computation — which is what the DuckDB
  * oracle verifies — while the distributed plan never materializes the full
  * vocabulary aggregation.
  */
case class MgBuffer(m: Map[String, Long])
case class MgCandidates(keys: Seq[String])

class MisraGriesAggregator(capacity: Int)
    extends Aggregator[String, MgBuffer, MgCandidates] {

  override def zero: MgBuffer = MgBuffer(Map.empty)

  override def reduce(b: MgBuffer, key: String): MgBuffer = {
    val m = b.m
    m.get(key) match {
      case Some(c) => MgBuffer(m.updated(key, c + 1))
      case None if m.size < capacity => MgBuffer(m.updated(key, 1L))
      case None =>
        // Classic MG decrement step: drop one "vote" from every counter.
        MgBuffer(m.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None })
    }
  }

  override def merge(a: MgBuffer, b: MgBuffer): MgBuffer = {
    val summed = b.m.foldLeft(a.m) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (summed.size <= capacity) MgBuffer(summed)
    else {
      // Subtract the (capacity+1)-th largest count, keep positives.
      val cut = summed.valuesIterator.toIndexedSeq.sorted(Ordering.Long.reverse)(capacity)
      MgBuffer(summed.flatMap { case (k, c) => if (c > cut) Some(k -> (c - cut)) else None })
    }
  }

  /** Candidates only (sorted for a deterministic single output row). The
    * sketch's internal counts are under-estimates — deliberately not
    * exposed; [[FreqItems.heavyHitters]]'s second pass supplies exact ones. */
  override def finish(b: MgBuffer): MgCandidates = MgCandidates(b.m.keys.toSeq.sorted)

  override def bufferEncoder: Encoder[MgBuffer] = Encoders.product[MgBuffer]
  override def outputEncoder: Encoder[MgCandidates] = Encoders.product[MgCandidates]
}

object FreqItems {

  /** Exact heavy hitters (keys with frequency >= minFraction * n) via the
    * MG-candidates + exact-recount two-pass plan. Requires
    * minFraction >= 1/(capacity+1) — the sketch's recall guarantee — so the
    * result provably equals the brute-force vocabulary aggregation. */
  def heavyHitters(
      df: DataFrame, keyCol: String,
      capacity: Int, minFraction: Double): DataFrame = {
    // STRICT bound: MG only guarantees survival for freq > n/(capacity+1),
    // while the final filter keeps cnt >= minFraction*n — at exact equality
    // a threshold-straddling key can be evicted yet belong in the output
    // (capacity=1, minFraction=0.5, stream a,b,a,b: candidates end empty
    // while brute force returns both).
    require(minFraction * (capacity + 1) > 1.0,
      s"minFraction ($minFraction) not strictly above the MG recall bound " +
        s"1/(capacity+1); raise capacity (${capacity}) or the threshold")
    val mg = udaf(new MisraGriesAggregator(capacity))
    val pass1 = df.agg(mg(col(keyCol)).as("c"), count(lit(1)).as("n_total"))
    val cands = pass1.select(col("n_total"), explode(col("c.keys")).as(keyCol))
    df.join(broadcast(cands), Seq(keyCol), "inner")
      .groupBy(col(keyCol), col("n_total"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").cast("double") >= lit(minFraction) * col("n_total").cast("double"))
      .select(col(keyCol), col("cnt").cast("long").as("cnt"),
        round(col("cnt").cast("double") / col("n_total").cast("double"), 6).as("frac"))
  }
}
