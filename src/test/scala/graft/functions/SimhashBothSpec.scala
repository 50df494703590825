package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The combined-width SimHash pass (round-18 optimization): simhashBoth
  * computes both fingerprint widths from ONE corpus pass and must be
  * bit-for-bit identical to the separate simhash / simhash64 passes —
  * and the pair screens over the combined frame must equal the
  * from-scratch screens. */
class SimhashBothSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(seed: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(seed)
    val pool = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def txt(): String =
      (0 until (3 + rnd.nextInt(12))).map(_ => pool(rnd.nextInt(10))).mkString(" ")
    // A few exact/near duplicates so the pair screens return rows.
    val base = (1L to 60L).map(i => (i, txt()))
    val dups = base.take(8).map { case (i, t) => (i + 100L, t) }
    (base ++ dups).toDF("doc_id", "text")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("simhashBoth == simhash (32) and == simhash64, bit for bit") {
    val docs = corpus(81)
    val both = Dedup.simhashBoth(docs, "doc_id", "text").localCheckpoint()
    assert(rows(both.select("doc_id", "simhash")) ===
      rows(Dedup.simhash(docs, "doc_id", "text")),
      "32-bit fingerprints diverged")
    assert(rows(both.select(col("doc_id"), col("simhash64").as("simhash"))) ===
      rows(Dedup.simhash64(docs, "doc_id", "text")),
      "64-bit fingerprints diverged")
  }

  test("pair screens over the combined frame == the from-scratch screens " +
      "(32-bit, 64-bit, and the adaptive escape)") {
    val docs = corpus(82)
    val both = Dedup.simhashBoth(docs, "doc_id", "text").localCheckpoint()
    assert(rows(Dedup.simhashPairsFrom(both, "doc_id", maxHamming = 1)) ===
      rows(Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 1)),
      "32-bit pairs diverged")
    assert(rows(Dedup.simhashPairs64From(both, "doc_id", maxHamming = 3)) ===
      rows(Dedup.simhashPairs64(docs, "doc_id", "text", maxHamming = 3)),
      "64-bit pairs diverged")
    // Force the adaptive switch down each branch via targetOccupancy and
    // check both equal the direct screens.
    assert(rows(Dedup.simhashPairsAdaptiveFrom(docs, both, "doc_id", "text",
      maxHamming = 1, targetOccupancy = 1L << 40)) ===
      rows(Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 1)),
      "adaptive 32-bit branch diverged")
    assert(rows(Dedup.simhashPairsAdaptiveFrom(docs, both, "doc_id", "text",
      maxHamming = 1, targetOccupancy = 0L)) ===
      rows(Dedup.simhashPairs64(docs, "doc_id", "text", maxHamming = 1)),
      "adaptive 64-bit escape over the combined frame diverged")
  }
}
