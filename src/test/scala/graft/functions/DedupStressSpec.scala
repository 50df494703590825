package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Adversarial-corpus stress for the production dedup / linkage paths: the
  * degenerate shapes a 100 TB crawl actually contains — mega duplicate
  * families (one LSH band bucket holding thousands of identical docs),
  * Zipfian stop-shingles (one shingle in every document), and an unbounded
  * linkage block. The assertions pin EXACT answers, so these double as
  * correctness proofs under skew, not just completion smoke.
  */
class DedupStressSpec extends SparkSpec {
  import spark.implicits._

  test("nearDupPairsLsh: 1k identical docs collapse into one band bucket and still enumerate exactly") {
    // All 1000 copies share one minhash signature -> ONE bucket per band;
    // the pair expansion is bucket-local and the answer itself is C(1000,2)
    // (every pair IS a true duplicate — quadratic output is intrinsic here,
    // not plan waste). 50 distinct tail docs must not pair with anything.
    val n = 1000
    val docs = ((0 until n).map(i => (i.toLong, "the same exact document text repeated everywhere forever")) ++
      (0 until 50).map(i => (10000L + i, s"unique tail doc d${i}a d${i}b d${i}c d${i}d d${i}e")))
      .toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairsLsh(docs, "doc_id", "text", n = 4, threshold = 0.8)
    val cnt = pairs.count()
    assert(cnt === n.toLong * (n - 1) / 2, s"expected C($n,2) duplicate pairs")
    assert(pairs.agg(min(col("jaccard")), max(col("jaccard")))
      .as[(Double, Double)].head() === ((1.0, 1.0)))
    assert(pairs.filter(col("id_a") >= 10000L || col("id_b") >= 10000L).count() === 0)
  }

  test("nearDupLeadersLsh: the same 1k-family reports LINEAR output — one row per member") {
    // The leader variant must turn the quadratic all-pairs answer into 999
    // (member, leader=0) rows at jaccard 1.0 — the production shape for
    // dense families — while the 50 unique tail docs report nothing.
    val n = 1000
    val docs = ((0 until n).map(i => (i.toLong, "the same exact document text repeated everywhere forever")) ++
      (0 until 50).map(i => (10000L + i, s"unique tail doc d${i}a d${i}b d${i}c d${i}d d${i}e")))
      .toDF("doc_id", "text")
    val out = Dedup.nearDupLeadersLsh(docs, "doc_id", "text", n = 4, threshold = 0.8)
      .as[(Long, Long, Double)].collect()
    assert(out.length === n - 1, s"expected ${n - 1} member rows, got ${out.length}")
    assert(out.forall(r => r._2 == 0L && r._3 == 1.0))
    assert(out.map(_._1).toSet === (1L until n.toLong).toSet)
    // dup verdicts agree with the all-pairs generator restricted to leaders
    val pairRows = Dedup.nearDupPairsLsh(docs, "doc_id", "text", n = 4, threshold = 0.8)
      .filter(col("id_a") === 0L).count()
    assert(pairRows === (n - 1).toLong)
  }

  test("jaccardPairs dfCap: a shingle in EVERY document never enters the candidate join") {
    // Zipfian head: all 3000 docs share the lead 4-gram (df = 3000); true
    // near-dups (adjacent id pairs) share 8 UNIQUE tail shingles and differ
    // in the last word -> jaccard = 8/10 exactly. With dfCap = 100 the
    // stop-shingle is dropped from the index (its bucket would expand to
    // C(3000,2) ≈ 4.5M candidate rows); the unique shingles (df = 2) carry
    // every true pair, so the capped answer is EXACT.
    val n = 3000
    val docs = (0 until n).map { i =>
      val fam = i / 2
      val last = if (i % 2 == 0) s"t${fam}h" else s"t${fam}x"
      (i.toLong, s"u1 u2 u3 u4 t${fam}a t${fam}b t${fam}c t${fam}d t${fam}e t${fam}f t${fam}g $last")
    }.toDF("doc_id", "text")
    val got = Dedup.jaccardPairs(docs, "doc_id", "text", n = 4,
      threshold = 0.5, dfCap = 100)
      .as[(Long, Long, Double)].collect()
    assert(got.length === n / 2)
    assert(got.forall { case (a, b, j) => b == a + 1 && a % 2 == 0 && j == 0.8 })
    // Hard negatives at the 0.01 floor: every non-family pair overlaps ONLY
    // on the stop-shingle (jaccard 1/23 ≈ 0.043 >= 0.01) — the uncapped
    // index would emit ~4.5M boilerplate-only pairs; the capped path emits
    // none, and the in-band family pairs are outside [lo, hi) anyway.
    val negs = Dedup.nearMissPairs(docs, "doc_id", "text", n = 4,
      lo = 0.01, hi = 0.5, dfCap = 100)
    assert(negs.count() === 0)
  }

  test("incremental dedup: batch of 2k docs vs 10k-doc history with 50% hit rate stays exact") {
    val corpus = (0 until 10000).map(i => (i.toLong, s"corpus doc c${i}a c${i}b c${i}c"))
      .toDF("doc_id", "text")
    val batch = (0 until 2000).map { i =>
      // Even ids duplicate a history doc; odd ids are genuinely new.
      if (i % 2 == 0) (100000L + i, s"corpus doc c${i}a c${i}b c${i}c")
      else (100000L + i, s"fresh doc f${i}a f${i}b f${i}c")
    }.toDF("doc_id", "text")
    val kept = Dedup.incrementalDedup(batch, corpus, "doc_id", "text",
      expectedCorpusItems = 10000)
    assert(kept.count() === 1000)
    assert(kept.filter((col("doc_id") % 2) === 0).count() === 0)
  }

  test("fuzzyDupPairs: one unbounded mega-block completes and matches a brute-force check") {
    // 1500 short names in a SINGLE block: 1.1M in-block comparisons — the
    // documented failure mode for undisciplined block keys, exercised
    // deliberately. The blocked join must complete and agree with a local
    // brute force exactly.
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val n = 1500
    val names = (0 until n).map(i => s"${(i * 7) % 10}${(i * 13) % 10}${(i * 29) % 10}")
    val df = names.zipWithIndex
      .map { case (nm, i) => (i.toLong, nm, "B1") }
      .toDF("pid", "pname", "block")
    val got = graft.operators.Linkage.fuzzyDupPairs(
      df, "pid", "pname", Seq("block"), maxDist = 1)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2)).toSet
    val expected = (for {
      i <- 0 until n; j <- (i + 1) until n
      if lev(names(i), names(j)) <= 1
    } yield (i.toLong, j.toLong)).toSet
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("hot-band boilerplate: capped jaccard == uncapped answer while the cap engages") {
    // The q_dedup_jaccard_capped oracle-sharing claim, pinned where the
    // cap genuinely fires: a ScaleGen-hotband-shaped corpus — ONE shared
    // boilerplate sentence appended to 30% of docs (df far above the cap)
    // over distinct bodies plus planted true near-dup pairs. Pairs
    // overlapping only on boilerplate sit far below threshold, so the
    // capped answer (stop-shingles rerouted through the pair-keyed
    // decomposition) must equal the uncapped witness EXACTLY — rows,
    // scores, and all.
    val boiler = graft.tools.ScaleGen.HotBandSentence
    val docs = (0 until 600).map { i =>
      val fam = i / 2
      // 12 distinct body words per family; odd ids differ in ONE word
      // (near-dup with 8/10 shared 4-shingles); a third of FAMILIES carry
      // the boilerplate on both members (family-aligned, like real
      // template spam — one-sided boilerplate would just dilute that
      // pair's jaccard below threshold).
      val last = if (i % 2 == 0) s"b${fam}h" else s"b${fam}x"
      val body = s"w${fam}a w${fam}b w${fam}c w${fam}d w${fam}e w${fam}f " +
        s"w${fam}g w${fam}h w${fam}i w${fam}j w${fam}k $last"
      val text = if (fam % 3 == 0) s"$body $boiler" else body
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val uncapped = Dedup.jaccardPairs(docs, "doc_id", "text", n = 4, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val capped = Dedup.jaccardPairs(docs, "doc_id", "text", n = 4,
      threshold = 0.5, dfCap = 100)
      .as[(Long, Long, Double)].collect().toSet
    assert(capped === uncapped, "capped answer diverged from the witness")
    // The cap is genuinely engaged (boilerplate shingle df = 200 > 100)
    // and true pairs exist on both sides of the boilerplate divide.
    assert(uncapped.nonEmpty)
    assert(uncapped.exists { case (a, _, _) => (a / 2) % 3 == 0 } &&
      uncapped.exists { case (a, _, _) => (a / 2) % 3 != 0 })
  }

  test("hot-band boilerplate: the band bucketCap drops only stop buckets — " +
    "exact dups survive via the hash floor, losses are boiler-band-only, " +
    "candidate volume collapses") {
    // The LSH twin of the dfCap test, with the contract the band cap can
    // actually honor: unlike stop-SHINGLE rerouting (provably lossless),
    // dropping a stop BUCKET loses a near-dup pair iff EVERY band it
    // collided in was a stop band — the banding's own (1-j^r)^b recall
    // algebra, applied to b-s bands. Pin exactly that: capped ⊆ uncapped,
    // exact duplicates are never lost (content-hash floor), every lost
    // pair is boilerplate-carrying, and the candidate count collapses
    // (the quadratic stop bucket is GONE — the shape that ran 25+ min at
    // hot-band ×100 before the cap).
    val boiler = graft.tools.ScaleGen.HotBandSentence
    val docs = ((0 until 600).map { i =>
      val fam = i / 2
      val last = if (i % 2 == 0) s"b${fam}h" else s"b${fam}x"
      val body = s"w${fam}a w${fam}b w${fam}c w${fam}d w${fam}e w${fam}f " +
        s"w${fam}g w${fam}h w${fam}i w${fam}j w${fam}k $last"
      val text = if (fam % 3 == 0) s"$body $boiler" else body
      (i.toLong, text)
    } ++ (0 until 20).flatMap { e => // planted EXACT dup pairs carrying the boilerplate
      val t = s"x${e}a x${e}b x${e}c x${e}d x${e}e x${e}f x${e}g $boiler"
      Seq((10000L + 2 * e, t), (10001L + 2 * e, t))
    }).toDF("doc_id", "text")
    val cap = 16
    def pairsOf(bc: Int) =
      Dedup.nearDupPairsLsh(docs, "doc_id", "text", n = 4, threshold = 0.5,
        bucketCap = bc).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val uncapped = pairsOf(0)
    val capped = pairsOf(cap)
    assert(capped.subsetOf(uncapped), "the cap must never ADD pairs")
    val exactDups = (0 until 20).map(e => (10000L + 2 * e, 10001L + 2 * e)).toSet
    assert(exactDups.subsetOf(capped),
      "exact duplicates must survive any cap via the content-hash floor")
    val carriers = docs.as[(Long, String)].collect()
      .filter(_._2.contains(boiler)).map(_._1).toSet
    val lost = uncapped -- capped
    assert(lost.forall { case (a, b) => carriers(a) && carriers(b) },
      s"a non-boilerplate pair was lost: ${lost.filterNot { case (a, b) => carriers(a) && carriers(b) }}")
    // candidate volume: the stop bucket's quadratic expansion is gone
    val candU = Dedup.lshCandidatePairs(docs, "doc_id", "text").count()
    val candC = Dedup.lshCandidatePairs(docs, "doc_id", "text", bucketCap = cap).count()
    assert(candC * 5 < candU,
      s"cap did not collapse candidate volume (uncapped $candU, capped $candC)")
  }
}
