package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the beyond-reference operator families (SURVEY.md §7.6). */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different content about spark engines and data"),
    (4L, "THE  Quick brown fox jumps over the lazy dog"), // exact dup of 1 after normalize? (no: 'THE Quick' lowers to 'the quick')
    (5L, "tiny doc"),
    (6L, "the quick brown fox jumps over the lazy dog") // exact copy of 1
  ).toDF("doc_id", "text")

  test("exact dedup: normalized duplicates collapse to min-id survivor") {
    val got = Dedup.exact(docs, "doc_id", "text")
      .select("doc_id", "survivor_id", "is_duplicate")
      .as[(Long, Long, Boolean)].collect().map { case (a, b, c) => a -> ((b, c)) }.toMap
    assert(got(4L) === ((1L, true)))  // lower+collapse-ws == doc 1
    assert(got(6L) === ((1L, true)))  // byte-identical
    assert(got(1L) === ((1L, false)))
    assert(got(2L) === ((2L, false))) // near-dup is NOT exact-dup
  }

  test("exactWithPolicy: the preferred-source copy survives, not the min id") {
    val prioritized = Seq(
      (1L, "same text here", 1),  // crawl copy, lowest id
      (2L, "same text here", 0),  // curated copy — must win despite higher id
      (3L, "same text here", 1),
      (4L, "unique", 0)
    ).toDF("doc_id", "text", "prio")
    val got = Dedup.exactWithPolicy(prioritized, "doc_id", "text", "prio")
      .select("doc_id", "survivor_id", "is_duplicate")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((2L, true)))
    assert(got(2L) === ((2L, false)))
    assert(got(3L) === ((2L, true)))
    assert(got(4L) === ((4L, false)))
  }

  test("minhash signatures: identical docs share all sigs, near-dups share most") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, k = 8)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(i => r.getString(i))).toMap
    assert(sigs(1L) === sigs(6L)) // identical text -> identical shingle set
    // doc 4 differs in case ("THE Quick"): shingles are case-sensitive, so
    // only the case-unaffected tail shingles agree
    val shared14 = sigs(1L).zip(sigs(4L)).count { case (a, b) => a == b }
    assert(shared14 >= 2 && shared14 < 8)
    val shared12 = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b }
    assert(shared12 >= 4, s"near-dups should share most minhashes, shared $shared12")
    val shared13 = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(shared13 === 0)
  }

  test("LSH candidate pairs contain the true near-dup pair, not unrelated docs") {
    val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 6L)))
    assert(!pairs.contains((1L, 3L)))
    assert(!pairs.contains((3L, 5L)))
  }

  test("jaccard pairs: exact similarity with threshold") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs.contains((1L, 6L)))
    assert(pairs((1L, 6L)) === 1.0) // identical 3-gram sets
    // docs 1/2 differ only in the last word: 6 of 7 shingles shared -> 6/8
    assert(pairs.contains((1L, 2L)))
    assert(math.abs(pairs((1L, 2L)) - 0.75) < 1e-9)
  }

  test("jaccard dfCap prunes stop-shingle candidates but keeps exact scores") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5, dfCap = 3)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    // Candidates come from the capped index, but jaccard is EXACT (full sets):
    assert(pairs.contains((1L, 2L)))
    assert(math.abs(pairs((1L, 2L)) - 0.75) < 1e-9)
  }

  test("nearDupPairsLsh: exact-dup floor guaranteed, no false positives vs exact jaccard") {
    // Exact duplicates (1,6) must survive at any threshold regardless of
    // sketch parameters — the content-hash floor.
    val high = Dedup.nearDupPairsLsh(docs, "doc_id", "text", n = 3, threshold = 0.9)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(high.keySet === Set((1L, 6L)))
    assert(high((1L, 6L)) === 1.0)
    // Every emitted pair is exact-verified: it must appear in the uncapped
    // exact generator with the IDENTICAL jaccard (candidates only prune,
    // never alter scores).
    val got = Dedup.nearDupPairsLsh(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    got.foreach { case (k, j) => assert(exact.get(k).contains(j), s"pair $k") }
  }

  test("simhashPairs: banded candidates equal brute-force hamming pairs (pigeonhole)") {
    // The 4-band split is EXACT for maxHamming <= 3: verify against the
    // all-pairs definition on a corpus with near-dups, exact dups and noise.
    val sh = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (maxH <- Seq(0, 1, 3)) {
      val got = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = maxH)
        .as[(Long, Long, Long)].collect().toSet
      val expected = (for {
        a <- sh.keys; b <- sh.keys if a < b
        h = java.lang.Long.bitCount(sh(a) ^ sh(b)) if h <= maxH
      } yield (a, b, h.toLong)).toSet
      assert(got === expected, s"maxHamming=$maxH")
    }
    // identical docs (1,6) are hamming 0 and must always pair
    assert(Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 0)
      .as[(Long, Long, Long)].collect().toSet.contains((1L, 6L, 0L)))
  }

  test("simhash64Pairs: banded candidates equal brute force; identical docs hamming 0") {
    val sh = Dedup.simhash64(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (maxH <- Seq(0, 3, 7)) {
      val got = Dedup.simhashPairs64(docs, "doc_id", "text", maxHamming = maxH)
        .as[(Long, Long, Long)].collect().toSet
      val expected = (for {
        a <- sh.keys; b <- sh.keys if a < b
        h = java.lang.Long.bitCount(sh(a) ^ sh(b)) if h <= maxH
      } yield (a, b, h.toLong)).toSet
      assert(got === expected, s"maxHamming=$maxH")
    }
    // identical docs (1,6): same token multiset -> same 64-bit hash
    assert(sh(1L) === sh(6L))
    // the low 32 bits are NOT just the 32-bit hash (independent votes):
    // near-dups stay close, unrelated docs far — in 64-bit space
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(2L)) <= 16)
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(3L)) > 16)
  }

  test("simhashPairsAdaptive: width switches on the count-derived threshold, results match the chosen width") {
    // Below the band-saturation threshold the adaptive path IS the 32-bit
    // path; above it (forced via rowCount — the lazy-sizing escape) it IS
    // the 64-bit path. The threshold law itself is integer-exact.
    val thr = Dedup.simhashWidthThreshold(1)
    assert(thr === (1L << 16) * 64)
    assert(Dedup.simhashWidthThreshold(3) === (1L << 8) * 64)
    val got32 = Dedup.simhashPairsAdaptive(docs, "doc_id", "text", maxHamming = 1)
      .as[(Long, Long, Long)].collect().toSet
    val want32 = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got32 === want32)
    val got64 = Dedup.simhashPairsAdaptive(docs, "doc_id", "text",
        maxHamming = 1, rowCount = thr + 1)
      .as[(Long, Long, Long)].collect().toSet
    val want64 = Dedup.simhashPairs64(docs, "doc_id", "text", maxHamming = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got64 === want64)
  }

  test("incrementalNearDupPairs: batch-vs-corpus pairs match the exact cross join") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different content about spark engines and data"),
      (3L, "sphinx of black quartz judge my vow now")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
      (11L, "the quick brown fox jumps over the lazy dog !"), // near dup of 1
      (12L, "wholly novel text with no relatives anywhere")
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalNearDupPairs(batch, corpus, "doc_id", "text",
      n = 3, threshold = 0.7)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(got.keySet.contains((1L, 10L)))
    assert(got((1L, 10L)) === 1.0)
    assert(got.keySet.contains((1L, 11L))) // 7 of 8 shingles shared = 0.875
    assert(!got.keySet.exists { case (_, b) => b == 12L })
    // no corpus-corpus or batch-batch pairs leak in
    assert(got.keySet.forall { case (a, b) => a <= 3L && b >= 10L })
  }

  test("repeatedNgramProfile: cross-doc spans flagged, within-doc repeats ignored") {
    val d = Seq(
      (1L, "alpha beta gamma delta tail one"),    // shares 4-gram with doc 2
      (2L, "alpha beta gamma delta tail two"),    // shares 4-gram with doc 1
      (3L, "unique words only here nothing shared"),
      (4L, "rep rep rep rep rep rep rep rep")     // self-repeats, no cross-doc
    ).toDF("doc_id", "text")
    val got = Dedup.repeatedNgramProfile(d, "doc_id", "text", n = 4, minDocs = 2)
      .as[(Long, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._5))).toMap
    // docs 1,2: 6 tokens -> 3 4-gram positions; the shared prefix gives
    // "alpha beta gamma delta" + "beta gamma delta tail" repeated (pos 1,2);
    // "gamma delta tail one/two" differ.
    assert(got(1L) === ((3L, 2L, 1L)))
    assert(got(2L) === ((3L, 2L, 1L)))
    assert(got(3L) === ((3L, 0L, -1L)))
    // doc 4's "rep rep rep rep" occurs at 5 positions WITHIN one doc but in
    // no other doc: cross-doc df = 1 -> not repeated.
    assert(got(4L) === ((5L, 0L, -1L)))
  }

  test("clusterLabels: transitive chains collapse to one min-id cluster") {
    // A~B and B~C but no A~C pair: pairwise dedup misses the group; the
    // component labeling must not.
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val labels = Dedup.clusterLabels(nodes, "doc_id", pairs, iterations = 5)
      .as[(Long, Long)].collect().toMap
    assert(labels(1L) === 1L && labels(2L) === 1L && labels(3L) === 1L)
    assert(labels(4L) === 4L && labels(5L) === 4L)
  }

  test("simhash: identical token multisets give identical hashes; near-dups close") {
    val h = Dedup.simhash(docs, "doc_id", "text").as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(1L), h(2L)) <= 8, "near-dups should be close in hamming space")
    assert(h.values.forall(v => v >= 0 && v <= 0xffffffffL))
  }

  private val vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(0.9f, 0.1f, 0f, 0f)),  // close to 0
    (2L, Array(0f, 1f, 0f, 0f)),      // orthogonal
    (3L, Array(-1f, 0f, 0f, 0f))      // opposite
  ).toDF("vec_id", "embedding")

  test("brute-force top-k: correct neighbor order, self excluded") {
    val got = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), "vec_id", "embedding", 3)
      .select("vec_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L)) // by cosine: 0.99, 0, -1
  }

  test("bucketed top-k only searches same sign-bucket (scale-path recall tradeoff)") {
    val got = Similarity.bucketedTopK(vecs, vecs.filter($"vec_id" === 0), "vec_id", "embedding", 3, bits = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(got.contains(1L))  // same bucket, found
    assert(!got.contains(3L)) // negative first dim -> different bucket, unsearched
  }

  test("embedding dup pairs: threshold filters to genuinely close pairs") {
    val pairs = Similarity.embeddingDupPairs(vecs, "vec_id", "embedding", 0.9)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((0L, 1L)))
  }

  test("pqEncode: codes equal brute-force per-subspace argmin, ties to lowest codebook id") {
    val data = Seq(
      0L -> Array(1f, 0f, 0f, 0f),
      1L -> Array(0.9f, 0.1f, 0.5f, 0.5f),
      2L -> Array(0f, 1f, 0f, 0f),
      3L -> Array(0.95f, 0.05f, 0.4f, 0.6f),
      4L -> Array(-1f, 0f, 0.5f, 0.4f))
    val df = data.toDF("vec_id", "embedding")
    // Brute-force expectation: codebooks = subvectors of vecs 0 and 1.
    val m = 2; val d0 = 2
    val cents = data.take(2)
    def d2(a: Array[Float], b: Array[Float], off: Int): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        (0 until d0).map(i => x(off + i).toDouble * y(off + i).toDouble).sum
      BigDecimal(dot(a, a) + dot(b, b) - 2.0 * dot(a, b))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = data.map { case (id, v) =>
      val codes = (0 until m).map { s =>
        cents.map { case (cid, cv) => (d2(v, cv, s * d0), cid) }.min._2
      }
      (id, codes(0), codes(1))
    }.toSet
    val got = Similarity.pqEncode(df, "vec_id", "embedding", dims = 4, m = 2, ksub = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("pqAdcTopK: matches brute-force ADC over the codes, partition-invariant") {
    val data = (0L until 12L).map { i =>
      i -> Array.tabulate(4)(j => (((i * 7 + j * 3) % 11).toFloat - 5f) / 3f)
    }
    val df = data.toDF("vec_id", "embedding")
    val m = 2; val d0 = 2; val ksub = 3
    val cents = data.take(ksub)
    def dot(x: Array[Float], y: Array[Float], off: Int) =
      (0 until d0).map(i => x(off + i).toDouble * y(off + i).toDouble).sum
    def d2(a: Array[Float], b: Array[Float], off: Int) =
      dot(a, a, off) + dot(b, b, off) - 2.0 * dot(a, b, off)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // brute-force: encode all vectors, then ADC per query over fixed-point sums
    val codes = data.map { case (id, v) =>
      id -> (0 until m).map(s => cents.minBy { case (cid, cv) => (r6(d2(v, cv, s * d0)), cid) }._1)
    }.toMap
    val queries = data.take(2)
    val expected = queries.flatMap { case (qid, qv) =>
      val scored = data.filter(_._1 != qid).map { case (vid, _) =>
        val fp = (0 until m).map { s =>
          val cw = cents.find(_._1 == codes(vid)(s)).get._2
          math.round(d2(qv, cw, s * d0) * 1e6)
        }.sum
        (vid, fp)
      }.sortBy { case (vid, fp) => (fp, vid) }.take(3)
      scored.zipWithIndex.map { case ((vid, fp), i) =>
        (qid, vid, r6(fp.toDouble / 1e6), (i + 1).toLong)
      }
    }.toSet
    for (p <- Seq(1, 5)) {
      val got = Similarity.pqAdcTopK(df.repartition(p), df.filter($"vec_id" < 2),
        "vec_id", "embedding", dims = 4, m = m, ksub = ksub, k = 3)
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(got === expected, s"partitions=$p")
    }
  }

  test("semanticDedupPairs: pairs only within a cluster, subset of exact pairs") {
    // 6 vectors, nlist=2 -> centroids are vecs 0 and 1 (orthogonal axes).
    // 0,2,3 cluster on centroid 0; 1,4 on centroid 1; 5 sits opposite
    // centroid 1 but still assigns somewhere deterministic.
    val six = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(0.95f, 0.05f, 0f, 0f)),  // near-dup of 0, same cluster
      (3L, Array(0.9f, 0.1f, 0f, 0f)),    // near-dup of 0 and 2
      (4L, Array(0.05f, 0.95f, 0f, 0f)),  // near-dup of 1, other cluster
      (5L, Array(0f, -1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.semanticDedupPairs(six, "vec_id", "embedding",
      threshold = 0.9, nlist = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Similarity.embeddingDupPairs(six, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(exact), s"semantic pairs $got must be a subset of exact $exact")
    // Within-cluster near-dups are all found
    assert(Set((0L, 2L), (0L, 3L), (2L, 3L), (1L, 4L)).subsetOf(got))
    // Every pair shares a cluster: ids from different centroids never pair
    val clusters = Map(0L -> 0L, 2L -> 0L, 3L -> 0L, 1L -> 1L, 4L -> 1L)
    got.foreach { case (a, b) =>
      assert(clusters.get(a) === clusters.get(b), s"cross-cluster pair ($a,$b)")
    }
  }

  test("adaptiveSignBits: occupancy-bounded, clamped, monotone in n") {
    import Similarity.adaptiveSignBits
    assert(adaptiveSignBits(500) === 8)          // under 64*2^8, floor holds
    assert(adaptiveSignBits(64L << 8) === 8)     // exactly at occupancy bound
    assert(adaptiveSignBits((64L << 8) + 1) === 9)
    assert(adaptiveSignBits(2000000) === 15)     // the ×100 regime
    assert(adaptiveSignBits(Long.MaxValue / 2) === 20) // ceiling clamp
    val ns = Seq(100L, 10000L, 1000000L, 100000000L)
    assert(ns.map(adaptiveSignBits(_)) === ns.map(adaptiveSignBits(_)).sorted)
  }

  test("embeddingDupPairsBucketed: adaptive default == fixed bits at small n") {
    val vecs = (0L until 40L).toDF("vec_id")
      .selectExpr("vec_id",
        "transform(sequence(0, 7), i -> CAST(CASE WHEN (vec_id + i) % 3 = 0 THEN -1.0 ELSE 1.0 END AS FLOAT)) AS embedding")
    val adaptive = Similarity.embeddingDupPairsBucketed(vecs, "vec_id", "embedding", 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val fixed = Similarity.embeddingDupPairsBucketed(vecs, "vec_id", "embedding", 0.5, bits = 8)
      .as[(Long, Long, Double)].collect().toSet
    assert(adaptive === fixed) // 40 vectors < 64·2^8 -> adaptive resolves to 8
    assert(adaptive.nonEmpty)
  }

  test("embeddingDedupLeaders: member-vs-leader only, dups subset of exact pairs") {
    val vecs = Seq(
      (0L, Array(1f, 0.1f, 0f, 0f)),   // leader of the +,+ bucket family
      (1L, Array(0.98f, 0.12f, 0f, 0f)), // near-dup of 0
      (2L, Array(0.97f, 0.09f, 0f, 0f)), // near-dup of 0
      (3L, Array(0.1f, 1f, 0f, 0f)),   // same sign bucket, NOT a dup of 0
      (4L, Array(-1f, 0.5f, 0f, 0f))   // different bucket, alone
    ).toDF("vec_id", "embedding")
    val got = Similarity.embeddingDedupLeaders(vecs, "vec_id", "embedding",
      threshold = 0.95, bits = 4)
      .as[(Long, Long, Double)].collect().toSet
    assert(got.map(r => (r._1, r._2)) === Set((1L, 0L), (2L, 0L)))
    // every reported dup is a true pair of the exact generator
    val exact = Similarity.embeddingDupPairs(vecs, "vec_id", "embedding", 0.95)
      .as[(Long, Long, Double)].collect().toSet.map((r: (Long, Long, Double)) => (r._1, r._2))
    assert(got.map(r => (math.min(r._1, r._2), math.max(r._1, r._2))).subsetOf(exact))
    // leaders never report against themselves
    assert(!got.exists(r => r._1 == r._2))
  }

  test("chunkDocs: stride/overlap arithmetic, truncation, single-chunk floor") {
    val d = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (2L, "short doc"))
      .toDF("doc_id", "text")
    // chunk=4, overlap=1 -> stride=3: doc 1 (10 tokens) -> ceil(9/3)=3 chunks
    val got = TextAnalysis.chunkDocs(d, "doc_id", "text", chunkTokens = 4, overlap = 1)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got((1L, 0L)) === ((1L, 4L, "t1 t2 t3 t4")))
    assert(got((1L, 1L)) === ((4L, 4L, "t4 t5 t6 t7")))   // 1-token overlap
    assert(got((1L, 2L)) === ((7L, 4L, "t7 t8 t9 t10")))
    assert(got((2L, 0L)) === ((1L, 2L, "short doc")))     // under-budget doc: 1 chunk
    assert(got.size === 4)
    // Every token of doc 1 appears in some chunk (coverage, no gaps)
    val covered = got.collect { case ((1L, _), (_, _, txt)) => txt.split(" ") }.flatten.toSet
    assert(covered === (1 to 10).map(i => s"t$i").toSet)
  }

  test("multimodal: stubbed decode is deterministic, plumbing batches by bytes") {
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(media, targetBytesPerTask = 64)
    val rows = feats.collect().sortBy(_.media_id)
    assert(rows.length === 6)
    assert(rows.forall(_.features.length === Multimodal.FeatureDim))
    assert(rows.forall(r => r.n_bytes > 0 && r.width >= 16 && r.height >= 16))
    // determinism: rerun gives identical checksums
    val again = Multimodal.extractFeatures(media, targetBytesPerTask = 1024)
      .collect().sortBy(_.media_id)
    assert(rows.map(_.checksum).toSeq === again.map(_.checksum).toSeq)
    assert(rows.map(_.features.toSeq).toSeq === again.map(_.features.toSeq).toSeq)
  }

  private def pngBytes(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("multimodal: REAL PNG decode — true dimensions and exact channel stats") {
    // Solid red 32x16: means (1, 0, 0), stds 0, all luma in bin 76>>5 = 2.
    val red = pngBytes(32, 16)((_, _) => 0xff0000)
    val media = Seq(Multimodal.MediaFile(1L, "image", red, "fixture")).toDS()
    val r = Multimodal.extractFeatures(media).collect().head
    assert(r.width === 32 && r.height === 16)      // REAL decoded dims
    assert(r.features(0) === 1.0f)                 // r mean
    assert(r.features(1) === 0.0f && r.features(2) === 0.0f)
    assert(r.features(3) === (76.0 / 255.0).toFloat) // luma mean (299*255/1000=76)
    assert((4 to 7).forall(i => r.features(i) === 0.0f)) // solid color: zero std
    assert(r.features(8 + 2) === 1.0f)             // all pixels in luma bin 2
    assert((8 until 16).filter(_ != 10).forall(i => r.features(i) === 0.0f))
  }

  test("multimodal: PNG round-trip is partitioning-deterministic; gradient stats sane") {
    val grad = pngBytes(64, 32)((x, y) => ((x * 4) << 16) | ((y * 8) << 8) | 0x40)
    val media = Seq(
      Multimodal.MediaFile(1L, "image", grad, "g"),
      Multimodal.MediaFile(2L, "image", grad, "g"))
    val a = Multimodal.extractFeatures(media.toDS()).collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(media.toDS().repartition(5))
      .collect().sortBy(_.media_id)
    assert(a.map(_.features.toSeq).toSeq === b.map(_.features.toSeq).toSeq)
    assert(a.forall(r => r.width === 64 && r.height === 32))
    assert(a.head.features(4) > 0f) // gradient: nonzero red std
    // histogram bins sum to 1 (every pixel binned exactly once)
    val histSum = a.head.features.drop(8).map(_.toDouble).sum
    assert(math.abs(histSum - 1.0) < 1e-5)
  }

  test("multimodal: REAL resize — target dims, preserved color, pass-through for non-images") {
    // Solid red stays solid red at any size (bilinear over a constant field).
    val red = pngBytes(32, 16)((_, _) => 0xff0000)
    val resized = Multimodal.resizeImage(red, 8, 8).get
    val dec = Multimodal.decodeImage(resized).get
    assert(dec._1 === 8 && dec._2 === 8)
    assert(dec._3(0) === 1.0f && dec._3(1) === 0.0f && dec._3(2) === 0.0f)
    // Half-black/half-white 32x32 -> 8x8: mean luma stays ~0.5.
    val split = pngBytes(32, 32)((x, _) => if (x < 16) 0x000000 else 0xffffff)
    val splitDec = Multimodal.decodeImage(Multimodal.resizeImage(split, 8, 8).get).get
    assert(math.abs(splitDec._3(3) - 0.5f) < 0.07f, s"luma mean ${splitDec._3(3)}")
    // Dataset-level: images resized, audio payloads untouched, total on garbage.
    val media = Seq(
      Multimodal.MediaFile(1L, "image", red, "f"),
      Multimodal.MediaFile(2L, "audio", Array[Byte](1, 2, 3), "f"),
      Multimodal.MediaFile(3L, "image", Array[Byte](9, 9), "f")) // undecodable
    val out = Multimodal.resizeImages(media.toDS(), 8, 8).collect().sortBy(_.media_id)
    assert(Multimodal.decodeImage(out(0).payload).get._1 === 8)
    assert(out(1).payload.toSeq === Seq[Byte](1, 2, 3))
    assert(out(2).payload.toSeq === Seq[Byte](9, 9)) // pass-through, no throw
    // Determinism: identical bytes on a rerun.
    val rerun = Multimodal.resizeImages(media.toDS().repartition(3), 8, 8)
      .collect().sortBy(_.media_id)
    assert(out.map(_.payload.toSeq).toSeq === rerun.map(_.payload.toSeq).toSeq)
  }

  test("multimodal: resize composites RGBA transparency onto white, not black") {
    // Fully-transparent ARGB source: every pixel must come out white —
    // the TYPE_INT_RGB default would flatten alpha onto black.
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, if (x < 8) 0x00000000 else 0xffff0000.toInt) // left transparent, right opaque red
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val dec = Multimodal.decodeImage(Multimodal.resizeImage(baos.toByteArray, 16, 16).get).get
    val out = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.resizeImage(baos.toByteArray, 16, 16).get))
    assert((out.getRGB(0, 0) & 0xffffff) === 0xffffff, "transparent region must be white")
    assert((out.getRGB(15, 0) & 0xffffff) === 0xff0000, "opaque region keeps its color")
    assert(dec._1 === 16 && dec._2 === 16)
  }

  test("multimodal: REAL WAV decode — frame count, channels, RMS/peak envelope") {
    // 16-bit PCM mono square wave at half amplitude: RMS = peak = 0.5 exactly.
    val nFrames = 8000
    val pcm = new Array[Byte](nFrames * 2)
    for (f <- 0 until nFrames) {
      val s: Short = if (f % 2 == 0) 16384 else -16384
      pcm(2 * f) = (s & 0xff).toByte          // little-endian
      pcm(2 * f + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val media = Seq(Multimodal.MediaFile(7L, "audio", baos.toByteArray, "wav")).toDS()
    val r = Multimodal.extractFeatures(media).collect().head
    assert(r.width === nFrames) // frames
    assert(r.height === 1)      // channels
    assert((0 until 8).forall(i => math.abs(r.features(i) - 0.5f) < 1e-4f))  // RMS
    assert((8 until 16).forall(i => r.features(i) === 0.5f))                 // peak
  }

  private def envelopeWav(amps: Seq[Double], framesPerWindow: Int = 64): Array[Byte] = {
    // 16-bit PCM mono square wave whose amplitude steps per window — the
    // energy envelope is exactly `amps`, so audioHash bits are known.
    val nFrames = amps.length * framesPerWindow
    val pcm = new Array[Byte](nFrames * 2)
    for (f <- 0 until nFrames) {
      val a = amps(f / framesPerWindow)
      val mag = math.min(32767, (a * 32767).toInt)
      val s: Short = (if (f % 2 == 0) mag else -mag).toShort
      pcm(2 * f) = (s & 0xff).toByte
      pcm(2 * f + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("multimodal: audioHash is the envelope difference hash, volume-invariant") {
    // Alternating loud/quiet windows: bit i = (window i+1 louder) = i even.
    val amps = (0 until 65).map(i => if (i % 2 == 0) 0.2 else 0.8)
    val h = Multimodal.audioHash(envelopeWav(amps)).get
    (0 until 64).foreach { i =>
      assert(((h >> i) & 1L) === (if (i % 2 == 0) 1L else 0L),
        s"bit $i wrong in ${h.toBinaryString}")
    }
    // Uniform volume scaling preserves every energy comparison.
    val scaled = Multimodal.audioHash(envelopeWav(amps.map(_ * 0.5))).get
    assert(scaled === h, "volume-scaled copy must collide exactly")
    // A different envelope yields a different fingerprint.
    val other = Multimodal.audioHash(
      envelopeWav((0 until 65).map(i => 0.1 + 0.8 * (i / 64.0)))).get
    assert(other !== h)
    // Too short to window (< 65 frames) and undecodable bytes: None.
    assert(Multimodal.audioHash(envelopeWav(Seq.fill(65)(0.5), 0)).isEmpty)
    assert(Multimodal.audioHash(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("multimodal: audioDupPairs pairs the re-normalized copy, not the different track") {
    val amps = (0 until 65).map(i => if (i % 3 == 0) 0.9 else 0.3)
    val media = Seq(
      Multimodal.MediaFile(1L, "audio", envelopeWav(amps), "a"),
      Multimodal.MediaFile(2L, "audio", envelopeWav(amps.map(_ * 0.4)), "a-quiet"),
      Multimodal.MediaFile(3L, "audio",
        envelopeWav((0 until 65).map(i => 0.1 + 0.8 * ((i % 7) / 7.0))), "b"),
      Multimodal.MediaFile(4L, "image", Array[Byte](1, 2, 3), "not-audio"),
      Multimodal.MediaFile(5L, "audio", Array[Byte](9, 9, 9), "corrupt")).toDS()
    val pairs = Multimodal.audioDupPairs(media, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)),
      s"expected exactly the volume-scaled pair, got $pairs")
  }

  test("multimodal: REAL animated-GIF video decode — frame sampling and motion envelope") {
    // 4 frames of increasing uniform brightness: sampled lumas rise, motion
    // deltas are positive; dims come from the real decoded frames.
    val frames = Seq(40, 80, 120, 160).map { v =>
      val img = new java.awt.image.BufferedImage(
        20, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 10; x <- 0 until 20) img.setRGB(x, y, (v << 16) | (v << 8) | v)
      img
    }
    val baos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f =>
      writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
    writer.endWriteSequence(); ios.close(); writer.dispose()

    val media = Seq(Multimodal.MediaFile(11L, "video", baos.toByteArray, "gif")).toDS()
    val r = Multimodal.extractFeatures(media).collect().head
    assert(r.width === 20 && r.height === 10)
    // 8 samples over 4 frames hit each frame twice: luma sequence rises.
    val lumas = r.features.take(8)
    assert(lumas.head === (40.0 / 255.0).toFloat)
    assert(lumas.last === (160.0 / 255.0).toFloat)
    assert(lumas.sliding(2).forall(p => p(1) >= p(0)))
    // motion envelope: at least the frame transitions are nonzero
    assert(r.features.drop(8).count(_ > 0f) >= 3)
    // single-frame payloads are NOT videos: falls back to the stub
    assert(Multimodal.decodeVideo(pngBytes(8, 8)((_, _) => 0)).isEmpty)
  }

  test("multimodal: undecodable payloads fall back to the labeled stub") {
    val garbage = "definitely not an image".getBytes("UTF-8")
    val expected = Multimodal.decodeStub("image", garbage)
    val media = Seq(Multimodal.MediaFile(9L, "image", garbage, "bad")).toDS()
    val r = Multimodal.extractFeatures(media).collect().head
    assert((r.width, r.height) === ((expected._1, expected._2)))
    assert(r.features.toSeq === expected._3.toSeq)
    assert(Multimodal.decodeImage(garbage).isEmpty)
    assert(Multimodal.decodeAudio(garbage).isEmpty)
  }

  test("perceptual dHash/aHash on REAL PNGs: re-encodes cluster, distinct images don't") {
    def gray(v: Int) = (v << 16) | (v << 8) | v
    // Horizontal gradient: every grid cell is brighter than its left
    // neighbor -> dHash = all 64 bits set.
    val grad = pngBytes(72, 32)((x, _) => gray(x * 255 / 71))
    assert(Multimodal.dHash(grad).get === -1L)
    // Inverted gradient: strictly darkening -> all bits clear.
    val inv = pngBytes(72, 32)((x, _) => gray(255 - x * 255 / 71))
    assert(Multimodal.dHash(inv).get === 0L)
    // A near-identical re-render (slightly different size, same gradient):
    // dHash is scale-invariant by construction here.
    val grad2 = pngBytes(144, 64)((x, _) => gray(x * 255 / 143))
    val ham = java.lang.Long.bitCount(
      Multimodal.dHash(grad).get ^ Multimodal.dHash(grad2).get)
    assert(ham <= 2, s"near-dup hamming $ham")
    // aHash separates bright-right from bright-left and survives re-render
    assert(Multimodal.aHash(grad).get !== Multimodal.aHash(inv).get)
    assert(java.lang.Long.bitCount(
      Multimodal.aHash(grad).get ^ Multimodal.aHash(grad2).get) <= 2)
    // sub-grid images refuse to hash; garbage takes the checksum stub
    assert(Multimodal.dHash(pngBytes(4, 4)((_, _) => 0)).isEmpty)
    val garbage = "not an image".getBytes("UTF-8")
    assert(Multimodal.perceptualHash("image", garbage) ===
      Multimodal.payloadChecksum(garbage))
  }

  test("perceptualDupPairs finds the near-identical PNG pair and nothing else") {
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val a = pngBytes(72, 32)((x, _) => gray(x * 255 / 71))
    val b = pngBytes(144, 64)((x, _) => gray(x * 255 / 143)) // re-render of a
    val c = pngBytes(72, 32)((x, _) => gray(255 - x * 255 / 71)) // inverted
    // step image: one rising edge -> 8 bits set, hamming 8 from both
    // gradient (all-ones) is 56 and flat-inverted (all-zeros) is 8 > k
    val d = pngBytes(72, 32)((x, _) => gray(if (x < 36) 0 else 255))
    // Adversarial stub population: identical garbage payloads as an
    // undecodable "image", an audio row, and a video row. Their 32-bit
    // checksum stubs collide exactly — but stub hashes must be EXCLUDED
    // from the image banding entirely (zero upper bits would saturate the
    // high 64-bit bands into one corpus-wide bucket, and a checksum
    // collision is not an image near-dup).
    val junk = "not an image at all".getBytes("UTF-8")
    val media = Seq(
      Multimodal.MediaFile(1L, "image", a, "s"),
      Multimodal.MediaFile(2L, "image", b, "s"),
      Multimodal.MediaFile(3L, "image", c, "s"),
      Multimodal.MediaFile(4L, "image", d, "s"),
      Multimodal.MediaFile(5L, "image", junk, "s"),
      Multimodal.MediaFile(6L, "audio", junk, "s"),
      Multimodal.MediaFile(7L, "video", junk, "s")).toDS()
    val pairs = Multimodal.perceptualDupPairs(media, maxHamming = 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) === Seq((1L, 2L)))
    assert(pairs.head._3 <= 2)
  }

  test("checksumDupPairs pairs stub hashes per kind, never across kinds or decodes") {
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val img = pngBytes(72, 32)((x, _) => gray(x * 255 / 71))
    val junk = "shared garbage payload".getBytes("UTF-8")
    val other = "a different payload".getBytes("UTF-8")
    val media = Seq(
      Multimodal.MediaFile(1L, "audio", junk, "s"),  // same checksum as 2, 4
      Multimodal.MediaFile(2L, "audio", junk, "s"),
      Multimodal.MediaFile(3L, "audio", other, "s"),
      Multimodal.MediaFile(4L, "video", junk, "s"),  // same bytes, other kind
      Multimodal.MediaFile(5L, "image", img, "s")).toDS() // real dHash: excluded
    val pairs = Multimodal.checksumDupPairs(media, maxHamming = 0)
      .as[(String, Long, Long, Long)].collect().toSeq
    // only the same-kind identical-payload pair survives; the video row
    // with the identical checksum and the decoded image never pair
    assert(pairs === Seq(("audio", 1L, 2L, 0L)))
  }

  test("hammingPairs banding is exact: equals brute force at several k, incl. k=0") {
    // Deterministic pseudo-random 64-bit hashes + planted near-pairs.
    val base = (0 until 30).map { i =>
      var x = i * 2654435761L + 123456789L
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (i.toLong, x)
    }
    val planted = Seq(
      (100L, base(0)._2 ^ 1L),          // hamming 1 from id 0
      (101L, base(1)._2),               // hamming 0 from id 1
      (102L, base(2)._2 ^ (1L << 63) ^ 2L)) // hamming 2 from id 2
    val all = base ++ planted
    val df = all.toDF("id", "h")
    for (k <- Seq(0, 1, 3)) {
      val got = Dedup.hammingPairs(df, "id", "h", bits = 64, maxHamming = k)
        .as[(Long, Long, Long)].collect().toSet
      val want = (for {
        (ia, ha) <- all; (ib, hb) <- all if ia < ib
        d = java.lang.Long.bitCount(ha ^ hb) if d <= k
      } yield (ia, ib, d.toLong)).toSet
      assert(got === want, s"k=$k")
    }
  }

  test("unigramLogProb: common-token docs outscore rare-token docs; exact mean") {
    val corpus = Seq(
      (1L, "alpha alpha alpha alpha"), // only common tokens
      (2L, "alpha alpha rare1 rare2"), // half common, half singleton
      (3L, "alpha beta beta alpha")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(corpus, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L)._1 === 4L)
    // Hand-computed: total 12 tokens; alpha cnt=8, beta cnt=2, rare*=1.
    def lp(c: Double) = math.round(math.log(c / 12.0) * 1e6)
    def mean(ls: Seq[Long]) = BigDecimal(ls.sum.toDouble / ls.length / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L)._2 === mean(Seq.fill(4)(lp(8))))
    assert(got(2L)._2 === mean(Seq(lp(8), lp(8), lp(1), lp(1))))
    // ordering: all-common beats mixed beats nothing-below-it
    assert(got(1L)._2 > got(3L)._2 && got(3L)._2 > got(2L)._2)
  }

  test("vocab keyed/broadcast/lazy join paths return identical values") {
    // The join-strategy switch must be a pure plan decision: the forced
    // broadcast (vocabRows under the ceiling), the forced keyed join
    // (vocabRows above it), and the default lazy AQE-sized path leave
    // every number unchanged for both vocab-joining operators.
    val corpus = Seq(
      (1L, "alpha alpha alpha alpha"), (2L, "alpha alpha rare1 rare2"),
      (3L, "alpha beta beta alpha")).toDF("doc_id", "text")
    def all3(f: Long => Array[(Long, Long, Double)]) =
      Seq(f(0L) /* broadcast */, f(Long.MaxValue) /* keyed */, f(-1L) /* lazy */)
    val us = all3(vr =>
      TextAnalysis.unigramLogProb(corpus, "doc_id", "text", vocabRows = vr)
        .orderBy("doc_id").as[(Long, Long, Double)].collect())
    assert(us(0).toSeq === us(1).toSeq)
    assert(us(0).toSeq === us(2).toSeq)
    val ts = all3(vr =>
      TextAnalysis.tfidfTopTerms(corpus, "doc_id", "text", k = 2, vocabRows = vr)
        .select($"doc_id", $"rnk", $"tfidf")
        .orderBy("doc_id", "rnk").as[(Long, Long, Double)].collect())
    assert(ts(0).toSeq === ts(1).toSeq)
    assert(ts(0).toSeq === ts(2).toSeq)
  }

  test("filterReport: reasons fire independently in fixed order; clean docs keep") {
    val corpus = Seq(
      (1L, Seq.fill(40)("w").zipWithIndex.map { case (w, i) => w + i }.mkString(" ")), // clean
      (2L, (1 to 10).map("w" + _).mkString(" ")),          // too_short only (10 distinct words)
      (3L, ("spam " * 40).trim),                           // too-repetitive (and long enough)
      (4L, (1 to 40).map(i => s"w$i!!!").mkString(" "))    // punct-heavy, distinct words
    ).toDF("doc_id", "text")
    val got = TextAnalysis.filterReport(corpus, "doc_id", "text")
      .select("doc_id", "keep", "reasons")
      .as[(Long, Boolean, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((true, "")))
    assert(got(2L) === ((false, "too_short")))
    assert(got(3L)._1 === false && got(3L)._2.contains("repetitive"))
    assert(got(4L)._1 === false && got(4L)._2.contains("high_punct"))
  }

  test("normalizeText: case, accents and whitespace collapse to one canonical form") {
    val got = Seq("  Café\t\tNOIR  ", "cafe noir", "CAFÉ  noir", "àéîõü")
      .toDF("t").select(TextAnalysis.normalizeText(col("t")).as("n"))
      .as[String].collect()
    assert(got(0) === "cafe noir")
    assert(got(1) === "cafe noir")
    assert(got(2) === "cafe noir")
    assert(got(3) === "aeiou")
  }

  test("text analysis: tokenization and langid are deterministic and sane") {
    val df = Seq((1L, "the cat and the dog of the house")).toDF("doc_id", "text")
    val hits = TextAnalysis.stopwordHits(col("text"), TextAnalysis.stopwords.head._2)
    assert(df.select(hits).head().getInt(0) === 5) // the,and,the,of,the
    val scored = TextAnalysis.langScores("text").foldLeft(df) {
      case (d, (n, c)) => d.withColumn(n, c)
    }
    val pred = scored.select(TextAnalysis.langPredict(
      TextAnalysis.stopwords.map(l => s"hits_${l._1}")).as("p")).head().getString(0)
    assert(pred === "en")
  }

  test("incrementalDedup: anti-join semantics, normalization-aware, bloom-pruned") {
    val corpus = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "ALPHA   beta "),  // duplicate after case/whitespace normalization
      (11L, "brand new content"),
      (12L, "gamma delta")     // exact duplicate
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalDedup(batch, corpus, "doc_id", "text", 2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(11L))
    // empty corpus: everything survives (and the bloom handles size-1 floors)
    val none = corpus.filter(col("doc_id") < 0)
    assert(Dedup.incrementalDedup(batch, none, "doc_id", "text", 0)
      .count() === 3L)
  }

  test("TopK aggregator: equals the window top-k, partition-invariant, duplicate-safe") {
    import org.apache.spark.sql.functions.udaf
    import org.apache.spark.sql.expressions.Window
    val rows = (0L until 500L).map(i => (s"g${i % 3}", i, ((i * 37) % 101).toDouble))
    // duplicate ord values across ids exercise the tie-break
    val df = (rows ++ rows.take(10)).toDF("g", "id", "v")
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val expected = df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select("g", "rnk", "id", "v")
      .as[(String, Int, Long, Double)].collect().toSet
    for (p <- Seq(1, 7)) {
      val topk = udaf(new TopKAggregator(5))
      val got = df.repartition(p).groupBy("g").agg(topk(col("v"), col("id")).as("top"))
        .select(col("g"), posexplode(col("top.items")).as(Seq("p", "item")))
        .select(col("g"), (col("p") + 1).cast("int").as("rnk"),
          col("item.id"), col("item.ord"))
        .as[(String, Int, Long, Double)].collect().toSet
      assert(got === expected, s"partitions=$p")
    }
  }

  test("KMV aggregator: exact when under-filled, merge is partition-invariant") {
    import org.apache.spark.sql.functions.udaf
    val kmv = udaf(new KmvAggregator(64))
    val hv = Sketches.knuthHash(col("k"))

    // 40 distinct keys < 64 buffer: the sketch degenerates to an exact count.
    val small = (0L until 400L).map(i => ("g", i % 40)).toDF("g", "k")
    assert(small.groupBy("g").agg(kmv(hv).as("d")).select("d").as[Double].head() === 40.0)

    // 500 distinct keys > 64: approximate, but merge order must not matter —
    // the same estimate regardless of how rows are partitioned.
    val big = (0L until 2000L).map(i => ("g", i % 500)).toDF("g", "k")
    val est1 = big.repartition(1).groupBy("g").agg(kmv(hv).as("d")).select("d").as[Double].head()
    val est13 = big.repartition(13).groupBy("g").agg(kmv(hv).as("d")).select("d").as[Double].head()
    assert(est1 === est13)
    // and it's a sane estimate (within 35% of truth for k=64)
    assert(math.abs(est1 - 500.0) / 500.0 < 0.35, s"estimate $est1")
  }

  test("kmvSetStats: underfilled sketches give exact set algebra; estimator tracks truth") {
    val a = (1L to 100L).toDF("id")          // A = 1..100
    val b = (51L to 150L).toDF("id")         // B = 51..150; |A∩B|=50, |A∪B|=150
    // k=256 > |A∪B|: sketches see every hash -> exact values
    val exact = Sketches.kmvSetStats(a, b, "id", k = 256)
      .as[(Double, Long, Double, Double, Double)].head()
    assert(exact._1 === 150.0)               // union_est exact
    assert(exact._4 === 50.0)                // intersect_est exact
    assert(exact._3 === exact._5)            // jaccard_est == exact_jaccard
    // k=32 < |A∪B|: estimator path; must stay within sketch error (~1/sqrt(k))
    val est = Sketches.kmvSetStats(a, b, "id", k = 32)
      .as[(Double, Long, Double, Double, Double)].head()
    assert(math.abs(est._1 - 150.0) / 150.0 < 0.5, s"union_est ${est._1}")
    assert(math.abs(est._3 - 1.0 / 3.0) < 0.25, s"jaccard_est ${est._3}")
    // layout independence: same result under different partitioning
    val rep = Sketches.kmvSetStats(a.repartition(7), b.repartition(3), "id", k = 32)
      .as[(Double, Long, Double, Double, Double)].head()
    assert(rep === est)
  }

  test("pii redaction: rules apply in order, counts measured on original text") {
    val df = Seq(
      (1L, "mail a@b.com or c.d@e.org call 555-123-4567 from 10.0.0.1"),
      (2L, "nothing sensitive here")).toDF("id", "text")
    val out = Pii.redact(df, "id", "text").orderBy("id").collect()
    assert(out(0).getString(1) === "mail <EMAIL> or <EMAIL> call <PHONE> from <IP>")
    assert((out(0).getLong(2), out(0).getLong(3), out(0).getLong(4)) === ((2L, 1L, 1L)))
    assert(out(1).getString(1) === "nothing sensitive here")
    assert((out(1).getLong(2), out(1).getLong(3), out(1).getLong(4)) === ((0L, 0L, 0L)))
  }

  test("luhnValid: textbook test numbers, both parities, empty string") {
    val cases = Seq(
      ("4532015112830366", true),   // 16-digit Visa test number
      ("4532015112830367", false),  // same with a broken check digit
      ("378282246310005", true),    // 15-digit Amex test number
      ("1234567890123", false),
      ("", false))
    val got = cases.map(_._1).toDF("d")
      .select(col("d"), Pii.luhnValid(col("d")).as("v"))
      .as[(String, Boolean)].collect().toMap
    cases.foreach { case (d, want) =>
      assert(got(d) === want, s"luhn($d)")
    }
  }

  test("credit-card redaction: only Luhn-valid candidates redact") {
    val df = Seq(
      (1L, "pay 4532 0151 1283 0366 or 4532-0151-1283-0367 ok"),
      (2L, "call 555-123-4567 ref 378282246310005"),
      (3L, "order 12345678901234567890 plain")).toDF("id", "text")
    val out = Pii.redactCreditCards(df, "id", "text").orderBy("id")
      .as[(Long, String, Long, Long)].collect()
    // Row 1: two candidates, only the valid one redacts (spacing kept out).
    assert(out(0) === ((1L, "pay <CC> or 4532-0151-1283-0367 ok", 2L, 1L)))
    // Row 2: the 10-digit phone is no candidate; the Amex redacts.
    assert(out(1) === ((2L, "call 555-123-4567 ref <CC>", 1L, 1L)))
    // Row 3: 20 digits exceed the PAN length envelope — no candidate.
    assert(out(2) === ((3L, "order 12345678901234567890 plain", 0L, 0L)))
  }

  test("ibanValid: textbook IBANs, broken check digits, too-short input") {
    val cases = Seq(
      ("GB82WEST12345698765432", true),   // ISO 13616 example
      ("DE89370400440532013000", true),
      ("GB82WEST12345698765433", false),  // last digit broken
      ("DE89370400440532013001", false),
      ("GB82WEST", false))                // under the length floor
    val got = cases.map(_._1).toDF("d")
      .select(col("d"), Pii.ibanValid(col("d")).as("v"))
      .as[(String, Boolean)].collect().toMap
    cases.foreach { case (d, want) => assert(got(d) === want, s"iban($d)") }
  }

  test("iban redaction: only mod-97-valid candidates redact") {
    val df = Seq(
      (1L, "send to GB82WEST12345698765432 not GB82WEST12345698765433"),
      (2L, "code AB12 plain")).toDF("id", "text")
    val out = Pii.redactIbans(df, "id", "text").orderBy("id")
      .as[(Long, String, Long, Long)].collect()
    assert(out(0) === ((1L, "send to <IBAN> not GB82WEST12345698765433", 2L, 1L)))
    assert(out(1) === ((2L, "code AB12 plain", 0L, 0L)))
  }

  test("repetitionProfile: dup_frac and top_word_frac count word repeats") {
    val df = Seq(
      (1L, "a a a b"),      // 4 words, 2 distinct, top 'a' x3
      (2L, "w x y z")       // no repeats
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionProfile(df, "doc_id", "text")
      .orderBy("doc_id")
      .select("n_words", "n_distinct", "dup_frac", "top_word_frac")
      .as[(Long, Long, Double, Double)].collect()
    assert(out(0) === ((4L, 2L, 0.5, 0.75)))
    assert(out(1) === ((4L, 4L, 0.0, 0.25)))
  }

  test("tfidfTopTerms: corpus-frequent terms rank below doc-specific terms") {
    val df = Seq(
      (1L, "common rare1 common common"),
      (2L, "common blah"),
      (3L, "common blah")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", k = 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    // 'common' has df=3 -> idf=ln(4/4)=0; doc-unique terms win.
    assert(top(1L) === "rare1")
    assert(top(2L) === "blah")
    // rank column is deterministic and bounded by k
    val all = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", k = 2)
    assert(all.filter(col("rnk") > 2).count() === 0L)
  }

  test("bm25TopK equals a brute-force scorer; self-query ranks itself first") {
    val corpus = Seq(
      (1L, "spark shuffles data across executors"),
      (2L, "spark broadcasts small tables"),
      (3L, "ducks swim across the pond"),
      (4L, "the pond holds small ducks")).toDF("doc_id", "text")
    val queries = Seq((1L, "spark shuffles data across executors"),
      (10L, "small ducks")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(corpus, "doc_id", "text",
        queries, "doc_id", "text", k = 4)
      .select("qid", "doc_id", "bm25", "rnk")
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4)).toMap

    // Brute force: same formula over the same token model.
    val texts = Map(1L -> "spark shuffles data across executors",
      2L -> "spark broadcasts small tables",
      3L -> "ducks swim across the pond",
      4L -> "the pond holds small ducks")
    val toks = texts.view.mapValues(_.split("\\s+").toSeq).toMap
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    def dfOf(t: String) = toks.values.count(_.contains(t)).toDouble
    def score(q: String, d: Long): Double = {
      val c6 = q.split("\\s+").distinct.map { t =>
        val tf = toks(d).count(_ == t).toDouble
        if (tf == 0) 0L
        else {
          val idf = math.log(1.0 + (n - dfOf(t) + 0.5) / (dfOf(t) + 0.5))
          val dl = toks(d).size.toDouble
          val norm = tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
          math.round(idf * norm * 1e6)
        }
      }.sum
      BigDecimal(c6 / 1e6).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    for ((qid, qText) <- Seq(1L -> texts(1L), 10L -> "small ducks")) {
      val expected = texts.keys.toSeq.map(d => (d, score(qText, d)))
        .filter(_._2 > 0.0).sortBy { case (d, sc) => (-sc, d) }
      assert(got(qid).map(r => (r._2, r._3)) === expected,
        s"qid=$qid got=${got(qid)}")
    }
    // A document queried with its own text is its own best match.
    assert(got(1L).head._2 === 1L)
  }

  test("LexIndex: built-then-served BM25 is row-identical to inline; both prune modes") {
    val corpus = Seq(
      (1L, "spark shuffles data across executors"),
      (2L, "spark broadcasts small tables"),
      (3L, "ducks swim across the pond"),
      (4L, "the pond holds small ducks")).toDF("doc_id", "text")
    val qs = Seq((1L, "spark shuffles data across executors"),
      (10L, "small ducks")).toDF("doc_id", "text")
    val inline = TextAnalysis.bm25TopK(corpus, "doc_id", "text",
        qs, "doc_id", "text", k = 4)
      .orderBy("qid", "rnk")
      .as[(Long, Long, Double, Long)].collect().toSeq
    val root = java.nio.file.Files.createTempDirectory("graft_lex_spec_").toString
    val store = new graft.io.ParquetTableStore(spark, root)
    LexIndex.build(store, "lex", corpus, "doc_id", "text")
    for (prune <- Seq(true, false)) {
      val served = LexIndex.bm25TopK(store, "lex",
          qs, "doc_id", "text", k = 4, pruneTerms = prune)
        .orderBy("qid", "rnk")
        .as[(Long, Long, Double, Long)].collect().toSeq
      assert(served === inline, s"pruneTerms=$prune diverged from inline")
    }
    // Rebuild is atomic + idempotent: building again over the same corpus
    // serves the same results.
    LexIndex.build(store, "lex", corpus, "doc_id", "text")
    val again = LexIndex.bm25TopK(store, "lex",
        qs, "doc_id", "text", k = 4)
      .orderBy("qid", "rnk").as[(Long, Long, Double, Long)].collect().toSeq
    assert(again === inline)
  }

  test("LexIndex maintenance: append == rebuild; delete == rebuild-without; compact is invisible") {
    val all = Seq(
      (1L, "spark shuffles data across executors"),
      (2L, "spark broadcasts small tables"),
      (3L, "ducks swim across the pond"),
      (4L, "the pond holds small ducks"),
      (5L, "executors hold data in memory")).toDF("doc_id", "text")
    val qs = Seq((10L, "spark data"), (11L, "small ducks")).toDF("doc_id", "text")
    def serve(store: graft.io.ParquetTableStore): Seq[(Long, Long, Double, Long)] =
      LexIndex.bm25TopK(store, "lex", qs, "doc_id", "text", k = 5)
        .orderBy("qid", "rnk").as[(Long, Long, Double, Long)].collect().toSeq
    def freshStore() = new graft.io.ParquetTableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_lex_maint_").toString)

    // Append == rebuild over the union.
    val rebuilt = freshStore()
    LexIndex.build(rebuilt, "lex", all, "doc_id", "text")
    val appended = freshStore()
    LexIndex.build(appended, "lex", all.filter($"doc_id" <= 3), "doc_id", "text")
    LexIndex.append(appended, "lex", all.filter($"doc_id" > 3), "doc_id", "text")
    assert(serve(appended) === serve(rebuilt), "append diverged from rebuild")

    // Delete == rebuild without the deleted docs (df/avgdl/ndocs shift too).
    val without4 = freshStore()
    LexIndex.build(without4, "lex", all.filter($"doc_id" =!= 4L), "doc_id", "text")
    LexIndex.deleteDocs(rebuilt, "lex", Seq(4L).toDF("doc_id"), "doc_id")
    assert(serve(rebuilt) === serve(without4), "delete diverged from rebuild-without")

    // Repeated + absent-id deletes are no-ops (no double-decrement).
    LexIndex.deleteDocs(rebuilt, "lex", Seq(4L, 999L).toDF("doc_id"), "doc_id")
    assert(serve(rebuilt) === serve(without4), "re-delete changed results")
    val stats = rebuilt.load("lex_lexstats")
      .as[(Long, Long)].head()
    assert(stats._2 === 4L, s"ndocs after one delete of 5 docs: ${stats._2}")

    // Re-adding a tombstoned id is REJECTED before compaction (it would
    // either resurrect the old rows or let compact corrupt the stats row).
    val clash = intercept[IllegalArgumentException] {
      LexIndex.append(rebuilt, "lex",
        Seq((4L, "doc four returns")).toDF("doc_id", "text"), "doc_id", "text")
    }
    assert(clash.getMessage.contains("compact"))
    assert(serve(rebuilt) === serve(without4), "rejected append left a trace")

    // Compaction folds tombstones in without changing any result, and
    // rerunning it converges (idempotent).
    LexIndex.compact(rebuilt, "lex")
    assert(rebuilt.load("lex_tombstones").count() === 0L)
    assert(rebuilt.load("lex_postings").filter($"doc_id" === 4L).count() === 0L)
    assert(serve(rebuilt) === serve(without4), "compaction changed results")
    LexIndex.compact(rebuilt, "lex")
    assert(serve(rebuilt) === serve(without4), "re-compaction changed results")

    // After compaction the id is genuinely fresh: re-adding it now works
    // and equals a rebuild over the corresponding corpus.
    LexIndex.append(rebuilt, "lex",
      Seq((4L, "doc four returns")).toDF("doc_id", "text"), "doc_id", "text")
    val with4new = freshStore()
    LexIndex.build(with4new, "lex",
      all.filter($"doc_id" =!= 4L)
        .unionByName(Seq((4L, "doc four returns")).toDF("doc_id", "text")),
      "doc_id", "text")
    assert(serve(rebuilt) === serve(with4new),
      "post-compact re-add diverged from rebuild")
  }

  test("bm25ExpansionTerms: feedback docs' distinctive words surface; query terms excluded") {
    val corpus = Seq(
      (1L, "spark executors shuffle partitions"),
      (2L, "spark executors broadcast partitions"),
      (3L, "spark executors cache partitions"),
      (4L, "ducks swim in the pond"),
      (5L, "the pond holds many ducks")).toDF("doc_id", "text")
    val qs = Seq((10L, "spark")).toDF("doc_id", "text")
    val exp = TextAnalysis.bm25ExpansionTerms(corpus, "doc_id", "text",
        qs, "doc_id", "text", k = 3, m = 3)
      .select("qid", "term", "rnk").as[(Long, String, Long)].collect()
    val terms = exp.map(_._2).toSet
    // The original query term never expands.
    assert(!terms.contains("spark"), terms)
    // The feedback set is the three spark docs — their shared vocabulary
    // (executors/partitions appear in all three) must rank above the
    // duck-pond vocabulary, which cannot appear at all.
    assert(terms.contains("executors") && terms.contains("partitions"), terms)
    assert(!terms.exists(Set("ducks", "pond", "swim")), terms)
    // Deterministic bounded output: at most m rows, ranked 1..m.
    assert(exp.map(_._3).sorted.toSeq === (1L to exp.length).toSeq)
    assert(exp.length <= 3)
  }

  test("bm25Rm3TopK: expansion retrieves beyond-lexical docs; alpha=1 reduces to BM25; " +
      "pinned serve twin is row-identical") {
    val corpus = Seq(
      (1L, "spark executors shuffle partitions"),
      (2L, "spark executors broadcast partitions"),
      (3L, "spark executors cache partitions"),
      (4L, "executors partitions pipelines"),
      (5L, "ducks swim in the pond"),
      (6L, "the pond holds many ducks")).toDF("doc_id", "text")
    val qs = Seq((10L, "spark")).toDF("doc_id", "text")
    // Plain BM25 cannot reach doc 4 — it shares no query term.
    val bm = TextAnalysis.bm25TopK(corpus, "doc_id", "text",
        qs, "doc_id", "text", k = 6)
      .as[(Long, Long, Double, Long)].collect()
    assert(!bm.exists(_._2 == 4L), bm.toSeq)
    // RM3's feedback model (m = 5 takes the whole feedback vocabulary:
    // executors/partitions plus the three rare one-doc terms) retrieves
    // it with positive mass; the duck docs stay unreachable (they carry
    // neither a query nor an expansion term).
    val rm3 = TextAnalysis.bm25Rm3TopK(corpus, "doc_id", "text",
        qs, "doc_id", "text", k = 6, fbK = 3, m = 5)
      .orderBy("qid", "rnk")
      .as[(Long, Long, Double, Long)].collect()
    assert(rm3.exists(r => r._2 == 4L && r._3 > 0.0), rm3.toSeq)
    assert(!rm3.exists(r => Set(5L, 6L)(r._2)), rm3.toSeq)
    // The original term still dominates: rank 1 is a spark doc.
    assert(Set(1L, 2L, 3L)(rm3.head._2), rm3.toSeq)
    // alpha = 1 zeroes the expansion weights: the positively-scored rows
    // ARE the BM25 ranking (same scores, same order).
    val reduced = TextAnalysis.bm25Rm3TopK(corpus, "doc_id", "text",
        qs, "doc_id", "text", k = 6, fbK = 3, m = 5, alpha = 1.0)
      .as[(Long, Long, Double, Long)].collect()
      .filter(_._3 > 0.0)
    assert(reduced.toSet === bm.toSet, s"reduced=${reduced.toSeq} bm=${bm.toSeq}")
    // Built-then-served RM3 over a pinned snapshot is row-identical to
    // inline (the q_bm25_persisted identity, extended to two passes).
    val root = java.nio.file.Files.createTempDirectory("graft_rm3_spec_").toString
    val store = new graft.io.ParquetTableStore(spark, root)
    LexIndex.build(store, "rm3lex", corpus, "doc_id", "text")
    val snap = LexIndex.snapshot(store, "rm3lex")
    val served = LexIndex.bm25Rm3TopK(snap, qs, "doc_id", "text",
        k = 6, fbK = 3, m = 5)
      .orderBy("qid", "rnk")
      .as[(Long, Long, Double, Long)].collect()
    snap.release()
    assert(served.toSeq === rm3.toSeq, "pinned RM3 serve diverged from inline")
  }

  test("LexIndex forward index: RM3 row-identical, doc_id gather prunes, " +
      "maintenance keeps it consistent") {
    val corpus = Seq(
      (1L, "spark executors shuffle partitions"),
      (2L, "spark executors broadcast partitions"),
      (3L, "spark executors cache partitions"),
      (4L, "executors partitions pipelines"),
      (5L, "ducks swim in the pond"),
      (6L, "the pond holds many ducks")).toDF("doc_id", "text")
    val qs = Seq((10L, "spark")).toDF("doc_id", "text")
    def inlineRm3(c: org.apache.spark.sql.DataFrame) =
      TextAnalysis.bm25Rm3TopK(c, "doc_id", "text", qs, "doc_id", "text",
          k = 6, fbK = 3, m = 5)
        .orderBy("qid", "rnk").as[(Long, Long, Double, Long)].collect().toSeq
    val inline = inlineRm3(corpus)
    val root = java.nio.file.Files.createTempDirectory("graft_fwd_spec_").toString
    val store = new graft.io.ParquetTableStore(spark, root)
    LexIndex.build(store, "fwdlex", corpus, "doc_id", "text",
      forwardIndex = true)
    val snap = LexIndex.snapshot(store, "fwdlex")
    assert(snap.fwd.isDefined, "snapshot did not pick up the forward index")
    val served = LexIndex.bm25Rm3TopK(snap, qs, "doc_id", "text",
        k = 6, fbK = 3, m = 5)
      .orderBy("qid", "rnk").as[(Long, Long, Double, Long)].collect().toSeq
    assert(served === inline, "forward-index RM3 diverged from inline")
    // The gather's plan: the feedback doc ids land as a real In/InSet
    // pushdown on the doc-sorted fwd scan (not just an isnotnull any join
    // pushes) — the row-group-skipping lever the 2x storage buys.
    import org.apache.spark.sql.catalyst.expressions.{In, InSet}
    val gather = snap.fwd.get.filter(col("doc_id").isin(1L, 2L, 3L))
    val scans = graft.PlanTestUtils.fileScans(gather.queryExecution.executedPlan)
    assert(scans.nonEmpty, "no file scan under the fwd gather")
    assert(scans.exists(_.dataFilters.exists(_.exists {
      case i: In => i.value.toString.contains("doc_id")
      case i: InSet => i.child.toString.contains("doc_id")
      case _ => false
    })), s"fwd gather lost the doc_id IN pushdown: ${scans.map(_.dataFilters)}")
    snap.release()
    // Append maintains the fwd table: serve == inline over the union.
    val extra = Seq((7L, "spark executors pipelines together")).toDF("doc_id", "text")
    LexIndex.append(store, "fwdlex", extra, "doc_id", "text")
    val snap2 = LexIndex.snapshot(store, "fwdlex")
    val served2 = LexIndex.bm25Rm3TopK(snap2, qs, "doc_id", "text",
        k = 6, fbK = 3, m = 5)
      .orderBy("qid", "rnk").as[(Long, Long, Double, Long)].collect().toSeq
    snap2.release()
    assert(served2 === inlineRm3(corpus.unionByName(extra)),
      "post-append forward-index RM3 diverged from inline over the union")
    // Delete + compact fold the id out of the fwd table physically and
    // serve results return to the original corpus's.
    LexIndex.deleteDocs(store, "fwdlex", Seq(7L).toDF("doc_id"), "doc_id")
    LexIndex.compact(store, "fwdlex")
    assert(store.load("fwdlex_fwd").filter($"doc_id" === 7L).count() === 0L,
      "compact left the deleted id in the forward index")
    val snap3 = LexIndex.snapshot(store, "fwdlex")
    val served3 = LexIndex.bm25Rm3TopK(snap3, qs, "doc_id", "text",
        k = 6, fbK = 3, m = 5)
      .orderBy("qid", "rnk").as[(Long, Long, Double, Long)].collect().toSeq
    snap3.release()
    assert(served3 === inline, "post-compact RM3 diverged from the original")
  }

  test("rrfFuse: doc in both rankings beats single-system docs; absent docs contribute nothing") {
    // qid 1: doc 100 is rank 2 in BOTH rankings (1/62 + 1/62), doc 200 is
    // rank 1 in A only (1/61), doc 300 rank 1 in B only (1/61):
    // 2/62 > 1/61, so the doubly-retrieved doc must fuse on top.
    val a = Seq((1L, 200L, 1L), (1L, 100L, 2L)).toDF("qid", "doc", "r")
    val bdf = Seq((1L, 300L, 1L), (1L, 100L, 2L)).toDF("qid", "doc", "r")
    val fused = LexIndex.rrfFuse(Seq(a, bdf), "qid", "doc", "r", k = 3)
      .select("doc_id", "n_systems", "rnk")
      .as[(Long, Long, Long)].collect().sortBy(_._3).toSeq
    assert(fused.map(_._1) === Seq(100L, 200L, 300L))
    assert(fused.head._2 === 2L) // both systems carried doc 100
    // Ties (identical score) break by doc id: 200 (1/61) before 300 (1/61).
    assert(fused(1)._1 === 200L && fused(2)._1 === 300L)
    // Exact fixed-point scores: 2*round(1e9/62) and round(1e9/61), /1e9.
    val scores = LexIndex.rrfFuse(Seq(a, bdf), "qid", "doc", "r", k = 3)
      .select("doc_id", "rrf_score").as[(Long, Double)].collect().toMap
    assert(scores(100L) === BigDecimal(2.0 * math.round(1e9 / 62.0) / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("bm25TopK edge cases: OOV query emits no rows; k bounds each query") {
    val corpus = Seq((1L, "alpha beta"), (2L, "beta gamma"),
      (3L, "gamma alpha")).toDF("doc_id", "text")
    val qs = Seq((7L, "zzz qqq"), (8L, "beta")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(corpus, "doc_id", "text",
      qs, "doc_id", "text", k = 1)
    val byQ = out.select("qid", "doc_id").as[(Long, Long)].collect().groupBy(_._1)
    assert(!byQ.contains(7L)) // fully out-of-vocabulary query
    assert(byQ(8L).length === 1) // k=1 despite two docs matching 'beta'
  }

  test("contaminationRate: benchmark overlap fraction per document") {
    val bench = Seq((100L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val corpus = Seq(
      // contains the benchmark's exact 8-gram -> 1 hit of 2 shingles
      (1L, "one two three four five six seven eight nine"),
      (2L, "totally different words with no overlap at all here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.contaminationRate(corpus, bench, "doc_id", "text", n = 8)
      .orderBy("doc_id")
      .select("n_shingles", "n_hit", "contamination")
      .as[(Long, Long, Double)].collect()
    assert(out(0) === ((2L, 1L, 0.5)))
    assert(out(1)._2 === 0L)
    assert(out(1)._3 === 0.0)
  }

  test("embeddingAudit: zero-norm, wrong-dim, and norm stats per label") {
    val df = Seq(
      (1L, Array(3f, 4f), 0),      // norm 5
      (2L, Array(0f, 0f), 0),      // zero vector
      (3L, Array(1f), 0),          // ragged dim (norm 1)
      (4L, Array(0f, 2f), 1)       // norm 2
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.embeddingAudit(df, "embedding", "label", expectedDim = 2)
      .orderBy("label")
      .select("label", "n_vecs", "n_bad_dim", "n_zero", "norm_min",
        "norm_max", "norm_mean")
      .as[(Int, Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got === Seq(
      (0, 3L, 1L, 1L, 0.0, 5.0, 2.0),   // mean (5+0+1)/3
      (1, 1L, 0L, 0L, 2.0, 2.0, 2.0)))
  }

  test("charTrigramLangId: separable profiles classify self; short doc falls to priority") {
    val df = Seq(
      (1L, "the cat the hat", "en"),
      (2L, "der hund der baum", "de"),
      (3L, "xy", "de")   // shorter than one trigram: zero scores -> priority 'en'
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.charTrigramLangId(df, "doc_id", "text", "lang")
      .select("doc_id", "predicted_lang", "is_match")
      .as[(Long, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === (("en", true)))
    assert(got(2L) === (("de", true)))
    assert(got(3L) === (("en", false)))
  }

  test("bigramLogProb matches a brute-force reference on every doc") {
    val corpus = Seq((1L, "x y x y x y"), (2L, "y y x x y x"), (3L, "x y z"))
    val allToks = corpus.flatMap(_._2.split(" "))
    val uni = allToks.groupBy(identity).map { case (k, v) => k -> v.size }
    val total = allToks.size.toDouble
    val bigs = corpus.flatMap(_._2.split(" ").sliding(2).map(a => (a(0), a(1))))
    val big = bigs.groupBy(identity).map { case (k, v) => k -> v.size }
    val ctx = bigs.groupBy(_._1).map { case (k, v) => k -> v.size }
    def expected(text: String): (Long, Double) = {
      val ts = text.split(" ")
      val lps = ts.zipWithIndex.map { case (w, i) =>
        val p =
          if (i == 0) uni(w) / total
          else 0.7 * big((ts(i - 1), w)).toDouble / ctx(ts(i - 1)) +
            0.3 * uni(w) / total
        BigDecimal(math.log(p) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
      (ts.length.toLong,
        BigDecimal(lps.sum.toDouble / ts.length / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = TextAnalysis.bigramLogProb(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    corpus.foreach { case (id, text) =>
      assert(got(id) === expected(text), s"doc $id")
    }
    // repeated common bigrams (doc 1) outscore shuffled adjacency (doc 2)
    assert(got(1L)._2 > got(2L)._2)
  }

  test("trigramLogProb matches a brute-force reference on every doc") {
    val corpus = Seq(
      (1L, "x y z x y z x y z"), // one repeated trigram
      (2L, "x z y y x z z y x"), // same tokens, shuffled adjacency
      (3L, "x y"))               // too short for any trigram context
    val allToks = corpus.flatMap(_._2.split(" "))
    val uni = allToks.groupBy(identity).map { case (k, v) => k -> v.size }
    val total = allToks.size.toDouble
    val bigs = corpus.flatMap(_._2.split(" ").sliding(2).filter(_.length == 2)
      .map(a => (a(0), a(1))))
    val big = bigs.groupBy(identity).map { case (k, v) => k -> v.size }
    val ctx2 = bigs.groupBy(_._1).map { case (k, v) => k -> v.size }
    val tris = corpus.flatMap(_._2.split(" ").sliding(3).filter(_.length == 3)
      .map(a => (a(0), a(1), a(2))))
    val tri = tris.groupBy(identity).map { case (k, v) => k -> v.size }
    val ctx3 = tris.groupBy(t => (t._1, t._2)).map { case (k, v) => k -> v.size }
    def expected(text: String): (Long, Double) = {
      val ts = text.split(" ")
      val lps = ts.zipWithIndex.map { case (w, i) =>
        val uniP = uni(w) / total
        val p =
          if (i == 0) uniP
          else if (i == 1) 0.7 * big((ts(0), w)).toDouble / ctx2(ts(0)) + 0.3 * uniP
          else {
            val bigMl = big((ts(i - 1), w)).toDouble / ctx2(ts(i - 1))
            val triMl = tri.getOrElse((ts(i - 2), ts(i - 1), w), 0).toDouble /
              ctx3((ts(i - 2), ts(i - 1)))
            0.5 * triMl + 0.3 * bigMl + 0.2 * uniP
          }
        BigDecimal(math.log(p) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
      (ts.length.toLong,
        BigDecimal(lps.sum.toDouble / ts.length / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = TextAnalysis.trigramLogProb(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    corpus.foreach { case (id, text) =>
      assert(got(id) === expected(text), s"doc $id")
    }
    // the repeated-trigram doc outscores the shuffled one by a wider margin
    // than under the bigram model (the third-order context pays off)
    assert(got(1L)._2 > got(2L)._2)
  }

  test("nearMissPairs keeps the band, drops duplicates and unrelated pairs") {
    val df = Seq(
      (1L, "a b c d e"),   // {abcd, bcde}
      (2L, "a b c d x"),   // {abcd, bcdx}: jaccard vs 1 = 1/3
      (3L, "a b c d e"),   // exact dup of 1: jaccard 1.0 -> above band
      (4L, "z y x w v")    // unrelated
    ).toDF("doc_id", "text")
    val got = Dedup.nearMissPairs(df, "doc_id", "text", n = 4, lo = 0.3, hi = 0.8)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 2L, 0.333333), (2L, 3L, 0.333333)))
    // dfCap recall contract: pairs whose EVERY shared shingle exceeds the
    // cap disappear (their candidates never enter the index); here dfCap=1
    // caps both shared shingles (df 3 and 2), leaving no candidates at all.
    val capped = Dedup.nearMissPairs(df, "doc_id", "text", n = 4,
      lo = 0.3, hi = 0.8, dfCap = 1)
      .as[(Long, Long, Double)].collect().toSeq
    assert(capped.isEmpty)
  }

  test("count-min sketch: estimates never undercount; disjoint builds merge by sum") {
    val keys = (Seq.fill(5)(1L) ++ Seq.fill(3)(2L) ++ (3L to 30L)).toDF("k")
    val sk = Sketches.cmsBuild(keys, "k", depth = 4, width = 8) // force collisions
    val exact = keys.groupBy("k").agg(count(lit(1)).as("cnt"))
    val joined = Sketches.cmsEstimate(sk, keys, "k", depth = 4, width = 8)
      .join(exact, "k")
      .as[(Long, Long, Long)].collect()
    assert(joined.length === 30)
    joined.foreach { case (k, est, ex) => assert(est >= ex, s"key $k") }
    // merge = elementwise cell addition: sum of two halves == full build
    val (a, b) = ((1L to 15L).toDF("k"), (16L to 30L).toDF("k"))
    val merged = Sketches.cmsBuild(a, "k", 4, 8)
      .unionByName(Sketches.cmsBuild(b, "k", 4, 8))
      .groupBy("row", "bucket").agg(sum("cell_count").as("cell_count"))
      .as[(Long, Long, Long)].collect().toSet
    val full = Sketches.cmsBuild((1L to 30L).toDF("k"), "k", 4, 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(merged === full)
  }

  test("count-min sketch: absent keys estimate via empty cells, never dropped") {
    // Narrow build (2 keys) in a wide sketch: an unseen key almost surely
    // hits at least one empty cell in one of its 4 rows -> estimate 0.
    val sk = Sketches.cmsBuild(Seq(1L, 2L).toDF("k"), "k", depth = 4, width = 1024)
    val got = Sketches.cmsEstimate(sk, (100L to 109L).toDF("k"), "k", 4, 1024)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet === (100L to 109L).toSet)   // every probed key answered
    assert(got.values.forall(_ === 0L))
  }

  test("clusterSizeHistogram: family sizes roll up to counts") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Dedup.clusterSizeHistogram(nodes, "doc_id", pairs)
      .orderBy("cluster_size")
      .as[(Long, Long)].collect().toSeq
    // clusters: {1,2,3}, {4}, {5,6} -> size 1 x1, size 2 x1, size 3 x1
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }
}
