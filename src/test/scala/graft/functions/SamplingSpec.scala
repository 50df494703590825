package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hexThreshold: 8-hex-char encoding of the rate, 'g' at and above 1.0") {
    assert(Sampling.hexThreshold(0.25) === "40000000")
    assert(Sampling.hexThreshold(0.5) === "80000000")
    assert(Sampling.hexThreshold(0.0) === "00000000")
    assert(Sampling.hexThreshold(1.0) === "g")
    assert(Sampling.hexThreshold(2.0) === "g")
  }

  test("stratifiedSample: deterministic, layout-independent, rate-proportional") {
    val df = (0L until 2000L).map(i => (i, s"src${i % 2}")).toDF("id", "stratum")
    val rates = Map("src0" -> 0.2, "src1" -> 0.8)
    val once = Sampling.stratifiedSample(df, "id", "stratum", rates)
      .select("id").as[Long].collect().toSet
    // Re-run under a different partitioning: identical selection.
    val again = Sampling.stratifiedSample(df.repartition(7), "id", "stratum", rates)
      .select("id").as[Long].collect().toSet
    assert(once === again)
    val bySrc = Sampling.stratifiedSample(df, "id", "stratum", rates)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    // 1000 per stratum; md5 is uniform, so the kept counts concentrate near
    // rate * 1000 (3-sigma ~ 38 for p=0.2).
    assert(math.abs(bySrc("src0") - 200L) < 60, s"src0 kept ${bySrc("src0")}")
    assert(math.abs(bySrc("src1") - 800L) < 60, s"src1 kept ${bySrc("src1")}")
  }

  test("stratifiedSample: rate 0 drops everything, rate 1 keeps everything") {
    val df = (0L until 100L).map(i => (i, "s")).toDF("id", "stratum")
    assert(Sampling.stratifiedSample(df, "id", "stratum", Map("s" -> 0.0)).count() === 0L)
    assert(Sampling.stratifiedSample(df, "id", "stratum", Map("s" -> 1.0)).count() === 100L)
    // default rate applies to strata absent from the map
    assert(Sampling.stratifiedSample(df, "id", "stratum", Map.empty, defaultRate = 1.0)
      .count() === 100L)
  }

  test("capPerKey: keeps the cap lowest-priority rows per key, all when under cap") {
    val df = Seq(
      ("a", 3L), ("a", 1L), ("a", 2L), ("a", 4L),
      ("b", 10L)).toDF("key", "ord")
    val out = Sampling.capPerKey(df, "key", "ord", cap = 2)
      .as[(String, Long)].collect().toSet
    assert(out === Set(("a", 1L), ("a", 2L), ("b", 10L)))
    assert(Sampling.capPerKey(df, "key", "ord", cap = 10).count() === 5L)
  }

  test("weightedSampleTopK: deterministic, layout-independent, respects k") {
    val df = (0L until 500L).map(i => (i, s"s${i % 2}", 1.0 + (i % 10)))
      .toDF("id", "stratum", "w")
    val once = Sampling.weightedSampleTopK(df, "id", "stratum", "w", k = 25)
      .select("id").as[Long].collect().toSet
    val again = Sampling.weightedSampleTopK(df.repartition(7), "id", "stratum", "w", k = 25)
      .select("id").as[Long].collect().toSet
    assert(once === again)
    val perStratum = Sampling.weightedSampleTopK(df, "id", "stratum", "w", k = 25)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(perStratum.values.forall(_ === 25L))
    // k above the group size keeps everything
    assert(Sampling.weightedSampleTopK(df, "id", "stratum", "w", k = 1000).count() === 500L)
  }

  test("weightedSampleTopK: weights steer inclusion probability") {
    // One row with overwhelming weight vs 99 unit-weight rows: its sort key
    // ln(u)/w is ~0 (beats any unit-weight row whose u isn't ~1.0), so it
    // must be selected; deterministic hashing makes this assertion stable.
    val df = ((1L to 99L).map(i => (i, "s", 1.0)) :+ (100L, "s", 1e9))
      .toDF("id", "stratum", "w")
    val kept = Sampling.weightedSampleTopK(df, "id", "stratum", "w", k = 10)
      .select("id").as[Long].collect().toSet
    assert(kept.contains(100L))
    // And the heavy-weight row ranks first
    val top = Sampling.weightedSampleTopK(df, "id", "stratum", "w", k = 10)
      .filter(col("rnk") === 1).select("id").as[Long].head()
    assert(top === 100L)
  }

  private val sparkVocab = Seq("spark", "shuffle", "partition", "executor",
    "broadcast", "join", "catalyst", "codegen")
  private val bakeVocab = Seq("flour", "sugar", "butter", "oven",
    "whisk", "bake", "dough", "icing")

  private def mkText(vocab: Seq[String], i: Long, n: Int): String =
    (0 until n).map(j => vocab(((i + j * 7) % vocab.size).toInt)).mkString(" ")

  /** 20 docs drawn from the target's vocabulary + 20 from a disjoint one. */
  private def dsirRaw = ((0L until 20L).map(i => (i, mkText(sparkVocab, i, 24))) ++
    (20L until 40L).map(i => (i, mkText(bakeVocab, i, 24)))).toDF("doc_id", "text")

  private def dsirTarget = (100L until 110L)
    .map(i => (i, mkText(sparkVocab, i, 16))).toDF("doc_id", "text")

  test("dsirWeights: documents resembling the target outscore dissimilar ones") {
    val w = Sampling.dsirWeights(dsirRaw, "doc_id", "text", dsirTarget, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(w.size === 40)
    // 24 tokens -> 24 unigrams + 23 bigrams
    assert(w.values.forall(_._1 === 47L))
    val sparky = (0L until 20L).map(w(_)._2)
    val bakey = (20L until 40L).map(w(_)._2)
    // Disjoint vocabularies: every target-like doc must beat every
    // dissimilar one (per-feature ratios all point the same way).
    assert(sparky.min > bakey.max,
      s"sparky min ${sparky.min} <= bakey max ${bakey.max}")
    // Features absent from the target get a NEGATIVE log ratio.
    assert(bakey.max < 0.0)
  }

  test("dsirResample: deterministic, layout-independent, selects target-like docs") {
    val once = Sampling.dsirResample(
      dsirRaw, "doc_id", "text", dsirTarget, "text", k = 15)
      .select("doc_id", "rnk").as[(Long, Long)].collect().toSeq.sortBy(_._2)
    val again = Sampling.dsirResample(
      dsirRaw.repartition(7), "doc_id", "text", dsirTarget.repartition(3), "text", k = 15)
      .select("doc_id", "rnk").as[(Long, Long)].collect().toSeq.sortBy(_._2)
    assert(once === again)
    assert(once.size === 15)
    assert(once.map(_._2) === (1L to 15L))
    // log_w separation (tens of nats) dwarfs the Gumbel noise (~±3 nats):
    // every selected doc is from the target-like half.
    assert(once.map(_._1).forall(_ < 20L), once.map(_._1).mkString(","))
  }

  test("dsirResamplePerStratum: k per stratum, deterministic, layout-independent") {
    val raw = ((0L until 20L).map(i => (i, mkText(sparkVocab, i, 24), s"s${i % 2}")) ++
      (20L until 40L).map(i => (i, mkText(bakeVocab, i, 24), s"s${i % 2}")))
      .toDF("doc_id", "text", "source")
    val once = Sampling.dsirResamplePerStratum(
      raw, "doc_id", "text", "source", dsirTarget, "text", kPerStratum = 8)
      .select("source", "doc_id", "rnk").as[(String, Long, Long)].collect().toSet
    val again = Sampling.dsirResamplePerStratum(
      raw.repartition(7), "doc_id", "text", "source",
      dsirTarget.repartition(3), "text", kPerStratum = 8)
      .select("source", "doc_id", "rnk").as[(String, Long, Long)].collect().toSet
    assert(once === again)
    val byStratum = once.groupBy(_._1)
    assert(byStratum.keySet === Set("s0", "s1"))
    byStratum.foreach { case (src, rows) =>
      assert(rows.size === 8, s"$src kept ${rows.size}")
      assert(rows.map(_._3) === (1L to 8L).toSet, s"$src ranks ${rows.map(_._3)}")
      // Selected ids really belong to the stratum (even ids -> s0, odd -> s1).
      assert(rows.forall { case (s, id, _) => s"s${id % 2}" === s })
      // Weight separation dominates the Gumbel noise within each stratum too:
      // all selections are from the target-like half (ids < 20).
      assert(rows.forall(_._2 < 20L), s"$src selected ${rows.map(_._2)}")
    }
  }

  test("DSIR/drift edge cases: null text, empty target, empty drift side") {
    val raw = Seq((1L, Option("the cat sat")), (2L, Option.empty[String]),
      (3L, Option("a dog ran"))).toDF("doc_id", "text")
    // A null-text doc contributes no features and gets NO weight row
    // (explode drops it) — mirrored by DuckDB unnest(NULL); callers that
    // must keep such docs coalesce text to '' upstream.
    val w = Sampling.dsirWeights(raw, "doc_id", "text",
      Seq((9L, "the cat")).toDF("doc_id", "text"), "text", buckets = 64)
      .select("doc_id").as[Long].collect().toSet
    assert(w === Set(1L, 3L))
    // Empty target: fully-smoothed ratios — every weight defined and finite.
    val emptyTgt = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val w2 = Sampling.dsirWeights(raw, "doc_id", "text", emptyTgt, "text", buckets = 64)
      .select("doc_id", "log_w").as[(Long, Double)].collect().toMap
    assert(w2.keySet === Set(1L, 3L))
    assert(w2.values.forall(v => !v.isNaN && !v.isInfinite))
    // Drift with one empty side: finite, and the populated side's mass
    // contributes its full ln 2 term (JS(P, empty) = ln 2 / 2 under the
    // zero-total convention; both engines compute the same formula).
    val d = Sampling.distributionDrift(raw, "text", emptyTgt, "text", buckets = 64)
      .as[(Double, Double, Long, Long, Long)].head()
    assert(math.abs(d._1 - math.log(2.0) / 2) < 1e-4, s"js ${d._1}")
    assert(d._4 === 0L && d._5 === 0L)
  }

  test("driftByStratum: each stratum's row equals the scalar drift of its slice") {
    val df = ((0L until 10L).map(i => (i, mkText(sparkVocab, i, 20), "s0")) ++
      (10L until 20L).map(i => (i, mkText(bakeVocab, i, 20), "s1")))
      .toDF("doc_id", "text", "source")
    val baseline = Sampling.bucketCounts(df, "text", buckets = 512)
    val got = Sampling.driftByStratum(df, "text", "source", baseline, buckets = 512)
      .as[(String, Double, Double, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet === Set("s0", "s1"))
    Seq("s0", "s1").foreach { src =>
      val want = Sampling.driftAgainstCounts(baseline,
        Sampling.bucketCounts(df.filter($"source" === src), "text", 512))
        .as[(Double, Double, Long, Long, Long)].head()
      assert((got(src)._2, got(src)._3, got(src)._4, got(src)._5, got(src)._6) === want,
        s"$src: ${got(src)} != $want")
    }
    // Both halves drift from the pooled baseline by the same amount here
    // (equal sizes, disjoint vocabularies) and neither is at the maximum.
    assert(got("s0")._2 > 0.1 && got("s0")._2 < math.log(2.0))
  }

  test("distributionDrift: 0 on identical corpora, ln 2 on disjoint ones, symmetric") {
    val a = (0L until 10L).map(i => (i, mkText(sparkVocab, i, 20))).toDF("doc_id", "text")
    val b = (0L until 10L).map(i => (i, mkText(bakeVocab, i, 20))).toDF("doc_id", "text")

    val same = Sampling.distributionDrift(a, "text", a, "text")
      .as[(Double, Double, Long, Long, Long)].head()
    assert(same._1 === 0.0 && same._2 === 0.0)
    assert(same._3 === same._5 && same._4 === same._5) // all buckets shared

    // Disjoint vocabularies hash to disjoint buckets (no collision at 4096
    // buckets for this tiny vocab — pinned by buckets_shared below), so JS
    // hits its ln 2 maximum and L1 its 2.0 maximum.
    val disj = Sampling.distributionDrift(a, "text", b, "text")
      .as[(Double, Double, Long, Long, Long)].head()
    assert(disj._5 === 0L, s"vocabularies collided: ${disj._5} shared buckets")
    assert(math.abs(disj._1 - math.log(2.0)) < 1e-4, s"js = ${disj._1}")
    assert(math.abs(disj._2 - 2.0) < 1e-4, s"l1 = ${disj._2}")

    // Symmetric up to the bucket-count swap; layout-independent.
    val ab = Sampling.distributionDrift(a, "text", b.repartition(5), "text")
      .as[(Double, Double, Long, Long, Long)].head()
    val ba = Sampling.distributionDrift(b, "text", a.repartition(3), "text")
      .as[(Double, Double, Long, Long, Long)].head()
    assert(ab._1 === ba._1 && ab._2 === ba._2)
    assert(ab._3 === ba._4 && ab._4 === ba._3)
  }

  test("temperatureMix: alpha<1 rebalances toward low-resource keys; " +
      "quotas floor to <= n; deterministic and layout-independent") {
    // 80/16/4 split: raw shares 0.80/0.16/0.04; sqrt weights rebalance
    // to ~0.62/0.28/0.14 — the dominant key samples BELOW its raw share,
    // the scarce keys above.
    val corpus = ((1 to 80).map(i => (i.toLong, "en")) ++
      (101 to 116).map(i => (i.toLong, "de")) ++
      (201 to 204).map(i => (i.toLong, "sw"))).toDF("doc_id", "lang")
    val n = 50L
    val got = Sampling.temperatureMix(corpus, "doc_id", "lang", n)
      .select("lang", "doc_id", "quota", "rnk")
      .as[(String, Long, Long, Long)].collect()
    val byLang = got.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val quotas = got.groupBy(_._1).view.mapValues(_.head._3).toMap
    // Each key fills exactly its quota (every key has >= quota rows here).
    assert(byLang === quotas, s"sampled counts $byLang != quotas $quotas")
    assert(got.length <= n, s"sampled ${got.length} > n=$n")
    // Exact expected quotas: sqrt weights (8944272, 4000000, 2000000
    // as 1e-6 longs), floored shares of 50, sw CAPPED at its 4 rows.
    assert(quotas === Map("en" -> 29L, "de" -> 13L, "sw" -> 4L), quotas)
    // Rebalance direction: en below its raw 80% share, sw above its 4%.
    val enShare = byLang("en").toDouble / got.length
    val swShare = byLang("sw").toDouble / got.length
    assert(enShare < 0.80, s"en share $enShare not rebalanced down")
    assert(swShare > 0.04, s"sw share $swShare not rebalanced up")
    // alpha = 1 is proportional: quotas == floor(n * cnt / total).
    val prop = Sampling.temperatureMix(corpus, "doc_id", "lang", n, alpha = 1.0)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(prop("en") === 40L && prop("de") === 8L && prop("sw") === 2L, prop)
    // Deterministic + layout-independent: a shuffled, repartitioned input
    // picks the SAME rows.
    val again = Sampling.temperatureMix(
        corpus.repartition(7, col("doc_id")), "doc_id", "lang", n)
      .select("lang", "doc_id", "quota", "rnk")
      .as[(String, Long, Long, Long)].collect()
    assert(again.toSet === got.toSet, "sampling depends on layout")
  }

  test("temperatureMixByWeight: maximal prefix fits the quota; oversized rows " +
      "excluded up front; budget rebalanced toward the light key") {
    // en holds 60x the char mass of sw; sqrt quotas give sw well above
    // its raw share. One en doc is bigger than en's whole quota — it
    // must be excluded up front, not poison the prefix behind it.
    val corpus = ((1 to 20).map(i => (i.toLong, "en", 50L)) ++
      Seq((21L, "en", 5000L)) ++                       // oversized
      Seq((22L, "en", 0L)) ++                          // token-free
      (101 to 120).map(i => (i.toLong, "sw", 5L))).toDF("doc_id", "lang", "n_tok")
    val budget = 300L
    val got = Sampling.temperatureMixByWeight(
        corpus, "doc_id", "lang", "n_tok", budget)
      .select("lang", "doc_id", "n_tok", "quota", "cum")
      .as[(String, Long, Long, Long, Long)].collect()
    // Every kept row's cumulative fits its quota.
    assert(got.forall(r => r._5 <= r._4), got.toSeq)
    // The oversized doc is absent even though en's prefix has room left.
    assert(!got.exists(_._2 == 21L), got.toSeq)
    // The token-free doc is absent too: a token-budget sampler emits no
    // weightless rows (and a zero-quota key emits nothing, not "all
    // zero-weight rows for free").
    assert(!got.exists(_._2 == 22L), got.toSeq)
    // Per-key kept mass is the MAXIMAL prefix: adding the next in-budget
    // row would overflow (en rows are uniform 50, so kept = quota/50).
    val byKey = got.groupBy(_._1).view.mapValues(rs => (rs.map(_._3).sum, rs.head._4)).toMap
    byKey.foreach { case (k, (mass, quota)) =>
      val step = if (k == "en") 50L else 5L
      assert(mass <= quota && mass + step > quota,
        s"$k kept $mass of quota $quota — not the maximal prefix")
    }
    // Rebalance: sw holds 100/6100 = 1.6% of raw mass; sqrt quotas give
    // it ~11% of the kept mass — well above proportional.
    val swShare = byKey("sw")._1.toDouble / got.map(_._3).sum
    assert(swShare > 0.05, s"sw mass share $swShare not rebalanced up")
    // Deterministic + layout-independent.
    val again = Sampling.temperatureMixByWeight(
        corpus.repartition(5, col("doc_id")), "doc_id", "lang", "n_tok", budget)
      .select("lang", "doc_id", "n_tok", "quota", "cum")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(again.toSet === got.toSet)
  }

  test("sampler reserved-name guards fail loudly on clashing input columns") {
    // Every sampler that adds output columns must reject an input that
    // already carries one of those names — a silent join ambiguity (or a
    // dropped user column) is the failure mode the mixers guard against.
    val df = Seq((1L, "en", 2L)).toDF("doc_id", "lang", "w")
      .withColumn("rnk", lit(0L))
    val e = intercept[IllegalArgumentException] {
      Sampling.weightedSampleTopK(df, "doc_id", "lang", "w", k = 1)
    }
    assert(e.getMessage.contains("weightedSampleTopK") &&
      e.getMessage.contains("rnk"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Sampling.dsirResample(df.withColumnRenamed("rnk", "skey"),
        "doc_id", "lang", df, "lang", k = 1)
    }
    assert(e2.getMessage.contains("dsirResample") &&
      e2.getMessage.contains("skey"), e2.getMessage)
  }

  test("two-phase mixer selection == the naive per-key window on a dominant-key corpus") {
    // The round-13 rewrite's exactness contract, pinned directly: on a
    // 90%-one-key corpus whose quota boundary falls mid-bucket, the
    // histogram-selected rows (and their rnk/cum values) must equal the
    // straightforward single-window computation the oracle replays.
    import org.apache.spark.sql.expressions.Window
    val corpus = ((1L to 900L).map(i => (i, "en", (i % 7 + 1))) ++
      (1001L to 1060L).map(i => (i, "de", (i % 5 + 1))) ++
      (2001L to 2040L).map(i => (i, "sw", (i % 3 + 1))))
      .toDF("doc_id", "lang", "w")

    // Naive reference for temperatureMix: global per-key hash-order rank.
    def samp(seed: String) = {
      val v = conv(substring(md5(concat_ws(":", lit(seed), col("lang"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("double")
      round((v + lit(0.5)) / lit(4294967296.0), 6)
    }
    val got = Sampling.temperatureMix(corpus, "doc_id", "lang", n = 300L)
      .select("lang", "doc_id", "quota", "rnk")
      .as[(String, Long, Long, Long)].collect().toSet
    val quotas = got.groupBy(_._1).view.mapValues(_.head._3).toMap
    val w = Window.partitionBy("lang").orderBy(col("__u").asc, col("doc_id").asc)
    val naive = corpus.withColumn("__u", samp("graft"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select("lang", "doc_id", "rnk")
      .as[(String, Long, Long)].collect()
      .filter(r => r._3 <= quotas(r._1))
      .map(r => (r._1, r._2, quotas(r._1), r._3)).toSet
    assert(got === naive, "two-phase rank diverged from the naive window")

    // Naive reference for temperatureMixByWeight: per-key running sum.
    val gotW = Sampling.temperatureMixByWeight(
        corpus, "doc_id", "lang", "w", budget = 600L)
      .select("lang", "doc_id", "quota", "cum")
      .as[(String, Long, Long, Long)].collect().toSet
    val quotasW = gotW.groupBy(_._1).view.mapValues(_.head._3).toMap
    val naiveW = corpus.withColumn("__u", samp("graft"))
      .filter(col("lang").isin(quotasW.keys.toSeq: _*))
      .as[(Long, String, Long, Double)].collect()
      .filter { case (_, lang, wgt, _) => wgt > 0 && wgt <= quotasW(lang) }
      .groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
        rows.sortBy(r => (r._4, r._1))
          .scanLeft((0L, 0L, "", 0L)) { case ((cum, _, _, _), (id, lg, wgt, _)) =>
            (cum + wgt, id, lg, wgt) }.drop(1)
          .takeWhile(_._1 <= quotasW(lang))
          .map { case (cum, id, lg, _) => (lg, id, quotasW(lg), cum) }
      }.toSet
    assert(gotW === naiveW, "two-phase cumsum diverged from the naive window")

    // And the dominant key genuinely spans many rank buckets (the rewrite
    // is exercised, not vacuously equal on a one-bucket corpus).
    val enQuota = quotas("en")
    assert(enQuota > 100L, s"en quota $enQuota too small to span buckets")
  }

  test("temperatureMix topUp: quotas sum to exactly n; floor-or-floor+1 per key") {
    // 80/16/40 corpus, n = 50: floor quotas are 23/10/16 → Σ = 49, the
    // one leftover goes to the largest remainder (sw, ≈.411). Every key
    // ends at floor or floor+1, never more; no population cap binds.
    val corpus = ((1 to 80).map(i => (i.toLong, "en")) ++
      (101 to 116).map(i => (i.toLong, "de")) ++
      (201 to 240).map(i => (i.toLong, "sw"))).toDF("doc_id", "lang")
    val n = 50L
    val floorQ = Sampling.temperatureMix(corpus, "doc_id", "lang", n)
      .groupBy("lang").agg(max("quota")).as[(String, Long)].collect().toMap
    val topQ = Sampling.temperatureMix(corpus, "doc_id", "lang", n, topUp = true)
      .groupBy("lang").agg(max("quota")).as[(String, Long)].collect().toMap
    assert(topQ.values.sum === n,
      s"topped-up quotas $topQ do not sum to n=$n (floor was $floorQ)")
    topQ.foreach { case (k, q) =>
      assert(q == floorQ(k) || q == floorQ(k) + 1,
        s"$k topped from ${floorQ(k)} to $q — not a largest-remainder +1")
    }
    assert(floorQ.values.sum < n, "fixture must exercise a real top-up")
    // Deterministic and layout-independent, like the floor form.
    val again = Sampling.temperatureMix(
        corpus.repartition(7, col("doc_id")), "doc_id", "lang", n, topUp = true)
      .select("lang", "doc_id", "quota", "rnk")
      .as[(String, Long, Long, Long)].collect().toSet
    val first = Sampling.temperatureMix(corpus, "doc_id", "lang", n, topUp = true)
      .select("lang", "doc_id", "quota", "rnk")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(again === first)
  }

  test("epochMixExpand fails loudly past the repetition ceiling; plan div is exact at huge n") {
    // A 2-row key asked for 2^40 samples would build million-element
    // sequence arrays per row — the guard must throw with the named
    // limit, not OOM an executor.
    val tiny = Seq((1L, "en"), (2L, "en")).toDF("doc_id", "lang")
    val boom = intercept[Exception] {
      Sampling.epochMixExpand(tiny, "doc_id", "lang", n = 1L << 40).collect()
    }
    val msgs = Iterator.iterate[Throwable](boom)(_.getCause)
      .takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("epochMixExpand"), s"unexpected failure: ${msgs.take(400)}")
    // The PLAN stays exact at magnitudes where double division would
    // round: epochs * keyn + rem == quota as true long arithmetic
    // (Spark `div`, oracle `//`; a `/`-based plan breaks above 2^53).
    // n must be double-representable (the quota formula is one double
    // division BY DESIGN); 2^60 is, and 2^60/3 already rounds wrong under
    // `/`-then-cast (…336 vs the exact …325), so the invariant below
    // catches a regression to double division.
    val plan = Sampling.epochMixPlan(
        Seq((1L, "en"), (2L, "en"), (3L, "en")).toDF("doc_id", "lang"),
        "lang", n = 1L << 60)
      .select("keyn", "quota", "epochs", "rem")
      .as[(Long, Long, Long, Long)].head()
    assert(plan._3 * plan._1 + plan._4 === plan._2,
      s"plan arithmetic drifted: $plan")
    assert(plan._2 === 1L << 60, s"single-key quota must be n: $plan")
  }

  test("epochMixPlan/epochMixExpand: surplus quota becomes repetition; " +
      "expand emits exactly quota rows per key with contiguous epoch ids") {
    // en 8 rows, sw 2 rows, n = 20: sqrt shares 2/3 and 1/3 give quotas
    // 13 and 6 — en repeats 1 full pass + 5 extras, sw exactly 3 passes.
    val corpus = ((1 to 8).map(i => (i.toLong, "en")) ++
      Seq((101L, "sw"), (102L, "sw"))).toDF("doc_id", "lang")
    val plan = Sampling.epochMixPlan(corpus, "lang", n = 20L)
      .select("lang", "keyn", "quota", "epochs", "rem")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(plan("en") === ((8L, 13L, 1L, 5L)), plan)
    assert(plan("sw") === ((2L, 6L, 3L, 0L)), plan)
    val got = Sampling.epochMixExpand(corpus, "doc_id", "lang", n = 20L)
      .select("lang", "doc_id", "epoch")
      .as[(String, Long, Long)].collect()
    // Exactly quota rows per key.
    val byKey = got.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(byKey === Map("en" -> 13L, "sw" -> 6L), byKey)
    // Every doc appears epochs or epochs+1 times with contiguous epoch
    // ids 0..copies-1; sw docs appear exactly 3 times each.
    got.groupBy(r => (r._1, r._2)).foreach { case ((k, id), rows) =>
      val (e, _, _) = (plan(k)._3, 0, 0)
      assert(rows.length == e || rows.length == e + 1, s"$k/$id x${rows.length}")
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq,
        s"$k/$id epochs not contiguous: ${rows.map(_._3).sorted.toSeq}")
    }
    assert(got.filter(_._1 == "sw").groupBy(_._2).forall(_._2.length == 3))
    // Deterministic + layout-independent.
    val again = Sampling.epochMixExpand(
        corpus.repartition(5, col("doc_id")), "doc_id", "lang", n = 20L)
      .select("lang", "doc_id", "epoch")
      .as[(String, Long, Long)].collect()
    assert(again.toSet === got.toSet)
    assert(again.length === got.length)
  }

  test("temperatureMixManyKeys == temperatureMix: keyed metadata is a pure physical change") {
    // Mixed shape: one dominant key + a tail, quotas mid-bucket — the
    // keyed variant must reproduce the window form's rows, quotas, AND
    // ranks exactly (the shared oracle row pins the same equality at
    // sf0.01; this pins it on an adversarial in-memory corpus too).
    val corpus = ((1L to 800L).map(i => (i, "en")) ++
      (1001L to 1080L).map(i => (i, "de")) ++
      (2001L to 2030L).map(i => (i, "sw")) ++
      (3001L to 3010L).map(i => (i, "fi")))
      .toDF("doc_id", "lang")
    val win = Sampling.temperatureMix(corpus, "doc_id", "lang", n = 250L)
      .select("lang", "doc_id", "quota", "rnk")
      .as[(String, Long, Long, Long)].collect().toSet
    val keyed = Sampling.temperatureMixManyKeys(corpus, "doc_id", "lang", n = 250L)
      .select("lang", "doc_id", "quota", "rnk")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(keyed === win, "keyed quota/selection diverged from the window form")
    // Layout-independence (the keyed joins introduce new exchanges; the
    // content-hash selection must not care).
    val again = Sampling.temperatureMixManyKeys(
        corpus.repartition(7, col("doc_id")), "doc_id", "lang", n = 250L)
      .select("lang", "doc_id", "quota", "rnk")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(again === win)
  }

  test("mixer key-cardinality guard: past graft.mixer.maxKeys the quota raises " +
      "with guidance; the keyed variant has no ceiling") {
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val corpus = (1L to 200L).map(i => (i, s"k${i % 50}", i % 7 + 1L))
      .toDF("doc_id", "key", "w")
    spark.conf.set("graft.mixer.maxKeys", "8")
    try {
      // histMeta guard: count mixers.
      val e1 = intercept[Exception] {
        Sampling.temperatureMix(corpus, "doc_id", "key", n = 60L).collect()
      }
      assert(msgs(e1).contains("graft.mixer.maxKeys") &&
        msgs(e1).contains("temperatureMixManyKeys"), msgs(e1).take(400))
      val e2 = intercept[Exception] {
        Sampling.epochMixExpand(corpus, "doc_id", "key", n = 60L).collect()
      }
      assert(msgs(e2).contains("graft.mixer.maxKeys"), msgs(e2).take(400))
      // alphaQuotas guard: the weight mixer and the epoch plan.
      val e3 = intercept[Exception] {
        Sampling.temperatureMixByWeight(
          corpus, "doc_id", "key", "w", budget = 300L).collect()
      }
      assert(msgs(e3).contains("graft.mixer.maxKeys"), msgs(e3).take(400))
      // The keyed variant is the documented escape hatch: same call, same
      // ceiling setting, correct result.
      val keyed = Sampling.temperatureMixManyKeys(corpus, "doc_id", "key", n = 60L)
        .select("key", "doc_id", "quota", "rnk")
        .as[(String, Long, Long, Long)].collect()
      assert(keyed.nonEmpty)
      // ... equal to the window form once the ceiling admits the corpus.
      spark.conf.set("graft.mixer.maxKeys", "1000")
      val win = Sampling.temperatureMix(corpus, "doc_id", "key", n = 60L)
        .select("key", "doc_id", "quota", "rnk")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(keyed.toSet === win)
    } finally spark.conf.unset("graft.mixer.maxKeys")
  }

  test("corpusShuffle == naive global hash window; seq is a permutation") {
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 500L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "src")
    val got = Sampling.corpusShuffle(df, "doc_id", docsPerShard = 32L)
      .select("doc_id", "seq", "shard", "pos")
      .as[(Long, Long, Long, Long)].collect()
    val fp = conv(substring(md5(concat_ws(":", lit("graft"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
    val naive = df.withColumn("__fp", fp)
      .withColumn("seq", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("__fp").asc, col("doc_id").asc))
        .cast("long"))
      .select(col("doc_id"), col("seq"),
        expr("(seq - 1) div 32L").as("shard"),
        ((col("seq") - 1L) % 32L).as("pos"))
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSet === naive.toSet,
      "two-phase global shuffle diverged from the naive window")
    assert(got.map(_._2).sorted.toSeq === (1L to 500L),
      "seq is not a permutation of 1..n")
    // Determinism across layout.
    val again = Sampling.corpusShuffle(df.repartition(7), "doc_id", 32L)
      .select("doc_id", "seq").as[(Long, Long)].collect().toSet
    assert(again === got.map(r => (r._1, r._2)).toSet)
  }

  test("curriculumOrder: stages are contiguous, within-stage order is the hash shuffle") {
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 300L).map(i => (i, (i % 3) + 1)).toDF("doc_id", "stage")
    val got = Sampling.curriculumOrder(df, "doc_id", "stage", docsPerShard = 16L)
      .select("doc_id", "stage", "seq", "shard", "pos")
      .as[(Long, Long, Long, Long, Long)].collect()
    val fp = conv(substring(md5(concat_ws(":", lit("graft"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
    val naive = df.withColumn("__fp", fp)
      .withColumn("seq", row_number().over(
        Window.partitionBy(lit(1))
          .orderBy(col("stage").asc, col("__fp").asc, col("doc_id").asc))
        .cast("long"))
      .select(col("doc_id"), col("stage"), col("seq"),
        expr("(seq - 1) div 16L").as("shard"),
        ((col("seq") - 1L) % 16L).as("pos"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.toSet === naive.toSet,
      "curriculum order diverged from the naive (stage, hash, id) window")
    // Every stage occupies one contiguous seq range, in ascending order.
    val ranges = got.groupBy(_._2).view
      .mapValues(rs => (rs.map(_._3).min, rs.map(_._3).max)).toMap
    assert(ranges(1L)._2 < ranges(2L)._1 && ranges(2L)._2 < ranges(3L)._1,
      s"stages interleave: $ranges")
    val e = intercept[IllegalArgumentException] {
      Sampling.curriculumOrder(
        df.withColumn("seq", lit(1L)), "doc_id", "stage", 16L)
    }
    assert(e.getMessage.contains("curriculumOrder"))
  }
}
