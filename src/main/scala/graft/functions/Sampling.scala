package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / quota operators for training-data mixing.
  *
  * All decisions are pure functions of row content (md5 — identical
  * lowercase-hex semantics in Spark and the DuckDB oracle), never of
  * partitioning or RNG state: re-running the pipeline, on any cluster
  * layout, selects the same rows. That property is what makes sampled
  * pretraining corpora reproducible and is why `df.sample()` (seeded
  * per-partition RNG — layout-dependent) is not used.
  */
object Sampling {

  /** Uniform hex threshold for rate r: keep iff the first 8 md5 hex chars,
    * read as a uniform 32-bit value, fall below r * 2^32. String comparison
    * on fixed-width lowercase hex IS the numeric comparison — no bigint
    * conversion needed, and both engines agree byte-for-byte. */
  private[functions] def hexThreshold(rate: Double): String = {
    val clamped = math.min(math.max(rate, 0.0), 1.0)
    val v = (clamped * 4294967296.0).toLong
    // rate >= 1.0 overflows 8 hex chars: "g" sorts above every hex string.
    if (v >= 4294967296L) "g" else f"$v%08x"
  }

  private def keyHash(seedAndKey: Column): Column = substring(md5(seedAndKey), 1, 8)

  /** Content-hash uniform in (0,1): the first 8 md5 hex chars of the
    * ":"-joined parts read as a 32-bit value v, mapped to (v+0.5)/2^32.
    * SINGLE-SOURCED on purpose — every sampler's DuckDB oracle twin
    * replays this exact recipe (offset 0.5, divisor 2^32), so one edit
    * here is one edit everywhere instead of a silent rank divergence in
    * whichever copy was missed. */
  private def hashUniform(parts: Column*): Column = {
    val v = conv(keyHash(concat_ws(":", parts: _*)), 16, 10).cast("double")
    (v + lit(0.5)) / lit(4294967296.0)
  }

  /** Gumbel-top-k sort key over a `log_w` column: 1e-6 fixed-point
    * `log_w + Gumbel(0,1)` with the Gumbel drawn from a content-hash
    * uniform — both addends LONGS so the DuckDB oracle ranks identically
    * despite last-ulp ln() differences. Shared by both resamplers. */
  private def gumbelKey(u: Column): Column =
    round(col("log_w") * 1e6, 0).cast("long") +
      round(-log(-log(u)) * 1e6, 0).cast("long")

  /** Per-stratum deterministic Bernoulli sampling: keep a row iff
    * md5(seed:stratum:id)[0,8) < threshold(rate(stratum)). `rates` maps
    * stratum value -> sampling rate (strata absent from the map keep
    * `defaultRate`). Narrow — no shuffle, no RNG; the corpus-mixing
    * primitive ("keep 60% of web, 100% of books, 5% of logs"). */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      seed: String = "graft"): DataFrame = {
    val h = keyHash(concat_ws(":", lit(seed), col(stratumCol), col(idCol).cast("string")))
    val thr = rates.foldLeft(lit(hexThreshold(defaultRate))) { case (els, (stratum, rate)) =>
      when(col(stratumCol) === stratum, lit(hexThreshold(rate))).otherwise(els)
    }
    df.filter(h < thr)
  }

  /** Deterministic weighted sampling without replacement (Efraimidis &
    * Spirakis 2006): per stratum, keep the k rows with the largest
    * u^(1/w) — equivalently the largest ln(u)/w, the monotone form used
    * here — where u is a content-hash uniform in (0,1) and w the row's
    * weight ("sample documents proportional to token count"). Content-hash
    * u makes the draw layout-independent and reproducible, like
    * [[stratifiedSample]]; the selection itself is [[capPerKey]]'s
    * partitioned-window shape (one shuffle by stratum). The sort key is
    * rounded to 6 decimals with id as tie-break so the DuckDB oracle ranks
    * identically despite last-ulp ln() differences. */
  def weightedSampleTopK(
      df: DataFrame, idCol: String, stratumCol: String, weightCol: String,
      k: Int, seed: String = "graft"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = hashUniform(lit(seed), col(stratumCol), col(idCol).cast("string"))
    val skey = round(log(u) / greatest(col(weightCol).cast("double"), lit(1e-9)), 6)
    val w = Window.partitionBy(stratumCol).orderBy(col("skey").desc, col(idCol).asc)
    df.withColumn("skey", skey)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Temperature-scaled mixture sampling — the LLM data-mixing step
    * (GPT-3's dataset-sampling table, Brown et al. 2020 §2.2; PaLM /
    * multilingual "alpha-sampling": per-key quotas proportional to
    * count^alpha — alpha < 1 upsamples low-resource keys relative to
    * their raw share, alpha = 1 is proportional). Quotas are
    * `floor(n · cnt^alpha / Σ cnt^alpha)`; rows within a key are chosen
    * by content-hash order ([[hashUniform]] — layout-independent,
    * reproducible, no RNG), ids as tie-break.
    *
    * Cross-engine exactness: the default alpha = 0.5 ("square-root
    * mixing") uses sqrt — correctly rounded under IEEE 754 in both
    * engines — then 1e-6 fixed-point longs, and the quota division
    * n·w6 / Σw6 is one IEEE double division (also correctly rounded) of
    * exactly-representable integers, so the DuckDB oracle replays every
    * quota bit-exactly. Other alphas route through pow, which IEEE does
    * NOT require correctly rounded — spot-check before oracle-pinning a
    * non-0.5 alpha. Quotas FLOOR, so Σ sampled ≤ n: the
    * largest-remainder top-up is deliberately absent (determinism and
    * engine-exactness over hitting n exactly).
    *
    * Scale shape: one keyed count (output bounded by key cardinality),
    * a broadcast quota join, and one shuffle by key for the per-key
    * hash-order window — the [[capPerKey]] cost model, with the same
    * hottest-key caveat. Output: the sampled rows + (quota, rnk). */
  def temperatureMix(
      df: DataFrame, idCol: String, keyCol: String,
      n: Long, alpha: Double = 0.5, seed: String = "graft"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireFreeColumns(df, "temperatureMix", Seq("quota", "rnk", "samp_u"))
    // Quota caps at the key's population: alpha-rebalancing can assign a
    // scarce key MORE than it holds (sqrt upsampling is exactly that
    // aggressive), and this operator samples without replacement —
    // [[epochMixPlan]]/[[epochMixExpand]] are the replacement path.
    val quotas = alphaQuotas(
        df.groupBy(col(keyCol)).agg(count(lit(1)).as("__mass")),
        keyCol, n, alpha)
      .select(col(keyCol), least(col("quota"), col("__mass")).as("quota"))
    val u = hashUniform(lit(seed), col(keyCol), col(idCol).cast("string"))
    val w = Window.partitionBy(keyCol).orderBy(col("samp_u").asc, col(idCol).asc)
    df.withColumn("samp_u", round(u, 6))
      .join(broadcast(quotas), Seq(keyCol))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= col("quota"))
      .drop("samp_u")
  }

  /** The SINGLE-SOURCED alpha-quota recipe every mixer shares (the
    * [[hashUniform]] principle: one edit here, not a silent divergence
    * in whichever copy was missed): input is one row per key with its
    * long mass in `__mass` (a count or a weight sum); output adds
    * `quota` = floor(n · mass^alpha / Σ mass^alpha), UNCAPPED — each
    * caller applies its own cap/div-mod policy. sqrt at alpha = 0.5 is
    * IEEE-correctly-rounded (oracle-exact); other alphas route through
    * pow, which is not — spot-check before oracle-pinning one. */
  private def alphaQuotas(
      masses: DataFrame, keyCol: String, n: Long, alpha: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 0L, s"n must be >= 0, got $n")
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val m = col("__mass").cast("double")
    val wExpr = if (alpha == 0.5) sqrt(m) else pow(m, lit(alpha))
    val weights = masses.select(col(keyCol), col("__mass"),
      round(wExpr * 1e6, 0).cast("long").as("__w6"))
    // Σw6 via a whole-frame window, NOT a separate agg + cross join: the
    // agg form references the weights subtree twice, which re-runs the
    // corpus-scale mass aggregation per consumer (the mixer plan gate
    // caught exactly that — 3 corpus scans instead of 2). The weights
    // frame is key-cardinality-bounded, so one single-partition window
    // over it is free.
    weights
      .withColumn("__sumw6",
        sum(col("__w6")).over(Window.partitionBy(lit(1))).cast("long"))
      .select(col(keyCol), col("__mass"),
        floor(lit(n.toDouble) * col("__w6").cast("double")
          / col("__sumw6").cast("double")).cast("long").as("quota"))
  }

  /** Reserved-name guard for the mixers: their quota join would make a
    * pre-existing column of the same name ambiguous (AnalysisException
    * at best) or silently drop the user's column at the end. */
  private def requireFreeColumns(
      df: DataFrame, op: String, reserved: Seq[String]): Unit = {
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"$op reserves column name(s) ${clash.mkString(", ")} — rename them " +
        s"on the input first (reserved: ${reserved.mkString(", ")})")
  }

  /** The WITH-replacement completion of [[temperatureMix]]: when a key's
    * alpha-scaled quota exceeds its population, the surplus becomes
    * REPETITION — full passes over the key plus a partial pass (GPT-3's
    * dataset table literally lists epochs per source: 0.44 for
    * CommonCrawl, 3.4 for Wikipedia). Returns ONE ROW PER KEY — the
    * plan, not the materialized corpus: (key, keyn, quota, epochs =
    * quota div keyn full passes, rem = quota mod keyn rows of the next
    * pass). Quotas are UNCAPPED floor(n · cnt^alpha / Σ) — the cap is
    * [[temperatureMix]]'s without-replacement contract; this operator is
    * the replacement path. All plan arithmetic is integer-exact after
    * the shared sqrt/fixed-point/one-division recipe. Keys with zero
    * rows cannot occur (quotas derive from observed counts). */
  def epochMixPlan(
      df: DataFrame, keyCol: String, n: Long,
      alpha: Double = 0.5): DataFrame =
    alphaQuotas(
        df.groupBy(col(keyCol)).agg(count(lit(1)).as("__mass")),
        keyCol, n, alpha)
      .select(col(keyCol), col("__mass").as("keyn"), col("quota"))
      .withColumn("epochs", (col("quota") / col("keyn")).cast("long"))
      .withColumn("rem", col("quota") % col("keyn"))

  /** Materialize an [[epochMixPlan]]: every row of a key appears
    * `epochs` times (epoch ids 0..epochs−1), and the key's hash-order
    * first `rem` rows once more (epoch id `epochs`) — exactly `quota`
    * output rows per key, Σ = Σ quotas ≤ n. The repetition explode is
    * narrow (each input row emits its own copies); the only shuffle is
    * the hash-order window that decides the partial pass's membership.
    * Output: the input columns + (epoch). Downstream shuffles the
    * result by training shard anyway, so copies landing on their
    * source's partition is fine at any scale. */
  def epochMixExpand(
      df: DataFrame, idCol: String, keyCol: String, n: Long,
      alpha: Double = 0.5, seed: String = "graft"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireFreeColumns(df, "epochMixExpand",
      Seq("keyn", "quota", "epochs", "rem", "rnk", "copies", "epoch", "samp_u"))
    val plan = epochMixPlan(df, keyCol, n, alpha)
    val u = hashUniform(lit(seed), col(keyCol), col(idCol).cast("string"))
    val w = Window.partitionBy(keyCol).orderBy(col("samp_u").asc, col(idCol).asc)
    df.withColumn("samp_u", round(u, 6))
      .join(broadcast(plan), Seq(keyCol))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("copies",
        col("epochs") + when(col("rnk") <= col("rem"), 1L).otherwise(0L))
      .filter(col("copies") > 0L)
      .withColumn("epoch", explode(sequence(lit(0L), col("copies") - 1L)))
      .drop("samp_u", "keyn", "quota", "epochs", "rem", "rnk", "copies")
  }

  /** [[temperatureMix]] in WEIGHT units (token-budget mixing — what a
    * training pipeline actually budgets): per-key quotas are
    * `floor(budget · W_k^alpha / Σ W_j^alpha)` where `W_k` is the key's
    * total weight (token count), and each key keeps the maximal
    * content-hash-order PREFIX whose cumulative weight fits the quota
    * (rows individually larger than the whole quota are excluded up
    * front, so one oversized document cannot zero its key). A prefix
    * rule, not bin-packing: deterministic, one window, and every
    * keep/drop decision is an integer comparison the oracle replays.
    * Weights must be non-negative integers (token counts — summed
    * exactly as longs).
    *
    * Same cross-engine-exactness posture as [[temperatureMix]] (sqrt at
    * the alpha = 0.5 default; quota arithmetic in exactly-representable
    * longs + one correctly-rounded double division). The running sum is
    * a per-key cumulative window in hash order — integer-exact, so the
    * oracle replays every keep/skip decision. One keyed aggregate + a
    * broadcast quota join + one shuffle-by-key window, like
    * [[temperatureMix]]. Output: kept rows + (quota, cum). */
  def temperatureMixByWeight(
      df: DataFrame, idCol: String, keyCol: String, weightCol: String,
      budget: Long, alpha: Double = 0.5, seed: String = "graft"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireFreeColumns(df, "temperatureMixByWeight",
      Seq("quota", "cum", "samp_u"))
    val quotas = alphaQuotas(
        df.groupBy(col(keyCol)).agg(sum(col(weightCol).cast("long")).as("__mass")),
        keyCol, budget, alpha)
      .select(col(keyCol), least(col("quota"), col("__mass")).as("quota"))
    val u = hashUniform(lit(seed), col(keyCol), col(idCol).cast("string"))
    val order = Window.partitionBy(keyCol)
      .orderBy(col("samp_u").asc, col(idCol).asc)
    // Maximal-prefix fill: cumulative sum over hash order, keep while
    // cum <= quota; rows whose own weight exceeds the quota are excluded
    // BEFORE the sum (they could never be kept and would otherwise poison
    // the cumulative for everything behind them), and ZERO-weight rows
    // are excluded too — a token-budget sampler emits no token-free
    // docs, and without this a zero-quota key (budget 0, or an
    // all-empty key) would emit every weightless row "for free".
    // Integer-exact.
    val hashed = df
      .withColumn("samp_u", round(u, 6))
      .join(broadcast(quotas), Seq(keyCol))
      .filter(col(weightCol).cast("long") <= col("quota") &&
        col(weightCol).cast("long") > 0L)
    hashed
      .withColumn("cum",
        sum(col(weightCol).cast("long"))
          .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") <= col("quota"))
      .drop("samp_u")
  }

  /** Per-key quota: keep at most `cap` rows per `keyCol`, chosen by
    * ascending `orderCol` (deterministic priority — e.g. doc id, or a
    * quality rank). The domain-cap primitive ("at most N pages per domain").
    * One shuffle by key; the window is PARTITIONED (frame bounded by the
    * hottest key — a skewed mega-key is bounded by dropping its tail, which
    * is exactly this operator's purpose, but the sort still pays that key's
    * full cardinality; pair with a coarse pre-filter if a single key can
    * exceed one executor's sort budget). */
  def capPerKey(df: DataFrame, keyCol: String, orderCol: String, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(col(orderCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Hashed n-gram feature stream for [[dsirWeights]]: one row per
    * (document, feature-bucket) occurrence, where a feature is every
    * whitespace token plus every adjacent token PAIR ("a b" — unigrams
    * contain no whitespace, so the two families can never collide), and
    * the bucket is the md5-uniform hash of the feature modulo `buckets`.
    * Built from the per-row token ARRAY (one narrow map, no shuffle) —
    * NOT lag-over-window, which would shuffle the full token stream by
    * document id just to pair neighbors that already sit in one array. */
  private def hashedNgramFeatures(
      df: DataFrame, textCol: String, buckets: Int,
      keep: Column*): DataFrame = {
    val ws = TextAnalysis.words(col(textCol))
    val bigrams = when(size(ws) >= 2,
      zip_with(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    df.select(keep :+ explode(concat(ws, bigrams)).as("__f"): _*)
      .select(keep :+ pmod(conv(substring(md5(col("__f")), 1, 8), 16, 10)
        .cast("long"), lit(buckets.toLong)).as("bucket"): _*)
  }

  /** DSIR importance weights (Data Selection via Importance Resampling —
    * Xie et al. 2023, arXiv:2302.03169): score every raw-corpus document
    * by how much its hashed-n-gram distribution looks like a TARGET
    * corpus. Features are unigrams + word bigrams hashed into `buckets`
    * buckets; both corpora fit Laplace-smoothed multinomials over the
    * buckets, and a document's log importance weight is
    * `Σ_features ln(p_target(bucket) / p_raw(bucket))` — the bag-of-
    * hashed-ngrams likelihood ratio. High `log_w` = looks like the
    * target; feed the output to [[dsirResample]] to select.
    *
    * Scale: two passes over the raw corpus (fit, then score — inherent to
    * the method) and one over the target, all narrow maps feeding
    * map-side-combined aggregations. The per-bucket log-ratio table is
    * bounded by `buckets` ROWS BY CONSTRUCTION (a groupBy on a pmod key),
    * so its explicit `broadcast` can never OOM — unlike a vocabulary
    * join, where the key space is data-dependent and [[TextAnalysis]]
    * must auto-switch. Per-feature log-ratios are fixed-pointed to 1e-6
    * longs BEFORE the per-document sum, so weights are partition-order-
    * independent and oracle-verifiable. */
  def dsirWeights(
      raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      buckets: Int = 4096): DataFrame =
    dsirScore(raw, idCol, textCol,
      dsirFit(raw, textCol, target, targetTextCol, buckets), buckets)

  /** DSIR fit: the standing per-bucket log-ratio table the method trains —
    * `ln(p_target(bucket)) − ln(p_raw(bucket))` under Laplace-smoothed
    * bucket multinomials, as a 1e-6 fixed-point long. Covers ALL `buckets`
    * rows (a bucket no fit-time feature hashed to carries the fully-
    * smoothed default), so scoring any FUTURE document — the streaming
    * gate's case — is a total inner join. Persist it through a TableStore
    * and refresh offline, like the repeated-shingle snapshot; exactly
    * `buckets` rows by construction, so serving always broadcasts. */
  def dsirFit(
      raw: DataFrame, rawTextCol: String,
      target: DataFrame, targetTextCol: String,
      buckets: Int = 4096): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"buckets must be in [2, 2^20], got $buckets")
    // Each histogram feeds BOTH its total and the ratio join: materialize
    // once (bounded ≤ buckets rows) or the corpus feature explode
    // evaluates twice per side — the double-subtree trap the
    // clusterLabels scaladoc documents.
    val rawB = hashedNgramFeatures(raw, rawTextCol, buckets)
      .groupBy("bucket").agg(count(lit(1)).cast("long").as("rc"))
      .localCheckpoint()
    val tgtB = hashedNgramFeatures(target, targetTextCol, buckets)
      .groupBy("bucket").agg(count(lit(1)).cast("long").as("tc"))
      .localCheckpoint()
    val tots = rawB.agg(coalesce(sum(col("rc")).cast("double"), lit(0.0)).as("tr"))
      .crossJoin(tgtB.agg(coalesce(sum(col("tc")).cast("double"), lit(0.0)).as("tt")))
    val b = lit(buckets.toDouble)
    raw.sparkSession.range(0, buckets).select(col("id").as("bucket"))
      .join(rawB, Seq("bucket"), "left")
      .join(tgtB, Seq("bucket"), "left")
      .crossJoin(broadcast(tots))
      .select(col("bucket"),
        round((log((coalesce(col("tc"), lit(0L)).cast("double") + 1.0) / (col("tt") + b))
          - log((coalesce(col("rc"), lit(0L)).cast("double") + 1.0) / (col("tr") + b))) * 1e6, 0)
          .cast("long").as("lr"))
  }

  /** The hashed-n-gram bucket histogram [[distributionDrift]] compares:
    * (bucket, cnt) with one row per populated bucket (≤ `buckets` rows).
    * Persist a baseline corpus's histogram through a TableStore and feed
    * it to [[driftAgainstCounts]] / the streaming drift alarm. */
  def bucketCounts(df: DataFrame, textCol: String, buckets: Int = 4096): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"buckets must be in [2, 2^20], got $buckets")
    hashedNgramFeatures(df, textCol, buckets)
      .groupBy("bucket").agg(count(lit(1)).cast("long").as("cnt"))
  }

  /** Corpus distribution drift between two snapshots: Jensen–Shannon
    * divergence and L1 distance between the corpora's hashed-n-gram
    * bucket multinomials (same features as [[dsirWeights]]) — the
    * "did this crawl's content shift?" monitor run between snapshot
    * refreshes, BEFORE a drifted batch contaminates the training mix.
    * JS is used (not KL) because either side may populate buckets the
    * other lacks — JS is finite and symmetric there. True (unsmoothed)
    * multinomials; per-bucket terms are fixed-pointed to 1e-9 longs
    * before the sum (terms are O(1/buckets), so 1e-6 grain would eat
    * them), making the scalar partition-order-independent and
    * oracle-verifiable. One aggregation pass per corpus, then a
    * buckets-bounded outer join — corpus text never joins anything.
    * Output: one row (js_divergence, l1_distance, buckets_a,
    * buckets_b, buckets_shared). */
  def distributionDrift(
      a: DataFrame, aTextCol: String,
      b: DataFrame, bTextCol: String,
      buckets: Int = 4096): DataFrame =
    driftAgainstCounts(bucketCounts(a, aTextCol, buckets),
      bucketCounts(b, bTextCol, buckets))

  /** The shared JS+L1 per-bucket fixed-point term block: over joined rows
    * carrying (ca, ta) for side A and (cb, tb) for side B, emit the 1e-9
    * fixed-point js/l1 terms plus the occupancy indicators both drift
    * forms aggregate. The 1e-9 grain, the p>0 guards, and the
    * greatest(total, 1.0) zero-total convention are spec-pinned and
    * mirrored in the DuckDB oracles — single-sourced here so the scalar
    * and per-stratum forms (and their oracles) can never drift apart. */
  private def driftTermCols: Seq[Column] = {
    val pa = coalesce(col("ca"), lit(0L)).cast("double") / greatest(col("ta"), lit(1.0))
    val pb = coalesce(col("cb"), lit(0L)).cast("double") / greatest(col("tb"), lit(1.0))
    val m = (pa + pb) / 2.0
    val termA = when(pa > 0.0, pa * log(pa / m)).otherwise(lit(0.0))
    val termB = when(pb > 0.0, pb * log(pb / m)).otherwise(lit(0.0))
    Seq(
      round((termA + termB) / 2.0 * 1e9, 0).cast("long").as("js9"),
      round(abs(pa - pb) * 1e9, 0).cast("long").as("l19"),
      col("ca").isNotNull.cast("long").as("ia"),
      col("cb").isNotNull.cast("long").as("ib"),
      (col("ca").isNotNull && col("cb").isNotNull).cast("long").as("ish"))
  }

  /** The matching aggregate exprs over [[driftTermCols]] output. */
  private def driftAggExprs: Seq[Column] = Seq(
    sum(col("js9")).as("js"), sum(col("l19")).as("l1"),
    sum(col("ia")).cast("long").as("buckets_a"),
    sum(col("ib")).cast("long").as("buckets_b"),
    sum(col("ish")).cast("long").as("buckets_shared"))

  /** The shared output shape: fixed-point sums back to 6-decimal doubles. */
  private def driftOutCols: Seq[Column] = Seq(
    round(col("js").cast("double") / 1e9, 6).as("js_divergence"),
    round(col("l1").cast("double") / 1e9, 6).as("l1_distance"),
    col("buckets_a"), col("buckets_b"), col("buckets_shared"))

  /** [[distributionDrift]] over two PRE-AGGREGATED [[bucketCounts]]
    * histograms — the serve half for a standing baseline: the baseline
    * corpus aggregates once, persists its ≤-buckets-row histogram, and
    * every later comparison (a new snapshot, a micro-batch) joins
    * against that table instead of re-reading the baseline corpus. */
  def driftAgainstCounts(aCounts: DataFrame, bCounts: DataFrame): DataFrame = {
    // Each side feeds BOTH its total and the outer join: materialize the
    // bounded (≤ buckets rows) histograms once so a counts frame built
    // from a raw corpus ([[distributionDrift]]'s case) never re-runs its
    // feature explode for the second reference. One-shot convenience
    // form: the checkpoints live until the session drops them. A LOOP —
    // above all a standing foreachBatch alarm, which would otherwise
    // accumulate two checkpointed RDDs PER TRIGGER for its lifetime —
    // must instead materialize its own frames and release them after the
    // sink returns (see [[graft.stream.EventAnalytics.driftAlarmEachBatch]],
    // which checkpoints the baseline once per alarm and the batch side
    // per trigger, unpersisting in finally), calling
    // [[driftCountsJoin]] directly.
    driftCountsJoin(
      aCounts.select(col("bucket"), col("cnt").as("ca")).localCheckpoint(),
      bCounts.select(col("bucket"), col("cnt").as("cb")).localCheckpoint())
  }

  /** The drift join/aggregation over histogram frames the CALLER has
    * already renamed — `aB` = (bucket, ca), `bB` = (bucket, cb) — and
    * materialized. No checkpoint is taken here, so the caller owns both
    * frames' lifecycle; each side still feeds both its total and the
    * outer join, so an unmaterialized corpus-derived input would run its
    * feature explode twice. Use [[driftAgainstCounts]] unless you hold
    * that contract. */
  def driftCountsJoin(aB: DataFrame, bB: DataFrame): DataFrame = {
    val tots = aB.agg(coalesce(sum(col("ca")).cast("double"), lit(0.0)).as("ta"))
      .crossJoin(bB.agg(coalesce(sum(col("cb")).cast("double"), lit(0.0)).as("tb")))
    aB.join(bB, Seq("bucket"), "full_outer")
      .crossJoin(broadcast(tots))
      .select(driftTermCols: _*)
      .agg(driftAggExprs.head, driftAggExprs.tail: _*)
      .select(driftOutCols: _*)
  }

  /** Per-stratum drift localization: one (stratum, JS, L1) row per
    * stratum of `df`, each compared against the SAME persisted baseline
    * histogram — the actionable form of [[distributionDrift]]'s scalar
    * ("page the crawl that drifted, not everyone"). The comparison grid
    * is strata × baseline-buckets (bounded: |strata| × `buckets` rows)
    * full-outer-joined with the per-(stratum, bucket) counts, so a
    * bucket only one side populates still contributes its term; the
    * corpus text itself never joins anything. Same 1e-9 fixed-point
    * per-bucket terms as the scalar form. */
  def driftByStratum(
      df: DataFrame, textCol: String, stratumCol: String,
      baseline: DataFrame, buckets: Int = 4096): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"buckets must be in [2, 2^20], got $buckets")
    // sb feeds BOTH the totals and the grid join: materialize it once
    // (bounded at |strata| x buckets rows) or the feature explode over
    // the corpus would evaluate twice — the double-subtree-evaluation
    // trap the clusterLabels scaladoc documents.
    val sb = hashedNgramFeatures(df, textCol, buckets, col(stratumCol))
      .groupBy(stratumCol, "bucket").agg(count(lit(1)).cast("long").as("cb"))
      .localCheckpoint()
    val stot = sb.groupBy(stratumCol).agg(sum(col("cb")).cast("double").as("tb"))
    val base = baseline.select(col("bucket"), col("cnt").as("ca"))
    val ta = base.agg(coalesce(sum(col("ca")).cast("double"), lit(0.0)).as("ta"))
    val grid = stot.select(col(stratumCol)).crossJoin(base)
    grid.join(sb, Seq(stratumCol, "bucket"), "full_outer")
      .crossJoin(broadcast(ta))
      .join(broadcast(stot), Seq(stratumCol))
      .select(col(stratumCol) +: driftTermCols: _*)
      .groupBy(stratumCol)
      .agg(driftAggExprs.head, driftAggExprs.tail: _*)
      .select(col(stratumCol) +: driftOutCols: _*)
  }

  /** Score documents against a fitted (or persisted) [[dsirFit]] table:
    * per-document sum of the per-feature fixed-point log-ratios. `buckets`
    * must match the fit's. The serve half of the fit/serve split — a
    * micro-batch gate pays one narrow feature map + one broadcast join +
    * one per-doc aggregation, never a fit pass. */
  def dsirScore(
      df: DataFrame, idCol: String, textCol: String,
      ratio: DataFrame, buckets: Int): DataFrame =
    hashedNgramFeatures(df, textCol, buckets, col(idCol))
      .join(broadcast(ratio), Seq("bucket"))
      .groupBy(idCol)
      .agg(sum(col("lr")).as("s"), count(lit(1)).cast("long").as("n_feats"))
      .select(col(idCol), col("n_feats"),
        round(col("s").cast("double") / 1e6, 6).as("log_w"))

  /** DSIR selection: importance-resample `k` raw documents toward the
    * target distribution via deterministic Gumbel-top-k — key =
    * `log_w + Gumbel(0,1)`, the standard without-replacement draw with
    * probabilities ∝ exp(log_w). The Gumbel noise is a pure function of
    * (seed, id) — content-hash uniform, like every sampler here — so the
    * draw is layout-independent and replays exactly. Both addends are
    * 1e-6 fixed-point LONGS, so ranking ties out identically in the
    * DuckDB oracle. Selection is a global top-k (TakeOrdered — no full
    * sort); the rank window runs AFTER `limit(k)`, over k rows. */
  def dsirResample(
      raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      k: Int, buckets: Int = 4096, seed: String = "graft"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = dsirWeights(raw, idCol, textCol, target, targetTextCol, buckets)
    val skey = gumbelKey(hashUniform(lit(seed), col(idCol).cast("string")))
    val win = Window.orderBy(col("skey").desc, col(idCol).asc)
    w.withColumn("skey", skey)
      .orderBy(col("skey").desc, col(idCol).asc)
      .limit(k)
      .withColumn("rnk", row_number().over(win).cast("long"))
  }

  /** Per-stratum DSIR selection — the form the method actually deploys
    * (select within each domain/source separately, so one domain's high
    * weights can never crowd another out of the mix): Gumbel-top-k
    * WITHIN each stratum, `kPerStratum` rows kept per stratum. The
    * stratum is part of the Gumbel hash, so enlarging one stratum never
    * perturbs another's draw. One keyed join to attach the stratum + one
    * shuffle by stratum for the partitioned window ([[capPerKey]]'s
    * shape — the frame is bounded by the hottest stratum). */
  def dsirResamplePerStratum(
      raw: DataFrame, idCol: String, textCol: String, stratumCol: String,
      target: DataFrame, targetTextCol: String,
      kPerStratum: Int, buckets: Int = 4096, seed: String = "graft"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = dsirWeights(raw, idCol, textCol, target, targetTextCol, buckets)
      .join(raw.select(col(idCol), col(stratumCol)), Seq(idCol))
    val skey = gumbelKey(
      hashUniform(lit(seed), col(stratumCol), col(idCol).cast("string")))
    val win = Window.partitionBy(stratumCol).orderBy(col("skey").desc, col(idCol).asc)
    w.withColumn("skey", skey)
      .withColumn("rnk", row_number().over(win).cast("long"))
      .filter(col("rnk") <= kPerStratum)
  }
}
