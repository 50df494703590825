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
    requireFreeColumns(df, "weightedSampleTopK", Seq("skey", "rnk"))
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
    * non-0.5 alpha. Quotas FLOOR by default, so Σ sampled ≤ n;
    * `topUp = true` adds the largest-remainder completion
    * ([[alphaQuotasTopUp]]) so quotas sum to EXACTLY n (before
    * population caps) — integer-exact in both engines, see its note.
    *
    * Scale shape (two-phase histogram selection — see [[rankBucket]]):
    * the mixing key is a corpus SOURCE (a handful of values, one often
    * holding most of the corpus), so a per-key rank window would sort the
    * dominant key on ONE reducer. Instead: one per-(key, samp_u-bucket)
    * histogram pass (map-side combined, ≤ |keys|·[[RankBuckets]] rows —
    * it also supplies the per-key masses, so the corpus is still scanned
    * exactly twice), broadcast per-bucket rank offsets, a NARROW inner
    * join that drops every bucket past the quota point before any
    * shuffle, and a rank window partitioned by (key, bucket) — the
    * surviving ~quota rows sort in ≤ keyn/[[RankBuckets]]-row chunks.
    * `rnk` = bucket offset + within-bucket rank, bit-identical to the
    * single-window per-key rank. Output: the sampled rows + (quota, rnk).
    *
    * Key-cardinality envelope: ENFORCED ([[MixerMaxKeys]]) — past
    * `graft.mixer.maxKeys` the quota column raises with guidance instead
    * of single-reducing the histogram; domain-cardinality mixes go
    * through [[temperatureMixManyKeys]]. */
  def temperatureMix(
      df: DataFrame, idCol: String, keyCol: String,
      n: Long, alpha: Double = 0.5, seed: String = "graft",
      topUp: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireFreeColumns(df, "temperatureMix",
      Seq("quota", "rnk", "samp_u", "__b", "__bn", "__off"))
    val u = hashUniform(lit(seed), col(keyCol), col(idCol).cast("string"))
    val hashed = df.withColumn("samp_u", round(u, 6))
      .withColumn("__b", rankBucket(col("samp_u")))
    val hist = hashed.groupBy(col(keyCol), col("__b"))
      .agg(count(lit(1)).as("__bn"))
    // Quota caps at the key's population: alpha-rebalancing can assign a
    // scarce key MORE than it holds (sqrt upsampling is exactly that
    // aggressive), and this operator samples without replacement —
    // [[epochMixPlan]]/[[epochMixExpand]] are the replacement path.
    // Only buckets whose rank offset is below the quota can hold selected
    // rows; the inner join drops the rest of the corpus NARROWLY.
    val bmeta = histMeta(hist, keyCol, n, alpha, topUp, "__bn")
      .withColumn("quota", least(col("quota"), col("__mass")))
      .filter(col("__off") < col("quota"))
      .select(col(keyCol), col("__b"), col("__off"), col("quota"))
    val w = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col("samp_u").asc, col(idCol).asc)
    hashed
      .join(broadcast(bmeta), Seq(keyCol, "__b"))
      .withColumn("rnk", (col("__off") + row_number().over(w)).cast("long"))
      .filter(col("rnk") <= col("quota"))
      .drop("samp_u", "__b", "__off")
  }

  /** [[temperatureMix]] for DOMAIN-cardinality mixing keys (10^6-10^7
    * values — "at most its alpha-share per registrable domain"), where the
    * window-form metadata is wrong twice over: the whole-frame quota
    * windows would funnel a corpus-scale histogram through ONE partition,
    * and the bucket-offset broadcast would ship a corpus-scale frame to
    * every executor ([[MixerMaxKeys]] guards the default path against
    * exactly this). Same quotas, same selection, same output — bit-equal
    * to [[temperatureMix]] (spec-pinned; q_temperature_mix_manykeys pins
    * it against the same oracle) — but every metadata step scales with
    * key count:
    *
    *   - per-key masses aggregate ONCE into a |keys|-row frame, cached
    *     (persist — lazy, lineage-backed) because it feeds both the
    *     weight-sum scalar and the quota join;
    *   - Σ w^alpha is an AGGREGATE to one broadcast row, not a
    *     whole-frame window (a window cannot tree-reduce: its partition
    *     holds every row regardless of what is summed);
    *   - quota and bucket-offset joins are KEYED (shuffle on the key; AQE
    *     broadcasts from measured size when the key space is actually
    *     small), never hinted broadcast — at 10^7 keys the offset frame
    *     is up to O(n + |keys|) rows, far past broadcast budget;
    *   - the rank join and window share one exchange on (key, bucket).
    *
    * Cost: three corpus scans (masses + histogram + main pass) versus the
    * window form's two — the price of not holding the key space in one
    * task. The per-key population cap and the two-phase bucket rank are
    * unchanged, so a dominant key among the many is still spread over
    * [[RankBuckets]] sort chunks. No `topUp`: largest-remainder
    * completion globally ranks keys by remainder — a single-partition
    * sort of the key space, the exact shape this variant exists to avoid
    * (and distributing < |keys| leftover rows is noise at this
    * cardinality). */
  def temperatureMixManyKeys(
      df: DataFrame, idCol: String, keyCol: String,
      n: Long, alpha: Double = 0.5, seed: String = "graft"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 0L, s"n must be >= 0, got $n")
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    requireFreeColumns(df, "temperatureMixManyKeys",
      Seq("quota", "rnk", "samp_u", "__b", "__bn", "__off", "__mass",
        "__w6", "__sumw6"))
    val masses = df.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("__mass"))
      .persist()
    val m = col("__mass").cast("double")
    val wExpr = if (alpha == 0.5) sqrt(m) else pow(m, lit(alpha))
    val weights = masses.withColumn("__w6", round(wExpr * 1e6, 0).cast("long"))
    // The scalar referencing `weights` twice is safe: masses is cached, so
    // the second reference replays a narrow map over the cache, not the
    // corpus aggregation (the agg-plus-cross-join trap alphaQuotas' window
    // form exists to avoid applies to UNCACHED subtrees).
    val sumw6 = weights.agg(sum(col("__w6")).cast("long").as("__sumw6"))
    val quotas = weights.crossJoin(broadcast(sumw6))
      .select(col(keyCol),
        least(floor(lit(n.toDouble) * col("__w6").cast("double")
          / col("__sumw6").cast("double")).cast("long"), col("__mass"))
          .as("quota"))
    val u = hashUniform(lit(seed), col(keyCol), col(idCol).cast("string"))
    val hashed = df.withColumn("samp_u", round(u, 6))
      .withColumn("__b", rankBucket(col("samp_u")))
    val hist = hashed.groupBy(col(keyCol), col("__b"))
      .agg(count(lit(1)).as("__bn"))
    val bmeta = bucketOffsets(hist, keyCol, "__bn")
      .join(quotas, Seq(keyCol))
      .filter(col("__off") < col("quota"))
      .select(col(keyCol), col("__b"), col("__off"), col("quota"))
    val w = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col("samp_u").asc, col(idCol).asc)
    hashed
      .join(bmeta, Seq(keyCol, "__b"))
      .withColumn("rnk", (col("__off") + row_number().over(w)).cast("long"))
      .filter(col("rnk") <= col("quota"))
      .drop("samp_u", "__b", "__off")
  }

  /** Quota + rank-offset metadata over a mixer histogram, computed as
    * WINDOWS over the histogram itself — the lazy single-subtree twin of
    * [[alphaQuotas]] (same fixed-point sqrt weights, same one-double-
    * division floor; the oracle rows pin both forms, and SamplingSpec
    * pins their quota equality). The agg-then-rejoin form needed an
    * EAGER localCheckpoint because the histogram fed two consumers
    * (masses and offsets); here masses, weights, Σweights, quota, and
    * offsets are all windows over the ≤ |keys|·[[RankBuckets]]-row
    * frame, so the whole quota side is ONE lazy subtree the broadcast
    * join references once — no materialization jobs, no double corpus
    * scan (measured: the checkpoints cost the toy-scale bench ~0.5-1 s
    * per mixer; at 100 TB an eager build-time corpus job per operator
    * construction is simply wrong). `topUp` adds the largest-remainder
    * completion in DECIMAL(38,0) integer arithmetic (oracle: HUGEINT) —
    * quota, remainder, and the dense-rank tie-break all compare exactly
    * in both engines; the double floor recipe cannot anchor remainder
    * ordering (a correctly-rounded quotient can round across an
    * integer). Output: hist columns + (__off, __mass, quota) — quota
    * UNCAPPED; each caller applies its own cap/div-mod policy. */
  private def histMeta(
      hist: DataFrame, keyCol: String, n: Long, alpha: Double,
      topUp: Boolean, massCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 0L, s"n must be >= 0, got $n")
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val wKey = Window.partitionBy(col(keyCol))
    val ordered = wKey.orderBy(col("__b").asc)
    val all = Window.partitionBy(lit(1))
    val base = hist
      .withColumn("__off", coalesce(sum(col(massCol))
        .over(ordered.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
        .cast("long"))
      .withColumn("__mass", sum(col(massCol)).over(wKey).cast("long"))
      .withColumn("__rn", row_number().over(ordered))
    val m = col("__mass").cast("double")
    val wExpr = if (alpha == 0.5) sqrt(m) else pow(m, lit(alpha))
    // Σw6 counts each KEY once: only the key's first histogram row
    // contributes its weight to the whole-frame sum.
    val withW = base
      .withColumn("__w6", round(wExpr * 1e6, 0).cast("long"))
      // Key count and weight sum share the one whole-frame window pass:
      // the cardinality guard costs nothing in-envelope, and it observes
      // the AGGREGATED histogram, never corpus rows.
      .withColumn("__nk",
        sum(when(col("__rn") === 1, 1L)).over(all).cast("long"))
      .withColumn("__sumw6",
        sum(when(col("__rn") === 1, col("__w6"))).over(all).cast("long"))
    val out =
      if (!topUp)
        withW.withColumn("quota",
          floor(lit(n.toDouble) * col("__w6").cast("double")
            / col("__sumw6").cast("double")).cast("long"))
      else withW
        .withColumn("__prod",
          col("__w6").cast("decimal(38,0)") * lit(n).cast("decimal(38,0)"))
        .withColumn("__r", col("__prod") % col("__sumw6").cast("decimal(38,0)"))
        .withColumn("__q0", ((col("__prod") - col("__r"))
          / col("__sumw6").cast("decimal(38,0)")).cast("long"))
        .withColumn("__t",
          lit(n) - sum(when(col("__rn") === 1, col("__q0"))).over(all))
        // (__r, key) is constant per key, so dense_rank ranks KEYS by
        // largest remainder with the key as tie-break.
        .withColumn("__kr", dense_rank().over(
          Window.partitionBy(lit(1)).orderBy(col("__r").desc, col(keyCol).asc)))
        .withColumn("quota",
          col("__q0") + when(col("__kr") <= col("__t"), 1L).otherwise(0L))
    out.select(hist.columns.map(col) ++
      Seq(col("__off"), col("__mass"),
        guardedQuota("mixer quota metadata", mixerMaxKeys(hist)).as("quota")): _*)
  }

  /** Ceiling on MIXING-KEY cardinality for the window-form quota metadata
    * ([[histMeta]] / [[alphaQuotas]]); session-tunable via
    * `graft.mixer.maxKeys`. The mixers' quota side runs whole-frame
    * windows in ONE partition (bounded by |keys|·[[RankBuckets]] histogram
    * rows) and BROADCASTS the bucket-offset frame — correct and cheap for
    * a corpus-source key (a handful of values), silently degrading toward
    * a single-reducer sort + a multi-GB broadcast for a domain-cardinality
    * key (10^6-10^7 values). Past this ceiling the quota column raises a
    * curated error instead (checked in the same window pass — zero cost
    * in-envelope, and the guard sees the AGGREGATED key count, never
    * corpus rows); route high-cardinality count mixes through
    * [[temperatureMixManyKeys]], whose metadata joins are keyed. */
  private[functions] val MixerMaxKeys: Int = 65536

  private def mixerMaxKeys(df: DataFrame): Int =
    math.min(
      TextAnalysis.confPositiveLong(df, "graft.mixer.maxKeys", MixerMaxKeys.toLong),
      Int.MaxValue.toLong).toInt

  /** Wrap a computed quota column with the [[MixerMaxKeys]] guard: raises
    * with guidance when `__nk` (the observed key count, computed in the
    * same whole-frame window pass as the weight sum) exceeds the ceiling. */
  private def guardedQuota(op: String, maxKeys: Int): Column =
    when(col("__nk") > lit(maxKeys.toLong), raise_error(concat(
      lit(s"$op: mixing-key cardinality "), col("__nk"),
      lit(s" exceeds graft.mixer.maxKeys ($maxKeys) — the window-form " +
        "quota metadata runs single-partition windows and broadcasts " +
        "bucket offsets, which assumes a corpus-source key (a handful of " +
        "values). For domain-cardinality count mixing use " +
        "temperatureMixManyKeys (keyed quota joins); or raise " +
        "graft.mixer.maxKeys if the histogram genuinely fits one task")))
      .cast("long"))
      .otherwise(col("quota"))

  /** samp_u buckets for the mixers' two-phase rank: 2^16 spreads a key
    * that owns the whole corpus over 65k rank partitions (each bounded
    * at keyn/2^16 rows — ~1.5 GB per sort task even for an 80 TB key)
    * while the per-(key, bucket) histogram stays broadcastable
    * (|keys| · 2^16 rows at worst, and only OCCUPIED buckets
    * materialize). samp_u is 6-decimal-rounded, so finer than ~10^6
    * buckets buys nothing. */
  private[functions] val RankBuckets: Int = 1 << 16

  /** Bucket of a samp_u value: floor(u · B), capped — round(u, 6) can
    * reach exactly 1.0. Multiplication by a positive constant and floor
    * are monotone, and equal samp_u values share a bucket, so ordering
    * by (bucket, samp_u, id) IS ordering by (samp_u, id): the two-phase
    * rank is exact, not approximate. */
  private def rankBucket(u: Column): Column =
    least(floor(u * lit(RankBuckets.toDouble)).cast("long"),
      lit(RankBuckets - 1L))

  /** Per-(key, bucket) rank offsets over a mixer histogram: `__off` =
    * the mass in the key's strictly-lower buckets. The window is per-key
    * single-partition but runs over the HISTOGRAM (≤ |keys| ·
    * [[RankBuckets]] rows by construction), never corpus rows. */
  private def bucketOffsets(
      hist: DataFrame, keyCol: String, massCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    hist.withColumn("__off",
      coalesce(sum(col(massCol)).over(w), lit(0L)).cast("long"))
  }

  /** Exact per-key rank over an arbitrary LONG sort key, in the mixers'
    * two-phase histogram shape — the reusable "rank without a per-key
    * corpus window" primitive ([[temperatureMix]]'s selection,
    * generalized from samp_u to any fixed-point order column). Adds
    * `rnk` = the 1-based rank of each row within its key under
    * (`fpCol` ASC, `idCol` ASC), and `__total` = the key's row count —
    * bit-identical to `row_number() OVER (PARTITION BY key ORDER BY fp,
    * id)` but with the dominant key spread over [[RankBuckets]] sort
    * chunks instead of ONE reducer (the round-12 mixer lesson, available
    * to any per-key ranking consumer: perplexity terciles, percentile
    * filters).
    *
    * Bucketization: fp is range-mapped to floor((fp − min) · B / span)
    * via one 1-row min/max aggregate (broadcast). Any monotone
    * bucketization yields the EXACT rank (offsets restore cross-bucket
    * order, the window restores intra-bucket order) — the range map only
    * affects how evenly the sort chunks spread; a value-skewed fp
    * degrades toward fewer occupied buckets, never toward wrongness.
    *
    * Key-cardinality envelope: same as the mixers ([[MixerMaxKeys]],
    * enforced in the offset pass — the histogram window is per-key over
    * ≤ |keys|·B rows and `bmeta` broadcasts). */
  private[graft] def rankExactByKey(
      df: DataFrame, keyCol: String, fpCol: String, idCol: String,
      fpRange: Option[(Long, Long)] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireFreeColumns(df, "rankExactByKey",
      Seq("rnk", "__total", "__b", "__bn", "__off", "__mn", "__mx", "__nk"))
    // The input feeds the histogram AND the rank join (plus, without
    // `fpRange`, the min/max probe): 2-3 references. Callers whose fp
    // domain is statically known (a 32-bit content hash: [0, 2^32)) pass
    // `fpRange` and skip the probe pass entirely; callers with an
    // EXPENSIVE input subtree (a model-scored frame) should persist()
    // it first — each reference otherwise re-runs the subtree
    // (pplBuckets does exactly that).
    val bucketed = fpRange match {
      case Some((mn, mx)) =>
        require(mx >= mn, s"fpRange must be ordered, got ($mn, $mx)")
        df.withColumn("__b", least(greatest(
          floor((col(fpCol).cast("double") - lit(mn.toDouble))
            * lit(RankBuckets.toDouble)
            / lit(mx.toDouble - mn.toDouble + 1.0)).cast("long"), lit(0L)),
          lit(RankBuckets - 1L)))
      case None =>
        val mnmx = df.agg(min(col(fpCol)).cast("long").as("__mn"),
          max(col(fpCol)).cast("long").as("__mx"))
        df.crossJoin(broadcast(mnmx))
          .withColumn("__b", least(
            floor((col(fpCol).cast("double") - col("__mn").cast("double"))
              * lit(RankBuckets.toDouble)
              / (col("__mx").cast("double") - col("__mn").cast("double") + 1.0))
              .cast("long"),
            lit(RankBuckets - 1L)))
          .drop("__mn", "__mx")
    }
    val hist = bucketed.groupBy(col(keyCol), col("__b"))
      .agg(count(lit(1)).as("__bn"))
    val all = Window.partitionBy(lit(1))
    val wKey = Window.partitionBy(col(keyCol))
    val guard = mixerMaxKeys(df)
    // Key count from the same per-key window pass (only each key's first
    // histogram row contributes 1 to the whole-frame sum) — the
    // histMeta guard recipe; the guard observes the AGGREGATED
    // histogram, never corpus rows.
    val ordered = wKey.orderBy(col("__b").asc)
    val bmeta = bucketOffsets(hist, keyCol, "__bn")
      .withColumn("__total", sum(col("__bn")).over(wKey).cast("long"))
      .withColumn("__rn", row_number().over(ordered))
      .withColumn("__nk",
        sum(when(col("__rn") === 1, 1L)).over(all).cast("long"))
      .withColumn("__off",
        when(col("__nk") > lit(guard.toLong), raise_error(concat(
          lit("rankExactByKey: key cardinality "), col("__nk"),
          lit(s" exceeds graft.mixer.maxKeys ($guard) — the histogram " +
            "offsets run per-key single-partition windows and broadcast; " +
            "a high-cardinality key needs keyed metadata joins " +
            "(temperatureMixManyKeys pattern)"))).cast("long"))
          .otherwise(col("__off")))
      .select(col(keyCol), col("__b"), col("__off"), col("__total"))
    val w = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col(fpCol).asc, col(idCol).asc)
    bucketed
      .join(broadcast(bmeta), Seq(keyCol, "__b"))
      .withColumn("rnk", (col("__off") + row_number().over(w)).cast("long"))
      .drop("__b", "__off")
  }

  /** Content-hash 32-bit LONG sort key (the [[hashUniform]] recipe
    * without the (0,1) map — ranking needs the exact integer, and the
    * oracle replays it as `('0x' || substr(md5(...), 1, 8))::UBIGINT`). */
  private def hashSortKey(parts: Column*): Column =
    conv(keyHash(concat_ws(":", parts: _*)), 16, 10).cast("long")

  /** Deterministic global corpus shuffle — the ordering step a training
    * run consumes (data order is part of the training recipe; "shuffle
    * the corpus" must be reproducible, resumable, and stable under
    * re-runs, so it is a content-hash ORDER, not an RNG): every document
    * gets its global training position `seq` (1-based rank under
    * (md5(seed:id), id)), plus the derived `(shard, pos)` layout a
    * sharded reader consumes (`shard` = (seq-1) div docsPerShard).
    *
    * Scale: a global rank is the canonical single-reducer trap; this one
    * routes through [[rankExactByKey]]'s two-phase histogram (constant
    * key, hash-bucketized) so the whole corpus sorts in ≤ n/2^16-row
    * chunks — the same exactness contract as the mixers (spec-pinned
    * against the naive global window). Re-sharding is arithmetic on
    * `seq`; appending documents perturbs ranks globally by construction
    * (a hash order is a permutation, not an append log) — epoch-stable
    * ordering across corpus GROWTH is what [[temperatureMix]]'s
    * hash-prefix selection provides instead. */
  def corpusShuffle(
      df: DataFrame, idCol: String, docsPerShard: Long,
      seed: String = "graft"): DataFrame = {
    require(docsPerShard >= 1L, s"docsPerShard must be >= 1, got $docsPerShard")
    requireFreeColumns(df, "corpusShuffle",
      Seq("seq", "shard", "pos", "__fp", "__k", "rnk", "__total"))
    val ranked = rankExactByKey(
      df.withColumn("__k", lit("all"))
        .withColumn("__fp", hashSortKey(lit(seed), col(idCol).cast("string"))),
      // The hash domain is static — no min/max probe pass: 2 input scans
      // (histogram + rank), the mixer accounting.
      "__k", "__fp", idCol, fpRange = Some((0L, (1L << 32) - 1L)))
    ranked
      .withColumn("seq", col("rnk"))
      .withColumn("shard", expr(s"(seq - 1) div ${docsPerShard}L"))
      .withColumn("pos", (col("seq") - 1L) % lit(docsPerShard))
      .drop("__k", "__fp", "rnk", "__total")
  }

  /** Curriculum ordering — documents visit training in ascending
    * `stageCol` order (the difficulty schedule: perplexity tercile,
    * length band, quality bucket — any LONG stage the caller derives),
    * shuffled WITHIN each stage by content hash, with the global
    * position and shard layout of [[corpusShuffle]]. `seq` is exactly
    * `row_number() OVER (ORDER BY stage, md5(seed:id), id)` — computed
    * scalably: per-stage two-phase rank + a stage-offset join (stage
    * masses aggregate to ≤ |stages| rows, cumulative-summed in one tiny
    * window and broadcast). The input is scanned twice (masses + rank
    * pass — the [[temperatureMixManyKeys]] accounting); a deployment
    * whose stage column is itself expensive (e.g. a perplexity tile)
    * should materialize the stage table first. */
  def curriculumOrder(
      df: DataFrame, idCol: String, stageCol: String, docsPerShard: Long,
      seed: String = "graft"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(docsPerShard >= 1L, s"docsPerShard must be >= 1, got $docsPerShard")
    requireFreeColumns(df, "curriculumOrder",
      Seq("seq", "shard", "pos", "__fp", "__soff", "__sn", "rnk", "__total"))
    val offs = df.groupBy(col(stageCol))
      .agg(count(lit(1)).cast("long").as("__sn"))
      .withColumn("__soff", coalesce(
        sum(col("__sn")).over(Window.partitionBy(lit(1))
          .orderBy(col(stageCol).asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).cast("long"))
      .select(col(stageCol), col("__soff"))
    val ranked = rankExactByKey(
      df.withColumn("__fp", hashSortKey(lit(seed), col(idCol).cast("string"))),
      stageCol, "__fp", idCol, fpRange = Some((0L, (1L << 32) - 1L)))
    ranked
      .join(broadcast(offs), Seq(stageCol))
      .withColumn("seq", (col("__soff") + col("rnk")).cast("long"))
      .withColumn("shard", expr(s"(seq - 1) div ${docsPerShard}L"))
      .withColumn("pos", (col("seq") - 1L) % lit(docsPerShard))
      .drop("__fp", "__soff", "rnk", "__total")
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
    val all = Window.partitionBy(lit(1))
    weights
      .withColumn("__nk", count(lit(1)).over(all).cast("long"))
      .withColumn("__sumw6", sum(col("__w6")).over(all).cast("long"))
      .withColumn("quota",
        floor(lit(n.toDouble) * col("__w6").cast("double")
          / col("__sumw6").cast("double")).cast("long"))
      .select(col(keyCol), col("__mass"),
        guardedQuota("mixer quota metadata", mixerMaxKeys(masses)).as("quota"))
  }

  /** Reserved-name guard for the mixers (and the DSIR streaming gate):
    * their quota/score join would make a pre-existing column of the same
    * name ambiguous (AnalysisException at best) or silently drop the
    * user's column at the end. */
  private[graft] def requireFreeColumns(
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
    epochPlanFromMasses(
      df.groupBy(col(keyCol)).agg(count(lit(1)).as("__mass")),
      keyCol, n, alpha)

  /** The plan arithmetic over a pre-aggregated (key, __mass) frame —
    * shared with [[epochMixExpand]], whose histogram already holds the
    * per-key counts (re-deriving them would add a third corpus scan).
    * `div`, not `/`: Spark's `/` is DOUBLE division, whose 53-bit
    * mantissa would silently round quotas above 2^53 so that
    * epochs·keyn + rem != quota; `div` is exact long division at any
    * magnitude, matching `%` and the oracle's `//`. */
  private def epochPlanFromMasses(
      masses: DataFrame, keyCol: String, n: Long, alpha: Double): DataFrame =
    alphaQuotas(masses, keyCol, n, alpha)
      .select(col(keyCol), col("__mass").as("keyn"), col("quota"))
      .withColumn("epochs", expr("quota div keyn").cast("long"))
      .withColumn("rem", col("quota") % col("keyn"))

  /** Hard ceiling on per-row repetition in [[epochMixExpand]]: the copies
    * materialize as one `sequence` array per row, so an unbounded epoch
    * count (a huge n against a near-empty key) would build multi-GB
    * single-row arrays and eventually overflow Spark's ~2^31 array limit.
    * 2^20 repetitions of one document is already far past any useful
    * training mix (GPT-3's max is 3.4 epochs); past it the plan fails
    * loudly instead of OOMing an executor. */
  private[functions] val MaxEpochCopies: Long = 1L << 20

  /** Materialize an [[epochMixPlan]]: every row of a key appears
    * `epochs` times (epoch ids 0..epochs−1), and the key's hash-order
    * first `rem` rows once more (epoch id `epochs`) — exactly `quota`
    * output rows per key, Σ = Σ quotas ≤ n. The repetition explode is
    * narrow (each input row emits its own copies); membership in the
    * partial pass comes from the same two-phase histogram rank as
    * [[temperatureMix]] (bucket offsets broadcast, rank window
    * partitioned by (key, samp_u-bucket)), so the dominant source never
    * funnels into one reducer — every row shuffles once, evenly, in
    * ≤ keyn/[[RankBuckets]]-row sort chunks, and the histogram doubles
    * as the plan's per-key counts (the corpus is scanned exactly twice).
    * Output: the input columns + (epoch). Downstream shuffles the
    * result by training shard anyway, so copies landing on their
    * source's partition is fine at any scale. */
  def epochMixExpand(
      df: DataFrame, idCol: String, keyCol: String, n: Long,
      alpha: Double = 0.5, seed: String = "graft"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireFreeColumns(df, "epochMixExpand",
      Seq("keyn", "quota", "epochs", "rem", "rnk", "copies", "epoch",
        "samp_u", "__b", "__bn", "__off"))
    val u = hashUniform(lit(seed), col(keyCol), col(idCol).cast("string"))
    val hashed = df.withColumn("samp_u", round(u, 6))
      .withColumn("__b", rankBucket(col("samp_u")))
    val hist = hashed.groupBy(col(keyCol), col("__b"))
      .agg(count(lit(1)).as("__bn"))
    // A bucket past the partial-pass boundary contributes copies only via
    // `epochs`; when epochs = 0 (the prefix-only regime — any mix where
    // n ≪ corpus) such a bucket's every row lands at copies = 0, so drop
    // the bucket here and the corpus tail never shuffles — the same
    // narrow past-quota drop as [[temperatureMix]]. Quota stays UNCAPPED
    // (the with-replacement contract); `div`, not `/` — see
    // [[epochPlanFromMasses]].
    val bmeta = histMeta(hist, keyCol, n, alpha, topUp = false, "__bn")
      .withColumn("epochs", expr("quota div __mass").cast("long"))
      .withColumn("rem", col("quota") % col("__mass"))
      .filter(col("epochs") > 0L || col("__off") < col("rem"))
      .select(col(keyCol), col("__b"), col("__off"), col("epochs"), col("rem"))
    val w = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col("samp_u").asc, col(idCol).asc)
    hashed
      .join(broadcast(bmeta), Seq(keyCol, "__b"))
      .withColumn("rnk", (col("__off") + row_number().over(w)).cast("long"))
      .withColumn("copies",
        col("epochs") + when(col("rnk") <= col("rem"), 1L).otherwise(0L))
      .filter(col("copies") > 0L)
      .withColumn("copies",
        when(col("copies") > MaxEpochCopies, raise_error(concat(
          lit("epochMixExpand: a row would repeat "), col("copies"),
          lit(s" times (> $MaxEpochCopies) — n is out of proportion to " +
            "the smallest key's population"))))
          .otherwise(col("copies")))
      .withColumn("epoch", explode(sequence(lit(0L), col("copies") - 1L)))
      .drop("samp_u", "__b", "__off", "epochs", "rem", "rnk", "copies")
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
    * integer-exact, so the oracle replays every keep/skip decision.
    *
    * Scale shape: the same two-phase histogram selection as
    * [[temperatureMix]] — per-(key, samp_u-bucket) weight sums,
    * broadcast prefix offsets, a narrow drop of every bucket past the
    * quota point, and the cumulative window partitioned by (key,
    * bucket) so `cum` = bucket weight offset + within-bucket running
    * sum, never a full-key single-reducer window. One extra corpus scan
    * versus the count mixer (three total) is inherent: the eligibility
    * filter below depends on the quota, which depends on the full mass
    * aggregate, so the offset histogram cannot reuse the mass pass.
    * Output: kept rows + (quota, cum). */
  def temperatureMixByWeight(
      df: DataFrame, idCol: String, keyCol: String, weightCol: String,
      budget: Long, alpha: Double = 0.5, seed: String = "graft"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireFreeColumns(df, "temperatureMixByWeight",
      Seq("quota", "cum", "samp_u", "__b", "__bw", "__off"))
    // Cached once (<= |keys| rows): the quota frame feeds both the
    // eligibility join and the bucket-offset join — unmaterialized, each
    // consumer would re-run the corpus mass aggregation. persist(), not
    // localCheckpoint(): lazy (no corpus job fires at operator
    // construction — the histMeta discipline) and lineage-backed, so an
    // executor loss or cache eviction recomputes the deterministic quota
    // frame instead of failing the job on missing checkpoint blocks. The
    // cache lives until the session evicts it (same lifecycle note as the
    // DSIR fit histograms).
    val quotas = alphaQuotas(
        df.groupBy(col(keyCol)).agg(sum(col(weightCol).cast("long")).as("__mass")),
        keyCol, budget, alpha)
      .select(col(keyCol), least(col("quota"), col("__mass")).as("quota"))
      .persist()
    val u = hashUniform(lit(seed), col(keyCol), col(idCol).cast("string"))
    // Maximal-prefix fill: cumulative sum over hash order, keep while
    // cum <= quota; rows whose own weight exceeds the quota are excluded
    // BEFORE the sum (they could never be kept and would otherwise poison
    // the cumulative for everything behind them), and ZERO-weight rows
    // are excluded too — a token-budget sampler emits no token-free
    // docs, and without this a zero-quota key (budget 0, or an
    // all-empty key) would emit every weightless row "for free".
    // Integer-exact.
    val eligible = df
      .withColumn("samp_u", round(u, 6))
      .withColumn("__b", rankBucket(col("samp_u")))
      .join(broadcast(quotas), Seq(keyCol))
      .filter(col(weightCol).cast("long") <= col("quota") &&
        col(weightCol).cast("long") > 0L)
    val hist = eligible.groupBy(col(keyCol), col("__b"))
      .agg(sum(col(weightCol).cast("long")).as("__bw"))
    // A bucket whose weight offset already meets the quota cannot keep
    // its first row (eligible weights are >= 1), so the inner join drops
    // it narrowly before the shuffle.
    val bmeta = bucketOffsets(hist, keyCol, "__bw")
      .join(quotas.select(col(keyCol), col("quota").as("__bq")), Seq(keyCol))
      .filter(col("__off") < col("__bq"))
      .select(col(keyCol), col("__b"), col("__off"))
    val order = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col("samp_u").asc, col(idCol).asc)
    eligible
      .join(broadcast(bmeta), Seq(keyCol, "__b"))
      .withColumn("cum",
        (col("__off") + sum(col(weightCol).cast("long"))
          .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .cast("long"))
      .filter(col("cum") <= col("quota"))
      .drop("samp_u", "__b", "__off")
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
    requireFreeColumns(raw, "dsirResample", Seq("skey", "rnk"))
    dsirResampleFrom(
      dsirWeights(raw, idCol, textCol, target, targetTextCol, buckets),
      idCol, k, seed)
  }

  /** [[dsirResample]] over an already-computed (or shared/persisted)
    * [[dsirWeights]] frame — the selection tail alone, so several
    * selections can reuse ONE weights pass (weights are deterministic
    * in (corpus, target, buckets); the Gumbel key depends only on
    * (seed, id)). */
  def dsirResampleFrom(
      weights: DataFrame, idCol: String, k: Int,
      seed: String = "graft"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val skey = gumbelKey(hashUniform(lit(seed), col(idCol).cast("string")))
    val win = Window.orderBy(col("skey").desc, col(idCol).asc)
    weights.withColumn("skey", skey)
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
    requireFreeColumns(raw, "dsirResamplePerStratum", Seq("skey", "rnk"))
    dsirResamplePerStratumFrom(
      dsirWeights(raw, idCol, textCol, target, targetTextCol, buckets),
      raw, idCol, stratumCol, kPerStratum, seed)
  }

  /** [[dsirResamplePerStratum]] over an already-computed weights frame
    * ([[dsirResampleFrom]]'s rationale; `raw` supplies the stratum
    * column only). */
  def dsirResamplePerStratumFrom(
      weights: DataFrame, raw: DataFrame, idCol: String, stratumCol: String,
      kPerStratum: Int, seed: String = "graft"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = weights.join(raw.select(col(idCol), col(stratumCol)), Seq(idCol))
    val skey = gumbelKey(
      hashUniform(lit(seed), col(stratumCol), col(idCol).cast("string")))
    val win = Window.partitionBy(stratumCol).orderBy(col("skey").desc, col(idCol).asc)
    w.withColumn("skey", skey)
      .withColumn("rnk", row_number().over(win).cast("long"))
      .filter(col("rnk") <= kPerStratum)
  }

  /** One DoReMi-style domain-reweighting step (Xie et al. 2023,
    * "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    * Pretraining", alg. 1's multiplicative-weights update): given a
    * per-document proxy-model loss, each domain's mixture weight moves by
    * `exp(eta · excess)` where excess = max(domain mean loss − corpus
    * mean loss, 0) — domains the proxy finds HARDER than average gain
    * share, easy/memorized domains lose it. The reference method runs
    * this inside a training loop; as a corpus operator one step maps a
    * loss table to the next epoch's mixture, which then feeds
    * [[temperatureMix]] / [[epochMixPlan]] as the weight column.
    *
    * Dataflow: ONE aggregation of the loss table by domain (map-side
    * combined — the only corpus-sized pass is upstream, in whatever
    * produced `lossCol`), then arithmetic over the ≤|domains| metadata
    * frame; the global mean is derived from the SAME per-domain
    * fixed-point sums (no second corpus pass). The whole-frame windows at
    * the end run over the aggregated domain frame (≤ thousands of rows),
    * never the corpus — the distinction [[histMeta]]'s scaladoc draws.
    *
    * Determinism: per-row losses are fixed-pointed to 1e-6 longs before
    * summing ([[graft.functions.Similarity.kmeansTrain]]'s contract), so
    * sums are partition-order-independent; `exp` outputs are fixed-pointed
    * to 1e-6 longs before the normalizing sum (a whole-frame sum of
    * doubles would depend on this metadata frame's row order). All 1e-6
    * roundings use [[QualityModel.r6]]'s pure-IEEE floor form — the
    * shares/averages here live on exact decimal grids, where
    * BigDecimal-style round-half can disagree across engines.
    *
    * Output: (key, n_docs, avg_loss, excess, old_share, new_weight),
    * rounded to 6, new_weight summing to ~1 (each term rounded). */
  def domainReweight(
      perDoc: DataFrame, keyCol: String, lossCol: String,
      eta: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import QualityModel.{r6, fp6}
    val byKey = perDoc.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_docs"),
        sum(fp6(col(lossCol).cast("double"))).as("sfp"))
    val all = Window.partitionBy(lit(1))
    val meta = byKey
      .withColumn("avg_loss",
        r6(col("sfp").cast("double") / col("n_docs").cast("double") / lit(1e6)))
      .withColumn("__gavg",
        r6(sum(col("sfp")).over(all).cast("double")
          / sum(col("n_docs")).over(all).cast("double") / lit(1e6)))
      .withColumn("excess", greatest(r6(col("avg_loss") - col("__gavg")), lit(0.0)))
      .withColumn("old_share",
        r6(col("n_docs").cast("double")
          / sum(col("n_docs")).over(all).cast("double")))
      .withColumn("__ufp",
        fp6(col("old_share") * exp(lit(eta) * col("excess"))))
    meta
      .withColumn("new_weight",
        r6(col("__ufp").cast("double") / sum(col("__ufp")).over(all).cast("double")))
      .select(col("key"), col("n_docs").cast("long").as("n_docs"),
        col("avg_loss"), col("excess"), col("old_share"), col("new_weight"))
  }
}
