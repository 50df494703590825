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
    val v = conv(keyHash(concat_ws(":", lit(seed), col(stratumCol),
      col(idCol).cast("string"))), 16, 10).cast("double")
    val u = (v + lit(0.5)) / lit(4294967296.0)
    val skey = round(log(u) / greatest(col(weightCol).cast("double"), lit(1e-9)), 6)
    val w = Window.partitionBy(stratumCol).orderBy(col("skey").desc, col(idCol).asc)
    df.withColumn("skey", skey)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
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
}
