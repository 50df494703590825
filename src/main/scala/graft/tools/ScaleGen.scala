package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ×k scale-up of the test corpus — the input generator for
  * the heavy-family scale bench (BASELINE.md "sf1" rows). Replica 0 is the
  * original data; replica r >= 1 rewrites identity keys by +r·10⁷ and
  * perturbs content so replicas are REALLY distinct work, not free
  * duplicates:
  *
  *   - documents: every 4th word is replaced with a replica marker, so every
  *     4-gram shingle of a replica contains the marker — zero cross-replica
  *     shingle overlap and distinct content hashes. Near-dup structure
  *     WITHIN each replica is preserved exactly (same replacement pattern on
  *     near-identical texts), so dedup answer sizes scale linearly with k —
  *     the corpus a 10× crawl actually looks like, not a 10-way duplicate
  *     explosion whose quadratic answer would swamp the timing signal.
  *   - embeddings: per-dimension deterministic offset (amplitude grows with
  *     r) keeps replicas off the originals' sign buckets / centroids.
  *   - part: names gain a replica token (intra-replica edit distances are
  *     unchanged — the shared suffix cancels); brands gain a replica suffix
  *     so block KEYS keep discriminating at scale, which is the documented
  *     discipline for blocked linkage (the adversarial mega-block lives in
  *     LinkageStressSpec, where it is measured, not benched).
  *
  * Usage: ScaleGen <inDir> <outDir> <k> [skew|manykeys|hotband]
  */
object ScaleGen {

  val IdStride = 10000000L

  def scaleDocuments(docs: DataFrame, k: Int): DataFrame =
    (0 until k).map { r =>
      if (r == 0) docs
      else docs.select(
        (col("doc_id") + lit(r * IdStride)).as("doc_id"),
        expr(s"array_join(transform(split(text, '\\\\s+'), " +
          s"(w, i) -> CASE WHEN i % 4 = 0 THEN 'zr$r' ELSE w END), ' ')")
          .as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select("doc_id", "text", "lang", "source", "n_chars")
    }.reduce(_.unionByName(_))

  def scaleEmbeddings(emb: DataFrame, k: Int): DataFrame =
    (0 until k).map { r =>
      if (r == 0) emb
      else emb.select(
        (col("vec_id") + lit(r * IdStride)).as("vec_id"),
        expr(s"transform(embedding, (x, i) -> " +
          s"CAST(x + ((CAST(i * 31 + $r * 17 AS INT) % 13) - 6) * 0.01 * $r AS FLOAT))")
          .as("embedding"),
        col("label"))
    }.reduce(_.unionByName(_))

  /** Adversarial-skew documents ×k: [[scaleDocuments]] then reassign ~90%
    * of rows (by content hash of doc_id — deterministic, layout-free) to
    * ONE dominant mixing key, in BOTH key columns per-key operators use
    * (`lang` — mixers, weighted sampling; `source` — domain caps). The
    * plain ×k corpus scales every key uniformly (~5% per lang), so no
    * ×100 row ever exercises the real shape of a pretraining mix — GPT-3's
    * own table is 60% CommonCrawl, and a dominant key is exactly what a
    * single-reducer per-key window dies on. The remaining ~10% keeps the
    * original key distribution so quota math still has a long tail. */
  def skewDocuments(docs: DataFrame, k: Int): DataFrame = {
    val h = pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(10L))
    scaleDocuments(docs, k)
      .withColumn("lang", when(h < 9, lit("en")).otherwise(col("lang")))
      .withColumn("source", when(h < 9, lit("commoncrawl")).otherwise(col("source")))
  }

  /** Domain-cardinality documents ×k: [[scaleDocuments]] then re-key
    * `lang` (the mixer queries' mixing key) to ~100k distinct values —
    * "mix by registrable domain", the key shape the window-form quota
    * metadata must REFUSE ([[graft.functions.Sampling.MixerMaxKeys]]) and
    * the keyed variant (temperatureMixManyKeys) must absorb. 100003 keys
    * (prime, so the md5 pmod spreads evenly) at ×100 gives ~60 docs/key:
    * past the default 65536-key ceiling, and quota floor(n·w^α/Σ) is
    * exercised in its everything-rounds-to-zero-or-one regime. */
  def manyKeyDocuments(docs: DataFrame, k: Int): DataFrame = {
    val h = pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
      .cast("long"), lit(100003L))
    scaleDocuments(docs, k)
      .withColumn("lang", concat(lit("d"), h.cast("string")))
  }

  /** HOT-BAND documents ×k: [[scaleDocuments]] then append ONE shared
    * boilerplate sentence to ~30% of ALL replicas' docs (by doc_id content
    * hash — deterministic, replica-independent, so the hot set GROWS with
    * k). The sentence's 4-shingles become corpus-wide stop-shingles
    * (df ≈ 0.3·N·k): the adversary of the shingle-keyed inverted index
    * (one join bucket of (0.3Nk)² pairs unless dfCap reroutes it) and the
    * shape real web crawls have (footer/cookie boilerplate on a third of
    * pages). Pairs overlapping ONLY on the sentence sit far below any
    * useful jaccard threshold, so answers are unchanged — only candidate
    * volume is attacked. n_chars is refreshed (weight-keyed operators see
    * the true lengths). */
  def hotBandDocuments(docs: DataFrame, k: Int): DataFrame = {
    val h = pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(10L))
    scaleDocuments(docs, k)
      .withColumn("text", when(h < 3,
        concat(col("text"), lit(" " + HotBandSentence))).otherwise(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** Heaps-law vocabulary size at scale factor k: the base corpus draws
    * from [[HeapsBaseVocab]] word types; a ×k corpus from
    * HeapsBaseVocab·k^[[HeapsBeta]] — sublinear growth, the published
    * Heaps-law shape (V = K·N^β, β ≈ 0.4-0.8 for natural text; 0.7 here
    * keeps the ×100 vocabulary past every broadcast/driver envelope the
    * LM and tokenizer families guard). */
  val HeapsBaseVocab: Long = 20000L
  val HeapsBeta: Double = 0.7
  def heapsVocab(k: Int): Long =
    math.ceil(HeapsBaseVocab * math.pow(k.toDouble, HeapsBeta)).toLong

  /** DIVERSE-VOCABULARY documents ×k — the corpus mode the templated
    * testdata cannot express: sf0.1 holds 31 word types / 931 bigram
    * types at ANY replication factor, so every templated ×100 row
    * exercises the LM scorers' corpus-side shuffles but never their
    * MODEL-TABLE growth (the regime BenchLmServe's `synth:` mode proved
    * matters: full-scan serve collapses at ~20M bigram types). This mode
    * rewrites every token to a deterministic draw from a Heaps-law
    * vocabulary ([[heapsVocab]]): word rank = floor(V·u²) where u is a
    * Knuth-hash of the token's global position (doc_id·1024 + pos) on a
    * 2²⁴ grid — rank frequency ∝ rank^(−0.5), a power-law head + long
    * tail, so the realized vocabulary grows with the corpus and bigram
    * types grow near-linearly with tokens. Doc count, per-doc word
    * counts, lang/source keys and doc ids all match [[scaleDocuments]],
    * so per-key operators (ppl buckets, mixers) see the same key shape —
    * only the CONTENT diversifies. Deterministic and replica-distinct
    * (replica id stride shifts the position hash). */
  def heapsDocuments(docs: DataFrame, k: Int): DataFrame = {
    val v = heapsVocab(k)
    scaleDocuments(docs, k)
      .withColumn("text", expr(
        s"""array_join(transform(split(text, '\\\\s+'), (w, i) ->
           |  concat('h', CAST(FLOOR($v * POW(
           |    pmod(pmod(doc_id * 1024 + i, 16777216) * 2654435761,
           |         16777216) / 16777216.0e0, 2.0e0)) AS BIGINT))),
           |  ' ')""".stripMargin))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** BIGRAM-DIVERSE Heaps corpus ×k — [[heapsDocuments]] with the
    * position-hash CHAIN CORRELATION broken: the Knuth multiplicative
    * hash of consecutive positions differs by a CONSTANT mod 2²⁴
    * (h(i+1) = h(i) + 2654435761), so w_{i+1} is a deterministic
    * function of u_i and PAIR diversity grows only ~sublinearly in
    * tokens — the BASELINE r15 caveat this mode closes. Here u comes
    * from xxhash64(doc_id, position) (full avalanche, adjacent inputs
    * independent), same Heaps-law vocabulary and rank law, so bigram
    * types grow near-LINEARLY with tokens until V² saturation — the
    * near-unique-bigram BUILD regime that previously only the
    * BenchLmServe `synth:` serve record covered (full-scan serve
    * collapse at ~20M bigram types). Doc/key/length shape matches
    * [[scaleDocuments]] exactly, as in [[heapsDocuments]]. */
  def heapsBigramDocuments(docs: DataFrame, k: Int): DataFrame = {
    val v = heapsVocab(k)
    scaleDocuments(docs, k)
      .withColumn("text", expr(
        s"""array_join(transform(split(text, '\\\\s+'), (w, i) ->
           |  concat('h', CAST(FLOOR($v * POW(
           |    pmod(xxhash64(doc_id, i), 16777216) / 16777216.0e0,
           |    2.0e0)) AS BIGINT))),
           |  ' ')""".stripMargin))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** GIANT-DOCUMENT corpus ×k — the window-partition adversary: every
    * LM scorer computes lag(w, 1/2) over a window PARTITIONED BY doc_id,
    * so per-doc token count bounds one task's sort. The other modes keep
    * ~50-token docs (5M tiny window partitions at ×100 — embarrassingly
    * parallel); this mode folds the ×k corpus into [[LongDocCount]]
    * documents (fewer than the 32 cores), each ~`k·tokens/8` tokens —
    * at ×100 that is ~3.4M tokens per doc, the single-reducer-sort shape
    * a pathological crawl page (or a mis-segmented dump) produces. Texts
    * concatenate in doc_id order (array_sort over (doc_id, text) structs
    * — deterministic, layout-free); lang/source take the fold's minimum
    * doc's values so per-key operators still run. */
  val LongDocCount: Int = 8
  def longDocDocuments(docs: DataFrame, k: Int): DataFrame =
    scaleDocuments(docs, k)
      .groupBy(pmod(col("doc_id"), lit(LongDocCount.toLong)).as("bucket"))
      .agg(
        expr("array_join(transform(array_sort(collect_list(struct(doc_id, text))), s -> s.text), ' ')").as("text"),
        expr("min_by(lang, doc_id)").as("lang"),
        expr("min_by(source, doc_id)").as("source"))
      .select(col("bucket").as("doc_id"), col("text"), col("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars"))

  /** The planted boilerplate (14 words → 11 shared 4-shingles per doc). */
  val HotBandSentence: String =
    "subscribe to our newsletter for daily updates exclusive offers " +
      "and breaking news from partners"

  /** events ×k: user/event ids shift per replica (distinct users, so
    * sessions/retention cohorts never straddle replicas — the workload a
    * k×-bigger user base actually produces); ts/value/type unchanged so the
    * per-user event-time distribution is identical in every replica. */
  def scaleEvents(events: DataFrame, k: Int): DataFrame =
    (0 until k).map { r =>
      if (r == 0) events
      else events
        .withColumn("event_id", col("event_id") + lit(r * IdStride))
        .withColumn("user_id", col("user_id") + lit(r * IdStride))
    }.reduce(_.unionByName(_))

  def scalePart(part: DataFrame, k: Int): DataFrame =
    (0 until k).map { r =>
      if (r == 0) part
      else part
        .withColumn("p_partkey", col("p_partkey") + lit(r * IdStride))
        .withColumn("p_name", concat(col("p_name"), lit(s" zr$r")))
        .withColumn("p_brand", concat(col("p_brand"), lit(s"#$r")))
    }.reduce(_.unionByName(_))

  /** ×N REAL-PNG media table for the perceptual-dedup scale bench
    * (BenchMedia): each row is a genuinely decodable PNG whose 9×8 dHash
    * grid is CONSTRUCTED from md5(base_id) bits — deterministic, and
    * every id with `id % 10 == 1` is a re-render of id-1's pattern at a
    * different resolution (the same grid function sampled finer), i.e. a
    * planted near-duplicate with dHash hamming ~0-2. Distinct base ids
    * differ in ~32 of 64 grid bits, so they never band-collide at small
    * maxHamming. Payloads are ~1-3 KB PNGs; generation is executor-side
    * (one BufferedImage + ImageIO encode per row, no driver loop). */
  /** Real-PNG media corpus: an 8×9 grayscale gradient grid whose 64
    * column-step bits derive from md5(base id); every id ≡ 1 mod 10
    * re-renders id−1 at 5/3 the resolution (the planted near-dup).
    *
    * `width`/`height` size the base render (default 108×72 — the
    * per-image-floor-bound corpus BenchMedia has recorded since r10).
    * `noiseAmp` > 0 adds deterministic per-pixel luma noise (xorshift of
    * (id, x, y), ±noiseAmp): noise defeats PNG's filters so payload
    * bytes scale with pixels (a flat-block megapixel PNG would deflate
    * to a few KB and the "megapixel" run would still measure the
    * per-image floor, not the byte-bound decode rate) — while the dHash
    * grid cells average thousands of pixels each, so the zero-mean noise
    * moves cell means by ≪ the 24-step gradient and every planted pair
    * still verifies. */
  def genMediaPngs(
      spark: SparkSession, n: Long,
      width: Int = 108, height: Int = 72, noiseAmp: Int = 0): DataFrame = {
    import spark.implicits._
    spark.range(n).select(col("id")).as[Long].mapPartitions { ids =>
      javax.imageio.ImageIO.setUseCache(false)
      ids.map { id =>
        val base = if (id % 10 == 1 && id > 0) id - 1 else id
        val rerender = base != id
        // 64 target gradient bits from md5(base): bit (r*8+c) drives
        // whether grid cell (r, c+1) is brighter than (r, c).
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(base.toString.getBytes("UTF-8"))
        def bit(i: Int): Boolean = ((md(i / 8) >> (i % 8)) & 1) == 1
        // Column-cumulative brightness per grid row: realize the bits.
        val levels = Array.ofDim[Int](8, 9)
        for (r <- 0 until 8) {
          levels(r)(0) = 120
          for (c <- 0 until 8)
            levels(r)(c + 1) = levels(r)(c) + (if (bit(r * 8 + c)) 24 else -24)
        }
        val (w, h) =
          if (rerender) (width * 5 / 3, height * 5 / 3) else (width, height)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val px = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          val r = math.min(7, y * 8 / h)
          var x = 0
          while (x < w) {
            val c = math.min(8, x * 9 / w)
            var v = levels(r)(c)
            if (noiseAmp > 0) {
              var s = id * 1000003L + y.toLong * w + x
              s ^= s << 13; s ^= s >>> 7; s ^= s << 17
              v += java.lang.Math.floorMod(s, 2L * noiseAmp + 1).toInt - noiseAmp
            }
            val vc = math.max(0, math.min(255, v))
            px(y * w + x) = (vc << 16) | (vc << 8) | vc
            x += 1
          }
          y += 1
        }
        img.setRGB(0, 0, w, h, px, 0, w)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (id, "image", bos.toByteArray, s"gen/png/$id")
      }
    }.toDF("media_id", "kind", "payload", "source")
  }

  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, kStr) = args.take(3)
    val k = kStr.toInt
    // Optional 4th arg — adversarial documents modes (other tables scale
    // as usual): `skew` = dominant mixing key ([[skewDocuments]]),
    // `manykeys` = domain-cardinality mixing key ([[manyKeyDocuments]]),
    // `hotband` = corpus-wide boilerplate stop-shingle
    // ([[hotBandDocuments]]), `heaps` = diverse Heaps-law vocabulary
    // ([[heapsDocuments]]), `heapsbigram` = Heaps vocabulary with
    // independent position hashing — near-linear PAIR growth
    // ([[heapsBigramDocuments]]), `longdoc` = giant-document fold
    // ([[longDocDocuments]]).
    val mode = if (args.length > 3) args(3) else ""
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def pq(t: String) = spark.read.parquet(s"$inDir/$t.parquet")
    (mode match {
      case "skew" => skewDocuments(pq("documents"), k)
      case "manykeys" => manyKeyDocuments(pq("documents"), k)
      case "hotband" => hotBandDocuments(pq("documents"), k)
      case "heaps" => heapsDocuments(pq("documents"), k)
      case "heapsbigram" => heapsBigramDocuments(pq("documents"), k)
      case "longdoc" => longDocDocuments(pq("documents"), k)
      case _ => scaleDocuments(pq("documents"), k)
    }).repartition(8).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    scaleEmbeddings(pq("embeddings"), k)
      .repartition(8).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    scalePart(pq("part"), k)
      .repartition(8).write.mode("overwrite").parquet(s"$outDir/part.parquet")
    scaleEvents(pq("events"), k)
      .repartition(8).write.mode("overwrite").parquet(s"$outDir/events.parquet")
    println(s"""{"scaled":"$outDir","k":$k,"mode":"${if (mode.isEmpty) "uniform" else mode}"}""")
    spark.stop()
  }
}
