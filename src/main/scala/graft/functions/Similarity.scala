package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]): brute-force
  * cosine top-k as the exact baseline, and a bucketed variant as the scale
  * path (SURVEY.md §7.6).
  *
  * Cosine is generated as an explicit fixed-association term chain in DOUBLE
  * (`CAST(a[i] AS DOUBLE) * CAST(b[i] AS DOUBLE) + ...`): identical values,
  * identical op order, IEEE doubles => bit-identical results in Spark and
  * the DuckDB oracle (rounded to 6 decimals as belt-and-braces). The chain
  * stays inside whole-stage codegen — no UDF.
  *
  * Scale path: brute force is O(N*Q) — fine when the query side is small and
  * broadcast. For N x N near-dup joins, bucket first (sign-bit partitioner
  * below; swap for IVF centroid assignment at real scale — the plumbing,
  * a bucket equi-join instead of a cross join, is identical).
  */
object Similarity {

  /** Fixed-association dot product: the native codegen'd
    * [[FloatArrayDot]] expression (tight primitive loop). Its left-to-right
    * double accumulation is bit-identical to the equivalent
    * `CAST(a[i] AS DOUBLE)*CAST(b[i] AS DOUBLE) + ...` chain the DuckDB
    * oracle evaluates. Iteration bounds by the arrays themselves (ragged
    * inputs are caught upstream by [[embeddingAudit]], not silently
    * truncated here). */
  def dotExpr(a: String, b: String): Column =
    ArrayDot.floatDot(col(a), col(b))

  def cosineExpr(a: String, b: String): Column =
    round(dotExpr(a, b) /
      (sqrt(dotExpr(a, a)) * sqrt(dotExpr(b, b))), 6)

  /** Cosine from a precomputed-norm pair: numerically identical to
    * [[cosineExpr]] (same values, same op order) but evaluates each vector's
    * norm ONCE per row instead of once per pair — 3x less compute and the
    * remaining single dot chain stays under the codegen method-size limit
    * (the 3-chain version trips `CodeGenerator: failed to compile` and falls
    * back to interpreted eval). */
  private def cosineWithNorms(a: String, b: String, na: Column, nb: Column): Column =
    round(dotExpr(a, b) / (na * nb), 6)

  /** Brute-force cosine top-k: each query row against the full corpus.
    * Queries are broadcast (small side); ranking is a per-query window. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("nq", sqrt(dotExpr("qv", "qv")))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
      .withColumn("nc", sqrt(dotExpr("cv", "cv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", cosineWithNorms("qv", "cv", col("nq"), col("nc")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos_sim", "rank")
  }

  /** Sign-bit bucket id over the first `bits` dimensions — a crude but
    * deterministic space partitioner (demo stand-in for IVF centroids). */
  def signBucket(vecCol: String, bits: Int): Column =
    (0 until bits).map { i =>
      when(expr(s"CAST($vecCol[$i] AS DOUBLE)") >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucketed ANN top-k: candidates = same sign-bucket only, then exact
    * cosine within the bucket. Trades recall for turning the cross join into
    * a bucket equi-join — the shape that survives 100 TB. */
  def bucketedTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, bits: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("bucket", signBucket("qv", bits))
      .withColumn("nq", sqrt(dotExpr("qv", "qv")))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
      .withColumn("bucket", signBucket("cv", bits))
      .withColumn("nc", sqrt(dotExpr("cv", "cv")))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", cosineWithNorms("qv", "cv", col("nq"), col("nc")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos_sim", "rank")
  }

  /** Deterministic int8 max-abs quantization of an embedding column:
    * scale = 127 / max(|v_i|), q_i = floor(v_i * scale + 0.5) — half-up via
    * floor, avoiding engine-specific round() tie behavior, so Spark and the
    * DuckDB oracle produce identical codes. The quantized vector is emitted
    * as a CSV scalar (the driver comparator can't sort raw arrays) plus the
    * dequantization scale. Narrow, shuffle-free — 4x storage reduction for
    * ANN candidate stores at 100 TB. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val maxAbs = greatest(
      array_max(transform(col(vecCol), x => abs(x.cast("double")))), lit(1e-12))
    val scale = lit(127.0) / maxAbs
    df.select(
      col(idCol),
      round(scale, 6).as("qscale"),
      concat_ws(",", transform(col(vecCol),
        x => floor(x.cast("double") * scale + lit(0.5)).cast("string"))).as("q_csv"))
  }

  /** Per-label embedding centroids (class means) — the training pass behind
    * k-means / IVF coarse quantizers and per-class prototypes. Element-wise
    * mean via posexplode + one groupBy(label, dim): every aggregate is
    * partial+final, so the corpus streams through map-side combines and the
    * shuffle carries labels x dims rows, not vectors. Emitted as a rounded
    * CSV scalar (driver comparator can't sort arrays) + member count. */
  def labelCentroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(labelCol), col("pos"))
      .agg(count(lit(1)).as("n"), round(avg(col("x").cast("double")), 6).as("m"))
      .groupBy(labelCol)
      .agg(max(col("n")).cast("long").as("n_vectors"),
        concat_ws(",", transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          s => format_string("%.6f", s.getField("m")))).as("centroid_csv"))

  /** One Lloyd's (k-means) iteration: assign every vector to its nearest of
    * k seed centroids (cosine), then recompute each cluster's element-wise
    * mean. Seeds are the k lowest-id vectors (deterministic — swap for the
    * previous iteration's output to iterate). Assignment is the same
    * scale-safe argmax as [[ivfTopK]]'s inverted lists (broadcast centroids
    * + partial-aggregable max-of-struct, no corpus shuffle); recompute is
    * the [[labelCentroids]] shape. Together: the training loop body behind
    * IVF coarse quantizers, run entirely as Spark aggregates. */
  def kmeansStep(
      df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val cents = df.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("cent_id"), col(vecCol).as("centv"))
      .withColumn("ncent", sqrt(dotExpr("centv", "centv")))
    val c = df.select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
      .withColumn("nc", sqrt(dotExpr("cv", "cv")))
    val assigned = c.crossJoin(broadcast(cents))
      .withColumn("cent_sim",
        round(dotExpr("cv", "centv") / (col("nc") * col("ncent")), 6))
      .groupBy("vec_id")
      .agg(max(struct(col("cent_sim"), (-col("cent_id")).as("neg_id"), col("cv"))).as("best"))
      .select((-col("best.neg_id")).as("cent_id"), col("best.cv").as("cv"))
    assigned.select(col("cent_id"), posexplode(col("cv")).as(Seq("pos", "x")))
      .groupBy("cent_id", "pos")
      .agg(count(lit(1)).as("n"), round(avg(col("x").cast("double")), 6).as("m"))
      .groupBy("cent_id")
      .agg(max(col("n")).cast("long").as("n_members"),
        concat_ws(",", transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          s => format_string("%.6f", s.getField("m")))).as("centroid_csv"))
  }

  /** Iteratively-TRAINED IVF coarse quantizer: `iters` Lloyd's rounds from
    * the deterministic lowest-id seeds, returning `(cent_id, centv,
    * ncent)` — a drop-in replacement for [[ivfCentroids]]'s stand-in
    * (swap it into [[ivfSearch]] / [[AnnIndex.buildIvf]] without touching
    * a join). Each round: broadcast-argmax assignment (the
    * [[ivfInvertedLists]] shape — map-side-combinable, no corpus
    * shuffle), then per-cluster element-wise means. A cluster that loses
    * every member keeps its previous centroid (standard Lloyd's repair;
    * cluster identity stays keyed to the seed id).
    *
    * Determinism & oracle-ability: per-dimension means go through
    * FIXED-POINT 1e-6 longs before summing (order-independent — no float
    * summation order can diverge), then one double division and a float
    * cast, so DuckDB replays every iteration bit-exactly
    * (q_knn_recall_trained). Cost: `iters` corpus assignment passes —
    * the training loop a real IVF build pays once per (re)build, never
    * per query. */
  def kmeansTrain(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
      .withColumn("nc", sqrt(dotExpr("cv", "cv")))
    var cents = ivfCentroids(corpus, idCol, vecCol, k)
    for (_ <- 1 to iters) {
      val assigned = c.crossJoin(broadcast(cents))
        .withColumn("cent_sim",
          round(dotExpr("cv", "centv") / (col("nc") * col("ncent")), 6))
        .groupBy("vec_id")
        .agg(max(struct(col("cent_sim"), (-col("cent_id")).as("neg_id"), col("cv"))).as("best"))
        .select((-col("best.neg_id")).as("cent_id"), col("best.cv").as("cv"))
      val means = assigned
        .select(col("cent_id"), posexplode(col("cv")).as(Seq("pos", "x")))
        .groupBy("cent_id", "pos")
        .agg(sum(round(col("x").cast("double") * 1e6, 0).cast("long")).as("sfp"),
          count(lit(1)).as("n"))
        .withColumn("m",
          (col("sfp").cast("double") / col("n").cast("double") / lit(1e6)).cast("float"))
        .groupBy("cent_id")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("next"))
      // localCheckpoint (eager, k rows — trivial) truncates lineage so each
      // round is one assignment pass over materialized centroids. Without it
      // `cents` appears TWICE per round (broadcast side + repair join) and
      // the logical plan doubles every iteration — ~2^iters copies of the
      // seed subtree, the exact trap the clusterLabels scaladoc documents.
      cents = cents.select(col("cent_id"), col("centv"))
        .join(means, Seq("cent_id"), "left")
        .select(col("cent_id"), coalesce(col("next"), col("centv")).as("centv"))
        .withColumn("ncent", sqrt(dotExpr("centv", "centv")))
        .localCheckpoint()
    }
    cents
  }

  /** IVF (inverted-file) ANN top-k — the billion-scale index shape: corpus
    * vectors are assigned to their nearest of `nlist` coarse centroids (the
    * inverted lists, ONE aggregable pass: a broadcast of the centroids + a
    * map-side-combinable max-of-struct, no corpus shuffle by window); each
    * query probes its `nprobe` closest centroids and exact-searches only
    * those lists (broadcast probe join — the corpus never moves).
    *
    * Centroids are a deterministic sample (the `nlist` lowest-id corpus
    * vectors), standing in for k-means-trained centroids: training improves
    * recall but doesn't change the dataflow — swap `cents` for a trained set
    * without touching a join. Deterministic + SQL-expressible => the oracle
    * hash-verifies the whole index path.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val cents = ivfCentroids(corpus, idCol, vecCol, nlist)
    ivfSearch(cents, ivfInvertedLists(corpus, cents, idCol, vecCol),
      queries, idCol, vecCol, k, nprobe)
  }

  /** The IVF coarse quantizer: `(cent_id, centv, ncent)`, the `nlist`
    * lowest-id corpus vectors (deterministic k-means stand-in — see
    * [[ivfTopK]]). One of the two persistable index tables
    * ([[graft.functions.AnnIndex]] writes it through a TableStore). */
  def ivfCentroids(
      corpus: DataFrame, idCol: String, vecCol: String, nlist: Int): DataFrame =
    corpus.orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).as("cent_id"), col(vecCol).as("centv"))
      .withColumn("ncent", sqrt(dotExpr("centv", "centv")))

  /** The IVF inverted lists: `(cent_id, vec_id, cv, nc)` — nearest
    * centroid per corpus vector, carrying the vector and its norm so a
    * query served FROM the lists never touches the raw corpus again.
    * max(struct(sim, -cent_id, ...)) == "highest sim, lowest cent_id on
    * ties" and is a partial-aggregable groupBy — the scale-safe argmax (a
    * row_number window here would shuffle nlist x corpus rows). The
    * second persistable index table. */
  def ivfInvertedLists(
      corpus: DataFrame, cents: DataFrame,
      idCol: String, vecCol: String): DataFrame =
    corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
      .withColumn("nc", sqrt(dotExpr("cv", "cv")))
      .crossJoin(broadcast(cents))
      .withColumn("cent_sim",
        round(dotExpr("cv", "centv") / (col("nc") * col("ncent")), 6))
      .groupBy("vec_id")
      .agg(max(struct(col("cent_sim"), (-col("cent_id")).as("neg_id"),
        col("cv"), col("nc"))).as("best"))
      .select((-col("best.neg_id")).as("cent_id"), col("vec_id"),
        col("best.cv").as("cv"), col("best.nc").as("nc"))

  /** Probed exact search over a prebuilt (centroids, lists) index — the
    * serve-path half of [[ivfTopK]], shared verbatim by the persisted
    * index so built-then-loaded results are row-identical to the inline
    * path. Reads ONLY the index frames: the raw embedding corpus never
    * appears in the query plan. */
  def ivfSearch(
      cents: DataFrame, lists: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame =
    ivfSearchLists(lists, ivfProbes(cents, queries, idCol, vecCol, nprobe), k)

  /** The probe half of [[ivfSearch]]: each query's `nprobe` nearest
    * centroids, `(cent_id, query_id, qv, nq)` — the routing table a
    * partition-pruned serve path derives its cent_id set from
    * ([[AnnIndex.ivfTopK]]). Query side is small; centroids broadcast. */
  def ivfProbes(
      cents: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, nprobe: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("nq", sqrt(dotExpr("qv", "qv")))
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("cent_sim").desc, col("cent_id"))
    q.crossJoin(broadcast(cents))
      .withColumn("cent_sim",
        round(dotExpr("qv", "centv") / (col("nq") * col("ncent")), 6))
      .withColumn("prnk", row_number().over(wProbe))
      .filter(col("prnk") <= nprobe)
      .select("cent_id", "query_id", "qv", "nq")
  }

  /** The scoring half of [[ivfSearch]]: exact cosine of every probed
    * list entry against its probing queries, ranked per query. */
  def ivfSearchLists(lists: DataFrame, probes: DataFrame, k: Int): DataFrame =
    lists.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", cosineWithNorms("qv", "cv", col("nq"), col("nc")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos_sim", "rank")

  /** Product-quantization encoding (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): each vector splits into
    * `m` subvectors of dims/m; per subspace a codebook of `ksub` codewords
    * (deterministic: the subvectors of the ksub lowest-id corpus vectors,
    * standing in for k-means-trained codebooks exactly like [[ivfTopK]]'s
    * coarse quantizer); encode = argmin-L2 codeword id per subspace. A
    * 64-dim float vector (256 B) becomes m=8 byte codes — the 32× memory
    * compression that lets a billion-vector index live in RAM, with
    * [[ivfTopK]] routing and asymmetric-distance scoring on top.
    *
    * Dataflow: corpus explodes into m subvector rows (narrow), the m×ksub
    * codeword table broadcasts, the L2 argmin is a partial-aggregable
    * max-of-struct groupBy(vec, subspace), and codes pivot back to one row
    * per vector (pinned subspace list — schema never data-dependent). The
    * corpus is never shuffled by a window and never joined to itself.
    * L2² is computed as |a|² + |b|² − 2ab from three fixed-order dot
    * chains, rounded to 6 — bit-identical in the DuckDB oracle. */
  /** Explode a vector column into its m subvectors: one row per subspace,
    * as struct(s, <outName>). Shared by the PQ encode/search dataflows —
    * the single place that owns the subspace layout. */
  private def explodeSubvectors(
      vec: Column, m: Int, d0: Int, outName: String): Column = explode(array(
    (0 until m).map(s => struct(lit(s).as("s"),
      slice(vec, s * d0 + 1, d0).as(outName))): _*))

  /** The m×ksub codebook: subvectors of the ksub lowest-id corpus vectors,
    * one row per (cb_id, s). Shared by [[pqEncode]] and [[pqAdcTopK]]. */
  /** The m×ksub PQ codebook `(cb_id, s, cw)` — one persistable index
    * table ([[AnnIndex]] writes it through a TableStore). */
  def pqCodebook(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, d0: Int, ksub: Int): DataFrame =
    corpus.orderBy(col(idCol)).limit(ksub)
      .select(col(idCol).as("cb_id"), col(vecCol).as("cbv"))
      .select(col("cb_id"), explodeSubvectors(col("cbv"), m, d0, "cw").as("x"))
      .select(col("cb_id"), col("x.s").as("s"), col("x.cw").as("cw"))

  /** Per-subspace-TRAINED PQ codebooks: `iters` Lloyd's rounds run in all
    * `m` subspaces SIMULTANEOUSLY (one corpus assignment pass per round,
    * keyed by (vec_id, s) — never a per-subspace loop), seeded from the
    * deterministic stand-in ([[pqCodebook]]: the ksub lowest-id vectors'
    * subvectors) — the same geometry escape [[kmeansTrain]] gives the IVF
    * coarse quantizer, applied where PQ theory actually demands it (the
    * codebook IS the quantizer; Jégou et al. 2011 train per-subspace
    * k-means). Drop-in: feed the result to [[pqEncodeWith]] /
    * [[pqAdcSearch]] without touching a join; [[AnnIndex.buildPq]] takes
    * a `trainIters` knob exactly like `buildIvf`.
    *
    * Assignment uses the exact [[pqEncodeWith]] rule (L2² rounded to 6,
    * tie → lowest cb_id); per-dimension means go through FIXED-POINT 1e-6
    * longs (order-independent) then a float cast, and an emptied codeword
    * keeps its previous value — all [[kmeansTrain]] conventions, so the
    * DuckDB oracle replays every round bit-exactly
    * (q_pq_recall_trained). Cost: `iters` corpus subvector passes, paid
    * once per index (re)build. */
  def pqCodebookTrained(
      corpus: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int, ksub: Int, iters: Int): DataFrame = {
    require(dims % m == 0, s"dims ($dims) must split evenly into m ($m) subspaces")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val d0 = dims / m
    val sub = corpus
      .select(col(idCol).as("vec_id"), explodeSubvectors(col(vecCol), m, d0, "sv").as("x"))
      .select(col("vec_id"), col("x.s").as("s"), col("x.sv").as("sv"))
      .withColumn("sv2", ArrayDot.floatDot(col("sv"), col("sv")))
    var cb = pqCodebook(corpus, idCol, vecCol, m, d0, ksub)
    for (_ <- 1 to iters) {
      val cents = cb.withColumn("cw2", ArrayDot.floatDot(col("cw"), col("cw")))
      val assigned = sub.join(broadcast(cents), Seq("s"))
        .withColumn("d2", round(
          col("sv2") + col("cw2") - lit(2.0) * ArrayDot.floatDot(col("sv"), col("cw")), 6))
        .groupBy("vec_id", "s")
        .agg(max(struct((-col("d2")).as("nd"), (-col("cb_id")).as("nid"), col("sv"))).as("best"))
        .select(col("s"), (-col("best.nid")).as("cb_id"), col("best.sv").as("sv"))
      val means = assigned
        .select(col("s"), col("cb_id"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy("s", "cb_id", "pos")
        .agg(sum(round(col("x").cast("double") * 1e6, 0).cast("long")).as("sfp"),
          count(lit(1)).as("n"))
        .withColumn("mu",
          (col("sfp").cast("double") / col("n").cast("double") / lit(1e6)).cast("float"))
        .groupBy("s", "cb_id")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("mu")))),
          t => t.getField("mu")).as("next"))
      // localCheckpoint per round (eager, m×ksub rows — trivial): `cb`
      // appears twice per round (broadcast side + repair join), the
      // plan-doubling trap the kmeansTrain scaladoc documents.
      cb = cb.join(means, Seq("s", "cb_id"), "left")
        .select(col("cb_id"), col("s"), coalesce(col("next"), col("cw")).as("cw"))
        .localCheckpoint()
    }
    cb
  }

  def pqEncode(
      corpus: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int = 8, ksub: Int = 16): DataFrame =
    pqEncodeMelted(corpus, idCol, vecCol, dims, m, ksub)
      .groupBy("vec_id")
      .pivot("s", (0 until m).map(_.toString))
      .agg(first(col("code")))
      .select(col("vec_id") +: (0 until m).map(s => col(s.toString).as(s"code_$s")): _*)

  /** PQ codes in melted form `(vec_id, s, code)` — the layout the ADC
    * scorer joins on and the second persistable PQ index table (the
    * pivoted [[pqEncode]] is the human-facing view of the same codes). */
  def pqEncodeMelted(
      corpus: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int = 8, ksub: Int = 16): DataFrame = {
    require(dims % m == 0, s"dims ($dims) must split evenly into m ($m) subspaces")
    pqEncodeWith(corpus,
      pqCodebook(corpus, idCol, vecCol, m, dims / m, ksub),
      idCol, vecCol, dims, m)
  }

  /** Encode against an EXPLICIT codebook `(cb_id, s, cw)` — the stage an
    * incremental index append uses: new vectors are coded under the
    * PERSISTED codebook, never a rederived one (PQ geometry is frozen at
    * build time; rebuild when drift warrants). */
  def pqEncodeWith(
      corpus: DataFrame, codebook: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int): DataFrame = {
    require(dims % m == 0, s"dims ($dims) must split evenly into m ($m) subspaces")
    val d0 = dims / m
    val cents = codebook
      .withColumn("cw2", ArrayDot.floatDot(col("cw"), col("cw")))
    val sub = corpus
      .select(col(idCol).as("vec_id"), explodeSubvectors(col(vecCol), m, d0, "sv").as("x"))
      .select(col("vec_id"), col("x.s").as("s"), col("x.sv").as("sv"))
      .withColumn("sv2", ArrayDot.floatDot(col("sv"), col("sv")))
    sub.join(broadcast(cents), Seq("s"))
      .withColumn("d2", round(
        col("sv2") + col("cw2") - lit(2.0) * ArrayDot.floatDot(col("sv"), col("cw")), 6))
      .groupBy("vec_id", "s")
      .agg(max(struct((-col("d2")).as("nd"), (-col("cb_id")).as("nid"))).as("best"))
      .select(col("vec_id"), col("s"), (-col("best.nid")).cast("long").as("code"))
  }

  /** PQ asymmetric-distance (ADC) top-k: queries stay full-precision,
    * corpus vectors are their [[pqEncode]] codes; per query a distance
    * TABLE of m×ksub subspace distances is precomputed and broadcast, and
    * each corpus vector's approximate L2² is the sum of its m looked-up
    * entries — the scoring loop of a billion-scale PQ index, as joins and
    * aggregates. Per-subspace distances go through fixed-point longs so
    * the m-way sum is order-independent (partition-proof); ranking
    * tie-breaks on vec_id. Exact-rerank on the ADC top-k' (k' > k) is the
    * standard production refinement and composes with [[bruteForceTopK]]
    * over the shortlist. */
  def pqAdcTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int = 8, ksub: Int = 16, k: Int = 3): DataFrame =
    pqAdcSearch(
      pqEncodeMelted(corpus, idCol, vecCol, dims, m, ksub),
      pqCodebook(corpus, idCol, vecCol, m, dims / m, ksub),
      queries, idCol, vecCol, dims, m, k)

  /** ADC scoring over prebuilt PQ index frames (melted codes + codebook)
    * — the serve-path half of [[pqAdcTopK]], shared verbatim by the
    * persisted index: only the byte codes and the m×ksub codebook appear
    * in the query plan, never the raw corpus vectors. */
  def pqAdcSearch(
      codes: DataFrame, codebook: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, dims: Int, m: Int, k: Int): DataFrame = {
    val d0 = dims / m
    val qsub = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"), explodeSubvectors(col("qv"), m, d0, "qs").as("x"))
      .select(col("query_id"), col("x.s").as("s"), col("x.qs").as("qs"))
    // Distance table: m×ksub rows per query, fixed-point micro-units.
    val dt = qsub.join(codebook, Seq("s"))
      .select(col("query_id"), col("s"), col("cb_id"),
        round((ArrayDot.floatDot(col("qs"), col("qs"))
          + ArrayDot.floatDot(col("cw"), col("cw"))
          - lit(2.0) * ArrayDot.floatDot(col("qs"), col("cw"))) * lit(1e6), 0)
          .cast("long").as("pd_fp"))
    codes.join(broadcast(dt),
        codes("s") === dt("s") && codes("code") === dt("cb_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("pd_fp")).as("fp"))
      .select(col("query_id"), col("vec_id"),
        round(col("fp").cast("double") / 1e6, 6).as("adc_dist"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adc_dist").asc, col("vec_id").asc))
        .cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Smallest sign-bit count in [minBits, maxBits] keeping expected bucket
    * occupancy n/2^bits at or under `targetOccupancy`. A FIXED bit count is
    * a quadratic time bomb: once the 2^bits buckets saturate, per-bucket
    * pair work grows as (n/2^bits)² — measured at ×100 corpus scale as
    * 2.5× the linear-extrapolated floor. Occupancy-bounded bits keep total
    * candidate pairs ≈ n·occupancy/2, i.e. LINEAR in n, at the documented
    * recall trade (finer buckets drop more cross-bucket pairs — the same
    * knob semantics as IVF nlist). Integer-exact, so the DuckDB oracle
    * derives the identical value from count(*). */
  def adaptiveSignBits(
      n: Long, targetOccupancy: Long = 64,
      minBits: Int = 8, maxBits: Int = 20): Int = {
    var bits = minBits
    while (bits < maxBits && n > (1L << bits) * targetOccupancy) bits += 1
    bits
  }

  /** Embedding-cosine near-duplicate pairs with a sign-bucket prefilter —
    * THE production entry point for embedding dedup: candidates = same
    * sign-bucket only (equi-join), then exact cosine verify within the
    * bucket. `bits <= 0` (the default) sizes the bucket count from the
    * corpus via [[adaptiveSignBits]] — EXPECTED candidate volume linear in
    * corpus size. Caveat measured at ×100 scale: occupancy bounds the
    * AVERAGE, not a dense near-dup family that shares one sign pattern
    * (max bucket 14k vs avg 64 on the ×100 corpus, 707M within-bucket
    * pairs — and sampled same-bucket pairs were 100% true dups, so that
    * cost IS the answer size). When the corpus contains such families,
    * all-pairs output is itself quadratic — use
    * [[embeddingDedupLeaders]], whose work AND output stay linear, and
    * keep this as the within-bucket exact-pairs witness. Pairs whose
    * vectors land in different sign buckets are by design not candidates
    * (tune recall with `targetOccupancy`; swap the partitioner for IVF
    * centroids at real scale — the join shape is identical). Use
    * [[embeddingDupPairs]] only as the exact O(N²) witness.
    *
    * NOTE on laziness: with the default `bits <= 0` the bucket count is
    * sized from the corpus cardinality, which runs an EAGER
    * `corpus.select(idCol).count()` action at plan-construction time —
    * one extra (column-pruned) scan of the source. Pass `rowCount` (a
    * count you already have, e.g. from table stats) or an explicit `bits`
    * to keep construction fully lazy; for expensive uncached inputs,
    * cache the corpus first. */
  def embeddingDupPairsBucketed(
      corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 0, targetOccupancy: Long = 64,
      rowCount: Long = -1L): DataFrame = {
    val useBits =
      if (bits > 0) bits
      else adaptiveSignBits(
        if (rowCount >= 0) rowCount else corpus.select(idCol).count(),
        targetOccupancy)
    embeddingDupPairsBucketedFixed(corpus, idCol, vecCol, threshold, useBits)
  }

  private def embeddingDupPairsBucketedFixed(
      corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("va"))
      .withColumn("bucket", signBucket("va", bits))
      .withColumn("na", sqrt(dotExpr("va", "va")))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
      .withColumn("bucket", signBucket("vb", bits))
      .withColumn("nb", sqrt(dotExpr("vb", "vb")))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosineWithNorms("va", "vb", col("na"), col("nb")))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }

  /** Leader-clustering embedding dedup — the variant whose WORK and OUTPUT
    * both stay linear even when the corpus holds dense near-duplicate
    * families (the regime where [[embeddingDupPairsBucketed]]'s all-pairs
    * answer is itself quadratic): within each sign bucket the lowest-id
    * vector is the LEADER, and every other member is verified against its
    * leader ONLY — one cosine per member, O(population) per bucket.
    * Canopy-style: a member whose cosine to the leader clears `threshold`
    * is a duplicate of the leader's family; chains between two non-leader
    * members that both miss the leader are not caught (the recall trade
    * that buys the linear bound — for dedup of dense families this is the
    * standard SemDeDup/canopy discipline). Returns one row per duplicate
    * member: (vec_id, leader_id, cos_sim >= threshold); survivors =
    * corpus anti-join on vec_id. Deterministic (leader = min id), so the
    * DuckDB oracle pins it exactly. `bits <= 0` sizes buckets adaptively
    * like the pair variant (same eager-count caveat: pass `rowCount` or
    * explicit `bits` to keep plan construction lazy). */
  def embeddingDedupLeaders(
      corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 0, targetOccupancy: Long = 64,
      rowCount: Long = -1L): DataFrame = {
    val useBits =
      if (bits > 0) bits
      else adaptiveSignBits(
        if (rowCount >= 0) rowCount else corpus.select(idCol).count(),
        targetOccupancy)
    val bucketed = corpus
      .select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
      .withColumn("bucket", signBucket("cv", useBits))
      .withColumn("nc", sqrt(dotExpr("cv", "cv")))
    // Partial-aggregable leader choice, then ONE equi-join to attach the
    // leader's vector: rows flowing = corpus + one row per bucket.
    val leaders = bucketed.groupBy("bucket")
      .agg(min(col("vec_id")).as("leader_id"))
    val leaderVecs = leaders
      .join(bucketed.select(col("vec_id").as("leader_id"),
        col("cv").as("lv"), col("nc").as("nl")), Seq("leader_id"))
    bucketed.join(leaderVecs, Seq("bucket"))
      .filter(col("vec_id") =!= col("leader_id"))
      .withColumn("cos_sim", cosineWithNorms("cv", "lv", col("nc"), col("nl")))
      .filter(col("cos_sim") >= threshold)
      .select("vec_id", "leader_id", "cos_sim")
  }

  /** SemDeDup-style semantic dedup pairs (Abbas et al. 2023, arXiv
    * 2303.09540): cluster embeddings with a coarse quantizer, then find
    * high-cosine pairs ONLY within each cluster — the semantic analogue of
    * LSH banding, turning the O(N²) dedup join into per-cluster work.
    * Cluster assignment is the same scale-safe broadcast argmax as
    * [[ivfTopK]]'s inverted lists (no corpus shuffle by window; the
    * aggregate is map-side combinable), so the corpus moves once, into its
    * cluster bucket, and the pair join is an equi-join on cent_id.
    * Centroids here are the deterministic `nlist` lowest-id vectors (swap
    * for [[kmeansStep]]-trained centroids without touching a join — same
    * recall/dataflow trade as ivfTopK, and cross-cluster near-dups are by
    * design not candidates). `nlist <= 0` (the default) sizes the cluster
    * count from the corpus — max(16, ceil(n/256)) — so cluster population
    * stays occupancy-bounded as the corpus grows instead of saturating a
    * fixed 16 (the same quadratic time bomb the ×100 audit caught in
    * fixed sign bits; mirrored integer-exactly in the oracle SQL). Emits
    * (cent_id, id_a, id_b, cos_sim >= threshold); downstream survivor
    * selection = keep min id per cluster component, exactly like
    * [[Dedup.clusterLabels]] over these pairs. */
  def semanticDedupPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nlist: Int = 0, rowCount: Long = -1L): DataFrame = {
    val useNlist =
      if (nlist > 0) nlist
      else {
        // Eager sizing count when no rowCount is supplied — see
        // embeddingDupPairsBucketed's laziness note.
        val n = if (rowCount >= 0) rowCount else corpus.select(idCol).count()
        math.max(16L, (n + 255L) / 256L).toInt
      }
    val cents = corpus.orderBy(col(idCol)).limit(useNlist)
      .select(col(idCol).as("cent_id"), col(vecCol).as("centv"))
      .withColumn("ncent", sqrt(dotExpr("centv", "centv")))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
      .withColumn("nc", sqrt(dotExpr("cv", "cv")))
    val clustered = c.crossJoin(broadcast(cents))
      .withColumn("cent_sim",
        round(dotExpr("cv", "centv") / (col("nc") * col("ncent")), 6))
      .groupBy("vec_id")
      .agg(max(struct(col("cent_sim"), (-col("cent_id")).as("neg_id"),
        col("cv"), col("nc"))).as("best"))
      .select((-col("best.neg_id")).as("cent_id"), col("vec_id"),
        col("best.cv").as("cv"), col("best.nc").as("nc"))
    val a = clustered.select(col("cent_id"), col("vec_id").as("id_a"),
      col("cv").as("va"), col("nc").as("na"))
    val b = clustered.select(col("cent_id"), col("vec_id").as("id_b"),
      col("cv").as("vb"), col("nc").as("nb"))
    a.join(b, Seq("cent_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosineWithNorms("va", "vb", col("na"), col("nb")))
      .filter(col("cos_sim") >= threshold)
      .select("cent_id", "id_a", "id_b", "cos_sim")
  }

  /** Embedding-cosine near-duplicate pairs, exact all-pairs baseline
    * (id_a < id_b, cosine >= threshold). O(N²) by construction — the
    * exactness witness for [[embeddingDupPairsBucketed]], which is the
    * entry point a production pipeline should use. */
  def embeddingDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    // Repartition the streamed side: a small single-file corpus would
    // otherwise put the whole O(N^2) pair stream on ONE task. The broadcast
    // side stays whole; parallelism = shuffle partitions.
    val parallelism = corpus.sparkSession.sessionState.conf.numShufflePartitions
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("va"))
      .withColumn("na", sqrt(dotExpr("va", "va")))
      .repartition(parallelism)
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
      .withColumn("nb", sqrt(dotExpr("vb", "vb")))
    a.crossJoin(broadcast(b))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosineWithNorms("va", "vb", col("na"), col("nb")))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }

  /** Similarity-score calibration histogram — the input to choosing a
    * near-dup / retrieval threshold: the distribution of cosine scores over
    * a DETERMINISTIC hash-sampled pair set. Two independent content-hash
    * vertex samples (rates rateA, rateB) are cross-joined (small × small,
    * one side broadcast) instead of sampling the quadratic pair space — the
    * only shape that stays bounded at corpus scale: |pairs| ≈
    * rateA·rateB·N²/2 is set by the rates, not by N² (pick rates ∝ 1/√N
    * for a constant-size calibration set). Buckets are width-0.05 over
    * [-1, 1], keyed by floor(round(cos,6)·20).
    *
    * The rate contract is ENFORCED, not just documented: the two sampled
    * id sets are counted up front (two cheap column-pruned scans) and the
    * call fails fast when the broadcast side exceeds `maxBroadcastRows`
    * or the pair product exceeds `maxPairs` — a caller who forgets to
    * shrink the rates as N grows gets an actionable error instead of a
    * silent quadratic cross join. */
  def simHistogram(
      df: DataFrame, idCol: String, vecCol: String,
      rateA: Double, rateB: Double,
      maxPairs: Long = 100000000L,
      maxBroadcastRows: Long = 4000000L): DataFrame = {
    def samplePred(seed: String, rate: Double) =
      substring(md5(concat(lit(s"$seed:"), col(idCol))), 1, 8) <
        Sampling.hexThreshold(rate)
    def sampled(seed: String, rate: Double, idAs: String, vAs: String) =
      df.filter(samplePred(seed, rate))
        .select(col(idCol).as(idAs), col(vecCol).as(vAs))
    val nA = df.filter(samplePred("simA", rateA)).select(idCol).count()
    val nB = df.filter(samplePred("simB", rateB)).select(idCol).count()
    require(nB <= maxBroadcastRows,
      s"simHistogram broadcast side sampled $nB rows (> $maxBroadcastRows); " +
        s"lower rateB — pick rates ~ 1/sqrt(N) for a constant pair budget")
    require(nA * nB <= maxPairs,
      s"simHistogram pair volume $nA x $nB = ${nA * nB} exceeds maxPairs=" +
        s"$maxPairs; lower rateA/rateB (~ 1/sqrt(N)) or raise maxPairs " +
        s"deliberately")
    val a = sampled("simA", rateA, "id_a", "va")
      .withColumn("na", sqrt(dotExpr("va", "va")))
    val b = sampled("simB", rateB, "id_b", "vb")
      .withColumn("nb", sqrt(dotExpr("vb", "vb")))
    a.crossJoin(broadcast(b))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosineWithNorms("va", "vb", col("na"), col("nb")))
      .withColumn("bucket", floor(col("cos_sim") * 20).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).cast("long").as("n_pairs"))
      .withColumn("bucket_lo", round(col("bucket").cast("double") / 20, 6))
  }

  /** Cluster-balanced diversity sampling (the SemDeDup / DCLM curation
    * step after semantic clustering): assign every vector to its nearest
    * coarse centroid (broadcast argmax, no corpus shuffle — same shape as
    * [[ivfTopK]]'s inverted lists), then keep at most `capPerCell` vectors
    * per cell in deterministic content-hash order, so no semantic region
    * dominates the training mix. Returns kept rows with their cell and
    * the cell's pre-cap population. */
  def clusterBalancedSample(
      df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, capPerCell: Int): DataFrame = {
    val cents = df.orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).as("cent_id"), col(vecCol).as("centv"))
      .withColumn("ncent", sqrt(dotExpr("centv", "centv")))
    val c = df.select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
      .withColumn("nc", sqrt(dotExpr("cv", "cv")))
    val assigned = c.crossJoin(broadcast(cents))
      .withColumn("cent_sim",
        round(dotExpr("cv", "centv") / (col("nc") * col("ncent")), 6))
      .groupBy("vec_id")
      .agg(max(struct(col("cent_sim"), (-col("cent_id")).as("neg_id"))).as("best"))
      .select(col("vec_id"), (-col("best.neg_id")).as("cent_id"))
    val sizes = assigned.groupBy("cent_id")
      .agg(count(lit(1)).cast("long").as("cell_n"))
    // hash prefix + id suffix: unique ⇒ the per-cell keep order is total
    val keyed = assigned.withColumn("__k",
      concat(substring(md5(concat(lit("divs:"), col("vec_id"))), 1, 8),
        lit(":"), col("vec_id").cast("string")))
    Sampling.capPerKey(keyed, "cent_id", "__k", capPerCell)
      .join(sizes, "cent_id")
      .select(col("vec_id"), col("cent_id"), col("cell_n"))
  }

  /** Embedding-table QA audit — the gate an ANN/semantic-dedup pipeline
    * runs BEFORE trusting its vectors: per label, counts of zero-norm
    * vectors (cosine-undefined: they poison similarity joins silently) and
    * wrong-dimension vectors (a ragged batch from a failed encoder run),
    * plus norm min/max/mean (distribution drift signal). Norms use the
    * native codegen'd dot (same fixed left-to-right double association as
    * the oracle's SQL chain); the mean is fixed-pointed to 1e-6 longs
    * before summing, so it is partition-order-independent. Narrow per-row
    * compute + one label-keyed aggregation — linear at any corpus size. */
  def embeddingAudit(
      df: DataFrame, vecCol: String, labelCol: String,
      expectedDim: Int): DataFrame = {
    val base = df.select(col(labelCol),
      size(col(vecCol)).cast("long").as("dim"),
      sqrt(ArrayDot.floatDot(col(vecCol), col(vecCol))).as("norm"))
    base.groupBy(labelCol)
      .agg(count(lit(1)).cast("long").as("n_vecs"),
        sum(when(col("dim") =!= expectedDim, 1L).otherwise(0L)).cast("long")
          .as("n_bad_dim"),
        sum(when(col("norm") === 0.0, 1L).otherwise(0L)).cast("long")
          .as("n_zero"),
        round(min(col("norm")), 6).as("norm_min"),
        round(max(col("norm")), 6).as("norm_max"),
        sum(round(col("norm") * 1e6, 0).cast("long")).as("__s"))
      .withColumn("norm_mean",
        round(col("__s").cast("double") / col("n_vecs").cast("double") / 1e6, 6))
      .drop("__s")
  }
}
