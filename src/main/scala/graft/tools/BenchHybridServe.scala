package graft.tools

import graft.functions.{AnnIndex, LexIndex}
import graft.io.ParquetTableStore
import graft.stream.EventAnalytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Steady-state HYBRID retrieval serve record — the production endpoint
  * q_hybrid_ivf oracle-pins, measured as a standing stream: persisted BM25
  * (forward index on — the deployed layout) ⊕ persisted trained-IVF ⊕
  * reciprocal-rank fusion per query micro-batch, in the two postures the
  * single-retriever benches record: fresh-per-batch
  * ([[EventAnalytics.hybridProbeEachBatch]] — index tables re-resolved
  * every micro-batch) and PINNED ([[EventAnalytics
  * .hybridProbeEachBatchPinned]] — both snapshots resolved once at stream
  * start, the steady-QPS path), the pinned posture in BOTH routing
  * shapes: separate (two sequential routing collects per batch — the r13
  * floor) and FUSED (one union-collect round trip,
  * [[LexIndex.hybridTopKPinned]] — the default). An untimed pre-pass
  * asserts fused == separate row-for-row on EVERY batch before anything
  * is timed. Queries are dual-encoder rows (text +
  * embedding) drawn from corpus members with ids remapped out of the
  * corpus id space (the fusion scaladoc's disjointness contract).
  *
  * Each phase's first batch absorbs plan/codegen warm-up and is excluded
  * from steady state; every batch's fused result count is asserted ==
  * batchSize × k, so the number can never be a throughput over empty
  * results. Compare alongside BenchLexServe (BM25/RM3 phases) and
  * BenchAnnServe (IVF phases) — same machine, same discipline.
  *
  * Usage: BenchHybridServe [dataDir] [nBatches] [batchSize] [nlist] [nprobe]
  */
object BenchHybridServe {
  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = if (args.length > 1) args(1).toInt else 16
    // The fused-vs-separate A/B interleaves the two pinned paths
    // batch-by-batch on two standing streams, so each path serves
    // nBatches/2 — an odd count would hand the fused stream one extra
    // batch and trip the row-count assertion with a confusing message.
    require(nBatches % 2 == 0, s"nBatches must be even (got $nBatches): " +
      "the fused-vs-separate A/B serves nBatches/2 chunks per path")
    val batchSize = if (args.length > 2) args(2).toInt else 64
    val nlist = if (args.length > 3) args(3).toInt else 64
    val nprobe = if (args.length > 4) args(4).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = spark.read.parquet(s"$dataDir/documents.parquet")
      .select("doc_id", "text")
    val emb = spark.read.parquet(s"$dataDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("graft_hyb_serve").toString
    val lexStore = new ParquetTableStore(spark, s"$root/lex")
    val annStore = new ParquetTableStore(spark, s"$root/ann",
      partitionByCols = AnnIndex.partitionSpec("ivf"))
    val tLex0 = System.nanoTime()
    LexIndex.build(lexStore, "lex", docs, "doc_id", "text", forwardIndex = true)
    val lexBuildSec = (System.nanoTime() - tLex0) / 1e9
    val tAnn0 = System.nanoTime()
    AnnIndex.buildIvf(annStore, "ivf", emb, "vec_id", "embedding",
      nlist = nlist, trainIters = 2)
    val annBuildSec = (System.nanoTime() - tAnn0) / 1e9

    // Dual-encoder query stream: corpus members carrying BOTH a text and
    // an embedding (joined on the shared id grid), ids remapped out of
    // the corpus space so neither retriever self-match-guards them away.
    val qidBase = 1L << 40
    val queryRows = docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select((col("doc_id") + qidBase).as("qid"), col("text"), col("embedding"))
      .limit(nBatches * batchSize)
      .as[(Long, String, Array[Float])].collect()
    require(queryRows.length == nBatches * batchSize,
      s"corpus too small: ${queryRows.length} < ${nBatches * batchSize}")

    val k = 3
    def drive(label: String,
        probe: (DataFrame => Unit) => (DataFrame, Long) => Unit): Vector[Double] = {
      val input = MemoryStream[(Long, String, Array[Float])]
      @volatile var got = 0L
      val q = input.toDF().toDF("qid", "qtext", "qvec")
        .writeStream
        .foreachBatch(probe { out => got += out.count(); () })
        .trigger(Trigger.ProcessingTime("0 seconds"))
        .start()
      val secs = queryRows.grouped(batchSize).map { chunk =>
        val t0 = System.nanoTime()
        input.addData(chunk.toSeq)
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      }.toVector
      q.stop()
      require(got == nBatches.toLong * batchSize * k,
        s"$label fused rows $got != expected ${nBatches.toLong * batchSize * k}")
      secs
    }

    val freshSecs = drive("fresh", EventAnalytics.hybridProbeEachBatch(
      lexStore, "lex", annStore, "ivf", "qid", "qtext", "qvec",
      k = k, nprobe = nprobe))
    val lexSnap = LexIndex.snapshot(lexStore, "lex")
    val annSnap = AnnIndex.ivfSnapshot(annStore, "ivf")

    // Untimed equality pre-pass: EVERY batch's fused-routing result must
    // equal the separate two-collect composition row-for-row — the fused
    // number below can never be a speedup over different answers.
    queryRows.grouped(batchSize).zipWithIndex.foreach { case (chunk, i) =>
      val batch = spark.createDataFrame(chunk.toSeq)
        .toDF("qid", "qtext", "qvec")
      def rowsOf(df: DataFrame) =
        df.select("qid", "doc_id", "rrf_score", "n_systems", "rnk")
          .collect().map(_.toSeq).toSet
      val fused = rowsOf(LexIndex.hybridTopKPinned(
        lexSnap, annSnap, batch, "qid", "qtext", "qvec", k, nprobe))
      val lex = LexIndex.bm25TopK(lexSnap, batch, "qid", "qtext",
          k, 1.2, 0.75, pruneTerms = true)
        .select(col("qid"), col("doc_id"), col("rnk"))
      val ann = AnnIndex.ivfTopK(annSnap, batch, "qid", "qvec",
          k, nprobe, pruneProbed = true)
        .select(col("query_id").as("qid"), col("vec_id").as("doc_id"),
          col("rank").cast("long").as("rnk"))
      val separate = rowsOf(LexIndex.rrfFuse(
        Seq(lex, ann), "qid", "doc_id", "rnk", k))
      require(fused == separate, s"batch $i: fused != separate routing")
    }

    // Fused vs separate routing, INTERLEAVED batch-by-batch on two
    // standing streams: in-JVM phase order is a real effect (the later
    // phase measured 0.77× the earlier on identical code — broadcast/GC
    // accumulation), so sequential phases cannot compare the two paths.
    // Alternating chunks lands session drift on both evenly; each path
    // serves nBatches/2 chunks, first one excluded as its warm-up.
    val inputF = MemoryStream[(Long, String, Array[Float])]
    val inputS = MemoryStream[(Long, String, Array[Float])]
    @volatile var gotF = 0L
    @volatile var gotS = 0L
    val qF = inputF.toDF().toDF("qid", "qtext", "qvec").writeStream
      .foreachBatch(EventAnalytics.hybridProbeEachBatchPinned(
        lexSnap, annSnap, "qid", "qtext", "qvec", k = k, nprobe = nprobe) {
        out => gotF += out.count(); () })
      .trigger(Trigger.ProcessingTime("0 seconds")).start()
    val qS = inputS.toDF().toDF("qid", "qtext", "qvec").writeStream
      .foreachBatch(EventAnalytics.hybridProbeEachBatchPinned(
        lexSnap, annSnap, "qid", "qtext", "qvec", k = k, nprobe = nprobe,
        fuseRouting = false) { out => gotS += out.count(); () })
      .trigger(Trigger.ProcessingTime("0 seconds")).start()
    val (fusedTimes, sepTimes) = {
      val f = Vector.newBuilder[Double]
      val s = Vector.newBuilder[Double]
      queryRows.grouped(batchSize).zipWithIndex.foreach { case (chunk, i) =>
        val fused = i % 2 == 0
        val (input, q) = if (fused) (inputF, qF) else (inputS, qS)
        val t0 = System.nanoTime()
        input.addData(chunk.toSeq)
        q.processAllAvailable()
        val dt = (System.nanoTime() - t0) / 1e9
        if (fused) f += dt else s += dt
      }
      (f.result(), s.result())
    }
    qF.stop(); qS.stop()
    val half = nBatches / 2
    require(gotF == half.toLong * batchSize * k && gotS == half.toLong * batchSize * k,
      s"interleaved fused rows $gotF / separate rows $gotS != expected ${half.toLong * batchSize * k}")
    val pinnedSecs = fusedTimes
    val sepSecs = sepTimes
    lexSnap.release()
    annSnap.release()

    def r3(x: Double) = (x * 1000).round / 1000.0
    def stats(secs: Vector[Double]): (Double, Double, Double, Double) = {
      val steady = secs.tail
      val sorted = steady.sorted
      (steady.size * batchSize / steady.sum,
        secs.head, sorted(sorted.size / 2), sorted.last)
    }
    val (qps, warm, p50, pmax) = stats(freshSecs)
    val (sQps, sWarm, sP50, sMax) = stats(sepSecs)
    val (pQps, pWarm, pP50, pMax) = stats(pinnedSecs)
    println(s"""{"metric":"hybrid_serve_qps","value":${r3(qps)},""" +
      s""""unit":"queries/sec","batches":$nBatches,"batch_size":$batchSize,""" +
      s""""k":$k,"nlist":$nlist,"nprobe":$nprobe,""" +
      s""""lex_build_sec":${r3(lexBuildSec)},"ann_build_sec":${r3(annBuildSec)},""" +
      s""""warm_batch_sec":${r3(warm)},"steady_batch_p50_sec":${r3(p50)},""" +
      s""""steady_batch_max_sec":${r3(pmax)},""" +
      s""""pinned_separate_qps":${r3(sQps)},"pinned_separate_warm_batch_sec":${r3(sWarm)},""" +
      s""""pinned_separate_batch_p50_sec":${r3(sP50)},"pinned_separate_batch_max_sec":${r3(sMax)},""" +
      s""""pinned_qps":${r3(pQps)},"pinned_warm_batch_sec":${r3(pWarm)},""" +
      s""""pinned_batch_p50_sec":${r3(pP50)},"pinned_batch_max_sec":${r3(pMax)}}""")
    spark.stop()
  }
}
