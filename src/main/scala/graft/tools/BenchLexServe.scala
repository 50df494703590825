package graft.tools

import graft.functions.LexIndex
import graft.io.ParquetTableStore
import graft.stream.EventAnalytics
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming-BM25-serve throughput record — the lexical twin of
  * [[BenchAnnServe]]: builds a PERSISTED [[LexIndex]] over a documents
  * corpus (term-sorted postings), then drives text-query micro-batches
  * through [[EventAnalytics.bm25ProbeEachBatch]] — the exact
  * foreachBatch path a retrieval endpoint deploys — and reports
  * steady-state queries/sec and per-batch latency.
  *
  * The first batch pays plan construction + codegen and is reported
  * separately (`warm_batch_sec`). Queries are corpus members' own
  * texts, so every query retrieves at least itself; the harness asserts
  * ≥1 result per query on average (a throughput number over empty
  * results would be meaningless).
  *
  * Usage: BenchLexServe [documentsParquet] [nBatches] [batchSize] [k]
  */
object BenchLexServe {
  def main(args: Array[String]): Unit = {
    val corpusPath = args.headOption.getOrElse("/root/testdata/sf0.1/documents.parquet")
    val nBatches = if (args.length > 1) args(1).toInt else 16
    val batchSize = if (args.length > 2) args(2).toInt else 64
    val k = if (args.length > 3) args(3).toInt else 5
    // Steady state excludes the warm-up batch, so one batch alone has no
    // steady sample to report.
    require(nBatches >= 2, s"nBatches must be >= 2, got $nBatches")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val corpus = spark.read.parquet(corpusPath).select("doc_id", "text")
    val nDocs = corpus.count()
    val root = java.nio.file.Files.createTempDirectory("graft_lex_serve").toString
    val store = new ParquetTableStore(spark, root)
    val tBuild0 = System.nanoTime()
    // forwardIndex: the RM3 phase gathers feedback terms through the
    // doc-sorted fwd table (pruned probe) instead of streaming the
    // postings per batch; the single-pass phases ignore it. Build cost
    // includes the extra write — the 2x-storage trade, measured.
    LexIndex.build(store, "serve", corpus, "doc_id", "text",
      forwardIndex = true)
    val buildSec = (System.nanoTime() - tBuild0) / 1e9

    // Query stream: 8-word prefixes of corpus members' texts — the
    // short-query shape a retrieval endpoint actually serves (a full
    // document as the query string would collect hundreds of terms per
    // query and measure the gather, not the serve). Each query still
    // retrieves at least its own document (it contains all its terms).
    val queryRows = corpus.limit(nBatches * batchSize)
      .as[(Long, String)].collect()
      .map { case (id, t) => (id, t.split("\\s+").take(8).mkString(" ")) }
    require(queryRows.length == nBatches * batchSize,
      s"corpus too small: ${queryRows.length} < ${nBatches * batchSize}")

    // Three phases over IDENTICAL query batches in one session: the
    // fresh-per-batch path (index tables re-resolved every micro-batch),
    // the PINNED path (LexIndex.snapshot resolved once at stream
    // start), then the RM3 two-pass path over the same pinned snapshot.
    // Each phase's first batch absorbs its own plan/codegen
    // warm-up and is excluded from steady state. ORDERING CAVEAT: the
    // pinned phase runs second and inherits JIT + page-cache warmth from
    // the fresh phase, so its delta CONFLATES pinning with second-phase
    // warm-up — read the local delta as an upper bound on the pinning
    // win; the isolated claim is only that the pin removes per-batch
    // table re-resolution (the dominant term on an object store).
    def drive(probe: (org.apache.spark.sql.DataFrame => Unit)
        => (org.apache.spark.sql.DataFrame, Long) => Unit): (Vector[Double], Long) = {
      val input = MemoryStream[(Long, String)]
      @volatile var got = 0L
      val q = input.toDF().toDF("qid", "qtext")
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
      require(got >= nBatches.toLong * batchSize,
        s"result rows $got < one per query ${nBatches.toLong * batchSize}")
      (secs, got)
    }

    val (freshSecs, freshGot) = drive(EventAnalytics.bm25ProbeEachBatch(
      store, "serve", "qid", "qtext", k = k))
    val snap = LexIndex.snapshot(store, "serve")
    val (pinnedSecs, pinnedGot) = drive(EventAnalytics.bm25ProbeEachBatchPinned(
      snap, "qid", "qtext", k = k))
    // Third phase: the RM3 TWO-PASS serve over the same pinned snapshot
    // and query batches — retrieve, expand, weighted re-retrieve per
    // micro-batch. rm3_qps / pinned_qps is the measured cost multiple of
    // closing the expansion loop (runs third, so it enjoys the same
    // warmth the pinned phase does — read the multiple, not the
    // absolute, and the per-phase warm batch is still excluded).
    val (rm3Secs, rm3Got) = drive(EventAnalytics.rm3ProbeEachBatchPinned(
      snap, "qid", "qtext", k = k))
    snap.release()
    require(pinnedGot == freshGot,
      s"pinned results $pinnedGot != fresh results $freshGot")
    require(rm3Got >= freshGot,
      s"rm3 results $rm3Got < single-pass results $freshGot")

    def r3(x: Double) = (x * 1000).round / 1000.0
    def stats(secs: Vector[Double]): (Double, Double, Double, Double) = {
      val steady = secs.tail
      val sorted = steady.sorted
      ((nBatches - 1) * batchSize / steady.sum,
        secs.head, sorted(sorted.size / 2), sorted.last)
    }
    val (qps, warm, p50, pmax) = stats(freshSecs)
    val (pQps, pWarm, pP50, pMax) = stats(pinnedSecs)
    val (rQps, rWarm, rP50, rMax) = stats(rm3Secs)
    println(s"""{"metric":"lex_serve_qps","value":${r3(qps)},""" +
      s""""unit":"queries/sec","corpus_docs":$nDocs,"batches":$nBatches,""" +
      s""""batch_size":$batchSize,"k":$k,"build_sec":${r3(buildSec)},""" +
      s""""results":$freshGot,"warm_batch_sec":${r3(warm)},""" +
      s""""steady_batch_p50_sec":${r3(p50)},""" +
      s""""steady_batch_max_sec":${r3(pmax)},""" +
      s""""pinned_qps":${r3(pQps)},"pinned_warm_batch_sec":${r3(pWarm)},""" +
      s""""pinned_batch_p50_sec":${r3(pP50)},"pinned_batch_max_sec":${r3(pMax)},""" +
      s""""rm3_qps":${r3(rQps)},"rm3_warm_batch_sec":${r3(rWarm)},""" +
      s""""rm3_batch_p50_sec":${r3(rP50)},"rm3_batch_max_sec":${r3(rMax)},""" +
      s""""rm3_results":$rm3Got}""")
    spark.stop()
  }
}
