package graft.tools

import graft.functions.AnnIndex
import graft.io.ParquetTableStore
import graft.stream.EventAnalytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming-ANN-serve throughput record: builds a PERSISTED IVF index
  * over an embeddings corpus (cent_id-partitioned lists, the
  * [[AnnIndex.partitionSpec]] layout), then drives query micro-batches
  * through [[EventAnalytics.annProbeEachBatch]] — the exact
  * foreachBatch path a retrieval endpoint deploys — and reports
  * steady-state queries/sec and per-batch latency.
  *
  * The first batch pays plan construction + codegen and is reported
  * separately (`warm_batch_sec`); the steady-state number is what a
  * long-running serve loop sustains. Every batch's result count is
  * asserted == batchSize × k (each query has ≥k true neighbors in a
  * corpus this dense) — a throughput number over wrong/empty results
  * would be meaningless.
  *
  * Usage: BenchAnnServe [embeddingsParquet] [nBatches] [batchSize] [nlist] [nprobe]
  */
object BenchAnnServe {
  def main(args: Array[String]): Unit = {
    val corpusPath = args.headOption.getOrElse("/tmp/scale100/embeddings.parquet")
    val nBatches = if (args.length > 1) args(1).toInt else 16
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

    val corpus = spark.read.parquet(corpusPath).select("vec_id", "embedding")
    val nVec = corpus.count()
    val root = java.nio.file.Files.createTempDirectory("graft_ann_serve").toString
    val store = new ParquetTableStore(spark, root,
      partitionByCols = AnnIndex.partitionSpec("serve"))
    val tBuild0 = System.nanoTime()
    AnnIndex.buildIvf(store, "serve", corpus, "vec_id", "embedding", nlist = nlist)
    val buildSec = (System.nanoTime() - tBuild0) / 1e9

    // Query stream: corpus members (k true neighbors guaranteed), chunked
    // into micro-batches on the driver — the MemoryStream feeding pattern.
    val queryRows = corpus.limit(nBatches * batchSize)
      .as[(Long, Array[Float])].collect()
    require(queryRows.length == nBatches * batchSize,
      s"corpus too small: ${queryRows.length} < ${nBatches * batchSize}")

    val k = 3
    // Two phases over IDENTICAL query batches in one session: the
    // fresh-per-batch path (index tables re-resolved every micro-batch —
    // round-10 record), then the PINNED path (AnnIndex.ivfSnapshot
    // resolved once at stream start). Each phase's first batch absorbs
    // its own plan/codegen warm-up and is excluded from steady state.
    def drive(label: String,
        probe: (DataFrame => Unit) => (DataFrame, Long) => Unit): Vector[Double] = {
      val input = MemoryStream[(Long, Array[Float])]
      @volatile var got = 0L
      val q = input.toDF().toDF("vec_id", "embedding")
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
        s"$label result rows $got != expected ${nBatches.toLong * batchSize * k}")
      secs
    }

    val freshSecs = drive("fresh", EventAnalytics.annProbeEachBatch(
      store, "serve", "vec_id", "embedding", k = k, nprobe = nprobe))
    val snap = AnnIndex.ivfSnapshot(store, "serve")
    val pinnedSecs = drive("pinned", EventAnalytics.annProbeEachBatchPinned(
      snap, "vec_id", "embedding", k = k, nprobe = nprobe))
    snap.release()

    def r3(x: Double) = (x * 1000).round / 1000.0
    def stats(secs: Vector[Double]): (Double, Double, Double, Double) = {
      val steady = secs.tail
      val sorted = steady.sorted
      ((nBatches - 1) * batchSize / steady.sum,
        secs.head, sorted(sorted.size / 2), sorted.last)
    }
    val (qps, warm, p50, pmax) = stats(freshSecs)
    val (pQps, pWarm, pP50, pMax) = stats(pinnedSecs)
    println(s"""{"metric":"ann_serve_qps","value":${r3(qps)},""" +
      s""""unit":"queries/sec","corpus_vectors":$nVec,"batches":$nBatches,""" +
      s""""batch_size":$batchSize,"k":$k,"nlist":$nlist,"nprobe":$nprobe,"build_sec":${r3(buildSec)},""" +
      s""""warm_batch_sec":${r3(warm)},"steady_batch_p50_sec":${r3(p50)},""" +
      s""""steady_batch_max_sec":${r3(pmax)},""" +
      s""""pinned_qps":${r3(pQps)},"pinned_warm_batch_sec":${r3(pWarm)},""" +
      s""""pinned_batch_p50_sec":${r3(pP50)},"pinned_batch_max_sec":${r3(pMax)}}""")
    spark.stop()
  }
}
