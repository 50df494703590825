package graft.tools

import graft.functions.Sampling
import graft.io.ParquetTableStore
import graft.stream.EventAnalytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

/** Streaming-curation throughput record: drives document micro-batches
  * through the full ADMISSION pipeline a crawl ingest deploys —
  * [[EventAnalytics.curateStream]] (quality gate, language agreement,
  * watermarked exact dedup) feeding a foreachBatch stage that applies
  * the DSIR curated-likeness gate against a persisted fit table and
  * emits the per-batch drift alarm against a persisted baseline
  * histogram — and reports steady-state documents/sec through the
  * whole chain.
  *
  * Standing artifacts (DSIR log-ratio table, baseline histogram, and
  * the gate threshold — calibrated to the corpus's median weight, as a
  * deployment calibrates on held-out scores) are fit OFFLINE before the
  * stream starts and served from their parquet round-trip, exactly the
  * fit/serve split the operators document. The first batch pays plan
  * construction + codegen and is excluded from steady state; admitted /
  * alarm counts are reported so a throughput number over an
  * empty-output misconfiguration is visible.
  *
  * Usage: BenchCurate [documentsParquet] [nBatches] [batchSize]
  */
object BenchCurate {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/root/testdata/sf0.1/documents.parquet")
    val nBatches = if (args.length > 1) args(1).toInt else 10
    val batchSize = if (args.length > 2) args(2).toInt else 500
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = spark.read.parquet(path).select("doc_id", "text", "lang")

    // Offline fit of the standing artifacts, served from parquet.
    val root = java.nio.file.Files.createTempDirectory("graft_curate_").toString
    val store = new ParquetTableStore(spark, root)
    val tFit0 = System.nanoTime()
    store.overwrite("dsir_ratio",
      Sampling.dsirFit(docs, "text", docs.filter(col("lang") === "en"), "text"))
    store.overwrite("baseline_hist", Sampling.bucketCounts(docs, "text"))
    val ratio = store.load("dsir_ratio")
    // Standing baseline side of the per-batch drift probe, materialized
    // ONCE for the loop (the driftAlarmEachBatch shape).
    val baselineA = EventAnalytics.materializeBatch(
      store.load("baseline_hist")
        .select(col("bucket"), col("cnt").as("ca")))
    // Gate threshold = median corpus weight (admits ~half; the absolute
    // level is smoothing-dependent, so a deployment calibrates it).
    val minLogW = Sampling.dsirScore(docs, "doc_id", "text", ratio, 4096)
      .stat.approxQuantile("log_w", Array(0.5), 0.01).head
    val fitSec = (System.nanoTime() - tFit0) / 1e9

    val rows = docs.as[(Long, String, String)].collect()
      .take(nBatches * batchSize)
    require(rows.length == nBatches * batchSize,
      s"corpus too small: ${rows.length} < ${nBatches * batchSize}")
    val feed = rows.map { case (id, text, lang) =>
      (new Timestamp(1700000000000L + id), id, text, lang)
    }

    val input = MemoryStream[(Timestamp, Long, String, String)]
    val curated = EventAnalytics.curateStream(
      input.toDF().toDF("ts", "doc_id", "text", "lang"),
      "ts", "text", "lang", qualityMin = 0.3)
    @volatile var survived = 0L
    @volatile var admitted = 0L
    val alarms = scala.collection.mutable.ArrayBuffer[Double]()
    val q = curated.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // curation evaluated once per batch; released per trigger
        val b = EventAnalytics.materializeBatch(batch)
        try {
          survived += b.count()
          // LEFT join + neutral log_w = 0 — the PRODUCTION gate's exact
          // semantics (dsirGateEachBatch): a featureless doc flows
          // through the threshold, it is not silently dropped. The bench
          // must count what the gate admits, not an inner-join variant.
          admitted += b.join(
              Sampling.dsirScore(b, "doc_id", "text", ratio, 4096),
              Seq("doc_id"), "left")
            .withColumn("log_w", coalesce(col("log_w"), lit(0.0)))
            .filter(col("log_w") >= minLogW).count()
          // The batch histogram derives from the already-persisted `b`,
          // so its two consumers inside driftCountsJoin re-aggregate
          // from cache — no second curation pass, no per-batch
          // checkpoint to leak.
          val js = Sampling.driftCountsJoin(baselineA,
              Sampling.bucketCounts(b, "text", 4096)
                .select(col("bucket"), col("cnt").as("cb")))
            .select("js_divergence").as[Double].head()
          alarms.synchronized { alarms += js; () }
        } finally {
          b.unpersist()
          ()
        }
      }
      .trigger(Trigger.ProcessingTime("0 seconds"))
      .start()

    val batchSecs = feed.grouped(batchSize).map { chunk =>
      val t0 = System.nanoTime()
      input.addData(chunk.toSeq)
      q.processAllAvailable()
      (System.nanoTime() - t0) / 1e9
    }.toVector
    q.stop()

    val steady = batchSecs.tail
    val docsPerSec = (nBatches - 1) * batchSize / steady.sum
    def r3(x: Double) = (x * 1000).round / 1000.0
    val sorted = steady.sorted
    println(s"""{"metric":"curate_docs_per_sec","value":${r3(docsPerSec)},""" +
      s""""unit":"docs/sec","batches":$nBatches,"batch_size":$batchSize,""" +
      s""""fit_sec":${r3(fitSec)},"min_log_w":${r3(minLogW)},""" +
      s""""survived":$survived,"admitted":$admitted,""" +
      s""""mean_batch_js":${r3(alarms.sum / alarms.size)},""" +
      s""""warm_batch_sec":${r3(batchSecs.head)},""" +
      s""""steady_batch_p50_sec":${r3(sorted(sorted.size / 2))},""" +
      s""""steady_batch_max_sec":${r3(sorted.last)}}""")
    spark.stop()
  }
}
