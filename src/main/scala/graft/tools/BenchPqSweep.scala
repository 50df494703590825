package graft.tools

import graft.functions.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PQ quantization-budget sweep: recall@k and storage cost of trained
  * codebooks across (m, ksub) geometries, against exact brute-force
  * cosine as truth. The default-geometry recall (m=8, ksub=16 → 0.333
  * at sf0.1) is pinned by q_pq_recall_trained as the QUANTIZATION
  * BUDGET, not a geometry defect — this sweep proves it by spending
  * more budget on each axis: m=16 halves each subspace (finer spatial
  * resolution at 2× code bytes), ksub=256 spends 16× codewords per
  * subspace (finer codeword resolution at the same code bytes but a
  * 16× codebook). Code bytes/vector = m (one byte per code at
  * ksub ≤ 256); the codebook is a per-INDEX constant (ksub·dims·4
  * bytes), broadcast once per serve.
  *
  * Usage: BenchPqSweep [dataDir] [nQueries] [k] [trainIters]
  */
object BenchPqSweep {
  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQueries = if (args.length > 1) args(1).toInt else 64
    val k = if (args.length > 2) args(2).toInt else 3
    val iters = if (args.length > 3) args(3).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dims = 64
    val emb = spark.read.parquet(s"$dataDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val qs = emb.filter(col("vec_id") < nQueries)
    val truth = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k)
      .select("query_id", "vec_id").localCheckpoint()
    val denom = truth.count().toDouble // == nQueries * k on a dense corpus

    val rows = Seq((8, 16), (16, 16), (8, 256), (16, 256)).map { case (m, ksub) =>
      val t0 = System.nanoTime()
      val cb = Similarity.pqCodebookTrained(
        emb, "vec_id", "embedding", dims, m, ksub, iters)
      val adc = Similarity.pqAdcSearch(
        Similarity.pqEncodeWith(emb, cb, "vec_id", "embedding", dims, m),
        cb, qs, "vec_id", "embedding", dims, m, k)
        .select("query_id", "vec_id")
      val hits = truth.join(adc, Seq("query_id", "vec_id"), "left_semi").count()
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = (hits / denom * 1000).round / 1000.0
      s"""{"m":$m,"ksub":$ksub,"recall_at_$k":$recall,""" +
        s""""code_bytes_per_vector":$m,"codebook_bytes":${ksub * dims * 4},""" +
        s""""train_encode_search_sec":${(sec * 100).round / 100.0}}"""
    }
    println(s"""{"metric":"pq_budget_sweep","unit":"recall","k":$k,""" +
      s""""queries":$nQueries,"train_iters":$iters,"dims":$dims,""" +
      s""""sweep":[${rows.mkString(",")}],"sf":"$dataDir"}""")
    spark.stop()
  }
}
