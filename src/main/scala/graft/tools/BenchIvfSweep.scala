package graft.tools

import graft.functions.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** IVF probe-budget sweep — the probe twin of [[BenchPqSweep]]'s
  * compression sweep: recall@k of the probed IVF search vs exact
  * brute-force cosine, across nprobe (the serve-time knob: per-query
  * candidate volume ≈ nprobe·N/nlist) and centroid quality (the
  * deterministic lowest-id stand-in vs Lloyd's-trained — the build-time
  * knob q_knn_recall_trained pins at one point). The output is the
  * sizing curve a 100 TB deployment reads: how much recall each probed
  * partition buys, and how much of it training the coarse quantizer
  * recovers for free at serve time.
  *
  * Usage: BenchIvfSweep [dataDir] [nQueries] [k] [nlist] [trainIters]
  */
object BenchIvfSweep {
  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQueries = if (args.length > 1) args(1).toInt else 64
    val k = if (args.length > 2) args(2).toInt else 3
    val nlist = if (args.length > 3) args(3).toInt else 16
    val iters = if (args.length > 4) args(4).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dataDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val qs = emb.filter(col("vec_id") < nQueries)
    val truth = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k)
      .select("query_id", "vec_id").localCheckpoint()
    val denom = truth.count().toDouble

    val probes = Seq(1, 2, 4, 8, nlist).distinct.filter(_ <= nlist)
    val rows = for {
      trained <- Seq(false, true)
      nprobe <- probes
    } yield {
      val t0 = System.nanoTime()
      val cents =
        if (trained) Similarity.kmeansTrain(emb, "vec_id", "embedding", nlist, iters)
        else Similarity.ivfCentroids(emb, "vec_id", "embedding", nlist)
      val got = Similarity.ivfSearch(cents,
          Similarity.ivfInvertedLists(emb, cents, "vec_id", "embedding"),
          qs, "vec_id", "embedding", k, nprobe)
        .select("query_id", "vec_id")
      val hits = truth.join(got, Seq("query_id", "vec_id"), "left_semi").count()
      val sec = (System.nanoTime() - t0) / 1e9
      s"""{"trained":$trained,"nprobe":$nprobe,""" +
        s""""recall_at_$k":${(hits / denom * 1000).round / 1000.0},""" +
        s""""candidate_frac":${(nprobe.toDouble / nlist * 1000).round / 1000.0},""" +
        s""""sec":${(sec * 100).round / 100.0}}"""
    }
    println(s"""{"metric":"ivf_probe_sweep","unit":"recall","k":$k,""" +
      s""""queries":$nQueries,"nlist":$nlist,"train_iters":$iters,""" +
      s""""sweep":[${rows.mkString(",")}],"sf":"$dataDir"}""")
    spark.stop()
  }
}
