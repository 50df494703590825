package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Perceptual-image-dedup scale bench over a REAL-PNG corpus
  * ([[ScaleGen.genMediaPngs]]): measures the two halves the synthetic
  * stub corpus can't —
  *
  *   - decode+hash: ImageIO decode → 9×8 luma grid → 64-bit dHash per
  *     image, behind the byte-budget repartition. Reported as images/s
  *     and MB/s/core — THE envelope for sizing a 100 TB image-dedup
  *     pass (payload bytes, not row counts, are the unit of work).
  *   - banding: the full perceptualDupPairs dataflow (hash + pigeonhole
  *     band groupBy + in-bucket exact verify). Planted re-renders (every
  *     id ≡ 1 mod 10 re-renders id-1 at a different resolution) give a
  *     known answer floor: found pairs >= planted pairs is the recall
  *     sanity gate; distinct patterns differ in ~32/64 grid bits so the
  *     bands stay selective.
  *
  * Usage: BenchMedia [nImages] [mp] — prints one JSON line (same
  * contract as the other bench mains); run ×N vs ×kN in one session for
  * the linear ratio BASELINE.md records. With `mp`, the corpus is
  * ≥1-megapixel noisy PNGs (1216×864 base, ~3 MB decoded, payload
  * incompressible — see [[ScaleGen.genMediaPngs]]): the ~650 B default
  * corpus is per-image-floor-bound, so its images/s says nothing about
  * the BYTE-bound decode rate that actually sizes
  * `targetBytesPerTask` for a 100 TB pass — the mp row records that
  * envelope (MB/s/core of real pixel decode).
  */
object BenchMedia {
  def main(args: Array[String]): Unit = {
    val mp = args.contains("mp")
    val n = args.filterNot(_ == "mp").headOption.map(_.toLong)
      .getOrElse(if (mp) 2000L else 20000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.functions.Multimodal

    // Materialize the corpus to parquet first: the bench times decode and
    // banding, not PNG synthesis.
    val dir = java.nio.file.Files.createTempDirectory("graft_media_bench").toString
    val gen = if (mp) ScaleGen.genMediaPngs(spark, n, 1216, 864, noiseAmp = 10)
              else ScaleGen.genMediaPngs(spark, n)
    gen.repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/media.parquet")
    val media = spark.read.parquet(s"$dir/media.parquet")
      .as[Multimodal.MediaFile]
    val totalBytes = media.toDF().select(sum(length(col("payload"))))
      .head().getLong(0)

    // Byte budget: default 128 MB for the floor-bound corpus; in mp mode
    // size tasks so the fan-out is ~2× cores — the default budget leaves
    // cores idle here (2.2 GB / 128 MB = 18 tasks on 32 cores) and the
    // "MB/s/core" envelope must be a SATURATED figure or it understates
    // the rate the task sizing is derived from.
    val budget =
      if (mp) math.max(16L * 1024 * 1024, totalBytes / (2 * cpus.toInt))
      else 128L * 1024 * 1024

    // warm-up (JVM/codegen), small slice
    Multimodal.perceptualHashes(media.limit(512)).queryExecution.toRdd.foreach(_ => ())

    val t0 = System.nanoTime()
    Multimodal.perceptualHashes(media, budget).queryExecution.toRdd.foreach(_ => ())
    val hashSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val pairs = Multimodal.perceptualDupPairs(media, maxHamming = 4,
      targetBytesPerTask = budget)
    val found = pairs.count() // count() fine: the aggregate needs the full pair set
    val pairSec = (System.nanoTime() - t1) / 1e9

    val planted = (1L until n).count(i => i % 10 == 1)
    val mbPerSecPerCore =
      totalBytes / 1e6 / hashSec / cpus.toDouble
    println(s"""{"metric":"media_phash_bench","value":$hashSec,"unit":"sec",""" +
      s""""megapixel":$mp,""" +
      s""""images":$n,"total_mb":${(totalBytes / 1e6 * 100).round / 100.0},""" +
      s""""decode_hash_sec":$hashSec,"images_per_sec":${(n / hashSec).round},""" +
      s""""mb_per_sec_per_core":${(mbPerSecPerCore * 1000).round / 1000.0},""" +
      s""""task_budget_mb":${budget / 1024 / 1024},""" +
      s""""band_pairs_sec":$pairSec,"found_pairs":$found,"planted_pairs":$planted,""" +
      s""""recall_ok":${found >= planted}}""")
    spark.stop()
    if (found < planted) sys.exit(1)
  }
}
