package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators (SURVEY.md §7.6).
  *
  * The Spark-side plumbing — schema, partition sizing, batched per-partition
  * processing, feature array shape — is real and tested. The codec itself is
  * a clearly marked STUB (this container has no image/audio libraries): it
  * derives deterministic pseudo-features from the payload bytes, so tests
  * can assert exact values. Swap `decodeStub` for a real codec (JNI/JavaCV)
  * without touching any dataflow.
  *
  * Scale notes: payloads dominate row size, so feature extraction
  * repartitions by total byte budget (not row count) to balance executors;
  * mapPartitions amortizes per-batch codec setup the same way mapInPandas
  * batches Arrow record batches in the PySpark equivalent.
  */
object Multimodal {

  /** One media object: payload + typed metadata. */
  case class MediaFile(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      source: String)

  /** Extracted features: fixed-width vector + decoded dimensions. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      width: Int,
      height: Int,
      features: Array[Float])

  val FeatureDim = 16

  /** STUB decoder — deterministic fake standing in for a real codec.
    * Real implementation: image -> decode+resize+channel stats,
    * audio -> PCM frame energy, video -> keyframe sample (see
    * [[sampleFrameOffsets]]). */
  def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Array[Float]) = {
    var checksum = 0L
    var i = 0
    while (i < payload.length) { checksum = (checksum * 31 + (payload(i) & 0xff)) & 0xffffffffL; i += 1 }
    val width = 16 + (checksum % 1024).toInt
    val height = 16 + ((checksum >> 10) % 1024).toInt
    val features = Array.tabulate(FeatureDim) { j =>
      val slice = if (payload.isEmpty) 0 else payload((j * 7919) % payload.length) & 0xff
      (slice / 255.0f) + (kind.hashCode % 7) * 0.001f
    }
    (width, height, features)
  }

  /** Deterministic frame-sampling offsets for a "video" payload: k byte
    * offsets spread evenly — the shape of keyframe sampling without a codec. */
  def sampleFrameOffsets(nBytes: Long, k: Int): Seq[Long] =
    if (nBytes <= 0 || k <= 0) Nil
    else (0 until k).map(i => i * nBytes / k)

  /** Batched feature extraction. Repartitions so each task holds roughly
    * `targetBytesPerTask` of payload (byte-weighted balance — row-count
    * partitioning starves/floods tasks when payload sizes vary 1000x). */
  def extractFeatures(
      media: Dataset[MediaFile],
      targetBytesPerTask: Long = 128L * 1024 * 1024): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val totalBytes = media.select(sum(length(col("payload")))).as[Option[Long]].head().getOrElse(0L)
    val parts = math.max(1, math.min(10000, (totalBytes / math.max(1, targetBytesPerTask)).toInt + 1))
    media.repartition(parts).mapPartitions { files =>
      // Per-partition codec setup would happen here (once per task).
      files.map { f =>
        val (w, h, feats) = decodeStub(f.kind, f.payload)
        var checksum = 0L
        f.payload.foreach(b => checksum = (checksum * 31 + (b & 0xff)) & 0xffffffffL)
        MediaFeatures(f.media_id, f.kind, f.payload.length.toLong, checksum, w, h, feats)
      }
    }
  }

  /** Build a media table from any (id, text) frame — test/demo payload
    * synthesis (payload = utf-8 bytes). */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): Dataset[MediaFile] = {
    import df.sparkSession.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      concat(lit("synthetic/"), col(idCol).cast("string")).as("source"))
      .as[MediaFile]
  }
}
