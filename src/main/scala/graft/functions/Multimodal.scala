package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators (SURVEY.md §7.6).
  *
  * The codec tiers are:
  *   - `kind = "image"`: REAL decode via the JDK's `javax.imageio`
  *     (PNG/JPEG/GIF/BMP — no external dependency): true width/height and
  *     per-channel mean/std + luminance histogram features.
  *   - `kind = "audio"`: REAL decode via the JDK's `javax.sound.sampled`
  *     (WAV/AIFF PCM): true frame count/channels and windowed RMS + peak
  *     envelope features.
  *   - `kind = "video"` (no JDK codec exists) and any payload the JDK
  *     decoders reject: a clearly-marked deterministic fallback
  *     ([[decodeStub]]) derives pseudo-features from the payload bytes, so
  *     the dataflow stays total and tests can assert exact values. Swap in
  *     a JNI/JavaCV codec without touching any dataflow.
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

  /** Full decode dispatch: real JDK codecs first, deterministic stub
    * fallback for undecodable payloads. Total — never throws on garbage
    * bytes (a corrupt crawl payload must not kill a 100 TB job). */
  def decode(kind: String, payload: Array[Byte]): (Int, Int, Array[Float]) =
    (kind match {
      case "image" => decodeImage(payload)
      case "audio" => decodeAudio(payload)
      case "video" => decodeVideo(payload)
      case _ => None
    }).getOrElse(decodeStub(kind, payload))

  /** REAL image decode via `javax.imageio` (PNG/JPEG/GIF/BMP): returns
    * (width, height, features) where features =
    * [rMean, gMean, bMean, lumaMean, rStd, gStd, bStd, lumaStd,
    *  8-bin luma histogram fractions], all in [0,1]. None when the payload
    * is not a decodable image. Exact integer sums, so the result is
    * bit-deterministic across partitionings and JVMs. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      javax.imageio.ImageIO.setUseCache(false) // in-memory streams, no tmp files
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val n = w.toLong * h
        val sum = new Array[Long](4)      // r, g, b, luma
        val sumSq = new Array[Long](4)
        val hist = new Array[Long](8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            val luma = (r * 299 + g * 587 + b * 114) / 1000
            sum(0) += r; sum(1) += g; sum(2) += b; sum(3) += luma
            sumSq(0) += r.toLong * r; sumSq(1) += g.toLong * g
            sumSq(2) += b.toLong * b; sumSq(3) += luma.toLong * luma
            hist(luma >> 5) += 1
            x += 1
          }
          y += 1
        }
        val feats = new Array[Float](FeatureDim)
        var c = 0
        while (c < 4) {
          val mean = sum(c).toDouble / n
          feats(c) = (mean / 255.0).toFloat
          feats(c + 4) =
            (math.sqrt(math.max(0.0, sumSq(c).toDouble / n - mean * mean)) / 255.0).toFloat
          c += 1
        }
        var bin = 0
        while (bin < 8) { feats(8 + bin) = (hist(bin).toDouble / n).toFloat; bin += 1 }
        Some((w, h, feats))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL audio decode via `javax.sound.sampled` (WAV/AIFF, 8/16-bit PCM):
    * returns (frameCount, channels, features) where features = 8 windowed
    * RMS values + 8 windowed peak values over the first channel, normalized
    * to [0,1]. None when the payload is not a decodable PCM stream. */
  def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val bits = fmt.getSampleSizeInBits
        val channels = fmt.getChannels
        if (bits != 8 && bits != 16) None
        else {
          val raw = ais.readAllBytes()
          val bytesPerSample = bits / 8
          val frameBytes = bytesPerSample * channels
          val nFrames = raw.length / frameBytes
          if (nFrames == 0) None
          else {
            // First channel only; window the frame axis into 8 equal spans.
            val windows = 8
            val sumSq = new Array[Double](windows)
            val peak = new Array[Double](windows)
            val cnt = new Array[Long](windows)
            val bigEndian = fmt.isBigEndian
            var f = 0
            while (f < nFrames) {
              val base = f * frameBytes
              val s =
                if (bits == 8) ((raw(base) & 0xff) - 128) / 128.0
                else {
                  val (b0, b1) = if (bigEndian) (raw(base), raw(base + 1))
                    else (raw(base + 1), raw(base))
                  ((b0 << 8) | (b1 & 0xff)).toShort / 32768.0
                }
              val wIdx = (f.toLong * windows / nFrames).toInt
              sumSq(wIdx) += s * s
              if (math.abs(s) > peak(wIdx)) peak(wIdx) = math.abs(s)
              cnt(wIdx) += 1
              f += 1
            }
            val feats = new Array[Float](FeatureDim)
            var wIdx = 0
            while (wIdx < windows) {
              feats(wIdx) =
                if (cnt(wIdx) == 0) 0f else math.sqrt(sumSq(wIdx) / cnt(wIdx)).toFloat
              feats(8 + wIdx) = peak(wIdx).toFloat
              wIdx += 1
            }
            Some((nFrames, channels, feats))
          }
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL multi-frame decode via `javax.imageio`'s sequence readers
    * (animated GIF is the JDK's natively decodable video-like container):
    * returns (width, height, features) where features = mean luma of 8
    * evenly-sampled frames followed by the 8 absolute deltas between
    * consecutive sampled frames (a motion-energy envelope — the keyframe
    * sampling shape of [[sampleFrameOffsets]] over real decoded frames).
    * None for single-frame or undecodable payloads (MP4 et al. need an
    * external codec and take the stub path). */
  def decodeVideo(payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); return None }
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val nFrames = reader.getNumImages(true)
        if (nFrames < 2) return None // single image: not a frame sequence
        // 8 evenly-spread sample slots (with repetition when nFrames < 8 —
        // the envelope always has the full width); each distinct frame is
        // decoded once.
        val sampled = sampleFrameOffsets(nFrames.toLong, 8).map(_.toInt)
        val byFrame = sampled.distinct.map { idx =>
          val img = reader.read(idx)
          val w = img.getWidth
          val h = img.getHeight
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              x += 1
            }
            y += 1
          }
          idx -> ((w, h, sum.toDouble / (w.toLong * h) / 255.0))
        }.toMap
        val lumas = sampled.map(byFrame)
        val feats = new Array[Float](FeatureDim)
        lumas.zipWithIndex.foreach { case ((_, _, l), i) => feats(i) = l.toFloat }
        (1 until lumas.length).foreach { i =>
          feats(8 + i - 1) = math.abs(lumas(i)._3 - lumas(i - 1)._3).toFloat
        }
        Some((lumas.head._1, lumas.head._2, feats))
      } finally { reader.dispose(); iis.close() }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic fallback decoder for payloads no JDK codec accepts
    * (e.g. MP4/WebM video, corrupt bytes): pseudo-features from the payload
    * bytes, loudly NOT a real decode. Swap for JNI/JavaCV at deploy. */
  def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val checksum = payloadChecksum(payload)
    val width = 16 + (checksum % 1024).toInt
    val height = 16 + ((checksum >> 10) % 1024).toInt
    val features = Array.tabulate(FeatureDim) { j =>
      val slice = if (payload.isEmpty) 0 else payload((j * 7919) % payload.length) & 0xff
      (slice / 255.0f) + (kind.hashCode % 7) * 0.001f
    }
    (width, height, features)
  }

  /** 32-bit rolling payload checksum `(acc*31 + byte) mod 2^32` — the
    * shared stub identity of [[decodeStub]], [[extractFeatures]] and the
    * perceptual-hash fallback; DuckDB mirrors it exactly (hex-byte
    * list_reduce), which is what makes the stub paths oracle-able. */
  def payloadChecksum(payload: Array[Byte]): Long = {
    var checksum = 0L
    var i = 0
    while (i < payload.length) {
      checksum = (checksum * 31 + (payload(i) & 0xff)) & 0xffffffffL
      i += 1
    }
    checksum
  }

  /** Area-averaged luma grid (gw × gh cells) of a decodable image —
    * integer arithmetic only (per-cell luma sum / pixel count), so the
    * grid is bit-deterministic across JVMs and partitionings. None for
    * undecodable payloads or images smaller than the grid. */
  def lumaGrid(payload: Array[Byte], gw: Int, gh: Int): Option[Array[Int]] =
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth < gw || img.getHeight < gh) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val grid = new Array[Int](gw * gh)
        var r = 0
        while (r < gh) {
          val y0 = r * h / gh
          val y1 = (r + 1) * h / gh
          var c = 0
          while (c < gw) {
            val x0 = c * w / gw
            val x1 = (c + 1) * w / gw
            var sum = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                  (rgb & 0xff) * 114) / 1000
                x += 1
              }
              y += 1
            }
            grid(r * gw + c) = (sum / ((y1 - y0).toLong * (x1 - x0))).toInt
            c += 1
          }
          r += 1
        }
        Some(grid)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** 64-bit dHash (difference hash) — THE standard perceptual near-dup
    * fingerprint for images: a 9×8 luma grid, bit (r·8+c) set iff
    * grid(r,c) < grid(r,c+1). Robust to re-encoding, resizing, and mild
    * brightness shifts (gradients survive what absolute values don't).
    * None for undecodable payloads. */
  def dHash(payload: Array[Byte]): Option[Long] =
    lumaGrid(payload, 9, 8).map { g =>
      var hash = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          if (g(r * 9 + c) < g(r * 9 + c + 1)) hash |= 1L << (r * 8 + c)
          c += 1
        }
        r += 1
      }
      hash
    }

  /** 64-bit aHash (average hash): 8×8 luma grid, bit set iff the cell is
    * strictly brighter than the integer grid mean. Cruder than [[dHash]]
    * (absolute brightness sensitive) but cheaper to reason about; kept as
    * the second opinion a duplicate-review pass cross-checks. */
  def aHash(payload: Array[Byte]): Option[Long] =
    lumaGrid(payload, 8, 8).map { g =>
      val mean = g.foldLeft(0L)(_ + _) / 64
      var hash = 0L
      var i = 0
      while (i < 64) {
        if (g(i) > mean) hash |= 1L << i
        i += 1
      }
      hash
    }

  /** Total perceptual hash: real dHash for decodable images; the
    * deterministic [[payloadChecksum]] stub (32-bit, zero-extended) for
    * everything else — same totality contract as [[decode]] (a corrupt
    * payload must not kill a 100 TB job), and the stub branch is what the
    * DuckDB oracle replays over the synthetic text-payload corpus. */
  def perceptualHash(kind: String, payload: Array[Byte]): Long =
    (if (kind == "image") dHash(payload) else None)
      .getOrElse(payloadChecksum(payload))

  /** Per-media perceptual hashes `(media_id, kind, phash, decoded)` with
    * the same byte-budget repartition as [[extractFeatures]]. `decoded`
    * marks a REAL image [[dHash]] (64-bit); false means the 32-bit
    * [[payloadChecksum]] stub — downstream banding MUST NOT mix the two
    * families (see [[perceptualDupPairs]] / [[checksumDupPairs]]). */
  def perceptualHashes(
      media: Dataset[MediaFile],
      targetBytesPerTask: Long = 128L * 1024 * 1024): DataFrame = {
    import media.sparkSession.implicits._
    val totalBytes = media.select(sum(length(col("payload")))).as[Option[Long]].head().getOrElse(0L)
    val parts = math.max(1, math.min(10000, (totalBytes / math.max(1, targetBytesPerTask)).toInt + 1))
    media.repartition(parts).mapPartitions { files =>
      files.map { f =>
        val real = if (f.kind == "image") dHash(f.payload) else None
        (f.media_id, f.kind, real.getOrElse(payloadChecksum(f.payload)), real.isDefined)
      }
    }.toDF("media_id", "kind", "phash", "decoded")
  }

  /** Perceptual image near-duplicate pairs with EXACT hamming-≤k recall:
    * [[dHash]] per image, then [[Dedup.hammingPairs]] pigeonhole banding
    * (k+1 bit-bands; two hashes within hamming k must agree on one band)
    * — candidates are a band equi-join, never all-pairs, and the
    * in-bucket `bit_count(xor)` verify makes recall exact, exactly like
    * the text SimHash path.
    *
    * ONLY real 64-bit dHashes are banded: non-image rows and undecodable
    * images carry the 32-bit checksum stub, whose upper bits are all zero
    * — mixed into 64-bit bands, every stub row would collide on bkey=0 in
    * the high bands (one degenerate bucket, quadratic in the stub
    * population — exactly the band-saturation hazard), and cross-kind
    * checksum collisions would masquerade as image near-dups. Stub-hash
    * near-collisions are a different (per-kind, 32-bit) question answered
    * by [[checksumDupPairs]]. */
  def perceptualDupPairs(
      media: Dataset[MediaFile],
      maxHamming: Int = 3,
      targetBytesPerTask: Long = 128L * 1024 * 1024): DataFrame =
    Dedup.hammingPairs(
      perceptualHashes(media, targetBytesPerTask)
        .filter(col("kind") === "image" && col("decoded")),
      "media_id", "phash", bits = 64, maxHamming = maxHamming)

  /** Windowed mean-square energy of the first channel over `nWindows`
    * equal spans — the audio twin of [[lumaGrid]] (same PCM walk as
    * [[decodeAudio]], parameterized window count). Deterministic: same
    * bytes → same doubles on any JVM/partitioning. */
  private def windowedMeanSquare(
      payload: Array[Byte], nWindows: Int): Option[Array[Double]] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val bits = fmt.getSampleSizeInBits
        val channels = fmt.getChannels
        if (bits != 8 && bits != 16) None
        else {
          val raw = ais.readAllBytes()
          val bytesPerSample = bits / 8
          val frameBytes = bytesPerSample * channels
          val nFrames = raw.length / frameBytes
          if (nFrames < nWindows) None
          else {
            val sumSq = new Array[Double](nWindows)
            val cnt = new Array[Long](nWindows)
            val bigEndian = fmt.isBigEndian
            var f = 0
            while (f < nFrames) {
              val base = f * frameBytes
              val s =
                if (bits == 8) ((raw(base) & 0xff) - 128) / 128.0
                else {
                  val (b0, b1) = if (bigEndian) (raw(base), raw(base + 1))
                    else (raw(base + 1), raw(base))
                  ((b0 << 8) | (b1 & 0xff)).toShort / 32768.0
                }
              val wIdx = (f.toLong * nWindows / nFrames).toInt
              sumSq(wIdx) += s * s
              cnt(wIdx) += 1
              f += 1
            }
            val ms = new Array[Double](nWindows)
            var i = 0
            while (i < nWindows) {
              ms(i) = if (cnt(i) == 0) 0.0 else sumSq(i) / cnt(i)
              i += 1
            }
            Some(ms)
          }
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** 64-bit audio fingerprint — [[dHash]]'s difference-hash idea applied
    * to the ENERGY ENVELOPE (the chromaprint/echoprint family reduced to
    * its deterministic core): 65 windowed mean-square energies over the
    * first channel, bit i set iff window i+1 is louder than window i.
    * Comparing energies (not their square roots — sqrt is monotone, so
    * the bits are identical and one transcendental per window is saved)
    * makes the hash VOLUME-INVARIANT: uniform amplitude scaling
    * multiplies every window by the same factor and preserves every
    * comparison, so a re-normalized copy of a track collides exactly
    * (spec-pinned). None for undecodable payloads or clips shorter than
    * 65 frames. */
  def audioHash(payload: Array[Byte]): Option[Long] =
    windowedMeanSquare(payload, 65).map { ms =>
      var h = 0L
      var i = 0
      while (i < 64) {
        if (ms(i + 1) > ms(i)) h |= (1L << i)
        i += 1
      }
      h
    }

  /** Audio near-duplicate pairs with EXACT hamming-≤k recall — the audio
    * twin of [[perceptualDupPairs]]: [[audioHash]] per decodable audio
    * row, then the shared [[Dedup.hammingPairs]] pigeonhole banding.
    * Undecodable/non-audio rows are excluded (never mixed into the
    * 64-bit bands — the stub-saturation hazard documented on the image
    * path). */
  def audioDupPairs(
      media: Dataset[MediaFile],
      maxHamming: Int = 3,
      targetBytesPerTask: Long = 128L * 1024 * 1024): DataFrame = {
    import media.sparkSession.implicits._
    // Byte budget sized over the AUDIO rows only (the rows this path
    // decodes) — a corpus dominated by video payloads must not inflate
    // the partition count of the audio decode stage.
    val audio = media.filter(col("kind") === "audio")
    val totalBytes = audio.select(sum(length(col("payload"))))
      .as[Option[Long]].head().getOrElse(0L)
    val parts = math.max(1, math.min(10000,
      (totalBytes / math.max(1, targetBytesPerTask)).toInt + 1))
    val hashes = audio
      .repartition(parts).mapPartitions { files =>
        files.flatMap(f => audioHash(f.payload).map(h => (f.media_id, h)))
      }.toDF("media_id", "ahash")
    Dedup.hammingPairs(hashes, "media_id", "ahash",
      bits = 64, maxHamming = maxHamming)
  }

  /** Payload-checksum near-collision pairs over the NON-decodable rows —
    * the honest counterpart of [[perceptualDupPairs]] for stub-hashed
    * payloads (video, undecodable bytes): the 32-bit [[payloadChecksum]]
    * banded at its true width, with `kind` in the band group key so an
    * audio/image checksum collision is never reported as a same-media
    * near-dup. Exact hamming-≤k recall within each kind; also the
    * DuckDB-oracle-able witness for the banding core over synthetic
    * text-payload corpora (a real dHash needs a JDK decode the oracle
    * can't replay). */
  def checksumDupPairs(
      media: Dataset[MediaFile],
      maxHamming: Int = 3,
      targetBytesPerTask: Long = 128L * 1024 * 1024): DataFrame =
    Dedup.hammingPairs(
      perceptualHashes(media, targetBytesPerTask).filter(!col("decoded")),
      "media_id", "phash", bits = 32, maxHamming = maxHamming,
      extraKeys = Seq("kind"))

  /** Deterministic frame-sampling offsets for a "video" payload: k byte
    * offsets spread evenly — the shape of keyframe sampling without a codec. */
  def sampleFrameOffsets(nBytes: Long, k: Int): Seq[Long] =
    if (nBytes <= 0 || k <= 0) Nil
    else (0 until k).map(i => i * nBytes / k)

  /** REAL image resize via the JDK (ImageIO decode -> Graphics2D bilinear
    * scale -> PNG re-encode). None for undecodable payloads. Deterministic:
    * bilinear interpolation and the JDK PNG encoder are pure functions of
    * the pixel data, so the resized bytes are stable across partitionings
    * and reruns (the idempotency a re-ingested shard depends on). */
  def resizeImage(payload: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] =
    try {
      require(targetW > 0 && targetH > 0)
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(
          targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          // RGBA/palette-transparency sources: composite onto an explicit
          // white background (the training-data convention) instead of the
          // TYPE_INT_RGB default of silently flattening alpha onto black
          g.setColor(java.awt.Color.WHITE)
          g.fillRect(0, 0, targetW, targetH)
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, targetW, targetH, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Dataset-level resize normalization (the standardize-before-training
    * step): image payloads are resized and re-encoded; non-images and
    * undecodable payloads pass through untouched (total — a corrupt crawl
    * payload must not kill the job). Same byte-budget repartition as
    * [[extractFeatures]]: payload bytes, not row counts, balance tasks. */
  def resizeImages(
      media: Dataset[MediaFile],
      targetW: Int,
      targetH: Int,
      targetBytesPerTask: Long = 128L * 1024 * 1024): Dataset[MediaFile] = {
    import media.sparkSession.implicits._
    val totalBytes = media.select(sum(length(col("payload")))).as[Option[Long]].head().getOrElse(0L)
    val parts = math.max(1, math.min(10000, (totalBytes / math.max(1, targetBytesPerTask)).toInt + 1))
    media.repartition(parts).mapPartitions { files =>
      files.map { f =>
        if (f.kind != "image") f
        else resizeImage(f.payload, targetW, targetH)
          .map(p => f.copy(payload = p)).getOrElse(f)
      }
    }
  }

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
        val (w, h, feats) = decode(f.kind, f.payload)
        MediaFeatures(f.media_id, f.kind, f.payload.length.toLong,
          payloadChecksum(f.payload), w, h, feats)
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
