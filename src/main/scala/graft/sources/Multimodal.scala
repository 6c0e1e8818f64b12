package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary
  * payloads with typed metadata, processed by batched partition-local
  * feature extraction.
  *
  * Decode is REAL where the runtime has a codec and an honest stub
  * where it does not: image payloads carrying a JDK-decodable format
  * (PNG/JPEG/GIF/BMP — `javax.imageio` ships with Java SE, no extra
  * dependency) decode to pixel statistics, and WAV audio decodes to
  * bounded sample statistics via `javax.sound.sampled` (also Java SE);
  * anything else (compressed audio, video, or bytes no reader accepts)
  * falls back to a deterministic fake so the pipeline shape stays
  * testable in a codec-less container. The `codec` column records
  * which path ran. Everything Spark-side (schema, encoders, partition
  * batching, feature layout) is real and tested either way.
  *
  * Scale posture: payloads never pass through a shuffle (extraction is
  * a narrow mapPartitions directly over the scan); detection is a
  * magic-byte check before any reader spins up; feature vectors are
  * small fixed-width arrays; metadata lives in plain columns so
  * filters (modality, size) push down to parquet without touching the
  * binary blob.
  */
object Multimodal {

  case class MediaRecord(
      media_id: Long,
      modality: String,
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int)

  case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Int,
      checksum: Long,
      checksum_md5: String,
      codec: String,
      features: Array[Float])

  implicit val mediaRecordEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit val mediaFeaturesEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Build a media table from the documents corpus (payload = utf-8
    * bytes standing in for an encoded image/audio blob). */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("modality"),
        encode(col("text"), "UTF-8").as("payload"),
        (col("doc_id") % 640 + 32).cast("int").as("width"),
        (col("doc_id") % 480 + 32).cast("int").as("height"),
        lit(16000).as("sample_rate"))
      .as[MediaRecord]
  }

  /** Content checksum (FNV-style rolling hash) — shared by both decode
    * paths so identity tracking never depends on codec availability. */
  private def payloadChecksum(payload: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = h * 31 + payload(i); i += 1 }
    h
  }

  /** Cross-engine content checksum: lowercase hex md5 of the payload
    * bytes — the manifest identity an external system (or the DuckDB
    * oracle) can recompute, alongside the cheap in-pipeline FNV. */
  private def payloadMd5(payload: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(payload)
      .map("%02x".format(_)).mkString

  // ---------------------------------------------------------------
  // STUB DECODE: deterministic fake for payloads with no runtime
  // codec (audio/video, or image bytes no ImageIO reader accepts).
  // ---------------------------------------------------------------
  private def stubFeatures(checksum: Long, dim: Int): Array[Float] =
    Array.tabulate(dim)(j => ((checksum >>> (j * 7)) & 0xFF).toFloat / 255f)

  /** Magic-byte image sniff: only payloads that LOOK like a
    * JDK-decodable format pay the ImageIO reader lookup. */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') || // PNG
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte) || // JPEG
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||          // GIF
      (p(0) == 'B' && p(1) == 'M'))                                          // BMP

  /** Pixel statistics over a stride-sampled grid (≤ 64×64 probes, so
    * cost is bounded regardless of resolution): normalized dims, mean
    * RGB, mean/stddev luma, aspect — cycled to `dim` slots. */
  private def imageFeatures(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val sx = math.max(1, w / 64)
    val sy = math.max(1, h / 64)
    var n = 0L
    var sr, sg, sb, sl, sl2 = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xFF
        val g = (rgb >> 8) & 0xFF
        val b = rgb & 0xFF
        val l = 0.299 * r + 0.587 * g + 0.114 * b
        sr += r; sg += g; sb += b; sl += l; sl2 += l * l; n += 1
        x += sx
      }
      y += sy
    }
    val lumaVar = math.max(0.0, sl2 / n - (sl / n) * (sl / n))
    val base = Array(
      math.min(1.0, w / 4096.0), math.min(1.0, h / 4096.0),
      sr / n / 255.0, sg / n / 255.0, sb / n / 255.0,
      sl / n / 255.0, math.sqrt(lumaVar) / 255.0,
      w.toDouble / (w + h))
    Array.tabulate(dim)(i => base(i % base.length).toFloat)
  }

  /** Decoded-size cap: a crafted "decompression bomb" (tiny file,
    * enormous pixel grid) would otherwise materialize gigabytes in one
    * executor — a 100 TB crawl WILL contain one. 64M pixels ≈ 256 MB
    * ARGB, bounded per record. */
  private val MaxPixels = 64L * 1024 * 1024

  /** Frame-count cap, the audio analog of [[MaxPixels]]: a header
    * claiming absurd frame counts (the WAV bomb — tiny file, huge
    * declared data chunk) is rejected before any sample is read. */
  private val MaxAudioFrames = 16L * 1024 * 1024

  /** Magic-byte WAV sniff (RIFF....WAVE): only payloads that look like
    * the one audio container the JDK decodes natively pay the
    * AudioSystem reader lookup. */
  private def looksLikeWav(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** Real WAV decode via `javax.sound.sampled` (ships with Java SE,
    * like ImageIO): header-only format/frame-count read first (the
    * bomb guard costs a few bytes of parsing), then bounded, STRIDED
    * sample statistics — ≤ 64 probe windows of ≤ 4096 frames each, so
    * cost is bounded regardless of duration. Features: sample rate,
    * channels, bit depth, duration, RMS, peak, zero-crossing rate —
    * cycled to `dim` slots. PCM 8/16-bit only (the JDK's native WAV
    * support); anything else falls back to the stub. */
  private def wavFeatures(payload: Array[Byte], dim: Int): Option[Array[Float]] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val aff = AudioSystem.getAudioFileFormat(new java.io.ByteArrayInputStream(payload))
    val fmt = aff.getFormat
    val frames = aff.getFrameLength.toLong
    val bits = fmt.getSampleSizeInBits
    val pcm = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED ||
      fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
    if (frames <= 0 || frames > MaxAudioFrames || !pcm || (bits != 8 && bits != 16))
      return None
    val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
    try {
      val frameSize = fmt.getFrameSize
      val windowFrames = 4096L
      val windows = 64L
      // stride so ≤ windows probe windows cover the whole stream
      val strideFrames =
        math.max(0L, (frames - windows * windowFrames) / windows)
      val buf = new Array[Byte]((windowFrames * frameSize).toInt)
      var n = 0L
      var sum2 = 0.0
      var peak = 0.0
      var crossings = 0L
      var prevNeg = false
      var first = true
      var eof = false
      while (!eof) {
        var read = 0
        var r = 0
        while (read < buf.length && r >= 0) {
          r = ais.read(buf, read, buf.length - read)
          if (r > 0) read += r
        }
        if (r < 0) eof = true
        var i = 0
        while (i + (bits / 8) <= read) {
          // every channel's samples contribute to the same statistics
          val s =
            if (bits == 8) {
              if (fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED)
                ((buf(i) & 0xFF) - 128) / 128.0
              else buf(i) / 128.0
            } else {
              val lo = if (fmt.isBigEndian) buf(i + 1) else buf(i)
              val hi = if (fmt.isBigEndian) buf(i) else buf(i + 1)
              ((hi << 8) | (lo & 0xFF)) / 32768.0
            }
          val neg = s < 0
          if (!first && neg != prevNeg) crossings += 1
          prevNeg = neg
          first = false
          sum2 += s * s
          if (math.abs(s) > peak) peak = math.abs(s)
          n += 1
          i += bits / 8
        }
        if (!eof && strideFrames > 0) {
          var toSkip = strideFrames * frameSize
          while (toSkip > 0 && !eof) {
            val skipped = ais.skip(toSkip)
            if (skipped <= 0) eof = true else toSkip -= skipped
          }
        }
      }
      if (n == 0) None
      else {
        val rms = math.sqrt(sum2 / n)
        val durationSec = frames / fmt.getFrameRate.toDouble
        val base = Array(
          math.min(1.0, fmt.getSampleRate / 48000.0),
          math.min(1.0, fmt.getChannels / 8.0),
          bits / 32.0,
          math.min(1.0, durationSec / 3600.0),
          rms, peak,
          crossings.toDouble / n,
          math.min(1.0, frames / MaxAudioFrames.toDouble))
        Some(Array.tabulate(dim)(i => base(i % base.length).toFloat))
      }
    } finally ais.close()
  }

  /** Header-only dimension read (no pixel decode), so the bomb check
    * costs a few bytes of parsing, not the decode it guards against. */
  private def headerPixels(payload: Array[Byte]): Option[Long] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          Some(reader.getWidth(0).toLong * reader.getHeight(0))
        } finally reader.dispose()
      }
    } finally iis.close()
  }

  /** Decode one record: real ImageIO path when the payload sniffs as a
    * decodable image within the size cap, real AudioSystem path for
    * WAV within the frame cap, deterministic stub otherwise. */
  /** Guarded in-memory image decode shared by feature extraction and
    * perceptual fingerprinting: magic-byte sniff, header-only bomb
    * check, then the ImageIO read — None on any failure. */
  private def decodeImage(payload: Array[Byte])
      : Option[java.awt.image.BufferedImage] =
    if (!looksLikeImage(payload)) None
    else try {
      // in-memory streams only — never let ImageIO spill a disk cache
      javax.imageio.ImageIO.setUseCache(false)
      headerPixels(payload).filter(px => px > 0 && px <= MaxPixels).flatMap { _ =>
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private[sources] def decodeOne(r: MediaRecord, dim: Int): MediaFeatures = {
    val checksum = payloadChecksum(r.payload)
    val real: Option[(String, Array[Float])] =
      if (r.modality == "image") {
        decodeImage(r.payload).map(img => ("imageio", imageFeatures(img, dim)))
      } else if (r.modality == "audio" && looksLikeWav(r.payload)) {
        try wavFeatures(r.payload, dim).map(("wav", _))
        catch { case scala.util.control.NonFatal(_) => None }
      } else None
    val md5 = payloadMd5(r.payload)
    real match {
      case Some((codec, f)) =>
        MediaFeatures(r.media_id, r.modality, r.payload.length, checksum, md5,
          codec, f)
      case None =>
        MediaFeatures(r.media_id, r.modality, r.payload.length, checksum, md5,
          "stub", stubFeatures(checksum, dim))
    }
  }

  /** Batched partition-local feature extraction over the binary
    * payloads — the mapInPandas-style batch shape, as a narrow op. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 8): Dataset[MediaFeatures] =
    media.mapPartitions(_.map(decodeOne(_, dim)))

  // ---------------------------------------------------------------
  // PERCEPTUAL IMAGE FINGERPRINTS (aHash / dHash, the average-hash
  // and difference-hash of Krawetz's pHash family — public
  // algorithms) — the image face of the near-dup family: re-encoding,
  // lossless resizing, and uniform brightness shifts leave the 64-bit
  // fingerprints unchanged, so a hamming-bucket join (the text
  // SimHash machinery, Dedup.fingerprintPairs) finds image
  // near-copies without any all-pairs comparison.
  // ---------------------------------------------------------------

  case class MediaFingerprint(
      media_id: Long, codec: String, ahash: Long, dhash: Long)
  implicit val mediaFingerprintEnc: Encoder[MediaFingerprint] =
    Encoders.product[MediaFingerprint]

  /** Probes per cell axis: each grid cell averages S×S luma probes at
    * FIXED FRACTIONAL positions of the whole image. */
  private val GridProbes = 4

  /** The luma grid behind both hashes: `gw`×`gh` cells, each the mean
    * of S×S probes at fixed fractional coordinates — probe pixel
    * x = floor(((cx·S + i)·2 + 1) · w / (gw·S·2)), all long integer
    * math. The nested-floor identity floor(floor(q·w·k/D)/k) =
    * floor(q·w/D) makes the probed ORIGINAL pixel independent of any
    * k× pixel replication, so a replicated upscale yields the
    * bit-identical grid (spec-pinned); cost is gw·gh·S² probes,
    * bounded regardless of resolution. Luma is the integer
    * 299r+587g+114b — no floats anywhere. */
  private def lumaGrid(
      img: java.awt.image.BufferedImage, gw: Int, gh: Int): Array[Long] = {
    val w = img.getWidth.toLong
    val h = img.getHeight.toLong
    val s = GridProbes
    Array.tabulate(gw * gh) { idx =>
      val cx = idx % gw
      val cy = idx / gw
      var sum = 0L
      var j = 0
      while (j < s) {
        val y = (((cy * s + j) * 2L + 1) * h / (gh * s * 2L)).toInt
        var i = 0
        while (i < s) {
          val x = (((cx * s + i) * 2L + 1) * w / (gw * s * 2L)).toInt
          val rgb = img.getRGB(x, y)
          sum += 299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
            114L * (rgb & 0xFF)
          i += 1
        }
        j += 1
      }
      sum / (s * s)
    }
  }

  /** aHash: 8×8 grid, bit j set iff cell j's luma is above the grid
    * mean — brightness-shift- and re-encode-invariant. */
  private[sources] def aHash(img: java.awt.image.BufferedImage): Long = {
    val g = lumaGrid(img, 8, 8)
    val mean = g.sum / 64
    var bits = 0L
    var j = 0
    while (j < 64) { if (g(j) > mean) bits |= (1L << j); j += 1 }
    bits
  }

  /** dHash: 9×8 grid, bit set iff the right neighbor is brighter —
    * the horizontal-gradient sign, robust where flat regions make
    * aHash bits arbitrary. */
  private[sources] def dHash(img: java.awt.image.BufferedImage): Long = {
    val g = lumaGrid(img, 9, 8)
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x + 1) > g(y * 9 + x)) bits |= (1L << (y * 8 + x))
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Per-record perceptual fingerprints: real decode where the payload
    * carries a JDK-decodable image (codec "imageio"), the honest
    * deterministic checksum-derived stub otherwise (codec "stub" — a
    * stub fingerprint only ever hamming-matches an exact byte copy,
    * never a perceptual near-copy; the codec column keeps the two
    * regimes distinguishable downstream, the q_multimodal_features
    * posture). A narrow mapPartitions over the scan: payloads never
    * cross a shuffle. */
  def imageFingerprints(media: Dataset[MediaRecord]): Dataset[MediaFingerprint] =
    media.mapPartitions(_.map { r =>
      val checksum = payloadChecksum(r.payload)
      decodeImage(r.payload) match {
        case Some(img) =>
          MediaFingerprint(r.media_id, "imageio", aHash(img), dHash(img))
        case None =>
          // two independent 64-bit mixes of the content checksum
          MediaFingerprint(r.media_id, "stub",
            checksum * 0x9E3779B97F4A7C15L,
            java.lang.Long.reverse(checksum) * 0xC2B2AE3D27D4EB4FL)
      }
    })

  /** Image near-duplicate pairs over a fingerprint frame — the
    * [[graft.operators.Dedup.simhashPairs]] machinery pointed at
    * dHash: 16-bit chunk buckets (capped; meter first with
    * [[graft.operators.Dedup.fingerprintBucketOccupancy]]), exact
    * hamming verify on BOTH hashes (dHash gates at `maxHamming`,
    * aHash rides as corroboration). RECALL BOUND: the 4×16-bit chunk
    * LSH guarantees a shared bucket only for hamming ≤ 3 (pigeonhole);
    * pairs at hamming 4..`maxHamming` surface only when their flipped
    * bits happen to leave one chunk intact — the default maxHamming=6
    * is deliberately PAST the exhaustive bound (perceptual twins land
    * at hamming 0-2 in practice; 8-bit chunks would make 4-7
    * exhaustive but collapse to 256 bucket values, ~n²/512 candidate
    * mass at corpus scale — the LSH would stop being one). Output:
    * (media_a, media_b, hamming_d, hamming_a), ordered. */
  def imageNearDup(
      fps: DataFrame, maxHamming: Int = 6,
      bucketCap: Long = Long.MaxValue): DataFrame = {
    val ids = fps.select(col("media_id").as("doc_id"), col("dhash").as("fp"))
    val pairs = graft.operators.Dedup.fingerprintPairs(ids, maxHamming, bucketCap)
    val ah = fps.select(col("media_id"), col("ahash"))
    pairs
      .join(ah.select(col("media_id").as("doc_a"), col("ahash").as("ah_a")), "doc_a")
      .join(ah.select(col("media_id").as("doc_b"), col("ahash").as("ah_b")), "doc_b")
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming").as("hamming_d"),
        expr("bit_count(ah_a ^ ah_b)").as("hamming_a"))
      .orderBy("media_a", "media_b")
  }

  /** One survivor per perceptual near-dup component — the
    * [[graft.operators.Dedup]] survivors face for images: near-dup
    * pairs ([[imageNearDup]]) resolve to connected components via
    * star contraction (O(log² n) rounds, never a driver union-find),
    * each component keeps its min media_id, every unpaired image
    * keeps itself. Output: (media_id, codec, kept) for EVERY
    * fingerprinted image, ordered — the gate a training-corpus build
    * applies before featurization. */
  def imageNearDupSurvivors(
      fps: DataFrame, maxHamming: Int = 6,
      bucketCap: Long = Long.MaxValue): DataFrame = {
    val pairs = imageNearDup(fps, maxHamming, bucketCap)
      .select(col("media_a").as("doc_a"), col("media_b").as("doc_b"))
    val labels = graft.operators.Dedup.duplicateLabelsStar(pairs)
      .withColumnRenamed("id", "media_id")
    fps.select("media_id", "codec")
      .join(labels, Seq("media_id"), "left")
      .select(col("media_id"), col("codec"),
        (col("label").isNull || col("label") === col("media_id")).as("kept"))
      .orderBy("media_id")
  }

  /** The planted twin's media_id = doc_id with [[TwinIdBit]] set — a
    * HIGH-BIT tag, not an additive offset, so it cannot collide with a
    * base id until doc_ids themselves reach 2^40 (an additive +10M
    * offset silently corrupted the bookkeeping past 10M docs). */
  private[graft] val TwinIdBit = 1L << 40

  /** Deterministic REAL-image corpus from the documents table (the
    * [[mediaFromDocuments]] posture upgraded to genuinely decodable
    * payloads): each doc renders a 32×32 PNG whose pixels derive from
    * its md5 — and every 50th doc plants a NEAR-COPY twin at
    * media_id | [[TwinIdBit]]: doc_id %50 == 0 re-encodes the same
    * pixels as BMP (different bytes, same image), %50 == 10 upscales
    * 2× by pixel replication (the grid proration makes both
    * fingerprint-identical to their originals). The planted twins are
    * what a near-dup gate must catch WITHOUT exact-hash help. */
  def syntheticImages(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (docId, text) =>
        val img = renderImage(docId, text, 1)
        val base = MediaRecord(docId, "image", encodePng(img), 32, 32, 0)
        val twin =
          if (docId % 50 == 0)
            Some(MediaRecord(docId | TwinIdBit, "image", encodeBmp(img), 32, 32, 0))
          else if (docId % 50 == 10)
            Some(MediaRecord(docId | TwinIdBit, "image",
              encodePng(renderImage(docId, text, 2)), 64, 64, 0))
          else None
        Iterator(base) ++ twin.iterator
      })
  }

  /** A (32·scale)×(32·scale) deterministic pixel pattern from
    * (doc_id, text) — pixel-replicated at `scale`, pure integer
    * mixing, identical pixels for identical inputs on any JVM. */
  private def renderImage(
      docId: Long, text: String, scale: Int): java.awt.image.BufferedImage = {
    val side = 32 * scale
    val img = new java.awt.image.BufferedImage(
      side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bytes = text.getBytes("UTF-8")
    var y = 0
    while (y < side) {
      var x = 0
      while (x < side) {
        val ox = x / scale
        val oy = y / scale
        var h = docId * 0x9E3779B97F4A7C15L + oy * 32L + ox
        if (bytes.nonEmpty) h += bytes((oy * 32 + ox) % bytes.length)
        h *= 0xC2B2AE3D27D4EB4FL
        h ^= h >>> 29
        img.setRGB(x, y, (h & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    img
  }

  private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] =
    encodeAs(img, "png")
  private def encodeBmp(img: java.awt.image.BufferedImage): Array[Byte] =
    encodeAs(img, "bmp")
  private def encodeAs(
      img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** Frame sampling stub for video payloads: pretends each `frameBytes`
    * slice is a frame, keeps every `stride`-th — demonstrates the
    * explode-to-frames plumbing without a codec. */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int = 64, stride: Int = 4): DataFrame =
    media.toDF()
      .withColumn("n_frames", floor(length(col("payload")) / frameBytes).cast("int"))
      .filter(col("n_frames") > 0)
      .withColumn("frame_idx", explode(expr(s"sequence(0, n_frames - 1, $stride)")))
      .select(col("media_id"), col("frame_idx"),
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)").as("frame_payload"))
}
