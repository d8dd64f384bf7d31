package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for training-data pipelines:
  * media travels as opaque `binary` columns + typed metadata structs, and
  * per-item compute (decode, feature extraction, frame sampling) runs as
  * BATCHED partition-local transforms — no shuffle, no driver
  * materialization, so the shape holds on a 100 TB corpus.
  *
  * The image decode kernel is REAL: `javax.imageio.ImageIO` (ships in the
  * JDK) decodes PNG/JPEG/GIF/BMP to width/height/channels, exact pixel
  * sums and a luminance-grid embedding. Bytes ImageIO cannot decode
  * (unknown/broken formats, or genuinely exotic codecs) fall back to a
  * deterministic content-hash pseudo-decode so the pipeline stays total —
  * the `decoder` field records which path produced each row. Audio/video
  * codecs are not in the JDK; frame sampling remains a byte-slice stand-in
  * with the production fan-out shape.
  */
object Multimodal {

  // executors have no display; Graphics2D raster ops only need headless
  // AWT, but set it explicitly so a misconfigured cluster JVM can't throw
  // HeadlessException from a task
  if (System.getProperty("java.awt.headless") == null)
    System.setProperty("java.awt.headless", "true")

  /** Schema convention for an opaque media column + sidecar metadata. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),  // image | audio | video
    StructField("format", StringType),      // jpeg | png | wav | mp4 ...
    StructField("size_bytes", LongType)))

  val ImageInfoSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("pixel_sum", LongType),     // sum of all band samples (exact)
    StructField("decoder", StringType),     // imageio | fallback
    StructField("embedding", ArrayType(FloatType))))

  /** Attach media metadata derived from the binary content (codegen'd —
    * no decode needed for size/format sniffing).
    */
  def withMediaMeta(df: DataFrame, contentCol: String, mediaType: String): DataFrame =
    df.withColumn("media_meta", struct(
      lit(mediaType).as("media_type"),
      sniffFormat(col(contentCol)).as("format"),
      length(col(contentCol)).cast(LongType).as("size_bytes")))

  /** Magic-byte format sniffing over the binary prefix (real). */
  def sniffFormat(content: Column): Column = {
    val prefix = hex(substring(content, 1, 4))
    when(prefix.startsWith("FFD8"), "jpeg")
      .when(prefix.startsWith("89504E47"), "png")
      .when(prefix.startsWith("52494646"), "wav")
      .when(prefix.startsWith("00000018") || prefix.startsWith("00000020"), "mp4")
      .otherwise("unknown")
  }

  /** Real image decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP): exact
    * dimensions, channel count from the color model, the exact sum of all
    * raster band samples, and a luminance-grid embedding (`embeddingDim`
    * cells of mean 601-luma over an even spatial grid, normalized to
    * [0,1]). Integer arithmetic throughout → bit-deterministic across
    * JVMs. Returns null on undecodable bytes (caller falls back).
    */
  def decodeImageIO(content: Array[Byte], embeddingDim: Int): Row = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(content))
      catch { case _: Exception => null }
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    val bands = raster.getNumBands
    // exact pixel sum across all bands + per-pixel luma accumulated into
    // an embeddingDim-cell spatial grid
    val gw = math.ceil(math.sqrt(embeddingDim.toDouble)).toInt.max(1)
    val gh = ((embeddingDim + gw - 1) / gw).max(1)
    val lumaSum = new Array[Long](gw * gh)
    val lumaCnt = new Array[Long](gw * gh)
    var pixelSum = 0L
    val px = new Array[Int](bands)
    var y = 0
    while (y < h) {
      val cy = math.min(y * gh / h, gh - 1)
      var x = 0
      while (x < w) {
        raster.getPixel(x, y, px)
        var b = 0
        var r = 0; var g = 0; var bl = 0
        while (b < bands) { pixelSum += px(b); b += 1 }
        if (bands >= 3) { r = px(0); g = px(1); bl = px(2) }
        else { r = px(0); g = px(0); bl = px(0) } // gray / palette-expanded
        // Rec.601 integer luma: for r=g=b this is exactly the gray value
        val luma = (r * 299 + g * 587 + bl * 114) / 1000
        val cell = cy * gw + math.min(x * gw / w, gw - 1)
        lumaSum(cell) += luma
        lumaCnt(cell) += 1
        x += 1
      }
      y += 1
    }
    val emb = Array.tabulate(embeddingDim) { i =>
      if (i < gw * gh && lumaCnt(i) > 0)
        (lumaSum(i).toDouble / lumaCnt(i) / 255.0).toFloat
      else 0f
    }
    Row(w, h, bands, pixelSum, "imageio", emb.toSeq)
  }

  /** Deterministic content-hash pseudo-decode — the fallback for bytes the
    * JDK cannot decode, keeping the pipeline total over dirty corpora.
    */
  def stubDecodeImage(content: Array[Byte], embeddingDim: Int): Row = {
    if (content == null) return Row(null, null, null, null, null, null)
    var h = 1125899906842597L
    var i = 0
    while (i < math.min(content.length, 256)) { h = 31 * h + content(i); i += 1 }
    def next(): Long = { h = h * 6364136223846793005L + 1442695040888963407L; h }
    val w = 64 + math.floorMod(next(), 1024).toInt
    val ht = 64 + math.floorMod(next(), 1024).toInt
    val emb = Array.fill(embeddingDim)(math.floorMod(next(), 2000).toFloat / 1000f - 1f)
    Row(w, ht, 3, null, "fallback", emb.toSeq)
  }

  /** Decode one item: real ImageIO first, deterministic fallback second. */
  def decodeImage(content: Array[Byte], embeddingDim: Int): Row = {
    if (content == null) return Row(null, null, null, null, null, null)
    val real = decodeImageIO(content, embeddingDim)
    if (real != null) real else stubDecodeImage(content, embeddingDim)
  }

  /** Batched partition-local image decode: groups each partition's rows
    * into `batchSize` chunks (the shape a vectorized decoder expects),
    * decodes per item via ImageIO, and appends an `image_info` struct.
    * No shuffle — partitioning and row order are preserved.
    */
  def decodeImages(df: DataFrame, contentCol: String,
      embeddingDim: Int = 16, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("image_info", ImageInfoSchema))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // batch boundary: a vectorized decoder would process `batch` in
        // one call; ImageIO decodes item-wise within the batch
        batch.map { r =>
          val info = decodeImage(r.getAs[Array[Byte]](contentIdx), embeddingDim)
          Row.fromSeq(r.toSeq :+ info)
        }
      }
    }(enc)
  }

  /** Encode a solid-gray RGB image as PNG bytes (ImageIO, lossless). The
    * synthetic-fixture generator for pipeline tests/benchmarks: dimensions
    * and pixel content are closed-form functions of the inputs, so decoded
    * stats are verifiable by an external oracle without an image library
    * (pixel_sum == w*h*3*gray for the decoded result).
    */
  def encodeSolidPng(width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_3BYTE_BGR)
    val g2 = img.createGraphics()
    try {
      g2.setColor(new java.awt.Color(gray, gray, gray))
      g2.fillRect(0, 0, width, height)
    } finally g2.dispose()
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Render a `content` PNG column from integer width/height/gray columns —
    * partition-local, batched like the decode. Pairs with [[decodeImages]]
    * for end-to-end encode→decode verification on synthetic corpora.
    */
  def renderSolidPngs(df: DataFrame, wCol: String, hCol: String,
      grayCol: String, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("content", BinaryType))
    val (wi, hi, gi) =
      (df.schema.fieldIndex(wCol), df.schema.fieldIndex(hCol), df.schema.fieldIndex(grayCol))
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val bytes = encodeSolidPng(r.getInt(wi), r.getInt(hi), r.getInt(gi))
        Row.fromSeq(r.toSeq :+ bytes)
      })
    }(enc)
  }

  val ImageDimsSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType)))

  /** HEADER-ONLY dimension probe: ImageReader.getWidth/getHeight read the
    * image header without decoding pixel data — the cheap first pass for
    * dimension/aspect filtering over a huge corpus (decode only what
    * survives). Returns null info for unrecognized bytes.
    */
  def probeImageDims(content: Array[Byte]): Row = {
    if (content == null) return Row(null, null, null)
    val iis =
      try ImageIO.createImageInputStream(new ByteArrayInputStream(content))
      catch { case _: Exception => null }
    if (iis == null) return Row(null, null, null)
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Row(null, null, null)
      val r = readers.next()
      r.setInput(iis, true, true)
      try Row(r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase)
      catch { case _: Exception => Row(null, null, null) }
      finally r.dispose()
    } finally iis.close()
  }

  /** Batched partition-local header probe appending `image_dims` — no
    * pixel decode, no shuffle. Pair with a dims filter, then run
    * [[decodeImages]] only on the survivors.
    */
  def probeImages(df: DataFrame, contentCol: String,
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("image_dims", ImageDimsSchema))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        Row.fromSeq(r.toSeq :+ probeImageDims(r.getAs[Array[Byte]](contentIdx)))
      })
    }(enc)
  }

  // ---------------- audio (real, javax.sound.sampled) ----------------

  val AudioInfoSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("frames", LongType),
    StructField("peak", IntegerType),        // max |sample| across channels
    StructField("rms", DoubleType),          // root-mean-square amplitude
    StructField("decoder", StringType)))     // javasound | fallback

  /** Real audio decode via the JDK's javax.sound.sampled: WAV/AIFF/AU
    * PCM streams decode to rate/channels/frame count plus exact peak and
    * RMS amplitude over the 16-bit samples. Returns null on undecodable
    * bytes (caller falls back to a metadata-only row).
    */
  def decodeAudioJavaSound(content: Array[Byte]): Row = {
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(content))
      catch { case _: Exception => return null }
    try {
      val fmt = in.getFormat
      if (fmt.getSampleSizeInBits != 16) return null // PCM16 is the contract
      val channels = fmt.getChannels
      val frames = in.getFrameLength
      val bytes = in.readAllBytes()
      val le = !fmt.isBigEndian
      var peak = 0
      var sumSq = 0.0
      var i = 0
      val n = bytes.length / 2
      while (i < n) {
        val lo = bytes(2 * i) & 0xff
        val hi = bytes(2 * i + 1) & 0xff
        val s = (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort.toInt
        val a = math.abs(s)
        if (a > peak) peak = a
        sumSq += s.toDouble * s
        i += 1
      }
      val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
      Row(fmt.getSampleRate.toInt, channels, frames, peak, rms, "javasound")
    } catch { case _: Exception => null }
    finally in.close()
  }

  /** Decode one audio item: real JavaSound first, size-only fallback. */
  def decodeAudio(content: Array[Byte]): Row = {
    if (content == null) return Row(null, null, null, null, null, null)
    val real = decodeAudioJavaSound(content)
    if (real != null) real
    else Row(null, null, null, null, null, "fallback")
  }

  /** Batched partition-local audio decode, appending an `audio_info`
    * struct — same no-shuffle contract as [[decodeImages]].
    */
  def decodeAudios(df: DataFrame, contentCol: String,
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("audio_info", AudioInfoSchema))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        Row.fromSeq(r.toSeq :+ decodeAudio(r.getAs[Array[Byte]](contentIdx)))
      })
    }(enc)
  }

  /** Encode a 16-bit mono PCM square wave as WAV bytes: every sample is
    * ±amplitude (50% duty, `period` samples per cycle), so the decoded
    * peak AND RMS are exactly `amplitude` — closed-form verifiable by an
    * external oracle with no audio library.
    */
  def encodeSquareWav(sampleRate: Int, frames: Int, amplitude: Int,
      period: Int = 16): Array[Byte] = {
    require(amplitude >= 0 && amplitude <= Short.MaxValue, s"amplitude $amplitude")
    // odd periods skew the duty cycle off 50% (breaking peak==RMS==amplitude)
    // and period=1 divides by zero in the half-period index below
    require(period >= 2 && period % 2 == 0, s"period $period must be even and >= 2")
    val pcm = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val s = (if ((i / (period / 2)) % 2 == 0) amplitude else -amplitude).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Render a `content` WAV column from integer frames/amplitude columns —
    * partition-local, pairs with [[decodeAudios]] for end-to-end
    * encode→decode verification on synthetic corpora.
    */
  def renderSquareWavs(df: DataFrame, framesCol: String, ampCol: String,
      sampleRate: Int = 8000, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("content", BinaryType))
    val (fi, ai) = (df.schema.fieldIndex(framesCol), df.schema.fieldIndex(ampCol))
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val bytes = encodeSquareWav(sampleRate, r.getInt(fi), r.getInt(ai))
        Row.fromSeq(r.toSeq :+ bytes)
      })
    }(enc)
  }

  // ---------------- audio perceptual fingerprint ----------------------

  /** Mean |sample| per window over `gw` equal windows of a PCM16 stream
    * (channels folded together; integer arithmetic, deterministic).
    */
  private def energyWindows(content: Array[Byte], gw: Int): Option[Array[Long]] = {
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(content))
      catch { case _: Exception => return None }
    try {
      if (in.getFormat.getSampleSizeInBits != 16) return None
      val le = !in.getFormat.isBigEndian
      val bytes = in.readAllBytes()
      val n = bytes.length / 2
      if (n < gw) return None
      val sum = new Array[Long](gw)
      val cnt = new Array[Long](gw)
      var i = 0
      while (i < n) {
        val lo = bytes(2 * i) & 0xff
        val hi = bytes(2 * i + 1) & 0xff
        val s = (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort.toInt
        val w = math.min((i.toLong * gw / n).toInt, gw - 1)
        sum(w) += math.abs(s)
        cnt(w) += 1
        i += 1
      }
      Some(Array.tabulate(gw)(w => if (cnt(w) > 0) sum(w) / cnt(w) else 0L))
    } catch { case _: Exception => None }
    finally in.close()
  }

  /** 64-bit audio fingerprint: mean |sample| energy over 65 equal time
    * windows, one bit per adjacent window pair (set when energy RISES) —
    * the energy-envelope difference hash (the same family of public
    * technique as image dHash, applied to the loudness contour). Uniform
    * volume scaling multiplies every window equally, so the comparison
    * signs — and the hash — survive gain changes and lossless re-encodes
    * that byte hashing cannot. Null for undecodable or sub-65-sample
    * content. Integer arithmetic throughout.
    */
  def audioFingerprint64(content: Array[Byte]): java.lang.Long = {
    if (content == null) return null
    energyWindows(content, 65) match {
      case None => null
      case Some(e) =>
        var bits = 0L
        var i = 0
        while (i < 64) {
          if (e(i + 1) > e(i)) bits |= 1L << i
          i += 1
        }
        bits
    }
  }

  /** Append an `audio_fp` column (nullable long) — partition-local,
    * batched; no shuffle.
    */
  def withAudioFingerprint(df: DataFrame, contentCol: String,
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("audio_fp", LongType))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        Row.fromSeq(r.toSeq :+ audioFingerprint64(r.getAs[Array[Byte]](contentIdx)))
      })
    }(enc)
  }

  /** Perceptual near-dup audio pairs: fingerprint sketches through the
    * 5-block Hamming pigeonhole ([[Dedup.hammingBlockedPairs]] — shared
    * with text SimHash and image dHash). Undecodable rows are excluded;
    * audio bytes never enter a shuffle. Returns (id_a, id_b, hamming).
    */
  def audioFingerprintPairs(df: DataFrame, idCol: String, contentCol: String,
      maxHamming: Int = 3, batchSize: Int = 64): DataFrame =
    fingerprintPairs(df, idCol, contentCol, "audio", maxHamming, batchSize)

  /** Deterministic segment-pattern WAV fixture for fingerprint tests: 65
    * equal square-wave segments whose amplitudes are a seeded walk with
    * ADJACENT SEGMENTS ≥1024 apart, so every fingerprint bit is decided
    * by a margin that survives integer volume scaling — the hash of a
    * gain-scaled copy is closed-form EQUAL to the original's.
    */
  def encodeSegmentWav(sampleRate: Int, seed: Long,
      segFrames: Int = 160): Array[Byte] = {
    val amps = segmentAmps(seed)
    val frames = 65 * segFrames
    val pcm = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val amp = amps(i / segFrames)
      val s = (if ((i / 8) % 2 == 0) amp else -amp).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** The 65 segment amplitudes of [[encodeSegmentWav]] — exposed so tests
    * derive the expected fingerprint closed-form.
    */
  def segmentAmps(seed: Long): Array[Int] = {
    def raw(s: Int): Int = {
      var h = seed * 6364136223846793005L + s * 1442695040888963407L
      h ^= (h >>> 29); h *= -7723592293110705685L; h ^= (h >>> 32)
      math.floorMod(h, 12).toInt
    }
    val amps = new Array[Int](65)
    var s = 0
    while (s < 65) {
      var v = raw(s)
      if (s > 0 && 2048 + 1024 * v == amps(s - 1)) v = (v + 1) % 12
      amps(s) = 2048 + 1024 * v
      s += 1
    }
    amps
  }

  /** Render a `content` WAV column of segment patterns from a long seed
    * column — the [[encodeSegmentWav]] fixture as a frame op.
    */
  def renderSegmentWavs(df: DataFrame, seedCol: String,
      sampleRate: Int = 8000, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("content", BinaryType))
    val si = df.schema.fieldIndex(seedCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        Row.fromSeq(r.toSeq :+ encodeSegmentWav(8000, r.getLong(si)))
      })
    }(enc)
  }

  /** Scale a PCM16 WAV's volume by `num`/`den` (integer per-sample
    * multiply, re-encoded as WAV) — the gain-change/normalization op, and
    * the "volume-scaled twin" fixture for fingerprint dedup tests.
    * Undecodable bytes pass through unchanged.
    */
  def scaleWavVolume(df: DataFrame, contentCol: String, num: Int, den: Int,
      batchSize: Int = 64): DataFrame = {
    require(den > 0 && num >= 0, s"bad gain $num/$den")
    val contentIdx = df.schema.fieldIndex(contentCol)
    val enc = RowEncoder.encoderFor(df.schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val in =
          if (bytes == null) null
          else
            try javax.sound.sampled.AudioSystem.getAudioInputStream(
              new ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
        if (in == null) r
        else if (in.getFormat.getSampleSizeInBits != 16) { in.close(); r }
        else try {
          val fmt = in.getFormat
          val le = !fmt.isBigEndian
          val pcm = in.readAllBytes()
          val n = pcm.length / 2
          var i = 0
          while (i < n) {
            val lo = pcm(2 * i) & 0xff
            val hi = pcm(2 * i + 1) & 0xff
            val s0 = (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort.toInt
            val s = math.max(Short.MinValue,
              math.min(Short.MaxValue, s0.toLong * num / den)).toInt
            if (le) {
              pcm(2 * i) = (s & 0xff).toByte
              pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            } else {
              pcm(2 * i) = ((s >> 8) & 0xff).toByte
              pcm(2 * i + 1) = (s & 0xff).toByte
            }
            i += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new ByteArrayInputStream(pcm), fmt, n.toLong / fmt.getChannels)
          val out = new ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
          Row.fromSeq(r.toSeq.updated(contentIdx, out.toByteArray))
        } finally in.close()
      })
    }(enc)
  }

  /** Video near-dup pairs by FRAME-fingerprint voting: each video's
    * sampled frames get an image dHash (8 B/frame — the video bytes never
    * shuffle), frame sketches join ACROSS videos through the 5-block
    * Hamming pigeonhole, and a video pair is reported when at least
    * `minMatches` DISTINCT frames of the smaller-id video match a frame
    * of the other at hamming ≤ `maxHamming` — the standard
    * shot-fingerprint voting shape for re-encoded/rescaled video copies.
    * MJPEG decodes in-engine ([[sampleMjpegFrames]] markers); other
    * containers route through the [[sampleFrames]] stub seam, whose
    * slices are not decodable images → excluded, never false-matched.
    * Returns (id_a, id_b, matches) with id_a < id_b.
    *
    * Frame identities pack as vid·10⁶ + frame_index (fails loudly past
    * either bound rather than aliasing).
    */
  def videoDHashPairs(df: DataFrame, idCol: String, contentCol: String,
      minMatches: Int = 2, maxHamming: Int = 3,
      everyNth: Int = 1): DataFrame = {
    require(minMatches >= 1, s"minMatches must be positive: $minMatches")
    val frames = sampleFrames(
      df.select(col(idCol).as("__vid"), col(contentCol).as("__c")),
      "__c", everyNth)
    val guardedId =
      when(col("__vid").between(0, 9223372036853L) &&
          col("frame_index") < 1000000,
        col("__vid") * 1000000L + col("frame_index"))
      .otherwise(raise_error(lit(
        "videoDHashPairs: vid/frame_index outside the packable range")))
    val fps = withFingerprint(
      frames.select(col("__vid"), col("frame_index"),
        col("frame_bytes").as("__fb")), "__fb", "image")
      .filter(col("fp").isNotNull)
      .select(guardedId.as("id"), col("fp").as("sk"))
    val framePairs = Dedup.hammingBlockedPairs(fps, maxHamming)
      .select(expr("id_a div 1000000").as("va"), col("id_a"),
        expr("id_b div 1000000").as("vb"), col("id_b"))
      .filter(col("va") =!= col("vb"))
    // normalize to (small vid, large vid); vote with the SMALL video's
    // distinct matched frames so one hot frame cannot inflate the count
    framePairs
      .select(least(col("va"), col("vb")).as("id_a"),
        greatest(col("va"), col("vb")).as("id_b"),
        when(col("va") < col("vb"), col("id_a")).otherwise(col("id_b"))
          .as("__fa"))
      .groupBy("id_a", "id_b")
      .agg(countDistinct(col("__fa")).as("matches"))
      .filter(col("matches") >= minMatches)
  }

  /** Render a `content` MJPEG column of block-pattern frames from an
    * array-of-longs seed column and an integer frame-size column pair —
    * the video fixture matching [[videoDHashPairs]] (same-seed frames at
    * different sizes or re-encodes hash identically).
    */
  def renderBlockMjpegs(df: DataFrame, seedsCol: String, wCol: String,
      hCol: String, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("content", BinaryType))
    val (si, wi, hi) = (df.schema.fieldIndex(seedsCol),
      df.schema.fieldIndex(wCol), df.schema.fieldIndex(hCol))
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val out = new ByteArrayOutputStream()
        r.getSeq[Long](si).foreach(seed =>
          out.write(encodeBlockJpeg(r.getInt(wi), r.getInt(hi), seed)))
        Row.fromSeq(r.toSeq :+ out.toByteArray)
      })
    }(enc)
  }

  // ---------------- persisted fingerprint index -----------------------

  /** The 64-bit perceptual kernel by name: `image` = [[dHash64]],
    * `audio` = [[audioFingerprint64]].
    */
  private[pipeline] def fingerprintFn(kind: String): Array[Byte] => java.lang.Long =
    kind match {
      case "image" => dHash64
      case "audio" => audioFingerprint64
      case other => throw new IllegalArgumentException(
        s"unknown fingerprint kind '$other' (expected image | audio)")
    }

  /** Append a `fp` column using the named kernel. */
  private def withFingerprint(df: DataFrame, contentCol: String,
      kind: String, batchSize: Int = 64): DataFrame = {
    val f = fingerprintFn(kind)
    val outSchema = StructType(df.schema.fields :+ StructField("fp", LongType))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        Row.fromSeq(r.toSeq :+ f(r.getAs[Array[Byte]](contentIdx)))
      })
    }(enc)
  }

  /** The batch's (id, fp) sketch frame — undecodable rows excluded. */
  private[pipeline] def fingerprintFrame(df: DataFrame, idCol: String,
      contentCol: String, kind: String, batchSize: Int = 64): DataFrame =
    withFingerprint(
      df.select(col(idCol).as("id"), col(contentCol).as("c")), "c", kind,
      batchSize)
      .filter(col("fp").isNotNull)
      .select(col("id"), col("fp"))

  /** Create a persisted perceptual-fingerprint index at `path`: a graft PK
    * table (id → fp) bucketed by id, with the kernel kind pinned in the
    * table options so future batches hash compatibly — the perceptual
    * twin of [[Dedup.buildSigIndex]]. 8 bytes per item: a billion-item
    * media corpus indexes in ~16 GB.
    */
  def buildFingerprintIndex(df: DataFrame, idCol: String, contentCol: String,
      path: String, kind: String = "image", buckets: Int = 8)
      : graft.table.GraftTable = {
    fingerprintFn(kind) // validate the kind before creating anything
    val fps = fingerprintFrame(df, idCol, contentCol, kind)
    val t = graft.table.GraftTable.create(df.sparkSession, path, fps.schema,
      primaryKeys = Seq("id"),
      options = Map("bucket" -> buckets.toString, "dedup.fp.kind" -> kind))
    t.upsert(fps)
    t
  }

  /** The kernel kind a fingerprint index was built with — fails fast on a
    * non-fingerprint table (hashing a batch with a DIFFERENT kernel would
    * band incompatible sketches and silently miss every duplicate).
    */
  private[graft] def fpIndexKind(index: graft.table.GraftTable): String = {
    val k = index.schema.option("dedup.fp.kind", "")
    require(k.nonEmpty,
      s"table at ${index.location} is not a fingerprint index: missing " +
        "'dedup.fp.kind' table option (build one with buildFingerprintIndex)")
    k
  }

  /** Fold a batch's fingerprints into the index (upsert — a re-ingested
    * id replaces its fingerprint); exactly-once under commitIdentifier.
    */
  def appendToFingerprintIndex(index: graft.table.GraftTable, df: DataFrame,
      idCol: String, contentCol: String, commitIdentifier: Long = -1L,
      commitUser: String = ""): Unit =
    index.upsert(fingerprintFrame(df, idCol, contentCol, fpIndexKind(index)),
      commitIdentifier = commitIdentifier, commitUser = commitUser)

  /** Perceptual near-dup pairs of `newDf` AGAINST the indexed corpus
    * (the fingerprint analog of [[Dedup.nearDupPairsAgainst]]): the
    * batch's sketches band against the index's (id, fp) scan through the
    * 5-block Hamming pigeonhole — the media bytes of the corpus are
    * NEVER read, only its 8-byte sketches. Same-id pairs excluded.
    * Returns (new_id, corpus_id, hamming).
    */
  def fingerprintPairsAgainst(newDf: DataFrame, idCol: String,
      contentCol: String, index: graft.table.GraftTable,
      maxHamming: Int = 3, view: Option[DataFrame] = None): DataFrame =
    Dedup.hammingBlockedPairsAgainst(
      fingerprintFrame(newDf, idCol, contentCol, fpIndexKind(index))
        .select(col("id"), col("fp").as("sk")),
      view.getOrElse(index.toDF).select(col("id"), col("fp").as("sk")),
      maxHamming)

  // ---------------- video (MJPEG real; other containers stubbed) -------

  /** Encode one solid-gray JPEG frame (dims are exact post-encode; pixel
    * values are lossy — verify dims via [[probeImageDims]], not sums).
    */
  def encodeSolidJpeg(width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_3BYTE_BGR)
    val g2 = img.createGraphics()
    try {
      g2.setColor(new java.awt.Color(gray, gray, gray))
      g2.fillRect(0, 0, width, height)
    } finally g2.dispose()
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpeg", out)
    out.toByteArray
  }

  /** Render a `content` MJPEG column from an ARRAY<STRUCT<w,h,gray>>
    * frame-spec column (one JPEG per element, concatenated) —
    * partition-local; pairs with [[sampleMjpegFrames]] for end-to-end
    * frame-extraction verification on synthetic videos.
    */
  def renderMjpegs(df: DataFrame, framesCol: String,
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("content", BinaryType))
    val framesIdx = df.schema.fieldIndex(framesCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val frames = r.getSeq[Row](framesIdx)
        val out = new ByteArrayOutputStream()
        frames.foreach(f => out.write(encodeSolidJpeg(
          f.getInt(0), f.getInt(1), f.getInt(2))))
        Row.fromSeq(r.toSeq :+ out.toByteArray)
      })
    }(enc)
  }

  /** Split an MJPEG stream (concatenated JPEGs — the one video format
    * decodable with zero external codecs) into its frames by scanning
    * SOI/EOI markers. JPEG byte-stuffing guarantees 0xFFD9 inside
    * entropy-coded data never occurs (0xFF is always followed by 0x00
    * there), so marker spans are frame boundaries. Embedded EXIF
    * thumbnails (a nested JPEG inside APP1) are out of scope.
    */
  def splitMjpegFrames(content: Array[Byte]): Seq[Array[Byte]] = {
    if (content == null) return Nil
    val frames = Seq.newBuilder[Array[Byte]]
    var i = 0
    var start = -1
    while (i < content.length - 1) {
      if ((content(i) & 0xff) == 0xff) {
        val m = content(i + 1) & 0xff
        if (m == 0xd8 && start < 0) start = i
        else if (m == 0xd9 && start >= 0) {
          frames += java.util.Arrays.copyOfRange(content, start, i + 2)
          start = -1
          i += 1
        }
      }
      i += 1
    }
    frames.result()
  }

  /** REAL video frame sampling for MJPEG content: one row per every-nth
    * frame, `frame_bytes` holding a complete decodable JPEG (feed straight
    * into [[decodeImages]]/[[probeImages]]). Partition-local flatMap — one
    * task per video slab, no shuffle. Non-MJPEG bytes yield zero rows (use
    * [[sampleFrames]]' byte-slice stub for opaque containers).
    */
  def sampleMjpegFrames(df: DataFrame, contentCol: String,
      everyNth: Int = 1): DataFrame = {
    require(everyNth >= 1)
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_index", IntegerType, nullable = false),
      StructField("frame_bytes", BinaryType)))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        splitMjpegFrames(r.getAs[Array[Byte]](contentIdx)).zipWithIndex
          .collect { case (bytes, idx) if idx % everyNth == 0 =>
            Row.fromSeq(r.toSeq ++ Seq(idx, bytes))
          }
      }
    }(enc)
  }

  /** Video frame sampler with EXPLICIT per-row decoder provenance. MJPEG
    * content (SOI-marker prefix) takes the REAL path — every-nth complete
    * JPEG via [[splitMjpegFrames]], `decoder = "mjpeg"`. Opaque containers
    * (MP4/H.264 etc. need codecs the JDK does not ship) get the documented
    * byte-slice STUB, flagged `decoder = "stub-slice"` — so a 100-TB
    * pipeline can `filter($"decoder" === "stub-slice")` and route those
    * rows to an external decode service instead of silently training on
    * slice bytes (the routing pattern is shown in examples/QuickStart).
    */
  def sampleFrames(df: DataFrame, contentCol: String, everyNth: Int = 30): DataFrame = {
    require(everyNth >= 1)
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_index", IntegerType, nullable = false),
      StructField("frame_bytes", BinaryType),
      StructField("decoder", StringType, nullable = false)))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        if (bytes == null) Nil
        else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
            (bytes(1) & 0xff) == 0xd8) {
          splitMjpegFrames(bytes).zipWithIndex
            .collect { case (fb, idx) if idx % everyNth == 0 =>
              Row.fromSeq(r.toSeq ++ Seq(idx, fb, "mjpeg"))
            }
        } else {
          // stub: every-nth-frame metadata with a content slice standing in
          // for the decoded frame; one frame per ~1000 bytes of container
          val frameCount = bytes.length / 1000 + 1
          val n = math.max(frameCount / everyNth, 1)
          (0 until n).map { i =>
            val idx = i * everyNth
            val start = math.min(idx, bytes.length)
            val slice = java.util.Arrays.copyOfRange(bytes, start,
              math.min(start + 256, bytes.length))
            Row.fromSeq(r.toSeq ++ Seq(idx, slice, "stub-slice"))
          }
        }
      }
    }(enc)
  }

  /** Real image resize: decode via ImageIO, scale with bilinear
    * interpolation, re-encode as PNG. Rows whose bytes cannot be decoded
    * pass through unchanged (same totality contract as [[decodeImages]]).
    * Partition-local and batched; no shuffle.
    */
  def resizeImages(df: DataFrame, contentCol: String, w: Int, h: Int,
      batchSize: Int = 64): DataFrame = {
    val contentIdx = df.schema.fieldIndex(contentCol)
    val enc = RowEncoder.encoderFor(df.schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val img =
          if (bytes == null) null
          else
            try ImageIO.read(new ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
        if (img == null) r
        else {
          val scaled = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
          val g2 = scaled.createGraphics()
          try {
            g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g2.drawImage(img, 0, 0, w, h, null)
          } finally g2.dispose()
          val out = new ByteArrayOutputStream()
          ImageIO.write(scaled, "png", out)
          Row.fromSeq(r.toSeq.updated(contentIdx, out.toByteArray))
        }
      })
    }(enc)
  }

  /** Resize as a metadata transform on decoded info (no re-decode; see
    * [[resizeImages]] for the pixel-level path).
    */
  def resizeInfo(df: DataFrame, infoCol: String, w: Int, h: Int): DataFrame =
    df.withColumn(infoCol, struct(
      lit(w).as("width"), lit(h).as("height"),
      col(s"$infoCol.channels").as("channels"),
      col(s"$infoCol.pixel_sum").as("pixel_sum"),
      col(s"$infoCol.decoder").as("decoder"),
      col(s"$infoCol.embedding").as("embedding")))

  // ================= perceptual image near-dup (dHash) =================

  /** Mean Rec.601 luma over a `gw`×`gh` spatial grid — integer
    * accumulation, bit-deterministic across JVMs (the [[decodeImageIO]]
    * embedding grid, factored for the perceptual hash).
    */
  private def lumaGrid(img: BufferedImage, gw: Int, gh: Int): Array[Long] = {
    val raster = img.getRaster
    val bands = raster.getNumBands
    val (w, h) = (img.getWidth, img.getHeight)
    val sum = new Array[Long](gw * gh)
    val cnt = new Array[Long](gw * gh)
    val px = new Array[Int](bands)
    var y = 0
    while (y < h) {
      val cy = math.min(y * gh / h, gh - 1)
      var x = 0
      while (x < w) {
        raster.getPixel(x, y, px)
        val (r, g, b) =
          if (bands >= 3) (px(0), px(1), px(2)) else (px(0), px(0), px(0))
        val cell = cy * gw + math.min(x * gw / w, gw - 1)
        sum(cell) += (r * 299 + g * 587 + b * 114) / 1000
        cnt(cell) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(gw * gh)(i => if (cnt(i) > 0) sum(i) / cnt(i) else 0L)
  }

  /** 64-bit difference hash (dHash) of an image: mean luma over a 9-wide ×
    * 8-tall grid, one bit per horizontally adjacent cell pair (set when
    * the right cell is brighter). The standard perceptual-hash primitive
    * for training-corpus image dedup: the grid means are area averages,
    * so RESIZED and lossily RE-ENCODED copies keep (almost) the same
    * gradient signs while byte-level hashing sees entirely different
    * content. Returns null for undecodable bytes. Integer arithmetic
    * throughout — deterministic across JVMs. (Public technique: the
    * widely documented dHash / difference-hash construction.)
    */
  def dHash64(content: Array[Byte]): java.lang.Long = {
    if (content == null) return null
    val img =
      try ImageIO.read(new ByteArrayInputStream(content))
      catch { case _: Exception => null }
    if (img == null) return null
    val grid = lumaGrid(img, 9, 8)
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (grid(y * 9 + x + 1) > grid(y * 9 + x))
          bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Append a `dhash` column (nullable long) — partition-local, batched
    * like [[decodeImages]]; no shuffle.
    */
  def withDHash(df: DataFrame, contentCol: String,
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("dhash", LongType))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        Row.fromSeq(r.toSeq :+ dHash64(r.getAs[Array[Byte]](contentIdx)))
      })
    }(enc)
  }

  /** Perceptual near-dup image pairs: dHash sketches joined through the
    * 5-block Hamming pigeonhole ([[Dedup.hammingBlockedPairs]] — the
    * SimHash machinery, reused verbatim: candidates must share an exact
    * block pair, so the join is bucket-local, never all-pairs; exact
    * Hamming ≤ `maxHamming` verifies). Undecodable rows (null dhash) are
    * excluded. Returns (id_a, id_b, hamming) with id_a < id_b.
    *
    * Scale shape: one decode pass appends the 8-byte sketch, the join
    * carries (id, sk) only — the image bytes never enter a shuffle.
    */
  def dHashPairs(df: DataFrame, idCol: String, contentCol: String,
      maxHamming: Int = 3, batchSize: Int = 64): DataFrame =
    fingerprintPairs(df, idCol, contentCol, "image", maxHamming, batchSize)

  /** Intra-frame perceptual near-dup pairs for the named kernel — the
    * generic core of [[dHashPairs]] / [[audioFingerprintPairs]], and the
    * intra-batch check of [[graft.streaming.StreamingDedup]]'s
    * FingerprintStage.
    */
  def fingerprintPairs(df: DataFrame, idCol: String, contentCol: String,
      kind: String, maxHamming: Int = 3, batchSize: Int = 64): DataFrame =
    Dedup.hammingBlockedPairs(
      fingerprintFrame(df, idCol, contentCol, kind, batchSize)
        .select(col("id"), col("fp").as("sk")),
      maxHamming)

  /** Deterministic block-pattern PNG fixture for perceptual-hash tests: a
    * 9×8 grid of solid cells whose gray levels are a seeded pseudo-random
    * walk with ADJACENT CELLS ALWAYS ≥16 levels apart, so every dHash bit
    * is decided by a margin that survives bilinear resampling and JPEG
    * quantization — the hash of a resized/re-encoded copy is closed-form
    * EQUAL to the original's, while distinct seeds give unrelated bit
    * patterns.
    */
  private def paintBlocks(width: Int, height: Int, seed: Long): BufferedImage = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_3BYTE_BGR)
    def raw(bx: Int, by: Int): Int = {
      var h = seed * 6364136223846793005L + (by * 9 + bx) * 1442695040888963407L
      h ^= (h >>> 29); h *= -7723592293110705685L; h ^= (h >>> 32)
      math.floorMod(h, 12).toInt
    }
    // grays resolved left-to-right so the >=16-level gap holds against the
    // ADJUSTED left neighbor, not its raw value
    def rowGrays(by: Int): Array[Int] = {
      val g = new Array[Int](9)
      var bx = 0
      while (bx < 9) {
        var v = raw(bx, by)
        if (bx > 0 && 32 + 16 * v == g(bx - 1)) v = (v + 1) % 12
        g(bx) = 32 + 16 * v
        bx += 1
      }
      g
    }
    val g2 = img.createGraphics()
    try {
      var by = 0
      while (by < 8) {
        val grays = rowGrays(by)
        var bx = 0
        while (bx < 9) {
          val gray = grays(bx)
          g2.setColor(new java.awt.Color(gray, gray, gray))
          g2.fillRect(bx * width / 9, by * height / 8,
            (bx + 1) * width / 9 - bx * width / 9,
            (by + 1) * height / 8 - by * height / 8)
          bx += 1
        }
        by += 1
      }
    } finally g2.dispose()
    img
  }

  def encodeBlockPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(paintBlocks(width, height, seed), "png", out)
    out.toByteArray
  }

  /** The block-pattern fixture as a JPEG frame — for MJPEG video tests. */
  def encodeBlockJpeg(width: Int, height: Int, seed: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(paintBlocks(width, height, seed), "jpg", out)
    out.toByteArray
  }

  /** Render a `content` PNG column of block patterns from integer
    * width/height and long seed columns — the [[encodeBlockPng]] fixture
    * as a partition-local batched frame op (pairs with [[dHashPairs]] the
    * way [[renderSolidPngs]] pairs with [[decodeImages]]).
    */
  def renderBlockPngs(df: DataFrame, wCol: String, hCol: String,
      seedCol: String, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("content", BinaryType))
    val (wi, hi, si) = (df.schema.fieldIndex(wCol),
      df.schema.fieldIndex(hCol), df.schema.fieldIndex(seedCol))
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val bytes = encodeBlockPng(r.getInt(wi), r.getInt(hi), r.getLong(si))
        Row.fromSeq(r.toSeq :+ bytes)
      })
    }(enc)
  }

  /** Decode + re-encode an image in another format (`jpeg` | `png`) —
    * the normalization/transcode op, and the fixture for "re-encoded
    * twin" dedup tests. Undecodable bytes pass through unchanged.
    */
  def transcodeImages(df: DataFrame, contentCol: String, format: String,
      batchSize: Int = 64): DataFrame = {
    val contentIdx = df.schema.fieldIndex(contentCol)
    val enc = RowEncoder.encoderFor(df.schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val img =
          if (bytes == null) null
          else
            try ImageIO.read(new ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
        if (img == null) r
        else {
          // JPEG writers reject alpha; normalize onto an RGB canvas
          val rgb = new BufferedImage(img.getWidth, img.getHeight,
            BufferedImage.TYPE_3BYTE_BGR)
          val g2 = rgb.createGraphics()
          try g2.drawImage(img, 0, 0, null) finally g2.dispose()
          val out = new ByteArrayOutputStream()
          ImageIO.write(rgb, format, out)
          Row.fromSeq(r.toSeq.updated(contentIdx, out.toByteArray))
        }
      })
    }(enc)
  }
}
