package graft

import graft.pipeline.{Multimodal, VectorOps}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def fakeMedia = {
    // binary payloads with recognizable magic bytes
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte) ++
      Array.tabulate(500)(i => (i % 251).toByte)
    val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47) ++
      Array.tabulate(300)(i => (i % 13).toByte)
    Seq((1L, jpeg), (2L, png), (3L, jpeg ++ jpeg)).toDF("id", "content")
  }

  test("media metadata + format sniffing") {
    val df = Multimodal.withMediaMeta(fakeMedia, "content", "image")
    val rows = df.select("id", "media_meta.format", "media_meta.size_bytes")
      .orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("jpeg", "png", "jpeg"))
    assert(rows.map(_.getLong(2)).toSeq == Seq(504L, 304L, 1008L))
  }

  test("batched decode: schema, determinism, partition preservation") {
    val df = fakeMedia.repartition(2)
    val decoded = Multimodal.decodeImages(df, "content", embeddingDim = 8, batchSize = 2)
    assert(decoded.schema.fieldNames.toSeq == Seq("id", "content", "image_info"))
    assert(decoded.rdd.getNumPartitions == 2, "decode must not shuffle")
    val a = decoded.select("id", "image_info.width", "image_info.embedding")
      .orderBy("id").collect()
    val b = Multimodal.decodeImages(df, "content", embeddingDim = 8, batchSize = 2)
      .select("id", "image_info.width", "image_info.embedding").orderBy("id").collect()
    assert(a.sameElements(b), "decode must be deterministic")
    assert(a.forall(_.getSeq[Float](2).size == 8))
    // identical content → identical embedding; different content → different
    assert(a(0).getSeq[Float](2) != a(1).getSeq[Float](2))
    // magic-byte fakes are not decodable images → fallback path, flagged
    assert(decoded.select("image_info.decoder").collect()
      .forall(_.getString(0) == "fallback"))
  }

  test("ImageIO decodes real PNG bytes: exact dims, channels, pixel sum, luma embedding") {
    val bytes = Multimodal.encodeSolidPng(20, 10, 100)
    val df = Seq((1L, bytes)).toDF("id", "content")
    // the real encoder emits real magic bytes: the sniffer sees a png
    assert(df.select(Multimodal.sniffFormat(col("content"))).collect()(0)
      .getString(0) == "png")
    val r = Multimodal.decodeImages(df, "content", embeddingDim = 4)
      .select("image_info.*").collect()(0)
    assert(r.getInt(0) == 20 && r.getInt(1) == 10)
    assert(r.getInt(2) == 3, "TYPE_3BYTE_BGR decodes to 3 bands")
    assert(r.getLong(3) == 20L * 10 * 3 * 100, "exact pixel sum of solid gray")
    assert(r.getString(4) == "imageio")
    val emb = r.getSeq[Float](5)
    assert(emb.size == 4 && emb.forall(v => math.abs(v - 100f / 255f) < 1e-6),
      s"solid gray 100 → uniform luma embedding, got $emb")
  }

  test("ImageIO decodes real JPEG and BMP bytes (dims exact)") {
    val img = new java.awt.image.BufferedImage(33, 17,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (fmt <- Seq("jpeg", "bmp")) {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      val df = Seq((1L, out.toByteArray)).toDF("id", "content")
      val r = Multimodal.decodeImages(df, "content")
        .select("image_info.width", "image_info.height", "image_info.decoder")
        .collect()(0)
      assert((r.getInt(0), r.getInt(1), r.getString(2)) == ((33, 17, "imageio")), fmt)
    }
  }

  test("renderSolidPngs → decodeImages round trip is closed-form verifiable") {
    val base = spark.range(1, 21).select(
      col("id"),
      (lit(8) + pmod(col("id"), lit(40))).cast("int").as("w"),
      (lit(8) + pmod(col("id") * 7, lit(30))).cast("int").as("h"),
      pmod(col("id") * 31, lit(256)).cast("int").as("gray"))
    val rendered = Multimodal.renderSolidPngs(base, "w", "h", "gray")
    val decoded = Multimodal.decodeImages(rendered, "content", embeddingDim = 4)
    val bad = decoded.filter(
      col("image_info.decoder") =!= "imageio" ||
        col("image_info.width") =!= col("w") ||
        col("image_info.height") =!= col("h") ||
        col("image_info.pixel_sum") =!=
          col("w").cast("long") * col("h") * 3 * col("gray")).count()
    assert(bad == 0, "every synthetic image decodes to its closed form")
  }

  test("resizeImages really rescales pixels (solid color survives bilinear resize)") {
    val df = Seq((1L, Multimodal.encodeSolidPng(40, 40, 50))).toDF("id", "content")
    val resized = Multimodal.resizeImages(df, "content", w = 8, h = 6)
    val r = Multimodal.decodeImages(resized, "content")
      .select("image_info.width", "image_info.height", "image_info.pixel_sum")
      .collect()(0)
    assert(r.getInt(0) == 8 && r.getInt(1) == 6)
    assert(r.getLong(2) == 8L * 6 * 3 * 50, "solid gray is invariant under resize")
    // undecodable rows pass through unchanged
    val junk = Seq((2L, Array[Byte](1, 2, 3))).toDF("id", "content")
    assert(Multimodal.resizeImages(junk, "content", 8, 6)
      .collect()(0).getAs[Array[Byte]](1).toSeq == Seq[Byte](1, 2, 3))
  }

  test("header-only dimension probe: exact dims without pixel decode") {
    val base = spark.range(1, 11).select(
      col("id"),
      (lit(8) + pmod(col("id"), lit(40))).cast("int").as("w"),
      (lit(8) + pmod(col("id") * 7, lit(30))).cast("int").as("h"),
      lit(128).as("gray"))
    val probed = Multimodal.probeImages(
      Multimodal.renderSolidPngs(base, "w", "h", "gray"), "content")
    val bad = probed.filter(
      col("image_dims.width") =!= col("w") ||
        col("image_dims.height") =!= col("h") ||
        col("image_dims.format") =!= "png").count()
    assert(bad == 0, "header probe reads exact dims for every image")
    // junk bytes probe to nulls, pipeline stays total
    val junk = Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "content")
    val j = Multimodal.probeImages(junk, "content").select("image_dims.*").collect()(0)
    assert(j.isNullAt(0) && j.isNullAt(2))
    // probe → filter → decode: the decode pass sees only the survivors
    val survivors = probed.filter(col("image_dims.width") > 30)
    val n = survivors.count()
    val decoded = Multimodal.decodeImages(survivors, "content")
    assert(decoded.count() == n &&
      decoded.filter(col("image_info.decoder") === "imageio").count() == n)
  }

  test("JavaSound decodes real WAV bytes: rate, frames, exact peak and RMS") {
    val bytes = Multimodal.encodeSquareWav(sampleRate = 8000, frames = 1234, amplitude = 3000)
    val df = Seq((1L, bytes)).toDF("id", "content")
    assert(df.select(Multimodal.sniffFormat(col("content"))).collect()(0)
      .getString(0) == "wav", "RIFF magic from the real encoder")
    val r = Multimodal.decodeAudios(df, "content").select("audio_info.*").collect()(0)
    assert(r.getInt(0) == 8000 && r.getInt(1) == 1)
    assert(r.getLong(2) == 1234L, "frame count")
    assert(r.getInt(3) == 3000, "square wave peak is the amplitude")
    assert(r.getDouble(4) == 3000.0, "square wave RMS is EXACTLY the amplitude")
    assert(r.getString(5) == "javasound")
    // undecodable bytes fall back, flagged
    val junk = Seq((2L, Array[Byte](9, 9, 9, 9))).toDF("id", "content")
    assert(Multimodal.decodeAudios(junk, "content")
      .select("audio_info.decoder").collect()(0).getString(0) == "fallback")
  }

  test("renderSquareWavs → decodeAudios round trip is closed-form verifiable") {
    val base = spark.range(1, 21).select(
      col("id"),
      (lit(800) + pmod(col("id"), lit(10)) * 80).cast("int").as("frames"),
      (lit(1000) + pmod(col("id") * 13, lit(50)) * 100).cast("int").as("amp"))
    val decoded = Multimodal.decodeAudios(
      Multimodal.renderSquareWavs(base, "frames", "amp"), "content")
    val bad = decoded.filter(
      col("audio_info.decoder") =!= "javasound" ||
        col("audio_info.frames") =!= col("frames").cast("long") ||
        col("audio_info.peak") =!= col("amp") ||
        col("audio_info.rms") =!= col("amp").cast("double") ||
        col("audio_info.sample_rate") =!= 8000).count()
    assert(bad == 0, "every synthetic WAV decodes to its closed form")
  }

  test("decoded embeddings flow into ANN search") {
    val decoded = Multimodal.decodeImages(fakeMedia, "content", embeddingDim = 8)
      .select(col("id"), col("image_info.embedding").as("embedding"))
    val q = decoded.filter(col("id") === 1)
      .select(col("embedding").cast("array<double>")).collect()(0).getSeq[Double](0)
    val top = VectorOps.cosineTopK(decoded, "id", "embedding", q, 2).collect()
    assert(top.head.getLong(0) == 1L, "nearest neighbor of a vector is itself")
  }

  test("MJPEG frame sampling extracts REAL decodable JPEG frames") {
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", out)
      out.toByteArray
    }
    // a 6-frame MJPEG "video": frame k is (10+k) x 7
    val mjpeg = (0 until 6).map(k => jpeg(10 + k, 7))
      .reduce(_ ++ _)
    val video = Seq((1L, mjpeg)).toDF("vid", "content")
    val frames = Multimodal.sampleMjpegFrames(video, "content", everyNth = 2)
    val idx = frames.select("frame_index").collect().map(_.getInt(0)).toSeq
    assert(idx == Seq(0, 2, 4), "every 2nd frame sampled")
    // each sampled frame is a complete JPEG: decode dims via the probe
    val dims = Multimodal.probeImages(
      frames.withColumnRenamed("frame_bytes", "fb"), "fb")
      .select("frame_index", "image_dims.width", "image_dims.height")
      .orderBy("frame_index").collect()
    assert(dims.map(r => (r.getInt(1), r.getInt(2))).toSeq ==
      Seq((10, 7), (12, 7), (14, 7)),
      "sampled frames decode to their own dimensions")
    // non-MJPEG bytes yield zero frames (pipeline total, no throw)
    assert(Multimodal.sampleMjpegFrames(
      Seq((2L, Array[Byte](1, 2, 3))).toDF("vid", "content"), "content").count() == 0)
  }

  test("frame sampling fans out deterministically and flags stubbed rows") {
    // an opaque container (no JPEG SOI prefix): stub path, flagged
    val video = Seq((1L, Array.tabulate(3000)(i => (i % 100 + 3).toByte)))
      .toDF("id", "content")
    val frames = Multimodal.sampleFrames(video, "content", everyNth = 1)
    assert(frames.count() == 4) // 3000/1000 + 1 = 4 frames
    val idx = frames.select("frame_index").collect().map(_.getInt(0)).toSeq
    assert(idx == Seq(0, 1, 2, 3))
    // every stub row carries the routing flag — a pipeline can divert
    // decoder='stub-slice' rows to an external decode service
    assert(frames.select("decoder").collect().forall(_.getString(0) == "stub-slice"))
  }

  test("dHash is closed-form on block fixtures and survives resize + jpeg") {
    // independent re-derivation of the fixture's gray walk → expected bits
    def expectedHash(seed: Long): Long = {
      def raw(bx: Int, by: Int): Int = {
        var h = seed * 6364136223846793005L + (by * 9 + bx) * 1442695040888963407L
        h ^= (h >>> 29); h *= -7723592293110705685L; h ^= (h >>> 32)
        math.floorMod(h, 12).toInt
      }
      var bits = 0L
      for (by <- 0 until 8) {
        val g = new Array[Int](9)
        for (bx <- 0 until 9) {
          var v = raw(bx, by)
          if (bx > 0 && 32 + 16 * v == g(bx - 1)) v = (v + 1) % 12
          g(bx) = 32 + 16 * v
        }
        for (bx <- 0 until 8)
          if (g(bx + 1) > g(bx)) bits |= 1L << (by * 8 + bx)
      }
      bits
    }
    val orig = Multimodal.encodeBlockPng(90, 80, seed = 7L)
    assert(Multimodal.dHash64(orig) == expectedHash(7L)) // closed-form oracle
    assert(Multimodal.dHash64(Array[Byte](1, 2, 3)) == null) // undecodable

    // twins: bilinear downscale and lossy jpeg re-encode of each pattern
    val base = (1L to 5L).map(s => (s, 90, 80, s)).toDF("id", "w", "h", "seed")
    val originals = Multimodal.renderBlockPngs(base, "w", "h", "seed")
      .select("id", "content")
    val resized = Multimodal.resizeImages(
      originals.withColumn("id", col("id") + 100), "content", 45, 40)
    val jpegs = Multimodal.transcodeImages(
      originals.withColumn("id", col("id") + 200), "content", "jpeg")
    val junk = Seq((999L, Array[Byte](9, 9, 9))).toDF("id", "content")
    val all = originals.unionByName(resized).unionByName(jpegs).unionByName(junk)
    val pairs = Multimodal.dHashPairs(all, "id", "content", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    // every pattern groups exactly with its two twins — nothing across
    // patterns, the junk row silently excluded
    val want = (1L to 5L).flatMap(s =>
      Seq((s, s + 100), (s, s + 200), (s + 100, s + 200))).toSet
    assert(pairs.map(p => (p._1, p._2)) == want,
      s"got=${pairs.toSeq.sorted} want=${want.toSeq.sorted}")
    // the fixture's >=16-level adjacent gaps make the hash EXACTLY stable
    // under both transforms
    assert(pairs.forall(_._3 == 0L), pairs.toString)
  }

  test("audio fingerprint is closed-form on segment fixtures and survives gain") {
    // expected bits derived independently from the segment amplitudes:
    // segment s's mean |sample| IS its amplitude (square wave), windows
    // align with segments, bit = rising energy
    def expectedFp(seed: Long): Long = {
      val amps = Multimodal.segmentAmps(seed)
      (0 until 64).foldLeft(0L)((b, i) =>
        if (amps(i + 1) > amps(i)) b | (1L << i) else b)
    }
    val wav = Multimodal.encodeSegmentWav(8000, seed = 11L)
    assert(Multimodal.audioFingerprint64(wav) == expectedFp(11L))
    assert(Multimodal.audioFingerprint64(Array[Byte](1, 2, 3)) == null)

    // twins: half and quarter volume — byte-distinct, fingerprint-equal
    val base = (1L to 5L).map(s => (s, s)).toDF("id", "seed")
    val originals = Multimodal.renderSegmentWavs(base, "seed")
      .select("id", "content")
    val half = Multimodal.scaleWavVolume(
      originals.withColumn("id", col("id") + 100), "content", 1, 2)
    val quarter = Multimodal.scaleWavVolume(
      originals.withColumn("id", col("id") + 200), "content", 1, 4)
    val junk = Seq((999L, Array[Byte](7, 7, 7))).toDF("id", "content")
    val all = originals.unionByName(half).unionByName(quarter).unionByName(junk)
    val pairs = Multimodal.audioFingerprintPairs(all, "id", "content")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    val want = (1L to 5L).flatMap(s =>
      Seq((s, s + 100), (s, s + 200), (s + 100, s + 200))).toSet
    assert(pairs.map(p => (p._1, p._2)) == want,
      s"got=${pairs.toSeq.sorted} want=${want.toSeq.sorted}")
    // >=1024-step adjacent gaps make the hash EXACTLY stable under gain
    assert(pairs.forall(_._3 == 0L), pairs.toString)
  }

  test("video near-dup: frame-dHash voting pairs rescaled copies, not partial overlaps") {
    def seeds(g: Long): Seq[Long] = Seq(g * 10 + 1, g * 10 + 2, g * 10 + 3)
    val vids = Seq(
      (1L, seeds(1), 90, 80),             // original
      (31L, seeds(1), 45, 40),            // rescaled FULL twin (all 3 frames)
      (61L, Seq(13L, 901L, 902L), 90, 80), // shares ONE frame with video 1
      (2L, seeds(2), 90, 80))             // unrelated
      .toDF("id", "seeds", "w", "h")
    val withJunk = Multimodal.renderBlockMjpegs(vids, "seeds", "w", "h")
      .select("id", "content")
      .unionByName(Seq((99L, Array[Byte](1, 2, 3))).toDF("id", "content"))
    val pairs = Multimodal.videoDHashPairs(withJunk, "id", "content",
      minMatches = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 31L, 3L)), pairs.toString)
    // at minMatches=1 the single-shared-frame overlaps surface too
    val loose = Multimodal.videoDHashPairs(withJunk, "id", "content",
      minMatches = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == Set((1L, 31L), (1L, 61L), (31L, 61L)), loose.toString)
  }

  test("sampleFrames routes MJPEG content to the REAL decode path") {
    val realJpegs = (0 until 3).map { i =>
      val img = new java.awt.image.BufferedImage(8 + i, 5,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val mjpeg = realJpegs.flatten.toArray
    val df = Seq((7L, mjpeg)).toDF("id", "content")
    val frames = Multimodal.sampleFrames(df, "content", everyNth = 1)
    val rows = frames.select("frame_index", "decoder").orderBy("frame_index")
      .collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getString(1) == "mjpeg"),
      "MJPEG content must not be stubbed")
  }
}
