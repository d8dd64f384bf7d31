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
    assert(a.sameElements(b), "stub decode must be deterministic")
    assert(a.forall(_.getSeq[Float](2).size == 8))
    // identical content → identical embedding; different content → different
    assert(a(0).getSeq[Float](2) != a(1).getSeq[Float](2))
  }

  test("decoded embeddings flow into ANN search") {
    val decoded = Multimodal.decodeImages(fakeMedia, "content", embeddingDim = 8)
      .select(col("id"), col("image_info.embedding").as("embedding"))
    val q = decoded.filter(col("id") === 1)
      .select(col("embedding").cast("array<double>")).collect()(0).getSeq[Double](0)
    val top = VectorOps.cosineTopK(decoded, "id", "embedding", q, 2).collect()
    assert(top.head.getLong(0) == 1L, "nearest neighbor of a vector is itself")
  }

  test("frame sampling fans out deterministically") {
    val video = Seq((1L, Array.tabulate(3000)(_.toByte))).toDF("id", "content")
    val frames = Multimodal.sampleFrames(video, "content", everyNth = 1)
    assert(frames.count() == 4) // 3000/1000 + 1 = 4 frames
    val idx = frames.select("frame_index").collect().map(_.getInt(0)).toSeq
    assert(idx == Seq(0, 1, 2, 3))
  }
}
