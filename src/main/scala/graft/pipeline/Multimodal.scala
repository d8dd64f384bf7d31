package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for training-data pipelines:
  * media travels as opaque `binary` columns + typed metadata structs, and
  * per-item compute (decode, feature extraction, frame sampling) runs as
  * BATCHED partition-local transforms — the Spark-side plumbing (schemas,
  * batch shape, partitioning, fan-out) is real and tested.
  *
  * The actual codecs are STUBBED with deterministic content-hash fakes
  * (`stubDecode*`): this environment ships no image/audio libraries, so the
  * decode kernel is the single seam to swap for a real implementation
  * (e.g. a JNI decoder or a Pandas-UDF worker); everything around it —
  * batching, schema contracts, explode semantics — is production-shaped.
  */
object Multimodal {

  /** Schema convention for an opaque media column + sidecar metadata. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),  // image | audio | video
    StructField("format", StringType),      // jpeg | png | wav | mp4 ...
    StructField("size_bytes", LongType)))

  val ImageInfoSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
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

  /** STUB decode kernel: deterministic pseudo-image info + embedding from
    * the content bytes. Replace this one function with a real decoder; the
    * signature (bytes in, typed struct out, called once per item inside a
    * batch) is the production contract.
    */
  def stubDecodeImage(content: Array[Byte], embeddingDim: Int): Row = {
    if (content == null) return Row(null, null, null, null)
    var h = 1125899906842597L
    var i = 0
    while (i < math.min(content.length, 256)) { h = 31 * h + content(i); i += 1 }
    def next(): Long = { h = h * 6364136223846793005L + 1442695040888963407L; h }
    val w = 64 + math.floorMod(next(), 1024).toInt
    val ht = 64 + math.floorMod(next(), 1024).toInt
    val emb = Array.fill(embeddingDim)(math.floorMod(next(), 2000).toFloat / 1000f - 1f)
    Row(w, ht, 3, emb.toSeq)
  }

  /** Batched partition-local image decode: groups each partition's rows
    * into `batchSize` chunks (the shape a vectorized decoder / Pandas UDF
    * worker expects), decodes per item, and appends an `image_info` struct.
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
        // batch boundary: a real decoder would process `batch` in one
        // vectorized call; the stub decodes item-wise
        batch.map { r =>
          val info = stubDecodeImage(r.getAs[Array[Byte]](contentIdx), embeddingDim)
          Row.fromSeq(r.toSeq :+ info)
        }
      }
    }(enc)
  }

  /** STUB video frame sampler: every-nth-frame metadata (deterministic
    * frame count from content length). Fan-out: one row per sampled frame
    * via explode — the real sampler only changes what `frame_bytes` holds.
    */
  def sampleFrames(df: DataFrame, contentCol: String, everyNth: Int = 30): DataFrame = {
    val frameCount = (length(col(contentCol)) / 1000 + 1).cast(IntegerType)
    val frames = transform(
      sequence(lit(0), greatest(floor(frameCount / everyNth).cast(IntegerType) - 1, lit(0))),
      i => struct(
        (i * everyNth).as("frame_index"),
        // stub frame payload: a content slice standing in for a decoded frame
        substring(col(contentCol), i * everyNth + 1, lit(256)).as("frame_bytes")))
    df.withColumn("frame", explode(frames))
      .withColumn("frame_index", col("frame.frame_index"))
      .withColumn("frame_bytes", col("frame.frame_bytes"))
      .drop("frame")
  }

  /** Resize as a metadata transform on decoded info (the stub keeps the
    * embedding; a real implementation would re-decode at target size).
    */
  def resizeInfo(df: DataFrame, infoCol: String, w: Int, h: Int): DataFrame =
    df.withColumn(infoCol, struct(
      lit(w).as("width"), lit(h).as("height"),
      col(s"$infoCol.channels").as("channels"),
      col(s"$infoCol.embedding").as("embedding")))
}
