package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build the N× documents corpus for [[ScaleStress]] (BASELINE.md
  * §scaling): every sf doc replicated `mult` times with distinct doc_ids;
  * replica 0 keeps the original text, replicas >0 get a deterministic
  * per-replica word shuffle — same token distribution, but shuffled
  * replicas share no shingles with anything, so the TRUE near-dup pair
  * structure stays that of the 1× corpus and only corpus size grows.
  *
  * {{{
  *   runMain graft.MakeScaledDocs /root/testdata/sf0.1/documents.parquet /tmp/docs_100x.parquet 100
  * }}}
  */
object MakeScaledDocs {
  def main(args: Array[String]): Unit = {
    val (in, out, mult) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.hadoop." + graft.spark.NioLocalFileSystem.ConfKey,
        graft.spark.NioLocalFileSystem.ConfValue)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.read.parquet(in)
    val maxId = docs.agg(max("doc_id")).collect()(0).getLong(0) + 1
    // deterministic per-(doc, replica) word permutation: order words by
    // xxhash64(word, doc_id, rep) — a seeded pseudo-shuffle with no RNG,
    // reproducible across runs
    val scaled = docs
      .crossJoin(spark.range(0, mult).toDF("rep"))
      .withColumn("new_id", col("doc_id") + col("rep") * maxId)
      .withColumn("text",
        when(col("rep") === 0, col("text")).otherwise(
          array_join(
            transform(
              array_sort(transform(split(col("text"), " "),
                w => struct(xxhash64(w, col("doc_id"), col("rep")).as("h"),
                  w.as("w")))),
              s => s.getField("w")),
            " ")))
      .drop("doc_id", "rep")
      .withColumnRenamed("new_id", "doc_id")
    scaled.repartition(32).write.mode("overwrite").parquet(out)
    println(s"""{"metric":"make_scaled_docs","docs":${spark.read.parquet(out).count()},"out":"$out"}""")
    spark.stop()
  }
}
