package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of the minhash near-dup pipeline at a given corpus
  * (companion to [[ScaleStress]]): times the shingle pass, the full
  * signature projection, candidate generation, and the verified pipeline
  * separately so a superlinear total can be attributed to a stage.
  */
object ScaleProfile {
  def main(args: Array[String]): Unit = {
    val docsPath = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.hadoop." + graft.spark.NioLocalFileSystem.ConfKey,
        graft.spark.NioLocalFileSystem.ConfValue)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(docsPath)
    val n = docs.count()
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val out = f
      println(f"""{"op":"$label","sec":${(System.nanoTime() - t0) / 1e9}%.3f,"out":"$out","docs":$n}""")
    }
    time("shingle_pass") {
      docs.select(Dedup.shingles(col("text")).as("sh"))
        .agg(sum(size(col("sh")))).collect()(0).getLong(0)
    }
    time("shingle_hash_pass") {
      docs.select(Dedup.shingleHashes(col("text")).as("hs"))
        .agg(sum(size(col("hs")))).collect()(0).getLong(0)
    }
    time("signatures") {
      docs.select(graft.pipeline.Dedup
        .minhashSignature(Dedup.shingleHashes(col("text")), 64).as("sig"))
        .agg(sum(size(col("sig")))).collect()(0).getLong(0)
    }
    time("lsh_candidates") {
      Dedup.lshCandidatePairs(docs, "doc_id", "text").count()
    }
    time("bucket_histogram") {
      val sigs = docs.select(col("doc_id"),
        Dedup.minhashSignature(Dedup.shingleHashes(col("text")), 64).as("sig"))
      val bandStructs = (0 until 16).map { b =>
        val slots = (b * 4 until (b + 1) * 4).map(s => element_at(col("sig"), s + 1))
        struct(lit(b).as("band"), hash(slots: _*).cast("long").as("bucket"))
      }
      val top = sigs.select(explode(array(bandStructs: _*)).as("bk"))
        .groupBy("bk.band", "bk.bucket").count()
        .orderBy(desc("count")).limit(12).collect()
      top.map(r => s"${r.getInt(0)}/${r.getLong(2)}").mkString(" ")
    }
    time("near_dup_full") {
      Dedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.7).count()
    }
    spark.stop()
  }
}
