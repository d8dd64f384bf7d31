package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession

/** One-off scaling datapoint for the dedup pipeline (BASELINE.md §scaling):
  * runs the three heaviest pipeline ops once on an arbitrary documents
  * parquet and prints one JSON line of wall-times. Drive it at 1× and 10×
  * corpus size to verify the plan shapes' slopes are ~linear — the 100-TB
  * claims rest on shapes (band-local joins, prefix filters, label
  * propagation), and this is the cheap empirical check.
  *
  * {{{
  *   runMain graft.ScaleStress /root/testdata/sf0.1/documents.parquet
  *   runMain graft.ScaleStress /tmp/docs_10x.parquet
  * }}}
  */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val docsPath = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(docsPath)
    val n = docs.count()
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val out = f
      ((System.nanoTime() - t0) / 1e9, out)
    }
    val (tMinhash, pairs) =
      time(Dedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.7).count())
    val (tJaccard, _) =
      time(Dedup.jaccardJoin(docs, "doc_id", "text", threshold = 0.7).count())
    val pairDf = Dedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.7)
    val (tClusters, clusters) = time(Dedup.dupClusters(pairDf).count())
    println(f"""{"metric":"scale_stress","docs":$n,"minhash_dedup":$tMinhash%.3f,"jaccard_join":$tJaccard%.3f,"dup_clusters":$tClusters%.3f,"pairs":$pairs,"clustered_ids":$clusters,"path":"$docsPath"}""")
    spark.stop()
  }
}
