package graft

import graft.table.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scaling datapoint for the WRITE path (BASELINE.md §scaling):
  * the same upsert / mor_read / compact flow as [[Bench]], driven at 1× and
  * N× row counts to measure the slope — fixed table config (16 buckets),
  * growing data, exactly the shape a 100-TB deployment would see between
  * re-bucketing decisions.
  *
  * {{{
  *   runMain graft.WriteScaleStress /root/testdata/sf0.1 1
  *   runMain graft.WriteScaleStress /root/testdata/sf0.1 10
  * }}}
  */
object WriteScaleStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mult = if (args.length > 1) args(1).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.hadoop." + graft.spark.NioLocalFileSystem.ConfKey,
        graft.spark.NioLocalFileSystem.ConfValue)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Fixtures.src(spark, sfDir, "orders")
    val maxKey = base.agg(max("o_orderkey")).collect()(0).getLong(0) + 1
    // mult× rows with disjoint key ranges — same key distribution per slab
    val orders = (0 until mult).map(i =>
      base.withColumn("o_orderkey", col("o_orderkey") + lit(i * maxKey)))
      .reduce(_.unionByName(_)).cache()
    val n = orders.count() // materialize: time the engine, not the source

    val dir = java.nio.file.Files.createTempDirectory("graft-wstress").toString
    def time(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val pk = GraftTable.create(spark, s"$dir/orders_pk", orders.schema,
      primaryKeys = Seq("o_orderkey"), options = Map("bucket" -> "16"))
    val tUpsert = time {
      pk.upsert(orders)
      pk.upsert(orders.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2))
    }
    val tMor = time(pk.toDF.count())
    val tCompact = time(pk.compact())
    val tCompacted = time(pk.toDF.count())
    println(f"""{"metric":"write_scale_stress","rows":$n,"mult":$mult,"upsert":$tUpsert%.3f,"mor_read":$tMor%.3f,"compact":$tCompact%.3f,"compacted_read":$tCompacted%.3f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
