package graft

import graft.table.GraftTable
import org.apache.spark.sql.functions._

class OrcPkSpec extends SparkSpec {
  test("ORC pk table: upsert, both merge paths, compaction, delete") {
    val wh = java.nio.file.Files.createTempDirectory("graft-orcwh").toString
    spark.conf.set("spark.sql.catalog.gorc", classOf[graft.spark.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gorc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gorc.db")
    val orders = sf("orders").limit(300).cache()
    val t = GraftTable.create(spark, s"$wh/db/orc_pk", orders.schema,
      primaryKeys = Seq("o_orderkey"),
      options = Map("bucket" -> "2", "file.format" -> "orc", "write-only" -> "true"))
    t.upsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2))
    val viaDf = t.toDF.orderBy("o_orderkey").collect()
    assert(viaDf.length == 300)
    val viaScan = spark.sql("SELECT * FROM gorc.db.orc_pk ORDER BY o_orderkey").collect()
    assert(viaScan.length == 300)
    t.compact()
    assert(t.toDF.count() == 300)
    t.delete(col("o_orderkey") % 5 === 0)
    assert(t.toDF.count() == 300 - orders.filter(col("o_orderkey") % 5 === 0).count())
  }
}
