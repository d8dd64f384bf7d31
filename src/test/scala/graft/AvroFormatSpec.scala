package graft

import graft.table.GraftTable
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `file.format=avro` end-to-end: the engine's own Avro FileFormat
  * (avro-core jars; see GraftAvroFileFormat) under append tables, PK
  * merge-on-read, partition pruning, compaction, codecs and the full
  * supported type lattice.
  */
class AvroFormatSpec extends SparkSpec {

  test("avro append table: write, scan, filter, partition pruning") {
    val li = sf("lineitem").limit(2000).cache()
    val t = GraftTable.create(spark, tmpTable(), li.schema,
      partitionKeys = Seq("l_returnflag"),
      options = Map("file.format" -> "avro"))
    t.append(li)
    assert(t.toDF.count() == 2000)
    // content equality, not just counts
    assert(t.toDF.exceptAll(li).isEmpty && li.exceptAll(t.toDF).isEmpty)
    // partition pruning + a value filter through the avro reader
    val expected = li.filter(col("l_returnflag") === "R" && col("l_quantity") < 10).count()
    assert(t.toDF.filter(col("l_returnflag") === "R" && col("l_quantity") < 10)
      .count() == expected)
    // column pruning path (projected read uses an avro reader projection)
    val sums = t.toDF.agg(sum("l_quantity")).collect()(0).getDouble(0)
    val exp = li.agg(sum("l_quantity")).collect()(0).getDouble(0)
    assert(math.abs(sums - exp) < 1e-6)
  }

  test("avro early-terminated scan (LIMIT) closes readers via task-completion listener") {
    val li = sf("lineitem").limit(5000)
    val t = GraftTable.create(spark, tmpTable(), li.schema,
      options = Map("file.format" -> "avro"))
    t.append(li.repartition(8)) // several files, none exhausted by LIMIT 3
    assert(t.toDF.limit(3).collect().length == 3)
    // the table stays fully readable afterwards (no handle poisoned)
    assert(t.toDF.count() == 5000)
  }

  test("avro pk table: upsert, MOR merge, compaction, delete") {
    val orders = sf("orders").limit(300).cache()
    val t = GraftTable.create(spark, tmpTable(), orders.schema,
      primaryKeys = Seq("o_orderkey"),
      options = Map("bucket" -> "2", "file.format" -> "avro", "write-only" -> "true"))
    t.upsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2))
    assert(t.toDF.count() == 300)
    val doubled = t.toDF.filter(col("o_orderkey") % 3 === 0)
      .select(sum("o_totalprice")).collect()(0).getDouble(0)
    val base = orders.filter(col("o_orderkey") % 3 === 0)
      .select(sum("o_totalprice") * 2).collect()(0).getDouble(0)
    assert(math.abs(doubled - base) < 1e-6)
    t.compact()
    assert(t.toDF.count() == 300)
    t.delete(col("o_orderkey") % 5 === 0)
    assert(t.toDF.count() == 300 - orders.filter(col("o_orderkey") % 5 === 0).count())
  }

  test("avro preserves arrays, maps, structs, decimals, dates, binary, nulls") {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType),
      StructField("d", DateType),
      StructField("ts", TimestampType),
      StructField("dec", DecimalType(12, 3)),
      StructField("bin", BinaryType),
      StructField("arr", ArrayType(FloatType)),
      StructField("m", MapType(StringType, LongType)),
      StructField("st", StructType(Seq(
        StructField("a", IntegerType), StructField("b", StringType))))))
    val rows = Seq(
      Row(1L, "x", java.sql.Date.valueOf("2024-03-01"),
        java.sql.Timestamp.valueOf("2024-03-01 10:30:00"),
        new java.math.BigDecimal("12345.678"), Array[Byte](1, 2, 3),
        Seq(1.5f, -2.25f), Map("k1" -> 10L, "k2" -> 20L), Row(7, "y")),
      Row(2L, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(rows.asJava, schema)
    val t = GraftTable.create(spark, tmpTable(), schema,
      options = Map("file.format" -> "avro"))
    t.append(df)
    val back = t.toDF.orderBy("id").collect()
    assert(back.length == 2)
    val r = back(0)
    assert(r.getString(1) == "x")
    assert(r.getDate(2) == java.sql.Date.valueOf("2024-03-01"))
    assert(r.getTimestamp(3) == java.sql.Timestamp.valueOf("2024-03-01 10:30:00"))
    assert(r.getDecimal(4) == new java.math.BigDecimal("12345.678"))
    assert(r.getAs[Array[Byte]](5).toSeq == Seq[Byte](1, 2, 3))
    assert(r.getSeq[Float](6) == Seq(1.5f, -2.25f))
    assert(r.getMap[String, Long](7) == Map("k1" -> 10L, "k2" -> 20L))
    assert(r.getStruct(8) == Row(7, "y"))
    val n = back(1)
    (1 to 8).foreach(i => assert(n.isNullAt(i), s"field $i should be null"))
  }

  test("avro compression codecs round-trip (zstd, gzip->deflate, none)") {
    val docs = sf("documents").limit(200).cache()
    for (codec <- Seq("zstd", "gzip", "none")) {
      val t = GraftTable.create(spark, tmpTable(), docs.schema,
        options = Map("file.format" -> "avro", "file.compression" -> codec))
      t.append(docs)
      assert(t.toDF.count() == 200, s"codec $codec")
    }
  }

  test("avro stats support file skipping") {
    val li = sf("lineitem").limit(2000)
    val t = GraftTable.create(spark, tmpTable(), li.schema,
      options = Map("file.format" -> "avro"))
    // two appends with disjoint quantity ranges → two files, one skippable
    t.append(li.filter(col("l_quantity") < 25))
    t.append(li.filter(col("l_quantity") >= 25))
    val snap = t.store.latestSnapshot.get
    val files = t.store.liveFiles(snap)
    assert(files.size >= 2)
    // the scan-stats pass populated per-file min/max for avro files
    assert(files.forall(_.stats.get("l_quantity").exists(s => s.min.isDefined && s.max.isDefined)))
    val typeOf = (c: String) => li.schema.fields.find(_.name == c).map(_.dataType)
    val skipped = files.count(f => !graft.core.Pruning.mightMatch(
      org.apache.spark.sql.sources.LessThan("l_quantity", 5.0), typeOf, f.stats, f.rowCount))
    assert(skipped >= 1, "stats pruning should rule out the >=25 file(s)")
  }

  test("avro schema evolution: add + rename remap old files by field id") {
    val orders = sf("orders").limit(100)
    val t = GraftTable.create(spark, tmpTable(), orders.schema,
      primaryKeys = Seq("o_orderkey"),
      options = Map("bucket" -> "2", "file.format" -> "avro"))
    t.upsert(orders)
    t.addColumn("note", StringType)
    t.renameColumn("o_orderpriority", "priority")
    val df2 = t.toDF
    // old avro files: the missing 'note' null-fills, 'priority' reads the
    // old column through the field-id remap
    assert(df2.filter(col("note").isNotNull).count() == 0)
    assert(df2.filter(col("priority").isNotNull).count() == 100)
    val newRows = orders.limit(10)
      .withColumn("note", lit("hello"))
      .withColumnRenamed("o_orderpriority", "priority")
      .withColumn("o_orderkey", col("o_orderkey") + 1000000)
    t.upsert(newRows)
    assert(t.toDF.count() == 110)
    assert(t.toDF.filter(col("note") === "hello").count() == 10)
  }

  test("file.format.per.level: avro L0 runs, parquet compacted base") {
    val orders = sf("orders").limit(300).cache()
    val t = GraftTable.create(spark, tmpTable(), orders.schema,
      primaryKeys = Seq("o_orderkey"),
      options = Map("bucket" -> "2", "write-only" -> "true",
        "file.format.per.level" -> s"0:avro,${GraftTable.MaxLevel}:parquet"))
    t.upsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2))
    val live0 = t.store.liveFiles(t.store.latestSnapshot.get)
    assert(live0.forall(f => f.path.endsWith(".avro")), "L0 runs are avro")
    // merge-on-read over avro L0 runs
    assert(t.toDF.count() == 300)
    t.compact()
    val liveC = t.store.liveFiles(t.store.latestSnapshot.get)
    assert(liveC.exists(f => f.path.endsWith(".parquet")),
      s"compacted base is parquet: ${liveC.map(_.path.split('/').last)}")
    assert(t.toDF.count() == 300)
    // MIXED read: a fresh avro L0 run on top of the parquet base, through
    // both the library MOR path and the DSv2 SQL path
    t.upsert(orders.limit(10).withColumn("o_orderpriority", lit("X")))
    val live2 = t.store.liveFiles(t.store.latestSnapshot.get)
    assert(live2.exists(_.path.endsWith(".avro")) && live2.exists(_.path.endsWith(".parquet")),
      "mixed avro+parquet live set")
    assert(t.toDF.count() == 300)
    assert(t.toDF.filter(col("o_orderpriority") === "X").count() == 10)
    // expected content: %3 keys doubled by batch 2, except those the third
    // upsert reset to their original price
    val keys10 = orders.limit(10).select("o_orderkey").collect().map(_.getLong(0)).toSeq
    val doubled = t.toDF
      .filter(col("o_orderkey") % 3 === 0 && !col("o_orderkey").isin(keys10: _*))
      .agg(sum("o_totalprice")).collect()(0).getDouble(0)
    val exp = orders
      .filter(col("o_orderkey") % 3 === 0 && !col("o_orderkey").isin(keys10: _*))
      .agg(sum(col("o_totalprice") * 2)).collect()(0).getDouble(0)
    assert(math.abs(doubled - exp) < 1e-6)
  }

  test("avro nested evolution: struct children remap by field id across versions") {
    import spark.implicits._
    val df = Seq((1L, ("alice", 30))).toDF("id", "person")
      .select(col("id"), col("person").cast("struct<name:string,age:int>"))
    val t = GraftTable.create(spark, tmpTable(), df.schema,
      options = Map("file.format" -> "avro"))
    t.append(df)
    t.renameColumn("person.name", "nick")
    t.addColumn("person.vip", BooleanType)
    t.append(Seq((2L, ("bob", 25, true))).toDF("id", "person")
      .select(col("id"), col("person").cast("struct<nick:string,age:int,vip:boolean>")))
    val rows = t.toDF.select("id", "person.nick", "person.vip").orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("alice", "bob"))
    assert(rows.map(r => Option(r.get(2))).toSeq == Seq(None, Some(true)))
  }

  test("SQL DDL with file.format=avro through the catalog") {
    val wh = java.nio.file.Files.createTempDirectory("graft-avrowh").toString
    spark.conf.set("spark.sql.catalog.gavro", classOf[graft.spark.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gavro.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gavro.db")
    spark.sql(
      """CREATE TABLE gavro.db.t (id BIGINT, v STRING) USING graft
        |TBLPROPERTIES ('file.format' = 'avro')""".stripMargin)
    spark.sql("INSERT INTO gavro.db.t VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql("SELECT * FROM gavro.db.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a"), (2L, "b")))
  }
}
