package graft

import graft.table.GraftTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Write-time CHAR/VARCHAR length semantics — the SURVEY §1.2 mapping
  * ("StringType + length check on write"; reference: paimon-common
  * schema/SchemaValidation.java validates declared lengths). ANSI rules,
  * matching Spark's own charVarcharTypeWriteSideCheck: within-length
  * values pass, excess TRAILING spaces trim to fit, anything still longer
  * fails the write; CHAR additionally right-pads to the declared width.
  */
class CharVarcharSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(): GraftTable =
    GraftTable.create(spark, tmpTable(), StructType(Seq(
      StructField("k", IntegerType, nullable = false),
      StructField("c", CharType(4)),
      StructField("v", VarcharType(6)))))

  test("declared char/varchar survive as StringType + enforced lengths") {
    val t = mkTable()
    // the physical schema is string; the DECLARED form survives in the
    // persisted field and in Spark's raw-type metadata
    assert(t.schema.fields.map(_.sparkType).toSeq ===
      Seq(IntegerType, StringType, StringType))
    assert(t.schema.fields.find(_.name == "c").get.dataType.toLowerCase == "char(4)")
    assert(t.schema.fields.find(_.name == "v").get.dataType.toLowerCase == "varchar(6)")
    assert(t.schema.structType("c").metadata
      .getString(graft.core.Field.CharVarcharKey) == "char(4)")

    // within-length passes; char pads to 4; varchar stores as-is
    t.write(Seq((1, "ab", "hello"), (2, "wxyz", "sixsix")).toDF("k", "c", "v"))
    val rows = t.toDF.orderBy("k").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq ===
      Seq((1, "ab  ", "hello"), (2, "wxyz", "sixsix")))

    // excess TRAILING spaces trim to the declared length (ANSI)
    t.write(Seq((3, "ab    ", "four      ")).toDF("k", "c", "v"))
    val r3 = t.toDF.filter($"k" === 3).collect()(0)
    assert(r3.getString(1) === "ab  ") // trimmed to 4 then char-padded
    assert(r3.getString(2) === "four  ") // trimmed to 6 (trailing spaces kept up to n)

    // nulls pass through
    t.write(Seq((4, null: String, null: String)).toDF("k", "c", "v"))
    val r4 = t.toDF.filter($"k" === 4).collect()(0)
    assert(r4.isNullAt(1) && r4.isNullAt(2))

    // over-length non-space content fails the write, naming the column
    val eC = intercept[Exception] {
      t.write(Seq((9, "abcde", "ok")).toDF("k", "c", "v"))
    }
    assert(eC.getMessage.contains("char(4)") && eC.getMessage.contains("'c'"),
      eC.getMessage)
    val eV = intercept[Exception] {
      t.write(Seq((9, "ok", "sevens7")).toDF("k", "c", "v"))
    }
    assert(eV.getMessage.contains("varchar(6)") && eV.getMessage.contains("'v'"),
      eV.getMessage)
    // failed writes committed nothing
    assert(t.toDF.count() === 4)
  }

  test("nested char/varchar strips to string and writes work (no cast rejection)") {
    // ARRAY<VARCHAR(5)>: Spark stamps the raw type string on the replaced
    // field; the declared form must NOT resurrect VarcharType at runtime
    // (Column.cast rejects it) — nested lengths are simply not enforced
    val md = new MetadataBuilder()
      .putString(graft.core.Field.CharVarcharKey, "array<varchar(5)>").build()
    val t = GraftTable.create(spark, tmpTable(), StructType(Seq(
      StructField("k", IntegerType, nullable = false),
      StructField("a", ArrayType(StringType), metadata = md))))
    assert(t.schema.fields.find(_.name == "a").get.sparkType ===
      ArrayType(StringType))
    t.write(Seq((1, Seq("way-too-long-for-five", "ok"))).toDF("k", "a"))
    val r = t.toDF.collect()(0)
    assert(r.getSeq[String](1) === Seq("way-too-long-for-five", "ok"))
    // a PERSISTED pre-fix field carrying the nested raw string still reads
    assert(graft.core.Field(9, "x", "array<varchar(5)>").sparkType ===
      ArrayType(StringType))
  }

  test("CHAR partition keys are rejected at create; VARCHAR partition keys pass") {
    // CHAR right-pads before partitioning, which would bake trailing
    // spaces into partition directory names — create must fail loud
    val e = intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpTable(), StructType(Seq(
        StructField("k", IntegerType, nullable = false),
        StructField("r", CharType(3)))), partitionKeys = Seq("r"))
    }
    assert(e.getMessage.contains("char(3)") &&
      e.getMessage.contains("partition"), e.getMessage)
    // varchar doesn't pad — fine as a partition key, and values
    // round-trip through partition paths unchanged
    val t = GraftTable.create(spark, tmpTable(), StructType(Seq(
      StructField("k", IntegerType, nullable = false),
      StructField("r", VarcharType(3)))), partitionKeys = Seq("r"))
    t.write(Seq((1, "ab"), (2, "xyz")).toDF("k", "r"))
    assert(t.toDF.orderBy("k").collect().map(_.getString(1)).toSeq ===
      Seq("ab", "xyz"))
    assert(t.toDF.filter($"r" === "ab").count() === 1)
  }

  test("pre-existing CHAR partition keys do not block schema evolution") {
    // the CHAR-partition reject is CREATE-only (schema id 0): a table
    // created before the reject existed must stay alterable — partition
    // keys can never change, so re-rejecting on every evolved schema
    // would leave such a table permanently frozen
    val dir = tmpTable()
    val store = new graft.core.FileStore(dir,
      spark.sessionState.newHadoopConf())
    store.commitSchema(graft.core.TableSchema.create(StructType(Seq(
      StructField("k", IntegerType, nullable = false),
      StructField("r", CharType(3)))), partitionKeys = Seq("r")))
    val t = GraftTable.load(spark, dir)
    t.evolveBatch(Seq(t.setOptionT("scan.plan-sort-partition", "true")))
    assert(t.schema.option("scan.plan-sort-partition", "") == "true")
    assert(t.schema.id == 1L)
  }

  test("SQL path: CREATE TABLE with char/varchar enforces on INSERT") {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.spark.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse",
      java.nio.file.Files.createTempDirectory("graft-wh-cv").toString)
    // shared session: re-pointing 'graft' at this suite's warehouse only
    // takes effect if the cached catalog instance is dropped
    org.apache.spark.sql.graft.SparkShims.resetCatalogCache(spark)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql(
      "CREATE TABLE graft.db.cv (k INT, c CHAR(4), v VARCHAR(6)) USING graft")
    spark.sql("INSERT INTO graft.db.cv VALUES (1, 'ab', 'hello')")
    val r = spark.sql("SELECT c, v FROM graft.db.cv").collect()(0)
    assert(r.getString(0) === "ab  " && r.getString(1) === "hello")
    // over-length fails (Spark's own write-side check, driven by the
    // raw-type metadata the catalog round-trips — or ours, downstream)
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.db.cv VALUES (2, 'ab', 'toolong7')")
    }
    assert(e.getMessage.toLowerCase.contains("length"), e.getMessage)
    assert(spark.sql("SELECT count(*) FROM graft.db.cv").collect()(0).getLong(0) === 1)
    spark.sql("DROP TABLE graft.db.cv")
  }
}
