package graft

import graft.table.GraftTable
import org.apache.spark.sql.functions._

/** Nested struct/array/map columns through the full table lifecycle —
  * append, PK merge, row-level delete, filters on nested fields. The
  * schema layer stores types as DDL strings (Schema.scala), so nesting
  * flows through create/read/merge without special cases; these tests pin
  * that down (reference supports nested types via DataField rows:
  * paimon-common org/apache/paimon/types/RowType.java).
  */
class NestedTypesSpec extends SparkSpec {

  test("nested struct/array/map columns round-trip an append table") {
    import spark.implicits._
    val df = Seq(
      (1L, ("alice", 30), Seq(1, 2, 3), Map("a" -> 1.0)),
      (2L, ("bob", 25), Seq(4), Map("b" -> 2.0))
    ).toDF("id", "person", "xs", "m")
    val t = GraftTable.create(spark, tmpTable(), df.schema)
    t.append(df)
    val back = t.toDF
    assert(back.count() == 2)
    // filter on a nested field plans and answers correctly
    assert(back.filter(col("person._1") === "alice").count() == 1)
    assert(back.selectExpr("aggregate(xs, 0, (a, x) -> a + x)")
      .as[Int].collect().sorted.sameElements(Array(4, 6)))
  }

  test("nested columns merge last-wins in a PK table and survive compaction") {
    import spark.implicits._
    val df = Seq((1L, ("alice", 30), Seq(1)), (2L, ("bob", 25), Seq(2)))
      .toDF("id", "person", "xs")
    val t = GraftTable.create(spark, tmpTable(), df.schema,
      primaryKeys = Seq("id"), options = Map("bucket" -> "2"))
    t.upsert(df)
    t.upsert(Seq((1L, ("alice2", 31), Seq(9))).toDF("id", "person", "xs"))
    val rows = t.toDF.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getStruct(1).getString(0) == "alice2")
    assert(rows(0).getSeq[Int](2) == Seq(9))
    t.compact()
    val after = t.toDF.orderBy("id").collect()
    assert(after.map(_.getStruct(1).getString(0)).toSeq == Seq("alice2", "bob"))
  }

  test("nested evolution: add/rename/retype INSIDE a struct remap old files by field id") {
    import spark.implicits._
    val df = Seq(
      (1L, ("alice", 30, 1.5f)),
      (2L, ("bob", 25, 2.5f))).toDF("id", "person")
      .select(col("id"), col("person").cast("struct<name:string,age:int,score:float>"))
    val t = GraftTable.create(spark, tmpTable(), df.schema)
    t.append(df) // file under schema 0
    // evolve INSIDE person: rename name->full_name, widen score to double,
    // add a nested field, drop age
    t.renameColumn("person.name", "full_name")
    t.updateColumnType("person.score", org.apache.spark.sql.types.DoubleType)
    t.addColumn("person.city", org.apache.spark.sql.types.StringType)
    t.dropColumn("person.age")
    val df2 = Seq((3L, ("carol", 3.5d, "berlin")))
      .toDF("id", "person")
      .select(col("id"),
        col("person").cast("struct<full_name:string,score:double,city:string>"))
    t.append(df2) // file under schema 4
    val rows = t.toDF
      .select("id", "person.full_name", "person.score", "person.city")
      .orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("alice", "bob", "carol"),
      "renamed nested field follows its id into old files")
    assert(rows.map(_.getDouble(2)).toSeq == Seq(1.5d, 2.5d, 3.5d),
      "retyped nested field casts old files")
    assert(rows.map(r => Option(r.getString(3))).toSeq ==
      Seq(None, None, Some("berlin")),
      "added nested field null-fills old files")
    // dropped nested field is gone from the read schema
    assert(!t.toDF.select("person.*").columns.contains("age"))
    // old fully-null struct handling: a null struct stays null post-remap
    val df3 = Seq((4L, null.asInstanceOf[(String, Double, String)]))
      .toDF("id", "person")
      .select(col("id"),
        col("person").cast("struct<full_name:string,score:double,city:string>"))
    t.append(df3)
    val nulls = t.toDF.filter(col("id") === 4).select("person").collect()
    assert(nulls(0).isNullAt(0), "null struct survives remap as null")
  }

  test("nested evolution recurses: add/rename two levels deep (struct in struct)") {
    import spark.implicits._
    val df = Seq((1L, (("alice", 30), "x")))
      .toDF("id", "outer")
      .select(col("id"), col("outer")
        .cast("struct<person:struct<name:string,age:int>,tag:string>"))
    val t = GraftTable.create(spark, tmpTable(), df.schema)
    t.append(df)
    t.renameColumn("outer.person.name", "nick")
    t.addColumn("outer.person.city", org.apache.spark.sql.types.StringType)
    val df2 = Seq((2L, (("bob", 25, "berlin"), "y")))
      .toDF("id", "outer")
      .select(col("id"), col("outer")
        .cast("struct<person:struct<nick:string,age:int,city:string>,tag:string>"))
    t.append(df2)
    val rows = t.toDF
      .select("id", "outer.person.nick", "outer.person.city", "outer.tag")
      .orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("alice", "bob"))
    assert(rows.map(r => Option(r.getString(2))).toSeq == Seq(None, Some("berlin")))
    assert(rows.map(_.getString(3)).toSeq == Seq("x", "y"))
  }

  test("nested evolution in a PK table: MOR merge across schema versions") {
    import spark.implicits._
    val df = Seq((1L, ("alice", 30)), (2L, ("bob", 25))).toDF("id", "person")
      .select(col("id"), col("person").cast("struct<name:string,age:int>"))
    val t = GraftTable.create(spark, tmpTable(), df.schema,
      primaryKeys = Seq("id"), options = Map("bucket" -> "2", "write-only" -> "true"))
    t.upsert(df)
    t.renameColumn("person.name", "nick")
    t.addColumn("person.vip", org.apache.spark.sql.types.BooleanType)
    val up = Seq((2L, ("bobby", 26, true))).toDF("id", "person")
      .select(col("id"), col("person").cast("struct<nick:string,age:int,vip:boolean>"))
    t.upsert(up) // L0 under the new schema merges over old-schema base
    val rows = t.toDF.select("id", "person.nick", "person.age", "person.vip")
      .orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("alice", "bobby"))
    assert(rows.map(_.getInt(2)).toSeq == Seq(30, 26))
    assert(rows.map(r => Option(r.get(3))).toSeq == Seq(None, Some(true)))
    // compaction rewrites everything under the latest schema; still correct
    t.compact()
    val after = t.toDF.select("id", "person.nick", "person.vip").orderBy("id").collect()
    assert(after.map(_.getString(1)).toSeq == Seq("alice", "bobby"))
  }

  test("schema-merge write merges NESTED structs: add + widen inside a struct") {
    import spark.implicits._
    val df = Seq((1L, ("alice", 30))).toDF("id", "person")
      .select(col("id"), col("person").cast("struct<name:string,age:int>"))
    val t = GraftTable.create(spark, tmpTable(), df.schema)
    t.append(df)
    // incoming batch: person gains a child (city), age widens to long, and
    // a new top-level column appears
    val df2 = Seq((2L, ("bob", 25L, "berlin"), 0.5))
      .toDF("id", "person", "score")
      .select(col("id"),
        col("person").cast("struct<name:string,age:bigint,city:string>"),
        col("score"))
    t.writeWithSchemaMerge(df2)
    val got = t.toDF
      .select("id", "person.name", "person.age", "person.city", "score")
      .orderBy("id").collect()
    assert(got.map(_.getString(1)).toSeq == Seq("alice", "bob"))
    assert(got.map(_.getLong(2)).toSeq == Seq(30L, 25L), "nested age widened")
    assert(got.map(r => Option(r.getString(3))).toSeq == Seq(None, Some("berlin")))
    assert(got.map(r => Option(r.get(4))).toSeq == Seq(None, Some(0.5)))
    // a batch shaped like the ORIGINAL schema still merges (absent nested
    // child null-fills on write)
    t.writeWithSchemaMerge(Seq((3L, ("carol", 40)))
      .toDF("id", "person")
      .select(col("id"), col("person").cast("struct<name:string,age:int>")))
    val carol = t.toDF.filter(col("id") === 3)
      .select("person.name", "person.age", "person.city").collect()(0)
    assert(carol.getString(0) == "carol" && carol.getLong(1) == 40L &&
      carol.isNullAt(2))
  }

  test("row-level delete works on a table with nested columns") {
    import spark.implicits._
    val df = (1L to 10L).map(i => (i, (s"u$i", i.toInt), Seq(i.toInt)))
      .toDF("id", "person", "xs")
    val t = GraftTable.create(spark, tmpTable(), df.schema,
      primaryKeys = Seq("id"), options = Map("bucket" -> "2"))
    t.upsert(df)
    t.delete(col("id") > 7)
    assert(t.toDF.count() == 7)
    assert(t.toDF.filter(col("person._2") > 7).count() == 0)
  }
}
