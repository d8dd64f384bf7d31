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
