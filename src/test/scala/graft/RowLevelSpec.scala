package graft

import graft.table.GraftTable
import org.apache.spark.sql.functions._

class RowLevelSpec extends SparkSpec {

  test("delete: pk table writes -D rows; append table rewrites files (COW)") {
    val orders = sf("orders")
    // pk
    val pk = GraftTable.create(spark, tmpTable(), orders.schema,
      primaryKeys = Seq("o_orderkey"), options = Map("bucket" -> "2"))
    pk.upsert(orders)
    pk.delete(col("o_orderstatus") === "F")
    assert(pk.toDF.count() == orders.filter(col("o_orderstatus") =!= "F").count())
    // append COW
    val ap = GraftTable.create(spark, tmpTable(), orders.schema)
    ap.append(orders)
    ap.delete(col("o_totalprice") > 200000)
    assert(ap.toDF.count() == orders.filter(!(col("o_totalprice") > 200000)).count())
    assert(ap.toDF.filter(col("o_totalprice") > 200000).count() == 0)
  }

  test("delete: partition-only predicate drops files without rewrite") {
    val li = sf("lineitem")
    val t = GraftTable.create(spark, tmpTable(), li.schema, partitionKeys = Seq("l_returnflag"))
    t.append(li)
    val before = t.store.liveFiles(t.store.latestSnapshot.get).map(_.path).toSet
    t.delete(col("l_returnflag") === "A")
    val after = t.store.liveFiles(t.store.latestSnapshot.get)
    assert(after.map(_.path).toSet.subsetOf(before), "no new files should be written")
    assert(t.toDF.count() == li.filter(col("l_returnflag") =!= "A").count())
  }

  test("update: pk +U rows and append COW") {
    val orders = sf("orders")
    val pk = GraftTable.create(spark, tmpTable(), orders.schema,
      primaryKeys = Seq("o_orderkey"), options = Map("bucket" -> "2"))
    pk.upsert(orders)
    pk.update(col("o_orderstatus") === "O", Map("o_orderpriority" -> lit("1-URGENT")))
    assert(pk.toDF.filter(col("o_orderstatus") === "O" &&
      col("o_orderpriority") =!= "1-URGENT").count() == 0)
    assert(pk.toDF.count() == orders.count())

    val ap = GraftTable.create(spark, tmpTable(), orders.schema)
    ap.append(orders)
    ap.update(col("o_orderkey") % 2 === 0, Map("o_totalprice" -> lit(0.0)))
    assert(ap.toDF.filter(col("o_orderkey") % 2 === 0 && col("o_totalprice") =!= 0.0).count() == 0)
    assert(ap.toDF.filter(col("o_orderkey") % 2 =!= 0 && col("o_totalprice") === 0.0).count() == 0)
  }

  test("merge into: update + insert + delete clauses") {
    val orders = sf("orders").limit(1000)
    val t = GraftTable.create(spark, tmpTable(), orders.schema,
      primaryKeys = Seq("o_orderkey"), options = Map("bucket" -> "2"))
    t.upsert(orders)
    // source: half overlapping (keys *2), half new (keys beyond max)
    val source = orders.select(
      (col("o_orderkey") * 2).as("o_orderkey"),
      col("o_custkey"), col("o_orderstatus"),
      lit(999.99).as("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
    t.mergeInto(source, col("s.o_orderkey") === col("t.o_orderkey"))
      .whenMatchedUpdate(Map("o_totalprice" -> col("s.o_totalprice")))
      .whenNotMatchedInsertAll()
      .execute()
    val result = t.toDF
    // matched keys got price 999.99
    assert(result.filter(col("o_orderkey") % 2 === 0 && col("o_totalprice") =!= 999.99)
      .count() == 0)
    // count = original + new keys inserted
    val origKeys = orders.select("o_orderkey").distinct().count()
    val srcKeys = source.select("o_orderkey").distinct()
    val newKeys = srcKeys.join(orders.select("o_orderkey"), Seq("o_orderkey"), "left_anti").count()
    assert(result.count() == origKeys + newKeys)
  }

  test("merge into: not-matched-by-source delete") {
    val orders = sf("orders").limit(200)
    val t = GraftTable.create(spark, tmpTable(), orders.schema,
      primaryKeys = Seq("o_orderkey"), options = Map("bucket" -> "2"))
    t.upsert(orders)
    val source = orders.filter(col("o_orderkey") % 3 === 0)
    t.mergeInto(source, col("s.o_orderkey") === col("t.o_orderkey"))
      .whenMatchedUpdate(Map("o_orderpriority" -> lit("KEPT")))
      .whenNotMatchedBySourceDelete()
      .execute()
    assert(t.toDF.count() == orders.filter(col("o_orderkey") % 3 === 0).count())
    assert(t.toDF.filter(col("o_orderpriority") =!= "KEPT").count() == 0)
  }

  test("overwrite: whole table, static partition, dynamic") {
    val li = sf("lineitem")
    val t = GraftTable.create(spark, tmpTable(), li.schema, partitionKeys = Seq("l_returnflag"))
    t.append(li)
    // static partition overwrite of R with 10 rows
    val repl = li.filter(col("l_returnflag") === "R").limit(10)
    t.overwrite(repl, staticPartition = Map("l_returnflag" -> "R"))
    assert(t.toDF.filter(col("l_returnflag") === "R").count() == 10)
    assert(t.toDF.filter(col("l_returnflag") === "A").count() ==
      li.filter(col("l_returnflag") === "A").count())
    // dynamic overwrite touching only partition A
    val replA = li.filter(col("l_returnflag") === "A").limit(5)
    t.overwrite(replA, dynamic = true)
    assert(t.toDF.filter(col("l_returnflag") === "A").count() == 5)
    assert(t.toDF.filter(col("l_returnflag") === "R").count() == 10)
    // full overwrite
    t.overwrite(li.limit(7))
    assert(t.toDF.count() == 7)
    // truncate
    t.truncate()
    assert(t.toDF.count() == 0)
  }
}
