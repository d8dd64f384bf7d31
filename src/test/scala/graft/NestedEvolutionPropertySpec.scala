package graft

import graft.table.GraftTable
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.collection.mutable
import scala.util.Random

/** Randomized nested-evolution sequences vs an in-memory model.
  *
  * For several seeds: start from a struct column with 3 children, then
  * interleave appends with random nested ops (rename / add / drop / move /
  * int→long retype). The model tracks, per row, the values keyed by
  * PERSISTENT child field id at write time; after every op the full table
  * read must equal the model projected through the CURRENT schema — i.e.
  * renamed children follow their id into old files, added children
  * null-fill, dropped children disappear, moves don't touch data, retypes
  * cast. This is exactly the contract
  * SchemaEvolutionUtil.createDataProjection (reference :266) gives nested
  * projections.
  */
class NestedEvolutionPropertySpec extends SparkSpec {

  // model of one nested child: persistent id, current name, current type
  private case class Child(id: Int, name: String, tpe: String) // "int" | "long"

  test("random nested op sequences keep reads equal to the id-keyed model") {
    for (seed <- Seq(11, 42, 1337)) {
      val rnd = new Random(seed)
      val df0 = spark.createDataFrame(
        java.util.List.of[Row](),
        StructType(Seq(
          StructField("id", LongType, nullable = false),
          StructField("person", StructType(Seq(
            StructField("c0", IntegerType),
            StructField("c1", IntegerType),
            StructField("c2", IntegerType)))))))
      val t = GraftTable.create(spark, tmpTable(), df0.schema)
      // initial child ids mirror TableSchema.create: parent ids 0..1, then
      // children 2,3,4 depth-first
      var children = Vector(Child(2, "c0", "int"), Child(3, "c1", "int"), Child(4, "c2", "int"))
      var nameCounter = 3
      var nextRowId = 0L
      // per row: id -> (childFieldId -> Int value at write time)
      val model = mutable.LinkedHashMap.empty[Long, Map[Int, Int]]

      def appendBatch(): Unit = {
        val rows = (1 to 3).map { _ =>
          val id = nextRowId
          nextRowId += 1
          val vals = children.map(c => c.id -> rnd.nextInt(1000)).toMap
          model(id) = vals
          // explicit boxing: a Long/Int if-else would numerically WIDEN the
          // Int branch to Long and ClassCast inside the declared-INT column
          Row(id, Row(children.map[Any] { c =>
            if (c.tpe == "long") java.lang.Long.valueOf(vals(c.id).toLong)
            else java.lang.Integer.valueOf(vals(c.id))
          }: _*))
        }
        val schema = StructType(Seq(
          StructField("id", LongType, nullable = false),
          StructField("person", StructType(children.map(c =>
            StructField(c.name, if (c.tpe == "long") LongType else IntegerType))))))
        val actual = t.schema.fields.find(_.name == "person").get.nested
          .map(c => (c.id, c.name, c.dataType))
        assert(actual == children.map(c =>
          (c.id, c.name, if (c.tpe == "long") "BIGINT" else "INT")),
          s"model drifted from table schema:\n table=$actual\n model=$children")
        try t.append(spark.createDataFrame(
          new java.util.ArrayList[Row](scala.jdk.CollectionConverters
            .SeqHasAsJava(rows).asJava), schema))
        catch { case e: Throwable =>
          println(s"APPEND-FAIL decl=$schema")
          println(s"APPEND-FAIL rows=${rows.map(_.toString).mkString(" | ")}")
          println(s"APPEND-FAIL tableStruct=${t.schema.structType}")
          throw e
        }
      }

      def check(): Unit = {
        val got = t.toDF.collect().map { r =>
          val s = r.getStruct(1)
          r.getLong(0) -> children.zipWithIndex.map { case (c, i) =>
            if (s == null || s.isNullAt(i)) None
            else if (c.tpe == "long") Some(s.getLong(i)) else Some(s.getInt(i).toLong)
          }.toSeq
        }.toMap
        val want = model.map { case (id, vals) =>
          id -> children.map(c => vals.get(c.id).map(_.toLong)).toSeq
        }.toMap
        assert(got == want,
          s"seed=$seed children=$children\n got=${got.toSeq.sortBy(_._1)}\nwant=${want.toSeq.sortBy(_._1)}")
      }

      appendBatch()
      for (_ <- 1 to 12) {
        rnd.nextInt(6) match {
          case 0 => // rename a child
            val i = rnd.nextInt(children.size)
            nameCounter += 1
            val nn = s"c$nameCounter"
            t.renameColumn(s"person.${children(i).name}", nn)
            children = children.updated(i, children(i).copy(name = nn))
          case 1 => // add a child (int)
            nameCounter += 1
            val nn = s"c$nameCounter"
            val before = t.schema.highestFieldId
            t.addColumn(s"person.$nn", IntegerType)
            children = children :+ Child(before + 1, nn, "int")
          case 2 if children.size > 1 => // drop a child
            val i = rnd.nextInt(children.size)
            t.dropColumn(s"person.${children(i).name}")
            children = children.patch(i, Nil, 1)
          case 3 => // move a child FIRST or AFTER a sibling
            val i = rnd.nextInt(children.size)
            val c = children(i)
            val rest = children.patch(i, Nil, 1)
            if (rest.isEmpty || rnd.nextBoolean()) {
              t.moveColumn(s"person.${c.name}", None)
              children = c +: rest
            } else {
              val anchor = rest(rnd.nextInt(rest.size))
              t.moveColumn(s"person.${c.name}", Some(anchor.name))
              val j = rest.indexOf(anchor)
              children = (rest.take(j + 1) :+ c) ++ rest.drop(j + 1)
            }
          case 4 => // widen an int child to long
            val ints = children.filter(_.tpe == "int")
            if (ints.nonEmpty) {
              val c = ints(rnd.nextInt(ints.size))
              t.updateColumnType(s"person.${c.name}", LongType)
              children = children.map(x => if (x.id == c.id) x.copy(tpe = "long") else x)
            }
          case _ => appendBatch()
        }
        check()
      }
      // end-to-end sanity: at least two schema versions were written
      assert(t.schema.id > 0, "ops committed schema versions")
    }
  }

  test("PK tables: random nested evolution + child-subset selects match the model") {
    // the DSv2 merge-read leg of the same contract, plus NESTED SCHEMA
    // PRUNING: after every op a random child subset is selected (the shape
    // that silently mis-bound ordinals before round 12's fix — person.vip
    // reading person.age) and compared against the id-keyed model; periodic
    // compaction also pushes the read through the read-optimized columnar
    // path with pruned structs
    import org.apache.spark.sql.functions.col
    for (seed <- Seq(7, 99)) {
      val rnd = new Random(seed)
      val df0 = spark.createDataFrame(
        java.util.List.of[Row](),
        StructType(Seq(
          StructField("id", LongType, nullable = false),
          StructField("person", StructType(Seq(
            StructField("c0", IntegerType),
            StructField("c1", IntegerType),
            StructField("c2", IntegerType)))))))
      val t = GraftTable.create(spark, tmpTable(), df0.schema,
        primaryKeys = Seq("id"), options = Map("bucket" -> "2", "write-only" -> "true"))
      var children = Vector(Child(2, "c0", "int"), Child(3, "c1", "int"), Child(4, "c2", "int"))
      var nameCounter = 3
      var nextRowId = 0L
      val model = mutable.LinkedHashMap.empty[Long, Map[Int, Int]]

      def upsertBatch(): Unit = {
        val rows = (1 to 3).map { _ =>
          // half the rows REVISIT an existing id (merge across versions)
          val id = if (nextRowId > 0 && rnd.nextBoolean())
            rnd.nextLong(nextRowId)
          else { nextRowId += 1; nextRowId - 1 }
          val vals = children.map(c => c.id -> rnd.nextInt(1000)).toMap
          model(id) = vals
          Row(id, Row(children.map[Any] { c =>
            if (c.tpe == "long") java.lang.Long.valueOf(vals(c.id).toLong)
            else java.lang.Integer.valueOf(vals(c.id))
          }: _*))
        }.groupBy(_.getLong(0)).values.map(_.last).toSeq // one version per id per batch
        val schema = StructType(Seq(
          StructField("id", LongType, nullable = false),
          StructField("person", StructType(children.map(c =>
            StructField(c.name, if (c.tpe == "long") LongType else IntegerType))))))
        t.upsert(spark.createDataFrame(
          new java.util.ArrayList[Row](scala.jdk.CollectionConverters
            .SeqHasAsJava(rows).asJava), schema))
      }

      def check(): Unit = {
        val got = t.toDF.collect().map { r =>
          val s = r.getStruct(1)
          r.getLong(0) -> children.zipWithIndex.map { case (c, i) =>
            if (s == null || s.isNullAt(i)) None
            else if (c.tpe == "long") Some(s.getLong(i)) else Some(s.getInt(i).toLong)
          }.toSeq
        }.toMap
        val want = model.map { case (id, vals) =>
          id -> children.map(c => vals.get(c.id).map(_.toLong)).toSeq
        }.toMap
        assert(got == want, s"seed=$seed FULL read diverged: children=$children")
        // nested pruning: a random child subset through person.<name> paths
        val subset = rnd.shuffle(children).take(1 + rnd.nextInt(children.size))
        val cols = col("id") +: subset.map(c => col(s"person.${c.name}").as(c.name))
        val gotSub = t.toDF.select(cols: _*).collect().map { r =>
          r.getLong(0) -> subset.zipWithIndex.map { case (c, i) =>
            if (r.isNullAt(i + 1)) None
            else if (c.tpe == "long") Some(r.getLong(i + 1))
            else Some(r.getInt(i + 1).toLong)
          }.toSeq
        }.toMap
        val wantSub = model.map { case (id, vals) =>
          id -> subset.map(c => vals.get(c.id).map(_.toLong)).toSeq
        }.toMap
        assert(gotSub == wantSub,
          s"seed=$seed PRUNED read (${subset.map(_.name)}) diverged from model")
      }

      upsertBatch()
      for (step <- 1 to 12) {
        rnd.nextInt(7) match {
          case 0 =>
            val i = rnd.nextInt(children.size)
            nameCounter += 1
            val nn = s"c$nameCounter"
            t.renameColumn(s"person.${children(i).name}", nn)
            children = children.updated(i, children(i).copy(name = nn))
          case 1 =>
            nameCounter += 1
            val nn = s"c$nameCounter"
            val before = t.schema.highestFieldId
            t.addColumn(s"person.$nn", IntegerType)
            children = children :+ Child(before + 1, nn, "int")
          case 2 =>
            val ints = children.filter(_.tpe == "int")
            if (ints.nonEmpty) {
              val c = ints(rnd.nextInt(ints.size))
              t.updateColumnType(s"person.${c.name}", LongType)
              children = children.map(x => if (x.id == c.id) x.copy(tpe = "long") else x)
            }
          case 3 => t.compact() // read-optimized columnar leg
          case _ => upsertBatch()
        }
        check()
      }
    }
  }
}
