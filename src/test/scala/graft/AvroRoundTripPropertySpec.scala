package graft

import graft.table.GraftTable
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property test for the Avro value bridge: any row over the supported type
  * lattice must survive write → avro file → read EXACTLY (a silent value
  * corruption in a format converter poisons every downstream result). One
  * wide nullable schema covering every branch of AvroConv, random rows in
  * batches, compared after a round trip through a graft avro table.
  */
class AvroRoundTripPropertySpec extends SparkSpec {

  private val wideSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("b", BooleanType),
    StructField("i8", ByteType),
    StructField("i16", ShortType),
    StructField("i32", IntegerType),
    StructField("i64", LongType),
    StructField("f32", FloatType),
    StructField("f64", DoubleType),
    StructField("s", StringType),
    StructField("bin", BinaryType),
    StructField("d", DateType),
    StructField("ts", TimestampType),
    StructField("dec", DecimalType(14, 4)),
    StructField("arr", ArrayType(DoubleType)),
    StructField("m", MapType(StringType, IntegerType)),
    StructField("st", StructType(Seq(
      StructField("x", LongType), StructField("y", StringType))))))

  private def opt[A](g: Gen[A]): Gen[Any] =
    Gen.frequency((8, g.map(x => x: Any)), (2, Gen.const(null)))

  // unicode-ish strings: ASCII, accents, surrogate-pair emoji, empty
  private val genStr: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.const(""),
    Gen.const("héllo wörld"),
    Gen.const("emoji 😀 pair"),
    Gen.listOfN(4, Gen.oneOf('a', 'é', '中', 'z')).map(_.mkString))

  private val genDec: Gen[java.math.BigDecimal] =
    Gen.chooseNum(-999999999L, 999999999L).map(u =>
      new java.math.BigDecimal(java.math.BigInteger.valueOf(u), 4))

  private val genRow: Gen[Row] = for {
    id <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
    b <- opt(Gen.oneOf(true, false))
    i8 <- opt(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    i16 <- opt(Gen.chooseNum(Short.MinValue, Short.MaxValue))
    i32 <- opt(Gen.chooseNum(Int.MinValue, Int.MaxValue))
    i64 <- opt(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    f32 <- opt(Gen.oneOf(Gen.chooseNum(-1e6f, 1e6f), Gen.oneOf(
      Float.NaN, Float.PositiveInfinity, Float.MinPositiveValue, -0.0f)))
    f64 <- opt(Gen.oneOf(Gen.chooseNum(-1e12, 1e12), Gen.oneOf(
      Double.NaN, Double.NegativeInfinity, Double.MinPositiveValue, -0.0)))
    s <- opt(genStr)
    bin <- opt(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    d <- opt(Gen.chooseNum(-20000, 30000).map(n =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(n.toLong))))
    ts <- opt(Gen.chooseNum(-2000000000000L, 4000000000000L).map { ms =>
      val t = new java.sql.Timestamp(ms); t.setNanos((math.abs(ms) % 1000000).toInt * 1000); t
    })
    dec <- opt(genDec)
    arr <- opt(Gen.listOf(Gen.chooseNum(-100.0, 100.0)))
    m <- opt(Gen.mapOf(Gen.zip(genStr, Gen.chooseNum(-50, 50))))
    st <- opt(Gen.zip(Gen.chooseNum(-9L, 9L), genStr).map { case (x, y) => Row(x, y) })
  } yield Row(id, b, i8, i16, i32, i64, f32, f64, s, bin, d, ts, dec, arr, m, st)

  private def canon(r: Row): Seq[Any] = r.toSeq.map {
    // Scala == on boxed floats is numeric (NaN != NaN) — canonicalize so a
    // correctly round-tripped NaN compares equal
    case f: java.lang.Float if f.isNaN => "NaN:f"
    case d: java.lang.Double if d.isNaN => "NaN:d"
    case a: Array[Byte] => a.toList
    case m: scala.collection.Map[_, _] => m.toList.sortBy(_._1.toString)
    case s: scala.collection.Seq[_] => s.toList
    case x => x
  }.toList

  test("random rows round-trip avro write/read exactly") {
    import scala.jdk.CollectionConverters._
    val prop = Prop.forAll(Gen.listOfN(25, genRow)) { rows =>
      val distinct = rows.zipWithIndex.map { case (r, i) =>
        Row.fromSeq((i.toLong * 1000003L + r.getLong(0)) +: r.toSeq.tail)
      }
      val df = spark.createDataFrame(distinct.asJava, wideSchema)
      val t = GraftTable.create(spark, tmpTable(), wideSchema,
        options = Map("file.format" -> "avro"))
      t.append(df)
      val back = t.toDF.collect()
      val a = distinct.map(canon).sortBy(_.toString)
      val b = back.toSeq.map(canon).sortBy(_.toString)
      val ok = a == b
      if (!ok) {
        a.zip(b).filter { case (x, y) => x != y }.take(1).foreach { case (x, y) =>
          x.zip(y).zipWithIndex.filter { case ((u, v), _) => u != v }.foreach {
            case ((u, v), i) =>
              def ty(z: Any) = if (z == null) "null" else z.getClass.getName
              println(s"[avro-prop] field $i (${wideSchema(i).name}): " +
                s"wrote <$u> ${ty(u)} vs read <$v> ${ty(v)}")
          }
        }
      }
      ok
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }
}
