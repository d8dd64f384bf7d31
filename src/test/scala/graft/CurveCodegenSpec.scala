package graft

import graft.functions.{Hilbert, HilbertValue, ZOrder, ZValue}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._

/** The space-filling-curve keys run inside whole-stage codegen on the sort-
  * compaction path; this spec pins the generated code to the interpreted
  * eval bit-for-bit across every supported lane type, including nulls.
  */
class CurveCodegenSpec extends SparkSpec {
  import spark.implicits._

  private val rows: Seq[(java.lang.Integer, java.lang.Long, java.lang.Double, String, java.lang.Boolean)] =
    Seq(
      (Int.box(0), Long.box(0L), Double.box(0.0), "", Boolean.box(false)),
      (Int.box(-7), Long.box(Long.MinValue), Double.box(-3.5e12), "ab", Boolean.box(true)),
      (Int.box(Int.MaxValue), Long.box(42L), Double.box(Double.NaN), "zz-top", Boolean.box(false)),
      (Int.box(123456), Long.box(-99L), Double.box(1e-300), "a", Boolean.box(true)),
      (null, null, null, null, null)
    )

  private def df = rows.toDF("i", "l", "d", "s", "b")

  test("zvalue codegen matches interpreted eval on all lane types") {
    val got = df
      .select(col("i"), col("l"), col("d"), col("s"), col("b"),
        ZOrder.zvalue(col("i"), col("l"), col("d"), col("s")).as("z4"),
        ZOrder.zvalue(col("b"), col("d")).as("z2"),
        ZOrder.zvalue(col("l")).as("z1"))
      .collect()
    got.foreach { r =>
      def lit(idx: Int) = Literal.create(r.get(idx), df.schema(idx).dataType)
      val exp4 = ZValue(Seq(lit(0), lit(1), lit(2), lit(3))).eval(null)
      val exp2 = ZValue(Seq(lit(4), lit(2))).eval(null)
      val exp1 = ZValue(Seq(lit(1))).eval(null)
      assert(r.getLong(5) === exp4, s"z4 mismatch on $r")
      assert(r.getLong(6) === exp2, s"z2 mismatch on $r")
      assert(r.getLong(7) === exp1, s"z1 mismatch on $r")
    }
  }

  test("hilbert codegen matches interpreted eval on all lane types") {
    val got = df
      .select(col("i"), col("l"), col("d"), col("s"), col("b"),
        Hilbert.hvalue(col("i"), col("l"), col("d"), col("s")).as("h4"),
        Hilbert.hvalue(col("s"), col("b")).as("h2"),
        Hilbert.hvalue(col("d")).as("h1"))
      .collect()
    got.foreach { r =>
      def lit(idx: Int) = Literal.create(r.get(idx), df.schema(idx).dataType)
      val exp4 = HilbertValue(Seq(lit(0), lit(1), lit(2), lit(3))).eval(null)
      val exp2 = HilbertValue(Seq(lit(3), lit(4))).eval(null)
      val exp1 = HilbertValue(Seq(lit(2))).eval(null)
      assert(r.getLong(5) === exp4, s"h4 mismatch on $r")
      assert(r.getLong(6) === exp2, s"h2 mismatch on $r")
      assert(r.getLong(7) === exp1, s"h1 mismatch on $r")
    }
  }

  test("generated projection compiles (no silent fallback) and matches eval") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val types = Seq(IntegerType, LongType, DoubleType, StringType, BooleanType)
    val refs = types.zipWithIndex.map { case (dt, i) => BoundReference(i, dt, nullable = true) }
    val exprs = Seq(ZValue(refs.take(4)), HilbertValue(Seq(refs(4), refs(2), refs(3))))
    // generate() throws on janino compile errors -- this cannot silently fall back
    val proj = GenerateUnsafeProjection.generate(exprs)
    rows.foreach { case (i, l, d, s, b) =>
      val row = InternalRow(i, l, d, if (s == null) null else UTF8String.fromString(s), b)
      val out = proj(row)
      assert(out.getLong(0) === exprs(0).eval(row), s"generated zvalue mismatch on $row")
      assert(out.getLong(1) === exprs(1).eval(row), s"generated hilbert mismatch on $row")
    }
  }

  test("curve keys stay inside whole-stage codegen on a scan (the sort-compaction shape)") {
    val plan = sf("lineitem")
      .select(ZOrder.zvalue(col("l_orderkey"), col("l_partkey")).as("z"),
        Hilbert.hvalue(col("l_orderkey"), col("l_shipdate")).as("h"))
      .queryExecution.executedPlan
    val formatted = plan.toString
    // "*(1) Project [zvalue(...)" -- the * prefix marks a WholeStageCodegen stage
    assert(formatted.linesIterator.exists(l => l.contains("Project") && l.trim.startsWith("*(")),
      s"expected the curve-key Project inside a codegen stage (*-prefixed) in:\n$formatted")
  }
}
