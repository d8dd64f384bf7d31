package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Z-order (Morton) interleave of up to 4 columns into one Long, used by
  * sort compaction to cluster multi-dimensional filter columns
  * (reference: paimon-core sort/zorder/ZIndexer.java:63, interleaveBits:123;
  * Spark-side SparkZOrderUDF.java:53).
  *
  * Each child is normalized to an order-preserving unsigned 16-bit lane
  * (sign-flip for integrals, IEEE754 total-order trick for floats, first two
  * bytes for strings), then bits are interleaved. Sort compaction rewrites
  * every row of a table through this expression, so it participates in
  * whole-stage codegen ([[doGenCode]] emits the same lane projection +
  * interleave inline); the interpreted [[eval]] is kept for fallback paths.
  */
case class ZValue(children: Seq[Expression]) extends Expression {
  require(children.nonEmpty && children.size <= 4, "zvalue takes 1-4 columns")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val k = children.size
    var z = 0L
    var j = 0
    while (j < k) {
      val lane = Lanes.normalize(children(j).dataType, children(j).eval(input))
      var i = 0
      while (i < 16) {
        z |= ((lane >> i) & 1L) << (i.toLong * k + j)
        i += 1
      }
      j += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = children.size
    val evals = children.map(_.genCode(ctx))
    val laneVars = children.indices.map(j => ctx.freshName(s"lane$j"))
    val laneCode = children.lazyZip(evals).lazyZip(laneVars).map { (c, e, lane) =>
      Lanes.laneGen(ctx, c.dataType, e, lane)
    }.mkString("\n")
    val i = ctx.freshName("i")
    val interleave = laneVars.zipWithIndex.map { case (lane, j) =>
      s"${ev.value} |= (($lane >> $i) & 1L) << ((long) $i * $k + $j);"
    }.mkString("\n")
    val childCode = evals.map(_.code.toString).mkString("\n")
    ev.copy(
      code = code"""
        $childCode
        long ${ev.value} = 0L;
        $laneCode
        for (int $i = 0; $i < 16; $i++) {
          $interleave
        }
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** Order-preserving 16-bit unsigned lane projection shared by the space-
  * filling-curve expressions, in both interpreted ([[normalize]]) and
  * generated ([[laneGen]]) form.
  */
private[functions] object Lanes {
  def normalize(dt: DataType, v: Any): Long = {
    if (v == null) return 0L
    val bits64: Long = dt match {
      case IntegerType | DateType => (v.asInstanceOf[Int].toLong ^ Long.MinValue)
      case LongType | TimestampType | TimestampNTZType =>
        v.asInstanceOf[Long] ^ Long.MinValue
      case ShortType => (v.asInstanceOf[Short].toLong ^ Long.MinValue)
      case ByteType => (v.asInstanceOf[Byte].toLong ^ Long.MinValue)
      case FloatType => ieee(v.asInstanceOf[Float].toDouble)
      case DoubleType => ieee(v.asInstanceOf[Double])
      case StringType =>
        val b = v.asInstanceOf[UTF8String].getBytes
        val b0 = if (b.length > 0) b(0) & 0xffL else 0L
        val b1 = if (b.length > 1) b(1) & 0xffL else 0L
        ((b0 << 8) | b1) << 48
      case BooleanType => if (v.asInstanceOf[Boolean]) Long.MinValue + 1 else 0L
      case _: DecimalType => ieee(v.asInstanceOf[Decimal].toDouble)
      case other => throw new IllegalArgumentException(s"curve value: unsupported type $other")
    }
    bits64 >>> 48 // top 16 bits
  }

  /** IEEE754 total-order bit trick: monotone long for any double. */
  private def ieee(d: Double): Long = {
    val b = java.lang.Double.doubleToRawLongBits(d)
    val flipped = if (b < 0) ~b else b | Long.MinValue
    flipped
  }

  /** Java statements declaring `long $lane` and assigning the lane of the
    * child codegen result `e` (0 when null), mirroring [[normalize]]
    * bit-for-bit. Each type's projection is emitted inline so the whole
    * curve key stays inside whole-stage codegen.
    */
  def laneGen(ctx: CodegenContext, dt: DataType, e: ExprCode, lane: String): String = {
    val v = e.value
    val body: String = dt match {
      case IntegerType | DateType | ShortType | ByteType =>
        s"$lane = (((long) $v) ^ Long.MIN_VALUE) >>> 48;"
      case LongType | TimestampType | TimestampNTZType =>
        s"$lane = ($v ^ Long.MIN_VALUE) >>> 48;"
      case FloatType | DoubleType =>
        val b = ctx.freshName("bits")
        s"""long $b = Double.doubleToRawLongBits((double) $v);
           |if ($b < 0) { $b = ~$b; } else { $b = $b | Long.MIN_VALUE; }
           |$lane = $b >>> 48;""".stripMargin
      case StringType =>
        // explicit ifs: janino mis-parses a parenthesized ternary before <<
        val sb = ctx.freshName("strBytes")
        val b0 = ctx.freshName("b0")
        val b1 = ctx.freshName("b1")
        s"""byte[] $sb = $v.getBytes();
           |long $b0 = 0L;
           |long $b1 = 0L;
           |if ($sb.length > 0) $b0 = $sb[0] & 0xffL;
           |if ($sb.length > 1) $b1 = $sb[1] & 0xffL;
           |$lane = ($b0 << 8) | $b1;""".stripMargin
      case BooleanType =>
        // (Long.MinValue + 1) >>> 48 == 0x8000
        s"$lane = $v ? 0x8000L : 0L;"
      case _: DecimalType =>
        val b = ctx.freshName("bits")
        s"""long $b = Double.doubleToRawLongBits($v.toDouble());
           |if ($b < 0) { $b = ~$b; } else { $b = $b | Long.MIN_VALUE; }
           |$lane = $b >>> 48;""".stripMargin
      case other => throw new IllegalArgumentException(s"curve value: unsupported type $other")
    }
    s"""long $lane = 0L;
       |if (!(${e.isNull})) {
       |  $body
       |}""".stripMargin
  }
}

object ZOrder {
  /** Column API: z-order value of the given columns. */
  def zvalue(cols: Column*): Column = {
    val exprs = cols.map(c => org.apache.spark.sql.graft.SparkShims.expr(c))
    org.apache.spark.sql.graft.SparkShims.column(ZValue(exprs))
  }
}
