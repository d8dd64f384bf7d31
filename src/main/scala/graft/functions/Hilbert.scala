package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of up to 4 columns, the third clustering strategy of
  * sort compaction (reference: paimon-common sort/hilbert/, CompactProcedure
  * order_strategy 'hilbert'). Compared to the Morton/z-order interleave the
  * Hilbert curve has no "seam" jumps, so range filters touch fewer files
  * after clustering.
  *
  * Each child is projected to an order-preserving unsigned 16-bit lane
  * (shared [[Lanes]] projection), then mapped through Skilling's
  * axes-to-transpose algorithm (John Skilling, "Programming the Hilbert
  * curve", AIP Conf. Proc. 707 (2004) — public domain) and bit-interleaved
  * into one Long (n·16 ≤ 64 bits). Sort compaction rewrites every row of a
  * table through this key, so [[doGenCode]] keeps it inside whole-stage
  * codegen: lanes are projected inline ([[Lanes.laneGen]]) and the transpose
  * runs through the static [[Hilbert.index]] forwarder (branchy loop — not
  * worth inlining, but JIT-hot). The interpreted [[eval]] remains for
  * fallback paths.
  */
case class HilbertValue(children: Seq[Expression]) extends Expression {
  require(children.nonEmpty && children.size <= 4, "hilbert_value takes 1-4 columns")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val coords = new Array[Long](children.size)
    var j = 0
    while (j < children.size) {
      coords(j) = Lanes.normalize(children(j).dataType, children(j).eval(input))
      j += 1
    }
    Hilbert.index(coords, 16)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val coords = ctx.freshName("coords")
    val laneVars = children.indices.map(j => ctx.freshName(s"lane$j"))
    val laneCode = children.lazyZip(evals).lazyZip(laneVars).map { (c, e, lane) =>
      Lanes.laneGen(ctx, c.dataType, e, lane)
    }.mkString("\n")
    val fill = laneVars.zipWithIndex
      .map { case (lane, j) => s"$coords[$j] = $lane;" }
      .mkString("\n")
    val childCode = evals.map(_.code.toString).mkString("\n")
    ev.copy(
      code = code"""
        $childCode
        $laneCode
        long[] $coords = new long[${children.size}];
        $fill
        long ${ev.value} = graft.functions.Hilbert.index($coords, 16);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object Hilbert {

  /** Hilbert index of `coords` (each in [0, 2^bits)), n·bits ≤ 64.
    * Skilling's AxestoTranspose followed by bit interleave (most-
    * significant bit of dimension 0 first).
    */
  def index(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    require(n * bits <= 64, s"hilbert: $n dims x $bits bits exceeds 64")
    if (n == 1) return coords(0)
    val x = java.util.Arrays.copyOf(coords, n)
    // inverse undo of the excess-gray transform
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // interleave the transposed index into one long, MSB-first
    var out = 0L
    var bit = bits - 1
    while (bit >= 0) {
      var d = 0
      while (d < n) { out = (out << 1) | ((x(d) >> bit) & 1L); d += 1 }
      bit -= 1
    }
    out
  }

  /** Column API: Hilbert index of the given columns. */
  def hvalue(cols: Column*): Column = {
    val exprs = cols.map(c => org.apache.spark.sql.graft.SparkShims.expr(c))
    org.apache.spark.sql.graft.SparkShims.column(HilbertValue(exprs))
  }
}
