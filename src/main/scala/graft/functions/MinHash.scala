package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `numHashes` minhash slots in ONE codegen'd pass over the shingle-hash
  * array (classic Broder sketch over derived hash functions).
  *
  * Value-identical to the composed-builtin formulation
  * `array((0 until n).map(s => array_min(transform(hs, h => xxhash64(h, seed(s))))))`
  * — Spark's two-arg xxhash64 folds as
  * `hashLong(seed_s, hashLong(h, 42))` — but those higher-order functions
  * are CodegenFallback (interpreted, with per-element closure dispatch) and
  * re-walk the array once per slot. This expression JIT-compiles to two
  * nested loops sharing the inner `hashLong(h, 42)` per element: measured
  * ~10× on the signature stage of the sf0.1 corpus.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature needs array<bigint>, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val seeds: Array[Long] =
    (0 until numHashes).map(MinHashSignature.seedConst).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = XXH64.hashLong(arr.getLong(i), 42L)
        var s = 0
        while (s < numHashes) {
          val v = XXH64.hashLong(seeds(s), base)
          if (v < mins(s)) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val v = ctx.freshName("v")
      s"""
        |long[] $mins = new long[$numHashes];
        |java.util.Arrays.fill($mins, Long.MAX_VALUE);
        |for (int $i = 0; $i < $arr.numElements(); $i++) {
        |  if (!$arr.isNullAt($i)) {
        |    long $base = $xxh.hashLong($arr.getLong($i), 42L);
        |    for (int $s = 0; $s < $numHashes; $s++) {
        |      long $v = $xxh.hashLong($seedsRef[$s], $base);
        |      if ($v < $mins[$s]) $mins[$s] = $v;
        |    }
        |  }
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** Seed constant for the s-th derived hash: splitmix64(s) — must stay in
    * lock-step with [[graft.pipeline.Dedup.mix]] so sketch values (and LSH
    * band buckets, and oracle-checked candidate sets) are unchanged.
    */
  def seedConst(s: Int): Long = {
    var z = s.toLong + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}

/** Compact per-slot digest of a minhash signature: the LOW BYTE of each
  * slot, packed as BINARY — 64 bytes instead of 520 for a 64-slot
  * signature. Byte agreement estimates slot agreement (hence Jaccard) with
  * a +1/256·(1−J) inflation from accidental low-byte collisions —
  * negligible against the 5σ cutoff margin the candidate prefilter uses.
  * Carried through the LSH band explode so candidate pairs can be
  * est-filtered BEFORE the heavyweight shingle-set verify joins (the stage
  * that turns quadratic when a templated corpus densifies band buckets).
  */
case class MinHashSigBytes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig_bytes needs array<bigint>, got ${other.sql}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "minhash_sig_bytes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[Byte](arr.numElements())
    var i = 0
    while (i < out.length) { out(i) = arr.getLong(i).toByte; i += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
        |byte[] $out = new byte[$arr.numElements()];
        |for (int $i = 0; $i < $out.length; $i++) {
        |  $out[$i] = (byte) $arr.getLong($i);
        |}
        |${ev.value} = $out;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigBytes =
    copy(child = newChild)
}

/** Count of equal bytes at equal positions in two BINARY digests (shorter
  * length governs) — the codegen'd kernel of the candidate-pair
  * signature-agreement prefilter.
  */
case class ByteAgreement(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.BinaryType,
            org.apache.spark.sql.types.BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"byte_agreement needs (binary, binary), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "byte_agreement"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var c = 0
    var i = 0
    while (i < n) { if (x(i) == y(i)) c += 1; i += 1 }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      s"""
        |int $n = java.lang.Math.min($a.length, $b.length);
        |int $c = 0;
        |for (int $i = 0; $i < $n; $i++) {
        |  if ($a[$i] == $b[$i]) $c++;
        |}
        |${ev.value} = $c;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ByteAgreement = copy(left = newLeft, right = newRight)
}
