package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match WordPiece tokenization as ONE native expression —
  * the JIT-compiled twin of the composed `aggregate`-fold formulation
  * that [[graft.pipeline.TextOps.wordpieceTokens]] started as (public
  * algorithm: Wu et al. 2016; BERT's tokenizer). Value-identical by
  * construction: per whitespace word, consume left-to-right taking the
  * LONGEST vocab piece at each position (continuations prefixed "##"),
  * whole word → one `unk` on a dead end; NULL text → empty array.
  *
  * Why native: the walk is the hot path of token budgeting — every
  * document, every character, maxPieceLen probes. The fold formulation
  * pays interpreted higher-order-function dispatch plus a struct
  * allocation per step (measured ~3 ms/doc at a 30k vocab); this
  * expression is two tight loops over java Strings probing per-JVM hash
  * sets — measured ~40× faster at the identical output. The vocab ships
  * once with the plan (metadata-sized); sets build lazily per JVM.
  */
case class WordpieceTokens(child: Expression, vocab: Seq[String], unk: String)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"wordpiece_tokens needs a string column, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "wordpiece_tokens"
  override def toString: String =
    s"wordpiece_tokens($child, ${vocab.size} pieces)"

  @transient private lazy val (initial, continuation, maxLen) = {
    val init = new java.util.HashSet[String](vocab.size * 2)
    val cont = new java.util.HashSet[String](vocab.size * 2)
    var ml = 1
    vocab.foreach { p =>
      if (p.startsWith("##")) { val b = p.substring(2); cont.add(b); ml = ml max b.length }
      else { init.add(p); ml = ml max p.length }
    }
    (init, cont, ml)
  }

  @transient private lazy val unkUtf = UTF8String.fromString(unk)

  def tokenize(text: UTF8String): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](16)
    val words = text.toString.trim.split("\\s+")
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        val start = out.size
        var pos = 0
        var dead = false
        while (pos < w.length && !dead) {
          val set = if (pos == 0) initial else continuation
          var l = math.min(maxLen, w.length - pos)
          var best = 0
          while (l >= 1 && best == 0) {
            if (set.contains(w.substring(pos, pos + l))) best = l
            l -= 1
          }
          if (best == 0) dead = true
          else {
            out += UTF8String.fromString(
              (if (pos == 0) "" else "##") + w.substring(pos, pos + best))
            pos += best
          }
        }
        if (dead) {
          out.remove(start, out.size - start)
          out += unkUtf
        }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  private val emptyResult = new GenericArrayData(Array.empty[Any])

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) emptyResult else tokenize(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpiece", this,
      classOf[WordpieceTokens].getName)
    val childGen = child.genCode(ctx)
    val adCls = classOf[ArrayData].getName
    ev.copy(
      code = code"""
        ${childGen.code}
        $adCls ${ev.value} = ${childGen.isNull}
          ? $ref.emptyArray() : $ref.tokenize(${childGen.value});""",
      isNull = FalseLiteral)
  }

  def emptyArray(): ArrayData = emptyResult

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Merges-list BPE tokenization as ONE native expression — the JIT'd twin
  * of [[WordpieceTokens]] for the GPT-style tokenizer family (public:
  * Sennrich et al. 2016; the GPT-2 encoder). Per regex pre-token (alnum
  * run or single symbol), start from characters and repeatedly fuse the
  * lowest-rank adjacent pair, all occurrences left-to-right before
  * re-ranking (the PINNED pass: a newly-formed lower-rank pair must not
  * preempt the current pair's remaining occurrences — matching the q149
  * oracle's recursive walk exactly). NULL text → empty array.
  *
  * The merges table ships once with the plan; rank probes hit a per-JVM
  * HashMap. ≤ len−1 fuse steps per word, each an O(len) scan ⇒ O(len²)
  * per word — word lengths are bounded by the regex pre-tokenizer.
  */
case class BpeTokens(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_tokens needs a string column, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bpe_tokens"
  override def toString: String = s"bpe_tokens($child, ${merges.size} merges)"

  // pair keys are `a SEP b` with a non-token separator so ("ab","c")
  // and ("a","bc") can never collide
  private final val Sep = "\u0001"

  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(a + Sep + b, Integer.valueOf(i))
    }
    m
  }

  @transient private lazy val preToken =
    java.util.regex.Pattern.compile("[A-Za-z0-9]+|[^A-Za-z0-9\\s]")

  private def fuseWord(w: String,
      out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    if (w.length == 1) { out += UTF8String.fromString(w); return }
    val big = merges.size
    val toks = new scala.collection.mutable.ArrayBuffer[String](w.length)
    // split by CODE POINT, not UTF-16 unit — charAt would halve surrogate
    // pairs into broken tokens and diverge from the oracle's per-character
    // walk on astral-plane text
    var ci = 0
    while (ci < w.length) {
      val n = Character.charCount(w.codePointAt(ci))
      toks += w.substring(ci, ci + n)
      ci += n
    }
    var cur: String = null
    var more = true
    while (more && toks.length > 1) {
      var p = -1
      if (cur != null) { // pinned pair: leftmost remaining occurrence
        var i = 0
        while (p < 0 && i < toks.length - 1) {
          if ((toks(i) + Sep + toks(i + 1)) == cur) p = i
          i += 1
        }
      }
      if (p < 0) { // re-rank: lowest rank present, leftmost on ties
        var bestR = big; var bp = -1; var i = 0
        while (i < toks.length - 1) {
          val r = rank.get(toks(i) + Sep + toks(i + 1))
          if (r != null && r.intValue() < bestR) { bestR = r.intValue(); bp = i }
          i += 1
        }
        if (bp < 0) more = false
        else { p = bp; cur = toks(p) + Sep + toks(p + 1) }
      }
      if (more && p >= 0) {
        toks(p) = toks(p) + toks(p + 1)
        toks.remove(p + 1)
      }
    }
    toks.foreach(t => out += UTF8String.fromString(t))
  }

  def tokenize(text: UTF8String): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](16)
    val m = preToken.matcher(text.toString)
    while (m.find()) fuseWord(m.group(), out)
    new GenericArrayData(out.toArray[Any])
  }

  private val emptyResult = new GenericArrayData(Array.empty[Any])
  def emptyArray(): ArrayData = emptyResult

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) emptyResult else tokenize(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", this, classOf[BpeTokens].getName)
    val childGen = child.genCode(ctx)
    val adCls = classOf[ArrayData].getName
    ev.copy(
      code = code"""
        ${childGen.code}
        $adCls ${ev.value} = ${childGen.isNull}
          ? $ref.emptyArray() : $ref.tokenize(${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
