package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Open-addressing primitive (Long → Int) map — the allocation-free edge
  * table behind [[CharTrie]]. Keys are non-negative (`nodeId << 16 | char`);
  * -1 is the empty-slot sentinel. Linear probing, power-of-two capacity,
  * resize at 2/3 load. Build-time only mutation; probes are two array
  * reads per step, no boxing.
  */
private[functions] final class LongIntMap(expected: Int) {
  private var cap = {
    var c = 16
    while (c < expected * 2) c <<= 1
    c
  }
  private var mask = cap - 1
  private var keys = Array.fill[Long](cap)(-1L)
  private var vals = new Array[Int](cap)
  private var size = 0

  def get(k: Long): Int = {
    var i = (java.lang.Long.hashCode(k * -7046029254386353131L) & mask)
    while (true) {
      val kk = keys(i)
      if (kk == k) return vals(i)
      if (kk == -1L) return -1
      i = (i + 1) & mask
    }
    -1
  }

  def put(k: Long, v: Int): Unit = {
    if ((size + 1) * 3 > cap * 2) grow()
    var i = (java.lang.Long.hashCode(k * -7046029254386353131L) & mask)
    while (keys(i) != -1L && keys(i) != k) i = (i + 1) & mask
    if (keys(i) == -1L) size += 1
    keys(i) = k; vals(i) = v
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals
    cap <<= 1; mask = cap - 1; size = 0
    keys = Array.fill[Long](cap)(-1L); vals = new Array[Int](cap)
    var i = 0
    while (i < ok.length) { if (ok(i) != -1L) put(ok(i), ov(i)); i += 1 }
  }
}

/** Char-level trie for greedy longest-prefix vocab matching. The walk from
  * a start position advances one `charAt` per step through the primitive
  * edge map — O(match length) with ZERO allocations (the substring-probe
  * formulation allocated + hashed O(maxPieceLen) substrings per position,
  * O(maxPieceLen²) char work). Accepting nodes intern the OUTPUT token
  * (piece text, continuation prefix pre-applied) as a ready `UTF8String`,
  * so emitting a token is one array read.
  */
private[functions] final class CharTrie(pieces: Iterable[(String, String)]) {
  // pieces: (match text, output token text)
  private val edges = new LongIntMap(256)
  private var nodeCount = 1
  private val tokens = new scala.collection.mutable.ArrayBuffer[UTF8String](256)
  tokens += null // root accepts nothing

  pieces.foreach { case (m, outTok) =>
    var node = 0
    var i = 0
    while (i < m.length) {
      val key = node.toLong << 16 | m.charAt(i)
      var next = edges.get(key)
      if (next < 0) {
        next = nodeCount; nodeCount += 1
        tokens += null
        edges.put(key, next)
      }
      node = next
      i += 1
    }
    if (node != 0) tokens(node) = UTF8String.fromString(outTok)
  }

  private val tokenArr = tokens.toArray

  /** Longest accepting match of `w[pos, end)` starting at `pos`; returns
    * the matched END position (token appended to `out`), or -1 on a dead
    * end. `end` bounds the walk so the caller can tokenize a word in
    * place, without substring-ing it out of the document.
    */
  def longestMatchBounded(w: String, pos: Int, end: Int,
      out: scala.collection.mutable.ArrayBuffer[UTF8String]): Int = {
    var node = 0
    var i = pos
    var bestEnd = -1
    var bestTok: UTF8String = null
    while (i < end && node >= 0) {
      node = edges.get(node.toLong << 16 | w.charAt(i))
      if (node >= 0) {
        i += 1
        val t = tokenArr(node)
        if (t != null) { bestEnd = i; bestTok = t }
      }
    }
    if (bestEnd >= 0) out += bestTok
    bestEnd
  }
}

/** Greedy longest-match WordPiece tokenization as ONE native expression —
  * the JIT-compiled twin of the composed `aggregate`-fold formulation
  * that [[graft.pipeline.TextOps.wordpieceTokens]] started as (public
  * algorithm: Wu et al. 2016; BERT's tokenizer). Value-identical by
  * construction: per whitespace word, consume left-to-right taking the
  * LONGEST vocab piece at each position (continuations prefixed "##"),
  * whole word → one `unk` on a dead end; NULL text → empty array.
  *
  * Why native: the walk is the hot path of token budgeting — every
  * document, every character. The fold formulation paid interpreted
  * higher-order-function dispatch plus a struct allocation per step
  * (measured ~3 ms/doc at a 30k vocab); the r18 native rewrite probed
  * hash sets with O(maxPieceLen) substring allocations per position; this
  * round walks a [[CharTrie]] — O(match length) primitive steps, zero
  * probe allocations, output tokens interned. The vocab ships once with
  * the plan (metadata-sized); the tries build lazily per JVM.
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

  @transient private lazy val (initialTrie, continuationTrie) = {
    val init = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val cont = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    vocab.foreach { p =>
      if (p.startsWith("##")) cont += ((p.substring(2), p))
      else init += ((p, p))
    }
    (new CharTrie(init), new CharTrie(cont))
  }

  @transient private lazy val unkUtf = UTF8String.fromString(unk)

  // java regex \\s is exactly [ \\t\\n\\x0B\\f\\r] - matched verbatim so the
  // manual scan below stays value-identical to the previous
  // trim().split("\\s+") formulation (no regex, no word array).
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def tokenize(text: UTF8String): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](16)
    val s = text.toString
    // trim parity: String.trim drops chars <= 0x20 (controls included) at
    // the ENDS only; interior controls stay inside their word
    var wi = 0
    var hiEnd = s.length
    while (wi < hiEnd && s.charAt(wi) <= ' ') wi += 1
    while (hiEnd > wi && s.charAt(hiEnd - 1) <= ' ') hiEnd -= 1
    while (wi < hiEnd) {
      while (wi < hiEnd && isWs(s.charAt(wi))) wi += 1
      val wStart = wi
      while (wi < hiEnd && !isWs(s.charAt(wi))) wi += 1
      if (wi > wStart) {
        val start = out.size
        var pos = wStart
        var dead = false
        while (pos < wi && !dead) {
          val trie = if (pos == wStart) initialTrie else continuationTrie
          // the trie walk is bounded by the word end: pass a view —
          // longestMatch reads only [pos, wi)
          val end = trie.longestMatchBounded(s, pos, wi, out)
          if (end < 0) dead = true else pos = end
        }
        if (dead) {
          out.remove(start, out.size - start)
          out += unkUtf
        }
      }
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

object BpeTokens {
  /** Max pre-token run length in CODE POINTS before the fuse loop splits
    * it (documented boundary: merges never cross). Bounds the O(len²)
    * merge cost per chunk; natural-language words are far shorter, so
    * output changes only for degenerate blobs (base64/hex/DNA runs).
    */
  final val MaxFuseRun = 1024
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
  * per word. The regex pre-tokenizer bounds SYMBOL runs to one char but
  * leaves alnum runs unbounded — and 100-TB web crawls contain base64 /
  * hex / DNA blobs where a single 100 KB unbroken run is ~10¹⁰ operations
  * on one row, stalling its task. Runs are therefore SPLIT at
  * [[BpeTokens.MaxFuseRun]] code points before fusing: merges never cross
  * a split boundary, so token output changes ONLY for words longer than
  * 1024 code points (no natural-language word is; production byte-level
  * tokenizers bound pre-tokens the same way), and each chunk's merge cost
  * is capped at ~MaxFuseRun² regardless of blob length ⇒ linear overall.
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
    while (m.find()) {
      val w = m.group()
      // UTF-16 length ≤ cap ⇒ code points ≤ cap: the common case takes
      // the fast path without counting code points
      if (w.length <= BpeTokens.MaxFuseRun) fuseWord(w, out)
      else {
        // chunk at code-point boundaries (never halve a surrogate pair)
        var i = 0
        while (i < w.length) {
          val start = i
          var cps = 0
          while (i < w.length && cps < BpeTokens.MaxFuseRun) {
            i += Character.charCount(w.codePointAt(i))
            cps += 1
          }
          fuseWord(w.substring(start, i), out)
        }
      }
    }
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
