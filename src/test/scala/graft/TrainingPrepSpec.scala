package graft

import graft.pipeline.TextOps
import org.apache.spark.sql.functions._
import scala.util.Random

/** Round-15 training-prep ops: span-level exact substring dedup
  * (Lee et al. 2021 shape), GPT-style sequence packing, and the seeded
  * deterministic global shuffle — each checked against a local
  * brute-force reference on randomized corpora.
  */
class TrainingPrepSpec extends SparkSpec {
  import spark.implicits._

  // ---- local brute-force reference for removeRepeatedSpans ----
  private def bruteSpanDedup(docs: Seq[(Long, String)], n: Int,
      minOcc: Int): Map[Long, (String, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }.toMap
    val wins = for {
      (id, ts) <- docs.map { case (id, _) => id -> toks(id) }
      s <- 0 to ts.length - n
      if ts.length >= n
    } yield (ts.slice(s, s + n).mkString(" "), id, s)
    val covered = scala.collection.mutable.Set[(Long, Int)]()
    for ((_, occs) <- wins.groupBy(_._1) if occs.size >= minOcc) {
      for ((_, id, s) <- occs.sortBy(o => (o._2, o._3)).drop(1); p <- s until s + n)
        covered += ((id, p))
    }
    docs.map { case (id, t) =>
      val ts = toks(id)
      if (!covered.exists(_._1 == id)) id -> (t, 0L)
      else {
        val kept = ts.zipWithIndex.collect { case (w, p) if !covered((id, p)) => w }
        id -> (kept.mkString(" "), (ts.length - kept.size).toLong)
      }
    }.toMap
  }

  private def runSpanDedup(docs: Seq[(Long, String)], n: Int,
      minOcc: Int = 2): Map[Long, (String, Long)] =
    TextOps.removeRepeatedSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", n, minOcc)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  test("span dedup removes a cross-doc span from all but the canonical doc") {
    val span = "one two three four"
    val docs = Seq(
      1L -> s"alpha $span beta",
      2L -> s"gamma  $span  delta", // double spaces: must survive pass-through? no — doc 2 loses the span, rebuilt
      3L -> "nothing shared here at all")
    val got = runSpanDedup(docs, n = 4)
    // doc 1 is canonical (smallest doc_id): untouched, original spacing kept
    assert(got(1L) == (s"alpha $span beta", 0L))
    // doc 2 loses the 4 span tokens, kept tokens re-joined single-spaced
    assert(got(2L) == ("gamma delta", 4L))
    assert(got(3L) == ("nothing shared here at all", 0L))
  }

  test("span dedup: overlapping duplicated windows cut once, by position") {
    // a 6-token passage duplicated -> three 4-token windows each repeated,
    // but the union of covered positions removes exactly the 6 tokens
    val passage = "p q r s t u"
    val docs = Seq(10L -> s"x $passage y", 20L -> s"a b $passage c d")
    val got = runSpanDedup(docs, n = 4)
    assert(got(10L)._2 == 0L)
    assert(got(20L) == ("a b c d", 6L))
  }

  test("span dedup removes in-document self-repetition") {
    val docs = Seq(5L -> "m n o p Z m n o p")
    val got = runSpanDedup(docs, n = 4)
    // second occurrence (start 5) removed; first kept
    assert(got(5L) == ("m n o p Z", 4L))
  }

  test("span dedup: doc fully made of a duplicated span empties out") {
    val docs = Seq(1L -> "w x y z", 2L -> "w x y z")
    val got = runSpanDedup(docs, n = 4)
    assert(got(1L) == ("w x y z", 0L))
    assert(got(2L) == ("", 4L))
  }

  test("span dedup matches brute force on random small-vocab corpora") {
    val rnd = new Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (trial <- 0 until 3) {
      val docs = (0L until 40L).map { id =>
        val len = 3 + rnd.nextInt(12)
        id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val n = 3
      val want = bruteSpanDedup(docs, n, 2)
      val got = runSpanDedup(docs, n)
      assert(got == want, s"trial $trial mismatch")
    }
  }

  test("sequence packing matches a local cumulative sum; boundary spans") {
    val rnd = new Random(7)
    val docs = (0L until 100L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(30))("tok").mkString(" ")
    }
    val seqLen = 16
    val sep = 1
    val got = TextOps.packSequences(
        docs.toDF("doc_id", "text").repartition(7), "doc_id", "text", seqLen, sep)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("start_offset"), r.getAs[Long]("first_seq"),
        r.getAs[Long]("last_seq")))).toMap
    var off = 0L
    for ((id, t) <- docs) {
      val n = t.trim.split("\\s+").length.toLong
      val want = (n, off, off / seqLen, (off + n - 1) / seqLen)
      assert(got(id) == want, s"doc $id")
      off += n + sep
    }
    // at least one doc must actually span a sequence boundary
    assert(got.values.exists(v => v._4 > v._3))
  }

  test("packed sequence assembly matches the local concat-and-chunk reference") {
    val rnd = new Random(11)
    val docs = (0L until 80L).map { id =>
      id -> (0 until (1 + rnd.nextInt(25))).map(i => s"d${id}w$i").mkString(" ")
    }
    val seqLen = 32
    val got = TextOps.packedSequenceTexts(
        docs.toDF("doc_id", "text").repartition(9), "doc_id", "text", seqLen)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val stream = docs.flatMap { case (_, t) => t.trim.split("\\s+").toSeq :+ "</s>" }
    val want = stream.grouped(seqLen).zipWithIndex
      .map { case (chunk, i) => i.toLong -> (chunk.mkString(" "), chunk.size.toLong) }
      .toMap
    assert(got == want)
    // every sequence but the last is exactly seqLen tokens; the stream
    // reconstructs the docs (round trip through the separators)
    val last = got.keys.max
    assert(got.filter(_._1 != last).values.forall(_._2 == seqLen))
    val rejoined = (0L to last).map(got(_)._1).mkString(" ")
    assert(rejoined.split(" </s>").map(_.trim).filter(_.nonEmpty).toSeq ==
      docs.map(_._2))
  }

  test("packing by a caller-supplied token count / token array (the BPE seam)") {
    val rnd = new Random(23)
    // docs with punctuation so BPE-ish counts differ from whitespace words
    val docs = (0L until 60L).map { id =>
      id -> (0 until (1 + rnd.nextInt(12)))
        .map(i => if (i % 3 == 0) s"w$id-$i!" else s"w$id$i").mkString(" ")
    }
    val df = docs.toDF("doc_id", "text").repartition(5)
    val seqLen = 16
    val bpe = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"
    // (a) placement by TextOps.tokenCount matches a local prefix sum of
    //     the same regex counts
    val got = TextOps.packSequences(df, "doc_id",
        TextOps.tokenCount(col("text")), seqLen, 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("start_offset"))).toMap
    var off = 0L
    for ((id, t) <- docs) {
      val n = bpe.r.findAllIn(t).length.toLong
      assert(got(id) == (n, off), s"doc $id")
      off += n + 1
    }
    // (b) assembly over the regex token array matches the local
    //     concat-and-chunk reference on the same tokens
    val gotTexts = TextOps.packedSequenceTexts(df, "doc_id",
        regexp_extract_all(col("text"), lit(bpe), lit(0)), seqLen, "</s>")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val stream = docs.flatMap { case (_, t) => bpe.r.findAllIn(t).toSeq :+ "</s>" }
    val want = stream.grouped(seqLen).zipWithIndex
      .map { case (c, i) => i.toLong -> (c.mkString(" "), c.size.toLong) }.toMap
    assert(gotTexts == want)
    // (c) the Column overloads with the whitespace split ARE the String
    //     overloads, byte for byte
    assert(TextOps.packSequences(df, "doc_id",
        size(split(trim(col("text")), "\\s+")).cast("long"), seqLen, 1)
      .collect().toSet ==
      TextOps.packSequences(df, "doc_id", "text", seqLen).collect().toSet)
    assert(TextOps.packedSequenceTexts(df, "doc_id",
        split(trim(col("text")), "\\s+"), seqLen, "</s>")
      .collect().toSet ==
      TextOps.packedSequenceTexts(df, "doc_id", "text", seqLen).collect().toSet)
  }

  test("token-budget sample: budgets met not undershot, deterministic, monotone") {
    val rnd = new Random(3)
    val langs = Vector("en", "de", "fr")
    val docs = (0L until 300L).map { id =>
      (id, langs(rnd.nextInt(3)), Seq.fill(1 + rnd.nextInt(20))("w").mkString(" "))
    }
    val df = docs.toDF("doc_id", "lang", "text").repartition(7)
    def run(budgets: Map[String, Long], default: Long): Map[Long, (String, Long)] =
      TextOps.tokenBudgetSample(df, "doc_id", "lang", "text", budgets, default)
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

    // local reference: md5 order within stratum, exclusive cumsum < budget
    val md = java.security.MessageDigest.getInstance("MD5")
    def hash(id: Long) = md.digest(s"0:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    def ref(budgets: Map[String, Long], default: Long): Map[Long, (String, Long)] =
      docs.groupBy(_._2).flatMap { case (lang, ds) =>
        val b = budgets.getOrElse(lang, default)
        var cum = 0L
        ds.sortBy(d => (hash(d._1), d._1)).flatMap { case (id, l, t) =>
          val n = t.trim.split("\\s+").length.toLong
          val keep = cum < b
          cum += n
          if (keep) Some(id -> (l, n)) else None
        }
      }

    val budgets = Map("en" -> 200L, "de" -> 100L)
    val got = run(budgets, 30L)
    assert(got == ref(budgets, 30L))
    // budget met (>= budget) unless the whole stratum is smaller
    for (lang <- langs) {
      val kept = got.collect { case (_, (l, n)) if l == lang => n }.sum
      val total = docs.filter(_._2 == lang).map(_._3.trim.split("\\s+").length.toLong).sum
      val b = budgets.getOrElse(lang, 30L)
      assert(kept >= math.min(b, total), s"$lang undershot: $kept < min($b, $total)")
    }
    // monotone: raising one budget only ADDS docs
    val more = run(budgets.updated("de", 300L), 30L)
    assert(got.keySet.subsetOf(more.keySet))
    // zero budget keeps nothing in that stratum; full budget keeps all
    assert(!run(Map("en" -> 0L), 30L).values.exists(_._1 == "en"))
    val all = run(Map.empty, Long.MaxValue / 2)
    assert(all.size == 300)
  }

  test("incremental span dedup: corpus spans cut from batches via the index") {
    val corpus = Seq(
      1L -> "the quick brown fox jumps over the lazy dog tonight",
      2L -> "completely different corpus content sits right here now ok")
    val batch = Seq(
      100L -> "intro words the quick brown fox jumps over the lazy dog tonight outro",
      101L -> "no overlap with anything stored in that span index at all")
    val idx = graft.pipeline.TextOps.buildSpanIndex(
      corpus.toDF("doc_id", "text"), "doc_id", "text", tmpTable(), n = 8)
    val got = graft.pipeline.TextOps.removeCorpusSpans(
        batch.toDF("doc_id", "text"), "doc_id", "text", idx)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // doc 100: all 10 corpus-span tokens cut (3 overlapping windows merge)
    assert(got(100L) == ("intro words outro", 10L))
    assert(got(101L) == (batch.toMap.apply(101L), 0L))

    // append the admitted batch; a re-crawl of doc 100's text now dedups
    graft.pipeline.TextOps.appendToSpanIndex(idx,
      Seq(200L -> "fresh tail alpha beta gamma delta epsilon zeta eta theta")
        .toDF("doc_id", "text"), "doc_id", "text")
    val re = graft.pipeline.TextOps.removeCorpusSpans(
        Seq(300L -> "alpha beta gamma delta epsilon zeta eta theta").toDF("doc_id", "text"),
        "doc_id", "text", idx)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(re(300L) == ("", 8L))
  }

  test("strided span index still catches spans >= n + stride - 1 tokens") {
    // stride 3, n 4: a duplicated span of >= 6 tokens guarantees one
    // stored window inside it at any batch alignment
    val corpus = Seq(1L -> "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12")
    val idx = graft.pipeline.TextOps.buildSpanIndex(
      corpus.toDF("doc_id", "text"), "doc_id", "text", tmpTable(),
      n = 4, stride = 3)
    // shift the copied span to every alignment 0..4 via junk prefixes
    for (shift <- 0 until 5) {
      val prefix = (0 until shift).map(i => s"x$i").mkString(" ")
      val doc = (prefix + " a4 a5 a6 a7 a8 a9 tail").trim
      val got = graft.pipeline.TextOps.removeCorpusSpans(
          Seq(9L -> doc).toDF("doc_id", "text"), "doc_id", "text", idx)
        .collect()(0)
      // at least one strided corpus window (a4..a7 or a7..a10 start grid:
      // starts 0,3,6,9 → windows a1-a4, a4-a7, a7-a10 — a4a5a6a7 stored)
      assert(got.getLong(2) >= 4L, s"shift $shift: nothing removed")
      assert(got.getString(1).endsWith("tail"))
    }
  }

  test("cluster assignment + cluster-balanced count caps") {
    import graft.pipeline.VectorOps
    val rnd = new Random(5)
    // points tightly around 3 well-separated unit centroids
    val cents = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0), Seq(0.0, 0.0, 1.0))
    val pts = (0L until 120L).map { id =>
      val c = cents((id % 3).toInt)
      (id, c.map(x => x + (rnd.nextDouble() - 0.5) * 0.2))
    }
    val df = pts.toDF("vec_id", "v")
    val got = VectorOps.clusterAssign(df, "vec_id", "v", cents)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == pts.map { case (id, _) => id -> (id % 3).toInt }.toMap)
    // count caps: at most N per cluster, exact admission by md5 order
    val sampled = TextOps.budgetSample(
        VectorOps.clusterAssign(df, "vec_id", "v", cents),
        "vec_id", "cluster", lit(1L), Map("0" -> 5L), defaultBudget = 10L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val byCluster = sampled.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byCluster == Map("0" -> 5, "1" -> 10, "2" -> 10))
    // monotone: raising the cap only adds
    val more = TextOps.budgetSample(
        VectorOps.clusterAssign(df, "vec_id", "v", cents),
        "vec_id", "cluster", lit(1L), Map("0" -> 9L), defaultBudget = 10L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(sampled.toSet.subsetOf(more))
  }

  test("exclusivePrefixSum matches a local scan for any input partitioning") {
    val rnd = new Random(13)
    val rows = (0L until 700L).map(id => (id, rnd.nextInt(50).toLong))
    val want = {
      var acc = 0L
      rows.sortBy(_._1).map { case (id, w) =>
        val o = id -> acc; acc += w; o
      }.toMap
    }
    for (parts <- Seq(1, 3, 16)) {
      val df = rows.toDF("doc_id", "w").repartition(parts)
      val got = graft.pipeline.PipelineUtil.exclusivePrefixSum(
          df, Seq(col("doc_id")), col("w"), "off")
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("off")).toMap
      assert(got == want, s"parts=$parts")
    }
  }

  // ---- vocab-driven WordPiece tokenizer (q148) ----

  /** The exact greedy longest-match reference, locally. */
  private def wpLocal(text: String, vocab: Seq[String],
      unk: String = "[UNK]"): Seq[String] = {
    val vset = vocab.toSet
    val maxLen = vocab.map(p =>
      if (p.startsWith("##")) p.length - 2 else p.length).max
    def word(w: String): Seq[String] = {
      var pos = 0
      val out = Seq.newBuilder[String]
      while (pos < w.length) {
        val best = (math.min(maxLen, w.length - pos) to 1 by -1).find { l =>
          vset((if (pos > 0) "##" else "") + w.substring(pos, pos + l))
        }.getOrElse(0)
        if (best == 0) return Seq(unk)
        out += (if (pos > 0) "##" else "") + w.substring(pos, pos + best)
        pos += best
      }
      out.result()
    }
    text.trim.split("\\s+").filter(_.nonEmpty).toSeq.flatMap(word)
  }

  test("wordpieceTokens matches the local greedy reference, incl. UNK and continuations") {
    val vocab = Seq("the", "un", "break", "##able", "##break", "able",
      "a", "b", "c", "##a", "##b", "##c")
    val texts = Seq(
      "the unbreakable cab",   // unbreakable: un ##break ##able; but 'k'∉vocab? -> check
      "abc cba aabbcc",
      "breakable able unable",
      "xyz abc",               // xyz has no vocab chars -> [UNK]
      "  the   the  ",         // repeated + padding whitespace
      "\u0001the a\u0002",   // control-char padding: String.trim drops
                               // chars <= 0x20 at the ENDS only
      "the\u0001a b",         // interior control stays inside its word
      "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        graft.pipeline.TextOps.wordpieceTokens(col("text"), vocab).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == wpLocal(t, vocab), s"text '$t'")
    }
    // longest-match is really longest: "unbreakable" -> un ##break ##able
    // (not u-n-b-...), and a mid-word dead end UNKs the WHOLE word
    assert(got(0L) == Seq("the", "un", "##break", "##able", "c", "##a", "##b"))
    assert(got(3L) == Seq("[UNK]", "a", "##b", "##c"))
    // count column agrees
    val counts = df.select(col("doc_id"), graft.pipeline.TextOps
        .wordpieceCount(col("text"), vocab).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(counts(i.toLong) == wpLocal(t, vocab).size) }
    // the committed q148 vocab tokenizes the fixture with zero UNKs
    // (ASCII totality: every letter/digit in both forms)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val unks = docs.select(explode(graft.pipeline.TextOps.wordpieceTokens(
        col("text"), SparkEntry.WordpieceVocab)).as("t"))
      .filter(col("t") === "[UNK]").count()
    assert(unks === 0L)
  }

  test("30k-piece synthetic vocab: walk matches the reference, plan constant in corpus size") {
    // the realistic-scale claim q148's toy vocab never exercised: a
    // BERT-sized LITERAL vocab (30k pieces, max piece length 9) through
    // the same greedy walk — correctness vs the local reference, and the
    // plan footprint must not depend on corpus size (the vocab ships
    // once as a map datum, never per row)
    val vocab = graft.pipeline.TextOps.syntheticVocab(30000)
    assert(vocab.size === 30000)
    assert(vocab.distinct.size === 30000)
    assert(vocab.exists(p => p.length == 9), "no long pieces in fixture")
    val texts = Seq(
      "abcabcabc aba997 zzz9 q",    // 9-char piece hit + 1/2/3-char walks
      "aaaaaaaaaaab 0123456789",    // long runs, digit pieces
      "zq9zq9zq9zq9 xx yy z")       // tripled piece + boundary tails
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        graft.pipeline.TextOps.wordpieceTokens(col("text"), vocab).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == wpLocal(t, vocab), s"text '$t'") }
    def planChars(rows: Long): Int =
      spark.range(rows).select(lit("abc abcabcabc xyz").as("text"))
        .select(graft.pipeline.TextOps.wordpieceCount(col("text"), vocab).as("n"))
        .queryExecution.executedPlan.toString.length
    val (small, large) = (planChars(10L), planChars(10000000L))
    // identical plans modulo the printed range bound's digits
    assert(math.abs(small - large) < 64,
      s"plan footprint varies with corpus size: $small vs $large")
  }

  test("deterministic shuffle is a stable seeded permutation") {
    val df = (0L until 500L).toDF("doc_id").repartition(5)
    def posOf(seed: Long): Map[Long, Long] =
      TextOps.deterministicShuffle(df, "doc_id", seed)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shuffle_pos")).toMap
    val p1 = posOf(7L)
    // a permutation of 0..n-1
    assert(p1.values.toSeq.sorted == (0L until 500L))
    // reproducible
    assert(posOf(7L) == p1)
    // a different seed gives a different order
    assert(posOf(8L) != p1)
    // matches the local md5 rank
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = (0L until 500L).map { id =>
      id -> md.digest(s"7:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    }.sortBy { case (id, h) => (h, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> i.toLong }.toMap
    assert(p1 == want)
  }
}
