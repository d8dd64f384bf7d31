package graft

import graft.pipeline.TextOps
import org.apache.spark.sql.functions._

/** Merges-list BPE ([[TextOps.bpeTokens]], SQL `graft_bpe`, q149):
  * GPT-style tokenization where the lowest-rank adjacent pair fuses, all
  * occurrences left-to-right, before re-ranking. The dangerous corners
  * are ORDERING semantics — pass pinning (a newly-formed lower-rank pair
  * must NOT preempt the current pair's remaining occurrences) and
  * overlapping self-pair runs — plus the NULL/empty contract shared with
  * wordpiece.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def tok(text: String, merges: Seq[(String, String)]): Seq[String] =
    Seq(Option(text)).toDF("t")
      .select(TextOps.bpeTokens(col("t"), merges).as("p"))
      .collect()(0).getSeq[String](0)

  test("committed-merges walks match the hand-computed reference") {
    val m = SparkEntry.BpeMerges
    assert(tok("the table scans data while the value entries rest", m) ==
      "the table scan s data while the value e n t r i es re st".split(' ').toSeq)
    assert(tok("an interestingentanglement of 100 atoms, and another!", m) ==
      ("an in t er e st ing e n t an g le m e n t of 100 at o m s , " +
        "and an o the r !").split(' ').toSeq)
    // overlapping self-pair runs: (a,a) fuses left-to-right non-overlap,
    // then (aa,aa)
    assert(tok("aaaaa aaaa aaa aabaa", m) ==
      "aaaa a aaaa aa a aa b aa".split(' ').toSeq)
    assert(tok("thththe atatat orthography values 1000100", m) ==
      "th th the at at at or th o g r a p h y value s 100 0 100".split(' ').toSeq)
  }

  test("pass pinning: a newly-formed lower-rank pair does not preempt") {
    // rank0 = (ab,a) becomes PRESENT after the first (a,b) fusion; GPT-2
    // semantics finish all (a,b) occurrences first → [ab, ab], never
    // [aba, b]
    val m = Seq(("ab", "a"), ("a", "b"))
    assert(tok("abab", m) == Seq("ab", "ab"))
  }

  test("NULL and empty text tokenize as empty, count 0") {
    val out = Seq((1L, Option("a b")), (2L, None), (3L, Some("")),
        (4L, Some("   "))).toDF("id", "t")
      .select(col("id"), TextOps.bpeCount(col("t"), SparkEntry.BpeMerges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 2, 2L -> 0, 3L -> 0, 4L -> 0))
  }

  test("graft_bpe SQL function: literal merges array, clear arg errors") {
    val got = spark.sql(
      "SELECT graft_bpe('the cat', array('t h', 'th e', 'c a', 'ca t'))")
      .collect()(0).getSeq[String](0)
    assert(got == Seq("the", "cat"))
    val e = intercept[Exception] {
      spark.sql("SELECT graft_bpe('x', array('a b c'))").collect()
    }
    assert(e.getMessage.contains("left right"), e.getMessage)
  }

  test("astral-plane symbols stay whole code points, not broken surrogates") {
    // U+1D538 (a surrogate PAIR in UTF-16) pre-tokenizes as one symbol
    // word; a UTF-16-unit split would emit two broken half-surrogate
    // tokens and diverge from the oracle's per-character walk
    val got = tok("ab 𝔸 ba", Seq(("a", "b")))
    assert(got == Seq("ab", "𝔸", "b", "a"))
  }

  test("100 KB unbroken alnum blob tokenizes in bounded time (run cap)") {
    // real web crawls carry base64/hex/DNA blobs: the regex pre-tokenizer
    // puts an entire alnum run in ONE fuse call, and an uncapped fuse is
    // O(len²) — ~10¹⁰ operations for 100 KB, stalling the task. The cap
    // splits runs at 1024 code points, so cost is linear in blob length.
    val blob = {
      val r = new scala.util.Random(5)
      val cs = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
      (0 until 100000).map(_ => cs(r.nextInt(cs.length))).mkString
    }
    val t0 = System.nanoTime()
    val got = tok(blob, SparkEntry.BpeMerges)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(got.nonEmpty && got.map(_.length).sum == blob.length,
      "capped fuse must still cover every character exactly once")
    assert(ms < 3000, f"100 KB blob took $ms%.0f ms — run cap not effective")
  }

  test("run cap boundary semantics: merges never cross a 1024-cp boundary") {
    // 'a'*2053 with merge (a,a): each 1024-chunk fuses independently to
    // 512 "aa"; the 5-char tail gives aa aa a. A word AT the cap is
    // untouched by chunking.
    val m = Seq(("a", "a"))
    val atCap = "a" * 1024
    assert(tok(atCap, m) == Seq.fill(512)("aa"))
    val over = "a" * 2053
    assert(tok(over, m) ==
      (Seq.fill(512)("aa") ++ Seq.fill(512)("aa") ++ Seq("aa", "aa", "a")))
    // (astral text can't straddle a chunk boundary by construction: the
    // pre-tokenizer's alnum runs are ASCII-only and symbols pre-tokenize
    // as single code points — the code-point chunk walk is defensive)
  }

  test("argument guards: empty, duplicate, whitespace merges fail fast") {
    intercept[IllegalArgumentException](tok("x", Nil))
    intercept[IllegalArgumentException](tok("x", Seq(("a", "b"), ("a", "b"))))
    intercept[IllegalArgumentException](tok("x", Seq(("a", " "))))
    intercept[IllegalArgumentException](tok("x", Seq(("", "b"))))
  }

  test("bpeCount budgets packSequences like any other count column") {
    val docs = (1L to 20L).map(i => (i, "the table value " * (i % 4 + 1).toInt))
      .toDF("doc_id", "text")
    val placed = TextOps.packSequences(docs, "doc_id",
      TextOps.bpeCount(col("text"), SparkEntry.BpeMerges),
      seqLen = 32, sepTokens = 1)
    val rows = placed.collect()
    assert(rows.length == 20)
    // every doc placed, sequence offsets within budget
    assert(rows.forall(_.getAs[Long]("n_tokens") > 0))
  }
}
