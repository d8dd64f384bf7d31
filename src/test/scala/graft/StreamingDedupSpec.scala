package graft

import graft.pipeline.Dedup
import graft.streaming.StreamingDedup
import graft.table.GraftTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingDedupSpec extends SparkSpec {

  import spark.implicits._

  /** 40 distinct words seeded by `g` — near-dups perturb one word. */
  private def text(g: Int, perturb: Int = -1): String =
    (0 until 40).map(w =>
      if (w == perturb) s"CHANGED${g}x$w" else s"w${g}word$w").mkString(" ")

  private def mkCorpusAndIndex(): (GraftTable, GraftTable) = {
    val corpusDf = Seq(
      (1L, text(1)), (2L, text(2)), (3L, text(3))).toDF("doc_id", "body")
    val corpus = GraftTable.create(spark, tmpTable(), corpusDf.schema)
    corpus.append(corpusDf)
    val index = Dedup.buildSigIndex(corpusDf, "doc_id", "body", tmpTable())
    (corpus, index)
  }

  private def corpusIds(corpus: GraftTable): Seq[Long] =
    corpus.toDF.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  test("processBatch: exact, intra-batch and vs-corpus dedup; index keeps up") {
    val (corpus, index) = mkCorpusAndIndex()

    // 101 unique; 102 exact text dup of 101 (exact drop, larger id);
    // 103 near-dup of CORPUS doc 1 (corpus drop); 104 near-dup of 101
    // (intra drop, larger id); 105 unique
    val b1 = Seq(
      (101L, text(10)), (102L, text(10)), (103L, text(1, perturb = 5)),
      (104L, text(10, perturb = 7)), (105L, text(11))).toDF("doc_id", "body")
    val r1 = StreamingDedup.processBatch(b1, 0L, "doc_id", "body",
      corpus, index)
    assert(r1 == StreamingDedup.BatchResult(0L, input = 5, admitted = 2,
      droppedExact = 1, droppedIntra = 1, droppedCorpus = 1), r1.toString)
    assert(corpusIds(corpus) == Seq(1L, 2L, 3L, 101L, 105L))
    assert(index.toDF.count() == 5)

    // batch 2: 106 near-dups 101 — admitted LAST batch, so it must be
    // caught through the UPDATED index; 107 unique
    val b2 = Seq(
      (106L, text(10, perturb = 3)), (107L, text(12))).toDF("doc_id", "body")
    val r2 = StreamingDedup.processBatch(b2, 1L, "doc_id", "body",
      corpus, index)
    assert(r2 == StreamingDedup.BatchResult(1L, input = 2, admitted = 1,
      droppedExact = 0, droppedIntra = 0, droppedCorpus = 1), r2.toString)
    assert(corpusIds(corpus) == Seq(1L, 2L, 3L, 101L, 105L, 107L))
    assert(index.toDF.count() == 6)
  }

  test("replay and partial-commit recovery converge exactly-once") {
    val (corpus, index) = mkCorpusAndIndex()
    val b1 = Seq((201L, text(20)), (202L, text(21))).toDF("doc_id", "body")

    // simulate a crash AFTER the corpus commit but BEFORE the index
    // commit: pre-commit the corpus rows under the batch's identifier
    corpus.append(b1, commitIdentifier = 0L,
      commitUser = "streaming-dedup-corpus")
    assert(index.toDF.count() == 3) // index did NOT advance

    // the restarted batch recomputes the same survivors: corpus append is
    // replay-filtered, index upsert lands
    val r = StreamingDedup.processBatch(b1, 0L, "doc_id", "body",
      corpus, index)
    assert(r.admitted == 2, r.toString)
    assert(corpusIds(corpus) == Seq(1L, 2L, 3L, 201L, 202L))
    assert(index.toDF.count() == 5)

    // full replay of the SAME batchId: both tables filter it
    StreamingDedup.processBatch(b1, 0L, "doc_id", "body", corpus, index)
    assert(corpusIds(corpus) == Seq(1L, 2L, 3L, 201L, 202L))
    assert(index.toDF.count() == 5)
  }

  test("backfill: chunked bootstrap dedups across chunks and reruns converge") {
    val (corpus, index) = mkCorpusAndIndex()
    // 8 docs: 402 exact-dups 401, 403 near-dups 401, 404 near-dups corpus
    // doc 2, rest unique — chunk assignment is hash-based, so dups may
    // land in the same or different chunks; either way exactly one
    // representative of the 401-family and nothing near the corpus wins
    val docs = Seq(
      (401L, text(40)), (402L, text(40)), (403L, text(40, perturb = 11)),
      (404L, text(2, perturb = 4)), (405L, text(41)), (406L, text(42)),
      (407L, text(43)), (408L, text(44))).toDF("doc_id", "body")
    val res = StreamingDedup.backfill(docs, "doc_id", "body",
      corpus, index, batches = 3)
    assert(res.map(_.batchId) == Seq(0L, 1L, 2L))
    assert(res.map(_.input).sum == 8)
    val afterIds = corpusIds(corpus)
    // exactly one of the 401-family survives (the smallest id in the
    // EARLIEST chunk containing one — chunk order is authoritative), 404
    // dropped vs corpus, all four unique docs admitted
    assert(afterIds.count(Seq(401L, 402L, 403L).contains) == 1, afterIds.toString)
    assert(!afterIds.contains(404L), afterIds.toString)
    assert(Seq(405L, 406L, 407L, 408L).forall(afterIds.contains), afterIds.toString)
    assert(index.toDF.count() == afterIds.size)

    // full rerun (crash-recovery path): every chunk replay-filters — the
    // table state must not change
    StreamingDedup.backfill(docs, "doc_id", "body", corpus, index, batches = 3)
    assert(corpusIds(corpus) == afterIds)
    assert(index.toDF.count() == afterIds.size)
  }

  test("backfill refuses to resume with a different modulus") {
    val (corpus, index) = mkCorpusAndIndex()
    val docs = Seq((501L, text(50)), (502L, text(51))).toDF("doc_id", "body")
    StreamingDedup.backfill(docs, "doc_id", "body", corpus, index, batches = 2)
    val e = intercept[IllegalArgumentException] {
      StreamingDedup.backfill(docs, "doc_id", "body", corpus, index, batches = 4)
    }
    assert(e.getMessage.contains("batches=2"), e.getMessage)
    // same modulus resumes fine (pure replay)
    StreamingDedup.backfill(docs, "doc_id", "body", corpus, index, batches = 2)
    assert(corpusIds(corpus) == Seq(1L, 2L, 3L, 501L, 502L))
  }

  test("streaming wrapper dedups across micro-batches") {
    implicit val sql = spark.sqlContext
    val (corpus, index) = mkCorpusAndIndex()
    val input = MemoryStream[(Long, String)]
    val results = scala.collection.mutable.ArrayBuffer.empty[StreamingDedup.BatchResult]
    val q = StreamingDedup.start(input.toDF().toDF("doc_id", "body"),
      "doc_id", "body", corpus, index, tmpTable() + "-ckpt",
      onBatch = r => results.synchronized { results += r })
    try {
      input.addData((301L, text(30)), (302L, text(1, perturb = 9)))
      q.processAllAvailable()
      // 303 near-dups 301 from the PREVIOUS micro-batch
      input.addData((303L, text(30, perturb = 2)), (304L, text(31)))
      q.processAllAvailable()
    } finally q.stop()
    assert(corpusIds(corpus) == Seq(1L, 2L, 3L, 301L, 304L))
    assert(index.toDF.count() == 5)
    assert(results.map(r => (r.admitted, r.droppedCorpus)).toSeq ==
      Seq((1L, 1L), (1L, 1L)), results.toString)
  }
}
