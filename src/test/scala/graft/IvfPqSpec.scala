package graft

import graft.pipeline.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-quantized (PQ) IVF index: m-byte codes + ADC scoring + exact
  * rerank must return the full-precision ranking wherever margins exceed
  * the reconstruction error, the on-disk index must be smaller than even
  * the SQ8 one, and incremental appends must encode with the STORED
  * codebooks.
  */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  /** PQ-separable corpus: `dim` families on DISTINCT axes (one-hot +
    * small jitter + scale variants) — intra-family cosine ≈ 0.999,
    * cross-family ≈ 0.02. PQ's reconstruction error is far coarser than
    * SQ8's (m bytes for the whole vector), so its parity corpus needs
    * margins ~1, not the [[IvfSqSpec]] trig corpus's ~0.005 (measured:
    * that corpus's cross-family cosines sit INSIDE PQ's error band and
    * candidates go wrong — correctly, approximation-wise).
    */
  private def corpus(perCell: Int): DataFrame = {
    val rows = for (g <- 0 until dim; i <- 0 until perCell) yield {
      val v = Array.tabulate(dim)(d =>
        (if (d == g) 1.0 else 0.0) + 0.02 * math.cos(1.3 * (i * dim + d)))
      ((g * perCell + i).toLong, v.map(_ * (1.0 + 0.1 * (i % 3))))
    }
    rows.toDF("vec_id", "v")
  }

  private def queries(c: DataFrame, perCell: Int): DataFrame =
    c.filter(col("vec_id") % perCell === 3)
      .select(col("vec_id").as("qid"), col("v"))

  test("PQ retrieval + exact rerank matches the full-precision IVF ranking") {
    val c = corpus(30) // 480 rows, 16 axis families
    val full = VectorOps.buildIvfIndex(c, "vec_id", "v", tmpTable(), numCentroids = 8)
    val pq = VectorOps.buildIvfPqIndex(c, "vec_id", "v", tmpTable(),
      numCentroids = 8, m = 4, codes = 32)
    val qs = queries(c, 30)
    val a = VectorOps.knnJoinIvf(qs, "qid", "v", full, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val b = VectorOps.knnJoinIvfPq(qs, "qid", "v", pq, c, "vec_id", "v", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(a == b, s"PQ ranking diverged from full precision:\n${(a -- b)} vs ${(b -- a)}")
  }

  test("PQ index is smaller on disk than both the float64 and SQ8 indexes") {
    val c = corpus(60) // 960 rows
    def liveBytes(t: graft.table.GraftTable): Long =
      t.store.latestSnapshot.map(s => t.store.liveFiles(s).map(_.size).sum).getOrElse(0L)
    val full = VectorOps.buildIvfIndex(c, "vec_id", "v", tmpTable(), numCentroids = 4)
    val sq = VectorOps.buildIvfSqIndex(c, "vec_id", "v", tmpTable(), numCentroids = 4)
    val pq = VectorOps.buildIvfPqIndex(c, "vec_id", "v", tmpTable(),
      numCentroids = 4, m = 4, codes = 32)
    val (fb, sb, pb) = (liveBytes(full), liveBytes(sq), liveBytes(pq))
    // m=4 codes + an 8 B norm vs dim=16 codes vs dim float64s; parquet
    // framing softens the raw ratios but the ordering must hold with room
    assert(pb * 2 <= fb, s"PQ index not smaller than float64: pq=$pb full=$fb")
    assert(pb < sb, s"PQ index not smaller than SQ8: pq=$pb sq=$sb")
  }

  test("appends encode with the stored codebooks; replays are exactly-once") {
    val c = corpus(30)
    val built = VectorOps.buildIvfPqIndex(
      c.filter(col("vec_id") % 3 =!= 0), "vec_id", "v", tmpTable(),
      numCentroids = 8, m = 4, codes = 32)
    VectorOps.appendToIvfPqIndex(built, c.filter(col("vec_id") % 3 === 0),
      "vec_id", "v", commitIdentifier = 7L, commitUser = "pq-append")
    val whole = VectorOps.buildIvfPqIndex(c, "vec_id", "v", tmpTable(),
      numCentroids = 8, m = 4, codes = 32)
    val qs = queries(c, 30)
    def run(t: graft.table.GraftTable) =
      VectorOps.knnJoinIvfPq(qs, "qid", "v", t, c, "vec_id", "v", 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    // built-on-2/3 trains different codebooks than built-on-all; ids/ranks
    // must still agree because rerank is exact and margins are wide
    assert(run(built) == run(whole), "incremental PQ append changed retrieval")
    val before = built.toDF.count()
    VectorOps.appendToIvfPqIndex(built, c.filter(col("vec_id") % 3 === 0),
      "vec_id", "v", commitIdentifier = 7L, commitUser = "pq-append")
    assert(built.toDF.count() == before, "replayed append duplicated rows")
  }

  test("clear errors: PQ query on a plain index; dim not divisible by m") {
    val c = corpus(6)
    val plain = VectorOps.buildIvfIndex(c, "vec_id", "v", tmpTable(), numCentroids = 2)
    val e = intercept[IllegalArgumentException] {
      VectorOps.knnJoinIvfPq(queries(c, 6), "qid", "v", plain, c, "vec_id", "v", 5)
    }
    assert(e.getMessage.contains("buildIvfPqIndex"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      VectorOps.buildIvfPqIndex(c, "vec_id", "v", tmpTable(),
        numCentroids = 2, m = 5, codes = 16)
    }
    assert(e2.getMessage.contains("divisible"), e2.getMessage)
  }
}
