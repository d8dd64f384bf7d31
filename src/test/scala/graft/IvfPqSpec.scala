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

  /** Clustered-with-drift corpus where raw PQ codebooks must span the
    * CENTER separation (orthogonal 10·e_{2g} axes) while residual
    * codebooks only span the within-cluster jitter (magnitude ~1, drawn
    * from 8 SHARED patterns an 8-code book can learn exactly): the
    * fixture on which the FAISS-style residual encoding earns its keep.
    */
  private def clusteredCorpus(groups: Int, perGroup: Int): DataFrame = {
    val rows = for (g <- 0 until groups; i <- 0 until perGroup) yield {
      val p = i % 8
      val v = Array.tabulate(dim)(d =>
        (if (d == 2 * g) 10.0 else 0.0) + math.cos(p * 2.3 + d * 1.1))
      ((g * perGroup + i).toLong, v)
    }
    rows.toDF("vec_id", "v")
  }

  test("residual PQ recall >= raw PQ recall at equal m/nProbe; residual appends encode with stored books") {
    val groups = 8
    val c = clusteredCorpus(groups, 60) // 480 rows
    val qs = c.filter(col("vec_id") % 20 === 7)
      .select(col("vec_id").as("qid"), col("v"))
    // tiny codebooks (m=4, codes=16) so raw reconstruction error is
    // center-separation-sized; rerank=1 means the approx stage's top-k
    // IS the answer set — recall differences cannot be masked by rerank.
    // Both centroids and codes are 2× over-provisioned vs the 8 true
    // groups/patterns: the deterministic md5 seeding of 8 seeds covers
    // only 5 of 8 groups and 7 of 8 jitter patterns (verified), and the
    // missed ones degrade BOTH encodings for coarse-quantizer reasons
    // this A/B is not about; 16 seeds cover all 8 of each, and nProbe=4
    // reaches a split group's subcells.
    def build(res: Boolean) = VectorOps.buildIvfPqIndex(c, "vec_id", "v",
      tmpTable(), numCentroids = 2 * groups, iterations = 5, m = 4, codes = 16,
      residual = res)
    val raw = build(res = false)
    val res = build(res = true)
    val exact = c.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val n = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      if (n == 0) 0.0 else d / n
    }
    val truth = qs.collect().map { r =>
      val q = r.getSeq[Double](1)
      r.getLong(0) -> exact.toSeq.sortBy { case (id, v) => (-cos(q, v), id) }
        .take(10).map(_._1).toSet
    }.toMap
    def recall(t: graft.table.GraftTable): Double = {
      val got = VectorOps.knnJoinIvfPq(qs, "qid", "v", t, c, "vec_id", "v",
          k = 10, nProbe = 4, rerank = 1)
        .collect().groupBy(_.getLong(0)).map { case (q, rs) =>
          rs.map(_.getLong(1)).toSet.intersect(truth(q)).size / 10.0 }
      got.sum / got.size
    }
    val (rRaw, rRes) = (recall(raw), recall(res))
    info(f"recall raw=$rRaw%.3f residual=$rRes%.3f")
    assert(rRes >= rRaw + 0.2,
      f"residual encoding did not materially beat raw at equal m/nProbe: " +
        f"$rRes%.3f vs $rRaw%.3f")
    assert(rRes >= 0.8, f"residual recall too low: $rRes%.3f")
    // appends to a residual index must encode with the STORED residual
    // books and land retrievable: the appended near-twin of row 7 ties
    // at cosine ≈ 1.0 with the 7 in-group rows sharing row 7's exact
    // vector (pattern duplicates), so membership in the top-10 — which
    // requires surviving the ADC stage with a sane stored-book code —
    // is the assert, not rank 1
    val twin = c.filter(col("vec_id") === 7L)
      .select((col("vec_id") + 100000L).as("vec_id"),
        expr("transform(v, x -> x + 0.001)").as("v"))
    VectorOps.appendToIvfPqIndex(res, twin, "vec_id", "v")
    val c2 = c.unionByName(twin)
    val hits = VectorOps.knnJoinIvfPq(
        twin.select(col("vec_id").as("qid"), col("v")), "qid", "v",
        res, c2, "vec_id", "v", k = 10, nProbe = 2)
      .collect().map(_.getLong(1)).toSet
    assert(hits.contains(100007L) && hits.contains(7L),
      s"appended residual row not retrievable: $hits")
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
