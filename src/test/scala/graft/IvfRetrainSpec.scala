package graft

import graft.pipeline.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.Random

/** Centroid drift and its repair ([[VectorOps.retrainIvfIndex]] /
  * `CALL sys.retrain_ivf`): appends route by the STORED centroids forever,
  * so when the embedding distribution drifts (here: a new regime of
  * clusters orthogonal to every training-time direction) new-regime
  * vectors spray across the old Voronoi cells and nearest-centroid probes
  * lose recall at fixed nProbe. Retraining must restore recall, keep the
  * index content intact, and leave appends routing by the NEW stored
  * centroids.
  */
class IvfRetrainSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** A tight cluster of `n` vectors around axis `axis` (unit direction +
    * small seeded noise), ids starting at `base`.
    */
  private def cluster(axis: Int, n: Int, base: Long, seed: Int): Seq[(Long, Array[Double])] = {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      (base + i, Array.tabulate(dim)(d =>
        (if (d == axis) 1.0 else 0.0) + 0.05 * rnd.nextGaussian()))
    }
  }

  /** Regime A: clusters on axes 0..3. Regime B (the drift): axes 4..7 —
    * near-orthogonal to every regime-A direction.
    */
  private def regimeA: Seq[(Long, Array[Double])] =
    (0 until 4).flatMap(a => cluster(a, 60, 1000L * a, seed = a))
  private def regimeB: Seq[(Long, Array[Double])] =
    (4 until 8).flatMap(a => cluster(a, 60, 1000L * a, seed = 100 + a))

  private def df(rows: Seq[(Long, Array[Double])]): DataFrame =
    rows.toDF("vec_id", "v").repartition(5)

  /** recall@k of knnJoinIvf against brute-force cosine over the corpus. */
  private def recallAtK(index: graft.table.GraftTable,
      corpus: Seq[(Long, Array[Double])],
      queries: Seq[(Long, Array[Double])], k: Int, nProbe: Int): Double = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val truth = queries.map { case (qid, qv) =>
      qid -> corpus.map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
    }.toMap
    val got = VectorOps.knnJoinIvf(df(queries).toDF("qid", "v"), "qid", "v",
        index, k = k, nProbe = nProbe)
      .select("query_id", "corpus_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    queries.map { case (qid, _) =>
      val t = truth(qid)
      got.getOrElse(qid, Set.empty[Long]).count(t).toDouble / t.size
    }.sum / queries.size
  }

  test("drift drops recall; retrain_ivf restores it; appends route by the new centroids") {
    val index = VectorOps.buildIvfIndex(df(regimeA), "vec_id", "v",
      tmpTable(), numCentroids = 4, iterations = 3)
    // regime B arrives through the normal incremental-append path
    VectorOps.appendToIvfIndex(index, df(regimeB), "vec_id", "v")
    val corpus = regimeA ++ regimeB
    val queries = (4 until 8).map(a => (9000L + a,
      Array.tabulate(dim)(d => if (d == a) 1.0 else 0.01 * (d - 3))))

    // regime-A queries are still served well by the regime-A centroids
    val qA = (0 until 4).map(a => (8000L + a,
      Array.tabulate(dim)(d => if (d == a) 1.0 else 0.0)))
    assert(recallAtK(index, corpus, qA, k = 10, nProbe = 1) >= 0.9)

    // regime-B queries: every stored centroid lives in the A subspace, so
    // B vectors sprayed across cells by noise — single-probe recall decays
    val before = recallAtK(index, corpus, queries, k = 10, nProbe = 1)
    assert(before < 0.8, s"expected drifted recall to drop, got $before")

    val oldCents = index.schema.option("ivf.centroids", "")
    val (nc, rewritten) = VectorOps.retrainIvfIndex(index,
      iterations = 3, reseed = true)
    assert(nc === 4)
    assert(rewritten === corpus.size.toLong)
    // options flipped, stamp cleared, content intact
    assert(index.schema.option("ivf.retrain.pending", "") === "")
    assert(index.schema.option("ivf.centroids", "") !== oldCents)
    assert(index.toDF.count() === corpus.size.toLong)
    assert(index.toDF.select("vec_id").distinct().count() === corpus.size.toLong)

    val after = recallAtK(index, corpus, queries, k = 10, nProbe = 1)
    assert(after >= 0.9, s"expected retrain to restore recall, got $after")
    assert(after > before)
    // the old regime keeps working too (reseed saw both regimes)
    assert(recallAtK(index, corpus, qA, k = 10, nProbe = 1) >= 0.9)

    // incremental appends after the retrain route by the NEW stored
    // centroids: read the appended rows' cells back and recompute locally
    val fresh = cluster(axis = 5, n = 10, base = 50000L, seed = 999)
    VectorOps.appendToIvfIndex(index, df(fresh), "vec_id", "v")
    val newCents = index.schema.option("ivf.centroids", "")
      .split(';').toSeq.map(_.split(',').toSeq.map(_.toDouble))
    def norm(v: Seq[Double]) = math.sqrt(v.map(x => x * x).sum)
    val stored = index.toDF.filter(col("vec_id") >= 50000L)
      .select("vec_id", "ivf_cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(stored.size === 10)
    fresh.foreach { case (id, v) =>
      val want = newCents.zipWithIndex.maxBy { case (c, ci) =>
        (c.zip(v).map { case (x, y) => x * y }.sum / (norm(c) * norm(v.toSeq)),
          -ci)
      }._2
      assert(stored(id) === want, s"append routing for $id")
    }
  }

  // ---- quantized retrains. Fixture with a WIDE build-time residual span
  // (LOOSE regime-A clusters, σ=0.5) so drifted regime-B rows encode
  // in-span and decode faithfully — the regime where retraining a
  // quantized index is meaningful. Out-of-span drift (values beyond the
  // trained affine range / codebook span) clamps at encode time and needs
  // a rebuild from the source corpus, as the scaladoc documents. ----

  private def looseA: Seq[(Long, Array[Double])] =
    (0 until 4).flatMap { a =>
      val rnd = new Random(a)
      (0 until 60).map(i => (1000L * a + i, Array.tabulate(dim)(d =>
        (if (d == a) 1.0 else 0.0) + 0.5 * rnd.nextGaussian())))
    }

  // σ=0.25: per-row assignment noise (±0.25 against the stored centroids)
  // dominates the centroids' small fixed components on B dims (±0.07), so
  // each B family SPRAYS across the old cells — the drift that costs
  // recall at fixed nProbe — while staying tight enough (90° between
  // family axes) that a retrained cell holds each family whole
  private def tightB: Seq[(Long, Array[Double])] =
    (4 until 8).flatMap { a =>
      val rnd = new Random(100 + a)
      (0 until 60).map(i => (1000L * a + i, Array.tabulate(dim)(d =>
        (if (d == a) 1.0 else 0.0) + 0.25 * rnd.nextGaussian())))
    }

  private def qB: Seq[(Long, Array[Double])] =
    (4 until 8).map(a => (9000L + a,
      Array.tabulate(dim)(d => if (d == a) 1.0 else 0.0)))

  /** recall@k of the quantized knn joins against brute-force cosine. */
  private def recallQuant(index: graft.table.GraftTable,
      corpus: Seq[(Long, Array[Double])],
      queries: Seq[(Long, Array[Double])], k: Int, nProbe: Int,
      pq: Boolean): Double = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val truth = queries.map { case (qid, qv) =>
      qid -> corpus.map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
    }.toMap
    val cdf = df(corpus).toDF("vec_id", "v")
    val qdf = df(queries).toDF("qid", "v")
    val res =
      if (pq) VectorOps.knnJoinIvfPq(qdf, "qid", "v", index, cdf,
        "vec_id", "v", k, nProbe)
      else VectorOps.knnJoinIvfSq(qdf, "qid", "v", index, cdf,
        "vec_id", "v", k, nProbe)
    val got = res.select("query_id", "corpus_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    queries.map { case (qid, _) =>
      val t = truth(qid)
      got.getOrElse(qid, Set.empty[Long]).count(t).toDouble / t.size
    }.sum / queries.size
  }

  test("SQ8 retrain: re-clusters from decodes, codes ride unchanged, recall restored") {
    val index = VectorOps.buildIvfSqIndex(df(looseA), "vec_id", "v",
      tmpTable(), numCentroids = 4, iterations = 3)
    VectorOps.appendToIvfSqIndex(index, df(tightB), "vec_id", "v")
    val corpus = looseA ++ tightB
    val before = recallQuant(index, corpus, qB, k = 10, nProbe = 1, pq = false)
    assert(before < 0.7, s"expected drifted SQ recall to drop, got $before")
    def codeOf(id: Long): Seq[Short] = index.toDF
      .filter(col("vec_id") === id).select("sq_code")
      .collect()(0).getSeq[Short](0)
    val c0 = codeOf(4003L)
    val (nc, n) = VectorOps.retrainIvfIndex(index, iterations = 3, reseed = true)
    assert(nc === 4)
    assert(n === corpus.size.toLong)
    assert(index.schema.option("ivf.retrain.pending", "") === "")
    assert(index.toDF.count() === corpus.size.toLong)
    // SQ codes are cell-independent: the retrain moved the row, not its code
    assert(codeOf(4003L) === c0, "SQ codes must ride unchanged")
    val after = recallQuant(index, corpus, qB, k = 10, nProbe = 1, pq = false)
    assert(after > before, s"SQ retrain did not improve recall: $before -> $after")
    assert(after >= 0.8, s"SQ retrain recall too low: $after")
  }

  test("residual-PQ retrain: stamped plan, crash resume, books re-trained, recall restored") {
    val index = VectorOps.buildIvfPqIndex(df(looseA), "vec_id", "v",
      tmpTable(), numCentroids = 4, iterations = 3, m = 8, codes = 32)
    assert(index.schema.option("ivf.pq.residual", "false") === "true",
      "new PQ indexes must default to residual encoding")
    VectorOps.appendToIvfPqIndex(index, df(tightB), "vec_id", "v")
    val corpus = looseA ++ tightB
    val before = recallQuant(index, corpus, qB, k = 10, nProbe = 1, pq = true)
    assert(before < 0.7, s"expected drifted PQ recall to drop, got $before")
    val oldBooks = index.schema.option("ivf.pq.books", "")
    val oldCents = index.schema.option("ivf.centroids", "")
    // crash exactly after the plan is stamped: the rewrite never runs, so
    // codes still decode with the live options
    VectorOps.retrainMidpointHook = () => throw new RuntimeException("simulated crash")
    try intercept[RuntimeException] {
      VectorOps.retrainIvfIndex(index, iterations = 3, reseed = true)
    } finally VectorOps.retrainMidpointHook = () => ()
    assert(index.schema.option("ivf.retrain.pending.q", "").nonEmpty,
      "crash left no stamped plan")
    assert(index.schema.option("ivf.pq.books", "") === oldBooks,
      "crash must not flip live options")
    // resume completes the stamped plan: re-encode + CAS overwrite + flip
    val (nc, n) = VectorOps.retrainIvfIndex(index)
    assert(nc === 4)
    assert(n === corpus.size.toLong)
    assert(index.schema.option("ivf.retrain.pending.q", "") === "")
    assert(index.schema.option("ivf.pq.books", "") !== oldBooks,
      "books were not re-trained")
    assert(index.schema.option("ivf.centroids", "") !== oldCents)
    assert(index.toDF.count() === corpus.size.toLong)
    assert(index.toDF.select("vec_id").distinct().count() === corpus.size.toLong)
    val after = recallQuant(index, corpus, qB, k = 10, nProbe = 1, pq = true)
    assert(after > before, s"PQ retrain did not improve recall: $before -> $after")
    assert(after >= 0.8, s"PQ retrain recall too low: $after")
  }

  test("quantized retrain resume survives pre-rewrite concurrent appends") {
    // crash after the plan is stamped, then a writer appends (encoding
    // with the STORED meta — still the live options). The resume must
    // detect that no OVERWRITE landed, re-encode EVERYTHING at the new
    // base with the stamped plan, and lose nothing.
    val index = VectorOps.buildIvfPqIndex(df(looseA), "vec_id", "v",
      tmpTable(), numCentroids = 4, iterations = 2, m = 8, codes = 32)
    VectorOps.retrainMidpointHook = () => throw new RuntimeException("crash")
    try intercept[RuntimeException] {
      VectorOps.retrainIvfIndex(index, iterations = 2, reseed = true)
    } finally VectorOps.retrainMidpointHook = () => ()
    assert(index.schema.option("ivf.retrain.pending.q", "").nonEmpty)
    val late = cluster(axis = 2, n = 15, base = 70000L, seed = 77)
    VectorOps.appendToIvfPqIndex(index, df(late), "vec_id", "v")
    val (nc, n) = VectorOps.retrainIvfIndex(index)
    assert(nc === 4)
    assert(n === (looseA.size + late.size).toLong)
    assert(index.schema.option("ivf.retrain.pending.q", "") === "")
    assert(index.toDF.count() === (looseA.size + late.size).toLong)
    assert(index.toDF.select("vec_id").distinct().count() ===
      (looseA.size + late.size).toLong)
    // the resumed index still retrieves: every late query's top-1 comes
    // from its own (tight) cluster — near-identical vectors share a PQ
    // code, so exact self-retrieval at k=1 is not a quantized guarantee,
    // cluster membership is
    val lateIds = late.map(_._1).toSet
    val res = VectorOps.knnJoinIvfPq(df(late).toDF("qid", "v"), "qid", "v",
        index, df(looseA ++ late).toDF("vec_id", "v"), "vec_id", "v",
        k = 1, nProbe = 2)
      .select("query_id", "corpus_id").collect()
    assert(res.length === late.size)
    assert(res.forall(r => lateIds.contains(r.getLong(1))),
      s"top-1 outside the query's cluster after resume")
  }

  test("quantized resume fails loud when the table was rolled back below the stamped base") {
    // a stamp whose base snapshot no longer exists describes codes the
    // table no longer stores — the resume must throw the explicit
    // rebuild-pointer error, never a bare NoSuchElementException from an
    // empty commit-kind walk
    val index = VectorOps.buildIvfPqIndex(df(looseA), "vec_id", "v",
      tmpTable(), numCentroids = 4, iterations = 2, m = 8, codes = 32)
    VectorOps.retrainMidpointHook = () => throw new RuntimeException("crash")
    try intercept[RuntimeException] {
      VectorOps.retrainIvfIndex(index, iterations = 2, reseed = true)
    } finally VectorOps.retrainMidpointHook = () => ()
    assert(index.schema.option("ivf.retrain.pending.q", "").nonEmpty)
    // simulate a restore/truncation below the stamped base: delete the
    // top snapshot out from under the stamp
    val store = index.store
    val top = store.latestSnapshotId.get
    store.fs.delete(store.snapshotPath(top), false)
    val ex = intercept[IllegalStateException] {
      VectorOps.retrainIvfIndex(index)
    }
    assert(ex.getMessage.contains("rolled back"), ex.getMessage)
    assert(ex.getMessage.contains("buildIvfPqIndex"), ex.getMessage)
  }

  test("quantized resume detects a FOREIGN overwrite at base+1 and refuses the flip") {
    // an unsigned whole-table OVERWRITE (contract-violating writer,
    // rollback commit) is indistinguishable from the retrain's own
    // rewrite by kind alone — the signed-commitUser check must fail the
    // resume loudly instead of flipping options onto never-re-encoded
    // codes
    val index = VectorOps.buildIvfPqIndex(df(looseA), "vec_id", "v",
      tmpTable(), numCentroids = 4, iterations = 2, m = 8, codes = 32)
    VectorOps.retrainMidpointHook = () => throw new RuntimeException("crash")
    try intercept[RuntimeException] {
      VectorOps.retrainIvfIndex(index, iterations = 2, reseed = true)
    } finally VectorOps.retrainMidpointHook = () => ()
    assert(index.schema.option("ivf.retrain.pending.q", "").nonEmpty)
    index.overwrite(index.toDF) // foreign: default commitUser, OVERWRITE kind
    val ex = intercept[IllegalStateException] {
      VectorOps.retrainIvfIndex(index)
    }
    assert(ex.getMessage.contains("signed rewrite"), ex.getMessage)
    // the live options were never flipped — codes still decode correctly
    assert(index.schema.option("ivf.retrain.pending.q", "").nonEmpty)
  }

  test("a crashed retrain resumes from the pending centroids, not a fresh sample") {
    val index = VectorOps.buildIvfIndex(df(regimeA), "vec_id", "v",
      tmpTable(), numCentroids = 4, iterations = 2)
    // simulate the crash window: pending stamped, data/options untouched
    val pinned = (0 until 4).map(a =>
      Array.tabulate(dim)(d => if (d == a + 4) 1.0 else 0.0)
        .map(java.lang.Double.toString).mkString(",")).mkString(";")
    index.evolveBatch(Seq(index.setOptionT("ivf.retrain.pending", pinned)))
    val (nc, _) = VectorOps.retrainIvfIndex(index, iterations = 5)
    assert(nc === 4)
    // the resumed run must install EXACTLY the pending centroids (no
    // retraining) and clear the stamp
    assert(index.schema.option("ivf.centroids", "") === pinned)
    assert(index.schema.option("ivf.retrain.pending", "") === "")
    // rows were reassigned by the pinned centroids
    val cells = index.toDF.select("ivf_cluster").distinct()
      .collect().map(_.getInt(0)).toSet
    val local = regimeA.map { case (_, v) =>
      (0 until 4).maxBy(c => v(c + 4)) // cosine vs one-hot pinned centroids
    }.toSet
    assert(cells === local)
  }

  test("discardPending drops a stale stamp and retrains with THIS call's args") {
    val index = VectorOps.buildIvfIndex(df(regimeA), "vec_id", "v",
      tmpTable(), numCentroids = 4, iterations = 2)
    val before = index.schema.option("ivf.centroids", "")
    // a stale stamp from an abandoned run with bad parameters
    val stale = (0 until 4).map(a =>
      Array.tabulate(dim)(d => if (d == a + 4) 1.0 else 0.0)
        .map(java.lang.Double.toString).mkString(",")).mkString(";")
    index.evolveBatch(Seq(index.setOptionT("ivf.retrain.pending", stale)))
    val (nc, _) = VectorOps.retrainIvfIndex(index, iterations = 3,
      discardPending = true)
    assert(nc === 4)
    val installed = index.schema.option("ivf.centroids", "")
    assert(installed !== stale, "stale pending centroids were resumed")
    assert(installed !== before, "no retrain happened")
    assert(index.schema.option("ivf.retrain.pending", "") === "")
  }

  test("retrain fails loud if the index commits mid-retrain (single-writer contract)") {
    val index = VectorOps.buildIvfIndex(df(regimeA), "vec_id", "v",
      tmpTable(), numCentroids = 4, iterations = 2)
    // inject "another writer" into the guarded window via the test seam:
    // an append lands between the retrain's initial read and its
    // whole-table rewrite — exactly the race the OVERWRITE would
    // otherwise silently lose
    VectorOps.retrainMidpointHook = () =>
      VectorOps.appendToIvfIndex(index,
        df(cluster(axis = 1, n = 5, base = 7000L, seed = 5)), "vec_id", "v")
    try {
      val e = intercept[IllegalArgumentException] {
        VectorOps.retrainIvfIndex(index, iterations = 2)
      }
      assert(e.getMessage.contains("exclusive write access"), e.getMessage)
    } finally VectorOps.retrainMidpointHook = () => ()
    // the concurrent append's rows were NOT dropped (no overwrite ran),
    // and the pending stamp makes a quiet rerun resume and complete
    assert(index.toDF.count() === (regimeA.size + 5).toLong)
    assert(index.schema.option("ivf.retrain.pending", "") !== "")
    val (nc, rewritten) = VectorOps.retrainIvfIndex(index)
    assert(nc === 4)
    assert(rewritten === (regimeA.size + 5).toLong)
    assert(index.schema.option("ivf.retrain.pending", "") === "")
  }
}
