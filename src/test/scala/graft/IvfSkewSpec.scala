package graft

import graft.pipeline.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-cell behavior of the persisted IVF index: a skewed corpus (half of
  * all rows nearly colinear, so they land in ONE coarse cell) must not
  * leave that cell as a single straggler write/compaction unit. Build-time
  * salting splits oversized cells into (ivf_cluster, ivf_salt)
  * sub-partitions; [[VectorOps.rebalanceIndex]] repairs drift after
  * appends. Retrieval must be bit-identical salted vs unsalted — the salt
  * is pure layout.
  */
class IvfSkewSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** `n` hot rows EXACTLY colinear (varying magnitude — cosine assignment
    * ties them all into one cell deterministically) + `n` cold rows spread
    * out.
    */
  private def skewedCorpus(n: Int): DataFrame = {
    val hotDir = Array.tabulate(dim)(d => if (d == 0) 10.0 else 0.5 * d)
    val hot = (0 until n).map { i =>
      (i.toLong, hotDir.map(_ * (1.0 + i % 5)))
    }
    val cold = (0 until n).map { i =>
      (n + i.toLong, Array.tabulate(dim)(d =>
        math.sin(0.7 * (i * dim + d)) * 5.0))
    }
    (hot ++ cold).toDF("vec_id", "v")
  }

  private def partRows(t: graft.table.GraftTable): Map[Seq[String], Long] =
    t.store.latestSnapshot.map(s => t.store.liveFiles(s))
      .getOrElse(Nil)
      .groupBy(_.partition)
      .view.mapValues(_.map(_.liveRowCount).sum).toMap

  private def queries(corpus: DataFrame): DataFrame =
    corpus.filter(col("vec_id") % 400 === 0)
      .select(col("vec_id").as("qid"), col("v"))

  test("hot cell is salted at build; per-partition rows bounded; retrieval unchanged") {
    val c = skewedCorpus(1000)
    val salted = VectorOps.buildIvfIndex(c, "vec_id", "v", tmpTable(),
      numCentroids = 8, maxCellRows = 300)
    val unsalted = VectorOps.buildIvfIndex(c, "vec_id", "v", tmpTable(),
      numCentroids = 8, maxCellRows = Long.MaxValue)

    // the hot cell (1000 rows > 300) fans out over >1 salt
    val saltsOpt = salted.schema.option("ivf.salts", "")
    assert(saltsOpt.nonEmpty, "expected a non-empty salt plan on the skewed corpus")
    val rows = partRows(salted)
    assert(rows.values.sum === 2000L)
    val maxPart = rows.values.max
    // hash-mod splitting is approximate; bound with 25% slack
    assert(maxPart <= 375, s"per-partition rows not bounded: $maxPart > 1.25*300 ($rows)")
    assert(rows.keys.map(_.head).toSeq.distinct.size < rows.size,
      "expected at least one cell split into multiple salt sub-partitions")
    // the unsalted twin keeps everything in one partition per cell
    assert(partRows(unsalted).values.max >= 1000L)

    // retrieval is layout-independent: same centroids (same training data),
    // so knnJoinIvf and ivfIndexTopK must return identical rows
    val q = queries(c)
    val a = VectorOps.knnJoinIvf(q, "qid", "v", salted, k = 5).collect().toSet
    val b = VectorOps.knnJoinIvf(q, "qid", "v", unsalted, k = 5).collect().toSet
    assert(a === b, "salted vs unsalted knnJoinIvf diverged")
    val qv = c.filter(col("vec_id") === 0).select(col("v")).collect()(0).getSeq[Double](0)
    val ta = VectorOps.ivfIndexTopK(salted, qv, 5).collect().toSeq
    val tb = VectorOps.ivfIndexTopK(unsalted, qv, 5).collect().toSeq
    assert(ta === tb, "salted vs unsalted ivfIndexTopK diverged")
  }

  test("appends drift the hot cell; rebalance_index re-salts it and bounds partitions again") {
    val c = skewedCorpus(1000)
    val index = VectorOps.buildIvfIndex(c, "vec_id", "v", tmpTable(),
      numCentroids = 8, maxCellRows = 300)
    val before = VectorOps.knnJoinIvf(queries(c), "qid", "v", index, k = 5).collect().toSet

    // 1000 MORE hot rows: they route onto the existing salt plan (ceil(1000/300)
    // = 4 salts), so the hot cell's sub-partitions grow to ~500 rows each
    val hotDir = Array.tabulate(dim)(d => if (d == 0) 10.0 else 0.5 * d)
    val extraHot = (0 until 1000).map { i =>
      (10000 + i.toLong, hotDir.map(_ * (1.0 + i % 5)))
    }.toDF("vec_id", "v")
    VectorOps.appendToIvfIndex(index, extraHot, "vec_id", "v")
    assert(partRows(index).values.max > 375, "fixture should drift past the bound")

    val moved = VectorOps.rebalanceIndex(index)
    assert(moved.nonEmpty, "rebalance must rewrite the drifted cell")
    assert(moved.forall { case (_, o, n) => n > o },
      s"drifted cells should gain salts: $moved")
    val rows = partRows(index)
    assert(rows.values.sum === 3000L, "rebalance must not lose or duplicate rows")
    assert(rows.values.max <= 375,
      s"per-partition rows not bounded after rebalance: ${rows.values.max} ($rows)")

    // content unchanged: original queries see the original corpus + the new
    // hot rows ranked identically to a fresh unsalted twin of the SAME data
    val after = VectorOps.knnJoinIvf(queries(c), "qid", "v", index, k = 5).collect().toSet
    // the appended hot rows can displace old neighbors in hot-cell queries,
    // so compare against a from-scratch index over the identical content
    // built on the same stored centroids: simplest equivalent — re-run on a
    // maxCellRows=MaxValue rebuild is NOT comparable (retraining). Instead
    // assert determinism of the rebalanced index itself:
    val again = VectorOps.knnJoinIvf(queries(c), "qid", "v", index, k = 5).collect().toSet
    assert(after === again)
    // and that queries against cold cells (untouched by the rewrite) are
    // exactly what they were before the append/rebalance
    val coldQ = queries(c).filter(col("qid") >= 1000)
    val coldBefore = before.filter(r => r.getLong(0) >= 1000)
    val coldAfter = after.filter(r => r.getLong(0) >= 1000)
    assert(coldAfter === coldBefore, "cold-cell retrieval changed across rebalance")
  }

  test("CALL sys.rebalance_index reports the re-salted cells") {
    val c = skewedCorpus(600)
    val path = tmpTable()
    val index = VectorOps.buildIvfIndex(c, "vec_id", "v", path,
      numCentroids = 8, maxCellRows = 200)
    val hotDir = Array.tabulate(dim)(d => if (d == 0) 10.0 else 0.5 * d)
    val extraHot = (0 until 600).map { i =>
      (20000 + i.toLong, hotDir.map(_ * (1.0 + i % 5)))
    }.toDF("vec_id", "v")
    VectorOps.appendToIvfIndex(index, extraHot, "vec_id", "v")
    val msg = spark.sql(s"CALL sys.rebalance_index('$path')").collect()(0).getString(0)
    assert(msg.contains("rebalanced cells"), msg)
    val msg2 = spark.sql(s"CALL sys.rebalance_index('$path')").collect()(0).getString(0)
    assert(msg2.contains("within plan"), msg2)
  }
}
