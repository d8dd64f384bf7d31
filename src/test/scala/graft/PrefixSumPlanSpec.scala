package graft

import graft.pipeline.TextOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Plan-shape asserts for the round-15 prefix-sum ops: no single-partition
  * global window (the trap exclusivePrefixSum exists to avoid), stratum
  * offsets joined via BROADCAST, and the span-dedup join graph free of
  * cartesian products.
  */
class PrefixSumPlanSpec extends SparkSpec {
  import spark.implicits._

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val sub = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case _ => Seq.empty
    }
    p +: (sub ++ p.children.flatMap(flatten))
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    df.collect() // execute so AQE finalizes
    flatten(df.queryExecution.executedPlan).map(_.nodeName)
  }

  private def planStrings(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    df.collect()
    flatten(df.queryExecution.executedPlan).map(_.toString.linesIterator.next())
  }

  test("deterministicShuffle plans no single-partition global window") {
    val df = (0L until 2000L).toDF("doc_id").repartition(6)
    val out = TextOps.deterministicShuffle(df, "doc_id", 7L)
    val nodes = planStrings(out)
    // the Window node must be partitioned (partition spec non-empty) —
    // Spark renders an unpartitioned global window without a partitionBy
    // clause AND plans a SinglePartition exchange under it
    assert(!nodes.exists(_.contains("SinglePartition")),
      s"single-partition stage found:\n${nodes.mkString("\n")}")
    assert(nodes.exists(_.startsWith("Window")), "window missing")
  }

  test("budgetSample broadcasts the stratum offsets") {
    val df = (0L until 2000L).map(i => (i, s"s${i % 3}", "a b c"))
      .toDF("doc_id", "lang", "text").repartition(6)
    val out = TextOps.tokenBudgetSample(df, "doc_id", "lang", "text",
      Map("s0" -> 100L), defaultBudget = 50L)
    val names = planOf(out)
    assert(names.exists(_.contains("BroadcastHashJoin")),
      s"stratum-offset join is not broadcast:\n${names.mkString("\n")}")
    assert(!planStrings(out).exists(_.contains("SinglePartition")),
      "single-partition stage found")
  }

  test("removeRepeatedSpans plans no cartesian product") {
    val docs = (0L until 200L).map(i => (i, s"a b c d e f g h i$i"))
      .toDF("doc_id", "text")
    val out = TextOps.removeRepeatedSpans(docs, "doc_id", "text", 4)
    val names = planOf(out)
    assert(!names.exists(n => n.contains("Cartesian") ||
      n.contains("BroadcastNestedLoop")),
      s"non-equi join found:\n${names.mkString("\n")}")
  }

  test("span-dedup rebuild is a pure projection: no anti join, no per-token shuffle") {
    // repeated 4-token span across docs forces the rebuild leg to run
    val docs = (0L until 50L).map(i => (i, s"p q r s t u v w x$i y$i"))
      .toDF("doc_id", "text")
    val out = TextOps.removeRepeatedSpans(docs, "doc_id", "text", 4)
    val names = planOf(out)
    // pre-r17 rebuild: posexplode(toks) -> LeftAnti on (doc_id, pos) ->
    // sort+collect_list; the r17 slice-of-gaps rebuild must plan NONE of
    // these. The only Generates allowed are windowFrame's hash explode.
    assert(!names.exists(_.contains("LeftAnti")) &&
      !planStrings(out).exists(_.contains("LeftAnti")),
      s"anti join found in rebuild:\n${names.mkString("\n")}")
    val gens = planStrings(out).filter(_.startsWith("Generate"))
    assert(gens.forall(_.contains("xxhash64")),
      s"non-windowFrame explode found (per-token rebuild?):\n${gens.mkString("\n")}")
    // the removed text is really gone
    val rows = out.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getLong(2))).toMap
    assert(rows.count(_._2._2 > 0) == 49, "all but the canonical doc cut")
    assert(rows.values.count(_._1.startsWith("p q r s")) == 1,
      "exactly one doc keeps the canonical span")
  }

  test("dsirSample above the driver-top-k cutoff plans no TakeOrdered and matches the driver path") {
    val scored = (0L until 3000L).map(i => (i, (i % 97).toDouble / 7.0))
      .toDF("doc_id", "dsir_score").repartition(8)
    val viaDriver = TextOps.dsirSample(scored, "doc_id", "dsir_score",
      k = 500, temperature = 0.7, seed = 11L)
    val distributed = TextOps.dsirSample(scored, "doc_id", "dsir_score",
      k = 500, temperature = 0.7, seed = 11L, driverTopKMax = 0)
    val a = viaDriver.select("doc_id").as[Long].collect().toSet
    val b = distributed.select("doc_id").as[Long].collect().toSet
    assert(a == b, s"path disagreement: driver-only=${(a -- b).take(5)} " +
      s"distributed-only=${(b -- a).take(5)}")
    assert(a.size == 500)
    val nodes = planOf(distributed)
    assert(!nodes.exists(_.contains("TakeOrdered")),
      s"driver-merged top-k on the large-k path:\n${nodes.mkString("\n")}")
    assert(!planStrings(distributed).exists(_.contains("SinglePartition")),
      "single-partition stage found")
  }
}
