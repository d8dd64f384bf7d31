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
}
