package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

private[graft] object PipelineUtil {

  /** Exclusive distributed prefix sum: append `outCol` = Σ `weight` over
    * all rows strictly BEFORE this one under the `order` columns (which
    * must be a TOTAL order — include a tiebreaker id), without ever
    * collapsing to one partition. A bare `Window.orderBy` with no
    * partitionBy is the classic global-sequence trap: Spark plans it as a
    * SINGLE task holding the whole dataset. Instead: range-repartition on
    * the order keys (RangePartitioner assigns contiguous ascending ranges
    * to ascending partition ids), take per-partition totals (≤
    * shuffle-partition-count rows — a bounded driver collect), broadcast
    * the running offsets back, and add a per-partition exclusive running
    * sum. Scales to any row count at a cost of one range shuffle of the
    * (slim) frame.
    *
    * The frame is pinned (lazy local checkpoint) between the totals
    * collect and the final plan — correctness, not just perf: partition
    * ids must be the SAME physical assignment in both passes.
    */
  def exclusivePrefixSum(df: DataFrame, order: Seq[Column], weight: Column,
      outCol: String): DataFrame = {
    // null weights (e.g. size(split(null)) = -1/null upstream) would make
    // a partition total null and corrupt every downstream offset — treat
    // null as 0 and fail loud on negatives rather than emit bad offsets
    val w = coalesce(weight.cast("long"), lit(0L))
    val ranged = pin(
      df.withColumn("__w", w)
        .repartitionByRange(order: _*)
        .withColumn("__pid", spark_partition_id()))
    val totals = ranged.groupBy("__pid")
      .agg(sum("__w").as("__t"), min("__w").as("__m"))
      .collect().map { r =>
        require(r.getLong(2) >= 0L,
          s"exclusivePrefixSum: negative weight ${r.getLong(2)} — " +
            "upstream null text tokenized under legacy sizeOfNull=-1?")
        r.getInt(0) -> r.getLong(1)
      }.sortBy(_._1)
    val offsets = totals.scanLeft(0L)(_ + _._2).init
    val spark = df.sparkSession
    import spark.implicits._
    val prefixDf = totals.map(_._1).zip(offsets).toSeq.toDF("__pid", "__pre")
    val win = Window.partitionBy("__pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(prefixDf), Seq("__pid"), "left")
      .withColumn(outCol, coalesce(col("__pre"), lit(0L)) +
        coalesce(sum(col("__w")).over(win), lit(0L)))
      .drop("__pid", "__w", "__pre")
  }

  /** Repartition a corpus when its lineage exposes far fewer partitions
    * than the cluster has cores — a corpus read from one file (or a
    * handful) would otherwise run every per-row sketch/signature serially
    * in one task, which is the actual bottleneck at small file counts.
    * No-op once the frame already has ≥ half the cores' worth of
    * partitions: at that point the shuffle costs more than the residual
    * imbalance saves. At 100 TB the input arrives thousands-partitioned
    * and this never fires.
    */
  def spread(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    // partition count from the frame's OWN (cached) QueryExecution:
    // `df.rdd` would wrap the plan in DeserializeToObject and plan the
    // whole query a second time just to count partitions
    val parts = df.queryExecution.toRdd.getNumPartitions
    if (parts < (want + 1) / 2) df.repartition(want) else df
  }

  /** Pin a frame for multiple downstream consumers WITHOUT a serializing
    * materialization barrier: a lazy local checkpoint persists the RDD the
    * first time an action touches it (inside the consumer's own job, so
    * stages still overlap) and truncates lineage for everything above it.
    * An eager `localCheckpoint(true)` here would turn an N-pin pipeline
    * into N+1 strictly serial jobs — measurably slower at any scale and
    * the round-5 bench regression in the near-dup pipeline.
    */
  def pin(df: DataFrame): DataFrame = df.localCheckpoint(eager = false)
}
