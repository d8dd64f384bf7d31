package graft.pipeline

import org.apache.spark.sql.DataFrame

private[pipeline] object PipelineUtil {

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
