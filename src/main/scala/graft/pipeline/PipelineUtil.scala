package graft.pipeline

import org.apache.spark.sql.DataFrame

private[pipeline] object PipelineUtil {

  /** Repartition a corpus when its lineage exposes fewer partitions than
    * the cluster has cores — a corpus read from one file (or a handful)
    * would otherwise run every per-row sketch/signature serially in one
    * task, which is the actual bottleneck at small file counts. At 100 TB
    * the input arrives thousands-partitioned and this is a no-op.
    */
  def spread(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }
}
