package graft.streaming

import graft.pipeline.Dedup
import graft.table.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous dedup-on-ingest: the production shape of the incremental
  * dedup primitives ("dedup tonight's crawl batch against the existing
  * corpus" — reference capability family: paimon's streaming upsert ingest
  * with `deduplicate` merge-engine, paimon-flink/.../sink/; the near-dup
  * layer is pipeline-level, beyond the reference).
  *
  * Each micro-batch of incoming documents is
  *  1. exact-deduplicated within itself (one survivor per text
  *     fingerprint, smallest id wins — deterministic),
  *  2. near-dup-deduplicated within itself (MinHash LSH pairs, the larger
  *     id of every verified pair drops),
  *  3. near-dup-checked AGAINST the persisted signature index of the
  *     corpus ([[Dedup.nearDupPairsAgainst]] — the corpus text is never
  *     re-shingled; only its tiny (id, sig) index is banded), and
  *  4. the survivors are appended to the corpus table and their
  *     signatures upserted into the index, both under
  *     `commitIdentifier = batchId` — graft's per-commitUser exactly-once
  *     filter makes a replayed batch a no-op on whichever table already
  *     committed it.
  *
  * Crash-recovery correctness: the two writes are not atomic together, but
  * the dedup decision is a deterministic function of (batch, index
  * snapshot). If a failure lands between the corpus commit and the index
  * commit, the restarted batch recomputes the SAME survivor set (the index
  * has not advanced), the corpus append is filtered as already-committed,
  * and only the index upsert lands — converging to the committed state
  * rather than duplicating or losing documents.
  *
  * Scale shape: per batch the corpus participates only through (a) its
  * signature index scan (band projections, no text) and (b) candidate-id
  * text lookups for exact-Jaccard verification — an AQE-broadcast join of
  * the candidate ids against the corpus, never a corpus shuffle. A batch of
  * B docs against a 100-TB corpus costs O(B) signature work plus
  * |candidates| text reads.
  */
object StreamingDedup {

  /** What one micro-batch did — returned by [[processBatch]] and logged by
    * the streaming wrapper.
    */
  case class BatchResult(batchId: Long, input: Long, admitted: Long,
      droppedExact: Long, droppedIntra: Long, droppedCorpus: Long)

  /** Run one batch of the ingest-with-dedup pipeline (the `foreachBatch`
    * body; callable directly for batch backfills). `corpus` must contain
    * `idCol` and `textCol`; survivors are appended with the batch's full
    * column set projected to the corpus schema.
    */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, corpus: GraftTable, index: GraftTable,
      threshold: Double = 0.7, commitUser: String = "streaming-dedup")
      : BatchResult = {
    val in = batch.persist()
    val cached = scala.collection.mutable.ListBuffer[DataFrame](in)
    def keep(df: DataFrame): DataFrame = { cached += df.persist(); df }
    try {
      val inputN = in.count()

      // 1. exact intra-batch: one survivor per fingerprint, smallest id —
      // a min_by AGGREGATION (map-side partial, no per-group sort buffer).
      // The ordering key is (id IS NULL, id): min_by ignores rows whose
      // ordering value is null, so a bare null id would make a whole
      // group vanish into a null struct — the isNull prefix keeps the
      // ordering non-null (null-id rows sort last) while getField keeps
      // column names with dots resolvable.
      val exact = keep(in
        .groupBy(md5(col(textCol).cast("string")).as("__fp"))
        .agg(min_by(struct(in.columns.map(col): _*),
          struct(col(idCol).isNull.as("n"), col(idCol).as("i"))).as("__row"))
        .select(in.columns.map(c => col("__row").getField(c).as(c)): _*))
      val exactN = exact.count()

      // 2. near-dup intra-batch: larger id of every verified pair drops
      val intraPairs = Dedup.nearDupPairs(exact, idCol, textCol, threshold)
      val intraSurvivors = keep(exact.join(
        Dedup.dropIds(intraPairs).withColumnRenamed("drop_id", idCol),
        Seq(idCol), "left_anti"))
      val intraN = intraSurvivors.count()

      // 3. against the corpus: ANY verified pair drops the new doc (the
      // corpus copy wins — it is already served downstream)
      val corpusPairs = Dedup.nearDupPairsAgainst(intraSurvivors, idCol,
        textCol, index, corpus.toDF, threshold)
      val admitted = keep(intraSurvivors.join(
        corpusPairs.select(col("new_id").as(idCol)).distinct(),
        Seq(idCol), "left_anti"))
      val admittedN = admitted.count()

      // 4. exactly-once writes: distinct commitUsers give the two tables
      // independent replay filters keyed by the same batchId
      val corpusCols = corpus.schema.fields.map(f => col(f.name))
      corpus.append(admitted.select(corpusCols: _*),
        commitIdentifier = batchId, commitUser = s"$commitUser-corpus")
      Dedup.appendToSigIndex(index, admitted, idCol, textCol,
        commitIdentifier = batchId, commitUser = s"$commitUser-index")

      BatchResult(batchId, inputN, admittedN,
        droppedExact = inputN - exactN, droppedIntra = exactN - intraN,
        droppedCorpus = intraN - admittedN)
    } finally cached.foreach(_.unpersist()) // failed batches leak no blocks
  }

  /** Bootstrap / catch-up driver: run a LARGE historical frame through
    * the same dedup pipeline in `batches` deterministic chunks
    * (hash(id) % batches — stable across reruns), sequentially, each
    * under `commitIdentifier = startBatchId + chunk`. Use to build the
    * corpus + index from history with the SAME semantics the stream then
    * continues with (earlier chunks win ties, exactly like earlier
    * micro-batches).
    *
    * Resume-safety: rerunning after a crash re-executes every chunk, but
    * chunks whose commits already landed are replay-filtered by both
    * tables, and the crashed chunk recomputes its survivor set against
    * the exact index state it saw the first time (later chunks never ran)
    * — state converges. Note the REPORTED stats of already-committed
    * chunks can differ on replay (their decisions recompute against a
    * more advanced index); the table state cannot.
    */
  def backfill(docs: DataFrame, idCol: String, textCol: String,
      corpus: GraftTable, index: GraftTable, batches: Int,
      threshold: Double = 0.7, commitUser: String = "backfill-dedup",
      startBatchId: Long = 0L): Seq[BatchResult] = {
    require(batches > 0, s"batches must be positive: $batches")
    // a resumed backfill MUST reuse the original modulus: chunk contents
    // are hash(id) % batches but the replay filter keys on the chunk ID —
    // retrying with a different `batches` would replay-filter chunks whose
    // contents changed, silently losing documents. Pin the modulus on the
    // index the first time and hard-stop mismatched retries.
    val modKey = s"backfill.batches.$commitUser"
    index.schema.options.get(modKey) match {
      case Some(prev) => require(prev.toInt == batches,
        s"backfill '$commitUser' started with batches=$prev — resume with " +
          s"the same value (got $batches), or use a fresh commitUser")
      case None => index.setOption(modKey, batches.toString)
    }
    (0 until batches).map { b =>
      processBatch(
        docs.filter(pmod(xxhash64(col(idCol)), lit(batches)) === b),
        startBatchId + b, idCol, textCol, corpus, index, threshold,
        commitUser)
    }
  }

  /** Attach the pipeline to a streaming frame of documents. Results of
    * each batch go to `onBatch` (default: a log line). Exactly-once across
    * restarts comes from `commitIdentifier = batchId` + the checkpointed
    * source offsets, same contract as the graft streaming sink.
    */
  def start(docs: DataFrame, idCol: String, textCol: String,
      corpus: GraftTable, index: GraftTable, checkpointDir: String,
      threshold: Double = 0.7, commitUser: String = "streaming-dedup",
      onBatch: BatchResult => Unit = r => ()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onBatch(processBatch(batch, batchId, idCol, textCol, corpus, index,
          threshold, commitUser))
      }
      .start()
}
