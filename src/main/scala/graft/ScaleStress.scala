package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession

/** One-off scaling datapoint for the dedup pipeline (BASELINE.md §scaling):
  * runs the three heaviest pipeline ops once on an arbitrary documents
  * parquet and prints one JSON line of wall-times. Drive it at 1× and 10×
  * corpus size to verify the plan shapes' slopes are ~linear — the 100-TB
  * claims rest on shapes (band-local joins, prefix filters, label
  * propagation), and this is the cheap empirical check.
  *
  * {{{
  *   runMain graft.ScaleStress /root/testdata/sf0.1/documents.parquet
  *   runMain graft.ScaleStress /tmp/docs_10x.parquet
  * }}}
  */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val docsPath = args(0)
    // optional second arg: comma-list of ops (minhash,jaccard,clusters).
    // jaccard (exact PPJoin) is EXPECTED to be excluded at extreme
    // replication factors: with a fixed vocabulary, per-token posting
    // lists grow linearly with corpus, so exact prefix-join candidates
    // grow ~quadratically — that is inherent to guaranteed-recall exact
    // joins, and the LSH path is the at-scale substitute (BASELINE.md
    // §scaling records the measured blow-up).
    val ops = (if (args.length > 1) args(1) else "minhash,jaccard,clusters")
      .split(',').map(_.trim).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.hadoop." + graft.spark.NioLocalFileSystem.ConfKey,
        graft.spark.NioLocalFileSystem.ConfValue)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(docsPath)
    val n = docs.count()
    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val out = f
      ((System.nanoTime() - t0) / 1e9, out)
    }
    // per-op lines print as each finishes, so a later op's failure (e.g.
    // a deliberately-run quadratic jaccard filling the disk) cannot lose
    // the earlier measurements
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    if (ops("minhash")) {
      val (t, pairs) =
        time(Dedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.7).count())
      results += "minhash_dedup" -> t
      println(f"""{"op":"minhash_dedup","sec":$t%.3f,"pairs":$pairs,"docs":$n}""")
    }
    if (ops("jaccard")) {
      val (t, _) =
        time(Dedup.jaccardJoin(docs, "doc_id", "text", threshold = 0.7).count())
      results += "jaccard_join" -> t
      println(f"""{"op":"jaccard_join","sec":$t%.3f,"docs":$n}""")
    }
    if (ops("incr")) {
      // incremental cross-corpus dedup: corpus = 90% of docs (signature
      // index built OUTSIDE the timed window — it is the persisted
      // artifact), batch = 10%. The timed work should scale with
      // batch + index-scan size, NOT corpus text size.
      import org.apache.spark.sql.functions.col
      val idx = Dedup.buildSigIndex(docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text",
        java.nio.file.Files.createTempDirectory("graft-scale-idx").toString + "/t")
      val (t, pairs) = time(Dedup.nearDupPairsAgainst(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
        idx, docs.filter(col("doc_id") % 10 =!= 0), threshold = 0.7).count())
      results += "incr_dedup" -> t
      println(f"""{"op":"incr_dedup","sec":$t%.3f,"pairs":$pairs,"docs":$n}""")
    }
    if (ops("knn")) {
      // batch-query ANN over synthetic embeddings derived from doc hashes
      // (documents parquet has no vectors; this keeps the stress
      // self-contained): 1%% of rows become queries
      import org.apache.spark.sql.functions._
      val dim = 16
      val vecs = docs.select(col("doc_id"),
        array((0 until dim).map(i =>
          (pmod(xxhash64(col("doc_id"), lit(i)), lit(2000)).cast("double") / 1000.0) - 1.0): _*)
          .as("v"))
      val qs = vecs.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("qid"), col("v"))
      val (t, rows) = time(graft.pipeline.VectorOps.knnJoin(
        qs, "qid", "v", vecs, "doc_id", "v", 10,
        numTables = 4, planesPerTable = 12, dim = dim).count())
      results += "knn_join" -> t
      println(f"""{"op":"knn_join","sec":$t%.3f,"rows":$rows,"docs":$n}""")
    }
    // total bytes materialized by BroadcastExchange nodes of an executed
    // plan (descending through AQE query stages) — the exchange-volume
    // evidence for probe-frame shape claims
    def broadcastBytes(df: org.apache.spark.sql.DataFrame): Long = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
      def walk(p: SparkPlan): Long = {
        val self = p match {
          case b: BroadcastExchangeExec =>
            b.metrics.get("dataSize").map(_.value).getOrElse(0L)
          case _ => 0L
        }
        val sub = p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec => walk(q.plan)
          case _ => 0L
        }
        self + sub + p.children.map(walk).sum
      }
      walk(df.queryExecution.executedPlan)
    }
    if (ops("knnivf")) {
      // the same batch-query retrieval against a PERSISTED IVF index
      // (q119/q121 shape). The index build is outside the timed window —
      // it is the persisted artifact; the timed join should scale with
      // |queries| × probed-cell data, i.e. nProbe/C of the corpus, so
      // doubling C at 4× corpus holds per-query cost ~flat.
      import org.apache.spark.sql.functions._
      val dim = sys.env.getOrElse("SPARK_GRAFT_DIM", "16").toInt
      val vecs = docs.select(col("doc_id"),
        array((0 until dim).map(i =>
          (pmod(xxhash64(col("doc_id"), lit(i)), lit(2000)).cast("double") / 1000.0) - 1.0): _*)
          .as("v"))
      val c = math.max(16, math.sqrt(n.toDouble).toInt / 4)
      val (buildT, idx) = time(
        graft.pipeline.VectorOps.buildIvfIndex(vecs, "doc_id", "v",
          java.nio.file.Files.createTempDirectory("graft-scale-ivf").toString + "/t",
          numCentroids = c))
      val qs = vecs.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("qid"), col("v"))
      val joined = graft.pipeline.VectorOps.knnJoinIvf(qs, "qid", "v", idx, 10)
      // drive THIS QueryExecution (count() would plan a separate one and
      // leave joined's metrics — the broadcast sizes — at zero)
      val (t, rows) = time(joined.queryExecution.toRdd.count())
      results += "knn_join_ivf" -> t
      val bb = broadcastBytes(joined)
      println(f"""{"op":"knn_join_ivf","sec":$t%.3f,"build_sec":$buildT%.3f,"rows":$rows,"centroids":$c,"docs":$n,"dim":$dim,"broadcast_bytes":$bb}""")
    }
    // the FULL text+embedding ingest batch (StreamingDedup + EmbedStage,
    // the q123 pipeline): corpus = 90% of docs with synthetic embeddings,
    // batch = 10%. Corpus + both persisted indexes build OUTSIDE the
    // timed window — the timed work is the per-batch path, which should
    // scale with batch size + index-scan size, NOT corpus text size.
    // `semantic` = tracked mode (per-stage attribution via the count
    // barriers); `semantic_prod` = production mode (trackCounts=false,
    // pipeline fused into the commits) on its OWN fresh corpus/indexes.
    def semanticRun(label: String, trackCounts: Boolean): Unit = {
      import org.apache.spark.sql.functions._
      val dim = 16
      val embDocs = docs.select(col("doc_id"), col("text"),
        array((0 until dim).map(i =>
          (pmod(xxhash64(col("doc_id"), lit(i)), lit(2000)).cast("double") / 1000.0) - 1.0): _*)
          .as("v"))
      val corpusDf = embDocs.filter(col("doc_id") % 10 =!= 0)
      val base = java.nio.file.Files.createTempDirectory("graft-scale-sem").toString
      val corpus = graft.table.GraftTable.create(spark, s"$base/corpus",
        corpusDf.select("doc_id", "text").schema)
      corpus.append(corpusDf.select("doc_id", "text"))
      val sig = Dedup.buildSigIndex(corpusDf, "doc_id", "text", s"$base/sig")
      val c = math.max(16, math.sqrt(n.toDouble).toInt / 4)
      val ivf = graft.pipeline.VectorOps.buildIvfIndex(
        corpusDf.select("doc_id", "v"), "doc_id", "v", s"$base/ivf",
        numCentroids = c)
      val (t, res) = time(graft.streaming.StreamingDedup.processBatch(
        embDocs.filter(col("doc_id") % 10 === 0), 0L, "doc_id", "text",
        corpus, sig,
        embed = Some(graft.streaming.StreamingDedup.EmbedStage("v", ivf,
          threshold = 0.995)),
        trackCounts = trackCounts))
      results += label -> t
      val stages = res.stageSecs.map { case (k, v) => f""""$k":$v%.3f""" }.mkString(",")
      println(f"""{"op":"$label","sec":$t%.3f,"admitted":${res.admitted},"input":${res.input},"centroids":$c,"docs":$n,"stages":{$stages}}""")
    }
    if (ops("dhash")) {
      // perceptual image dedup at corpus scale: one block-pattern PNG per
      // doc (distinct seeds) plus a HALF-SIZE re-render of every 10th
      // pattern (byte-distinct, hash-equal twins). Rendering is fixture
      // work and sits OUTSIDE the timed window; the timed op is
      // dHashPairs end-to-end: decode + 8-byte sketch + blocked Hamming
      // join — the cost shape that must stay O(items) at 100 TB.
      import org.apache.spark.sql.functions._
      val base = docs.select(col("doc_id"),
        lit(90).as("w"), lit(80).as("h"), col("doc_id").cast("long").as("seed"))
      val twins = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000000L).as("doc_id"),
          lit(45).as("w"), lit(40).as("h"), col("doc_id").cast("long").as("seed"))
      val imgs = graft.pipeline.Multimodal.renderBlockPngs(
        base.unionByName(twins), "w", "h", "seed")
        .select("doc_id", "content").persist()
      val nImgs = imgs.count()
      val (t, pairs) = time(graft.pipeline.Multimodal.dHashPairs(
        imgs, "doc_id", "content").count())
      imgs.unpersist()
      results += "dhash_pairs" -> t
      println(f"""{"op":"dhash_pairs","sec":$t%.3f,"pairs":$pairs,"imgs":$nImgs}""")
    }
    if (ops("semantic")) semanticRun("semantic_ingest", trackCounts = true)
    if (ops("semantic_prod"))
      semanticRun("semantic_ingest_prod", trackCounts = false)
    if (ops("clusters")) {
      val pairDf = Dedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.7)
      val (t, clusters) = time(Dedup.dupClusters(pairDf).count())
      results += "dup_clusters" -> t
      println(f"""{"op":"dup_clusters","sec":$t%.3f,"clustered_ids":$clusters,"docs":$n}""")
    }
    if (ops("spandedup")) {
      // span-level exact substring dedup: the window/covered frames are
      // slim long-rows (O(tokens) of them); wall should track corpus
      // token count ~linearly. removed_sum is the invariant to eyeball
      // across scales: under MakeScaledDocs replication every replica of
      // a doc loses its spans to the 1x canonical, so removed ~ (mult-1)/
      // mult of duplicated-span tokens.
      import org.apache.spark.sql.functions.{col, sum}
      val (t, removed) = time(
        graft.pipeline.TextOps.removeRepeatedSpans(docs, "doc_id", "text", n = 8)
          .agg(sum(col("removed_tokens"))).collect()(0).getLong(0))
      results += "span_dedup" -> t
      println(f"""{"op":"span_dedup","sec":$t%.3f,"removed_tokens":$removed,"docs":$n}""")
    }
    if (ops("incrspan")) {
      // incremental span dedup: corpus = 90% of docs (window-hash index
      // built OUTSIDE the timed window — it is the persisted artifact),
      // batch = 10%. Timed work = batch windowing + the h semi-join +
      // covered-position rebuild; should scale with batch + index size.
      import org.apache.spark.sql.functions.{col, sum}
      val idx = graft.pipeline.TextOps.buildSpanIndex(
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
        java.nio.file.Files.createTempDirectory("graft-scale-spanidx").toString + "/t",
        n = 8)
      val (t, removed) = time(
        graft.pipeline.TextOps.removeCorpusSpans(
            docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", idx)
          .agg(sum(col("removed_tokens"))).collect()(0).getLong(0))
      results += "incr_span_dedup" -> t
      println(f"""{"op":"incr_span_dedup","sec":$t%.3f,"removed_tokens":$removed,"docs":$n}""")
    }
    if (ops("packshuffle")) {
      // the two prefix-sum riders: per-doc packing placement and the
      // seeded epoch shuffle. Each is one slim range shuffle + a bounded
      // (<= shuffle-partition-count) driver collect; wall should be
      // ~linear in rows with a small constant.
      val (tp, seqs) = time(
        graft.pipeline.TextOps.packSequences(docs, "doc_id", "text", seqLen = 2048)
          .agg(org.apache.spark.sql.functions.max("last_seq")).collect()(0).getLong(0) + 1)
      results += "seq_packing" -> tp
      println(f"""{"op":"seq_packing","sec":$tp%.3f,"sequences":$seqs,"docs":$n}""")
      val (ts, maxPos) = time(
        graft.pipeline.TextOps.deterministicShuffle(docs.select("doc_id"), "doc_id", 7L)
          .agg(org.apache.spark.sql.functions.max("shuffle_pos")).collect()(0).getLong(0))
      results += "det_shuffle" -> ts
      println(f"""{"op":"det_shuffle","sec":$ts%.3f,"max_pos":$maxPos,"docs":$n}""")
      val (ta, nSeqs) = time(
        graft.pipeline.TextOps.packedSequenceTexts(docs, "doc_id", "text", seqLen = 2048)
          .count())
      results += "packed_texts" -> ta
      println(f"""{"op":"packed_texts","sec":$ta%.3f,"sequences":$nSeqs,"docs":$n}""")
    }
    if (ops("dsir")) {
      // DSIR selection at corpus scale: weights = two O(tokens)
      // map-side-combined bucket counts + one broadcast ratio join back
      // onto the raw feature stream; sample at small k = TakeOrdered, at
      // production k (> driverTopKMax) = distributed prefix-sum rank +
      // filter. Wall should be ~linear in tokens; the target (10% slice)
      // rides the same corpus. `dsir_select_halfk` is the production-k
      // probe (k = docs/2, forced onto the distributed path): its wall
      // must NOT grow with k the way a driver-merged TakeOrdered does.
      import org.apache.spark.sql.functions.col
      val target = docs.filter(col("doc_id") % 10 === 0)
      val scored = graft.pipeline.TextOps.dsirWeights(docs, "doc_id", "text",
        target, "text").persist()
      val (t, kept) = time(
        graft.pipeline.TextOps.dsirSample(scored,
          "doc_id", "dsir_score", k = math.max(1, (n / 100).toInt),
          seed = 7L).count())
      results += "dsir_select" -> t
      println(f"""{"op":"dsir_select","sec":$t%.3f,"kept":$kept,"docs":$n}""")
      val halfK = math.max(1, (n / 2).toInt)
      val (th, keptH) = time(
        graft.pipeline.TextOps.dsirSample(scored,
          "doc_id", "dsir_score", k = halfK, seed = 7L,
          driverTopKMax = 0).count())
      scored.unpersist()
      results += "dsir_select_halfk" -> th
      println(f"""{"op":"dsir_select_halfk","sec":$th%.3f,"kept":$keptH,"k":$halfK,"docs":$n}""")
    }
    if (ops("wordpiece")) {
      // realistic-vocab WordPiece (q148's op at BERT scale): ~30k pieces
      // (SPARK_GRAFT_VOCAB to override) shipped as ONE literal map datum.
      // Measures the three claims the toy-vocab oracle can't: plan BUILD
      // wall with the big datum, serialized-plan footprint (must be
      // ~vocab-sized and CONSTANT in corpus size — no per-row inlining),
      // and the per-row O(chars·maxPieceLen) probe walk at corpus scale.
      import org.apache.spark.sql.functions._
      val vsize = sys.env.getOrElse("SPARK_GRAFT_VOCAB", "30000").toInt
      val vocab = graft.pipeline.TextOps.syntheticVocab(vsize)
      // spread: a small parquet is one split; the walk is per-row CPU and
      // must use every core (at 100 TB the splits provide the parallelism)
      val counted = graft.pipeline.PipelineUtil.spread(docs)
        .select(col("doc_id"),
        graft.pipeline.TextOps.wordpieceCount(lower(col("text")), vocab)
          .cast("long").as("n"))
      val (planT, planChars) = time(
        counted.queryExecution.executedPlan.toString.length)
      val (t, toks) = time(
        counted.agg(sum("n")).collect()(0).getLong(0))
      results += "wordpiece_30k" -> t
      println(f"""{"op":"wordpiece_30k","sec":$t%.3f,"plan_build_sec":$planT%.3f,"plan_chars":$planChars,"vocab":${vocab.size},"tokens":$toks,"docs":$n}""")
    }
    if (ops("bpe")) {
      // merges-list BPE (q149's op) at corpus scale: the committed
      // fixture merges through bpeCount — per-word O(len²) fuse walk,
      // merges table shipped once (native BpeTokens expression)
      import org.apache.spark.sql.functions._
      val counted = graft.pipeline.PipelineUtil.spread(docs)
        .select(col("doc_id"),
          graft.pipeline.TextOps.bpeCount(lower(col("text")),
            graft.SparkEntry.BpeMerges).cast("long").as("n"))
      val (planT, planChars) = time(
        counted.queryExecution.executedPlan.toString.length)
      val (t, toks) = time(counted.agg(sum("n")).collect()(0).getLong(0))
      results += "bpe_tokens" -> t
      println(f"""{"op":"bpe_tokens","sec":$t%.3f,"plan_build_sec":$planT%.3f,"plan_chars":$planChars,"merges":${graft.SparkEntry.BpeMerges.size},"tokens":$toks,"docs":$n}""")
    }
    if (ops("prefixsum_rows")) {
      // the prefix-sum primitive alone at row scale (no text): a seeded
      // shuffle over SPARK_GRAFT_ROWS synthetic ids — the probe that the
      // range shuffle + bounded offset collect holds past document-corpus
      // sizes (50M rows ~ a 1000-executor epoch-manifest per task group)
      val rows = sys.env.getOrElse("SPARK_GRAFT_ROWS", "50000000").toLong
      val ids = spark.range(rows).withColumnRenamed("id", "doc_id")
      val (t, maxPos) = time(
        graft.pipeline.TextOps.deterministicShuffle(ids, "doc_id", 7L)
          .agg(org.apache.spark.sql.functions.max("shuffle_pos")).collect()(0).getLong(0))
      results += "prefixsum_rows" -> t
      println(f"""{"op":"prefixsum_rows","sec":$t%.3f,"rows":$rows,"max_pos":$maxPos}""")
    }
    val kv = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString(",")
    println(s"""{"metric":"scale_stress","docs":$n,$kv,"path":"$docsPath"}""")
    spark.stop()
  }
}
