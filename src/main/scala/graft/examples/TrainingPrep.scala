package graft.examples

import graft.pipeline.{Dedup, TextOps}
import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data preparation pipeline — the composition demo of
  * the library's curation surface on one corpus, each stage a documented
  * op with its own oracle/spec elsewhere:
  *
  *   raw docs → exact dedup → near-dup keep-best → span-level substring
  *   dedup → quality/language filter + PII scrub → benchmark
  *   decontamination → DSIR importance selection → token-budget mixing →
  *   deterministic epoch shuffle → packed training sequences → graft table
  *
  * {{{ sbt "runMain graft.examples.TrainingPrep [sfDir]" }}}
  */
object TrainingPrep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .config("spark.hadoop." + graft.spark.NioLocalFileSystem.ConfKey,
        graft.spark.NioLocalFileSystem.ConfValue)
      .master("local[8]")
      .appName("graft-training-prep")
      .config("spark.sql.extensions", "graft.spark.v2.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft-prep").toString

    def tokens(df: DataFrame): Long =
      df.agg(coalesce(sum(TextOps.tokenCount(col("text"))), lit(0L)))
        .collect()(0).getLong(0)
    def stat(name: String, df: DataFrame): DataFrame = {
      println(f"[prep] $name%-18s docs=${df.count()}%-6d tokens=${tokens(df)}")
      df
    }

    val raw = stat("raw",
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text", "lang"))

    // 1. exact dedup: one survivor per byte-identical text
    val exact = stat("exact_dedup", raw.join(
      TextOps.exactDedup(raw, "doc_id", "text")
        .select(col("keep_id").as("doc_id")), Seq("doc_id")))

    // 2. near-dup: keep the highest-quality copy of every LSH cluster
    val pairs = Dedup.nearDupPairs(exact, "doc_id", "text", threshold = 0.7)
    val best = stat("neardup_best", Dedup.keepBestPerCluster(
      exact.withColumn("q", TextOps.qualityScore(col("text"))),
      "doc_id", col("q"), pairs).drop("q"))

    // 3. span-level substring dedup (Lee et al.): duplicated 8-token
    // spans cut from all but their canonical occurrence
    val spanned = stat("span_dedup",
      TextOps.removeRepeatedSpans(best, "doc_id", "text", n = 8)
        .join(best.select("doc_id", "lang"), Seq("doc_id"))
        .filter(TextOps.tokenCount(col("text")) >= 8)) // drop shredded docs

    // 4. quality floor + PII scrub
    val clean = stat("quality_pii", spanned
      .filter(TextOps.qualityScore(col("text")) >= lit(0.3))
      .withColumn("text", TextOps.redactPii(col("text"))))

    // 5. decontamination: drop docs sharing 8-gram shingles with the
    // held-out benchmark split (here: every 97th doc plays the benchmark)
    val bench = raw.filter(col("doc_id") % 97 === 0).select("text")
    val contaminated = TextOps.contaminatedDocs(
      clean, "doc_id", "text", bench, "text", n = 8)
    val decon = stat("decontaminated",
      clean.join(contaminated.select("doc_id"), Seq("doc_id"), "left_anti"))

    // 6. DSIR data selection: weight every doc by how target-like its
    // hashed n-gram distribution is (target here: the highest-quality
    // decile as a stand-in for a curated reference set), keep the
    // Gumbel top-80% — importance resampling before mixing
    val deconN = decon.count() // decon is a lazy frame over every prior stage
    // doc_id tiebreak: qualityScore has few distinct values, so the decile
    // cut lands inside a tie class — without it the target set (and every
    // downstream artifact) would vary with shuffle arrival order
    val scored = TextOps.dsirWeights(decon, "doc_id", "text",
      decon.orderBy(TextOps.qualityScore(col("text")).desc, col("doc_id"))
        .limit((deconN / 10).toInt.max(1)), "text",
      numBuckets = 1024)
    val selected = stat("dsir_selected", TextOps.dsirSample(
        scored, "doc_id", "dsir_score",
        k = (deconN * 8 / 10).toInt.max(1), seed = 11L)
      .select("doc_id").join(decon, Seq("doc_id")))

    // 7. data mixing: per-language token budgets (met, never undershot)
    val mixed = stat("token_budgets", TextOps.tokenBudgetSample(
        selected, "doc_id", "lang", "text",
        budgets = Map("en" -> 4000L, "de" -> 2000L), defaultBudget = 1000L)
      .select("doc_id").join(selected, Seq("doc_id")))

    // 8. deterministic epoch shuffle → packed fixed-length sequences
    val shuffled = TextOps.deterministicShuffle(mixed, "doc_id", seed = 7L)
      .withColumn("doc_id", col("shuffle_pos")).drop("shuffle_pos")
    val packed = TextOps.packedSequenceTexts(
      shuffled, "doc_id", "text", seqLen = 256)

    // 8b. TRUE-token placement: the same packing budgeted by the
    // IN-ENGINE WordPiece tokenizer (greedy longest-match over the
    // committed literal vocab, q148) — sequence budgets in actual
    // subword tokens instead of whitespace words
    val placed = TextOps.packSequences(shuffled, "doc_id",
      TextOps.wordpieceCount(col("text"), graft.SparkEntry.WordpieceVocab),
      seqLen = 256, sepTokens = 1)
    // one combined agg = one job over the packed frame; coalesce covers
    // an empty corpus (max/sum are NULL then)
    val wpRow = placed.agg(
      coalesce(max("last_seq"), lit(-1L)).as("m"),
      coalesce(sum("n_tokens"), lit(0L)).as("s")).collect()(0)
    println(s"[prep] wordpiece_pack    sequences=${wpRow.getLong(0) + 1} " +
      s"(subword tokens=${wpRow.getLong(1)})")

    // 8c. GPT-style budgeting: the same packing with the merges-list BPE
    // tokenizer (lowest-rank pair fusion over the committed merges, q149)
    val bpePlaced = TextOps.packSequences(shuffled, "doc_id",
      TextOps.bpeCount(col("text"), graft.SparkEntry.BpeMerges),
      seqLen = 256, sepTokens = 1)
    val bpeRow = bpePlaced.agg(
      coalesce(max("last_seq"), lit(-1L)).as("m"),
      coalesce(sum("n_tokens"), lit(0L)).as("s")).collect()(0)
    println(s"[prep] bpe_pack          sequences=${bpeRow.getLong(0) + 1} " +
      s"(bpe tokens=${bpeRow.getLong(1)})")

    // 9. the training corpus lands as a graft table
    val out = GraftTable.create(spark, s"$base/packed", packed.schema)
    out.append(packed)
    val full = out.toDF.filter(col("n_tokens") === 256).count()
    println(s"[prep] packed_table     sequences=${out.toDF.count()} " +
      s"(full=$full) at ${out.location}")
    spark.stop()
  }
}
