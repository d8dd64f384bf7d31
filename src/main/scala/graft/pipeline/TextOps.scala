package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, fingerprinting, exact dedup.
  *
  * Everything is composed from built-in codegen'd functions — no UDFs — so
  * the operators stay inside whole-stage codegen and scale linearly with
  * input splits (no shuffle except where groupBy is the semantics, e.g.
  * dedup).
  */
object TextOps {

  /** Number of whitespace-separated tokens. */
  def wordCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish token count: word pieces or single non-space symbols. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Occurrences of a literal marker (no regex), vectorized. */
  def occurrences(text: Column, marker: String): Column =
    ((length(text) - length(replace(text, lit(marker), lit("")))) / marker.length)
      .cast("long")

  /** Ratio of alphanumeric chars to all chars (0 for empty). */
  def alphaRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^A-Za-z0-9]", "")).cast("double") / length(text))

  /** Ratio of terminal-punctuation chars. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^.,!?;:]", "")).cast("double") / length(text))

  /** Mean word length over whitespace tokens. */
  def meanWordLength(text: Column): Column =
    when(wordCount(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, "\\s+", "")).cast("double") / wordCount(text))

  /** Stopword-hit ratio against a fixed marker list (quality signal). */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val hits = stopwords.map(w => occurrences(padded, s" $w "))
      .reduce(_ + _)
    when(wordCount(text) === 0, 0.0)
      .otherwise(hits.cast("double") / wordCount(text))
  }

  val EnglishStopwords: Seq[String] =
    Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for")

  /** Composite quality score in [0,1]: length, word shape, stopword and
    * symbol balance — the usual cheap pre-filter before expensive dedup
    * (heuristics in the spirit of C4/Gopher rules, public recipes).
    */
  def qualityScore(text: Column): Column = {
    val lenOk = when(length(text).between(50, 10000), 1.0).otherwise(0.0)
    val mwl = meanWordLength(text)
    val wordOk = when(mwl.between(3.0, 12.0), 1.0).otherwise(0.0)
    val alphaOk = when(alphaRatio(text) >= 0.6, 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatio(text) >= 0.05, 1.0).otherwise(0.0)
    (lenOk + wordOk + alphaOk + stopOk) / 4.0
  }

  /** Language-ID markers per language: distinctive high-frequency words. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "und", "die"),
    "es" -> Seq("el", "que", "los"),
    "fr" -> Seq("le", "les", "des"))

  /** Heuristic language ID: CJK chars → zh, else the language whose marker
    * words hit most (ties resolve in [[LangMarkers]] order; "und" =
    * undetermined when nothing hits).
    */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val scores = LangMarkers.map { case (lang, ws) =>
      lang -> ws.map(w => occurrences(padded, s" $w ")).reduce(_ + _)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh")).otherwise(pick)
  }

  /** Canonical text fingerprint: md5 of lowercased alphanumeric content —
    * catches whitespace/punctuation-only variants.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]+", ""))

  /** Exact-duplicate groups by content hash: one row per distinct content,
    * keeping the smallest id (deterministic canonical representative).
    */
  /** Deterministic split bucket in [0, nBuckets) from md5 of the id — the
    * reproducible train/eval/test partitioner of a data pipeline: stable
    * across runs, engines, and row order (md5 is bit-identical everywhere,
    * unlike engine-specific hash functions), so the same document lands in
    * the same split forever. Pure projection — no shuffle.
    */
  def splitBucket(id: Column, nBuckets: Int): Column =
    (conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % nBuckets).cast("int")

  /** Benchmark decontamination: corpus documents sharing at least
    * `minHits` distinct word n-grams with ANY benchmark document — the
    * standard eval-contamination filter of a training-data pipeline
    * (n-gram-overlap decontamination as in the GPT-3 appendix /
    * open-data-pipeline practice: a training doc containing a test-set
    * n-gram leaks the benchmark).
    *
    * Scale shape: the benchmark n-gram set is tiny and DISTINCT (one
    * explode + distinct; AQE broadcast-joins it), the corpus explodes its
    * n-grams once and inner-joins on the gram — gram-local, never
    * all-pairs — and hits aggregate with map-side combine per doc. At
    * 100 TB the cost is one pass over the corpus text.
    */
  def contaminatedDocs(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8,
      minHits: Int = 1): DataFrame = {
    val benchGrams = bench
      .select(explode(Dedup.shingles(col(benchTextCol), n)).as("gram"))
      .distinct()
    corpus
      .select(col(idCol).as("doc_id"),
        explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .join(benchGrams, "gram")
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("hits"))
      .filter(col("hits") >= minHits)
  }

  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Near-dup groups under the normalized fingerprint. */
  def fingerprintDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Repeated token-window detection — the tractable core of EXACT-substring
    * dedup (Lee et al., "Deduplicating Training Data Makes Language Models
    * Better": repeated ≥n-token substrings are memorization hot-spots that
    * MinHash-style whole-doc dedup misses). Every length-`n` token window is
    * keyed; windows whose key repeats (within OR across documents) come back
    * as (doc_id, start_token, occurrences) spans a pipeline can mask or cut.
    *
    * Scale shape: windows explode to one row per token position (the
    * unavoidable cost of substring-level analysis), then ONE groupBy on the
    * window key counts occurrences and a key-local join maps survivors back
    * to positions — no all-pairs comparison anywhere. At 100 TB, key by
    * `xxhash64(window)` instead of the text to shrink the shuffle 10×
    * (identical answers up to 64-bit collisions); the text key keeps this
    * oracle-checkable bit-for-bit.
    */
  /** Corpus token frequencies — the vocabulary-building primitive (explode
    * normalized tokens, one count aggregation; map-side partial combine
    * keeps the shuffle at distinct-token scale). `minCount` drops the long
    * tail at the source.
    */
  def tokenFrequencies(df: DataFrame, textCol: String,
      minCount: Long = 2L): DataFrame =
    df.select(explode(split(trim(regexp_replace(lower(col(textCol)),
        "[^a-z0-9]+", " ")), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)

  /** PII patterns a training-data pipeline scrubs before release. Regex
    * dialect kept to the portable core (character classes + quantifiers) so
    * an external SQL engine reproduces the scrub bit-for-bit.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\+?[0-9]{1,3}[-. ]?\\(?[0-9]{3}\\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}", "<PHONE>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"))

  /** Text with every PII pattern replaced by its placeholder (applied in
    * [[PiiPatterns]] order — email first so phone-like digit runs inside
    * addresses are already gone). Pure codegen projection.
    */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (_, re, tag)) =>
      regexp_replace(acc, re, tag)
    }

  /** Per-pattern match counts (the audit metric next to the scrub). */
  def piiCounts(text: Column): Seq[(String, Column)] =
    PiiPatterns.map { case (name, re, _) =>
      name -> size(regexp_extract_all(text, lit(re), lit(0)))
    }

  def repeatedWindows(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minOccurrences: Int = 2): DataFrame = {
    val src = PipelineUtil.spread(df.select(col(idCol).as("doc_id"), col(textCol).as("text")))
    val toks = split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " ")
    val starts = when(size(col("__t")) >= n, sequence(lit(0), size(col("__t")) - n))
      .otherwise(array().cast("array<int>"))
    val wins = src.select(col("doc_id"), toks.as("__t"))
      .select(col("doc_id"),
        posexplode(transform(starts, i => concat_ws(" ", slice(col("__t"), i + 1, lit(n))))))
      .toDF("doc_id", "start", "win")
    val counted = wins.groupBy("win").agg(count(lit(1)).as("occurrences"))
      .filter(col("occurrences") >= minOccurrences)
    wins.join(counted, "win")
      .select(col("doc_id"), col("start"), col("occurrences"))
  }
}
