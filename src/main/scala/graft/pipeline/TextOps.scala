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

  /** Vocabulary-driven WordPiece tokenization as a pure codegen'd
    * expression — greedy longest-match against a LITERAL vocab, the
    * standard subword scheme (public: Wu et al. 2016; BERT's tokenizer):
    * each whitespace word is consumed left-to-right, at every position
    * taking the LONGEST vocab piece that matches (continuation pieces
    * are prefixed "##"); a word with an unmatchable position becomes one
    * `unk` token. Returns `array<string>` of pieces.
    *
    * Engine shape: one native [[graft.functions.WordpieceTokens]]
    * expression — the vocab ships ONCE with the plan (metadata-sized;
    * per-JVM hash sets, O(1) probes), the walk is two tight JIT'd loops,
    * plan size is CONSTANT in text length, no UDF, no shuffle. Cost per
    * word is O(chars · maxPieceLen) hash probes. History, preserved as a
    * scale lesson: this began as composed `aggregate`/`sequence` folds
    * probing `element_at` on a map LITERAL — correct, and green on the
    * toy q148 vocab, but Catalyst's GetMapValue linear-scans the keys, so
    * a 30k-piece BERT-scale vocab turned every probe into 30k string
    * compares (~10⁵× slow-down, found by the ScaleStress `wordpiece`
    * probe); hashed-lookup folds fixed the scan but still paid
    * interpreted higher-order-function dispatch per step (~3 ms/doc).
    * NULL text tokenizes as empty (count 0), matching the q148 oracle's
    * LEFT-JOIN 0/'' rows.
    *
    * This makes token budgets REAL: [[packSequences]] /
    * [[tokenBudgetSample]] accept any count Column, and
    * `size(wordpieceTokens(...))` ([[wordpieceCount]]) budgets in actual
    * subword tokens instead of the whitespace/regex approximations.
    */
  def wordpieceTokens(text: Column, vocab: Seq[String],
      unk: String = "[UNK]"): Column = {
    require(vocab.nonEmpty, "wordpieceTokens: empty vocab")
    require(vocab.forall(p => p != "" && p != "##"),
      s"wordpieceTokens: empty piece in vocab")
    require(vocab.distinct.size == vocab.size,
      "wordpieceTokens: duplicate pieces in vocab")
    org.apache.spark.sql.graft.SparkShims.column(
      graft.functions.WordpieceTokens(
        org.apache.spark.sql.graft.SparkShims.expr(text), vocab, unk))
  }

  /** Number of [[wordpieceTokens]] subword tokens — the real-token count
    * Column for [[packSequences]]/[[tokenBudgetSample]] budgets.
    */
  def wordpieceCount(text: Column, vocab: Seq[String],
      unk: String = "[UNK]"): Column =
    size(wordpieceTokens(text, vocab, unk))

  /** Deterministic synthetic WordPiece vocab of `n` pieces — the
    * benchmark/scale-probe fixture for [[wordpieceTokens]] at REALISTIC
    * vocab size (BERT-base ships ~30k pieces). All 1-, 2-, 3-char
    * lowercase+digit strings in lexicographic order plus a 9-char tail
    * (tripled 3-char combos, so maxPieceLen is realistic, not 3), each in
    * both initial and continuation form, truncated to `n`. Measures the
    * shape that matters — piece count, max piece length, literal
    * map-datum size — without shipping a real vocab file.
    */
  def syntheticVocab(n: Int): Seq[String] = {
    require(n >= 80 && n % 2 == 0, s"syntheticVocab: need even n >= 80: $n")
    val alpha = ('a' to 'z').map(_.toString) ++ ('0' to '9').map(_.toString)
    val short = alpha ++
      (for (a <- alpha; b <- alpha) yield a + b) ++
      (for (a <- alpha; b <- alpha; c <- alpha) yield a + b + c)
    val long = (for (a <- alpha; b <- alpha; c <- alpha)
      yield (a + b + c) * 3).take(n / 20)
    val base = (short.take(n / 2 - long.size) ++ long).distinct
    base ++ base.map("##" + _)
  }

  /** Merges-list BPE tokenization as a pure codegen'd expression — the
    * GPT-style tokenizer family (public: Sennrich et al. 2016; the GPT-2
    * encoder): each pre-token (regex word: alnum run or single symbol,
    * the [[tokenCount]] pre-tokenizer) starts as its characters, then
    * merge rules apply in PRIORITY ORDER — repeatedly take the
    * present adjacent pair with the lowest merge rank and fuse all its
    * occurrences left-to-right before re-ranking, until no listed pair
    * remains. Character-level base alphabet (for ASCII corpora identical
    * to byte-level GPT-2 after its byte↔unicode mapping; a byte encoder
    * would bolt on at the `words` stage). NULL text tokenizes as empty.
    *
    * Engine shape mirrors [[wordpieceTokens]]: one native
    * [[graft.functions.BpeTokens]] expression — the merges table ships
    * ONCE with the plan (pair key → rank; fine to GPT-scale ~50k entries
    * — metadata-sized, O(1) hashed probes per adjacent pair), and the
    * walk is a tight JIT'd loop: per step one O(len) scan finds the
    * leftmost occurrence of the PINNED current pair (so all occurrences
    * of a chosen pair fuse before a newly-formed lower-rank pair can
    * preempt — the GPT-2 pass order), re-ranking only when the pin is
    * exhausted. ≤ len−1 merge steps per word ⇒ O(len²) per word,
    * constant plan size in text and merges.
    *
    * Like [[wordpieceCount]], `size(bpeTokens(...))` ([[bpeCount]])
    * makes [[packSequences]]/[[tokenBudgetSample]] budgets real
    * GPT-style token counts.
    */
  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column = {
    require(merges.nonEmpty, "bpeTokens: empty merges list")
    val Sep = "\u0001"
    merges.foreach { case (a, b) =>
      require(a.nonEmpty && b.nonEmpty, s"bpeTokens: empty merge side ('$a','$b')")
      require(!(a + b).exists(_.isWhitespace) && !(a + b).contains(Sep),
        s"bpeTokens: merge tokens must be non-whitespace: ('$a','$b')")
    }
    require(merges.distinct.size == merges.size,
      "bpeTokens: duplicate merge pairs")
    org.apache.spark.sql.graft.SparkShims.column(
      graft.functions.BpeTokens(
        org.apache.spark.sql.graft.SparkShims.expr(text), merges))
  }

  /** Number of [[bpeTokens]] subword tokens — the GPT-style token-count
    * Column for [[packSequences]]/[[tokenBudgetSample]] budgets.
    */
  def bpeCount(text: Column, merges: Seq[(String, String)]): Column =
    size(bpeTokens(text, merges))

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

  /** Deterministic per-stratum sampling — the DATA-MIXING primitive of a
    * training pipeline: each stratum (source, language, quality tier, …)
    * keeps the given fraction of its documents, selected by an
    * engine-independent md5 threshold on the id, so the mix is
    * reproducible forever (same doc in or out across runs, engines, and
    * row order — the sampling analog of [[splitBucket]]) and REFRESHABLE:
    * raising a stratum's rate only ADDS documents, never swaps the ones
    * already trained on. Strata missing from `rates` keep `defaultRate`.
    * Pure codegen projection + filter — no shuffle, no RNG.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    (rates.values ++ Seq(defaultRate)).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rates must be in [0,1]: $r"))
    // md5-derived uniform in [0, 1): 8 hex chars = 32 bits
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") / 4294967296.0
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(strataCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(u < rate)
  }

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

  /** Line-level dedup (boilerplate removal) — the CCNet/RefinedWeb recipe:
    * a line whose normalized form appears in at least `minDocs` DISTINCT
    * documents is boilerplate (site headers, cookie banners, copyright
    * footers) and is cut from every document; the remaining lines are
    * reassembled in their original order. Whole-doc dedup cannot see
    * these — the surrounding text differs per page.
    *
    * Scale shape: one explode (linear in corpus lines), ONE hash aggregate
    * at distinct-line scale with map-side combine, then an anti-join keyed
    * on the line — line-local shuffle, never all-pairs — and a per-doc
    * re-aggregation. The common-lines side is output-filtered tiny
    * (only lines crossing the threshold), so AQE broadcasts it. At 100 TB,
    * key the aggregate and join on `xxhash64(line)` instead of the text to
    * shrink the shuffle ~10× (identical up to 64-bit collisions); the text
    * key keeps this oracle-checkable bit-for-bit.
    */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      minDocs: Long = 2L): DataFrame = {
    val lines = df.select(col(idCol).as("__id"),
      posexplode(split(col(textCol), "\n"))).toDF("__id", "pos", "line")
    def norm = lower(trim(col("line")))
    val common = lines.filter(length(norm) > 0)
      .groupBy(norm.as("nline"))
      .agg(countDistinct(col("__id")).as("ndocs"))
      .filter(col("ndocs") >= minDocs)
      .select("nline")
    val rebuilt = lines.join(common, norm === col("nline"), "left_anti")
      .groupBy(col("__id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x("line")), "\n").as("text_dedup"))
    df.select(col(idCol)).join(rebuilt, col(idCol) === col("__id"), "left")
      .select(col(idCol), coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }

  /** BM25 relevance of every document against a bag-of-words query — the
    * classic sparse ranking function (Robertson & Spärck Jones; the BM25
    * variant with idf = ln(1 + (N - df + 0.5)/(df + 0.5))), the retrieval
    * half of a dedup/quality pipeline's "find documents like these".
    *
    * Scale shape: corpus statistics (N, avgdl, per-term document
    * frequencies) come from ONE tiny aggregate — a single row, broadcast
    * into the scoring cross-join — and scoring itself is a pure projection
    * over the token array (no explode, no shuffle, no per-term join). At
    * 100 TB the cost is two passes of one scan each: stats, then score.
    */
  def bm25Scores(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val toks = filter(split(trim(regexp_replace(lower(col(textCol)),
      "[^a-z0-9]+", " ")), " "), t => t =!= "")
    val withToks = df.select(col(idCol), toks.as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    val dfAggs = queryTerms.zipWithIndex.map { case (t, i) =>
      sum(when(array_contains(col("toks"), t), 1L).otherwise(0L)).as(s"df_$i")
    }
    val statAggs = count(lit(1)).cast("double").as("n") +:
      avg(col("dl")).as("avgdl") +: dfAggs
    val stats = withToks.agg(statAggs.head, statAggs.tail: _*)
    val score = queryTerms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(col("toks"), x => x === t)).cast("double")
      val idf = log((col("n") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5) + 1.0)
      idf * (tf * (k1 + 1)) / (tf + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    withToks.crossJoin(broadcast(stats))
      .select(col(idCol), round(score, 6).as("bm25"))
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

  /** Per-document repetition statistics — the Gopher-style repetition
    * filters (Rae et al. 2021, "Scaling Language Models", App. A: documents
    * dominated by repeated lines/n-grams are low-quality training data):
    *
    *  - `dup_line_frac`:    1 − distinct lines / lines
    *  - `dup_word_frac`:    1 − distinct words / words
    *  - `top_bigram_frac`:  words covered by the most frequent bigram / words
    *  - `dup_trigram_frac`: trigram occurrences whose gram repeats / trigrams
    *
    * Scale shape: the line/word fractions are pure per-row codegen
    * (array_distinct — no shuffle). The n-gram fractions need per-doc gram
    * counts, which for unbounded doc lengths is the word-count shape:
    * explode → map-side-combined count on (doc, gram) → per-doc agg — two
    * shuffles, never a per-row O(n²) fold.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val src = PipelineUtil.spread(
      df.select(col(idCol).as("__id"), col(textCol).as("__text")))
    val toks = filter(
      split(trim(regexp_replace(lower(col("__text")), "[^a-z0-9]+", " ")), " "),
      t => t =!= "")
    def grams(n: Int) = transform(
      // m tokens → m-n+1 grams at starts 0..m-n; explicitly empty below n
      // tokens (sequence(0, negative) would count DOWN, not produce [])
      when(size(col("__t")) >= n, sequence(lit(0), size(col("__t")) - n))
        .otherwise(array().cast("array<int>")),
      i => concat_ws(" ", slice(col("__t"), i + 1, lit(n))))
    val base = PipelineUtil.pin(src.select(col("__id"), toks.as("__t"),
      split(col("__text"), "\n").as("__lines")))
    val flat = base.select(col("__id"),
      size(col("__t")).as("n_words"),
      size(array_distinct(col("__t"))).as("nd_words"),
      size(col("__lines")).as("n_lines"),
      size(array_distinct(col("__lines"))).as("nd_lines"))
    def gramAgg(n: Int, maxName: String, dupName: String, totName: String) =
      base.select(col("__id"), explode(grams(n)).as("g"))
        .groupBy("__id", "g").agg(count(lit(1)).as("c"))
        .groupBy("__id").agg(
          max(col("c")).as(maxName),
          sum(when(col("c") >= 2, col("c")).otherwise(0L)).as(dupName),
          sum(col("c")).as(totName))
    val bg = gramAgg(2, "max_bg", "dup_bg", "tot_bg")
    val tg = gramAgg(3, "max_tg", "dup_tg", "tot_tg")
    def frac(num: Column, den: Column) =
      round(when(den > 0, num.cast("double") / den).otherwise(0.0), 6)
    flat.join(bg, Seq("__id"), "left").join(tg, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        frac(col("n_lines") - col("nd_lines"), col("n_lines")).as("dup_line_frac"),
        frac(col("n_words") - col("nd_words"), col("n_words")).as("dup_word_frac"),
        frac(coalesce(col("max_bg"), lit(0L)) * 2, col("n_words")).as("top_bigram_frac"),
        frac(coalesce(col("dup_tg"), lit(0L)),
          coalesce(col("tot_tg"), lit(0L))).as("dup_trigram_frac"))
  }

  /** Split documents into fixed-size token windows with overlap — the
    * context-length chunker of a training/RAG prep pipeline. Chunk i
    * covers whitespace tokens [i·step, i·step + size) with
    * step = size − overlap; the final chunk is the remainder (never
    * empty, never duplicated: starts are 0, step, … up to the last index
    * that still begins new content). A doc with ≤ size tokens yields
    * exactly one chunk of itself.
    *
    * Scale shape: one codegen'd projection + posexplode — no shuffle, no
    * UDF; output rows carry (id, chunk_idx, chunk_text, n_tokens).
    */
  /** The chunk texts of one document as an `array<string>` column — the
    * scalar core of [[chunkTokens]], also exposed to SQL-only users as
    * `graft_chunks(text, size, overlap)` (explode it yourself). Pure
    * codegen over one tokens array.
    */
  def chunkArray(text: Column, size: Int, overlap: Int = 0): Column = {
    require(size > 0, s"size must be positive: $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size): $overlap vs size=$size")
    val step = size - overlap
    def chunksOf(toks: Column): Column = {
      // number of chunks: 1 + ceil(max(n - size, 0) / step) — integer form
      // the `size` param shadows functions.size — qualify the array length
      val n = org.apache.spark.sql.functions.size(toks)
      val nChunks = when(n <= size, lit(1))
        .otherwise(lit(1) + ((n - size + step - 1) / step).cast("int"))
      transform(sequence(lit(0), nChunks - 1),
        i => concat_ws(" ", slice(toks, i * step + 1, lit(size))))
    }
    // bind the token array once via a higher-order function so the split
    // does not re-evaluate per chunk
    transform(array(split(trim(text), "\\s+")), t => chunksOf(t)).getItem(0)
  }

  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int = 0): DataFrame =
    df.select(col(idCol),
        posexplode(chunkArray(col(textCol), size, overlap)))
      .toDF(idCol, "chunk_idx", "chunk_text")
      .withColumn("n_tokens",
        org.apache.spark.sql.functions.size(split(col("chunk_text"), "\\s+")))

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

  /** Span-level exact substring dedup (the Lee et al. 2021 "Deduplicating
    * Training Data Makes Language Models Better" transform, re-shaped for
    * Spark): every whitespace-token span of length `n` that occurs at
    * least `minOccurrences` times across the corpus (or within one doc) is
    * removed from EVERY occurrence except one canonical keeper — the
    * lexicographically smallest (doc_id, start). Where the paper builds a
    * suffix array, the distributed shape here is window HASHING: per-token
    * 64-bit hashes once per doc, window key = hash of the n-token-hash
    * slice, so document text never enters the dedup shuffle — only (id,
    * start, 8-byte key) rows, O(tokens) of them.
    *
    * Overlapping duplicated windows in one doc merge naturally: removal is
    * by covered token POSITION (the distinct union of [start, start+n) of
    * every non-canonical occurrence), so a long duplicated passage is cut
    * once, not per-window. Docs with nothing to remove pass through with
    * their original text byte-for-byte; rebuilt docs re-join kept tokens
    * with single spaces. Returns (doc_id, text, removed_tokens).
    *
    * Scale: window hits are slim long-rows; hit starts merge into
    * maximal intervals via spillable window functions, and only docs
    * that actually lose a span rebuild — by pure projection, never
    * per-token rows ([[cutSpans]]). Reference analog:
    * none (the reference dedups whole rows by key — paimon
    * `deduplicate` merge engine); this is pipeline-level, beyond it.
    *
    * Collision tradeoff (vs the paper's EXACT suffix array): the window
    * key is a 64-bit hash, so two DISTINCT n-token windows collide with
    * birthday probability ≈ W²/2⁶⁵ over W distinct windows — at 100 TB
    * (~10¹³ windows) a few million positions corpus-wide would be cut as
    * false duplicates: one-in-a-million tokens of benign loss for a
    * training-data pipeline, but NOT exact. Widen to a pair of
    * independently-seeded hashes (2⁻¹²⁸) if exactness matters.
    */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minOccurrences: Int = 2): DataFrame = {
    require(n > 0, s"span length must be positive: $n")
    require(minOccurrences >= 2, s"minOccurrences must be >=2: $minOccurrences")
    val src = PipelineUtil.pin(PipelineUtil.spread(
      df.select(col(idCol).as("doc_id"), col(textCol).as("text"))))
    // NOT pinned: consumed by both the canon groupBy and the join back,
    // but the frame is O(corpus tokens) of 20-byte rows — storing it
    // costs more than the one extra codegen'd tokenize+hash pass
    // (A/B-measured a wash at 100×; recompute keeps executor storage
    // free at corpus scale). The small downstream frames ARE pinned
    // (cutSpans).
    val wins = windowFrame(src, "doc_id", "text", n)
    val canon = wins.groupBy("h").agg(
        count(lit(1)).as("occ"),
        min(struct(col("doc_id"), col("start"))).as("keep"))
      .filter(col("occ") >= minOccurrences)
    val hits = wins.join(canon, "h")
      .filter(!(col("doc_id") === col("keep.doc_id") &&
        col("start") === col("keep.start")))
      .select(col("doc_id"), col("start"))
    cutSpans(src, hits, n)
  }

  /** Cut the n-token windows at the (doc_id, start) `hits` out of `src`
    * (doc_id, text) — the shared tail of [[removeRepeatedSpans]] /
    * [[removeCorpusSpans]]. Per-token rows NEVER exist on this path:
    *
    *  1. Interval derivation: within each doc, a start OPENS a maximal
    *     covered [lo, hi) interval iff its predecessor (lag over a
    *     doc-partitioned start-ordered window) is more than n back; a
    *     running sum of the open flags numbers the intervals, and a
    *     constant-buffer groupBy takes (min start, max start + n).
    *     WindowExec's partition buffer SPILLS (unlike the pre-r17
    *     `collect_set` aggregation-buffer row, which bounded a single
    *     saturated doc at executor memory), and the groupBy on
    *     (doc_id, grp) reuses the window's hash-partitioning on doc_id —
    *     one shuffle of the slim hit rows total.
    *  2. Rebuild: each affected doc joins its (small) sorted interval
    *     array and re-emits text as a PURE PROJECTION — the complement
    *     gaps [0,lo₁), [hi₁,lo₂), …, [hiₘ,L) slice the token array and
    *     re-join with single spaces. The pre-r17 shape posexploded every
    *     affected doc to (pos, tok) rows, anti-joined the covered
    *     positions and re-assembled via sort+collect_list: an O(affected
    *     tokens) shuffle ×2 that was the last spill leg of the 1000×
    *     saturated-duplicate probe. Untouched docs pass their original
    *     text through byte-identical.
    *
    * Memory bound: one doc's MERGED intervals must fit a collect_list
    * row — ≤ tokens/(n+1) entries of 8 B even for adversarial
    * alternating hits (~80 MB for a pathological 10⁸-token doc;
    * saturated duplication merges to a handful), vs the pre-r17 bound of
    * one int per covered TOKEN.
    */
  private def cutSpans(src: DataFrame, hits: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("doc_id").orderBy("start")
    val running = byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = hits.withColumn("__open",
      when(col("start") > lag(col("start"), 1, -n - 1).over(byDoc) + n, 1L)
        .otherwise(0L))
    val merged = flagged
      .withColumn("__grp", sum(col("__open")).over(running))
      .groupBy(col("doc_id"), col("__grp"))
      .agg(min(col("start")).as("lo"), (max(col("start")) + n).as("hi"))
    // pinned: feeds the rebuild join AND (via the left join's null side)
    // the pass-through flag — unpinned, each consumer re-runs the whole
    // window pipeline
    val perDoc = PipelineUtil.pin(merged.groupBy("doc_id").agg(
      array_sort(collect_list(struct(col("lo"), col("hi")))).as("__ivs"),
      sum(col("hi") - col("lo")).cast("long").as("__removed")))
    val toks = split(trim(col("text")), "\\s+")
    val gapLo = concat(array(lit(0)),
      transform(col("__ivs"), iv => iv.getField("hi")))
    val gapHi = concat(transform(col("__ivs"), iv => iv.getField("lo")),
      array(org.apache.spark.sql.functions.size(toks)))
    val clean = concat_ws(" ", flatten(
      zip_with(gapLo, gapHi, (glo, ghi) => slice(toks, glo + 1, ghi - glo))))
    src.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__ivs").isNotNull, clean).otherwise(col("text")).as("text"),
        coalesce(col("__removed"), lit(0L)).as("removed_tokens"))
  }

  // ---- incremental (cross-corpus) span dedup: the persisted-index
  // production shape of removeRepeatedSpans, mirroring
  // Dedup.buildSigIndex / nearDupPairsAgainst ----

  /** The (doc_id, start, h) window-hash frame of [[removeRepeatedSpans]]:
    * h = xxhash64 of the n-token-hash slice at each `stride`-th start.
    */
  private def windowFrame(df: DataFrame, idCol: String, textCol: String,
      n: Int, stride: Int = 1): DataFrame = {
    val len = org.apache.spark.sql.functions.size _
    val toks = split(trim(col(textCol)), "\\s+")
    val hashed = df.select(col(idCol).as("doc_id"),
      transform(toks, t => xxhash64(t)).as("__th"))
    val nStarts = ((len(col("__th")) - n) / stride).cast("int") // floor: both >= 0
    val starts = when(len(col("__th")) >= n,
        transform(sequence(lit(0), nStarts), i => i * stride))
      .otherwise(array().cast("array<int>"))
    hashed.select(col("doc_id"), posexplode(
        transform(starts, i => xxhash64(slice(col("__th"), i + 1, lit(n)))))
        .as(Seq("__i", "h")))
      .select(col("doc_id"),
        (col("__i") * stride).cast("int").as("start"), col("h"))
  }

  /** Create a persisted span index at `path`: a graft PK table
    * (h → doc_id, start of the FIRST occurrence — `first-row` merge
    * engine) of the corpus's n-token window hashes, bucketed by h, with
    * n/stride pinned in the table options so batches hash compatibly.
    * 20 B/window; `stride` > 1 trades index size for detection
    * granularity: a duplicated span of ≥ n + stride − 1 tokens still
    * guarantees one stored window inside it. Keys are 64-bit hashes —
    * see [[removeRepeatedSpans]] for the (tiny, corpus-scale) false-cut
    * collision tradeoff a persisted index inherits.
    */
  def buildSpanIndex(df: DataFrame, idCol: String, textCol: String,
      path: String, n: Int = 8, stride: Int = 1, buckets: Int = 8)
      : graft.table.GraftTable = {
    require(n > 0 && stride > 0, s"bad n=$n stride=$stride")
    val wins = windowFrame(df, idCol, textCol, n, stride)
    val t = graft.table.GraftTable.create(df.sparkSession, path, wins.schema,
      primaryKeys = Seq("h"),
      options = Map("bucket" -> buckets.toString,
        "merge-engine" -> "first-row",
        "dedup.span.n" -> n.toString, "dedup.span.stride" -> stride.toString))
    t.upsert(wins)
    t
  }

  /** The (n, stride) a span index was built with — fails fast on a
    * non-span-index table (hashing with different window length would
    * silently miss every duplicated span).
    */
  private def spanMeta(index: graft.table.GraftTable): (Int, Int) = {
    val n = index.schema.option("dedup.span.n", "")
    require(n.nonEmpty,
      s"table at ${index.location} is not a span index: missing " +
        "'dedup.span.n' table option (build one with TextOps.buildSpanIndex)")
    (n.toInt, index.schema.option("dedup.span.stride", "1").toInt)
  }

  /** Fold an admitted batch's windows into the span index (first-row
    * merge: the corpus's first occurrence stays canonical); exactly-once
    * under commitIdentifier.
    */
  def appendToSpanIndex(index: graft.table.GraftTable, df: DataFrame,
      idCol: String, textCol: String, commitIdentifier: Long = -1L,
      commitUser: String = ""): Unit = {
    val (n, stride) = spanMeta(index)
    index.upsert(windowFrame(df, idCol, textCol, n, stride),
      commitIdentifier = commitIdentifier, commitUser = commitUser)
  }

  /** Remove every batch span the CORPUS already has ("tonight's crawl
    * must not re-train yesterday's text"): batch windows semi-join the
    * span index on h (the corpus text is never re-read — only its 20-byte
    * window rows), matched windows' token positions are cut and only
    * affected docs rebuild, exactly like [[removeRepeatedSpans]]. Spans
    * duplicated WITHIN the batch are out of scope — compose with
    * [[removeRepeatedSpans]] for the intra pass. Returns
    * (doc_id, text, removed_tokens).
    */
  def removeCorpusSpans(batch: DataFrame, idCol: String, textCol: String,
      index: graft.table.GraftTable,
      view: Option[DataFrame] = None): DataFrame = {
    val (n, _) = spanMeta(index)
    val src = PipelineUtil.pin(PipelineUtil.spread(
      batch.select(col(idCol).as("doc_id"), col(textCol).as("text"))))
    // batch side hashes EVERY start (stride 1): only the INDEX strides —
    // a corpus span re-appears in the batch at arbitrary alignment, and
    // content-equal windows match regardless of position
    val hits = windowFrame(src, "doc_id", "text", n)
      .join(view.getOrElse(index.toDF).select(col("h")), Seq("h"), "left_semi")
      .select(col("doc_id"), col("start"))
    cutSpans(src, hits, n)
  }

  /** Propagate corpus deletions into a span index (takedown/GDPR): every
    * window row whose canonical doc_id is no longer live gets a `-D`
    * upsert — the [[Dedup.expireFromSigIndex]] anti-join shape on the h
    * PK. Releasing the hashes re-admits that text on future ingests,
    * which is exactly what a takedown wants. Returns the number expired.
    *
    * TAKEDOWN semantics only — not a GC: first-row merge stored only the
    * FIRST occurrence of each span, so expiring a canonical doc releases
    * spans that may still exist verbatim in other live corpus docs, and
    * future batches re-admit them (eroding cross-corpus recall). For
    * routine retention GC, rebuild instead: [[buildSpanIndex]] over the
    * live corpus at a fresh path (or upsert
    * `windowFrame(liveCorpus)` into a truncated index) — O(live tokens),
    * the same cost as the original build.
    */
  def expireFromSpanIndex(index: graft.table.GraftTable,
      liveIds: DataFrame): Long = {
    val live = liveIds.select(col(liveIds.columns.head).as("doc_id"))
    val expired = index.toDF.join(live, Seq("doc_id"), "left_anti").persist()
    try {
      val n = expired.count()
      if (n > 0) index.upsert(expired,
        kinds = Some(lit(graft.GraftMeta.KindDelete)))
      n
    } finally expired.unpersist()
  }

  /** GPT-style sequence packing: documents concatenate in ascending id
    * order into one token stream (`sepTokens` separator tokens after each
    * doc) and cut into fixed `seqLen`-token training sequences, docs
    * spanning boundaries. Returns the per-doc placement a sequence
    * builder needs — (doc_id, n_tokens, start_offset, first_seq,
    * last_seq) — computed with a DISTRIBUTED exclusive prefix sum
    * ([[PipelineUtil.exclusivePrefixSum]]): range shuffle + per-partition
    * running sums + a broadcast of partition offsets, never a
    * single-partition global window.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      seqLen: Int, sepTokens: Int = 1): DataFrame =
    packSequences(df, idCol,
      org.apache.spark.sql.functions.size(split(trim(col(textCol)), "\\s+"))
        .cast("long"),
      seqLen, sepTokens)

  /** [[packSequences]] with a CALLER-SUPPLIED per-doc token count — real
    * pipelines budget in BPE tokens, not whitespace words. `nTokens` may
    * be any expression over `df`'s columns: a precomputed tokenizer-output
    * count column, [[tokenCount]] (the BPE-ish regex), or
    * `size(toksArray)`. The String overload is the whitespace default.
    */
  def packSequences(df: DataFrame, idCol: String, nTokens: Column,
      seqLen: Int, sepTokens: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    require(sepTokens >= 0, s"sepTokens must be >=0: $sepTokens")
    val base = df.select(col(idCol).as("doc_id"),
      nTokens.cast("long").as("n_tokens"))
    PipelineUtil.exclusivePrefixSum(base, Seq(col("doc_id")),
        col("n_tokens") + lit(sepTokens.toLong), "start_offset")
      .withColumn("first_seq", expr(s"start_offset div ${seqLen}L"))
      // clamp: a ZERO-token doc (possible with caller-supplied counts,
      // e.g. tokenCount of whitespace-only text) occupies no positions —
      // define its placement as last_seq = first_seq on every engine.
      // Unclamped, (start_offset - 1) div seqLen diverges between
      // truncating (Spark div) and flooring (SQL //) division at
      // start_offset 0, and yields last_seq < first_seq everywhere else.
      .withColumn("last_seq", greatest(col("first_seq"),
        expr(s"(start_offset + n_tokens - 1) div ${seqLen}L")))
  }

  /** Deterministic token-BUDGET sampling for data mixing ("keep ~1M
    * tokens of each language/domain"): within each stratum, docs are
    * admitted in md5(seed ":" id) order until the stratum's cumulative
    * token count reaches its budget — the doc that crosses the line is
    * kept, so budgets are met, never undershot (a stratum smaller than
    * its budget keeps everything). Unlike the RATE-based
    * [[stratifiedSample]], a budget holds the output mix fixed as the
    * corpus grows — the shape of "2B tokens of code, 1B of wiki"
    * recipes. Reproducible across runs and engines (md5 order, no float
    * keys) and monotone in the budget (raising one only ADDS docs).
    *
    * Skew-proof at scale: one global distributed prefix sum ordered by
    * (stratum, key) ([[PipelineUtil.exclusivePrefixSum]] — range
    * shuffle, never one task per stratum), then within-stratum
    * cumulatives fall out by subtracting each stratum's first-row offset
    * (a tiny groupBy-min broadcast join). Returns
    * (doc_id, stratum, n_tokens).
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, strataCol: String,
      textCol: String, budgets: Map[String, Long], defaultBudget: Long = 0L,
      seed: Long = 0L): DataFrame =
    budgetSample(
        df.withColumn("__tw",
          org.apache.spark.sql.functions.size(split(trim(col(textCol)), "\\s+"))
            .cast("long")),
        idCol, strataCol, col("__tw"), budgets, defaultBudget, seed)
      .select(col(idCol).as("doc_id"), col("stratum"),
        col("w").as("n_tokens"))

  /** The general weighted-budget core of [[tokenBudgetSample]]: admit rows
    * per stratum in md5(seed ":" id) order while the stratum's EXCLUSIVE
    * cumulative `weight` is under its budget (crossing row kept — budgets
    * met, never undershot; monotone in the budget). `strataCol` may be any
    * expression-backed column — a language, a domain, a semantic cluster
    * from [[VectorOps.clusterAssign]]. Weight `lit(1)` makes it a
    * per-stratum COUNT cap. Returns (idCol, stratum, w).
    */
  def budgetSample(df: DataFrame, idCol: String, strataCol: String,
      weight: Column, budgets: Map[String, Long], defaultBudget: Long = 0L,
      seed: Long = 0L): DataFrame = {
    require(budgets.values.forall(_ >= 0) && defaultBudget >= 0,
      "budgets must be non-negative")
    val key = md5(concat_ws(":", lit(seed).cast("string"),
      col(idCol).cast("string")).cast("binary"))
    val base = df.select(col(idCol),
      col(strataCol).cast("string").as("stratum"),
      weight.cast("long").as("w"), key.as("__k"))
    val withOff = PipelineUtil.exclusivePrefixSum(base,
      Seq(col("stratum"), col("__k"), col(idCol)), col("w"), "__g")
    val stratumBase = withOff.groupBy("stratum").agg(min(col("__g")).as("__b"))
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (s, b)) => when(col("stratum") === s, lit(b)).otherwise(acc)
    }
    withOff.join(broadcast(stratumBase), Seq("stratum"))
      .filter(col("__g") - col("__b") < budget)
      .select(col(idCol), col("stratum"), col("w"))
  }

  /** ASSEMBLE the packed training sequences of [[packSequences]]: the
    * concatenated token stream (each doc followed by `sepTok`,
    * [[packSequences]]' sepTokens=1 shape) cut into `seqLen`-token
    * sequences, each returned as (seq_id, text, n_tokens) with docs
    * spanning boundaries. The final sequence is the remainder (shorter
    * than seqLen).
    *
    * Scale shape: each doc SLICES itself into its per-sequence segments
    * locally (a posexplode over the ≤ (n/seqLen)+2 sequences it touches),
    * so the assembly shuffle carries one row per (doc, sequence) SEGMENT
    * — O(docs + boundary crossings), never one row per token.
    */
  def packedSequenceTexts(df: DataFrame, idCol: String, textCol: String,
      seqLen: Int, sepTok: String = "</s>"): DataFrame =
    packedSequenceTexts(df, idCol, split(trim(col(textCol)), "\\s+"),
      seqLen, sepTok)

  /** [[packedSequenceTexts]] over a CALLER-SUPPLIED token array — the BPE
    * seam: `toks` may be any `array<string>` expression over `df`'s
    * columns (a tokenizer's output column, a `regexp_extract_all`
    * word-piece split). Placement, slicing, and assembly shapes are
    * identical; only the tokenization differs. The String overload is the
    * whitespace default.
    */
  def packedSequenceTexts(df: DataFrame, idCol: String, toks: Column,
      seqLen: Int, sepTok: String): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    require(!sepTok.exists(_.isWhitespace), s"separator must be one token: '$sepTok'")
    val counted = df.select(col(idCol).as("doc_id"), toks.as("__toks"))
    val placed = packSequences(counted, "doc_id",
        org.apache.spark.sql.functions.size(col("__toks")).cast("long"),
        seqLen, sepTokens = 1)
      .join(counted, Seq("doc_id"))
    // doc stream = tokens ++ sep; it occupies global [start, start+n+1)
    val full = concat(col("__toks"), array(lit(sepTok)))
    val lastSeq = expr(s"(start_offset + n_tokens) div ${seqLen}L") // last incl. sep
    val segs = placed
      // tokenize in its OWN projection: a sibling EXPRESSION in the
      // explode select would hoist above the Generate and re-split per
      // sequence element (the generator-extraction trap)
      .select(col("start_offset").as("start"), (col("n_tokens") + 1L).as("len"),
        full.as("__f"), col("first_seq"), lastSeq.as("__last"))
      .select(col("start"), col("len"), col("__f"),
        explode(sequence(col("first_seq"), col("__last"))).as("seq_id"))
      .select(col("seq_id"),
        greatest(col("seq_id") * seqLen - col("start"), lit(0L)).as("lo"),
        least(col("len"), (col("seq_id") + 1L) * seqLen - col("start")).as("hi"),
        greatest(col("start") - col("seq_id") * seqLen, lit(0L)).as("off"),
        col("__f"))
      .select(col("seq_id"), col("off"),
        slice(col("__f"), (col("lo") + 1L).cast("int"),
          (col("hi") - col("lo")).cast("int")).as("seg"))
    segs.groupBy("seq_id").agg(
      concat_ws(" ", flatten(transform(
        array_sort(collect_list(struct(col("off"), col("seg")))),
        x => x.getField("seg")))).as("text"),
      sum(org.apache.spark.sql.functions.size(col("seg")).cast("long")).as("n_tokens"))
  }

  /** Seeded deterministic global shuffle for epoch ordering: each row gets
    * a stable 0-based `shuffle_pos` — its rank under
    * md5(seed ":" id) — reproducible across runs and cluster sizes
    * (md5 is exact, no float sort keys), different seeds give unrelated
    * permutations. Rides the same distributed prefix sum as
    * [[packSequences]] (weight 1 ⇒ exclusive count ⇒ rank); writers
    * then range-write by `shuffle_pos` for a globally shuffled epoch
    * without ever sorting in one task.
    */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long): DataFrame = {
    val key = md5(concat_ws(":", lit(seed).cast("string"),
      col(idCol).cast("string")).cast("binary"))
    PipelineUtil.exclusivePrefixSum(df.withColumn("__sk", key),
        Seq(col("__sk"), col(idCol)), lit(1L), "shuffle_pos")
      .drop("__sk")
  }

  // ---- data selection: hashed n-gram importance weights (DSIR, Xie et
  // al. 2023 "Data Selection for Language Models via Importance
  // Resampling") ----

  /** Hashed n-gram feature buckets of each doc: lowercased whitespace
    * unigrams + adjacent bigrams, md5-bucketed into [0, numBuckets) (the
    * engine-independent [[splitBucket]] hash, so scores reproduce across
    * engines). One row per feature OCCURRENCE — DSIR weights by count.
    */
  private def dsirFeatures(df: DataFrame, idCol: String, textCol: String,
      numBuckets: Int): DataFrame = {
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"),
      t => length(t) > 0)
    val len = org.apache.spark.sql.functions.size _
    val bigrams = zip_with(
      slice(toks, lit(1), greatest(len(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(len(toks) - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
    df.select(col(idCol).as("doc_id"),
        explode(concat(toks, bigrams)).as("__f"))
      .select(col("doc_id"), splitBucket(col("__f"), numBuckets).as("bucket"))
  }

  /** DSIR importance weights: per-doc log-likelihood ratio of TARGET vs
    * RAW hashed n-gram bucket distributions —
    * score(d) = Σ_{features f ∈ d} ln p̂_target(b(f)) − ln p̂_raw(b(f)),
    * Laplace-smoothed. Docs scoring high look like the target domain;
    * feed the scores to [[dsirSample]] (Gumbel top-k) for the resampling
    * step. Returns (doc_id, dsir_score); featureless docs score 0.
    *
    * Scale shape: two O(tokens) explode→map-side-combined bucket counts
    * (≤ numBuckets rows each), two scalar totals, and ONE broadcast join
    * of the ≤numBuckets-row log-ratio table back onto the raw feature
    * stream — the raw corpus shuffles only (doc_id, bucket) longs, text
    * never moves, and nothing is ever all-pairs. The target corpus is
    * typically small (a quality reference set) but may be any size.
    * Reference analog: none (pipeline-level, beyond the reference).
    */
  def dsirWeights(raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      numBuckets: Int = 4096, smoothing: Double = 1.0): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive: $numBuckets")
    require(smoothing > 0, s"smoothing must be positive: $smoothing")
    val rawFeats = dsirFeatures(raw, idCol, textCol, numBuckets)
    // both count frames are ≤ numBuckets rows but derive from full corpus
    // scans — pin them so the totals collect, the ratio join, and the
    // score join never replay the tokenize+hash pipeline
    val tgtCounts = PipelineUtil.pin(dsirFeatures(
        target.select(monotonically_increasing_id().as("__tid"),
          col(targetTextCol)), "__tid", targetTextCol, numBuckets)
      .groupBy("bucket").agg(count(lit(1)).as("__tc")))
    val rawCounts = PipelineUtil.pin(
      rawFeats.groupBy("bucket").agg(count(lit(1)).as("__rc")))
    // totals: one scalar row each (bounded driver collect); coalesce —
    // an empty/whitespace-only corpus sums to null
    val rawTotal = rawCounts.agg(coalesce(sum("__rc"), lit(0L)))
      .collect()(0).getLong(0)
    val tgtTotal = tgtCounts.agg(coalesce(sum("__tc"), lit(0L)))
      .collect()(0).getLong(0)
    require(tgtTotal > 0, "dsirWeights: target corpus has no features")
    val a = smoothing
    val ratios = rawCounts.join(tgtCounts, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        (log((coalesce(col("__tc"), lit(0L)) + a) /
            (tgtTotal + a * numBuckets)) -
          log((coalesce(col("__rc"), lit(0L)) + a) /
            (rawTotal + a * numBuckets))).as("__lr"))
    val scores = rawFeats.join(broadcast(ratios), Seq("bucket"))
      .groupBy("doc_id").agg(sum("__lr").as("dsir_score"))
    raw.select(col(idCol).as("doc_id")).join(scores, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("dsir_score"), lit(0.0)).as("dsir_score"))
  }

  /** DSIR's resampling step: keep the k docs with the highest
    * score/temperature + Gumbel(md5(seed ":" id)) key — i.e. sample k
    * WITHOUT replacement with probability ∝ exp(score/T) (the
    * Gumbel-top-k trick), but fully deterministic and engine-independent
    * (the noise is an md5-uniform, not an RNG): the same k docs come
    * back on every run, engine, and cluster size. T → 0 approaches pure
    * top-k by score; larger T flattens toward uniform. Returns the
    * selected (doc_id, dsir_score, sample_key) rows.
    *
    * Scale: DSIR's production shape is "select the best 100M docs from
    * 10B" — a driver-merged TakeOrdered at that k is a scale-killer (k
    * rows × partitions heaped through one machine). For k >
    * `driverTopKMax` the selection runs fully DISTRIBUTED instead: a
    * [[PipelineUtil.exclusivePrefixSum]] rank under the total order
    * (sample_key desc, doc_id) — one range shuffle of the slim
    * (id, score, key) rows, a ≤shuffle-partitions driver collect of
    * partition totals — then `filter(rank < k)`. Both paths select the
    * IDENTICAL row set (the rank filter is exact, and the order is
    * total because doc_id ties break deterministically); small k keeps
    * the cheaper per-partition-heads TakeOrdered.
    */
  def dsirSample(scored: DataFrame, idCol: String, scoreCol: String,
      k: Int, temperature: Double = 1.0, seed: Long = 0L,
      driverTopKMax: Int = 100000): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(temperature > 0, s"temperature must be positive: $temperature")
    // md5-derived uniform in (0, 1): 8 hex chars = 32 bits, +0.5 keeps
    // u strictly inside the interval so ln(-ln(u)) is finite
    val u = (conv(substring(md5(concat_ws(":", lit(seed).cast("string"),
        col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("double") + 0.5) / 4294967296.0
    val keyed = scored.select(col(idCol).as("doc_id"),
      col(scoreCol).cast("double").as("dsir_score"),
      (col(scoreCol).cast("double") / temperature - log(-log(u)))
        .as("sample_key"))
    if (k <= driverTopKMax)
      keyed.orderBy(col("sample_key").desc, col("doc_id")).limit(k)
    else
      PipelineUtil.exclusivePrefixSum(keyed,
          Seq(col("sample_key").desc, col("doc_id")), lit(1L), "__rank")
        .filter(col("__rank") < k)
        .drop("__rank")
  }
}
