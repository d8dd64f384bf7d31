package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at corpus scale: MinHash + banded LSH, SimHash,
  * and exact n-gram Jaccard verification.
  *
  * Scale design: candidate generation is bucket-local — documents are only
  * ever compared when they collide in an LSH band bucket, so the join is
  * |buckets| × (bucket size choose 2), not |docs|², and each stage is a
  * plain shuffle on a band-bucket key. All hashing uses built-in
  * `xxhash64` (codegen'd); signatures are computed in one projection with
  * nested higher-order functions — no UDFs, no driver-side loops.
  */
object Dedup {

  /** Word n-gram shingles of normalized text (distinct, order-free). */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")), " ")
    val grams = transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    array_distinct(grams)
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum hash over the shingle set (classic Broder sketch; reference
    * behavior used by every public MinHash-LSH pipeline).
    */
  def minhashSignature(shingleSet: Column, numHashes: Int = 64): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(shingleSet, x => xxhash64(concat(x, lit("#"), s)))))

  /** Banded LSH keys: hash each band of `rowsPerBand` signature slots; docs
    * sharing any band key become candidates.
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(concat_ws(",", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))))
          .as("bucket")))

  /** Candidate near-dup pairs (idA < idB) via MinHash + banded LSH.
    *
    * @param df       input
    * @param idCol    unique id column
    * @param textCol  text column
    */
  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sigs = df.select(col(idCol).as("id"),
        minhashSignature(shingles(col(textCol)), numHashes).as("sig"))
      .select(col("id"), explode(bandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.bucket"))
    // bucket-local self-join; band+bucket equality keeps it tiny
    val a = sigs.as("a")
    val b = sigs.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
        && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, 0.0).otherwise(
      size(array_intersect(a, b)).cast("double") / size(array_union(a, b)))

  /** Near-dup pairs: LSH candidates verified by exact n-gram Jaccard ≥
    * threshold. The verify join touches only candidate pairs.
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol)).as("sh"))
    val cands = lshCandidatePairs(df, idCol, textCol, numHashes, bands)
    cands
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard_sim"))
      .filter(col("jaccard_sim") >= threshold)
  }

  /** Documents to DROP so that each near-dup cluster keeps its smallest id
    * (greedy edge rule: drop the larger id of every qualifying pair —
    * deterministic and union-find-free; at 100 TB this is one aggregation
    * over the verified pair set).
    */
  def dropIds(pairs: DataFrame): DataFrame =
    pairs.select(col("id_b").as("drop_id")).distinct()

  /** 64-bit SimHash of a pre-materialized token-hash array column: per bit
    * position, sign of the sum of (+1/-1) token-hash bits (Charikar
    * sketch). Static per-bit expressions — whole-stage codegen, no shuffle.
    */
  def simhashFromHashes(hashes: Column): Column =
    (0 until 64).map { i =>
      when(aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)
      ) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** Token-hash array used by [[simhashFromHashes]]. */
  def tokenHashes(text: Column): Column = {
    val toks = split(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")), " ")
    transform(array_distinct(toks), t => xxhash64(t))
  }

  /** Hamming distance between two 64-bit sketches. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidate pairs: block on 4 16-bit sketch segments
    * (any pair within Hamming distance 3 shares at least one exact segment
    * — pigeonhole), verify by full Hamming distance.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sk = df.select(col(idCol).as("id"),
        simhashFromHashes(tokenHashes(col(textCol))).as("sk"))
    val segs = array((0 until 4).map(i => struct(lit(i).as("seg"),
      shiftright(col("sk"), i * 16).bitwiseAND(0xFFFFL).as("val"))): _*)
    val seg = sk.select(col("id"), col("sk"), explode(segs).as("s"))
      .select(col("id"), col("sk"), col("s.seg"), col("s.val"))
    seg.as("a").join(seg.as("b"),
        col("a.seg") === col("b.seg") && col("a.val") === col("b.val")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.sk"), col("b.sk")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
