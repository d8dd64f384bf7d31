package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity over embedding columns (`array<float>`): brute-force
  * cosine top-k as the exact baseline, LSH-bucketed search as the scale
  * path, and embedding-space near-dup pairs.
  *
  * Dot products / norms are sequential folds over the array in double
  * precision — built-in higher-order functions, codegen'd, deterministic
  * (same fold order every run, so results are reproducible bit-for-bit).
  */
object VectorOps {

  /** Sequential-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, 0.0).otherwise(dot(a, b) / d)
  }

  /** Exact top-k by cosine similarity to one query vector. The plan is a
    * single scan + TakeOrderedAndProject — no shuffle of the corpus, the
    * per-partition top-k folds into a driver-side merge of k·partitions
    * rows.
    */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    df.select(col(idCol),
        round(cosine(col(vecCol), q), 6).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1): seeded by
    * (plane, dim) so every executor derives the same planes with no
    * broadcast state.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(concat(lit(s"plane#$plane/"), dim)), lit(2000000)).cast("double")
      / 1000000.0) - 1.0

  /** Sign-random-projection LSH bucket of a vector: one bit per hyperplane
    * (sign of the projection), packed into a long.
    */
  def lshBucket(vec: Column, numPlanes: Int = 12): Column =
    (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (a, v) => a + v)
      when(proj >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** Approximate top-k: restrict the exact ranking to vectors sharing the
    * query's LSH bucket (single-probe). The scale path — the scan prunes to
    * one bucket; recall is tunable by `numPlanes` and multi-probing.
    */
  def cosineTopKLsh(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, numPlanes: Int = 8): DataFrame = {
    val q = array(query.map(lit): _*)
    val bucketed = df.withColumn("__b", lshBucket(col(vecCol), numPlanes))
    val qb = bucketed.sparkSession.range(1)
      .select(lshBucket(q, numPlanes).as("__qb"))
      .collect()(0).getLong(0)
    bucketed.filter(col("__b") === qb)
      .select(col(idCol), round(cosine(col(vecCol), q), 6).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
  }

  /** Embedding near-dup pairs: LSH-bucketed candidates verified by exact
    * cosine ≥ threshold. Join is bucket-local (no all-pairs).
    */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, numPlanes: Int = 8): DataFrame = {
    val b = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), numPlanes).as("bucket"))
    b.as("a").join(b.as("x"),
        col("a.bucket") === col("x.bucket") && col("a.id") < col("x.id"))
      .select(col("a.id").as("id_a"), col("x.id").as("id_b"),
        round(cosine(col("a.v"), col("x.v")), 6).as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
  }
}
