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

  /** Deterministic pseudo-random hyperplane components in [-1, 1), derived
    * from md5("plane#p/i") — computed ONCE at plan-build time and inlined
    * as literal arrays, so executors do zero hashing in the hot path and an
    * external SQL oracle (DuckDB) can reproduce the identical planes.
    */
  def planeComponents(numPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until numPlanes).map { p =>
      (0 until dim).map { i =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"plane#$p/$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val h = d.take(4).map("%02x".format(_)).mkString
        (java.lang.Long.parseLong(h, 16) % 2000000L).toDouble / 1000000.0 - 1.0
      }
    }

  /** Sign-random-projection LSH bucket of a vector: one bit per hyperplane
    * (sign of the projection), packed into a long.
    */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (pl, p) =>
      val plc = array(pl.map(lit): _*)
      val proj = aggregate(
        zip_with(vec, plc, (x, c) => x.cast("double") * c),
        lit(0.0), (a, v) => a + v)
      when(proj >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** Approximate top-k: restrict the exact ranking to vectors sharing the
    * query's LSH bucket (single-probe). The scale path — the scan prunes to
    * one bucket; recall is tunable by `numPlanes` and multi-probing.
    */
  def cosineTopKLsh(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, numPlanes: Int = 8): DataFrame = {
    val planes = planeComponents(numPlanes, query.length)
    val q = array(query.map(lit): _*)
    // query bucket computed driver-side with the same plane constants
    val qb = planes.zipWithIndex.map { case (pl, p) =>
      val proj = pl.zip(query).map { case (c, x) => c * x }.sum
      if (proj >= 0.0) 1L << p else 0L
    }.reduce(_ | _)
    df.withColumn("__b", lshBucket(col(vecCol), planes))
      .filter(col("__b") === qb)
      .select(col(idCol), round(cosine(col(vecCol), q), 6).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
  }

  /** Embedding near-dup pairs: LSH-bucketed candidates verified by exact
    * cosine ≥ threshold. Join is bucket-local (no all-pairs).
    */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val planes = planeComponents(numPlanes, dim)
    val b = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), planes).as("bucket"))
    b.as("a").join(b.as("x"),
        col("a.bucket") === col("x.bucket") && col("a.id") < col("x.id"))
      .select(col("a.id").as("id_a"), col("x.id").as("id_b"),
        round(cosine(col("a.v"), col("x.v")), 6).as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
  }
}
