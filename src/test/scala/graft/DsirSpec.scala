package graft

import graft.pipeline.TextOps
import org.apache.spark.sql.functions._
import scala.util.Random

/** DSIR importance weighting ([[TextOps.dsirWeights]] / [[TextOps.dsirSample]],
  * Xie et al. 2023): per-doc log-likelihood ratio of target-vs-raw hashed
  * n-gram bucket distributions, then deterministic Gumbel top-k resampling.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 256

  /** The engine's bucket hash, locally: first 8 md5 hex chars mod B. */
  private def bucket(f: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 8), 16) % B).toInt
  }

  private def features(text: String): Seq[Int] = {
    val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    (toks ++ toks.zip(toks.drop(1)).map { case (a, b) => s"$a $b" }).map(bucket)
  }

  // two vocabularies: target-flavored docs use mostly T-words, raw noise
  // docs mostly N-words
  private def doc(rnd: Random, pTarget: Double, len: Int): String =
    (0 until len).map { _ =>
      if (rnd.nextDouble() < pTarget) s"t${rnd.nextInt(20)}" else s"n${rnd.nextInt(200)}"
    }.mkString(" ")

  private val rnd = new Random(7)
  private val rawDocs: Seq[(Long, String)] = (0L until 80L).map { id =>
    id -> doc(rnd, if (id % 4 == 0) 0.9 else 0.1, 12 + rnd.nextInt(20))
  }
  private val targetDocs: Seq[(Long, String)] =
    (1000L until 1030L).map(id => id -> doc(rnd, 0.95, 15))

  test("dsirWeights matches the local log-likelihood-ratio reference") {
    val raw = rawDocs.toDF("doc_id", "text").repartition(7)
    val tgt = targetDocs.toDF("doc_id", "text").repartition(3)
    val got = TextOps.dsirWeights(raw, "doc_id", "text", tgt, "text",
        numBuckets = B, smoothing = 1.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val rawFeats = rawDocs.flatMap { case (_, t) => features(t) }
    val tgtFeats = targetDocs.flatMap { case (_, t) => features(t) }
    val rc = rawFeats.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tc = tgtFeats.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (rt, tt) = (rawFeats.size.toLong, tgtFeats.size.toLong)
    def lr(b: Int): Double =
      math.log((tc.getOrElse(b, 0L) + 1.0) / (tt + B.toDouble)) -
        math.log((rc.getOrElse(b, 0L) + 1.0) / (rt + B.toDouble))
    for ((id, t) <- rawDocs) {
      val want = features(t).map(lr).sum
      assert(math.abs(got(id) - want) < 1e-9, s"doc $id: ${got(id)} vs $want")
    }
    // featureless docs score exactly 0 and are not dropped
    val withEmpty = (rawDocs :+ (999L -> "   ")).toDF("doc_id", "text")
    val e = TextOps.dsirWeights(withEmpty, "doc_id", "text", tgt, "text",
      numBuckets = B).filter($"doc_id" === 999L).collect()
    assert(e.length === 1 && e(0).getDouble(1) === 0.0)
  }

  test("target-flavored docs outrank noise docs; sample is deterministic Gumbel top-k") {
    val raw = rawDocs.toDF("doc_id", "text").repartition(7)
    val tgt = targetDocs.toDF("doc_id", "text").repartition(3)
    val scored = TextOps.dsirWeights(raw, "doc_id", "text", tgt, "text",
      numBuckets = B)
    val byScore = scored.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val targetish = rawDocs.collect { case (id, _) if id % 4 == 0 => byScore(id) }
    val noise = rawDocs.collect { case (id, _) if id % 4 != 0 => byScore(id) }
    // separation: the WORST target-flavored doc beats the BEST noise doc
    assert(targetish.min > noise.max,
      s"no separation: min(target)=${targetish.min} max(noise)=${noise.max}")

    // tiny temperature -> pure top-k by score
    val cold = TextOps.dsirSample(scored, "doc_id", "dsir_score",
      k = 20, temperature = 1e-9, seed = 5L).collect().map(_.getLong(0)).toSet
    val wantTop = byScore.toSeq.sortBy { case (id, s) => (-s, id) }
      .take(20).map(_._1).toSet
    assert(cold === wantTop)

    // T=1: deterministic across runs, exactly k rows, descending keys
    val s1 = TextOps.dsirSample(scored, "doc_id", "dsir_score", 25, 1.0, 42L)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val s2 = TextOps.dsirSample(scored.repartition(13), "doc_id", "dsir_score",
      25, 1.0, 42L).collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(s1.toSeq === s2.toSeq)
    assert(s1.length === 25)
    assert(s1.map(_._2).toSeq === s1.map(_._2).sorted(Ordering[Double].reverse).toSeq)
    // a different seed reshuffles the Gumbel noise (same scores)
    val s3 = TextOps.dsirSample(scored, "doc_id", "dsir_score", 25, 1.0, 43L)
      .collect().map(_.getLong(0))
    assert(s3.toSet !== s1.map(_._1).toSet)
  }
}
