package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The 5-block Hamming pigeonhole join is the shared candidate machinery
  * of text SimHash, image dHash, audio fingerprints and video frame
  * voting — this pins its COMPLETENESS (every pair within the ball is
  * found; blocking may never lose one) and exactness (reported distances
  * are true popcount distances, nothing outside the ball survives)
  * against a brute-force oracle on adversarial sketch sets: random
  * sketches, plus planted near-pairs at hamming 0..4 off shared bases.
  */
class HammingBlockingPropertySpec extends SparkSpec {
  import spark.implicits._

  private def brute(sk: Seq[(Long, Long)], maxH: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- sk; (ib, sb) <- sk if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= maxH
    } yield (ia, ib, h)).toSet

  test("property: blocked pairs == brute force for hamming <= 3") {
    val flip = Gen.chooseNum(0, 63)
    val gen = for {
      nBase <- Gen.chooseNum(2, 8)
      bases <- Gen.listOfN(nBase, Gen.long)
      // planted variants: each flips 0..4 random bits of a random base
      // (distance 4 variants land OUTSIDE the ball vs their base — the
      // must-not-report side, unless other flips cancel)
      nVar <- Gen.chooseNum(0, 12)
      variants <- Gen.listOfN(nVar, for {
        b <- Gen.oneOf(bases)
        k <- Gen.chooseNum(0, 4)
        bits <- Gen.listOfN(k, flip)
      } yield bits.foldLeft(b)((v, i) => v ^ (1L << i)))
    } yield (bases ++ variants).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val prop = Prop.forAll(gen) { sk =>
      val got = Dedup.hammingBlockedPairs(
        sk.toDF("id", "sk"), maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      got == brute(sk, 3)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: cross-frame blocked pairs == brute force, same-id excluded") {
    val gen = for {
      nBase <- Gen.chooseNum(2, 6)
      bases <- Gen.listOfN(nBase, Gen.long)
      nNew <- Gen.chooseNum(1, 6)
      newSk <- Gen.listOfN(nNew, for {
        b <- Gen.oneOf(bases)
        k <- Gen.chooseNum(0, 4)
        bits <- Gen.listOfN(k, Gen.chooseNum(0, 63))
      } yield bits.foldLeft(b)((v, i) => v ^ (1L << i)))
    } yield (bases.zipWithIndex.map { case (s, i) => (i.toLong, s) },
      // new ids OVERLAP corpus ids on purpose: id 0 re-ingests
      newSk.zipWithIndex.map { case (s, i) => (i.toLong, s) })
    val prop = Prop.forAll(gen) { case (corpus, fresh) =>
      val got = Dedup.hammingBlockedPairsAgainst(
        fresh.toDF("id", "sk"), corpus.toDF("id", "sk"), maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (ia, sa) <- fresh; (ib, sb) <- corpus if ia != ib
        h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
      } yield (ia, ib, h)).toSet
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
