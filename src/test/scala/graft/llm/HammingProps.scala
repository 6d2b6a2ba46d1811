package graft.llm

import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.TestSpark

/** Property lock on the chunk-blocked Hamming engine after the round-8
  * exact-dup-collapse restructure: in the pigeonhole-exact regime
  * (maxHamming < chunks) the operator must equal brute force EXACTLY —
  * including duplicate-heavy sig multisets, where the collapse path (group
  * expansion, distance-0 intra pairs, least/greatest id ordering) does the
  * work the candidate join used to. */
object HammingProps extends Properties("graft.llm.hamming") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Each Spark round-trip costs ~0.5s; 25 cases keep the property under
  // the suite's time budget while still covering the dup/near-dup mix.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(25)

  // Sig multiset engineered for the interesting regimes: a small pool
  // (exact duplicates), near-misses a few flipped bits away (cross-sig
  // pairs inside the radius), and fresh random longs (non-pairs).
  private val sigsGen: Gen[List[Long]] = for {
    pool <- Gen.chooseNum(2, 4).flatMap(k =>
      Gen.listOfN(k, Gen.long).suchThat(_.nonEmpty))
    n <- Gen.chooseNum(4, 18)
    sigs <- Gen.listOfN(n, Gen.frequency(
      3 -> Gen.oneOf(pool),
      2 -> (for {
        s <- Gen.oneOf(pool)
        k <- Gen.chooseNum(1, 7)
        bits <- Gen.listOfN(k, Gen.chooseNum(0, 63))
      } yield bits.distinct.foldLeft(s)((a, b) => a ^ (1L << b))),
      2 -> Gen.long))
  } yield sigs

  property("above-radius regime: no false positives, dists correct") =
    Prop.forAllNoShrink(sigsGen) { sigs =>
      // maxHamming >= chunks: blocking is recall-lossy (documented tier),
      // but every emitted pair must still be real and correctly distanced.
      val df = sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "sig")
      val got = Dedup.hamming64Pairs(df, maxHamming = 12, chunks = 4)
        .selectExpr("id_a", "id_b", "CAST(dist AS INT) AS dist")
        .as[(Long, Long, Int)].collect()
      got.forall { case (a, b, d) =>
        a < b && d <= 12 &&
          java.lang.Long.bitCount(sigs(a.toInt) ^ sigs(b.toInt)) == d
      }
    }

  property("hamming64Pairs == brute force in the pigeonhole-exact regime") =
    Prop.forAllNoShrink(sigsGen, Gen.oneOf(4, 8)) { (sigs, chunks) =>
      val maxH = chunks - 1
      val df = sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "sig")
      val got = Dedup.hamming64Pairs(df, maxH, chunks)
        .selectExpr("id_a", "id_b", "CAST(dist AS INT) AS dist")
        .as[(Long, Long, Int)].collect().toSet
      val brute = (for {
        i <- sigs.indices
        j <- (i + 1) until sigs.size
        d = java.lang.Long.bitCount(sigs(i) ^ sigs(j))
        if d <= maxH
      } yield (i.toLong, j.toLong, d)).toSet
      Prop.propBoolean(got == brute) :|
        s"got ${got.size} pairs, brute ${brute.size}; diff=${(got diff brute) ++ (brute diff got)}"
    }
}
