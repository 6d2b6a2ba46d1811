package graft.functions

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._
import graft.TestSpark

/** ScalaCheck properties for the round-12 portable (md5-based) signature
  * kernels — the pieces whose DuckDB oracles depend on exact cross-engine
  * agreement:
  *  - [[SimHashOfHashes]] must equal the naive per-bit sign-sum for ANY
  *    array<bigint> input (not just md5-60 hashes), and stay insensitive
  *    to input order (the sign-sum is a commutative count);
  *  - `Dedup.md5Hash60` must be non-negative, < 2⁶⁰, and equal a direct
  *    MessageDigest recompute (the conv/substr parse can't drift).
  */
object PortableHashProps extends Properties("graft.functions.portable") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  private val hashesGen: Gen[List[Long]] =
    Gen.listOfN(12, Gen.chooseNum(Long.MinValue, Long.MaxValue)).flatMap(l =>
      Gen.chooseNum(0, 12).map(n => l.take(n)))

  private def naive(hs: Seq[Long]): Long =
    (0 until 64).foldLeft(0L) { (acc, j) =>
      val c = hs.map(h => if (((h >>> j) & 1L) == 1L) 1 else -1).sum
      if (c > 0) acc | (1L << j) else acc
    }

  property("simhashOfHashes == naive sign-sum, any bigint input") =
    Prop.forAll(hashesGen) { hs =>
      val got = Seq(Tuple1(hs)).toDF("hs")
        .select(ArrayKernels.simhashOfHashes(col("hs")))
        .head().getLong(0)
      got == naive(hs)
    }

  property("simhashOfHashes is input-order-insensitive") =
    Prop.forAll(hashesGen) { hs =>
      val a = SimHashOfHashes.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(hs.toArray))
      val b = SimHashOfHashes.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(hs.reverse.toArray))
      a == b
    }

  private val wordGen: Gen[String] =
    Gen.chooseNum(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))

  property("md5Hash60: in [0, 2^60) and equal to a direct digest recompute") =
    Prop.forAll(wordGen) { w =>
      val got = Seq(Tuple1(w)).toDF("s")
        .select(graft.llm.Dedup.md5Hash60(col("s")))
        .head().getLong(0)
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      got >= 0L && got < (1L << 60) && got == java.lang.Long.parseLong(hex, 16)
    }
}
