package graft.engine

import org.scalacheck.{Gen, Prop, Properties}
import graft.TestSpark

/** ScalaCheck properties for the distributed Merkle reduction: the
  * level-halving groupBy agrees with a sequential fold on arbitrary leaf
  * lists, depth beyond the minimum is an identity carry (the fact the
  * fixed-depth oracle unroll rests on), and any single-leaf change flips
  * the root. */
object MerkleProps extends Properties("graft.engine.merkle") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  property("rootPerKey == sequential fold; padded depth identical; tamper flips") =
    Prop.forAll(Gen.chooseNum(1, 14), Gen.chooseNum(0L, 1000L)) { (n, salt) =>
      val hashes = (0 until n).map(i => md5hex(s"leaf${salt}_$i"))
      val leaves = hashes.zipWithIndex
        .map { case (h, i) => ("k", i.toLong, h) }.toDF("k", "pos", "h")
      val atMin = Merkle.rootPerKey(leaves, "k", "pos", "h",
        Merkle.depthFor(n)).as[(String, String)].head()._2
      val padded = Merkle.rootPerKey(leaves, "k", "pos", "h",
        Merkle.depthFor(n) + 3).as[(String, String)].head()._2
      val ref = Merkle.referenceRoot(hashes)
      val tampered = Merkle.referenceRoot(
        hashes.updated(n / 2, md5hex(s"tampered$salt")))
      atMin == ref && padded == ref && tampered != ref
    }
}
