package graft.llm

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import graft.TestSpark

/** ScalaCheck properties for the similarity kernels added late in round 5:
  * Broder containment bounds and subset law, and the sum-vector diversity
  * identity against brute-force mean pairwise dot on arbitrary vector sets. */
object DedupProps extends Properties("graft.llm.dedup") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val word: Gen[String] = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
  private val textGen: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  // the prefix law needs real trigrams on the contained side — under 3
  // tokens the kernel clamps to a single whole-text gram, which a longer
  // host text can never contain
  private val text3Gen: Gen[String] =
    Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  property("containment in [0,1]; full containment when A (>=3 tokens) is a prefix of B") =
    Prop.forAllNoShrink(text3Gen, textGen) { (a, extra) =>
      val b = s"$a $extra"
      val pairs = Seq((a, b)).toDF("ta", "tb")
      val (ab, ba) = pairs.select(
          Dedup.ngramContainment(pairs, col("ta"), col("tb")).as("ab"),
          Dedup.ngramContainment(pairs, col("tb"), col("ta")).as("ba"))
        .as[(Double, Double)].head()
      // every n-gram of a prefix is an n-gram of the longer text
      ab == 1.0 && ba >= 0.0 && ba <= 1.0
    }

  property("containment(a,a) == 1 and jaccard <= min(containments)") =
    Prop.forAll(textGen, textGen) { (a, b) =>
      val pairs = Seq((a, b)).toDF("ta", "tb")
      val (ab, ba, j, self) = pairs.select(
          Dedup.ngramContainment(pairs, col("ta"), col("tb")).as("ab"),
          Dedup.ngramContainment(pairs, col("tb"), col("ta")).as("ba"),
          Dedup.ngramJaccard(pairs, col("ta"), col("tb")).as("j"),
          Dedup.ngramContainment(pairs, col("ta"), col("ta")).as("self"))
        .as[(Double, Double, Double, Double)].head()
      // |A∩B|/|A∪B| <= |A∩B|/max(|A|,|B|) = min of the two containments;
      // rounding to 4dp can perturb by at most 1e-4 on each side
      self == 1.0 && j <= math.min(ab, ba) + 2e-4
    }

  private val vecsGen: Gen[List[List[Double]]] =
    Gen.chooseNum(2, 8).flatMap { n =>
      Gen.listOfN(n, Gen.listOfN(4, Gen.chooseNum(-4, 4).map(_.toDouble)))
    }

  property("sum-vector identity == brute-force mean pairwise dot") =
    Prop.forAll(vecsGen) { vecs =>
      // identical shape to q_embed_diversity, single label
      val df = vecs.zipWithIndex.map { case (v, i) => (0, i.toLong, v) }
        .toDF("label", "vec_id", "embedding")
      val terms = df.select(col("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("d", "x")))
      val perDim = terms.groupBy("label", "d")
        .agg(sum(col("x").cast("decimal(28,12)")).as("sd"),
          sum((col("x") * col("x")).cast("decimal(28,12)")).as("sq"),
          count(lit(1)).as("nd"))
      val got = perDim.groupBy("label")
        .agg(sum(col("sd").cast("double") * col("sd").cast("double")).as("ssq"),
          sum(col("sq")).as("nsum"), max(col("nd")).as("n"))
        .select((col("ssq") - col("nsum").cast("double")) /
          (col("n") * (col("n") - lit(1.0))))
        .as[Double].head()
      val n = vecs.size
      var tot = 0.0
      for (i <- vecs.indices; j <- (i + 1) until n)
        tot += vecs(i).zip(vecs(j)).map { case (x, y) => x * y }.sum
      val brute = 2.0 * tot / (n.toDouble * (n - 1))
      math.abs(got - brute) < 1e-9
    }
}
