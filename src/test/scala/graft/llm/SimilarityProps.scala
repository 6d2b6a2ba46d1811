package graft.llm

import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.TestSpark

/** ScalaCheck properties for the incremental-IVF primitive: the
  * Euclidean-argmin assignment (argmax of 2·u·c − ‖c‖², the classic
  * predict identity) [[Similarity.assignToCentroids]] uses must agree with
  * [[Similarity.ivfIndex]]'s own final-assignment rule ((u−c)² fold,
  * array_position-of-min) on the fitted centroids — the exact claim the
  * append path rests on. (NOT argmax cosine: centroids are means of unit
  * vectors, so their norms differ per cluster and the two rules diverge —
  * this property falsified the cosine formulation before the Euclidean
  * rule landed.) Random small vector sets, random k, every row checked.
  */
object SimilarityProps extends Properties("graft.llm.similarity") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Each case pays a full (if tiny) KMeans fit — several Spark jobs; 12
  // cases keep the property inside the suite's time budget while still
  // sweeping n/d/k shapes.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  // Non-degenerate random vectors in a small dim: values bounded away from
  // the zero vector so normalization is defined; duplicates allowed.
  private val vecsGen: Gen[(List[Array[Double]], Int)] = for {
    n <- Gen.chooseNum(6, 20)
    d <- Gen.chooseNum(2, 4)
    k <- Gen.chooseNum(2, 3)
    vs <- Gen.listOfN(n, Gen.listOfN(d,
      Gen.chooseNum(-5, 5).map(_.toDouble + 0.25)).map(_.toArray))
  } yield (vs, k)

  property("assignToCentroids == ivfIndex assignment on the fitted model") =
    Prop.forAll(vecsGen) { case (vs, k) =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
        .toDF("id", "vec")
      val (assigned, centers) =
        Similarity.ivfIndex(df, "vec", k, seed = 7L, idCol = "id")
      val expect = assigned.select("id", "ivf_cluster").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = Similarity.assignToCentroids(df, "vec",
          centers.toSeq.zipWithIndex.map { case (c, i) => (i, c.toSeq) })
        .select("id", "ivf_cluster").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      // Agreement is required except at ulp-level distance ties, where
      // both rules pick SOME nearest center — accept any center whose
      // squared Euclidean distance to the normalized row ties the winner.
      got.forall { case (id, c) =>
        if (expect(id) == c) true
        else {
          val v = vs(id.toInt)
          val n = math.sqrt(v.map(x => x * x).sum)
          val u = v.map(_ / n)
          def d2(ctr: Array[Double]): Double =
            u.zip(ctr).map { case (x, y) => (x - y) * (x - y) }.sum
          math.abs(d2(centers(c)) - d2(centers(expect(id)))) < 1e-9
        }
      }
    }
}
