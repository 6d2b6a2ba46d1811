package graft.llm

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the round-7 classifier/similarity math that is
  * pure driver-side arithmetic: the LSH parameter solver's recall and
  * candidate-budget guarantees, and the HashedTf kernel's conservation and
  * locality laws. Pure functions — no Spark session needed. */
object ClassifyProps extends Properties("graft.llm.classify") {

  private val nGen: Gen[Long] = Gen.chooseNum(100L, 100000000L)
  private val thrGen: Gen[Double] = Gen.chooseNum(0.85, 0.99)

  // NoShrink: scalacheck shrinks failing doubles toward 0.0, outside the
  // generator's domain (thresholds below ~0.8 legitimately have no params
  // within budget — that regime is cosineAllPairs' by design).
  property("lshParamsFor: solved params meet the recall floor and candidate budget") =
    Prop.forAllNoShrink(nGen, thrGen) { (n, s) =>
      val (b, r) = Similarity.lshParamsFor(n, s)
      val p = 1.0 - math.acos(s) / math.Pi
      val recall = 1.0 - math.pow(1.0 - math.pow(p, r), b)
      val expectedCandidates = n.toDouble / 2.0 * b * math.pow(2.0, -r)
      recall >= 0.95 && expectedCandidates <= 4.0
    }

  property("lshParamsFor: planes grow monotonically with corpus size (same threshold)") =
    Prop.forAllNoShrink(thrGen) { s =>
      val rs = Seq(1000L, 100000L, 10000000L)
        .map(n => Similarity.lshParamsFor(n, s)._2)
      rs == rs.sorted
    }

  private val tokGen: Gen[String] = Gen.oneOf(
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "spark")
  private val textGen: Gen[String] =
    Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, tokGen)).map(_.mkString(" "))
  private val dimsGen: Gen[Int] = Gen.oneOf(1, 2, 16, 64)

  property("hashedTf: counts conserve the token count, all components >= 0") =
    Prop.forAll(textGen, dimsGen) { (text, dims) =>
      val v = graft.functions.HashedTf.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), dims)
      val nTokens = text.split(" ", -1).length
      v.length == dims && v.sum == nTokens.toDouble && v.forall(_ >= 0.0)
    }

  property("hashedTf: token order never changes the vector (bag semantics)") =
    Prop.forAll(Gen.chooseNum(2, 20).flatMap(n => Gen.listOfN(n, tokGen)), dimsGen) {
      (toks, dims) =>
        def tf(ws: Seq[String]) = graft.functions.HashedTf.compute(
          org.apache.spark.unsafe.types.UTF8String.fromString(ws.mkString(" ")), dims).toSeq
        tf(toks) == tf(toks.reverse)
    }

  property("hashedTf: appending one token changes exactly one component by +1") =
    Prop.forAll(textGen, tokGen, dimsGen) { (text, extra, dims) =>
      def tf(s: String) = graft.functions.HashedTf.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), dims)
      val before = tf(text)
      val after = tf(s"$text $extra")
      val deltas = before.indices.map(i => after(i) - before(i))
      deltas.count(_ == 1.0) == 1 && deltas.count(_ == 0.0) == dims - 1
    }
}
