package graft.llm

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.TestSpark

/** Round-14 stretch (r13 verdict #8): the three-wave spec pins one chain
  * shape; this property pins COMMUTATIVE ROBUSTNESS of the mergeable
  * rare-gram index over RANDOM id-partitioned wave splits — for any cut
  * layout (2–4 waves, arbitrary fraction boundaries, empty waves allowed),
  * append(wN)∘…∘append(w2)∘build(w1) must reproduce the one-shot rebuild's
  * curation report bit-exactly. Sample count is small (each check runs the
  * full incremental pipeline), but the cut positions — the only structural
  * degree of freedom — are the randomized part. */
object CurationProps extends Properties("graft.llm.curation") {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = new graft.engine.Catalog(spark, sf).documents
  private lazy val pool = docs.filter(col("source") =!= "src0")
  private lazy val (idLo, idHi) = {
    val r = pool.agg(min("doc_id"), max("doc_id")).head()
    (r.getLong(0), r.getLong(1))
  }
  private lazy val fullReport = reportRows(
    graft.SparkEntry.queries("q_curation_pipeline")(spark, sf))

  private def reportRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getString(4))).toSeq

  // 1–3 cut fractions anywhere in (0,1) — unsorted on purpose; sorting is
  // part of turning them into id boundaries. Duplicate/extreme fractions
  // produce EMPTY middle waves, which the append path must no-op through.
  private val cutsGen: Gen[List[Double]] =
    Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0.0, 1.0)))

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  property("append-chain over any id-partitioned wave split == one-shot rebuild") =
    Prop.forAllNoShrink(cutsGen) { fracs =>
      val bounds = fracs.sorted
        .map(f => idLo + ((idHi - idLo) * f).toLong)
      // wave i = (bounds(i-1), bounds(i)]; first wave carries the src0
      // baseline like the declared incremental query does
      val lows = Long.MinValue +: bounds
      val highs = bounds :+ Long.MaxValue
      val waves = lows.zip(highs).map { case (lo, hi) =>
        pool.filter(col("doc_id") > lo && col("doc_id") <= hi)
      }
      val state1 = Curation.buildState(
        waves.head.unionByName(docs.filter(col("source") === "src0")))
      val stateMid = waves.tail.init.foldLeft(state1)(Curation.appendState)
      val (staged, maxN) = Curation.appendWave(stateMid, waves.last)
      val chained = reportRows(Curation.reportForTest(staged, maxN))
      if (chained != fullReport)
        println(s"CurationProps MISMATCH at cuts $bounds: " +
          s"chained ${chained.size} rows vs rebuild ${fullReport.size}")
      chained == fullReport
    }
}
