package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-13 semantic checks — chiefly the THREE-wave incremental-curation
  * drill: the declared q_curation_incremental proves append(w2)∘build(w1)
  * == rebuild; this spec extends the proof to a chained
  * append(w3)∘append(w2)∘build(w1) with an EMPTY middle wave, pinning
  * associativity of the mergeable rare-gram index (sum/min/max sufficient
  * stats) and that absorbing a wave into state is a no-op when the wave is
  * empty. No new declared query, no bench cost.
  */
class Round13QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private lazy val docs = new graft.engine.Catalog(spark, sf).documents

  private def reportRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getString(4))).toSeq

  test("three waves with an empty middle: append(w3)∘append(∅)∘build(w1) == rebuild") {
    val pool = docs.filter(col("source") =!= "src0")
    val mid = {
      val r = pool.agg(min("doc_id"), max("doc_id")).head()
      (r.getLong(0) + r.getLong(1)) / 2
    }
    val state1 = graft.llm.Curation.buildState(
      pool.filter(col("doc_id") <= mid)
        .unionByName(docs.filter(col("source") === "src0")))
    // Empty middle wave: a daily refresh with no new documents must leave
    // the state semantically untouched (same schema, same verdicts).
    val stateMid = graft.llm.Curation.appendState(
      state1, pool.filter(lit(false)))
    assert(stateMid.docs.columns.sorted === state1.docs.columns.sorted)
    assert(stateMid.docs.count() === state1.docs.count())
    assert(stateMid.grams.count() === state1.grams.count())
    val (staged, maxN) = graft.llm.Curation.appendWave(
      stateMid, pool.filter(col("doc_id") > mid))
    val full = reportRows(SparkEntry.queries("q_curation_pipeline")(spark, sf))
    val chained = reportRows(graft.llm.Curation.reportForTest(staged, maxN))
    assert(chained === full)
  }

  test("three non-trivial waves chain: append(w3)∘append(w2)∘build(w1) == rebuild") {
    // Thirds by id — each boundary cuts through live near-dup gram pairs,
    // so the middle append genuinely merges and the final append both
    // destroys (nd 2→3+) and completes (nd 1→2) rare-gram edges across all
    // three waves. Roots included: the report compare is bit-exact.
    val pool = docs.filter(col("source") =!= "src0")
    val cuts = pool.stat.approxQuantile(
      "doc_id", Array(1.0 / 3, 2.0 / 3), 0.0).map(_.toLong)
    val state1 = graft.llm.Curation.buildState(
      pool.filter(col("doc_id") <= cuts(0))
        .unionByName(docs.filter(col("source") === "src0")))
    val state2 = graft.llm.Curation.appendState(
      state1, pool.filter(col("doc_id") > cuts(0) && col("doc_id") <= cuts(1)))
    val (staged, maxN) = graft.llm.Curation.appendWave(
      state2, pool.filter(col("doc_id") > cuts(1)))
    val full = reportRows(SparkEntry.queries("q_curation_pipeline")(spark, sf))
    val chained = reportRows(graft.llm.Curation.reportForTest(staged, maxN))
    assert(chained === full)
  }
}
