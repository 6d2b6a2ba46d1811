package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic checks for the round-11 additions — chiefly the incremental
  * curation drill: the append path must reproduce the full rebuild
  * bit-for-bit (stage counts AND Merkle roots), from state that carries
  * no wave-1 text, and the drill must also hold on a non-midpoint split
  * (the oracle only ever sees the midpoint one).
  */
class Round11QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private lazy val docs = new graft.engine.Catalog(spark, sf).documents

  private def reportRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getString(4))).toSeq

  test("q_curation_incremental == q_curation_pipeline, roots included") {
    val full = reportRows(SparkEntry.queries("q_curation_pipeline")(spark, sf))
    val inc  = reportRows(SparkEntry.queries("q_curation_incremental")(spark, sf))
    assert(inc === full)
  }

  test("incremental state is text-free (the no-rescan contract in data form)") {
    val pool = docs.filter(col("source") =!= "src0")
    val mid = {
      val r = pool.agg(min("doc_id"), max("doc_id")).head()
      (r.getLong(0) + r.getLong(1)) / 2
    }
    val state = graft.llm.Curation.buildState(
      pool.filter(col("doc_id") <= mid)
        .unionByName(docs.filter(col("source") === "src0")))
    assert(!state.docs.columns.contains("text"),
      state.docs.columns.mkString(","))
    // the gram index carries sufficient stats, not text or edges
    assert(state.grams.columns.sorted === Array("gram", "mn", "mx", "nd"))
  }

  test("append∘build == rebuild on a skewed (non-midpoint) split too") {
    // A 90/10 split exercises different merge cases in the gram index
    // (most nd=2 grams settled in wave 1; wave 2 mainly destroys/creates
    // at the margin) — the drill must be split-invariant.
    val pool = docs.filter(col("source") =!= "src0")
    val cut = pool.stat.approxQuantile("doc_id", Array(0.9), 0.0)(0).toLong
    val state = graft.llm.Curation.buildState(
      pool.filter(col("doc_id") <= cut)
        .unionByName(docs.filter(col("source") === "src0")))
    val (staged, maxN) = graft.llm.Curation.appendWave(
      state, pool.filter(col("doc_id") > cut))
    val full = reportRows(SparkEntry.queries("q_curation_pipeline")(spark, sf))
    val viaState = reportRows(graft.llm.Curation.reportForTest(staged, maxN))
    assert(viaState === full)
  }

  test("q_span_tiers: excision is width-monotone and consistent with the 8-token removal") {
    // Every position covered by a duplicated w2-span is covered by one of
    // its w1-subspans (w1 < w2), and a non-owner at w2 is a non-owner at
    // w1 (the subspan's doc set is a superset, so its min can only be
    // smaller) — hence removed_tokens must be non-increasing in width.
    val rows = SparkEntry.queries("q_span_tiers")(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(5)))
    rows.groupBy(_._1).foreach { case (src, ts) =>
      val byW = ts.map(t => t._2 -> t._4).toMap
      assert(byW(8) >= byW(16) && byW(16) >= byW(32),
        s"$src: removal not width-monotone: $byW")
      val spans = ts.map(t => t._2 -> t._3).toMap
      assert(spans(8) >= spans(16) && spans(16) >= spans(32),
        s"$src: span counts not width-monotone: $spans")
    }
    // tier-8 removal totals must equal the q_dup_span_removal transform
    val removal = graft.llm.Dedup.removeDupSpans(docs)
      .agg(sum(col("n_before") - col("n_after"))).head().getLong(0)
    assert(rows.filter(_._2 == 8).map(_._4).sum === removal)
  }

  test("an empty append wave reproduces the wave-1-only build") {
    val pool = docs.filter(col("source") =!= "src0")
    val state = graft.llm.Curation.buildState(
      pool.unionByName(docs.filter(col("source") === "src0")))
    val (staged, maxN) = graft.llm.Curation.appendWave(
      state, pool.filter(lit(false)))
    val full = reportRows(SparkEntry.queries("q_curation_pipeline")(spark, sf))
    assert(reportRows(graft.llm.Curation.reportForTest(staged, maxN)) === full)
  }
}
