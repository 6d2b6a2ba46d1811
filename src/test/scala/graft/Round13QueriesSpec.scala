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

  test("packed trigram codes == explode+substring, including non-ASCII and ordering") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Mixed-width UTF-8 (1..3-byte code points) exercises the decoder; the
    // packed longs must reproduce substring(text, pos, 3) at every position
    // AND sort exactly like the strings (UTF-8 byte order == code-point
    // order == packed numeric order) — that's what keeps q_char_ngrams'
    // ORDER BY tie-break stable after the kernel swap.
    val texts = Seq("the quick brown fox", "ab", "", "aaaa",
      "héllo wörld", "データ処理エンジン", "mixédデータ y más")
    val df = texts.toDF("text")
    val viaKernel = df
      .select(col("text"),
        posexplode(graft.functions.TrigramKernels.charTrigramCodes(col("text")))
          .as(Seq("i", "gc")))
      .select(col("text"), col("i"),
        graft.functions.TrigramKernels.trigramFromCode(col("gc")).as("g"),
        col("gc"))
    val viaSubstring = df
      .filter(length(col("text")) >= 3)
      .select(col("text"), explode(expr("sequence(1, length(text) - 2)")).as("pos"))
      .select(col("text"), (col("pos") - 1).as("i"), expr("substring(text, pos, 3)").as("g"))
    val k = viaKernel.select("text", "i", "g").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).sortBy(t => (t._1, t._2))
    val s = viaSubstring.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).sortBy(t => (t._1, t._2))
    assert(k.toSeq === s.toSeq)
    // order-preservation: numeric order of codes == string order of grams
    val pairs = viaKernel.select("g", "gc").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(pairs.sortBy(_._1).map(_._2).toSeq === pairs.sortBy(_._2).map(_._2).toSeq)
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
