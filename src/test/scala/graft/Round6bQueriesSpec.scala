package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-6b curation-accounting queries (first-seen
  * novelty, temperature mixing, rare-token density, repeated-window
  * inflation) — brute-force references over collected rows, independent of
  * the distributed formulations. */
class Round6bQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val docs: Array[(Long, String, String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source").as[(Long, String, String)].collect()

  private def shingles(text: String, k: Int): Seq[String] = {
    val ws = text.split(" ", -1)
    if (ws.length < k) Nil
    else (0 to ws.length - k).map(i => ws.slice(i, i + k).mkString(" "))
  }

  test("ngram_novelty: first-owner fractions match sequential counting") {
    val perDoc = docs.map { case (id, t, _) => id -> shingles(t, 5).distinct }
      .filter(_._2.nonEmpty)
    val firstOwner = perDoc.flatMap { case (id, sh) => sh.map(_ -> id) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).min }
    val expected = perDoc.map { case (id, sh) =>
      val novel = sh.count(s => firstOwner(s) == id)
      (id, sh.size.toLong, novel.toLong,
        BigDecimal(novel.toDouble / sh.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = SparkEntry.queries("q_ngram_novelty")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == expected)
    // doc 0 has no earlier docs: everything it says is novel.
    assert(got.find(_._1 == 0L).forall(r => r._4 == 1.0))
  }

  test("mix_temperature: sqrt weighting boosts small sources, shares sum to ~1") {
    val rows = SparkEntry.queries("q_mix_temperature")(spark, sf)
      .as[(String, Long, Long, Double, Double, Double)].collect()
    assert(rows.map(_._1).sorted.sameElements(rows.map(_._1)))
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-4)
    // sqrt flattens the distribution: the largest source is downweighted,
    // the smallest upweighted (strictly, when token counts differ).
    val byTok = rows.sortBy(_._3)
    if (byTok.head._3 < byTok.last._3) {
      assert(byTok.head._6 > 1.0, "smallest source must be boosted")
      assert(byTok.last._6 < 1.0, "largest source must be shrunk")
    }
    // Spot-check one source against direct arithmetic.
    val tokOf = docs.groupBy(_._3).map { case (s, xs) =>
      s -> xs.map(_._2.split(" ", -1).length.toLong).sum }
    val r = tokOf.map { case (s, t) =>
      s -> BigDecimal(math.sqrt(t.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP) }
    val totR = r.values.sum
    val one = rows.head
    val want = BigDecimal(r(one._1).toDouble / totR.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(one._5 == want)
  }

  test("rare_token_docs: densities match a brute-force bottom-10 vocab") {
    val counts = docs.flatMap(_._2.split(" ", -1)).groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }
    val rare = counts.toSeq.sortBy { case (t, n) => (n, t) }.take(10)
      .map(_._1).toSet
    val expected = docs.map { case (id, t, _) =>
      val ws = t.split(" ", -1)
      val nr = ws.count(rare)
      (id, ws.length.toLong, nr.toLong,
        BigDecimal(nr.toDouble / ws.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, _, _, d) => (-d, id) }.take(20).toSeq
    val got = SparkEntry.queries("q_rare_token_docs")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == expected)
  }

  test("dup_inflation: window repeat counts match sequential accounting") {
    val expected = docs.groupBy(_._3).map { case (src, xs) =>
      val wins = xs.toSeq.flatMap { case (_, t, _) => shingles(t, 8) }
      val dup = wins.size - wins.distinct.size
      (src, wins.size.toLong, wins.distinct.size.toLong, dup.toLong,
        BigDecimal(dup.toDouble / wins.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = SparkEntry.queries("q_dup_inflation")(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(got == expected)
    // Word-soup corpora repeat 8-grams across docs; the signal is non-trivial.
    assert(got.exists(_._4 > 0))
  }
}
