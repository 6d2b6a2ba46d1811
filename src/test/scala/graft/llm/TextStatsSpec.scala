package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Text analysis (SURVEY.md §2.12 Y4): token counting, quality scoring,
  * language ID, winnowing fingerprints. */
class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("text")

  test("tokenCount splits on whitespace runs") {
    val df = one("the quick  brown\tfox")
    assert(df.select(TextStats.tokenCount(col("text"))).as[Int].head() == 4)
  }

  test("subwordCount splits digit/letter boundaries and punctuation") {
    val df = one("abc123 def")
    assert(df.select(TextStats.subwordCount(col("text"))).as[Int].head() == 3)
  }

  test("repetitionSignals: planted repetition patterns count exactly") {
    def sig(text: String): (Long, Long, Long, Long, Long, Long) = {
      val r = one(text)
        .select(TextStats.repetitionSignals(col("text")).as("s"))
        .select("s.*").as[(Long, Long, Long, Long, Long, Long)].head()
      r
    }
    // "a a a a a": 4 immediate repeats; all 4 2-grams and all 3 3-grams
    // are the same gram, so every position is duplicated
    assert(sig("a a a a a") === ((5L, 4L, 4L, 4L, 3L, 3L)))
    // all-distinct text: nothing repeats at any granularity
    assert(sig("x y z w") === ((4L, 0L, 0L, 3L, 0L, 2L)))
    // alternation: no immediate repeats, but every 2-gram repeats and
    // "a b a" occurs twice among the three 3-grams
    assert(sig("a b a b a") === ((5L, 0L, 4L, 4L, 2L, 3L)))
    // shorter than the gram: the whole text is the single (singleton) gram
    assert(sig("solo") === ((1L, 0L, 0L, 1L, 0L, 1L)))
  }

  test("stopwordCount counts only profile hits") {
    val df = one("the cat and the dog of nowhere")
    // hits: the, and, the, of = 4
    assert(df.select(TextStats.stopwordCount(col("text"))).as[Int].head() == 4)
  }

  test("punctCount") {
    assert(one("a, b. c!").select(TextStats.punctCount(col("text"))).as[Int].head() == 3)
    assert(one("no punct here").select(TextStats.punctCount(col("text"))).as[Int].head() == 0)
  }

  test("qualityScore is bounded in [0,1]; natural text beats punctuation soup") {
    val texts = Seq(
      "the cat sat on the mat and the dog slept in the sun for a while with a toy",
      "@@@ ### !!! $$$ %%% ^^^ &&& *** ((( )))",
      "x")
    val scores = texts.map(t =>
      one(t).select(TextStats.qualityScore(col("text"))).as[Double].head())
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1))
    assert(scores(0) > scores(2)) // length saturation penalizes one-token docs
  }

  test("langId picks the matching stopword profile; und when nothing matches") {
    val cases = Seq(
      "the cat is in the house and it is warm" -> "en",
      "el perro y la casa de un amigo en la ciudad" -> "es",
      "le chat et le chien de la maison en ville" -> "fr",
      "der Hund und die Katze von dem Haus mit der Tür" -> "de",
      "zz9 qqq7 xx3" -> "und")
    for ((text, expected) <- cases)
      assert(one(text).select(TextStats.langId(col("text"))).as[String].head() == expected,
        s"text: $text")
  }

  test("fingerprint: deterministic, sorted, identical texts agree, near-dups overlap") {
    val t1 = "the quick brown fox jumps over the lazy dog near the old barn door today"
    val t2 = t1.replace("old", "new")
    val df = Seq((1L, t1), (2L, t1), (3L, t2)).toDF("id", "text")
    val fps = df.select($"id", TextStats.fingerprint(col("text")).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) == fps(1L).sorted)
    val overlap = fps(1L).toSet.intersect(fps(3L).toSet).size.toDouble /
      fps(1L).toSet.union(fps(3L).toSet).size
    assert(overlap > 0.3, s"near-dup fingerprint overlap too low: $overlap")
  }

  test("corpusStats aggregates per group with deterministic ordering") {
    val df = Seq(("en", "a b c"), ("en", "d e"), ("fr", "x y z w")).toDF("lang", "text")
    val rows = TextStats.corpusStats(df, "text", Seq("lang")).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("en", "fr"))
    val en = rows(0)
    assert(en.getLong(1) == 2L)        // docs
    assert(en.getLong(4) == 5L)        // tokens: 5 (3 + 2)
  }

  test("tfIdf matches hand-computed tf * ln(N/df)") {
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "c c d")).toDF("doc_id", "text")
    val rows = TextStats.tfIdf(docs, "doc_id", "text")
      .select("doc_id", "token", "tf", "df", "score")
      .as[(Long, String, Long, Long, Double)].collect()
      .map { case (id, tok, tf, df, s) => (id, tok) -> ((tf, df, s)) }.toMap
    def exp(tf: Long, df: Long) =
      BigDecimal(tf * math.log(3.0 / df)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows((1L, "a")) == ((2L, 1L, exp(2, 1))))
    assert(rows((1L, "b")) == ((1L, 2L, exp(1, 2))))
    assert(rows((2L, "c")) == ((1L, 2L, exp(1, 2))))
    assert(rows((3L, "c")) == ((2L, 2L, exp(2, 2))))
    assert(rows((3L, "d")) == ((1L, 1L, exp(1, 1))))
    assert(rows.size == 6)
  }
}
