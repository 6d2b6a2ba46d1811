package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Jaro(-Winkler) kernel: textbook values (the same cases DuckDB's
  * jaro_similarity / jaro_winkler_similarity return, verified manually — the
  * oracle for q_jaro_winkler), plus the interpreted/codegen agreement every
  * kernel carries. */
class StringKernelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val eps = 1e-12

  private def jw(a: String, b: String): Double = JaroWinkler.compute(a, b, winkler = true)
  private def j(a: String, b: String): Double = JaroWinkler.compute(a, b, winkler = false)

  test("classic textbook pairs match the published values") {
    assert(math.abs(j("MARTHA", "MARHTA") - 0.9444444444444445) < eps)
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < eps)
    assert(math.abs(j("DIXON", "DICKSONX") - 0.7666666666666666) < eps)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-10)
    assert(math.abs(j("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < eps)
    assert(math.abs(j("CRATE", "TRACE") - 0.7333333333333334) < eps)
    assert(math.abs(j("arnab", "aranb") - 0.9333333333333332) < 1e-10)
    assert(math.abs(jw("arnab", "aranb") - 0.9466666666666665) < 1e-10)
  }

  test("edge cases: identity, empties, no matches, boost rules") {
    assert(j("abc", "abc") == 1.0)
    assert(j("", "abc") == 0.0)
    assert(j("abc", "") == 0.0)
    assert(j("a", "b") == 0.0)
    // Window 0 for 2-char strings: transposed pair has NO matches.
    assert(j("ab", "ba") == 0.0)
    // Winkler boost NOT applied at/below jaro 0.7 despite a common prefix.
    assert(math.abs(j("abcdef", "abwxyz") - jw("abcdef", "abwxyz")) < eps)
    assert(math.abs(j("abcdef", "abwxyz") - 0.5555555555555555) < eps)
    // Prefix boost capped at 4 chars.
    assert(math.abs(jw("aaaaaaaaaab", "aaaaaaaaaac") - 0.9636363636363636) < eps)
  }

  test("codegen and interpreted paths agree on random strings") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefgh"
    def rs() = Seq.fill(rnd.nextInt(12))(alpha(rnd.nextInt(alpha.length))).mkString
    val rows = Seq.fill(300)((rs(), rs()))
    val df = rows.toDF("a", "b")
      .withColumn("jw", StringKernels.jaroWinkler(col("a"), col("b")))
      .withColumn("jj", StringKernels.jaro(col("a"), col("b")))
    // Force both paths: collect (codegen'd projection) vs driver-side compute.
    val got = df.collect()
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(r.getDouble(2) == JaroWinkler.compute(a, b, winkler = true), s"jw($a,$b)")
      assert(r.getDouble(3) == JaroWinkler.compute(a, b, winkler = false), s"j($a,$b)")
    }
  }

  test("similarity is symmetric and bounded") {
    val rnd = new scala.util.Random(13)
    val words = Seq("street", "strete", "avenue", "avneue", "main", "maine", "oak", "")
    for (a <- words; b <- words) {
      val v = jw(a, b)
      assert(v >= 0.0 && v <= 1.0)
      assert(math.abs(v - jw(b, a)) < eps, s"asym $a/$b")
    }
  }
}
