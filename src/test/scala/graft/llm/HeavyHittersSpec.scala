package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Misra-Gries candidates + exact recount: the superset guarantee, exact
  * parity with GROUP BY/HAVING, and the merge bound under partial
  * aggregation. */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("MG summary retains every item above the n/(k+1) guarantee") {
    val mg = new HeavyHitters.MisraGries(4)
    // 100 "hot" + 60 singletons: hot has f=100 > 160/5=32 — must survive
    // any fold order; singleton noise decrements it at most n/(k+1) times.
    val items = (Seq.fill(100)("hot") ++ (1 to 60).map(i => s"u$i"))
    val shuffled = new scala.util.Random(7).shuffle(items)
    val summary = shuffled.foldLeft(mg.zero)(mg.reduce)
    assert(summary.contains("hot"), s"guaranteed item evicted: $summary")
    assert(summary.size <= 4)
  }

  test("merge respects the k bound and keeps dominant items") {
    val mg = new HeavyHitters.MisraGries(3)
    val a = scala.collection.mutable.HashMap("x" -> 50L, "y" -> 3L, "z" -> 2L)
    val b = scala.collection.mutable.HashMap("x" -> 40L, "w" -> 4L, "v" -> 1L)
    val m = mg.merge(a, b)
    assert(m.size <= 3)
    assert(m.contains("x") && m("x") <= 90L) // undercount only, never over
  }

  test("heavyHitters == exact GROUP BY/HAVING over skewed data") {
    // zipf-ish: item i appears ~1500/i times; support 20 → threshold n/20
    val rows = (1 to 50).flatMap(i => Seq.fill(1500 / i)(s"item$i"))
    val df = new scala.util.Random(11).shuffle(rows).toDF("tok").repartition(8)
    val n = rows.size.toLong
    val expected = df.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > n / 20)
      .orderBy(col("cnt").desc, col("tok"))
      .as[(String, Long)].collect().toSeq
    val got = HeavyHitters.heavyHitters(df, col("tok"), support = 20)
      .as[(String, Long)].collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty) // the skew actually produces hitters
  }

  test("width below support is rejected (guarantee would not hold)") {
    val df = Seq("a", "b").toDF("tok")
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(df, col("tok"), support = 10, k = 4)
    }
  }
}
