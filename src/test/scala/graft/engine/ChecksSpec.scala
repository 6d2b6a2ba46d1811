package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The validation gate must COUNT what it claims: planted nulls, dups,
  * out-of-range values, and FK orphans each surface with their exact
  * violation count, and clean constraints report passed. */
class ChecksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val parent = Seq(1L, 2L, 3L).toDF("pk")
  private lazy val child = Seq(
    (Some(1L), 10.0), (Some(2L), 999.0), (Some(9L), 20.0), // 9 → orphan
    (None, 30.0),                                          // null FK: exempt
    (Some(1L), -5.0)                                       // range violation
  ).toDF("fk", "v")

  test("fused: predicates and uniqueness count exact planted violations") {
    val df = Seq((Some(1L), 5.0), (Some(1L), 6.0), (Some(2L), 700.0), (None, 8.0))
      .toDF("k", "v")
    val out = Checks.fused(df,
        predicates = Seq(
          "k_notnull" -> col("k").isNull,
          "v_range" -> !col("v").between(0.0, 100.0)),
        uniqueKeys = Seq("k_unique" -> Seq("k")))
      .as[(String, Long)].collect().toMap
    assert(out("k_notnull") == 1)
    assert(out("v_range") == 1)
    // 4 rows, distinct non-null keys {1, 2} → 4 − 2 = 2 (the null row counts
    // against uniqueness the same way SQL COUNT(DISTINCT) would)
    assert(out("k_unique") == 2)
  }

  test("foreignKey: orphans counted, null child keys exempt") {
    val out = Checks.foreignKey("fk", child, "fk", parent, "pk")
      .as[(String, Long)].head()
    assert(out == ("fk", 1L)) // only fk=9; the null row is exempt
  }

  test("report: passed flag and name ordering") {
    val rep = Checks.report(Seq(
        Checks.foreignKey("b_fk", child, "fk", parent, "pk"),
        Checks.fused(child, predicates = Seq(
          "a_range" -> !col("v").between(0.0, 100.0)))))
      .as[(String, Long, Int)].collect().toSeq
    assert(rep == Seq(("a_range", 2L, 0), ("b_fk", 1L, 0)))
  }
}
