package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Sketch-tier semantics: the estimates the rows-only queries return must
  * track their exact counterparts. HLL/theta registers merge by max, so the
  * estimates are partitioning-independent — error, not nondeterminism, is
  * the thing to bound. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val cat = new Catalog(spark, "/root/testdata/sf0.001")

  // These two queries are rows-only (no DuckDB oracle) — this spec is their
  // correctness bound, so it runs the DECLARED queries, not a copy of them.
  private val sfDir = "/root/testdata/sf0.001"

  test("q_hll_sketch: sketches union to a global estimate within 5% of exact") {
    val est = graft.SparkEntry.queries("q_hll_sketch")(spark, sfDir)
      .head().getLong(0)
    val exact = cat.lineitem.select(countDistinct(col("l_partkey"))).head().getLong(0)
    assert(math.abs(est - exact) <= math.max(1L, exact / 20),
      s"HLL estimate $est too far from exact $exact")
  }

  test("q_theta_sketch: difference estimate tracks the exact EXCEPT count") {
    val est = graft.SparkEntry.queries("q_theta_sketch")(spark, sfDir)
      .head().getLong(0)
    val exact = cat.part.select(col("p_partkey").as("k"))
      .except(cat.lineitem.select(col("l_partkey").as("k"))).count()
    assert(math.abs(est - exact) <= math.max(2L, exact / 10),
      s"theta difference estimate $est too far from exact $exact")
  }
}
