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

  test("HLL per-group sketches union to a global estimate within 5% of exact") {
    val est = cat.lineitem
      .groupBy("l_returnflag")
      .agg(expr("hll_sketch_agg(l_partkey)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .head().getLong(0)
    val exact = cat.lineitem.select(countDistinct(col("l_partkey"))).head().getLong(0)
    assert(math.abs(est - exact) <= math.max(1L, exact / 20),
      s"HLL estimate $est too far from exact $exact")
  }

  test("theta difference estimate tracks the exact EXCEPT count") {
    val a = cat.part.agg(expr("theta_sketch_agg(p_partkey)").as("ska"))
    val b = cat.lineitem.agg(expr("theta_sketch_agg(l_partkey)").as("skb"))
    val est = a.crossJoin(b)
      .select(expr("theta_sketch_estimate(theta_difference(ska, skb))").as("e"))
      .head().getLong(0)
    val exact = cat.part.select(col("p_partkey").as("k"))
      .except(cat.lineitem.select(col("l_partkey").as("k"))).count()
    assert(math.abs(est - exact) <= math.max(2L, exact / 10),
      s"theta difference estimate $est too far from exact $exact")
  }
}
