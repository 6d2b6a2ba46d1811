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

  test("q_ams_f2: median-of-means estimate lands within 35% of the exact self-join size") {
    // 64 rows / median of 16 means-of-4 puts the realized error near 10% on
    // this corpus; 35% is the loose probabilistic ceiling so a testdata
    // regeneration can't turn the bound flaky. The estimator being unbiased
    // ACROSS types is the sharper check: the mean signed error must sit well
    // inside one standard error.
    val out = graft.SparkEntry.queries("q_ams_f2")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(out.length >= 3)
    out.foreach { r =>
      assert(r.getAs[Double]("rel_err") <= 0.35, s"$r")
    }
    val signed = out.map { r =>
      (r.getAs[Double]("est") - r.getAs[Long]("f2_exact")).toDouble /
        r.getAs[Long]("f2_exact")
    }
    assert(math.abs(signed.sum / signed.length) <= 0.25,
      s"systematic bias: ${signed.toSeq}")
  }

  test("ams sign hash: signs are balanced but not equidistributed on contiguous ids") {
    // the failure mode the cubic hash exists to avoid: over a contiguous id
    // block the sign SUM must fluctuate like a random walk (|sum| between
    // ~0 and ~3·sqrt(n)), not collapse to near-perfect cancellation for
    // every row the way lattice-structured affine hashes do
    val ids = (1L to 400L).toSeq
    val sums = (0 until 64).map { r =>
      ids.map { u =>
        // mirror of amsSignSql's cubic-mod-prime high-bit sign
        val P = 2147483647L
        def coef(i: Int): Long =
          (1103515245L * (2 * r + 1) * (i * i + 1) + 12345L * (r + 7) * (i + 3)) % P
        val x = u % P
        val h1 = (coef(3) * x + coef(2)) % P
        val h2 = (h1 * x + coef(1)) % P
        val h3 = (h2 * x + coef(0)) % P
        if (h3 * 2 < P) 1 else -1
      }.sum
    }
    val n = ids.length
    // every row balanced within 4 sigma
    sums.foreach(s => assert(math.abs(s) <= 4 * math.sqrt(n.toDouble), s"row sum $s"))
    // and the rows collectively fluctuate: mean |sum| of a +-1 random walk
    // is sqrt(2n/pi) ~ 16 here; lattice hashes measured ~1-2
    val meanAbs = sums.map(math.abs(_).toDouble).sum / sums.length
    assert(meanAbs >= 0.4 * math.sqrt(2 * n / math.Pi),
      s"signs too equidistributed (meanAbs=$meanAbs) — the affine-lattice failure")
  }

  test("q_theta_sketch: difference estimate tracks the exact EXCEPT count") {
    val est = graft.SparkEntry.queries("q_theta_sketch")(spark, sfDir)
      .head().getLong(0)
    val exact = cat.part.select(col("p_partkey").as("k"))
      .except(cat.lineitem.select(col("l_partkey").as("k"))).count()
    assert(math.abs(est - exact) <= math.max(2L, exact / 10),
      s"theta difference estimate $est too far from exact $exact")
  }

  test("q_approx_distinct: HLL++ estimate within 5% of the exact distinct count") {
    val est = graft.SparkEntry.queries("q_approx_distinct")(spark, sfDir)
      .head().getLong(0)
    val exact = cat.orders.select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(math.abs(est - exact) <= math.max(1L, exact / 20),
      s"approx distinct $est too far from exact $exact")
  }

  test("q_approx_percentile: KLL median within 1% of the exact median") {
    // accuracy=10000 bounds rank error at ~1/10000 of the row count, so on
    // any realistic corpus the sketch median sits within a hair of exact;
    // 1% relative keeps the bound robust to a testdata regeneration.
    val est = graft.SparkEntry.queries("q_approx_percentile")(spark, sfDir)
      .head().getDouble(0)
    val exact = cat.lineitem
      .agg(expr("percentile(l_extendedprice, 0.5)")).head().getDouble(0)
    assert(math.abs(est - exact) <= math.max(0.01, exact * 0.01),
      s"approx median $est too far from exact $exact")
  }
}
