package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-8j tier (classical statistical inference:
  * correlation matrix, chi-square independence, Welch's t, Mann–Whitney U).
  * Each test recomputes the statistic in plain Scala from raw parquet — an
  * independent code path from the raw-moment DataFrame plans — plus the
  * structural properties each test exists to provide (corr bounded in
  * [−1, 1] and symmetric in its inputs, chi2 non-negative with the right
  * dof, the U statistic consistent with its rank-sum identity).
  */
class Round8jQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def r(x: Double, d: Int): Double = {
    val m = math.pow(10, d); math.rint(x * m) / m
  }

  private lazy val purchases: Array[(Long, Double)] =
    new graft.engine.Catalog(spark, sf).events
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select("user_id", "value").collect()
      .map(x => (x.getLong(0), x.getDouble(1)))

  test("q_corr_matrix: pairwise Pearson matches a plain-Scala recompute") {
    val out = SparkEntry.queries("q_corr_matrix")(spark, sf).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getDouble(2)).toMap
    assert(out.size === 6) // C(4,2) pairs, upper triangle once each
    val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val rows = new graft.engine.Catalog(spark, sf).lineitem
      .select(cs.head, cs.tail: _*).collect()
      .map(x => cs.indices.map(i => x.getDouble(i)).toArray)
    val n = rows.length.toDouble
    def corr(i: Int, j: Int): Double = {
      val si = rows.map(_(i)).sum; val sj = rows.map(_(j)).sum
      val sij = rows.map(v => v(i) * v(j)).sum
      val sii = rows.map(v => v(i) * v(i)).sum
      val sjj = rows.map(v => v(j) * v(j)).sum
      (sij - si * sj / n) /
        (math.sqrt(sii - si * si / n) * math.sqrt(sjj - sj * sj / n))
    }
    for (i <- cs.indices; j <- (i + 1) until cs.length) {
      val got = out((cs(i), cs(j)))
      assert(math.abs(got - corr(i, j)) < 1e-3, s"${cs(i)}~${cs(j)}")
      assert(got >= -1.0 && got <= 1.0)
      // Symmetry of the underlying estimator (the plan emits each pair once).
      assert(math.abs(corr(i, j) - corr(j, i)) < 1e-12)
    }
  }

  test("q_chi_square: statistic matches a plain-Scala contingency recompute") {
    val row = SparkEntry.queries("q_chi_square")(spark, sf).collect().head
    val (n, dof, chi2, v) =
      (row.getLong(0), row.getLong(1), row.getDouble(2), row.getDouble(3))
    val os = new graft.engine.Catalog(spark, sf).orders
      .select("o_orderpriority", "o_orderstatus").collect()
      .map(x => (x.getString(0), x.getString(1)))
    val cells = os.groupBy(identity).view.mapValues(_.length.toDouble).toMap
    val rm = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cm = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val nn = os.length.toDouble
    val chi2m = cells.map { case ((p, s), obs) =>
      val e = rm(p) * cm(s) / nn; (obs - e) * (obs - e) / e
    }.sum
    assert(n === os.length.toLong)
    assert(dof === (rm.size - 1).toLong * (cm.size - 1))
    assert(math.abs(chi2 - chi2m) < 1e-3)
    assert(chi2 >= 0.0)
    val vm = math.sqrt(chi2m / (nn * math.min(rm.size - 1, cm.size - 1)))
    assert(math.abs(v - vm) < 1e-5)
  }

  test("q_welch_ttest: t and df match a plain-Scala two-sample recompute") {
    val row = SparkEntry.queries("q_welch_ttest")(spark, sf).collect().head
    val arms = purchases.groupBy { case (u, _) => u % 2 }
      .view.mapValues(_.map(_._2)).toMap
    val (a, b) = (arms(0L), arms(1L))
    def meanVar(xs: Array[Double]): (Double, Double) = {
      val m = xs.sum / xs.length
      (m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
    }
    val (m0, v0) = meanVar(a); val (m1, v1) = meanVar(b)
    val se = v0 / a.length + v1 / b.length
    val t = (m1 - m0) / math.sqrt(se)
    val df = se * se / (math.pow(v0 / a.length, 2) / (a.length - 1) +
      math.pow(v1 / b.length, 2) / (b.length - 1))
    assert(row.getLong(0) === a.length.toLong)
    assert(row.getLong(1) === b.length.toLong)
    assert(math.abs(row.getDouble(2) - r(m0, 4)) < 1e-9)
    assert(math.abs(row.getDouble(3) - r(m1, 4)) < 1e-9)
    assert(math.abs(row.getDouble(4) - t) < 1e-3)
    assert(math.abs(row.getDouble(5) - df) < 0.02)
    // Welch df is bounded by min(n)−1 below and n0+n1−2 above.
    assert(df >= math.min(a.length, b.length) - 1.0)
    assert(df <= a.length + b.length - 2.0)
  }

  test("q_mann_whitney: U matches a brute-force mid-rank recompute") {
    val row = SparkEntry.queries("q_mann_whitney")(spark, sf).collect().head
    val sorted = purchases.map { case (u, v) => (v, u % 2) }.sortBy(_._1)
    // Brute-force mid-ranks: average the 1-based positions of each tie run.
    val ranks = new Array[Double](sorted.length)
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      val mid = (i + 1 + j).toDouble / 2.0 // mean of positions i+1 .. j
      for (k <- i until j) ranks(k) = mid
      i = j
    }
    val n1 = sorted.count(_._2 == 1L).toDouble
    val n0 = sorted.length - n1
    val r1 = sorted.indices.filter(k => sorted(k)._2 == 1L).map(ranks).sum
    val u1 = r1 - n1 * (n1 + 1) / 2.0
    assert(row.getLong(0) === n0.toLong)
    assert(row.getLong(1) === n1.toLong)
    assert(math.abs(row.getDouble(2) - u1) < 1e-6)
    // U identity: U0 + U1 = n0*n1.
    val u0 = n0 * n1 - u1
    assert(u0 >= 0.0 && u1 >= 0.0)
    // z is centered: |z| can't exceed the no-variance bound.
    assert(math.abs(row.getDouble(3)) < 10.0)
  }
}
