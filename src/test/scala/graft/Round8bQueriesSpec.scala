package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-8b tier: t-closeness, DP counts, hybrid
  * retrieval fusion, and CUSUM change-point monitoring. Each test recomputes
  * the invariant from raw parquet (or from the query's own closed form)
  * rather than trusting the query under test.
  */
class Round8bQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("q_t_closeness: t matches a driver-side exact recompute and bounds hold") {
    val rows = SparkEntry.queries("q_t_closeness")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getInt(4)))).toMap
    assert(rows.nonEmpty)
    // TVD is a distance between probability distributions: 0 ≤ t ≤ 1, and
    // the at_risk flag must be exactly (t > 0.2) modulo the 9-dec rounding.
    rows.values.foreach { case (n, t, risk) =>
      assert(n > 0 && t >= 0.0 && t <= 1.0, s"t out of range: $t")
      assert((risk == 1) == (t > 0.2), s"flag/t mismatch: t=$t risk=$risk")
    }
    // Exact recompute of one class from raw parquet (integer arithmetic,
    // same closed form, independent code path).
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_nationkey"),
        floor(col("c_acctbal") / 1000).cast("bigint").as("band"),
        col("c_mktsegment").as("seg"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    val nTot = cust.length.toLong
    val glob = cust.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val (nk, bb) = rows.keys.head
    val cls = cust.filter(c => c._1 == nk && c._2 == bb)
    val nC = cls.length.toLong
    val cellCnt = cls.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val num = glob.map { case (s0, g) =>
      math.abs(cellCnt.getOrElse(s0, 0L) * nTot - g * nC)
    }.sum
    val tExp = BigDecimal(num.toDouble / (2.0 * nC * nTot))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows((nk, bb))._1 == nC)
    assert(rows((nk, bb))._2 == tExp,
      s"t recompute mismatch: got ${rows((nk, bb))._2}, want $tExp")
  }

  test("q_dp_count: noise is the seeded Laplace draw and n_dp = n_true + noise") {
    val out = SparkEntry.queries("q_dp_count")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (key, nTrue, noise, nDp) =
        (r.getInt(0).toLong, r.getLong(1), r.getDouble(2), r.getDouble(3))
      // Independent recompute of the inverse-CDF draw from the key.
      val v = (key * 2654435761L) % 4294967296L
      val u = (v + 0.5) / 4294967296.0 - 0.5
      val expect = BigDecimal(-1.0 * math.signum(u) * math.log(1.0 - 2.0 * math.abs(u)))
        .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(noise == expect, s"key=$key noise=$noise want $expect")
      assert(math.abs(nDp - (nTrue + noise)) < 1e-9)
      // Laplace(b=1) from a 2^-32-grained uniform: |noise| ≤ ln(2^32) ≈ 22.2.
      assert(math.abs(noise) <= 23.0, s"implausible draw magnitude: $noise")
    }
    // Seeded => two evaluations are identical (reproducible release).
    val again = SparkEntry.queries("q_dp_count")(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("q_rrf_fusion: fused scores decompose into the two candidate ranks") {
    val fused = SparkEntry.queries("q_rrf_fusion")(spark, sf).collect()
    assert(fused.length == 20)
    // Scores are sorted descending and each row's rrf is exactly the
    // closed form over its (possibly absent) ranks.
    val scores = fused.map(_.getDouble(3))
    assert(scores.sameElements(scores.sortBy(-_)))
    fused.foreach { r =>
      val rLex = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val rSem = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(rLex.nonEmpty || rSem.nonEmpty)
      val expect = BigDecimal(
        rLex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
          rSem.map(x => 1.0 / (60 + x)).getOrElse(0.0))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == expect)
    }
    // A doc ranked #1 by BOTH retrievers would score 2/61; the fused top
    // score can never exceed it, and must beat a single-list #1 only if
    // some doc appears high in both lists.
    assert(scores.head <= 2.0 / 61 + 1e-12)
  }

  test("q_benford: digit shares partition the order count; expectations are Benford's law") {
    val out = SparkEntry.queries("q_benford")(spark, sf).collect()
    val digits = out.map(_.getInt(0))
    assert(digits.forall(d => d >= 1 && d <= 9), s"non-leading digit: ${digits.toSeq}")
    assert(digits.distinct.length == digits.length)
    // obs must partition the filtered order count exactly.
    val nOrders = spark.read.parquet(s"$sf/orders.parquet")
      .filter(floor(col("o_totalprice")) >= 1).count()
    assert(out.map(_.getLong(1)).sum == nOrders)
    out.foreach { r =>
      val (d, obs, obsP, expP, dev) = (r.getInt(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))
      // The pinned literals are log10(1+1/d) to 9 decimals.
      assert(math.abs(expP - math.log10(1.0 + 1.0 / d)) < 5e-10, s"exp_p for $d")
      assert(math.abs(obsP - obs.toDouble / nOrders) < 1e-6)
      assert(math.abs(dev - (obsP - expP)) < 1e-6)
    }
  }

  test("q_gini_source: matches an exact integer recompute over raw token counts") {
    val out = SparkEntry.queries("q_gini_source")(spark, sf).collect().head
    val (n, tot, gini) = (out.getLong(0), out.getLong(1), out.getDouble(2))
    // Independent recompute: whitespace token counts per source, driver-side.
    val perSrc = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getString(1).split("\\s+").length.toLong).sum)
      .toMap
    assert(n == perSrc.size)
    assert(tot == perSrc.values.sum)
    val xs = perSrc.toSeq.sortBy(p => (p._2, p._1)).map(_._2)
    val a = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val expect = BigDecimal(
      (2.0 * a - (n + 1.0) * tot) / (n.toDouble * tot))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(gini == expect, s"gini $gini != $expect")
    assert(gini >= 0.0 && gini < 1.0)
  }

  test("q_change_points: runsums telescope and the final CUSUM is exactly zero") {
    val out = SparkEntry.queries("q_change_points")(spark, sf).collect()
    assert(out.nonEmpty)
    val n = out.map(_.getLong(1))
    val runsum = out.map(_.getLong(2))
    assert(runsum.head == n.head)
    (1 until out.length).foreach { i =>
      assert(runsum(i) == runsum(i - 1) + n(i), s"runsum broken at $i")
    }
    // cusum_N = runsum_N − N·(total/N) = 0 by construction: the statistic
    // always returns to zero at the end of the series.
    assert(out.last.getDouble(3) == 0.0,
      s"final cusum must be 0, got ${out.last.getDouble(3)}")
    // Flag agrees with the integer inequality |cusum| > 2·mean.
    val total = runsum.last
    val days = out.length.toLong
    out.zipWithIndex.foreach { case (r, i) =>
      val num = runsum(i) * days - (i + 1).toLong * total
      assert((r.getInt(4) == 1) == (math.abs(num) > 2 * total))
    }
  }
}
