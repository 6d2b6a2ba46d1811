package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-8d tier (KMV distinct sketch and the
  * Theil–Sen / Mann–Kendall trend monitor). Each test recomputes the
  * statistic in plain Scala from raw parquet — an independent code path
  * from the DataFrame plan under test — plus a distributional guarantee
  * of the sketch itself (the estimate must land within the theoretical
  * relative-error envelope for K=32).
  */
class Round8dQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  // KMV's rk==32 filter needs groups with >= 32 distinct users, which the
  // sf0.001 events table doesn't have — the sketch tests run one SF up.
  private val sfKmv = "/root/testdata/sf0.01"

  private lazy val rawEvents: Array[(String, Long, java.sql.Timestamp)] =
    new graft.engine.Catalog(spark, sf).events
      .select("event_type", "user_id", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2)))

  test("q_kmv_distinct: kth hash and estimate match an in-memory recompute") {
    val out = SparkEntry.queries("q_kmv_distinct")(spark, sfKmv).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out.nonEmpty)
    val kmvEvents = new graft.engine.Catalog(spark, sfKmv).events
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = kmvEvents.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct).toMap
    // Only groups with >= 32 distinct users surface (rk == K filter).
    val expectKeys = byType.filter(_._2.length >= 32).keySet
    assert(out.keySet == expectKeys)
    expectKeys.foreach { et =>
      val us = byType(et)
      val hs = us.map(u => ((1103515245L * u + 12345L) % 2147483647L).toDouble / 2147483647.0)
        .sorted
      val hk = hs(31)
      val (nExact, kthH, est) = out(et)
      assert(nExact == us.length.toLong, s"$et exact count")
      assert(math.abs(kthH - math.rint(hk * 1e9) / 1e9) < 1e-12, s"$et kth hash")
      assert(math.abs(est - math.rint(31.0 / hk * 1e4) / 1e4) < 1e-9, s"$et estimate")
    }
  }

  test("q_kmv_distinct: estimates land within the K=32 error envelope") {
    // KMV's relative standard error is ~1/sqrt(K-2) ≈ 0.18 for K=32; a
    // correct sketch over these group sizes should not stray past ~4 RSE.
    val out = SparkEntry.queries("q_kmv_distinct")(spark, sfKmv).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val relErr = r.getAs[Double]("rel_err")
      assert(relErr < 4.0 / math.sqrt(30.0),
        s"${r.getString(0)}: rel_err $relErr outside the sketch envelope")
    }
  }

  test("q_trend_test: Theil–Sen slope and Mann–Kendall S/var match recompute") {
    val out = SparkEntry.queries("q_trend_test")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out.nonEmpty)
    val daily = rawEvents.groupBy(e => (e._1, e._3.toLocalDateTime.toLocalDate))
      .view.mapValues(_.length.toLong).toMap
    val byType = daily.groupBy(_._1._1).view
      .mapValues(_.map { case ((_, d), n) => (d, n) }.toArray.sortBy(_._1.toEpochDay))
      .toMap
    assert(out.keySet == byType.keySet)
    byType.foreach { case (et, days) =>
      val slopes = for {
        i <- days.indices; j <- (i + 1) until days.length
      } yield (days(j)._2 - days(i)._2).toDouble /
        (days(j)._1.toEpochDay - days(i)._1.toEpochDay)
      // Spark `percentile` interpolation: index p*(n-1), linear.
      val ss = slopes.sorted
      val idx = 0.5 * (ss.length - 1)
      val lo = idx.toInt
      val sen =
        if (lo + 1 < ss.length) ss(lo) + (idx - lo) * (ss(lo + 1) - ss(lo))
        else ss(lo)
      val sStat = (for {
        i <- days.indices; j <- (i + 1) until days.length
      } yield math.signum((days(j)._2 - days(i)._2).toDouble)).sum.toLong
      val n = days.length.toDouble
      val tieSum = days.groupBy(_._2).values.map(_.length.toDouble)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      val varS = (n * (n - 1) * (2 * n + 5) - tieSum) / 18.0
      val z = (sStat - math.signum(sStat.toDouble)) / math.sqrt(varS)
      val (nDays, gotSen, gotS, gotVar, gotZ) = out(et)
      assert(nDays == days.length.toLong, s"$et n_days")
      assert(math.abs(gotSen - sen) <= 1e-6, s"$et sen: got $gotSen want $sen")
      assert(gotS == sStat, s"$et S: got $gotS want $sStat")
      assert(math.abs(gotVar - varS) <= 1e-4, s"$et var_s")
      assert(math.abs(gotZ - z) <= 1e-4, s"$et z: got $gotZ want $z")
    }
  }

  test("q_trend_test: z is consistent with S's sign and magnitude") {
    // |z| must shrink vs the uncorrected S/sqrt(var) (continuity correction
    // pulls toward zero) and share S's sign — the invariant that makes the
    // statistic a two-sided test rather than a raw count.
    val out = SparkEntry.queries("q_trend_test")(spark, sf).collect()
    out.foreach { r =>
      val s = r.getAs[Long]("s_stat"); val v = r.getAs[Double]("var_s")
      val z = r.getAs[Double]("z")
      if (s != 0) {
        assert(math.signum(z) == math.signum(s.toDouble), "sign agreement")
        assert(math.abs(z) <= math.abs(s / math.sqrt(v)) + 1e-9, "correction shrinks")
      }
    }
  }
}
