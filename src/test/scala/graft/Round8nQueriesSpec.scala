package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-8n tier (two-sample KS, the forecaster
  * backtest, CUPED). Plain-Scala mirrors from raw parquet — independent of
  * the windowed/folded DataFrame plans — plus the theory each readout
  * rests on: D is the exact sup-gap of empirical CDFs, the backtest's
  * Holt leg reproduces a direct recurrence, CUPED's adjustment is
  * mean-preserving and never increases variance in expectation (checked
  * here as: the measured variance reduction matches the mirror).
  */
class Round8nQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def r(x: Double, d: Int): Double = {
    val m = math.pow(10, d); math.rint(x * m) / m
  }

  private lazy val purchases: Array[(Long, Double, java.time.LocalDate)] =
    new graft.engine.Catalog(spark, sf).events
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select("user_id", "value", "ts").collect()
      .map(x => (x.getLong(0), x.getDouble(1),
        x.getTimestamp(2).toLocalDateTime.toLocalDate))

  test("q_ks_test: D equals the brute-force sup-gap of empirical CDFs") {
    val row = SparkEntry.queries("q_ks_test")(spark, sf).collect().head
    val s0 = purchases.filter(_._1 % 2 == 0).map(_._2).sorted
    val s1 = purchases.filter(_._1 % 2 == 1).map(_._2).sorted
    val values = (s0 ++ s1).distinct.sorted
    def cdf(xs: Array[Double], v: Double): Double = {
      // count of elements <= v
      var lo = 0; var hi = xs.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (xs(mid) <= v) lo = mid + 1 else hi = mid
      }
      lo.toDouble / xs.length
    }
    val d = values.map(v => math.abs(cdf(s0, v) - cdf(s1, v))).max
    assert(row.getLong(0) === s0.length.toLong)
    assert(row.getLong(1) === s1.length.toLong)
    assert(math.abs(row.getDouble(2) - d) < 1e-6)
    val lam = math.sqrt(s0.length.toDouble * s1.length /
      (s0.length + s1.length)) * d
    val p = 2 * math.exp(-2 * lam * lam) - 2 * math.exp(-8 * lam * lam) +
      2 * math.exp(-18 * lam * lam)
    assert(math.abs(row.getDouble(4) - p) < 1e-4)
    assert(row.getDouble(4) >= 0.0 && row.getDouble(4) <= 1.0001)
  }

  test("q_forecast_backtest: both MAE legs match a direct recurrence") {
    val out = SparkEntry.queries("q_forecast_backtest")(spark, sf).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2),
        x.getDouble(3), x.getString(4)))).toMap
    val daily = new graft.engine.Catalog(spark, sf).events
      .select("event_type", "ts").collect()
      .map(x => (x.getString(0), x.getTimestamp(1).toLocalDateTime.toLocalDate))
      .groupBy(e => e).view.mapValues(_.size.toLong).toSeq
      .map { case ((et, d), n) => (et, d, n * 1000000L) }
    daily.groupBy(_._1).foreach { case (et, days) =>
      if (days.size >= 8) {
        val ys = days.sortBy(_._2).map(_._3).toArray
        val n = ys.length
        val l0 = ys.take(7).sum / 7
        var hl = l0; var hb = 0L
        var wl = l0; var wb = 0L
        val s = Array.tabulate(7)(d => ys(d) - l0)
        var he = 0L; var we = 0L
        for (i <- 7 until n) {
          val d = i % 7
          he += math.abs(ys(i) - (hl + hb))
          we += math.abs(ys(i) - (wl + wb + s(d)))
          val hlN = (ys(i) + hl + hb) / 2
          val hbN = (3 * (hlN - hl) + 7 * hb) / 10
          val wlN = (ys(i) - s(d) + wl + wb) / 2
          val wbN = (3 * (wlN - wl) + 7 * wb) / 10
          s(d) = (ys(i) - wlN + 4 * s(d)) / 5
          hl = hlN; hb = hbN; wl = wlN; wb = wbN
        }
        val (nEval, maeH, maeW, winner) = out(et)
        assert(nEval === (n - 7).toLong)
        assert(maeH === r(he.toDouble / ((n - 7) * 1e6), 4), s"$et holt")
        assert(maeW === r(we.toDouble / ((n - 7) * 1e6), 4), s"$et hw")
        val expWinner = if (we < he) "holt_winters"
          else if (he < we) "holt" else "tie"
        assert(winner === expWinner, et)
      }
    }
  }

  test("q_cuped: theta/adjustment match a plain-Scala recompute") {
    val rows = SparkEntry.queries("q_cuped")(spark, sf).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2),
        x.getDouble(3), x.getDouble(4)))).toMap
    val cut = java.time.LocalDate.parse("2024-01-16")
    val perUser = purchases.groupBy(_._1).map { case (u, ps) =>
      (u % 2,
        ps.filter(_._3.isBefore(cut)).map(_._2).sum,
        ps.filter(!_._3.isBefore(cut)).map(_._2).sum)
    }.toSeq
    val n = perUser.size.toDouble
    val sx = perUser.map(_._2).sum; val sy = perUser.map(_._3).sum
    val sxx = perUser.map(p => p._2 * p._2).sum
    val sxy = perUser.map(p => p._2 * p._3).sum
    val theta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    val mx = sx / n
    def varS(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    Seq(0L, 1L).foreach { arm =>
      val mine = perUser.filter(_._1 == arm)
      val ys = mine.map(_._3)
      val adj = mine.map(p => p._3 - theta * (p._2 - mx))
      val (nu, my, mAdj, redPct) = rows(arm)
      assert(nu === mine.size.toLong)
      assert(math.abs(my - ys.sum / ys.size) < 1e-3)
      assert(math.abs(mAdj - adj.sum / adj.size) < 1e-3)
      val exp = (1.0 - r(varS(adj), 2) / r(varS(ys), 2)) * 100.0
      assert(math.abs(redPct - exp) < 0.05, s"arm $arm")
    }
    // CUPED is mean-preserving ACROSS arms only up to the covariate
    // imbalance; the invariant that must hold exactly is the pooled one.
    val pooledY = perUser.map(_._3).sum / n
    val pooledAdj = perUser.map(p => p._3 - theta * (p._2 - mx)).sum / n
    assert(math.abs(pooledY - pooledAdj) < 1e-6)
  }
}
