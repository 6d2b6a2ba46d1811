package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-8f tier (A/B lift readout, day-of-week
  * seasonal decomposition). Each test recomputes the statistic in plain
  * Scala from raw parquet — an independent code path from the DataFrame
  * plans under test — plus structural invariants (arm counts partition the
  * user universe; z carries the sign of the lift; seasonal indices are
  * keyed by ISO weekday and come only from complete centered weeks).
  */
class Round8fQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("q_ab_lift: counts, rates, lift and z match a per-user recompute") {
    val rows = SparkEntry.queries("q_ab_lift")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows(0)
    val (nA, nB, cA, cB) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (rateA, rateB, lift, z) =
      (r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))
    val ev = new graft.engine.Catalog(spark, sf).events
      .select("user_id", "event_type", "value").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getDouble(2)))
    val conv = ev.groupBy(_._1).view
      .mapValues(_.exists(e => e._2 == "purchase" && e._3 >= 150.0)).toMap
    val (armA, armB) = conv.keys.partition(_ % 2 == 0)
    assert(nA == armA.size.toLong && nB == armB.size.toLong, "arm sizes")
    assert(nA + nB == conv.size.toLong, "arms partition the user universe")
    val wCA = armA.count(conv); val wCB = armB.count(conv)
    assert(cA == wCA.toLong && cB == wCB.toLong, "converter counts")
    // conversion must be non-degenerate or z is undefined — the whole
    // reason the outcome is value >= 150 rather than "ever purchased"
    assert(wCA + wCB > 0 && wCA + wCB < conv.size, "non-degenerate outcome")
    def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
    val pa = wCA.toDouble / armA.size; val pb = wCB.toDouble / armB.size
    assert(math.abs(rateA - r6(pa)) < 1e-9, "rate_a")
    assert(math.abs(rateB - r6(pb)) < 1e-9, "rate_b")
    assert(math.abs(lift - r6(pb - pa)) < 1e-9, "abs_lift")
    val pPool = (wCA + wCB).toDouble / conv.size
    val zW = (pb - pa) / math.sqrt(
      pPool * (1 - pPool) * (1.0 / armA.size + 1.0 / armB.size))
    assert(math.abs(z - math.rint(zW * 1e4) / 1e4) < 1e-9, s"z $z vs $zW")
    // z carries the sign of the lift (same numerator, positive denominator)
    assert(z.sign == lift.sign || lift == 0.0, "z sign")
  }

  test("q_seasonal_dow: indices match a centered-7-row recompute; ISO dow keys") {
    val out = SparkEntry.queries("q_seasonal_dow")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out.nonEmpty)
    assert(out.keys.forall { case (_, dow) => dow >= 1 && dow <= 7 }, "ISO dow range")
    val daily = new graft.engine.Catalog(spark, sf).events
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toLocalDateTime.toLocalDate))
      .groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.map { case ((et, d), n) => (et, d, n) }
      .groupBy(_._1).view.mapValues(_.sortBy(_._2.toEpochDay)).toMap
    val want = daily.flatMap { case (et, series) =>
      // centered ±3 ROW window over existing dates, complete windows only —
      // exactly the query's rowsBetween(-3, 3) with c7 == 7
      val complete = series.indices.collect {
        case i if i >= 3 && i + 3 < series.length =>
          val (_, d, n) = series(i)
          val s7 = (i - 3 to i + 3).map(series(_)._3).sum
          (d.getDayOfWeek.getValue.toLong, n, s7)
      }
      complete.groupBy(_._1).map { case (dow, rs) =>
        val k = rs.length.toLong
        val sn = rs.map(_._2).sum; val ss7 = rs.map(_._3).sum
        (et, dow) -> ((k, (sn.toDouble - ss7.toDouble / 7.0) / k))
      }
    }
    assert(out.keySet == want.keySet, "group keys")
    want.foreach { case (key, (k, seasonal)) =>
      val (gotK, gotS) = out(key)
      assert(gotK == k, s"$key k_days")
      assert(math.abs(gotS - math.rint(seasonal * 1e4) / 1e4) < 1e-9,
        s"$key: got $gotS want $seasonal")
    }
    // Within each event_type the k_days-weighted seasonal indices sum to
    // Σn − Σs7/7 over its complete rows — check that exact identity.
    want.keys.map(_._1).toSeq.distinct.foreach { et =>
      val weighted = want.collect { case ((e, _), (k, s)) if e == et => k * s }.sum
      val rowsum = daily(et).indices.collect {
        case i if i >= 3 && i + 3 < daily(et).length =>
          daily(et)(i)._3.toDouble -
            (i - 3 to i + 3).map(daily(et)(_)._3).sum / 7.0
      }.sum
      assert(math.abs(weighted - rowsum) < 1e-6, s"$et decomposition identity")
    }
  }
}
