package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-8i tier (Kaplan–Meier waiting-time
  * survival). The mirror recomputes the product-limit table in plain Scala
  * from raw parquet — an independent code path from the windowed DataFrame
  * plan — plus the structural properties the estimator exists to provide
  * (monotone non-increasing curve, censoring actually present, risk-set
  * bookkeeping exact).
  */
class Round8iQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def r(x: Double, d: Int): Double = {
    val m = math.pow(10, d); math.rint(x * m) / m
  }

  test("q_kaplan_meier: product-limit table matches a plain-Scala recompute") {
    val out = SparkEntry.queries("q_kaplan_meier")(spark, sf).collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getDouble(4)))
    // independent mirror from raw events
    val ev = new graft.engine.Catalog(spark, sf).events
      .select("user_id", "ts", "event_id").collect()
      .map { x =>
        val ts = x.getTimestamp(1)
        // full microsecond precision: getTime carries millis only
        val us = math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
        (x.getLong(0), us, x.getLong(2))
      }
    val maxUs = ev.map(_._2).max
    val obs = ev.groupBy(_._1).values.flatMap { rows =>
      val s = rows.sortBy(e => (e._2, e._3))
      s.zipWithIndex.map { case ((_, us, _), i) =>
        if (i + 1 < s.length) ((s(i + 1)._2 - us) / 3600000000L, 1)
        else ((maxUs - us) / 3600000000L, 0)
      }
    }.toSeq
    val byT = obs.groupBy(_._1).view
      .mapValues(xs => (xs.count(_._2 == 1).toLong, xs.count(_._2 == 0).toLong))
      .toSeq.sortBy(_._1)
    val n = obs.size.toLong
    var atRisk = n
    var surv = 1.0
    var zero = false
    val want = byT.map { case (t, (d, c)) =>
      val nRisk = atRisk
      val factor = 1.0 - d.toDouble / nRisk
      if (factor == 0) zero = true
      if (!zero) surv = surv * factor
      atRisk -= d + c
      (t.toInt, nRisk, d, c, if (zero) 0.0 else r(surv, 6))
    }
    // surv via running product vs the plan's exp∘sum∘ln: agree to 1e-6
    assert(out.length == want.length)
    out.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3 && g._4 == w._4,
        s"risk-set row: got $g want $w")
      assert(math.abs(g._5 - w._5) <= 2e-6, s"surv: got $g want $w")
    }
    // structural: censoring present (one censored obs per user), curve
    // monotone non-increasing from a value < 1
    assert(want.map(_._4).sum == ev.map(_._1).distinct.length)
    assert(out.head._5 < 1.0)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._5 <= a._5 + 1e-12, s"curve increased: $a -> $b")
    }
  }
}
