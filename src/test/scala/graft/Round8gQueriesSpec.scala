package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-8g tier (Naive Bayes routing, 2-feature
  * OLS by normal equations, Pareto-frontier selection, reliability diagram,
  * split-conformal coverage). Each test recomputes the result in plain
  * Scala from raw parquet — an independent code path from the DataFrame
  * plans under test — plus the structural invariants each statistic owes
  * its consumers (confusion counts partition the panel, R² ∈ [0,1], the
  * frontier equals the brute-force dominance set, conformal coverage
  * clears its finite-sample floor).
  */
class Round8gQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def r(x: Double, d: Int): Double = {
    val m = math.pow(10, d); math.rint(x * m) / m
  }

  private lazy val docs: Array[(Long, String, String)] =
    new graft.engine.Catalog(spark, sf).documents
      .select("doc_id", "text", "lang").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2)))

  private def toks(text: String): Array[String] = text.split("\\s+")

  test("q_naive_bayes: confusion matrix matches a plain-Scala NB recompute") {
    val out = SparkEntry.queries("q_naive_bayes")(spark, sf).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    val isTest = (id: Long) => id % 5 == 0 && id < 1000
    val (test, train) = docs.partition(d => isTest(d._1))
    assert(test.nonEmpty && train.nonEmpty)
    val counts = train.flatMap(d => toks(d._2).map(t => (d._3, t)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val docsC = train.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val toksC = train.groupBy(_._3).view
      .mapValues(_.map(d => toks(d._2).length.toLong).sum).toMap
    val docsAll = train.length.toLong
    val vocab = train.flatMap(d => toks(d._2)).distinct.length.toLong
    val classes = docsC.keys.toSeq.sorted
    val want = test.map { case (_, text, actual) =>
      val ts = toks(text)
      val scored = classes.map { c =>
        val sl = ts.map(t => math.log(counts.getOrElse((c, t), 0L) + 1.0)).sum
        c -> r(math.log(docsC(c).toDouble / docsAll) + sl
          - ts.length * math.log((toksC(c) + vocab).toDouble), 6)
      }
      // argmax: score desc, class asc — the query's tie-break
      val best = scored.sortBy { case (c, sc) => (-sc, c) }.head._1
      (actual, best)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(out == want, s"confusion mismatch: $out vs $want")
    assert(out.values.sum == test.length.toLong, "counts partition the panel")
  }

  test("q_ols_multi: coefficients match a plain-Scala normal-equations solve") {
    val out = SparkEntry.queries("q_ols_multi")(spark, sf).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4),
          x.getDouble(5)))).toMap
    val ev = new graft.engine.Catalog(spark, sf).events
      .select("event_type", "ts", "value").collect()
      .map(x => (x.getString(0), x.getTimestamp(1).toLocalDateTime,
        x.getDouble(2)))
    val want = ev.groupBy(_._1).map { case (et, rows) =>
      val pts = rows.map { case (_, ldt, y) =>
        (ldt.getHour.toLong, ldt.toLocalDate.getDayOfWeek.getValue.toLong, y)
      }
      val n = pts.length.toDouble
      val s1 = pts.map(_._1).sum.toDouble; val s2 = pts.map(_._2).sum.toDouble
      val c11 = pts.map(p => p._1 * p._1).sum - s1 * s1 / n
      val c22 = pts.map(p => p._2 * p._2).sum - s2 * s2 / n
      val c12 = pts.map(p => p._1 * p._2).sum - s1 * s2 / n
      val sy = pts.map(_._3).sum
      val c1y = pts.map(p => p._1 * p._3).sum - s1 * sy / n
      val c2y = pts.map(p => p._2 * p._3).sum - s2 * sy / n
      val cyy = pts.map(p => p._3 * p._3).sum - sy * sy / n
      val det = c11 * c22 - c12 * c12
      val b1 = (c1y * c22 - c2y * c12) / det
      val b2 = (c2y * c11 - c1y * c12) / det
      et -> ((pts.length.toLong, sy / n - b1 * s1 / n - b2 * s2 / n,
        b1, b2, (b1 * c1y + b2 * c2y) / cyy))
    }
    assert(out.keySet == want.keySet)
    want.foreach { case (et, (n, b0, b1, b2, r2)) =>
      val (gn, gb0, gb1, gb2, gr2) = out(et)
      assert(gn == n, s"$et n")
      // double-sum accumulation order differs between the two code paths,
      // so compare at the displayed precision with a 1-ulp-of-grid slack
      assert(math.abs(gb0 - r(b0, 4)) <= 1e-4 + 1e-9, s"$et b0: $gb0 vs $b0")
      assert(math.abs(gb1 - r(b1, 4)) <= 1e-4 + 1e-9, s"$et b1: $gb1 vs $b1")
      assert(math.abs(gb2 - r(b2, 4)) <= 1e-4 + 1e-9, s"$et b2: $gb2 vs $b2")
      assert(math.abs(gr2 - r(r2, 6)) <= 1e-6 + 1e-9, s"$et r2: $gr2 vs $r2")
      assert(gr2 >= 0.0 && gr2 <= 1.0, s"$et r2 range")
    }
  }

  test("q_pareto_front: equals the brute-force dominance set") {
    val out = SparkEntry.queries("q_pareto_front")(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    val pts = docs.map { case (id, text, _) =>
      val ts = toks(text)
      (id, ts.length.toLong, ts.distinct.length.toLong)
    }.map { case (id, nt, nd) => (id, nt, nd, nd.toDouble / nt.toDouble) }
    val frontier = pts.filter { r0 =>
      !pts.exists(s => s._2 >= r0._2 && s._4 >= r0._4 &&
        (s._2 > r0._2 || s._4 > r0._4))
    }.sortBy(_._1)
    assert(out.map(_._1).toSeq == frontier.map(_._1).toSeq,
      s"frontier ids: ${out.map(_._1).toSeq} vs ${frontier.map(_._1).toSeq}")
    out.zip(frontier).foreach { case ((_, gnt, gnd, gttr), (_, nt, nd, ttr)) =>
      assert(gnt == nt && gnd == nd)
      assert(math.abs(gttr - r(ttr, 6)) < 1e-9)
    }
    // every non-frontier doc is dominated by some frontier doc (the
    // transitivity property that makes local-then-global pruning sound)
    val fr = frontier.toSet
    pts.filterNot(fr.contains).foreach { r0 =>
      assert(frontier.exists(s => s._2 >= r0._2 && s._4 >= r0._4 &&
        (s._2 > r0._2 || s._4 > r0._4)), s"undominated non-frontier $r0")
    }
  }

  private val stops = Set("the", "a", "of", "and", "to", "in", "is", "on",
    "for", "with")

  private def pScore(text: String): Double = {
    val ts = toks(text)
    math.min(ts.count(stops).toDouble / math.max(ts.length, 1).toDouble * 2.5,
      1.0)
  }

  test("q_calibration: decile bins match a plain-Scala recompute") {
    val out = SparkEntry.queries("q_calibration")(spark, sf).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4))))
      .toMap
    val scored = docs.map { case (_, text, lang) =>
      (pScore(text), if (lang == "en") 1.0 else 0.0)
    }
    val want = scored.groupBy { case (p, _) =>
      math.min(math.floor(p * 10), 9.0).toLong
    }.view.mapValues { rows =>
      val n = rows.length
      val conf = rows.map(_._1).sum / n
      val acc = rows.map(_._2).sum / n
      (n.toLong, conf, acc, math.abs(conf - acc))
    }.toMap
    assert(out.keySet == want.keySet, "bin keys")
    assert(out.keySet.forall(b => b >= 0 && b <= 9), "bins in 0..9")
    assert(out.values.map(_._1).sum == docs.length.toLong, "bins partition")
    want.foreach { case (bin, (n, conf, acc, gap)) =>
      val (gn, gconf, gacc, ggap) = out(bin)
      assert(gn == n, s"bin $bin n")
      assert(math.abs(gconf - r(conf, 6)) < 1e-9, s"bin $bin conf")
      assert(math.abs(gacc - r(acc, 6)) < 1e-9, s"bin $bin acc")
      assert(math.abs(ggap - r(gap, 6)) < 1e-9, s"bin $bin gap")
    }
  }

  test("q_conformal: q-hat is the exact order statistic; coverage clears its floor") {
    val rows = SparkEntry.queries("q_conformal")(spark, sf).collect()
    assert(rows.length == 1)
    val row = rows(0)
    val (nCalib, k, qhat) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    val (nEval, cov, avgSz, nEmpty) =
      (row.getLong(3), row.getDouble(4), row.getDouble(5), row.getLong(6))
    def hx(id: Long): Char = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      "%02x".format(d(0)).charAt(0)
    }
    val panel = docs.filter(_._1 < 1000)
    val calib = panel.filter(d => "012".contains(hx(d._1)))
      .map { case (_, text, lang) =>
        val p = pScore(text); if (lang == "en") 1.0 - p else p
      }.sorted
    assert(nCalib == calib.length.toLong, "calib size")
    val wantK = (9 * (calib.length + 1) + 9) / 10
    assert(k == wantK.toLong, "exact-integer ceil rank")
    val qh = calib(math.min(wantK, calib.length) - 1)
    assert(math.abs(qhat - r(qh, 6)) < 1e-9, "q-hat order statistic")
    val ev = panel.filter(d => "345".contains(hx(d._1)))
    assert(nEval == ev.length.toLong, "eval size")
    val sets = ev.map { case (_, text, lang) =>
      val p = pScore(text)
      (lang == "en", 1.0 - p <= qh, p <= qh)
    }
    val wantCov = sets.count { case (en, se, sn) =>
      (en && se) || (!en && sn)
    }.toDouble / sets.length
    assert(math.abs(cov - r(wantCov, 4)) < 1e-9, "coverage")
    val wantSz = sets.map { case (_, se, sn) =>
      (if (se) 1 else 0) + (if (sn) 1 else 0)
    }.sum.toDouble / sets.length
    assert(math.abs(avgSz - r(wantSz, 4)) < 1e-9, "avg set size")
    assert(nEmpty == sets.count { case (_, se, sn) => !se && !sn }.toLong)
    // the finite-sample marginal guarantee, with a 2-sigma allowance for
    // the fixed eval panel (sigma = sqrt(alpha(1-alpha)/n_eval))
    val floor = 0.9 - 2.0 * math.sqrt(0.09 / nEval)
    assert(cov >= floor, s"coverage $cov below conformal floor $floor")
  }
}
