package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-8e tier (HITS centrality, autocorrelation,
  * lexical diversity). Each test recomputes the statistic in plain Scala
  * from raw parquet — an independent code path from the DataFrame plans
  * under test — plus structural invariants of each statistic (HITS scores
  * are an L1-normalized distribution; ACF is bounded by 1; Yule's K is
  * zero iff every token is unique).
  */
class Round8eQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("q_hits: scores match an in-memory recompute of 2 L1-normalized passes") {
    val out = SparkEntry.queries("q_hits")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.nonEmpty)
    val cat = new graft.engine.Catalog(spark, sf)
    val orders = cat.orders.select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .filter(_._2 % 4 == 0).toMap // the query's 1-in-4 customer subset
    val edges = cat.lineitem.select("l_orderkey", "l_suppkey").collect()
      .flatMap(r => orders.get(r.getLong(0)).map(c => (c, r.getLong(1))))
      .distinct
    def r9(x: Double): Double = math.rint(x * 1e9) / 1e9
    var hub = edges.map(_._1).distinct.map(_ -> 1.0).toMap
    var auth = Map.empty[Long, Double]
    for (_ <- 1 to 2) {
      val aRaw = edges.groupBy(_._2).view.mapValues(_.map(e => hub(e._1)).sum).toMap
      val aTot = aRaw.values.sum
      auth = aRaw.view.mapValues(v => r9(v / aTot)).toMap
      val hRaw = edges.groupBy(_._1).view.mapValues(_.map(e => auth(e._2)).sum).toMap
      val hTot = hRaw.values.sum
      hub = hRaw.view.mapValues(v => r9(v / hTot)).toMap
    }
    val want = hub.map { case (id, s) => ("hub", id) -> (math.rint(s * 1e6) / 1e6) } ++
      auth.map { case (id, s) => ("auth", id) -> (math.rint(s * 1e6) / 1e6) }
    assert(out.keySet == want.keySet)
    want.foreach { case (k, v) =>
      assert(math.abs(out(k) - v) <= 2e-6, s"$k: got ${out(k)} want $v")
    }
  }

  test("q_hits: each side is a normalized distribution over its own nodes") {
    val rows = SparkEntry.queries("q_hits")(spark, sf).collect()
    Seq("hub", "auth").foreach { side =>
      val ss = rows.filter(_.getString(0) == side).map(_.getDouble(2))
      assert(ss.nonEmpty, side)
      assert(ss.forall(s => s >= 0.0 && s <= 1.0), s"$side range")
      // L1 norm: rounded scores must sum to 1 within rounding slack.
      assert(math.abs(ss.sum - 1.0) <= ss.length * 1e-6, s"$side L1 sum ${ss.sum}")
    }
  }

  test("q_autocorr: ACF matches an exact integer-moment recompute, |acf| <= 1") {
    val out = SparkEntry.queries("q_autocorr")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out.nonEmpty)
    val daily = new graft.engine.Catalog(spark, sf).events
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toLocalDateTime.toLocalDate))
      .groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.map { case ((et, d), n) => (et, d, n) }
      .groupBy(_._1).view.mapValues(_.sortBy(_._2.toEpochDay).map(_._3).toArray)
      .toMap
    daily.foreach { case (et, series) =>
      (1 to 3).foreach { lg =>
        if (series.length > lg) {
          val pairs = series.drop(lg).zip(series.dropRight(lg))
          val k = pairs.length.toLong
          val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
          val sxy = pairs.map(p => p._1 * p._2).sum
          val sxx = pairs.map(p => p._1 * p._1).sum
          val syy = pairs.map(p => p._2 * p._2).sum
          val acf = (k * sxy - sx * sy).toDouble /
            math.sqrt((k * sxx - sx * sx).toDouble * (k * syy - sy * sy).toDouble)
          val (nPairs, got) = out((et, lg.toLong))
          assert(nPairs == k, s"$et lag $lg pairs")
          assert(math.abs(got - math.rint(acf * 1e6) / 1e6) < 1e-9,
            s"$et lag $lg: got $got want $acf")
          assert(math.abs(got) <= 1.0 + 1e-9, s"$et lag $lg bound")
        }
      }
    }
  }

  test("q_auc: rank-based AUC equals the pairwise Mann–Whitney recompute") {
    // The query computes AUC from score-level average ranks; this recompute
    // uses the DEFINITION instead — P(score_pos > score_neg) + ½P(tie) over
    // all pos×neg pairs — a genuinely different formulation that only
    // agrees if the tie handling is exactly right.
    val row = SparkEntry.queries("q_auc")(spark, sf).collect()
    assert(row.length == 1)
    val (n1, n0, auc, gini, ks) = (row(0).getLong(0), row(0).getLong(1),
      row(0).getDouble(2), row(0).getDouble(3), row(0).getDouble(4))
    val scored = new graft.engine.Catalog(spark, sf).embeddings
      .selectExpr("round(CAST(embedding[0] AS DOUBLE), 2) AS sc",
        "CAST(label = 0 AS INT) AS y")
      .collect().map(r => (r.getDouble(0), r.getInt(1)))
    val pos = scored.filter(_._2 == 1).map(_._1)
    val neg = scored.filter(_._2 == 0).map(_._1)
    assert(n1 == pos.length.toLong && n0 == neg.length.toLong)
    val u = (for (p <- pos; q <- neg)
      yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
    val aucDef = u / (pos.length.toDouble * neg.length.toDouble)
    assert(math.abs(auc - math.rint(aucDef * 1e6) / 1e6) < 1e-9,
      s"auc $auc vs definition $aucDef")
    assert(math.abs(gini - (2 * auc - 1)) < 3e-6, "gini = 2·AUC − 1")
    // KS from raw CDFs over thresholds.
    val thresholds = scored.map(_._1).distinct.sorted
    val ksDef = thresholds.map { t =>
      math.abs(pos.count(_ <= t).toDouble / pos.length -
        neg.count(_ <= t).toDouble / neg.length)
    }.max
    assert(math.abs(ks - math.rint(ksDef * 1e6) / 1e6) < 1e-9, s"ks $ks vs $ksDef")
  }

  test("q_markov_stationary: 3-step power iteration matches recompute; masses ≈ 1") {
    val out = SparkEntry.queries("q_markov_stationary")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out.nonEmpty)
    val ev = new graft.engine.Catalog(spark, sf).events
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getLong(3)))
    val trans = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._3.getTime, e._4))
      sorted.sliding(2).collect { case Array(a, b) => (a._2, b._2) }
    }.toSeq
    val cnt = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val outTot = cnt.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val p = cnt.map { case ((i, j), n) => (i, j, n.toDouble / outTot(i)) }.toSeq
    val states = outTot.keySet.toSeq.sorted
    def r9(x: Double): Double = math.rint(x * 1e9) / 1e9
    var pi = states.map(_ -> r9(1.0 / states.length)).toMap
    for (_ <- 1 to 3)
      pi = p.groupBy(_._2).view
        .mapValues(es => r9(es.map { case (i, _, pij) => pi(i) * pij }.sum)).toMap
    val empTot = ev.length.toDouble
    val emp = ev.groupBy(_._2).view.mapValues(_.length / empTot).toMap
    assert(out.keySet == pi.keySet.intersect(emp.keySet))
    out.foreach { case (et, (pi3, empShare)) =>
      assert(math.abs(pi3 - math.rint(pi(et) * 1e6) / 1e6) < 1e-9, s"$et pi")
      assert(math.abs(empShare - math.rint(emp(et) * 1e6) / 1e6) < 1e-9, s"$et emp")
    }
    // Both columns are (near-)distributions: rounded masses sum to ~1.
    assert(math.abs(out.values.map(_._1).sum - 1.0) < 1e-4, "pi mass")
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-4, "emp mass")
  }

  test("q_stump_split: the chosen split beats or ties every candidate (brute force)") {
    val row = SparkEntry.queries("q_stump_split")(spark, sf).collect()
    assert(row.length == 1)
    val (f, t, gini, acc) = (row(0).getLong(0), row(0).getDouble(1),
      row(0).getDouble(2), row(0).getDouble(3))
    val data = new graft.engine.Catalog(spark, sf).embeddings
      .selectExpr("CAST(label = 0 AS INT) AS y",
        "round(CAST(embedding[0] AS DOUBLE), 2) AS s1",
        "round(CAST(embedding[1] AS DOUBLE), 2) AS s2",
        "round(CAST(embedding[2] AS DOUBLE), 2) AS s3",
        "round(CAST(embedding[3] AS DOUBLE), 2) AS s4")
      .collect().map(r => (r.getInt(0),
        Array(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
    val n = data.length.toDouble
    def giniOf(fi: Int, th: Double): (Double, Double) = {
      val (l, r) = data.partition(_._2(fi) <= th)
      if (l.isEmpty || r.isEmpty) return (Double.MaxValue, 0.0)
      def imp(side: Array[(Int, Array[Double])]): Double = {
        val p = side.count(_._1 == 1).toDouble / side.length
        1.0 - p * p - (1 - p) * (1 - p)
      }
      val g = (l.length * imp(l) + r.length * imp(r)) / n
      val a = (math.max(l.count(_._1 == 1), l.count(_._1 == 0)) +
        math.max(r.count(_._1 == 1), r.count(_._1 == 0))) / n
      (g, a)
    }
    // The declared split's gini/acc must match brute force at its (f, t)...
    val (gWant, aWant) = giniOf(f.toInt - 1, t)
    assert(math.abs(gini - math.rint(gWant * 1e6) / 1e6) < 1e-9, s"gini at split")
    assert(math.abs(acc - math.rint(aWant * 1e6) / 1e6) < 1e-9, s"acc at split")
    // ...and no candidate anywhere can do strictly better (beyond rounding).
    val best = (0 until 4).flatMap { fi =>
      data.map(_._2(fi)).distinct.map(th => giniOf(fi, th)._1)
    }.min
    assert(gWant <= best + 1e-9, s"chosen $gWant vs global best $best")
  }

  test("q_tree_depth2: root and both children are per-node brute-force optima") {
    val rows = SparkEntry.queries("q_tree_depth2")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    // Children with no valid split (pure / single-level side) emit no row
    // - the query contract; which sides split is decided by brute force
    // below rather than assumed.
    assert(rows.contains("root"))
    val data = new graft.engine.Catalog(spark, sf).embeddings
      .selectExpr("CAST(label = 0 AS INT) AS y",
        "round(CAST(embedding[0] AS DOUBLE), 2) AS s1",
        "round(CAST(embedding[1] AS DOUBLE), 2) AS s2",
        "round(CAST(embedding[2] AS DOUBLE), 2) AS s3",
        "round(CAST(embedding[3] AS DOUBLE), 2) AS s4")
      .collect().map(r => (r.getInt(0),
        Array(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
    def bestOf(node: Array[(Int, Array[Double])]): (Int, Double, Double) = {
      val n = node.length.toDouble
      val cands = for {
        fi <- 0 until 4
        th <- node.map(_._2(fi)).distinct
        (l, r) = node.partition(_._2(fi) <= th)
        if l.nonEmpty && r.nonEmpty
      } yield {
        def imp(side: Array[(Int, Array[Double])]): Double = {
          val p = side.count(_._1 == 1).toDouble / side.length
          1.0 - p * p - (1 - p) * (1 - p)
        }
        (fi + 1, th, (l.length * imp(l) + r.length * imp(r)) / n)
      }
      // the query's (gini@9, f, t) tie-break
      cands.minBy { case (f, t, g) => (math.rint(g * 1e9) / 1e9, f, t) }
    }
    val (rf, rt, rg) = bestOf(data)
    assert(rows("root")._1 == rf.toLong && rows("root")._2 == rt, "root split")
    assert(math.abs(rows("root")._3 - math.rint(rg * 1e6) / 1e6) < 1e-9, "root gini")
    val (left, right) = data.partition(_._2(rf - 1) <= rt)
    Seq("L" -> left, "R" -> right).foreach { case (side, node) =>
      val hasCandidate = (0 until 4).exists { fi =>
        node.map(_._2(fi)).distinct.length > 1
      }
      assert(rows.contains(side) == hasCandidate, s"$side presence")
      if (hasCandidate) {
        val (f, t, g) = bestOf(node)
        assert(rows(side)._1 == f.toLong && rows(side)._2 == t, s"$side split")
        assert(math.abs(rows(side)._3 - math.rint(g * 1e6) / 1e6) < 1e-9, s"$side gini")
        // Recursion must not hurt: each child's weighted impurity is <= the
        // node's own class impurity (splitting can only reduce Gini).
        val p = node.count(_._1 == 1).toDouble / node.length
        assert(g <= 1.0 - p * p - (1 - p) * (1 - p) + 1e-12, s"$side improves")
      }
    }
  }

  test("q_mutual_info: MI/chi2/V match a contingency-table recompute") {
    val row = SparkEntry.queries("q_mutual_info")(spark, sf).collect()
    assert(row.length == 1)
    val r = row(0)
    val (n, mi, nmi, chi2, dof, v) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getLong(4), r.getDouble(5))
    val obs = new graft.engine.Catalog(spark, sf).events
      .select("event_type", "ts").collect()
      .map(x => (x.getString(0),
        x.getTimestamp(1).toLocalDateTime.getDayOfWeek.getValue))
    assert(n == obs.length.toLong)
    val cells = obs.groupBy(identity).view.mapValues(_.length.toDouble).toMap
    val nx = obs.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    val ny = obs.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val nd = obs.length.toDouble
    val miW = cells.map { case ((x, y), o) =>
      (o / nd) * math.log(o * nd / (nx(x) * ny(y))) }.sum
    val chi2W = cells.map { case ((x, y), o) =>
      val ex = nx(x) * ny(y) / nd; (o - ex) * (o - ex) / ex }.sum
    def h(m: Map[_, Double]): Double =
      math.log(nd) - m.values.map(c => c * math.log(c)).sum / nd
    assert(math.abs(mi - miW) < 2e-6, s"mi $mi vs $miW")
    assert(math.abs(nmi - miW / math.sqrt(h(nx) * h(ny))) < 2e-6, "nmi")
    assert(math.abs(chi2 - chi2W) < 2e-3, s"chi2 $chi2 vs $chi2W")
    assert(dof == (nx.size - 1).toLong * (ny.size - 1), "dof")
    assert(math.abs(v - math.sqrt(chi2W / (nd * math.min(nx.size - 1, ny.size - 1)))) < 2e-6, "V")
    assert(mi >= -1e-9 && chi2 >= 0 && v >= 0 && v <= 1 + 1e-9, "ranges")
  }

  test("q_lexical_diversity: Yule's K and Simpson's D match a recompute") {
    val out = SparkEntry.queries("q_lexical_diversity")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out.nonEmpty)
    val bySource = new graft.engine.Catalog(spark, sf).documents
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view
      .mapValues(_.flatMap(_._2.split(" ", -1)).groupBy(identity).map(_._2.length.toLong))
      .toMap
    assert(out.keySet == bySource.keySet)
    bySource.foreach { case (src, freqs) =>
      val n = freqs.sum; val v = freqs.size.toLong
      val sf2 = freqs.map(f => f * f).sum
      val sd = freqs.map(f => f * (f - 1)).sum
      val yule = 10000.0 * (sf2 - n).toDouble / (n.toDouble * n.toDouble)
      val simpson = sd.toDouble / (n.toDouble * (n - 1).toDouble)
      val (nTok, vocab, gotY, gotD) = out(src)
      assert(nTok == n, s"$src n_tok")
      assert(vocab == v, s"$src vocab")
      assert(math.abs(gotY - math.rint(yule * 1e6) / 1e6) < 1e-9, s"$src yule")
      assert(math.abs(gotD - math.rint(simpson * 1e9) / 1e9) < 1e-12, s"$src simpson")
      // Yule's K is 0 iff all tokens unique; any repeat forces K > 0.
      assert((gotY == 0.0) == (sf2 == n), s"$src K-zero iff no repeats")
    }
  }
}
