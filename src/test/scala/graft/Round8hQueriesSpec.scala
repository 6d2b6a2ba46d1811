package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-8h tier (Poisson-bootstrap CIs, weighted
  * TextRank keywords, MMR diversified selection). Each test recomputes the
  * result in plain Scala from raw parquet — an independent code path from
  * the DataFrame plans under test — plus the structural properties each
  * operator exists to provide (CI brackets the point estimate, ranks sum
  * to 1 over the graph, the MMR panel is strictly more diverse than the
  * top-k-by-relevance panel).
  */
class Round8hQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def r(x: Double, d: Int): Double = {
    val m = math.pow(10, d); math.rint(x * m) / m
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q_bootstrap_ci: replicate order statistics match a plain-Scala recompute") {
    val out = SparkEntry.queries("q_bootstrap_ci")(spark, sf).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2),
        x.getDouble(3), x.getDouble(4), x.getDouble(5)))).toMap
    val daily = new graft.engine.Catalog(spark, sf).events
      .select("event_type", "ts").collect()
      .map(x => (x.getString(0), x.getTimestamp(1).toLocalDateTime.toLocalDate))
      .groupBy(identity).view.mapValues(_.length.toDouble)
      .toSeq.map { case ((et, d), n) => (et, d.toString, n) }
    val cdf = Array(0.36787944117144233, 0.7357588823428847,
      0.9196986029286058, 0.9810118431238462, 0.9963401531726563,
      0.9994058151824183)
    def w(u: Double): Double = {
      val i = cdf.indexWhere(u < _); if (i < 0) 6.0 else i.toDouble
    }
    val want = daily.groupBy(_._1).map { case (et, days) =>
      val ms = (0 until 200).map { b =>
        var sw = 0.0; var swx = 0.0
        days.foreach { case (_, d, x) =>
          val u = (java.lang.Long.parseLong(
            md5hex(s"$et:$d:$b").substring(0, 4), 16) + 0.5) / 65536.0
          val wt = w(u); sw += wt; swx += wt * x
        }
        (b, r(swx / sw, 6))
      }
      val sorted = ms.sortBy(m => (m._2, m._1)).map(_._2)
      val mean = sorted.sum / 200
      val se = math.sqrt(sorted.map(m => (m - mean) * (m - mean)).sum / 199)
      et -> ((days.length.toLong,
        r(days.map(_._3).sum / days.length, 4),
        sorted(9), sorted(189), r(se, 4)))
    }
    assert(out.keySet == want.keySet)
    want.foreach { case (et, (n, mean, lo, hi, se)) =>
      val (gn, gmean, glo, ghi, gse) = out(et)
      assert(gn == n, s"$et n_days")
      assert(math.abs(gmean - mean) < 1e-9, s"$et mean")
      assert(math.abs(glo - lo) < 1e-9, s"$et lo: $glo vs $lo")
      assert(math.abs(ghi - hi) < 1e-9, s"$et hi: $ghi vs $hi")
      // the replicate-sum accumulation order differs between code paths —
      // compare se at its displayed grid with 1-ulp slack
      assert(math.abs(gse - se) <= 1e-4 + 1e-9, s"$et se")
      // a sane bootstrap brackets the point estimate with positive width
      assert(glo < gmean && gmean < ghi, s"$et CI brackets the mean")
      assert(gse > 0.0, s"$et se positive")
    }
  }

  test("q_textrank: matches a plain-Scala weighted-PageRank recompute; mass sums to 1") {
    val out = SparkEntry.queries("q_textrank")(spark, sf).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getDouble(2)))
    assert(out.length == 20)
    val texts = new graft.engine.Catalog(spark, sf).documents
      .select("text").collect().map(_.getString(0))
    val edges = scala.collection.mutable.Map.empty[(String, String), Long]
    texts.map(_.split(" ")).filter(_.length >= 2).foreach { ws =>
      ws.sliding(2).foreach { p =>
        if (p(0) != p(1)) {
          val k = if (p(0) < p(1)) (p(0), p(1)) else (p(1), p(0))
          edges(k) = edges.getOrElse(k, 0L) + 1
        }
      }
    }
    val sym = edges.toSeq.flatMap { case ((a, b), w) =>
      Seq((a, b, w), (b, a, w))
    }.groupBy(e => (e._1, e._2)).view.mapValues(_.map(_._3).sum).toMap
    val strength = sym.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum.toDouble).toMap
    val n = strength.size.toDouble
    var pr = strength.keys.map(_ -> r(1.0 / n, 9)).toMap
    for (_ <- 1 to 3) {
      val contrib = sym.toSeq.map { case ((src, dst), w) =>
        dst -> (pr(src) * w / strength(src))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      pr = contrib.map { case (id, c) => id -> r(0.15 / n + 0.85 * c, 9) }
    }
    val want = pr.toSeq.map { case (t, p) => (t, r(p, 6)) }
      .sortBy { case (t, p) => (-p, t) }.take(20)
    out.zip(want).foreach { case ((rank, gt, gp), (t, p)) =>
      assert(gt == t && math.abs(gp - p) < 1e-9, s"rank $rank: ($gt,$gp) vs ($t,$p)")
    }
    // total rank mass ≈ 1 (teleport + damped flow conserves mass up to
    // the per-iteration 1e-9 snaps)
    val mass = pr.values.sum
    assert(math.abs(mass - 1.0) < 1e-4, s"rank mass $mass")
  }

  test("q_mmr_diverse: matches a plain-Scala greedy mirror; panel beats top-k on diversity") {
    val out = SparkEntry.queries("q_mmr_diverse")(spark, sf).collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getDouble(2), x.getDouble(3)))
    assert(out.length == 10)
    val vecs = new graft.engine.Catalog(spark, sf).embeddings
      .select("vec_id", "embedding").collect()
      .map(x => (x.getLong(0),
        x.getSeq[Float](1).map(_.toDouble).toArray))
      .filter { case (_, v) => math.sqrt(v.map(a => a * a).sum) > 0 }
      .map { case (id, v) =>
        val nrm = math.sqrt(v.map(a => a * a).sum); (id, v.map(_ / nrm))
      }
    val dim = vecs.head._2.length
    // exact-decimal per-dim mean mirror: sum in BigDecimal, round 9
    val mean = (0 until dim).map { i =>
      val s = vecs.map(v => BigDecimal(v._2(i)).setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
      // the query casts the decimal sum to double BEFORE the count divide
      r(s.toDouble / vecs.length, 9)
    }.toArray
    val mn = math.sqrt(mean.map(x => x * x).sum)
    val q = mean.map(_ / mn)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val rel = vecs.map { case (id, v) => id -> r(dot(v, q), 6) }.toMap
    val byId = vecs.toMap
    var sel = Vector.empty[Long]
    var scores = Vector.empty[Double]
    for (_ <- 1 to 10) {
      val cand = vecs.filter(v => !sel.contains(v._1))
      val best = cand.map { case (id, v) =>
        val sc =
          if (sel.isEmpty) rel(id)
          else r(0.7 * rel(id) - 0.3 * sel.map(s => r(dot(v, byId(s)), 6)).max, 6)
        (id, sc)
      }.maxBy { case (id, sc) => (sc, -id) }
      sel :+= best._1; scores :+= best._2
    }
    assert(out.map(_._2).toVector == sel,
      s"selection: ${out.map(_._2).toVector} vs $sel")
    out.zipWithIndex.foreach { case ((rank, id, grel, gsc), i) =>
      assert(rank == i + 1)
      assert(math.abs(grel - rel(id)) < 1e-9, s"rel of $id")
      assert(math.abs(gsc - scores(i)) < 1e-9, s"score of $id")
    }
    // the point of MMR: the selected panel is more diverse (lower mean
    // pairwise cosine) than the pure top-k-by-relevance panel
    def meanPairSim(ids: Seq[Long]): Double = {
      val ps = for (i <- ids.indices; j <- i + 1 until ids.length)
        yield dot(byId(ids(i)), byId(ids(j)))
      ps.sum / ps.length
    }
    val topK = rel.toSeq.sortBy { case (id, rv) => (-rv, id) }
      .take(10).map(_._1)
    assert(meanPairSim(sel) < meanPairSim(topK),
      s"MMR panel not more diverse: ${meanPairSim(sel)} vs ${meanPairSim(topK)}")
  }
}
