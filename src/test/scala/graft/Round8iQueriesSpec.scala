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

  /** Plain-Scala mirror of the whole unigram-EM pipeline (seed → 3 hard-EM
    * rounds → final model), including the kernel's determinism contract:
    * ascending start position, strictly-greater replacement (ties → longest
    * piece), OOV floor −25. */
  private def unigramMirror(): (Seq[(String, Long, Double)], String => Seq[String]) = {
    val docs = new graft.engine.Catalog(spark, sf).documents
      .select("text").collect().map(_.getString(0))
    val wf = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.flatMap(_.split(" ", -1)).filter(_.nonEmpty)
      .foreach(w => wf(w) += 1L)
    val maxLen = 4; val vocabSize = 200
    val subW = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    wf.foreach { case (w, f) =>
      for (i <- 0 until w.length; l <- 1 to maxLen if i + l <= w.length)
        subW(w.substring(i, i + l)) += f
    }
    val chars = subW.filter(_._1.length == 1).toSeq
    val multis = subW.filter(_._1.length > 1).toSeq
      .sortBy { case (p, w0) => (-w0, p) }.take(vocabSize)
    val seeded = chars ++ multis
    var model: Map[String, Double] = {
      val tot = seeded.map(_._2).sum.toDouble
      seeded.map { case (p, w0) => (p, graft.llm.Unigram.snapLogp(math.log(w0 / tot))) }.toMap
    }
    def viterbi(w: String, m: Map[String, Double], mL: Int): Seq[String] = {
      val n = w.length
      val best = Array.fill(n + 1)(0.0)
      val back = new Array[Int](n + 1)
      for (i <- 1 to n) {
        best(i) = Double.NegativeInfinity; back(i) = i - 1
        var found = false
        for (j <- math.max(0, i - mL) until i) {
          m.get(w.substring(j, i)).foreach { lp =>
            val cand = best(j) + lp
            if (cand > best(i)) { best(i) = cand; back(i) = j; found = true }
          }
        }
        if (!found) { best(i) = best(i - 1) - 25.0; back(i) = i - 1 }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = n
      while (pos > 0) { out += w.substring(back(pos), pos); pos = back(pos) }
      out.reverse.toSeq
    }
    var lastCounts = Map.empty[String, Long]
    for (_ <- 1 to 3) {
      val mL = model.keys.map(_.length).max
      val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      wf.foreach { case (w, f) =>
        viterbi(w, model, mL).foreach(p => counts(p) += f)
      }
      lastCounts = counts.toMap
      val kept = model.keys.toSeq.sorted.flatMap { p =>
        val c = lastCounts.getOrElse(p, 0L)
        if (c > 0) Some((p, c.toDouble))
        else if (p.length == 1) Some((p, 0.5))
        else None
      }
      val tot = kept.map(_._2).sum
      model = kept.map { case (p, w0) => (p, graft.llm.Unigram.snapLogp(math.log(w0 / tot))) }.toMap
    }
    val table = model.toSeq.map { case (p, lp) =>
      (p, lastCounts.getOrElse(p, 0L), lp)
    }.sortBy(x => (-x._2, x._1))
    val mL = model.keys.map(_.length).max
    (table, w => viterbi(w, model, mL))
  }

  test("q_unigram_train: EM model table matches the plain-Scala mirror") {
    val (table, _) = unigramMirror()
    val got = SparkEntry.queries("q_unigram_train")(spark, sf).collect()
      .map(x => (x.getInt(0), x.getString(1), x.getLong(2), x.getDouble(3)))
    assert(got.length == 20)
    got.zip(table.take(20)).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g._1 == i + 1)
      assert(g._2 == w._1 && g._3 == w._2, s"piece/cnt row $i: got $g want $w")
      assert(math.abs(g._4 - math.rint(w._3 * 1e6) / 1e6) <= 1e-9,
        s"logp row $i: got $g want $w")
    }
    // EM actually learned: multi-character pieces dominate the head
    assert(got.count(_._2.length > 1) >= 10)
  }

  test("q_unigram_segment: Viterbi segmentations match the mirror and concatenate back") {
    val (_, segment) = unigramMirror()
    val got = SparkEntry.queries("q_unigram_segment")(spark, sf).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getString(2), x.getInt(3)))
    assert(got.length == 10)
    got.foreach { case (word, _, segStr, n) =>
      val seg = segStr.split("\\|").toSeq
      assert(seg.mkString("") == word, s"segmentation doesn't concatenate: $word -> $segStr")
      assert(seg.length == n)
      assert(segment(word) == seg, s"mirror disagrees on $word: ${segment(word)} vs $seg")
    }
    // fertility: the frequent words segment into far fewer pieces than chars
    assert(got.map(_._4).sum < got.map(_._1.length).sum / 2)
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
