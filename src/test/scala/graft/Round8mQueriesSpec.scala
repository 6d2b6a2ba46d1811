package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-8m tier (WordPiece greedy-vs-Viterbi
  * tokenizer audit). The mirror retrains the unigram model and re-runs both
  * decode rules in plain Scala — independent of the codegen kernels — and
  * pins the theory the audit rests on: Viterbi's score dominates greedy's
  * on EVERY panel entry, the two agree exactly when their segmentations
  * coincide, and the aggregate row reproduces the mirror's numbers.
  */
class Round8mQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def r(x: Double, d: Int): Double = {
    val m = math.pow(10, d); math.rint(x * m) / m
  }

  test("q_wordpiece_audit: aggregate matches a plain-Scala dual-decoder mirror") {
    val row = SparkEntry.queries("q_wordpiece_audit")(spark, sf).collect().head
    val docs = new graft.engine.Catalog(spark, sf).documents
      .select("text").collect().map(_.getString(0))
    // Same trained model as the query (memoized trainer, same params).
    val model = graft.llm.Unigram.trained(
      new graft.engine.Catalog(spark, sf).documents, "text")
    val logp = model.map(p => p.piece -> p.logp).toMap
    val maxLen = model.map(_.piece.length).max
    val oov = graft.functions.UnigramViterbi.OovLogp

    def viterbi(w: String): Seq[String] = {
      val n = w.length
      val best = Array.fill(n + 1)(0.0)
      val back = new Array[Int](n + 1)
      for (i <- 1 to n) {
        best(i) = Double.NegativeInfinity; back(i) = i - 1
        var found = false
        for (j <- math.max(0, i - maxLen) until i)
          logp.get(w.substring(j, i)).foreach { lp =>
            val cand = best(j) + lp
            if (cand > best(i)) { best(i) = cand; back(i) = j; found = true }
          }
        if (!found) { best(i) = best(i - 1) + oov; back(i) = i - 1 }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = n
      while (pos > 0) { out += w.substring(back(pos), pos); pos = back(pos) }
      out.reverse.toSeq
    }
    def greedy(w: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = 0
      while (pos < w.length) {
        var len = math.min(maxLen, w.length - pos)
        while (len > 1 && !logp.contains(w.substring(pos, pos + len))) len -= 1
        out += w.substring(pos, pos + len)
        pos += len
      }
      out.toSeq
    }
    def score(seg: Seq[String]): Double =
      seg.foldLeft(0.0)((a, p) => a + logp.getOrElse(p, oov))

    // Same glued-bigram panel: top-500 by (freq desc, string asc). Slide
    // over RAW split slots and drop empties AFTER gluing — the exact Spark
    // construction (zip_with over adjacent slices, then length>0) — so on
    // consecutive spaces both sides emit the bare words rather than the
    // mirror gluing across the gap.
    val panel = docs.toSeq
      .flatMap(t => t.split(" ", -1).sliding(2)
        .collect { case arr if arr.length == 2 => arr(0) + arr(1) }
        .filter(_.nonEmpty))
      .groupBy(w => w).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, f) => (-f, w) }.take(500)
    assert(panel.nonEmpty)

    var nOpt = 0L
    var massV = 0.0; var massG = 0.0; var mass = 0.0
    var sumGap = 0.0; var maxGap = 0.0
    panel.foreach { case (w, f) =>
      val (vs, gs) = (viterbi(w), greedy(w))
      val (sv, sg) = (score(vs), score(gs))
      // The DP optimum dominates maximum munch on every entry.
      assert(sv >= sg - 1e-9, s"$w: viterbi $sv < greedy $sg")
      // Identical segmentations ⇒ identical scores to the bit.
      if (vs == gs) assert(sv == sg, w)
      if (sg >= sv - 1e-9) nOpt += 1
      mass += f; massV += f * vs.length; massG += f * gs.length
      val gap = sv - sg
      sumGap += gap; if (gap > maxGap) maxGap = gap
    }
    assert(row.getLong(0) === panel.size.toLong)
    assert(row.getLong(1) === nOpt)
    assert(row.getDouble(2) === r(massV / mass, 4))
    assert(row.getDouble(3) === r(massG / mass, 4))
    assert(math.abs(row.getDouble(4) - sumGap / panel.size) < 1e-3)
    assert(math.abs(row.getDouble(5) - maxGap) < 1e-3)
  }

  test("q_holt_winters: trajectory matches a plain-Scala integer fold") {
    val out = SparkEntry.queries("q_holt_winters")(spark, sf).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2),
        x.getDouble(3), x.getDouble(4), x.getDouble(5), x.getDouble(6))))
      .toMap
    val daily = new graft.engine.Catalog(spark, sf).events
      .select("event_type", "ts").collect()
      .map(x => (x.getString(0), x.getTimestamp(1).toLocalDateTime.toLocalDate))
      .groupBy(e => e).view.mapValues(_.length.toLong).toSeq
      .map { case ((et, d), n) => (et, d, n * 1000000L) }
    val mirror = daily.groupBy(_._1).collect {
      case (et, days) if days.size >= 8 =>
        val ys = days.sortBy(_._2).map(_._3).toArray
        val n = ys.length
        var l = ys.take(7).sum / 7 // integer div — exact micro-units
        var b = 0L
        val s = Array.tabulate(7)(d => ys(d) - l)
        for (i <- 7 until n) {
          val d = i % 7
          val lNew = (ys(i) - s(d) + l + b) / 2
          val bNew = (3 * (lNew - l) + 7 * b) / 10
          s(d) = (ys(i) - lNew + 4 * s(d)) / 5
          l = lNew; b = bNew
        }
        et -> ((n.toLong, l / 1e6, b / 1e6, (s.max - s.min) / 1e6,
          (l + b + s(n % 7)) / 1e6, (l + 7 * b + s((n + 6) % 7)) / 1e6))
    }
    assert(out === mirror)
    // Seasonality must actually be learned (non-zero spread) somewhere, or
    // the seasonal component is dead weight.
    assert(out.values.exists(_._4 > 0.0))
  }

  test("q_tokenizer_bench: fertility table matches a plain-Scala recompute") {
    val rows = SparkEntry.queries("q_tokenizer_bench")(spark, sf).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2),
        x.getDouble(3)))).toMap
    assert(rows.keySet ===
      Set("bpe_10merge", "unigram_viterbi", "wordpiece_greedy"))
    val docs = new graft.engine.Catalog(spark, sf).documents
    val wf = docs.select("text").collect().map(_.getString(0)).toSeq
      .flatMap(_.split(" ", -1).filter(_.nonEmpty))
      .groupBy(w => w).view.mapValues(_.size.toLong).toSeq
    val model = graft.llm.Unigram.trained(docs, "text")
    val byPiece = model.sortBy(_.piece)
    val kernelV = graft.functions.UnigramViterbi(
      org.apache.spark.sql.GraftSqlBridge.expression(
        org.apache.spark.sql.functions.lit("x")),
      byPiece.map(_.piece).toArray, byPiece.map(_.logp).toArray)
    val kernelG = graft.functions.WordPieceGreedy(
      org.apache.spark.sql.GraftSqlBridge.expression(
        org.apache.spark.sql.functions.lit("x")),
      byPiece.map(_.piece).toArray, byPiece.map(_.logp).toArray)
    def table(nt: String => Long): (Long, Double, Double) = {
      val toks = wf.map { case (w, f) => f * nt(w) }.sum
      val words = wf.map(_._2).sum
      val chars = wf.map { case (w, f) => f * w.length }.sum
      (toks, math.rint(toks.toDouble / words * 1e4) / 1e4,
        math.rint(chars.toDouble / toks * 1e4) / 1e4)
    }
    import org.apache.spark.unsafe.types.UTF8String
    assert(rows("unigram_viterbi") ===
      table(w => kernelV.segment(UTF8String.fromString(w)).length.toLong))
    assert(rows("wordpiece_greedy") ===
      table(w => kernelG.segment(UTF8String.fromString(w)).length.toLong))
    // BPE leg: greedy maximum munch never beats Viterbi fertility on the
    // shared vocab, and the BPE sentinel makes its count ≥ word count.
    assert(rows("wordpiece_greedy")._2 >= rows("unigram_viterbi")._2)
    assert(rows("bpe_10merge")._1 >= wf.map(_._2).sum)
  }
}
