package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-9 additions: gap-free surrogate keys,
  * Markov removal-effect and exact Shapley attribution, k-fold CV,
  * streaming outer-join/late-data drills, the grid spatial join, IPW and
  * doubly-robust AIPW, personalized PageRank, scene cuts, Matryoshka
  * truncation, RAKE keyphrases, and sequential pattern mining. Each test
  * replays the query's pinned spec sequentially in plain Scala (the
  * established mirror style) so the distributed formulation is verified
  * against an independent implementation, not just the DuckDB oracle
  * restatement.
  */
class Round9QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("q_surrogate_keys: a gap-free permutation matching the global sort") {
    val out = SparkEntry.queries("q_surrogate_keys")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = out.length
    assert(n > 0)
    // gap-free: sk is exactly {1..n}, no holes, no duplicates
    assert(out.map(_._2).sorted.toSeq === (1L to n).toSeq)
    // order-correct: sk equals the rank under the (o_orderdate, o_orderkey)
    // total order computed independently from the raw table
    val raw = new graft.engine.Catalog(spark, sf).orders
      .selectExpr("o_orderkey", "CAST(o_orderdate AS STRING) AS d").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val rank = raw.sortBy { case (k, d) => (d, k) }.map(_._1)
      .zipWithIndex.map { case (k, i) => k -> (i + 1L) }.toMap
    out.foreach { case (k, sk) =>
      assert(sk === rank(k), s"o_orderkey $k: sk $sk != rank ${rank(k)}")
    }
  }

  test("q_markov_attribution: matches a sequential mirror of the pinned walk") {
    val rows = SparkEntry.queries("q_markov_attribution")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq === Seq("click", "error", "signup", "view"))

    // Mirror: rebuild the truncated journeys sequentially
    val ev = new graft.engine.Catalog(spark, sf).events
      .selectExpr("user_id", "event_type", "CAST(ts AS STRING) AS t", "event_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val paths = ev.groupBy(_._1).values.map { es =>
      val sorted = es.sortBy(e => (e._3, e._4)).map(_._2).toList
      val i = sorted.indexOf("purchase")
      if (i >= 0) sorted.take(i + 1) else sorted
    }
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    paths.foreach { p =>
      ("start" :: p).sliding(2).foreach {
        case List(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
        case _ =>
      }
    }
    val tot = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val p = counts.toSeq.map { case ((i, j), n) => (i, j, n.toDouble / tot(i)) }
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    def conv(removed: Option[String]): Double = {
      val pr = p.filter { case (i, j, _) => removed.forall(c => i != c && j != c) }
      var mass = Map("start" -> 1.0); var cv = 0.0
      for (_ <- 1 to 6) {
        val next = pr.filter { case (i, _, _) => mass.contains(i) }
          .groupBy(_._2).view
          .mapValues(es => r9(es.map { case (i, _, pij) => mass(i) * pij }.sum)).toMap
        cv += next.getOrElse("purchase", 0.0)
        mass = next - "purchase"
      }
      r9(cv)
    }
    val full = conv(None)
    rows.foreach { case (c, cf, cr, lift) =>
      assert(cf === full, s"conv_full for $c")
      assert(cr === conv(Some(c)), s"conv_removed for $c")
      assert(lift === r9(full - cr), s"lift for $c")
      // removal only deletes paths — it can never create conversion mass
      assert(cr <= cf + 1e-9, s"removal increased conversion for $c")
    }
    assert(full > 0.0 && full <= 1.0)
  }

  test("q_stream_outer_join: unmatched purchases emit -1; matches the batch left join") {
    val out = SparkEntry.queries("q_stream_outer_join")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.exists(_._2 == -1L), "no unmatched purchase emitted — outer emission broken")
    assert(out.exists(_._2 != -1L), "no matched purchase emitted")
    val ev = new graft.engine.Catalog(spark, sf).events
    val p = ev.filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .selectExpr("event_id AS purchase_id", "user_id AS pu", "ts AS pts")
    val e = ev.filter(org.apache.spark.sql.functions.col("event_type") === "error")
      .selectExpr("event_id AS eid", "user_id AS eu", "ts AS ets")
    val batch = p.join(e,
        org.apache.spark.sql.functions.expr(
          "pu = eu AND ets >= pts AND ets < pts + INTERVAL 1 HOUR"), "left")
      .selectExpr("purchase_id", "coalesce(eid, -1) AS error_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.sorted === batch.sorted)
  }

  test("q_stream_late_drop: the late file contributes nothing; only closed days emit") {
    val out = SparkEntry.queries("q_stream_late_drop")(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    assert(out.nonEmpty)
    val ev = new graft.engine.Catalog(spark, sf).events
    val mx = ev.agg(org.apache.spark.sql.functions.max("ts")).head().getTimestamp(0)
    val expected = ev
      .filter(org.apache.spark.sql.functions.col("ts") >=
        org.apache.spark.sql.functions.lit(mx) -
          org.apache.spark.sql.functions.expr("INTERVAL 30 DAYS"))
      .groupBy(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")).as("day"))
      .count()
      .filter(org.apache.spark.sql.functions.expr(
        s"CAST(day + 1 AS TIMESTAMP) <= TIMESTAMP '$mx' - INTERVAL 1 HOUR"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    assert(out === expected)
  }

  test("q_geo_join: the grid join equals the brute-force all-pairs join") {
    val out = SparkEntry.queries("q_geo_join")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out.nonEmpty)
    assert(out.forall(_._3 <= 25.0))
    // Independent mirror: brute-force haversine over the same derived
    // points — proves the 3x3 cell neighborhood loses no pair.
    def frac(tag: String, id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$tag$id".getBytes("UTF-8"))
      val p = ((md(0) & 0xffL) << 16) | ((md(1) & 0xffL) << 8) | (md(2) & 0xffL)
      p.toDouble / 16777216.0
    }
    val ids = new graft.engine.Catalog(spark, sf).customer
      .selectExpr("c_custkey").collect().map(_.getLong(0))
      .filter(k => k % 4 == 0 && k <= 6000).sorted
    val pts = ids.map(k =>
      (k, 50.0 + frac("lat_", k) * 8.0, -6.0 + frac("lon_", k) * 8.0))
    def hav(a: (Long, Double, Double), b: (Long, Double, Double)): Double = {
      val sLat = math.sin(math.toRadians((b._2 - a._2) / 2))
      val sLon = math.sin(math.toRadians((b._3 - a._3) / 2))
      2 * 6371.0 * math.asin(math.sqrt(sLat * sLat +
        math.cos(math.toRadians(a._2)) * math.cos(math.toRadians(b._2)) *
          sLon * sLon))
    }
    val brute = (for {
      i <- pts.indices; j <- (i + 1) until pts.length
      d = hav(pts(i), pts(j)) if d <= 25.0
    } yield (pts(i)._1, pts(j)._1, d)).toSeq
    assert(out.map(p => (p._1, p._2)).sorted === brute.map(p => (p._1, p._2)).sorted)
    val od = out.map(p => ((p._1, p._2), p._3)).toMap
    brute.foreach { case (a, b, d) =>
      // out carries the 3-decimal display round; compare raw within 5e-4.
      assert(math.abs(od((a, b)) - d) <= 5.1e-4, s"pair ($a,$b)")
    }
  }

  test("q_shapley_attribution: efficiency axiom holds; credit is non-trivial") {
    val rows = SparkEntry.queries("q_shapley_attribution")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.map(_._1).toSeq === Seq("click", "error", "signup", "view"))
    // Efficiency: sum of phis = v(all channels) - v(empty set), computed
    // from an independent sequential mirror of the coalition values.
    val ev = new graft.engine.Catalog(spark, sf).events
      .selectExpr("user_id", "CAST(to_date(ts) AS STRING) AS day",
        "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getTimestamp(3), r.getLong(4)))
    // Journey unit = (user, day), truncated at the day's first purchase —
    // the query's session definition. (.toSeq BEFORE the map: mapping a
    // Map to (set, conv) pairs would rebuild a Map and silently collapse
    // cells sharing a channel set.)
    val sets = ev.groupBy(e => (e._1, e._2)).toSeq.map { case (_, es) =>
      // Full sub-second precision: getTime alone would collapse distinct
      // microsecond timestamps into one millisecond.
      val sorted = es.sortBy(e =>
        (e._4.toInstant.getEpochSecond, e._4.toInstant.getNano.toLong, e._5))
      val cut = sorted.indexWhere(_._3 == "purchase")
      val kept = if (cut < 0) sorted else sorted.take(cut + 1)
      val conv = if (cut < 0) 0L else 1L
      (kept.filter(_._3 != "purchase").map(_._3).distinct.toSet, conv)
    }.toSeq
    def rate(pred: Set[String] => Boolean): Double = {
      val cov = sets.filter(s => pred(s._1))
      if (cov.isEmpty) 0.0
      else math.rint(cov.map(_._2).sum.toDouble / cov.size * 1e9) / 1e9
    }
    val vFull = rate(_ => true)
    val vEmpty = rate(_.isEmpty)
    val sumPhi = rows.map(_._2).sum
    // phis are 6-decimal-rounded; 4 of them bound the drift at 2e-6.
    assert(math.abs(sumPhi - (vFull - vEmpty)) <= 2.5e-6,
      s"sum(phi)=$sumPhi vs v(N)-v(empty)=${vFull - vEmpty}")
    assert(rows.exists(_._2 != 0.0), "all-zero attribution")
  }

  test("q_ipw_effect: estimates are finite, bounded, and both arms populated") {
    val r = SparkEntry.queries("q_ipw_effect")(spark, sf).collect()
    assert(r.length === 1)
    val (n, nTreat) = (r(0).getLong(0), r(0).getLong(1))
    val (naive, ipw) = (r(0).getDouble(2), r(0).getDouble(3))
    assert(n > 0 && nTreat > 0 && nTreat < n, s"degenerate arms: $nTreat/$n")
    assert(math.abs(naive) <= 1.0 && math.abs(ipw) <= 1.0)
    // With clipped propensities the IPW estimate stays in the same
    // ballpark as the naive difference (both estimate a bounded-outcome
    // effect on this corpus) — a sign flip beyond noise would mean the
    // weighting machinery, not the data, moved it.
    assert(!naive.isNaN && !ipw.isNaN)
  }

  test("q_ppr: mass conserved; seeds flagged; scores non-negative") {
    val rows = SparkEntry.queries("q_ppr")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(rows.count(_._2) === math.min(5, rows.length))
    // Seeds are the 5 lowest node ids.
    assert(rows.filter(_._2).map(_._1).sorted.toSeq ===
      rows.map(_._1).sorted.take(math.min(5, rows.length)).toSeq)
    assert(rows.forall(_._3 >= 0.0))
    // Symmetric graph, every node deg >= 1: the walk loses no mass, so
    // total ppr = 1 up to per-node 9-decimal rounding.
    val total = rows.map(_._3).sum
    assert(math.abs(total - 1.0) <= 1e-4, s"mass=$total")
    // Restart concentrates mass near the seeds: seed average beats the
    // non-seed average.
    val (sd, ns) = rows.partition(_._2)
    if (ns.nonEmpty)
      assert(sd.map(_._3).sum / sd.length > ns.map(_._3).sum / ns.length)
  }

  test("q_scene_cuts: matches an in-memory mirror of the frame-hash walk") {
    val out = SparkEntry.queries("q_scene_cuts")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(out.nonEmpty)
    val docs = new graft.engine.Catalog(spark, sf).documents
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out.map(_._1).toSet === docs.keySet)
    out.take(25).foreach { case (id, nF, nC, first) =>
      val bytes = docs(id).getBytes("UTF-8")
      val frames = bytes.grouped(48).toArray
      val hs = frames.map(graft.multimodal.Multimodal.dHash64)
      val dists = hs.sliding(2).collect {
        case Array(a, b) => java.lang.Long.bitCount(a ^ b) }.toArray
      assert(nF === frames.length.toLong, s"doc $id n_frames")
      assert(nC === dists.count(_ > 20).toLong, s"doc $id n_cuts")
      val fc = dists.indexWhere(_ > 20)
      assert(first === (if (fc < 0) -1L else fc + 1L), s"doc $id first_cut")
    }
  }

  test("q_matryoshka: truncated cosines match an in-memory mirror; full-dim error is zero") {
    val out = SparkEntry.queries("q_matryoshka")(spark, sf).collect()
      .map(r => (r.getLong(0), (2 to 8).map(r.getDouble).toVector))
    assert(out.nonEmpty)
    val emb = new graft.engine.Catalog(spark, sf).embeddings
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    def cosK(a: Array[Double], b: Array[Double], k: Int): Double = {
      var (ab, aa, bb) = (0.0, 0.0, 0.0)
      var i = 0
      while (i < k) { ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1 }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    out.take(50).foreach { case (idA, cols) =>
      val (va, vb) = (emb(idA), emb(idA + 1))
      val Vector(c64, c16, c32, c48, e16, e32, e48) = cols
      assert(math.abs(c64 - cosK(va, vb, 64)) <= 1e-6, s"pair $idA cos64")
      assert(math.abs(c16 - cosK(va, vb, 16)) <= 1e-6, s"pair $idA cos16")
      assert(math.abs(c32 - cosK(va, vb, 32)) <= 1e-6, s"pair $idA cos32")
      assert(math.abs(c48 - cosK(va, vb, 48)) <= 1e-6, s"pair $idA cos48")
      assert(math.abs(e16 - math.abs(cosK(va, vb, 16) - cosK(va, vb, 64))) <= 2e-6)
      assert(math.abs(e48 - math.abs(cosK(va, vb, 48) - cosK(va, vb, 64))) <= 2e-6)
    }
    // More dims -> less distortion, on average (the Matryoshka claim).
    val (s16, s48) = (out.map(_._2(4)).sum, out.map(_._2(6)).sum)
    assert(s16 >= s48, s"mean err16 ${s16 / out.length} < mean err48 ${s48 / out.length}")
  }

  test("q_rake_keyphrases: matches a sequential RAKE mirror") {
    val out = SparkEntry.queries("q_rake_keyphrases")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length === 20)
    val stops = graft.llm.TextStats.EnglishStops.toSet
    val docs = new graft.engine.Catalog(spark, sf).documents
      .selectExpr("text").collect().map(_.getString(0))
    // Candidate phrases: maximal stopword-free runs (empty tokens break
    // runs exactly as the positional gaps do in the query).
    val phrases = docs.flatMap { text =>
      val toks = text.split(" ", -1)
      val runs = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
      var cur = Vector.empty[String]
      toks.foreach { t =>
        if (t.isEmpty || stops(t)) { if (cur.nonEmpty) runs += cur; cur = Vector.empty }
        else cur :+= t
      }
      if (cur.nonEmpty) runs += cur
      runs
    }
    val freq = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val deg = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    phrases.foreach(p => p.foreach { w => freq(w) += 1; deg(w) += p.length })
    val score = phrases.distinct.map { p =>
      (p.mkString(" "), p.foldLeft(0.0)((a, w) => a + deg(w).toDouble / freq(w)))
    }.toMap
    val occur = phrases.groupBy(_.mkString(" ")).view.mapValues(_.length.toLong)
    val top = score.toSeq
      .map { case (p, sc) => (p, math.rint(sc * 1e6) / 1e6) }
      .sortBy { case (p, sc) => (-sc, p) }.take(20)
    assert(out.map(_._1).toSeq === top.map(_._1).toSeq)
    out.foreach { case (p, nw, no, sc) =>
      assert(nw === p.split(" ").length.toLong)
      assert(no === occur(p))
      assert(math.abs(sc - score(p)) <= 1e-6, s"phrase '$p'")
    }
  }

  test("q_aipw_effect: estimates finite and bounded; arms populated; n = cell count") {
    val r = SparkEntry.queries("q_aipw_effect")(spark, sf).collect()
    assert(r.length === 1)
    val (n, nTreat) = (r(0).getLong(0), r(0).getLong(1))
    val (om, aipw) = (r(0).getDouble(2), r(0).getDouble(3))
    assert(n > 0 && nTreat > 0 && nTreat < n)
    val cells = new graft.engine.Catalog(spark, sf).events
      .selectExpr("user_id", "to_date(ts) AS day").distinct().count()
    assert(n === cells)
    assert(!om.isNaN && !aipw.isNaN)
    assert(math.abs(om) <= 1.5 && math.abs(aipw) <= 1.5)
    // AIPW and plain IPW estimate the same target on the same cells —
    // they must land in the same neighborhood.
    val ipw = SparkEntry.queries("q_ipw_effect")(spark, sf).collect()(0).getDouble(3)
    assert(math.abs(aipw - ipw) <= 0.25, s"aipw $aipw vs ipw $ipw")
  }

  test("q_seq_patterns: support matches a sequential subsequence-mining mirror") {
    val out = SparkEntry.queries("q_seq_patterns")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3)))
    assert(out.nonEmpty && out.length <= 15)
    val ev = new graft.engine.Catalog(spark, sf).events
      .selectExpr("user_id", "CAST(to_date(ts) AS STRING) AS day",
        "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getTimestamp(3), r.getLong(4)))
    val support = scala.collection.mutable.Map.empty[(String, String, String), Long]
      .withDefaultValue(0L)
    ev.groupBy(e => (e._1, e._2)).foreach { case (_, es) =>
      val seq = es.sortBy(e =>
        (e._4.toInstant.getEpochSecond, e._4.toInstant.getNano.toLong, e._5))
        .map(_._3).toVector
      val pats = (for {
        i <- seq.indices; j <- (i + 1) until seq.length
        k <- (j + 1) until seq.length
      } yield (seq(i), seq(j), seq(k))).toSet
      pats.foreach(p => support(p) += 1)
    }
    val top = support.toSeq.sortBy { case ((a, b, c), n) => (-n, a, b, c) }
      .take(15)
    assert(out.toSeq === top)
  }

  test("q_negative_sampling: every draw matches the exact alias table") {
    val out = SparkEntry.queries("q_negative_sampling")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getString(2)))
    val docs = new graft.engine.Catalog(spark, sf).documents
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.length === docs.length * 5)
    // Rebuild the alias table sequentially: ^0.75 as sqrt(f*sqrt(f)) —
    // the same two exactly-rounded IEEE ops the query computes.
    val freq = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ordered = freq.keys.toSeq.sorted
    val wt = ordered.map(w =>
      w -> math.round(math.sqrt(freq(w) * math.sqrt(freq(w).toDouble)) * 1e6))
    val total = wt.map(_._2).sum
    val bounds = wt.scanLeft(("", 0L, 0L)) { case ((_, _, hi), (w, x)) =>
      (w, hi, hi + x) }.drop(1) // (w, lo, hi)
    val B = 4096
    val alias = (0 until B).map { b =>
      val u = (2L * b + 1) * total / (2 * B)
      b.toLong -> bounds.find(t => u >= t._2 && u < t._3).get._1
    }.toMap
    def md5b(s0: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(7), 16) % B
    }
    val om = out.toMap
    docs.foreach { case (id, _) =>
      (0 to 4).foreach { k =>
        assert(om((id, k)) === alias(md5b(s"${id}_$k")), s"doc $id slot $k")
      }
    }
  }

  test("q_merkle_root: matches a sequential Merkle build; tampering flips the root") {
    val out = SparkEntry.queries("q_merkle_root")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(out.nonEmpty)
    def md5hex(s0: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def root(leaves: Seq[String]): String = {
      var lvl = leaves
      while (lvl.length > 1)
        lvl = lvl.grouped(2).map {
          case Seq(a, b) => md5hex(a + b)
          case Seq(a) => a
        }.toSeq
      lvl.head
    }
    val docs = new graft.engine.Catalog(spark, sf).documents
      .selectExpr("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val bySource = docs.groupBy(_._1)
    out.foreach { case (src, n, r) =>
      val leaves = bySource(src).sortBy(_._2).map(t => md5hex(t._3))
      assert(n === leaves.length.toLong, s"source $src n_docs")
      assert(r === root(leaves), s"source $src root")
      // Integrity property: any single-leaf change must flip the root.
      val tampered = leaves.updated(leaves.length / 2, md5hex("tampered"))
      assert(root(tampered) !== r, s"source $src root insensitive to tamper")
    }
  }

  test("q_ann_ivfpq: reranked recall@10 vs exact brute force clears the floor") {
    val out = SparkEntry.queries("q_ann_ivfpq")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.length === 30)
    // dist2 ascends within each query and carries no self-hit.
    out.groupBy(_._1).foreach { case (qid, rows) =>
      val d = rows.sortBy(_._2).map(_._4)
      assert(d.zip(d.tail).forall { case (a, b) => a <= b }, s"q $qid order")
      assert(!rows.exists(_._3 == qid), s"q $qid self-hit")
    }
    val emb = new graft.engine.Catalog(spark, sf).embeddings
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 0) v.map(_ / n) else v
    }
    val recalls = Seq(3L, 57L, 201L).map { qid =>
      val qu = unit(emb(qid))
      val exact = emb.toSeq.filter(_._1 != qid).map { case (id, v) =>
        val u = unit(v)
        (id, u.zip(qu).map { case (x, y) => (x - y) * (x - y) }.sum)
      }.sortBy(t => (t._2, t._1)).take(10).map(_._1).toSet
      val got = out.filter(_._1 == qid).map(_._3).toSet
      exact.intersect(got).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.5, s"mean recall@10 $mean (per-query: $recalls)")
  }

  test("q_stream_full_outer: both sides' unmatched rows emit; matches the batch full join") {
    val out = SparkEntry.queries("q_stream_full_outer")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.exists(_._2 == -1L), "no unmatched purchase emitted")
    assert(out.exists(_._1 == -1L), "no unmatched error emitted")
    val ev = new graft.engine.Catalog(spark, sf).events
    val p = ev.filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .selectExpr("event_id AS pid", "user_id AS pu", "ts AS pts")
    val e = ev.filter(org.apache.spark.sql.functions.col("event_type") === "error")
      .selectExpr("event_id AS eid", "user_id AS eu", "ts AS ets")
    val batch = p.join(e,
        org.apache.spark.sql.functions.expr(
          "pu = eu AND ets >= pts AND ets < pts + INTERVAL 1 HOUR"), "full")
      .selectExpr("coalesce(pid, -1) AS purchase_id", "coalesce(eid, -1) AS error_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.sorted === batch.sorted)
  }

  test("q_cate_segments: strata partition the cells; per-stratum arms consistent") {
    val rows = SparkEntry.queries("q_cate_segments")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.length >= 2, "degenerate segmentation")
    val cells = new graft.engine.Catalog(spark, sf).events
      .selectExpr("user_id", "to_date(ts) AS day").distinct().count()
    assert(rows.map(_._2).sum === cells, "strata do not partition the cells")
    rows.foreach { case (seg, n, nTreat, cate) =>
      assert(nTreat >= 0 && nTreat <= n, s"segment $seg arms")
      cate.foreach(c => assert(math.abs(c) <= 1.5 && !c.isNaN, s"segment $seg cate"))
    }
    // At least one stratum has both arms and therefore a real contrast.
    assert(rows.exists(_._4.isDefined))
  }

  test("q_uplift_bands: bands partition the cells; estimates bounded") {
    val rows = SparkEntry.queries("q_uplift_bands")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(rows.nonEmpty)
    val cells = new graft.engine.Catalog(spark, sf).events
      .selectExpr("user_id", "to_date(ts) AS day").distinct().count()
    assert(rows.map(_._2).sum === cells, "bands do not partition the cells")
    assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.toSeq)
    rows.foreach { case (band, n, nTreat, pred, actual) =>
      assert(nTreat >= 0 && nTreat <= n, s"band $band arms")
      assert(math.abs(pred) <= 1.0 && !pred.isNaN, s"band $band pred")
      // The mean predicted uplift must actually sit inside its band.
      assert(pred >= band / 20.0 - 1e-6 && pred < (band + 1) / 20.0 + 1e-6,
        s"band $band pred $pred outside [${band / 20.0}, ${(band + 1) / 20.0})")
      actual.foreach(a => assert(math.abs(a) <= 1.0 && !a.isNaN))
    }
    assert(rows.exists(_._5.isDefined), "no band has both arms")
  }

  test("q_interval_join: month bucketing equals the brute-force overlap join") {
    val out = SparkEntry.queries("q_interval_join")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getDate(1).toString, r.getLong(2))).toSeq
    assert(out.nonEmpty)
    val orders = new graft.engine.Catalog(spark, sf).orders
      .selectExpr("o_orderkey", "CAST(CAST(o_orderdate AS DATE) AS STRING) AS d")
      .collect()
      .map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1))))
    val promos = (0 until 24).map { i =>
      val start = java.time.LocalDate.parse("1992-01-01").plusMonths(3L * i)
      (i, start, start.plusDays(45))
    }
    val brute = promos.map { case (id, ps, pe) =>
      val n = orders.count { case (_, os) =>
        os.isBefore(pe) && ps.isBefore(os.plusDays(14))
      }
      (id, ps.toString, n.toLong)
    }.filter(_._3 > 0)
    assert(out === brute)
  }

  test("q_sparse_cosine: pair similarities match an in-memory TF-IDF mirror") {
    val out = SparkEntry.queries("q_sparse_cosine")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    assert(out.forall(p => p._4 >= 0.3 && p._4 <= 1.0 + 1e-6))
    assert(out.forall(_._3 >= 1L))
    val docs = new graft.engine.Catalog(spark, sf).documents
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = docs.length.toDouble
    val tf = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
    }.toMap
    val dfm = tf.values.flatMap(_.keys).groupBy(identity).view
      .mapValues(_.size).filter(_._2 <= 25).toMap
    def wv(id: Long): Map[String, Double] =
      tf(id).collect { case (t, f) if dfm.contains(t) =>
        t -> f * math.log(n / dfm(t)) }.toMap
    out.take(15).foreach { case (a, b, shared, sim) =>
      val (va, vb) = (wv(a), wv(b))
      val common = va.keySet.intersect(vb.keySet)
      assert(shared === common.size.toLong, s"pair ($a,$b) shared terms")
      val dot = common.toSeq.sorted.map(t => va(t) * vb(t)).sum
      val na = math.sqrt(va.values.map(x => x * x).sum)
      val nb = math.sqrt(vb.values.map(x => x * x).sum)
      assert(math.abs(sim - dot / (na * nb)) <= 1e-4, s"pair ($a,$b)")
    }
  }

  test("q_cv_folds: every row tested exactly once; accuracy consistent") {
    val rows = SparkEntry.queries("q_cv_folds")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq === (0 until 5).toSeq)
    val catl = new graft.engine.Catalog(spark, sf)
    val total = catl.embeddings.count()
    assert(rows.map(_._2).sum === total, "fold n_test must partition the corpus")
    // per-fold sizes match the id % 5 rule
    val foldSizes = catl.embeddings.selectExpr("CAST(vec_id % 5 AS INT) AS f")
      .groupBy("f").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.foreach { case (f, nTest, nCorrect, acc) =>
      assert(nTest === foldSizes(f))
      assert(nCorrect >= 0 && nCorrect <= nTest)
      assert(acc === math.rint(nCorrect.toDouble / nTest * 1e4) / 1e4)
    }
  }
}
