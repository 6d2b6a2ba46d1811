package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the fifth batch of round-5 queries (association
  * mining, kNN join, journeys, engagement) — brute-force references over
  * collected rows, independent of the distributed formulations. */
class Round5eQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val events = spark.read.parquet(s"$sf/events.parquet")
    .transform(graft.engine.TsNorm.normalizeTs(_))
    .select("event_id", "user_id", "event_type", "ts")
    .as[(Long, Long, String, java.sql.Timestamp)].collect()

  test("cooccur_lift: supports/confidence/lift match brute-force counting") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_partkey") % 5 === 0)
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect().distinct
    val nOrders = li.map(_._1).distinct.length.toLong
    val item = li.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    val byOrder = li.groupBy(_._1).values
    val pairCounts = byOrder.flatMap { xs =>
      val ps = xs.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      .filter(_._2 >= 5)
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = pairCounts.map { case ((a, b), sab) =>
      (a, b, sab, r4(sab.toDouble / item(a)),
        r4(sab.toDouble * nOrders / (item(a).toDouble * item(b))))
    }.toSeq.sortBy(t => (-t._5, t._1, t._2)).take(20).toSet
    val got = SparkEntry.queries("q_cooccur_lift")(spark, sf)
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    assert(got == expected)
  }

  test("knn_join: top-3 neighbors per query vector match exact brute force") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val norms = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val byId = vecs.toMap
    val expected = vecs.filter(_._1 % 50 == 0).flatMap { case (qid, qe) =>
      vecs.filter(_._1 != qid)
        .map { case (nid, ne) => (nid, dot(qe, ne) / (norms(qid) * norms(nid))) }
        .sortBy { case (nid, sim) => (-sim, nid) }.take(3).zipWithIndex
        .map { case ((nid, sim), i) => (qid, (i + 1).toLong, nid) }
    }.toSet
    val got = SparkEntry.queries("q_knn_join")(spark, sf)
      .select("qid", "rk", "nid").as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
    assert(byId.nonEmpty) // keep byId referenced (documents the fixture)
  }

  test("bpe_pairs: frequency-weighted adjacent char pairs over the distinct vocab") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").as[String].collect()
    val wf = docs.flatMap(_.split(" ", -1)).groupBy(identity)
      .map { case (w, xs) => w -> xs.length.toLong }
    val expected = wf.toSeq.filter(_._1.length >= 2).flatMap { case (w, f) =>
      w.sliding(2).map(_ -> f)
    }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
      .toSeq.sortBy { case (p, n) => (-n, p) }.take(20).toSet
    val got = SparkEntry.queries("q_bpe_pairs")(spark, sf)
      .as[(String, Long)].collect().toSet
    assert(got == expected)
  }

  test("trending: per-day top-3 event types with day-over-day ratio") {
    val daily = events.groupBy(e =>
      (java.time.LocalDate.ofEpochDay(Math.floorDiv(e._4.getTime, 86400000L)), e._3))
      .map { case ((d, t), xs) => (d, t, xs.size.toLong) }.toSeq
    val prev = daily.map { case (d, t, n) => (d, t) ->
      daily.find(x => x._2 == t && x._1 == d.minusDays(1)).map(_._3)
    }.toMap
    val expected = daily.groupBy(_._1).toSeq.flatMap { case (d, xs) =>
      xs.sortBy(x => (-x._3, x._2)).take(3).zipWithIndex.map { case ((_, t, n), i) =>
        (d.toString, (i + 1).toLong, t, n, prev((d, t)).map(p => n.toDouble / p))
      }
    }.toSet
    val got = SparkEntry.queries("q_trending")(spark, sf)
      .select(date_format(col("d"), "yyyy-MM-dd"), col("rk"), col("event_type"),
        col("n"), col("dod"))
      .as[(String, Long, String, Long, Option[Double])].collect().toSet
    // Compare growth ratios at the declared rounding.
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)) ==
      expected.map(t => (t._1, t._2, t._3, t._4, t._5.map(r4))))
  }

  test("event_paths: first-3-step paths per user, counted") {
    val expected = events.groupBy(_._2).values.map { es =>
      es.sortBy(e => (e._4.getTime, e._1)).take(3).map(_._3).mkString(" > ")
    }.groupBy(identity).map { case (p, xs) => (p, xs.size.toLong) }.toSet
    val got = SparkEntry.queries("q_event_paths")(spark, sf)
      .as[(String, Long)].collect().toSet
    assert(got == expected)
  }

  test("stream_restart is exactly-once: restart from checkpoint never re-processes") {
    val got = SparkEntry.queries("q_stream_restart")(spark, sf)
      .as[(String, Long, Long, Double)].head()
    val purchases = events.filter(_._3 == "purchase")
    assert(got._1 == "purchase")
    assert(got._2 == purchases.length.toLong, "row count != batch")
    assert(got._2 == got._3, "duplicate rows: wave 1 was re-processed on restart")
  }

  test("window_first_last anchors match per-customer brute force") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .as[(Long, Long, Double)].collect()
    val expected = orders.groupBy(_._2).values.flatMap { os =>
      val sorted = os.sortBy(_._1)
      val nv2 = if (sorted.length >= 2) Some(sorted(1)._3) else None
      sorted.map(o => (o._1, sorted.head._3, sorted.last._3, nv2))
    }.toSet
    val got = SparkEntry.queries("q_window_first_last")(spark, sf)
      .as[(Long, Double, Double, Option[Double])].collect().toSet
    assert(got == expected)
  }

  test("weighted_sample: deterministic A-Res keys, top-5 per source by u^(1/w)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "doc_id", "n_chars").as[(String, Long, Long)].collect()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = docs.groupBy(_._1).values.flatMap { ds =>
      ds.map { case (src, id, nc) =>
        val v = Integer.parseInt(md5hex(id.toString).take(4), 16).toDouble
        (src, id, nc, math.pow((v + 0.5) / 65536.0, 1.0 / nc))
      }.sortBy { case (_, id, _, k) => (-k, id) }.take(5)
        .map { case (src, id, nc, _) => (src, id, nc) }
    }.toSet
    val got = SparkEntry.queries("q_weighted_sample")(spark, sf)
      .as[(String, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("substr_dup: windowed-hash dup fractions match brute-force counting") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("source") === "src0")
      .select("doc_id", "text").as[(Long, String)].collect()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val wins = docs.flatMap { case (id, t) =>
      (1 to math.max(t.length - 40 + 1, 1) by 10)
        .map(i => (id, md5hex(t.substring(i - 1, math.min(i - 1 + 40, t.length)))))
    }
    val dup = wins.groupBy(_._2).filter(_._2.map(_._1).distinct.size >= 2).keySet
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = wins.groupBy(_._1).map { case (id, ws) =>
      val nDup = ws.count(w => dup(w._2))
      (id, ws.length.toLong, nDup.toLong, r4(nDup.toDouble / ws.length))
    }.toSet
    val got = SparkEntry.queries("q_substr_dup")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == expected)
  }

  test("ann_recall: reported recall equals the independently-computed overlap") {
    import graft.llm.Similarity
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def r(x: Double, n: Int): Double =
      BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byId = emb.toMap
    val expected = (0L to 4L).flatMap { qid =>
      val qv = byId(qid)
      val exact = emb.map { case (id, v) => (id, r(cos(qv, v), 4)) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
      Seq("lsh", "ivf").map { m =>
        val ids = (if (m == "lsh")
            Similarity.lshTopK(spark.read.parquet(s"$sf/embeddings.parquet"),
              "vec_id", "embedding", qv, 10, nPlanes = 8)
          else
            Similarity.ivfTopK(spark.read.parquet(s"$sf/embeddings.parquet"),
              "vec_id", "embedding", qv, 10, nLists = 8, nProbe = 3))
          .select("vec_id").as[Long].collect().toSet
        (qid, m, r(ids.count(exact).toDouble / 10, 2))
      }
    }.toSet
    val got = SparkEntry.queries("q_ann_recall")(spark, sf)
      .as[(Long, String, Double)].collect().toSet
    assert(got == expected)
    assert(got.forall { case (_, _, rec) => rec >= 0.0 && rec <= 1.0 })
  }

  test("embed_diversity: sum-vector identity equals brute-force mean pairwise dot") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("label"), col("embedding").cast("array<double>"))
      .as[(Int, Seq[Double])].collect()
    val expected = emb.groupBy(_._1).filter(_._2.length >= 2).map { case (lb, xs) =>
      val vs = xs.map(_._2)
      var tot = 0.0; var np = 0L
      for (i <- vs.indices; j <- (i + 1) until vs.size) {
        tot += vs(i).zip(vs(j)).map { case (a, b) => a * b }.sum; np += 1
      }
      lb -> tot / np
    }
    val got = SparkEntry.queries("q_embed_diversity")(spark, sf)
      .as[(Int, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet == expected.keySet)
    for ((lb, exp) <- expected) {
      assert(got(lb)._1 == emb.count(_._1 == lb).toLong)
      // identity halves the pair sum exactly; only fp noise + round(6) differ
      assert(math.abs(got(lb)._2 - exp) < 2e-6, s"label $lb: ${got(lb)._2} vs $exp")
    }
  }

  test("cdc_chunk: content-defined boundaries match brute-force windowed hashing") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = docs.map { case (id, t) =>
      val bs = (8 to math.max(t.length, 8)).filter { i =>
        i < t.length &&
          Integer.parseInt(md5hex(t.substring(i - 8, i)).take(2), 16) % 32 == 0
      }
      val ps = 0 +: bs :+ t.length
      val lens = ps.sliding(2).map(p => p(1) - p(0)).toSeq
      (id, (bs.length + 1).toLong, r4(t.length.toDouble / (bs.length + 1)),
        lens.max.toLong)
    }.toSet
    val got = SparkEntry.queries("q_cdc_chunk")(spark, sf)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(got == expected)
  }

  test("leakage_safe_split: cluster-keyed assignment, no dup cluster straddles splits") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("source") === "src0")
      .select("doc_id", "text").as[(Long, String)].collect()
    def grams(t: String): Seq[String] = {
      val w = t.trim.split("\\s+").toSeq
      if (w.length < 3) Seq(w.mkString(" "))
      else w.sliding(3).map(_.mkString(" ")).toSeq.distinct
    }
    val byGram = docs.flatMap { case (id, t) => grams(t).map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val edges = byGram.values.filter(_.size == 2)
      .map(ds => (ds.min, ds.max)).filter(p => p._1 != p._2).toSet
    // union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    // comp = min reachable = find (min-union keeps the min as root)
    val rep = docs.map { case (id, _) => id -> find(id) }.toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def splitOf(r: Long): String = {
      val hv = Integer.parseInt(md5hex(r.toString).take(2), 16)
      if (hv < 204) "train" else if (hv < 230) "val" else "test"
    }
    // the leakage property itself: both ends of every dup edge co-locate
    for ((a, b) <- edges)
      assert(splitOf(rep(a)) == splitOf(rep(b)), s"edge ($a,$b) split across sets")
    val expected = docs.map { case (id, _) => (splitOf(rep(id)), rep(id)) }
      .groupBy(_._1).map { case (sp, xs) =>
        (sp, xs.length.toLong, xs.map(_._2).distinct.length.toLong)
      }.toSet
    val got = SparkEntry.queries("q_leakage_safe_split")(spark, sf)
      .as[(String, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("quality_blend: percentile blend + top-3 match brute force per source") {
    // quality comes from the oracle-checked kernel (q_quality_score); the
    // brute force here independently re-derives the percent_rank blend and
    // the per-source cut.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("doc_id"), col("n_chars"),
        graft.llm.TextStats.qualityScore(col("text")).as("quality"))
      .as[(String, Long, Long, Double)].collect()
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, xs) =>
      val n = xs.length
      def prOf(f: ((String, Long, Long, Double)) => Double): Map[Long, Double] = {
        val byVal = xs.map(f).sorted
        xs.map { t =>
          val rank = byVal.indexWhere(_ == f(t)) // first index of equal value = rank-1
          t._2 -> (if (n == 1) 0.0 else rank.toDouble / (n - 1))
        }.toMap
      }
      val pq = prOf(_._4)
      val pl = prOf(_._3.toDouble)
      xs.map { case (_, id, _, _) =>
        (src, id, r6(pq(id) * 0.6 + pl(id) * 0.4))
      }.sortBy { case (_, id, b) => (-b, id) }.take(3)
    }.toSet
    val got = SparkEntry.queries("q_quality_blend")(spark, sf)
      .as[(String, Long, Double)].collect().toSet
    assert(got == expected)
  }

  test("ann_tradeoff: curve monotone, ends at recall 1.0, agrees with ann_recall at p=3") {
    val curve = SparkEntry.queries("q_ann_tradeoff")(spark, sf)
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(curve.map(_._1).toSeq == (1L to 8L), s"curve points: ${curve.toSeq}")
    // recall and scan fraction both non-decreasing in nProbe
    assert(curve.sliding(2).forall(p => p(1)._2 >= p(0)._2), s"recall not monotone: ${curve.toSeq}")
    assert(curve.sliding(2).forall(p => p(1)._3 >= p(0)._3), s"frac not monotone: ${curve.toSeq}")
    // nProbe = nLists probes everything: exact search, recall exactly 1.0,
    // full corpus scanned per query
    assert(curve.last._2 == 1.0 && curve.last._3 == 1.0, s"endpoint: ${curve.last}")
    // cross-check the p=3 point against q_ann_recall's independent ivf rows
    val ivfAvg = SparkEntry.queries("q_ann_recall")(spark, sf)
      .filter(col("method") === "ivf").as[(Long, String, Double)].collect()
      .map(_._3).sum / 5
    assert(math.abs(curve(2)._2 - ivfAvg) < 1e-9,
      s"p=3 recall ${curve(2)._2} != ann_recall ivf avg $ivfAvg")
  }

  test("token_budget: prefix-sum cutoff matches brute-force per-source fill") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "doc_id", "n_chars").as[(String, Long, Long)].collect()
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, xs) =>
      val taken = xs.sortBy(_._2)
        .scanLeft(("", 0L, 0L, 0L)) { case ((_, _, _, c), (s2, id, nc)) => (s2, id, nc, c + nc) }
        .drop(1).takeWhile(_._4 <= 5000)
      if (taken.isEmpty) None
      else Some((src, taken.length.toLong, taken.map(_._3).sum))
    }.toSet
    val got = SparkEntry.queries("q_token_budget")(spark, sf)
      .as[(String, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("entry flagship returns rows (the driver smoke-check contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("csv_malformed: permissive read nulls exactly the poisoned cells") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice").as[(Long, Double)].collect()
    val got = SparkEntry.queries("q_csv_malformed")(spark, sf)
      .as[(Long, Long, Double)].head()
    assert(got._1 == orders.length.toLong)
    assert(got._2 == orders.count(_._1 % 10 == 0).toLong)
    val cleanSum = orders.filter(_._1 % 10 != 0).map(_._2).sum
    assert(math.abs(got._3 - cleanSum) < 0.5)
  }

  test("schema_evolution: merged scan surfaces both generations' columns") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey").as[Long].collect()
    val df = SparkEntry.queries("q_schema_evolution")(spark, sf)
    val got = df.as[(Long, Long, Long, Double)].head()
    assert(got._1 == orders.length.toLong)
    assert(got._2 == orders.count(_ % 2 == 0).toLong)
    assert(got._3 == orders.count(_ % 2 != 0).toLong)
    assert(got._2 + got._3 == got._1)
  }

  test("dau_mau: trailing-28-day distinct actives per day") {
    // UTC epoch-day arithmetic, independent of the test JVM's zone (the
    // session TZ is pinned UTC, so to_date buckets by UTC days).
    val ud = events.map(e =>
      (java.time.LocalDate.ofEpochDay(Math.floorDiv(e._4.getTime, 86400000L)), e._2)).distinct
    val days = ud.map(_._1).distinct
    val expected = days.map { d =>
      val dau = ud.count(_._1 == d).toLong
      val mau = ud.filter { case (ad, _) =>
        !ad.isAfter(d) && !ad.isBefore(d.minusDays(27))
      }.map(_._2).distinct.length.toLong
      (d.toString, dau, mau)
    }.toSet
    val got = SparkEntry.queries("q_dau_mau")(spark, sf)
      .select(date_format(col("d"), "yyyy-MM-dd"), col("dau"), col("mau"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == expected)
  }
}
