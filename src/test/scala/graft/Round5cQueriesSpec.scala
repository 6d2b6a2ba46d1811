package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the third batch of round-5 queries — each compares
  * the declared query against an independently-coded small-scale reference
  * (brute force over collected rows), so a rewrite of the distributed shape
  * can't silently change the math. */
class Round5cQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "lang", "source", "text", "n_chars")
    .as[(Long, String, String, String, Long)].collect()

  private lazy val events = spark.read.parquet(s"$sf/events.parquet")
    .transform(graft.engine.TsNorm.normalizeTs(_))
    .select("event_id", "user_id", "event_type", "ts")
    .as[(Long, Long, String, java.sql.Timestamp)].collect()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("train_split assigns every doc by md5-byte boundary; splits partition the corpus") {
    val expected = docs.map { case (id, _, _, _, nc) =>
      val hv = Integer.parseInt(md5hex(id.toString).take(2), 16)
      val split = if (hv < 204) "train" else if (hv < 230) "val" else "test"
      (split, nc)
    }.groupBy(_._1).map { case (s2, xs) => (s2, xs.length.toLong, xs.map(_._2).sum) }
      .toSet
    val got = SparkEntry.queries("q_train_split")(spark, sf)
      .as[(String, Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.toSeq.map(_._2).sum == docs.length.toLong)
  }

  test("doc_chunk: width-8/stride-6 chunks, short tail kept, counts match brute force") {
    val expected = docs.map { case (id, _, _, text, _) =>
      val w = text.split(" ", -1)
      val chunks = (0 to (w.length - 1) / 6)
        .map(i => w.slice(i * 6, i * 6 + 8).mkString(" "))
      (id, chunks.size.toLong, chunks.distinct.size.toLong)
    }.toSet
    val got = SparkEntry.queries("q_doc_chunk")(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("transition_matrix counts consecutive same-user event-type pairs") {
    val expected = events.groupBy(_._2).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._4.getTime, e._1))
      sorted.zip(sorted.tail).map { case (a, b) => (a._3, b._3) }
    }.groupBy(identity).map { case ((a, b), xs) => (a, b, xs.size.toLong) }.toSet
    val got = SparkEntry.queries("q_transition_matrix")(spark, sf)
      .as[(String, String, Long)].collect().toSet
    assert(got == expected)
  }

  test("inflight: running concurrency equals brute-force per-day interval membership") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(to_date(col("l_shipdate")).as("d"), col("l_orderkey"))
      .as[(java.sql.Date, Long)].collect()
    val deltas = scala.collection.mutable.Map.empty[Long, Long] // epoch day -> delta
    li.foreach { case (d, k) =>
      val d0 = d.toLocalDate.toEpochDay
      val transit = k % 30 + 1
      deltas(d0) = deltas.getOrElse(d0, 0L) + 1
      deltas(d0 + transit + 1) = deltas.getOrElse(d0 + transit + 1, 0L) - 1
    }
    var acc = 0L
    val running = deltas.toSeq.sortBy(_._1).map { case (d, del) =>
      acc += del; (java.time.LocalDate.ofEpochDay(d).toString, acc)
    }
    val expected = running.sortBy { case (d, n) => (-n, d) }.take(10).toSet
    val got = SparkEntry.queries("q_inflight")(spark, sf)
      .as[(java.sql.Date, Long)].collect()
      .map { case (d, n) => (d.toString, n) }.toSet
    assert(got == expected)
  }

  test("bigram_pmi matches brute-force PMI on frequent adjacent pairs") {
    val toks = docs.map(_._4.split(" ", -1))
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nTok = uni.values.sum.toDouble
    val bi = toks.filter(_.length >= 2)
      .flatMap(w => w.zip(w.tail))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
      .filter(_._2 >= 20)
    val scored = bi.toSeq.map { case ((a, b), cab) =>
      val pmi = BigDecimal(math.log(cab * nTok / (uni(a).toDouble * uni(b))))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, cab, pmi)
    }
    val expected = scored.sortBy { case (a, b, _, p) => (-p, a, b) }.take(20).toSet
    val got = SparkEntry.queries("q_bigram_pmi")(spark, sf)
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == expected)
  }

  test("unigram_logprob: per-doc cross-entropy under the corpus unigram model") {
    val toks = docs.map { case (id, _, _, text, _) => id -> text.split(" ", -1) }
    val uni = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nTok = uni.values.sum.toDouble
    val expected = toks.map { case (id, w) =>
      id -> w.map(t => -math.log(uni(t) / nTok)).sum / w.length
    }.toMap
    val got = SparkEntry.queries("q_unigram_logprob")(spark, sf)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, x) =>
      assert(math.abs(x - expected(id)) < 1e-3, s"doc $id: $x vs ${expected(id)}")
    }
  }

  test("map_funcs: exploded filtered map equals per-doc token counts >= 5") {
    val expected = docs.flatMap { case (id, _, _, text, _) =>
      text.split(" ", -1).groupBy(identity).collect {
        case (tok, xs) if xs.length >= 5 => (id, tok, xs.length.toLong)
      }
    }.toSet
    val got = SparkEntry.queries("q_map_funcs")(spark, sf)
      .as[(Long, String, Long)].collect().toSet
    assert(got == expected)
  }

  test("anomaly_days flags exactly the days above trailing mean + 1.5 sigma") {
    val daily = events.groupBy(e => e._4.toLocalDateTime.toLocalDate)
      .view.mapValues(_.size.toLong).toSeq.sortBy(_._1.toEpochDay)
    val expected = daily.indices.flatMap { i =>
      val hist = daily.slice(math.max(0, i - 14), i).map(_._2)
      if (hist.length < 7) None
      else {
        val mu = hist.sum.toDouble / hist.length
        val sd = math.sqrt(hist.map(x => (x - mu) * (x - mu)).sum / (hist.length - 1))
        if (daily(i)._2 > mu + 1.5 * sd) Some(daily(i)._1.toString) else None
      }
    }.toSet
    val got = SparkEntry.queries("q_anomaly_days")(spark, sf)
      .select("d").as[java.sql.Date].collect().map(_.toString).toSet
    assert(got == expected)
  }

  test("xml_roundtrip: export → schema-on-read re-read is lossless") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderstatus", "o_totalprice")
      .as[(String, Double)].collect()
    val expected = orders.groupBy(_._1).map { case (st, xs) =>
      (st, xs.length.toLong,
        BigDecimal(xs.map(_._2).sum).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = SparkEntry.queries("q_xml_roundtrip")(spark, sf)
      .as[(String, Long, Double)].collect().toSet
    // compare with tolerance on the rounded double sum (summation order)
    assert(got.map(r => (r._1, r._2)) == expected.map(r => (r._1, r._2)))
    got.foreach { case (st, _, total) =>
      val exp = expected.find(_._1 == st).get._3
      assert(math.abs(total - exp) < 0.02, s"$st: $total vs $exp")
    }
  }

  test("debounce keeps exactly the burst-start events (gap > 5 min, per user+type)") {
    val expected = events.groupBy(e => (e._2, e._3)).toSeq
      .flatMap { case ((_, typ), es) =>
        val sorted = es.sortBy(e => (e._4.getTime, e._1))
        sorted.zipWithIndex.map { case (e, i) =>
          val keep = i == 0 ||
            (e._4.getTime - sorted(i - 1)._4.getTime) > 5 * 60 * 1000
          (typ, keep)
        }
      }.groupBy(_._1).map { case (typ, xs) =>
        (typ, xs.size.toLong, xs.count(_._2).toLong)
      }.toSet
    val got = SparkEntry.queries("q_debounce")(spark, sf)
      .as[(String, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("graph_degree: histogram matches brute-force degrees of the rare-gram graph") {
    val srcDocs = docs.filter(_._3 == "src0")
    val grams = srcDocs.flatMap { case (id, _, _, text, _) =>
      val w = text.split("\\s+")
      val gs = if (w.length < 3) Seq(w.mkString(" "))
      else w.sliding(3).map(_.mkString(" ")).toSeq.distinct
      gs.map(g => (g, id))
    }
    val edges = grams.groupBy(_._1).values.collect {
      case xs if xs.map(_._2).distinct.size == 2 =>
        val ids = xs.map(_._2).distinct.sorted
        (ids.head, ids.last)
    }.toSet
    val degree = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = degree.values.groupBy(identity)
      .map { case (d, xs) => (d, xs.size.toLong) }.toSet
    val got = SparkEntry.queries("q_graph_degree")(spark, sf)
      .as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("zipf slope: OLS over log rank / log freq of each source's top tokens") {
    val bySource = docs.groupBy(_._3)
    val expected = bySource.map { case (src, rows) =>
      val counts = rows.flatMap(_._4.split(" ", -1))
        .groupBy(identity).view.mapValues(_.length.toLong).toSeq
        .sortBy { case (t, c) => (-c, t) }.take(500)
      val pts = counts.zipWithIndex.map { case ((_, c), i) =>
        (math.log(i + 1.0), math.log(c.toDouble))
      }
      val n = pts.length.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val (sxy, sxx) = (pts.map(p => p._1 * p._2).sum, pts.map(p => p._1 * p._1).sum)
      src -> (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }
    val got = SparkEntry.queries("q_zipf")(spark, sf)
      .select("source", "zipf_slope").as[(String, Double)].collect().toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (src, s2) =>
      assert(math.abs(got(src) - s2) < 1e-3, s"$src: ${got(src)} vs $s2")
      // natural-language sanity: slope is negative (frequency decays in rank)
      assert(got(src) < 0)
    }
  }
}
