package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the fourth batch of round-5 queries (record linkage,
  * time-series/CDC, retrieval) — each declared query is compared against an
  * independently-coded brute-force reference over collected rows. */
class Round5dQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")
    .select("o_orderkey", "o_custkey", "o_totalprice")
    .as[(Long, Long, Double)].collect()

  private lazy val events = spark.read.parquet(s"$sf/events.parquet")
    .transform(graft.engine.TsNorm.normalizeTs(_))
    .select("event_id", "user_id", "event_type", "ts")
    .as[(Long, Long, String, java.sql.Timestamp)].collect()

  private def us(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000) % 1000

  test("ema folds the integer-cent recurrence per customer in orderkey order") {
    val expected = orders.groupBy(_._2).toSeq.flatMap { case (k, os) =>
      val sorted = os.sortBy(_._1)
      val cents = sorted.map(o => (o._1, math.round(o._3 * 100)))
      val emas = cents.tail.scanLeft((cents.head._1, cents.head._2)) {
        case ((_, prev), (okey, xc)) => (okey, (3 * xc + 7 * prev) / 10)
      }
      emas.map { case (okey, e) => (k, okey, e / 100.0) }
    }.toSet
    val got = SparkEntry.queries("q_ema")(spark, sf)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected)
  }

  test("interval_merge coalesces touching 5-minute spans per user") {
    val expected = events.groupBy(_._2).flatMap { case (uid, es) =>
      val sorted = es.sortBy(e => (us(e._4), e._1))
      // Sweep: running max of interval ends decides island breaks.
      var maxEnd = Long.MinValue
      val islands = collection.mutable.ArrayBuffer.empty[collection.mutable.ArrayBuffer[(Long, Long)]]
      for (e <- sorted) {
        val start = us(e._4); val end = start + 300000000L
        if (islands.isEmpty || start > maxEnd)
          islands += collection.mutable.ArrayBuffer((start, end))
        else islands.last += ((start, end))
        maxEnd = math.max(maxEnd, end)
      }
      islands.map(iv => (uid, iv.map(_._1).min, iv.map(_._2).max, iv.size.toLong))
    }.toSet
    val got = SparkEntry.queries("q_interval_merge")(spark, sf)
      .select(col("user_id"), unix_micros(col("start_ts")),
        unix_micros(col("end_ts")), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("scd2 emits one row per status change with contiguous validity") {
    val got = SparkEntry.queries("q_scd2")(spark, sf)
      .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect()
    val expected = events.filter(_._2 % 20 == 0).groupBy(_._2).toSeq.flatMap { case (uid, es) =>
      val sorted = es.sortBy(e => (us(e._4), e._1))
      val changes = sorted.zip(Option.empty[String] +: sorted.map(e => Some(e._3)))
        .collect { case (e, prev) if !prev.contains(e._3) => e }
      changes.zip(changes.drop(1).map(c => Some(c._4)) :+ None).map {
        case (c, to) => (uid, c._3, us(c._4), to.map(us))
      }
    }.toSet
    assert(got.map(r => (r._1, r._2, us(r._3), r._4.map(us))).toSet == expected)
    // Validity is contiguous: each row's valid_to equals the next valid_from.
    got.groupBy(_._1).values.foreach { rows =>
      val s = rows.sortBy(r => us(r._3))
      s.zip(s.tail).foreach { case (a, b) =>
        assert(a._4.contains(b._3), s"gap in user ${a._1}")
      }
      assert(s.last._4.isEmpty) // current row stays open
    }
  }

  test("cdc_diff classes partition the key universe and counts match brute force") {
    val old = orders.filter(_._1 % 3 != 0).map(o => o._1 -> o._3).toMap
    val nw = orders.filter(_._1 % 5 != 0)
      .map(o => o._1 -> (if (o._1 % 7 == 0) o._3 * 1.1 else o._3)).toMap
    val keys = old.keySet ++ nw.keySet
    val classes = keys.groupBy { k =>
      (old.get(k), nw.get(k)) match {
        case (None, _) => "insert"
        case (_, None) => "delete"
        case (Some(a), Some(b)) if a != b => "update"
        case _ => "unchanged"
      }
    }.map { case (c, ks) => c -> ks.size.toLong }
    val got = SparkEntry.queries("q_cdc_diff")(spark, sf)
      .select("change_type", "n").as[(String, Long)].collect().toMap
    assert(got == classes)
    assert(got.values.sum == keys.size.toLong)
  }

  test("oov_rate: per-source OOV fraction against the global top-1000 vocab") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").as[(String, String)].collect()
    val toks = docs.flatMap { case (src, t) => t.split(" ", -1).map(src -> _) }
    val vocab = toks.groupBy(_._2).map { case (t, xs) => (t, xs.length) }.toSeq
      .sortBy { case (t, n) => (-n, t) }.take(1000).map(_._1).toSet
    val expected = toks.groupBy(_._1).map { case (src, xs) =>
      val oov = xs.count(x => !vocab(x._2))
      (src, xs.length.toLong, oov.toLong)
    }.toSet
    val got = SparkEntry.queries("q_oov_rate")(spark, sf)
      .select("source", "n_tok", "n_oov").as[(String, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("inverted_index: df-banded posting lists are sorted and complete") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val expected = docs.flatMap { case (id, t) => t.split(" ", -1).distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted)
      .filter { case (_, ids) => ids.size >= 5 && ids.size <= 8 }
      .map { case (t, ids) => (t, ids.size.toLong, ids.mkString(",")) }.toSet
    val got = SparkEntry.queries("q_inverted_index")(spark, sf)
      .as[(String, Long, String)].collect().toSet
    assert(got == expected)
  }

  test("stream_funnel: the streaming engine's answer equals the batch funnel") {
    val batch = SparkEntry.queries("q_funnel")(spark, sf)
      .as[(Long, Long, Long, Long)].head()
    val stream = SparkEntry.queries("q_stream_funnel")(spark, sf)
      .as[(Long, Long, Long, Long)].head()
    assert(stream == batch)
    // Funnel steps are monotonically non-increasing.
    assert(stream._2 >= stream._3 && stream._3 >= stream._4)
  }

  test("jaro_winkler query scores match the kernel's driver-side compute") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_name", "c_mktsegment")
      .as[(Long, String, String)].collect().sortBy(_._1)
    def r5(x: Double): Double =
      BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = cust.zip(cust.tail).map { case (a, b) =>
      (a._1, r5(graft.functions.JaroWinkler.compute(a._2, b._2, winkler = true)),
        r5(graft.functions.JaroWinkler.compute(a._2, b._2, winkler = false)),
        r5(graft.functions.JaroWinkler.compute(a._2, a._3, winkler = true)))
    }.toSet
    val got = SparkEntry.queries("q_jaro_winkler")(spark, sf)
      .as[(Long, Double, Double, Double)].collect().toSet
    assert(got == expected)
  }
}
