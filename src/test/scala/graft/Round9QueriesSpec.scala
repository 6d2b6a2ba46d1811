package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-9 additions: gap-free surrogate keys,
  * Markov removal-effect attribution, and k-fold cross-validated
  * nearest-centroid classification. Each test replays the query's pinned
  * spec sequentially in plain Scala (the established mirror style) so the
  * distributed formulation is verified against an independent
  * implementation, not just the DuckDB oracle restatement.
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
