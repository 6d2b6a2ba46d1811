package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-8l tier (k-core decomposition, positional
  * phrase search). Plain-Scala mirrors from raw parquet — independent of
  * the DataFrame peel loop and the postings join — plus the structural
  * guarantees: the peel reaches its fixpoint well inside the oracle's
  * 12-round unroll (the capped-oracle contract), every core vertex really
  * has ≥ k in-core neighbours, and every reported phrase hit is a true
  * token-adjacent occurrence.
  */
class Round8lQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def coPurchaseEdges(): Set[(Long, Long)] = {
    val li = new graft.engine.Catalog(spark, sf).lineitem
      .select("l_orderkey", "l_partkey").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
      .filter(_._2 % 5 == 0).distinct
    li.groupBy(_._1).values.flatMap { ps =>
      val pks = ps.map(_._2).distinct.toSeq
      for (a <- pks; b <- pks if a < b) yield (a, b)
    }.toSet
  }

  test("q_kcore: matches plain-Scala peeling; fixpoint within the cap") {
    val out = SparkEntry.queries("q_kcore")(spark, sf).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    var edges = coPurchaseEdges()
    var rounds = 0
    var changed = true
    while (changed && rounds < 12) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val keep = deg.filter(_._2 >= 12).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != edges.size
      edges = next
      rounds += 1
    }
    // Fixpoint must land comfortably inside the oracle's 12-round unroll —
    // the capped-SQL contract q_kcore documents.
    assert(!changed && rounds <= 5, s"peel took $rounds rounds")
    val mirror = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out === mirror)
    // Core guarantee: every surviving vertex keeps ≥ k in-core neighbours.
    assert(out.values.forall(_ >= 12L))
    assert(out.nonEmpty) // the synthetic co-purchase graph does have a 12-core
  }

  test("q_phrase_search: hits equal a brute-force token-scan mirror") {
    val out = SparkEntry.queries("q_phrase_search")(spark, sf).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    val docs = new graft.engine.Catalog(spark, sf).documents
      .select("doc_id", "text").collect()
      .map(x => (x.getLong(0), x.getString(1).split(" ", -1)))
    val phrases = Seq("part filter", "batch scan", "big order",
      "agg table", "slow hash batch")
    val mirror = phrases.flatMap { p =>
      val ws = p.split(" ")
      val occ = docs.flatMap { case (id, toks) =>
        (0 to toks.length - ws.length).collect {
          case i if ws.indices.forall(j => toks(i + j) == ws(j)) => id
        }
      }
      if (occ.isEmpty) None
      else Some(p -> ((occ.length.toLong, occ.distinct.length.toLong, occ.min)))
    }.toMap
    assert(out === mirror)
    // The bigram panel must actually match at this SF (the trigram may not).
    assert(Seq("part filter", "batch scan", "big order", "agg table")
      .forall(out.contains))
  }

  test("q_interpolate: filled values match a plain-Scala linear recompute") {
    val out = SparkEntry.queries("q_interpolate")(spark, sf).collect()
      .map(x => (x.getDate(0).toLocalDate, x.getBoolean(1),
        if (x.isNullAt(2)) None else Some(x.getDouble(2))))
    val ev = new graft.engine.Catalog(spark, sf).events
      .select("ts", "event_type", "value").collect()
      .map(x => (x.getTimestamp(0).toLocalDateTime.toLocalDate,
        x.getString(1), x.getDouble(2)))
    val d0 = ev.map(_._1).min; val d1 = ev.map(_._1).max
    val known = ev.filter(e => e._2 == "purchase" && e._3 >= 250)
      .groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    val days = Iterator.iterate(d0)(_.plusDays(1))
      .takeWhile(!_.isAfter(d1)).toSeq
    assert(out.map(_._1) === days) // spine covers every calendar day once
    val kd = days.filter(known.contains)
    out.foreach { case (d, isKnown, v) =>
      assert(isKnown === known.contains(d))
      if (isKnown) assert(v.contains(math.rint(known(d) * 1e4) / 1e4))
      else {
        val prev = kd.filter(_.isBefore(d)).lastOption
        val next = kd.find(_.isAfter(d))
        (prev, next) match {
          case (Some(p), Some(n)) =>
            val f = java.time.temporal.ChronoUnit.DAYS.between(p, d).toDouble /
              java.time.temporal.ChronoUnit.DAYS.between(p, n)
            val expect = known(p) + (known(n) - known(p)) * f
            assert(v.isDefined && math.abs(v.get - expect) < 1e-3, d.toString)
          case _ => assert(v.isEmpty, s"$d should stay null outside the hull")
        }
      }
    }
    // The sf0.001 series must actually be sparse, or the query proves nothing.
    assert(kd.nonEmpty && kd.size < days.size)
  }
}
