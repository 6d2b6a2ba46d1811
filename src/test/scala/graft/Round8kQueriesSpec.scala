package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-8k tier (customer/catalog analytics: RFM
  * segmentation, item-item collaborative filtering, linear multi-touch
  * attribution). Each test recomputes the result in plain Scala from raw
  * parquet — an independent code path from the DataFrame plans — plus the
  * structural properties each operator exists to provide (quintiles balance
  * to ±1, cosine neighbours are symmetric-consistent, credit conserves the
  * number of attributed conversions).
  */
class Round8kQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("q_rfm: quintile cube matches a plain-Scala ntile recompute") {
    val out = SparkEntry.queries("q_rfm")(spark, sf).collect()
      .map(x => (x.getInt(0), x.getInt(1), x.getInt(2)) -> x.getLong(3)).toMap
    val orders = new graft.engine.Catalog(spark, sf).orders
      .select("o_custkey", "o_orderdate", "o_totalprice").collect()
      .map(x => (x.getLong(0),
        x.get(1) match { // o_orderdate has shipped both NTZ and UTC
          case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
          case d: java.time.LocalDateTime => d.toLocalDate
        },
        BigDecimal(x.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val per = orders.groupBy(_._1).map { case (ck, os) =>
      (ck, os.map(_._2).max, os.length.toLong, os.map(_._3).sum)
    }.toSeq
    val anchor = per.map(_._2).max
    val base = per.map { case (ck, last, f, mon) =>
      (ck, java.time.temporal.ChronoUnit.DAYS.between(last, anchor), f, mon)
    }
    def ntile5[A](sorted: Seq[(Long, A)]): Map[Long, Int] = {
      val n = sorted.length; val q = n / 5; val r = n % 5
      sorted.zipWithIndex.map { case ((ck, _), idx) =>
        val b = if (idx < r * (q + 1)) idx / (q + 1) else r + (idx - r * (q + 1)) / q
        ck -> (b + 1)
      }.toMap
    }
    val rS = ntile5(base.sortBy { case (ck, rec, _, _) => (-rec, ck) }
      .map(x => (x._1, ())))
    val fS = ntile5(base.sortBy { case (ck, _, f, _) => (f, ck) }
      .map(x => (x._1, ())))
    val mS = ntile5(base.sortBy { case (ck, _, _, m) => (m, ck) }
      .map(x => (x._1, ())))
    val mirror = base.groupBy(x => (rS(x._1), fS(x._1), mS(x._1)))
      .view.mapValues(_.length.toLong).toMap
    assert(out === mirror)
    // Each marginal score is a balanced quintile (sizes differ by ≤ 1).
    val rSizes = rS.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(rSizes.size === 5)
    assert(rSizes.values.max - rSizes.values.min <= 1)
  }

  test("q_item_cf: top-5 neighbours match a brute-force cosine ranking") {
    val out = SparkEntry.queries("q_item_cf")(spark, sf).collect()
      .map(x => (x.getLong(0), x.getInt(1)) -> ((x.getLong(2), x.getLong(3),
        x.getDouble(4))))
    val li = new graft.engine.Catalog(spark, sf).lineitem
      .select("l_orderkey", "l_partkey").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
      .filter(_._2 % 5 == 0).distinct
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val cnt = li.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val cij = scala.collection.mutable.Map.empty[(Long, Long), Long]
      .withDefaultValue(0L)
    byOrder.values.foreach { ps =>
      for (a <- ps; b <- ps if a < b) cij((a, b)) += 1L
    }
    val neigh = cij.toSeq.flatMap { case ((a, b), c) =>
      Seq((a, b, c), (b, a, c))
    }.groupBy(_._1).view.mapValues { xs =>
      xs.map { case (i, j, c) =>
        (j, c, c / math.sqrt(cnt(i) * cnt(j)))
      }.sortBy { case (j, _, cos) => (-cos, j) }.take(5)
    }.toMap
    val mirror = neigh.toSeq.flatMap { case (i, ns) =>
      ns.zipWithIndex.map { case ((j, c, cos), idx) =>
        (i, idx + 1) -> ((j, c, math.rint(cos * 1e6) / 1e6))
      }
    }.toMap
    assert(out.toMap === mirror)
    // Symmetry of the estimator: cos(i,j) == cos(j,i) for any listed pair.
    out.toMap.foreach { case ((i, _), (j, c, cos)) =>
      val back = cij.getOrElse((math.min(i, j), math.max(i, j)), 0L)
      assert(back === c)
    }
  }

  test("q_attribution_linear: credit conserves attributed conversions") {
    val rows = SparkEntry.queries("q_attribution_linear")(spark, sf).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    val ev = new graft.engine.Catalog(spark, sf).events
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getTimestamp(2).getTime,
        x.getLong(3)))
    val touches = ev.filter(e => e._2 == "view" || e._2 == "click")
    val convs = ev.filter(_._2 == "purchase")
    val week = 7L * 24 * 3600 * 1000
    val pairs = for {
      c <- convs.toSeq
      t <- touches if t._1 == c._1 && t._3 <= c._3 && t._3 >= c._3 - week
    } yield (t._2, c._4)
    val k = pairs.groupBy(_._2).view.mapValues(_.length).toMap
    val mirror = pairs.groupBy(_._1).map { case (touch, ps) =>
      touch -> ((ps.length.toLong, ps.map(p => 1.0 / k(p._2)).sum))
    }
    assert(rows.keySet === mirror.keySet)
    mirror.foreach { case (touch, (n, credit)) =>
      assert(rows(touch)._1 === n)
      assert(math.abs(rows(touch)._2 - credit) < 1e-3, touch)
    }
    // Conservation: total credit equals the number of purchases that had at
    // least one touch in-window.
    assert(math.abs(rows.values.map(_._2).sum - k.size) < 1e-2)
  }
}
