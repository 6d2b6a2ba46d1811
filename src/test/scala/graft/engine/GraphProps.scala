package graft.engine

import org.scalacheck.{Gen, Prop, Properties}
import graft.TestSpark

/** ScalaCheck properties for the graph operators: PageRank conserves mass
  * and respects degree symmetry; triangle counting agrees with brute force
  * on random graphs of any shape ScalaCheck throws at it. */
object GraphProps extends Properties("graft.engine.graph") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Random edge lists over a small id space: duplicates, self-loop-free,
  // disconnected components, both orientations — all legal inputs.
  private val edgesGen: Gen[List[(Long, Long)]] =
    Gen.chooseNum(1, 25).flatMap { m =>
      Gen.listOfN(m, for {
        a <- Gen.chooseNum(1L, 12L)
        b <- Gen.chooseNum(1L, 12L) if a != b
      } yield (a, b))
    }.suchThat(_.nonEmpty)

  property("pageRank: ranks sum to 1 and every node in an edge gets a rank") =
    Prop.forAll(edgesGen) { edges =>
      val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iterations = 2)
        .as[(Long, Double)].collect().toMap
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
      got.keySet == nodes &&
        math.abs(got.values.sum - 1.0) < 1e-6 &&
        got.values.forall(v => v > 0 && v < 1)
    }

  property("triangleCount == brute force over node triples") =
    Prop.forAll(edgesGen) { edges =>
      val und = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
      val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val brute = (for {
        i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
        a = nodes(i); b = nodes(j); c = nodes(k)
        if und((a, b)) && und((b, c)) && und((a, c))
      } yield 1).size.toLong
      val got = Graph.triangleCount(edges.toDF("src", "dst"), "src", "dst")
        .as[Long].head()
      got == brute
    }

  property("personalizedPageRank: full node cover, mass 1, matches the reference walk") =
    Prop.forAll(edgesGen, Gen.chooseNum(1, 3)) { (edges, nSeeds) =>
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val seeds = nodes.take(nSeeds)
      val got = Graph.personalizedPageRankKeyed(
          edges.toDF("src", "dst"), "src", "dst",
          seeds.toDF("id"), iterations = 2)
        .select("id", "pr").as[(Long, Double)].collect().toMap
      // In-memory reference of the same pinned recurrence (9-decimal
      // rounding per iteration, decimal-exact restart numerator).
      val sym = edges.flatMap(e => Seq(e, e.swap)).distinct
      val deg = sym.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
      val inb = sym.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
      val seedSet = seeds.toSet
      val restart = (BigDecimal(1) - BigDecimal(0.85)).toDouble / seeds.size
      def r9(x: Double): Double = math.rint(x * 1e9) / 1e9
      var pr = nodes.map(n =>
        n -> r9(if (seedSet(n)) 1.0 / seeds.size else 0.0)).toMap
      for (_ <- 1 to 2) {
        pr = nodes.map { v =>
          val c = inb.getOrElse(v, Seq.empty).map(u => pr(u) / deg(u)).sum
          v -> r9((if (seedSet(v)) restart else 0.0) + 0.85 * c)
        }.toMap
      }
      got.keySet == nodes.toSet &&
        math.abs(got.values.sum - 1.0) < 1e-5 &&
        nodes.forall(n => math.abs(got(n) - pr(n)) < 1e-6)
    }

  property("kCore == brute-force peel fixpoint for k in 2..3") =
    Prop.forAll(edgesGen, Gen.chooseNum(2, 3)) { (edges, k) =>
      // Oriented, de-duplicated input — the operator's documented contract.
      val und = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
        .distinct
      var cur = und.toSet
      var changed = true
      while (changed) {
        val deg = cur.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).view.mapValues(_.size).toMap
        val keep = deg.filter(_._2 >= k).keySet
        val next = cur.filter(e => keep(e._1) && keep(e._2))
        changed = next.size != cur.size
        cur = next
      }
      val brute = cur.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = Graph.kCore(und.toDF("src", "dst"), "src", "dst", k)
        .as[(Long, Long)].collect().toMap
      got == brute
    }
}
