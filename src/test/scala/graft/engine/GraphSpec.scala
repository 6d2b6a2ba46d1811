package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Graph analytics against hand-computed references on known small graphs —
  * the distributed formulations must reproduce the textbook recurrences
  * exactly (PageRank rounds to 9 per iteration, so the reference fold here
  * does too). */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side reference PageRank: same recurrence, same per-iteration
    * rounding, dense Scala maps. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          d: Double = 0.85): Map[Long, Double] = {
    val sym = (edges ++ edges.map(e => (e._2, e._1))).distinct
    val deg = sym.groupBy(_._1).map { case (k, xs) => k -> xs.size.toDouble }
    val n = deg.size.toDouble
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    var pr = deg.keys.map(_ -> r9(1.0 / n)).toMap
    for (_ <- 1 to iters) {
      val contrib = sym.groupBy(_._2).map { case (v, ins) =>
        v -> ins.map { case (u, _) => pr(u) / deg(u) }.sum
      }
      pr = contrib.map { case (v, c) => v -> r9((1 - d) / n + d * c) }
    }
    pr
  }

  test("pageRank matches the reference recurrence on a path + pair graph") {
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L))
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iterations = 3)
      .as[(Long, Double)].collect().toMap
    val want = refPageRank(edges, 3)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, pr) => assert(math.abs(pr - want(id)) < 1e-9, s"node $id") }
    // Center of the path outranks its ends; the symmetric pair ties.
    assert(got(2L) > got(1L) && got(2L) > got(3L))
    assert(got(1L) == got(3L) && got(4L) == got(5L))
    // Mass conservation: ranks sum to 1 up to rounding.
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
  }

  test("bfsLayers: path graph layers from the local-min seed, cap drops the tail") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val got = Graph.bfsLayers(path.toDF("src", "dst"), "src", "dst", maxDepth = 6)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    val capped = Graph.bfsLayers(path.toDF("src", "dst"), "src", "dst", maxDepth = 2)
      .as[(Long, Long)].collect().toMap
    assert(capped == Map(1L -> 0L, 2L -> 1L, 3L -> 2L)) // 4 is beyond the cap
  }

  test("bfsLayers: every local minimum seeds its own component at distance 0") {
    val edges = Seq((5L, 6L), (6L, 7L), (1L, 2L)) // two components
    val got = Graph.bfsLayers(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 0L, 6L -> 1L, 7L -> 2L, 1L -> 0L, 2L -> 1L))
  }

  test("triangleCount: K4 has 4 triangles regardless of edge orientation") {
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a != b) yield (a, b) // both directions
    val got = Graph.triangleCount(k4.toDF("src", "dst"), "src", "dst")
      .as[Long].head()
    assert(got == 4L)
  }

  test("triangleCount: triangle + pendant edge + disjoint edge = 1") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (8L, 9L))
    val got = Graph.triangleCount(edges.toDF("src", "dst"), "src", "dst")
      .as[Long].head()
    assert(got == 1L)
  }

  test("triangleCount: duplicate and reversed edges do not inflate the count") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L), (3L, 1L), (1L, 3L))
    val got = Graph.triangleCount(edges.toDF("src", "dst"), "src", "dst")
      .as[Long].head()
    assert(got == 1L)
  }

  /** Reference Kruskal under the same total order (−w, src, dst) — the
    * unique maximum spanning forest Borůvka must land on. */
  private def refKruskal(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      parent.getOrElseUpdate(x, x)
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    }
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    edges.sortBy { case (s, d, w) => (-w, s, d) }.foreach { case (s, d, w) =>
      val (rs, rd) = (find(s), find(d))
      if (rs != rd) { parent(rs) = rd; out += ((s, d, w)) }
    }
    out.toSet
  }

  test("maxSpanningForest equals Kruskal on a weighted two-component graph with ties") {
    // component A: square 1-2-3-4 with a heavy diagonal; component B: path
    // 10-11-12; tied weights exercise the (−w, src, dst) total order
    val edges = Seq(
      (1L, 2L, 5L), (2L, 3L, 5L), (3L, 4L, 5L), (1L, 4L, 5L), (1L, 3L, 9L),
      (10L, 11L, 2L), (11L, 12L, 7L))
    val got = Graph.maxSpanningForest(edges.toDF("src", "dst", "w"),
        "src", "dst", "w")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == refKruskal(edges))
    // forest shape: |E| = |V| − #components = 7 − 2
    assert(got.size == 5)
  }

  test("q_max_span_forest matches Kruskal on the real co-purchase graph") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_max_span_forest")(spark, sf)
      .as[(Long, Long, Long)].collect()
    // recompute the co-purchase edges independently and Kruskal them
    val li = new Catalog(spark, sf).lineitem
      .filter(org.apache.spark.sql.functions.col("l_partkey") % 5 === 0)
      .select(org.apache.spark.sql.functions.col("l_orderkey").as("okey"),
        org.apache.spark.sql.functions.col("l_partkey").as("pk"))
      .distinct()
      .as[(Long, Long)].collect()
    val byOrder = li.groupBy(_._1)
    val edges = byOrder.values.flatMap { xs =>
      val ps = xs.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case ((s, d), g) => (s, d, g.size.toLong) }.toSeq
    val want = refKruskal(edges)
    assert(got.toSet == want, s"got ${got.length} edges, want ${want.size}")
    // forest invariants: acyclic and spanning — |E| = |V| − #components
    val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      parent.getOrElseUpdate(x, x)
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    }
    edges.foreach { case (s, d, _) => val (a, b) = (find(s), find(d)); if (a != b) parent(a) = b }
    val nComp = vs.map(find).distinct.size
    assert(got.length == vs.size - nComp)
  }
}
