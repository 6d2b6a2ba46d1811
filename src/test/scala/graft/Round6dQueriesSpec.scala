package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-6d curation queries: the k-means audit
  * (against an exact in-memory Lloyd's run with the same deterministic
  * init), the curation funnel (monotone per-stage survival), and the DSIR
  * importance weights (against a brute-force hashed-unigram reference). */
class Round6dQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("kmeans: matches exact in-memory Lloyd's with first-k init") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble) }.sortBy(_._1)
    val k = 4; val iters = 5
    var cents = vecs.take(k).map(_._2.clone())
    def assign(v: Array[Double]): (Int, Double) = {
      val d = cents.map(c => c.zip(v).map { case (x, y) => (y - x) * (y - x) }.sum)
      val m = d.min
      (d.indexOf(m), m)
    }
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // Same exact-DECIMAL per-dim mean as kmeansLloyd (each component
    // snapped to decimal(_,12), summed exactly, divided as double, round
    // 9) — order-independent, so the mirror's trajectory is bit-identical
    // to the engine's AND to the DuckDB oracle's.
    def d12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    for (_ <- 1 to iters) {
      val groups = vecs.map { case (_, v) => (assign(v)._1, v) }.groupBy(_._1)
      cents = cents.zipWithIndex.map { case (old, i) =>
        groups.get(i) match {
          case Some(members) =>
            val n = members.length
            old.indices.map(d =>
              r9(members.map(m => d12(m._2(d))).sum.toDouble / n)).toArray
          case None => old
        }
      }
    }
    val finalAssign = vecs.map { case (_, v) => assign(v) }
    val expected: Map[Int, (Long, Double, Double)] =
      finalAssign.groupBy(_._1).map { case (c, xs) =>
        c -> ((xs.length.toLong, xs.map(_._2).sum / xs.length,
          math.sqrt(cents(c).map(x => x * x).sum)))
      }
    val got = SparkEntry.queries("q_kmeans")(spark, sf)
      .as[(Int, Long, Double, Double)].collect()
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
    assert(got.map(_._2).sum == vecs.length, "clusters must partition the corpus")
    got.foreach { case (c, n, avgD, cnorm) =>
      val (en, eAvg, eNorm) = expected(c)
      assert(n == en, s"cluster $c size")
      // The distributed run sums doubles in a different order — tolerance,
      // not equality, is the correct contract for the float aggregates.
      // The query emits round(...,4) values; compare on the same grid.
      assert(math.abs(avgD - eAvg) < 5.1e-5, s"cluster $c avg_dist2")
      assert(math.abs(cnorm - eNorm) < 5.1e-5, s"cluster $c centroid_norm")
    }
  }

  test("curation_funnel: survival is monotone and stages nest per source") {
    val rows = SparkEntry.queries("q_curation_funnel")(spark, sf)
      .as[(String, Int, String, Long, Long)].collect()
    val bySrc = rows.groupBy(_._1)
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (src, st) =>
      assert(st.map(_._2).sorted.toSeq == Seq(0, 1, 2, 3), src)
      val byStage = st.map(r => r._2 -> r).toMap
      // Docs and chars can only shrink down the funnel.
      for (i <- 0 to 2) {
        assert(byStage(i)._4 >= byStage(i + 1)._4, s"$src docs stage $i")
        assert(byStage(i)._5 >= byStage(i + 1)._5, s"$src chars stage $i")
      }
      assert(byStage(0)._3 == "raw" && byStage(3)._3 == "head_dedup", src)
    }
    // The fixture corpus must actually exercise the funnel: the quality
    // gate drops docs somewhere, and the dedup stages (exact + head
    // combined — the sf0.001 fixture has head-dup recrawl clusters but no
    // exact dups among quality survivors) drop more.
    assert(bySrc.values.exists(st => st.find(_._2 == 0).get._4 >
      st.find(_._2 == 1).get._4), "quality gate never fired")
    assert(rows.filter(_._2 == 3).map(_._4).sum <
      rows.filter(_._2 == 1).map(_._4).sum, "dedup never fired")
  }

  test("dsir_weights: matches brute-force hashed-unigram importance weights") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source").as[(Long, String, String)].collect()
    def bucket(tok: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(2)
    }
    val tgtCounts = docs.filter(_._3 == "src0")
      .flatMap(_._2.split(" ", -1)).groupBy(bucket).map { case (b, xs) => b -> xs.length.toLong }
    val rawToks = docs.filter(_._3 != "src0")
      .map { case (id, t, _) => id -> t.split(" ", -1).map(bucket) }
    val rawCounts = rawToks.flatMap(_._2).groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    val nt = tgtCounts.values.sum; val nr = rawCounts.values.sum
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lr = (tgtCounts.keySet ++ rawCounts.keySet).map { b =>
      b -> r6(math.log((tgtCounts.getOrElse(b, 0L) + 1.0) / (nt + 256.0)) -
        math.log((rawCounts.getOrElse(b, 0L) + 1.0) / (nr + 256.0)))
    }.toMap
    val weights = rawToks.map { case (id, bs) =>
      val w = bs.groupBy(identity).map { case (b, xs) =>
        BigDecimal(r6(xs.length * lr(b))).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      (id, w.toDouble, bs.length.toLong)
    }
    val expected = weights.sortBy(t => (-t._2, t._1)).take(20).toSeq
    val got = SparkEntry.queries("q_dsir_weights")(spark, sf)
      .as[(Long, Double, Long)].collect().toSeq
    assert(got == expected)
    // Importance weights must discriminate: the top selects beat the corpus
    // median weight strictly.
    val median = weights.map(_._2).sorted.apply(weights.length / 2)
    assert(got.head._2 > median)
  }
}
