package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-6c corpus-audit queries (cross-source
  * containment matrix, head-duplicate clusters, per-label embedding
  * centroids) — brute-force references over collected rows, independent of
  * the distributed formulations. */
class Round6cQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val docs: Array[(Long, String, String, Long)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source", "n_chars")
      .as[(Long, String, String, Long)].collect()

  private def shingles(text: String, k: Int): Seq[String] = {
    val ws = text.split(" ", -1)
    if (ws.length < k) Nil
    else (0 to ws.length - k).map(i => ws.slice(i, i + k).mkString(" "))
  }

  test("cross_source_dup: containment matrix matches set intersection math") {
    val grams = docs.groupBy(_._3).map { case (src, xs) =>
      src -> xs.flatMap { case (_, t, _, _) => shingles(t, 8) }.toSet
    }
    val srcs = grams.keys.toSeq.sorted
    val expected = (for {
      a <- srcs; b <- srcs if a != b
    } yield {
      val na = grams(a).size.toLong
      val sh = (grams(a) intersect grams(b)).size.toLong
      (a, b, na, sh,
        BigDecimal(sh.toDouble / na)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }).toSet
    val got = SparkEntry.queries("q_cross_source_dup")(spark, sf)
      .as[(String, String, Long, Long, Double)].collect().toSet
    assert(got == expected)
    // The full ordered matrix survives zero-overlap pairs.
    assert(got.size == srcs.size * (srcs.size - 1))
    // Containment is directional: some pair must differ from its transpose
    // (different denominators) unless all overlaps are empty.
    if (got.exists(_._4 > 0)) {
      val byPair = got.map(r => (r._1, r._2) -> r._5).toMap
      assert(got.exists(r => byPair((r._2, r._1)) != r._5 || r._4 == 0))
    }
  }

  test("head_dup: clusters match grouping docs by their first 8 tokens") {
    val expected = docs
      .filter(_._2.split(" ", -1).length >= 8)
      .groupBy { case (_, t, _, _) => t.split(" ", -1).take(8).mkString(" ") }
      .values.filter(_.length >= 2)
      .map { xs =>
        val lens = xs.map(_._4)
        (xs.map(_._1).min, xs.length.toLong, lens.min, lens.max,
          lens.max - lens.min)
      }.toSet
    val got = SparkEntry.queries("q_head_dup")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.toSet == expected)
    // Total order: ascending by the cluster's first doc.
    assert(got.map(_._1).sameElements(got.map(_._1).sorted))
    assert(got.nonEmpty, "fixture corpus must contain head-dup clusters")
  }

  test("ppl_buckets: buckets partition each language, ordered by xent bands") {
    val rows = SparkEntry.queries("q_ppl_buckets")(spark, sf)
      .as[(String, String, Long, Double, Double, Double)].collect()
    val nScorable = docs.count(_._2.split(" ", -1).length >= 2)
    assert(rows.map(_._3).sum == nScorable,
      "buckets must partition the scorable docs")
    rows.groupBy(_._1).foreach { case (lang, bs) =>
      val by = bs.map(r => r._2 -> r).toMap
      assert(by.keySet.subsetOf(Set("head", "middle", "tail")), lang)
      // Band ordering: head's worst doc is no worse than middle's best, etc.
      for (Seq(a, b) <- Seq("head", "middle", "tail").sliding(2)
           if by.contains(a) && by.contains(b))
        assert(by(a)._6 <= by(b)._5, s"$lang: $a max > $b min")
      // The exact sum is consistent with its own bounds.
      bs.foreach { r =>
        val mean = r._4 / r._3
        assert(mean >= r._5 - 1e-9 && mean <= r._6 + 1e-9, s"$lang ${r._2}")
      }
      // Terciles: no bucket may hold more than half a language's docs
      // (degenerate only if xent ties collapse a band — not this fixture).
      val tot = bs.map(_._3).sum
      bs.foreach(r => assert(r._3 <= (tot + 1) / 2 + 1, s"$lang ${r._2}"))
    }
  }

  test("embed_centroid: norms and dispersion match direct double arithmetic") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("label", "embedding").as[(Int, Array[Float])].collect()
    val expected = vecs.groupBy(_._1).map { case (label, xs) =>
      val vs = xs.map(_._2.map(_.toDouble))
      val n = vs.length
      val dim = vs.head.length
      val cSum = Array.tabulate(dim)(d => vs.map(_(d)).sum)
      val centroidNorm = math.sqrt(cSum.map(x => x * x).sum) / n
      val meanSq = vs.map(v => v.map(x => x * x).sum).sum / n
      label -> (n.toLong, centroidNorm, meanSq - centroidNorm * centroidNorm)
    }
    val got = SparkEntry.queries("q_embed_centroid")(spark, sf)
      .as[(Int, Long, Double, Double)].collect()
    assert(got.map(_._1).toSet == expected.keySet)
    got.foreach { case (label, n, cn, disp) =>
      val (en, ecn, edisp) = expected(label)
      assert(n == en)
      assert(math.abs(cn - ecn) < 1e-5, s"label $label centroid_norm")
      assert(math.abs(disp - edisp) < 1e-5, s"label $label dispersion")
      // Dispersion is a mean squared distance — nonnegative by construction.
      assert(disp >= 0.0)
    }
  }
}
