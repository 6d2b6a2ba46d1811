package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-6 queries (winnowing fingerprints,
  * bigram-LM perplexity, embedding-space dedup) — brute-force references
  * over collected rows, independent of the distributed formulations. */
class Round6QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("winnow_fingerprint: window minima match a per-doc sequential reference") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 200)
      .select("doc_id", "text").as[(Long, String)].collect()
    val expected = docs.flatMap { case (id, text) =>
      // Mirrors Spark semantics: split keeps trailing empties (limit -1),
      // grams are positional (document order, duplicates kept).
      val toks = text.split("\\s+", -1)
      val grams =
        if (toks.length < 3) Array(toks.mkString(" "))
        else (0 to toks.length - 3).map(i => toks.slice(i, i + 3).mkString(" ")).toArray
      val hs = grams.map(g => java.lang.Long.parseLong(md5hex(g).take(7), 16))
      val fps =
        if (hs.length < 4) Array(hs.min)
        else (0 to hs.length - 4).map(j => hs.slice(j, j + 4).min).distinct.toArray
      fps.map(f => (id, f))
    }.toSet
    val got = SparkEntry.queries("q_winnow_fingerprint")(spark, sf)
      .as[(Long, Long)].collect().toSet
    assert(got == expected)
    // Winnowing guarantee: every fingerprint IS one of the doc's gram hashes.
    assert(expected.nonEmpty)
  }

  test("lm_perplexity: add-1 bigram cross-entropy matches brute-force counting") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val tokensOf = docs.map { case (id, t) => id -> t.split(" ", -1) }.toMap
    val vocab = tokensOf.values.flatten.toSet.size.toLong
    val pairs = docs.flatMap { case (id, _) =>
      val ws = tokensOf(id)
      if (ws.length < 2) Nil
      else (0 until ws.length - 1).map(i => (id, ws(i), ws(i + 1)))
    }
    val c2 = pairs.groupBy(p => (p._2, p._3)).map { case (k, xs) => k -> xs.length.toLong }
    val c1 = pairs.groupBy(_._2).map { case (k, xs) => k -> xs.length.toLong }
    val expected = pairs.groupBy(_._1).map { case (id, xs) =>
      val terms = xs.map { case (_, p, c) =>
        -math.log((c2((p, c)) + 1).toDouble / (c1(p) + vocab)) }
      id -> (xs.length.toLong, terms.sum / terms.length)
    }
    val got = SparkEntry.queries("q_lm_perplexity")(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(got.length == expected.size)
    got.foreach { case (id, n, xent) =>
      val (en, ex) = expected(id)
      assert(n == en, s"doc $id bigram count")
      // avg over doubles: summation order differs between the distributed
      // aggregate and this sequential fold — tolerance, not bit equality
      // (the DuckDB oracle does the bit-level check at round(4)).
      assert(math.abs(xent - ex) < 1e-3, s"doc $id xent $xent vs $ex")
    }
  }

  test("semantic_dedup: kept set matches brute-force union-find over cosine edges") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 2000) // the query's bounded audit panel
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val norms = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for (i <- vecs.indices; j <- (i + 1) until vecs.length) {
      val (ia, va) = vecs(i); val (ib, vb) = vecs(j)
      if (r4(dot(va, vb) / (norms(ia) * norms(ib))) >= 0.4) {
        val (ra, rb) = (find(ia), find(ib))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val losers = vecs.map(_._1).filter(id => find(id) < id).toSet
    val expected = vecs.map(_._1).filterNot(losers).sorted.toSeq
    val got = SparkEntry.queries("q_semantic_dedup")(spark, sf)
      .as[Long].collect().toSeq
    assert(got == expected)
    assert(losers.nonEmpty, "fixture has no cosine edges at 0.4 — test is vacuous")
  }

  test("semantic dedup kernel drops a planted exact duplicate, keeps the original") {
    val base = (0L until 20L).map { i =>
      // splitmix64-mixed coordinates: every cheaper index-arithmetic source
      // tried here (sin, multiply-mod, Random(seed).nextDouble with
      // sequential seeds) leaves enough linear structure across a stride-8
      // lattice that distinct ids collide at cosine ≥ 0.95.
      i -> Array.tabulate(8) { d =>
        var z = (i * 8 + d) + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
      }
    }
    val planted = base :+ (21L -> base(3)._2.clone()) // exact copy of vec 3
    val df = planted.toDF("id", "v")
    val edges = graft.llm.Similarity.cosineAllPairs(df, "id", "v", threshold = 0.95)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val kept = graft.llm.Dedup.dropByComponents(df, "id", edges)
      .select("id").as[Long].collect().toSet
    assert(kept.contains(3L), "cluster representative (min id) must survive")
    assert(!kept.contains(21L), "planted duplicate must be dropped")
    assert(kept.size == 20, s"exactly the duplicate goes: $kept")
  }
}
