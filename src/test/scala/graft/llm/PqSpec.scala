package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Product-quantization semantics: code validity, the ADC self-distance
  * identity (ADC of a vector's own codes against its own LUT equals its
  * total quantization error), Lloyd monotonicity across iterations, and a
  * recall floor against exact brute-force L2 — the evaluation the
  * rows-only q_pq_topk / q_pq_distortion queries lean on.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private val (dim, m, k) = (64, 8, 16)

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val cb = Pq.trained(emb, "vec_id", "embedding", dim, m, k, iters = 3)
  private lazy val vecs: Map[Long, Array[Double]] =
    emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
  private lazy val codes: Map[Long, Seq[Int]] =
    Pq.encode(emb, "vec_id", "embedding", dim, cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap

  test("codebooks and codes have the declared shape and range") {
    assert(cb.length == m && cb.forall(_.length == k) &&
      cb.forall(_.forall(_.length == dim / m)))
    assert(codes.size == vecs.size)
    codes.values.foreach(cs =>
      assert(cs.length == m && cs.forall(c => c >= 0 && c < k)))
  }

  test("codes are the true per-subspace argmin of the codebooks") {
    val dsub = dim / m
    vecs.take(50).foreach { case (id, v) =>
      (0 until m).foreach { j =>
        val sv = v.slice(j * dsub, (j + 1) * dsub)
        val d2s = cb(j).map(c => sv.indices.map(i => {
          val d = sv(i) - c(i); d * d
        }).sum)
        val want = d2s.indexOf(d2s.min)
        assert(codes(id)(j) == want, s"vec $id subspace $j")
      }
    }
  }

  test("ADC self-distance equals the vector's total quantization error") {
    vecs.take(20).foreach { case (id, v) =>
      val l = Pq.lut(v.toSeq, cb)
      val adc = codes(id).zipWithIndex.map { case (c, j) => l(j)(c) }.sum
      val dsub = dim / m
      val err = (0 until m).map { j =>
        val sv = v.slice(j * dsub, (j + 1) * dsub)
        val cent = cb(j)(codes(id)(j))
        sv.indices.map(i => { val d = sv(i) - cent(i); d * d }).sum
      }.sum
      // LUT entries snap to 9 decimals (the oracle-expressibility contract),
      // so the m-entry sum can sit up to m·5e-10 off the exact error.
      assert(math.abs(adc - err) <= m * 5e-10, s"vec $id: adc=$adc err=$err")
    }
  }

  test("Lloyd iterations do not increase total distortion") {
    def distortion(iters: Int): Double = {
      val c = Pq.trained(emb, "vec_id", "embedding", dim, m, k, iters)
      Pq.subspaceRows(emb, "vec_id", "embedding", dim, m)
        .select(Pq.subspaceError(col("j"), col("sv"), c).as("e"))
        .agg(sum("e")).head.getDouble(0)
    }
    val d1 = distortion(1); val d3 = distortion(3)
    assert(d3 <= d1 + 1e-6, s"distortion rose: iters=1 $d1 -> iters=3 $d3")
  }

  test("recall vs exact L2: raw ADC clears a modest floor, rerank a high one") {
    val panel = Seq(3L, 57L, 201L)
    val encoded = Pq.encode(emb, "vec_id", "embedding", dim, cb)
    val (adcRecalls, rerankRecalls) = panel.map { qid =>
      val q = vecs(qid)
      def d2(v: Array[Double]): Double =
        v.indices.map(i => { val d = v(i) - q(i); d * d }).sum
      val exact = (vecs - qid).toSeq
        .sortBy { case (id, v) => (d2(v), id) }.take(10).map(_._1).toSet
      val adc = Pq.topK(encoded.filter(col("id") =!= qid),
        "id", "codes", q.toSeq, cb, 10).collect().map(_.getLong(0)).toSet
      val rer = Pq.topKReranked(encoded.filter(col("id") =!= qid), emb,
        "vec_id", "embedding", q.toSeq, cb, k = 10, shortlist = 50)
        .collect().map(_.getLong(0)).toSet
      val (ra, rr) = (exact.intersect(adc).size / 10.0,
        exact.intersect(rer).size / 10.0)
      info(s"query $qid recall@10: adc=$ra reranked=$rr")
      (ra, rr)
    }.unzip
    // Raw ADC on this unstructured corpus loses real recall to quantization
    // (distances concentrate at d=64, k=16): require only well-above-random
    // (10/499 ~ 0.02). The production shortlist-50 + exact-rerank path must
    // recover most of it.
    assert(adcRecalls.forall(_ >= 0.1) && adcRecalls.sum / 3 >= 0.25,
      s"ADC recall floor: $adcRecalls")
    assert(rerankRecalls.forall(_ >= 0.5) && rerankRecalls.sum / 3 >= 0.65,
      s"reranked recall floor: $rerankRecalls")
  }
}
