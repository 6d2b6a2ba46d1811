package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantics of the streaming LSH near-dup detector: flags must equal a
  * brute-force simulation of the same anchor rule over the BATCH bucket
  * table (same kernels → same buckets), and planted near-dups must be
  * caught. */
class StreamingNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Planted corpus: two exact-dup groups, one near-dup pair (one token
  // changed out of 40 — well above LSH sensitivity), plus unique filler.
  private def plantedDocs: Seq[(Long, String)] = {
    val rng = new scala.util.Random(7)
    def text(seed: Int, n: Int = 40): String =
      Seq.fill(n)(s"w${rng.nextInt(500) + seed * 1000}").mkString(" ")
    val base = text(1)
    val near = base.split(" ").updated(5, "CHANGED").mkString(" ")
    val pair = text(2)
    Seq(
      1L -> base, 2L -> base, 3L -> near,        // dup cluster {1,2,3}
      10L -> pair, 11L -> pair,                  // dup pair {10,11}
    ) ++ (20L to 40L).map(i => i -> text(i.toInt))
  }

  private def writePlanted(): String = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_neardup_spec"
    plantedDocs.toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(p)
    // detectOnce stages a single FILE, so hand it the part file
    new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
      .head.getAbsolutePath
  }

  test("streaming flags equal the batch-bucket anchor simulation; planted dups caught") {
    val file = writePlanted()
    val got = StreamingNearDup.detectOnce(spark, file)
      .as[(Long, Long)].collect().toMap

    // Brute-force expectation from the BATCH bucket table (same kernels):
    // per bucket, every id except the min is flagged with the min; per doc,
    // the smallest such anchor wins.
    val hits = StreamingNearDup.bucketHits(
        spark.read.parquet(file), "doc_id", "text")
      .collect()
    val expected = hits.groupBy(h => (h.band, h.bucket)).values
      .filter(_.map(_.doc_id).distinct.length >= 2)
      .flatMap { g =>
        val ids = g.map(_.doc_id).distinct.sorted
        ids.tail.map(id => id -> ids.head)
      }
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).min }

    assert(got == expected)
    // anchors always precede (id order) the docs they cover
    got.foreach { case (id, a) => assert(a < id) }
    // the planted duplicates are detected with their cluster minimum
    assert(got.get(2L).contains(1L))
    assert(got.get(3L).contains(1L))
    assert(got.get(11L).contains(10L))
    // unique filler docs are not flagged
    assert((20L to 40L).forall(i => !got.contains(i)))
  }

  test("stateful rule is incremental: re-running on the same corpus is deterministic") {
    val file = writePlanted()
    val a = StreamingNearDup.detectOnce(spark, file).as[(Long, Long)].collect().toSet
    val b = StreamingNearDup.detectOnce(spark, file).as[(Long, Long)].collect().toSet
    assert(a == b)
  }
}
