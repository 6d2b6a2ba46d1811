package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Semantic check for the BPE trainer: replay the exact learning loop
  * sequentially (occurrence-counted pair statistics, (count desc, pair asc)
  * argmax, greedy left-fold merge application, `</w>` sentinel) over
  * collected word frequencies and demand identical merges and
  * segmentations from the distributed implementation. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def foldMerge(w: Vector[String], a: String, b: String): Vector[String] =
    w.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
      else acc :+ x
    }

  /** (merges, final vocab word → (freq, syms)) — the sequential reference. */
  private lazy val reference: (Seq[(String, String, Long)], Map[String, (Long, Vector[String])]) = {
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").as[String].collect()
      .flatMap(_.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    var vocab: Map[String, (Long, Vector[String])] = words.map { case (w, f) =>
      w -> (f, w.map(_.toString).toVector :+ "</w>")
    }.toMap
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to 10) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.values.foreach { case (f, syms) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _         => ()
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((a, b, n))
        vocab = vocab.map { case (w, (f, syms)) => w -> (f, foldMerge(syms, a, b)) }
      }
    }
    (merges.toSeq, vocab)
  }

  test("bpe_learn: merge table equals the sequential trainer's, in rank order") {
    val got = SparkEntry.queries("q_bpe_learn")(spark, sf)
      .as[(Int, String, String, String, Long)].collect().toSeq
    val want = reference._1.zipWithIndex.map { case ((a, b, n), i) =>
      (i + 1, a, b, a + b, n)
    }
    assert(got == want)
    assert(got.size == 10, "fixture corpus must support 10 merges")
    // Scores are non-increasing in rank: a later merge can never have been
    // a strictly better candidate earlier (it existed or was created since).
    assert(got.sliding(2).forall {
      case Seq(x, y) => x._5 >= y._5
      case _         => true
    })
  }

  test("bpe_segment: top-20 segmentations match the reference's final vocab") {
    val got = SparkEntry.queries("q_bpe_segment")(spark, sf)
      .as[(String, Long, Int, String)].collect().toSeq
    val want = reference._2.toSeq
      .map { case (w, (f, syms)) => (w, f, syms.size, syms.mkString("|")) }
      .sortBy { case (w, f, _, _) => (-f, w) }.take(20)
    assert(got == want)
    // Every segmentation reassembles to its word + sentinel.
    got.foreach { case (w, _, _, seg) =>
      assert(seg.split("\\|").mkString == w + "</w>")
    }
  }
}
