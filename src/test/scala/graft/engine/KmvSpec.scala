package graft.engine

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Unit properties of the KMV Aggregator (against brute force, under any
  * interleaving/partitioning) plus the streaming deployment's parity with
  * the batch q_kmv_distinct frame.
  */
class KmvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def brute(xs: Seq[Double], k: Int): Seq[Double] =
    xs.distinct.sorted.take(k)

  test("KMinValues.reduce matches brute force on random streams with dups") {
    val agg = new Kmv.KMinValues(8)
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { trial =>
      val xs = Seq.fill(200)((rnd.nextInt(40) + 1).toDouble / 41.0)
      val got = xs.foldLeft(agg.zero)(agg.reduce).toSeq
      assert(got == brute(xs, 8), s"trial $trial")
    }
  }

  test("KMinValues.merge is partition-order independent") {
    val agg = new Kmv.KMinValues(8)
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(300)(rnd.nextDouble())
    val want = brute(xs, 8)
    (1 to 10).foreach { trial =>
      // random partitioning into 1..6 chunks, random chunk order
      val nChunks = rnd.nextInt(6) + 1
      val chunks = rnd.shuffle(xs).grouped(xs.length / nChunks + 1).toSeq
      val bufs = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(bufs).reduce(agg.merge)
      assert(merged.toSeq == want, s"trial $trial")
    }
  }

  test("KMinValues buffer is always sorted, distinct, and <= k") {
    val agg = new Kmv.KMinValues(5)
    val rnd = new scala.util.Random(3)
    var b = agg.zero
    (1 to 500).foreach { _ =>
      b = agg.reduce(b, (rnd.nextInt(30) + 1).toDouble / 31.0)
      assert(b.length <= 5)
      assert(b.toSeq == b.toSeq.distinct.sorted)
    }
  }

  test("q_stream_kmv lands on the identical frame as the batch q_kmv_distinct") {
    val sf = "/root/testdata/sf0.01"
    val batch = SparkEntry.queries("q_kmv_distinct")(spark, sf).collect()
    val stream = SparkEntry.queries("q_stream_kmv")(spark, sf).collect()
    assert(batch.nonEmpty)
    assert(batch.map(_.toString).toSeq == stream.map(_.toString).toSeq)
  }

  test("q_stream_kmv_restart: restored state + wave 2 equals the one-shot sketch") {
    val sf = "/root/testdata/sf0.01"
    val batch = SparkEntry.queries("q_kmv_distinct")(spark, sf).collect()
    val restarted = SparkEntry.queries("q_stream_kmv_restart")(spark, sf).collect()
    assert(batch.nonEmpty)
    assert(batch.map(_.toString).toSeq == restarted.map(_.toString).toSeq)
  }
}
