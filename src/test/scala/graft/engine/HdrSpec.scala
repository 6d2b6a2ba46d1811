package graft.engine

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Unit properties of the HdrHistogram-style quantile sketch (exact integer
  * bucket arithmetic against a brute-force mirror, the midpoint error
  * contract) plus the streaming deployment's parity with the batch
  * q_hdr_quantile frame.
  */
class HdrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Brute-force bucket mirror: linear scan for the octave, integer sub. */
  private def bruteBucket(c: Long): Int = {
    require(c > 0)
    var e = 0
    while ((1L << (e + 1)) <= c) e += 1
    val sub = ((c - (1L << e)) * Hdr.SubBuckets) >> e
    e * Hdr.SubBuckets + sub.toInt
  }

  private def bucketsOf(vals: Seq[Long]): Seq[Int] = {
    val spark0 = spark
    import spark0.implicits._
    Hdr.withBucket(vals.toDF("c"), "c")
      .select("bkt").as[Int].collect().toSeq
  }

  test("withBucket matches the brute-force octave/sub-bucket on awkward values") {
    // powers of two, off-by-one straddles (where a sloppy log2 octave would
    // flip), small values below one full octave of sub-bucket width, and a
    // random spray
    val rnd = new scala.util.Random(11)
    val edge = (0 to 40).flatMap(e => Seq((1L << e) - 1, 1L << e, (1L << e) + 1))
      .filter(_ > 0)
    val spray = Seq.fill(500)(math.abs(rnd.nextLong()) % 1000000000L + 1)
    val vals = (edge ++ spray).distinct
    assert(bucketsOf(vals) == vals.map(bruteBucket))
  }

  test("bucket bounds: every value lies in [lower, lower+width) of its bucket") {
    val rnd = new scala.util.Random(5)
    val vals = Seq.fill(300)(math.abs(rnd.nextLong()) % (1L << 40) + 8)
    vals.foreach { c =>
      val bkt = bruteBucket(c)
      val e = bkt / Hdr.SubBuckets
      val sub = bkt % Hdr.SubBuckets
      val width = (1L << e) / Hdr.SubBuckets
      val lower = (1L << e) + sub * width
      assert(c >= lower && c < lower + math.max(width, 1L),
        s"c=$c bkt=$bkt lower=$lower width=$width")
    }
  }

  test("q_hdr_quantile: the 1/16 relative-error contract holds on real data") {
    val out = SparkEntry.queries("q_hdr_quantile")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(out.length == 9) // 3 return flags x 3 quantiles
    out.foreach { r =>
      val relErr = r.getAs[Double]("rel_err")
      // midpoint estimate of a 1/8-relative-width bucket vs any value in the
      // bucket: <= 1/16; the interpolated exact can sit one value outside,
      // allow a hair of slack
      assert(relErr <= 1.0 / 16 + 0.005, s"$r")
    }
  }

  test("q_stream_quantile lands on the identical frame as the batch q_hdr_quantile") {
    val sf = "/root/testdata/sf0.01"
    val batch = SparkEntry.queries("q_hdr_quantile")(spark, sf).collect()
    val stream = SparkEntry.queries("q_stream_quantile")(spark, sf).collect()
    assert(batch.nonEmpty)
    assert(batch.map(_.toString).toSeq == stream.map(_.toString).toSeq)
  }

  test("q_stream_quantile_restart: restored grid + wave 2 equals the one-shot frame") {
    val sf = "/root/testdata/sf0.01"
    val batch = SparkEntry.queries("q_hdr_quantile")(spark, sf).collect()
    val restarted = SparkEntry.queries("q_stream_quantile_restart")(spark, sf).collect()
    assert(batch.nonEmpty)
    assert(batch.map(_.toString).toSeq == restarted.map(_.toString).toSeq)
  }
}
