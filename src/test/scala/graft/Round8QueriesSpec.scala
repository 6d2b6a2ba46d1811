package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-8 surface changes. */
class Round8QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q_image_neardup: every byte-perturbed planted variant pairs with its original") {
    // The panel is planted at media_id+10M with a 1-byte payload overwrite;
    // byte length is preserved, so each variant must land within Hamming 7
    // of its original regardless of the corpus being ASCII or not.
    val pairs = SparkEntry.queries("q_image_neardup")(spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val planted = pairs.collect {
      case (a, b) if b == a + 10000000L => a
      case (a, b) if a == b + 10000000L => b
    }.toSet
    val nPanel = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 50).count()
    assert(nPanel > 0)
    assert(planted.size == nPanel,
      s"only ${planted.size}/$nPanel planted variants paired")
  }

  test("q_image_phash carries the decode_mode tier column") {
    val out = SparkEntry.queries("q_image_phash")(spark, sf)
    assert(out.columns.toSeq == Seq("media_id", "phash", "decode_mode"))
    // synthetic text payloads are all fallback-tier
    assert(out.filter(col("decode_mode") =!= "byte-sample").count() == 0)
    assert(out.count() > 0)
  }
}
