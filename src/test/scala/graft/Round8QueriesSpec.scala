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

  test("text-classifier machinery separates cleanly when vocabularies actually differ") {
    import graft.llm.{Classify, TextStats}
    // The driver corpus's synthetic languages share one vocabulary, so the
    // declared query's honest reading is "no usable gate margin". This
    // fixture is the counterfactual: two DISJOINT word lists — the same
    // featurize→normalize→GD pipeline must now produce a real margin,
    // proving the machinery (not the corpus) was the limit.
    val enWords = Seq("the", "of", "and", "to", "in", "is", "was", "for", "with", "that")
    val xxWords = Seq("zor", "blin", "karv", "mett", "julp", "qwex", "drov", "snib", "flor", "gratz")
    val docs = (0L until 500L).map { i =>
      val ws = if (i % 2 == 0) enWords else xxWords
      val text = (0 until 12).map(j => ws(((i + j * 7) % 10).toInt)).mkString(" ")
      (i, if (i % 2 == 0) "en" else "xx", text)
    }.toDF("doc_id", "lang", "text")
    val rawV = TextStats.hashedTf(col("text"), 64)
    val staged = docs.select(col("doc_id").as("id"),
        when(col("lang") === "en", 0).otherwise(1).as("lbl"), rawV.as("rv"))
      .withColumn("nrm",
        sqrt(graft.functions.ArrayKernels.dot(col("rv"), col("rv"))))
      .select(col("id"), col("lbl"),
        when(col("nrm") > 0, transform(col("rv"), x => x / col("nrm")))
          .otherwise(col("rv")).as("vec"))
    val out = Classify.logregScore(staged, "id", "vec", "lbl", positiveLabel = 0)
      .collect().map(r => r.getInt(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    val margin = out(1)._1 - out(0)._1 // mean_p(y=1) − mean_p(y=0)
    assert(margin > 0.1, s"expected a usable gate margin, got $margin")
    assert(out(1)._2 >= 0.9 && out(0)._2 >= 0.9,
      s"expected ≥90% per-class accuracy at 0.5, got $out")
  }

  test("q_text_classifier on the shared-vocab corpus: no usable margin — the reject-this-gate reading") {
    // The declared query's audit reading on the driver corpus: the
    // synthetic languages share one vocabulary, so the calibration margin
    // is sub-1e-2 either way (at sf0.001 it is actually −2e-4) — the gate
    // must be REJECTED. The disjoint-vocab fixture above is the
    // counterfactual pinning that the same machinery separates when the
    // corpus carries signal.
    val out = SparkEntry.queries("q_text_classifier")(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(math.abs(out(1) - out(0)) < 0.01,
      s"shared-vocab corpus should show no usable margin, got $out")
  }

  test("q_stream_classify_restart: restarted scorer matches the batch classifier row-for-row") {
    val restart = SparkEntry.queries("q_stream_classify_restart")(spark, sf)
      .collect().toSeq.map(_.toSeq)
    val batch = SparkEntry.queries("q_text_classifier")(spark, sf)
      .collect().toSeq.map(_.toSeq)
    assert(restart == batch,
      s"restart calibration diverged from batch: $restart vs $batch")
  }

  test("q_image_phash carries the decode_mode tier column") {
    val out = SparkEntry.queries("q_image_phash")(spark, sf)
    assert(out.columns.toSeq == Seq("media_id", "phash", "decode_mode"))
    // synthetic text payloads are all fallback-tier
    assert(out.filter(col("decode_mode") =!= "byte-sample").count() == 0)
    assert(out.count() > 0)
  }
}
