package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streaming decontamination: the stream-static join must equal the batch
  * contamination audit (same shingle rule, train-side grouping), including
  * over directory-shaped tables — the only table shape that exists at
  * scale, and the round-6 scale-probe's streaming regression class. */
class StreamingContaminationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Planted corpus: one benchmark (src0) doc whose middle 8-token run is
  // copied verbatim into two train docs; clean train filler around them.
  private def plantedDocs: Seq[(Long, String, String)] = {
    val rng = new scala.util.Random(11)
    def words(seed: Int, n: Int = 20): Seq[String] =
      Seq.fill(n)(s"w${rng.nextInt(500) + seed * 1000}")
    val bench = words(1)
    val leak = bench.slice(6, 14) // an 8-token window of the benchmark doc
    Seq(
      (1L, bench.mkString(" "), "src0"),
      (10L, (words(2, 6) ++ leak ++ words(3, 6)).mkString(" "), "src1"),
      (11L, (leak ++ words(4, 12)).mkString(" "), "src1"),
    ) ++ (20L to 35L).map(i => (i, words(i.toInt).mkString(" "), "src1"))
  }

  private def writePlanted(parts: Int): String = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_stream_contam_spec_$parts"
    plantedDocs.toDF("doc_id", "text", "source")
      .repartition(parts).write.mode("overwrite").parquet(p)
    p
  }

  private def batchReference(path: String): Seq[(Long, Long)] = {
    val sh = spark.read.parquet(path)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 8)
      .select(col("doc_id"), col("source"),
        explode(expr("sequence(1, size(w) - 7)")).as("i"), col("w"))
      .select(col("doc_id"), col("source"),
        expr("md5(array_join(slice(w, i, 8), ' '))").as("h"))
    val ev = sh.filter(col("source") === "src0")
      .select(col("doc_id").as("eval_id"), col("h")).distinct()
    val tr = sh.filter(col("source") =!= "src0")
      .select(col("doc_id").as("train_id"), col("h")).distinct()
    ev.join(tr, "h").groupBy("train_id")
      .agg(countDistinct("eval_id").as("n_eval_docs"))
      .orderBy("train_id").as[(Long, Long)].collect().toSeq
  }

  test("stream-static join equals the batch audit; planted leaks caught, clean docs silent") {
    val p = writePlanted(parts = 1)
    val got = StreamingContamination.contaminateOnce(spark, p,
        queryName = "sc_spec_single")
      .as[(Long, Long)].collect().toSeq
    assert(got == batchReference(p))
    assert(got.map(_._1).toSet == Set(10L, 11L),
      s"exactly the two planted leaks flag: $got")
  }

  test("directory-shaped (multi-part) table: stream equals batch, rows non-empty") {
    val p = writePlanted(parts = 3)
    assert(new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet")) > 1,
      "precondition: multi-part directory table")
    val got = StreamingContamination.contaminateOnce(spark, p,
        queryName = "sc_spec_dir")
      .as[(Long, Long)].collect().toSeq
    assert(got == batchReference(p) && got.nonEmpty)
  }
}
