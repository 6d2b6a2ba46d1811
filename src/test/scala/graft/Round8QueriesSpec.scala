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

  test("spectral power iteration recovers a known eigenpair") {
    import graft.llm.Spectral
    // Vectors along the axes: (±3, 0) ×2 and (0, ±1) ×2 → uncentered
    // covariance diag(9·2/4, 1·2/4) = diag(4.5, 0.5): λ1 = 4.5, trace = 5,
    // anisotropy = 0.9, eigenvector (±1, 0).
    val vecs = Seq(Array(3.0, 0.0), Array(-3.0, 0.0),
      Array(0.0, 1.0), Array(0.0, -1.0))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val (w, lambda1, trace) = Spectral.powerIteration(
      Spectral.covariance(df, "embedding"), dim = 2, iters = 6)
    // Convergence is linear at rate λ2/λ1 = 1/9: after 6 iterations the
    // off-axis residual is (1/9)^6 ≈ 2e-6, so assert at 1e-5.
    assert(math.abs(lambda1 - 4.5) < 1e-5, s"lambda1 = $lambda1")
    assert(math.abs(trace - 5.0) < 1e-9, s"trace = $trace")
    assert(math.abs(math.abs(w(0)) - 1.0) < 1e-5 && math.abs(w(1)) < 1e-5,
      s"eigenvector = ${w.toSeq}")
  }

  test("q_spectral_power: anisotropy is a sane ratio on the real corpus") {
    val row = SparkEntry.queries("q_spectral_power")(spark, sf).head()
    val (l1, tr, an) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    assert(l1 > 0 && tr >= l1, s"lambda1 $l1 must be in (0, trace $tr]")
    // 64-dim corpus: anisotropy is bounded below by the isotropic 1/64.
    assert(an >= 1.0 / 64 - 1e-9 && an <= 1.0, s"anisotropy = $an")
  }

  test("boilerplate strip drops repeated chunks, keeps unique tails in order") {
    // 12 docs share one exact 8-word chunk (boilerplate, ≥10 threshold),
    // each followed by a unique 8-word tail; 2 docs are pure boilerplate.
    val boiler = (1 to 8).map(j => s"b$j").mkString(" ")
    val docs =
      (0 until 12).map { i =>
        val tail = (1 to 8).map(j => s"u${i}_$j").mkString(" ")
        (i.toLong, s"$boiler $tail")
      } ++ Seq((12L, boiler), (13L, boiler))
    val df = docs.toDF("doc_id", "text")
    df.write.mode("overwrite").parquet("/tmp/graft_r8_strip/documents.parquet")
    // Run the declared query against the fixture dir (catalog reads
    // documents.parquet from the sf dir path).
    val out = SparkEntry.queries("q_boilerplate_strip")(spark, "/tmp/graft_r8_strip")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out(12L) == ((0L, "")) && out(13L) == ((0L, "")),
      "pure-boilerplate docs must come back empty")
    (0 until 12).foreach { i =>
      val tail = (1 to 8).map(j => s"u${i}_$j").mkString(" ")
      assert(out(i.toLong) == ((1L, tail)), s"doc $i: ${out(i.toLong)}")
    }
  }

  test("q_whiten_audit: Pythagoras per row — proj² + res² ≈ ‖v‖²") {
    import org.apache.spark.sql.functions.{col, sqrt => ssqrt}
    val out = SparkEntry.queries("q_whiten_audit")(spark, sf)
    val norms = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), ssqrt(graft.functions.ArrayKernels.dot(
        col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>"))).as("vn"))
    val joined = out.join(norms, "vec_id")
      .select(col("vec_id"), col("proj"), col("res_norm"), col("vn"))
      .as[(Long, Double, Double, Double)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (id, p, r, vn) =>
      // w is unit up to its 9-decimal snap, so the decomposition is
      // orthogonal up to ~1e-6 at these magnitudes.
      assert(math.abs(p * p + r * r - vn * vn) < 1e-3,
        s"vec $id: proj²+res²=${p * p + r * r} vs ‖v‖²=${vn * vn}")
      assert(r <= vn + 1e-6, s"vec $id: residual exceeds the vector norm")
    }
  }

  test("q_random_projection: JL distortion stays in the 1/√k regime") {
    val rows = SparkEntry.queries("q_random_projection")(spark, sf)
      .select("abs_err").as[Double].collect()
    assert(rows.nonEmpty)
    // k = 16 → typical cosine error ~1/√k = 0.25; the MEAN must sit well
    // inside that regime (individual pairs may exceed it).
    val mean = rows.sum / rows.length
    assert(mean < 0.25, s"mean |cos_orig − cos_proj| = $mean")
    assert(rows.forall(e => e >= 0 && e <= 2), "abs_err out of range")
  }

  test("q_source_drift: PSI is non-negative per source and covers every source") {
    // Each PSI term (p−q)·ln(p/q) is ≥ 0 by sign agreement, so the sum is
    // a true divergence — negative output means the fold or smoothing is
    // wrong.
    val out = SparkEntry.queries("q_source_drift")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val nSources = spark.read.parquet(s"$sf/documents.parquet")
      .select("source").distinct().count()
    assert(out.size == nSources)
    assert(out.values.forall(_ >= 0.0), s"negative PSI: $out")
  }

  test("q_stream_drift matches the batch drift audit row-for-row") {
    val stream = SparkEntry.queries("q_stream_drift")(spark, sf)
      .collect().toSeq.map(_.toSeq)
    val batch = SparkEntry.queries("q_source_drift")(spark, sf)
      .collect().toSeq.map(_.toSeq)
    assert(stream == batch, s"streaming PSI diverged: $stream vs $batch")
  }

  test("q_image_phash carries the decode_mode tier column") {
    val out = SparkEntry.queries("q_image_phash")(spark, sf)
    assert(out.columns.toSeq == Seq("media_id", "phash", "decode_mode"))
    // synthetic text payloads are all fallback-tier
    assert(out.filter(col("decode_mode") =!= "byte-sample").count() == 0)
    assert(out.count() > 0)
  }
}
