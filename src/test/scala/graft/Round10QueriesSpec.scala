package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic checks for the round-10 additions — chiefly the
  * q_curation_pipeline capstone: stage monotonicity, split partitioning,
  * and per-stage Merkle roots re-derived through the in-memory reference
  * reduction (so the distributed staged DAG is verified against an
  * independent implementation, not just the DuckDB oracle restatement).
  */
class Round10QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private lazy val pipeline =
    SparkEntry.queries("q_curation_pipeline")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4)))

  test("q_curation_pipeline: stages shrink monotonically and are non-empty") {
    val byStage = pipeline.map(t => t._1 -> t._3).toMap
    assert(pipeline.length === 9, pipeline.map(_._2).mkString(","))
    // raw >= quality >= exact_dedup >= neardup_drop >= decontaminated >=
    // temperature_mix; every stage must retain SOMETHING at this sf.
    (0 to 4).foreach { s =>
      assert(byStage(s) >= byStage(s + 1),
        s"stage $s (${byStage(s)}) < stage ${s + 1} (${byStage(s + 1)})")
    }
    (0 to 5).foreach(s => assert(byStage(s) > 0, s"stage $s empty"))
    // at least one stage must actually DROP rows, else the chain is vacuous
    assert(byStage(5) < byStage(0), "pipeline dropped nothing")
  }

  test("q_curation_pipeline: the split partitions the mixed stage exactly") {
    val byStage = pipeline.map(t => t._1 -> t._3).toMap
    val byChars = pipeline.map(t => t._1 -> t._4).toMap
    assert(byStage(6) + byStage(7) + byStage(8) === byStage(5))
    assert(byChars(6) + byChars(7) + byChars(8) === byChars(5))
  }

  test("q_curation_pipeline: stage roots match the reference Merkle reduction") {
    // Re-derive stage 0 (raw pool) and stage 2 (exact dedup over quality
    // survivors) membership independently, then fold their leaf hashes
    // through the in-memory reference reduction.
    val docs = new graft.engine.Catalog(spark, sf).documents
      .filter(col("source") =!= "src0")
      .select(col("doc_id"), col("text"),
        (graft.llm.TextStats.qualityVerdict(col("text")) === "keep").as("q"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
      .sortBy(_._1)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rootOf = pipeline.map(t => t._1 -> t._5).toMap
    val rawRoot = graft.engine.Merkle.referenceRoot(
      docs.map(d => md5hex(d._2)).toSeq)
    assert(rootOf(0) === rawRoot, "raw-stage root != reference reduction")
    // exact dedup: min doc_id per digest among quality survivors
    val keepers = docs.filter(_._3).groupBy(d => md5hex(d._2))
      .map { case (_, ds) => ds.minBy(_._1) }.toSeq.sortBy(_._1)
    val dedupRoot = graft.engine.Merkle.referenceRoot(
      keepers.map(d => md5hex(d._2)))
    assert(rootOf(2) === dedupRoot, "exact-dedup root != reference reduction")
    val counts = pipeline.map(t => t._1 -> t._3).toMap
    assert(counts(0) === docs.length.toLong)
    assert(counts(2) === keepers.length.toLong)
  }

  test("q_source_ablation: models cover all sources, train counts partition, full-model delta is zero") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q_source_ablation")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    val docs = new graft.engine.Catalog(spark, sf).documents
    val poolBySrc = docs.filter(col("source") =!= "src0")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nt = poolBySrc.values.sum
    val nEval = docs.filter(col("source") === "src0").count()
    val byModel = rows.map(t => t._1 -> t).toMap
    assert(rows.length === poolBySrc.size + 1, rows.map(_._1).mkString(","))
    assert(byModel("all")._2 === nt)
    assert(byModel("all")._6 === 0.0, "full-model delta must be zero")
    poolBySrc.foreach { case (src, ns) =>
      val t = byModel(src)
      assert(t._2 === nt - ns, s"$src n_train")
      assert(t._3 === nEval, s"$src scores the full eval panel")
      assert(t._5 >= 0.0 && t._5 <= 1.0)
      // delta really is acc_without - acc_full at round-4
      assert(math.abs(t._6 - math.rint((t._5 - byModel("all")._5) * 1e4) / 1e4) < 1e-9)
    }
  }

  test("q_source_shapley: efficiency axiom holds and players are bounded") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q_source_shapley")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length <= 6, s"players not bounded: ${rows.map(_._1).toSeq}")
    assert(rows.length >= 2)
    // EFFICIENCY: Σ φ_i = v(full coalition) − v(∅) = acc of the model
    // trained on everything — exact in scaled integers, so the rounded
    // outputs agree within |players|·5e-7.
    val docs = new graft.engine.Catalog(spark, sf).documents
    val nPool = docs.filter(col("source") =!= "src0").count()
    assert(rows.map(_._2).sum === nPool, "player doc counts must partition the pool")
    val ablation = SparkEntry.queries("q_source_ablation")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(4))).toMap
    val accFull = ablation("all")
    val phiSum = rows.map(_._4).sum
    assert(math.abs(phiSum - accFull) <= rows.length * 5e-7 + 1e-9,
      s"efficiency axiom violated: sum(phi)=$phiSum vs acc(full)=$accFull")
  }

  test("q_skew_join_stress: salted and plain legs agree row-for-row; the key is hot") {
    def rows(q: String) = SparkEntry.queries(q)(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    val salted = rows("q_skew_join_stress")
    val plain = rows("q_skew_join_plain")
    assert(salted === plain, "salting changed the join result")
    // the synthesis must actually be skewed: the cap key holds ~52% of rows
    val total = plain.map(_._3).sum.toDouble
    val hot = plain.find(_._1 == 25).map(_._3).getOrElse(0L).toDouble
    assert(hot / total > 0.4 && hot / total < 0.65,
      s"cap key share ${hot / total} outside the designed ~0.52 band")
  }

  test("Curation.writeSplits: written splits match the report and re-verify against the manifest") {
    import org.apache.spark.sql.functions._
    val docs = new graft.engine.Catalog(spark, sf).documents
    val out = java.nio.file.Files.createTempDirectory("graft_curation_out")
      .toString
    val rep = graft.llm.Curation.writeSplits(docs, out)
    val repMap = rep.map(t => t._2 -> (t._3, t._4, t._5)).toMap
    val written = spark.read.parquet(s"$out/data")
    // per-split counts and chars equal the report's split stages
    for (spl <- Seq("train", "val", "test")) {
      val (n, ch, root) = repMap(s"split_$spl")
      val part = written.filter(col("split") === spl)
      assert(part.count() === n, s"$spl count")
      assert(part.agg(sum("n_chars")).head().getLong(0) === ch, s"$spl chars")
      // INTEGRITY: recompute the split's Merkle root from the WRITTEN data
      // alone (md5(text) leaves in doc_id order) — it must equal the
      // manifest root, which was computed on the producer side before the
      // write. This is the consumer-side verification the manifest exists
      // for.
      val leaves = graft.engine.Merkle.leavesOf(
        part.select(lit(0).as("k"), col("doc_id"), col("text")),
        "k", "doc_id", "text")
      val recomputed = graft.engine.Merkle.rootPerKey(
          leaves, "k", "pos", "h",
          graft.engine.Merkle.depthFor(math.max(1L, n)))
        .head().getString(1)
      assert(recomputed === root, s"$spl root mismatch vs manifest")
    }
    // the splits partition the mixed stage exactly
    val mixN = rep.find(_._1 == 5).get._3
    assert(written.count() === mixN)
    // the manifest file exists and carries all 9 stages
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "_MANIFEST.json")), "UTF-8")
    assert(Seq("raw", "quality", "exact_dedup", "neardup_drop",
      "decontaminated", "temperature_mix", "split_train", "split_val",
      "split_test").forall(manifest.contains), manifest)
  }

  test("q_dup_span_removal: excises non-owner copies and is idempotent") {
    import org.apache.spark.sql.functions.col
    val docs = new graft.engine.Catalog(spark, sf).documents
    val once = graft.llm.Dedup.removeDupSpans(docs)
    val onceRows = once.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    // the transformation must not be vacuous on this corpus
    assert(onceRows.exists(t => t._3 < t._2), "no duplicated span excised")
    // owners keep their copy: total tokens removed equals the number of
    // positions covered by non-owner duplicated spans — spot-check via
    // n_after <= n_before everywhere and equality for docs < 8 tokens
    onceRows.foreach { case (id, before, after, text) =>
      assert(after <= before, s"doc $id grew")
      val n = if (text.isEmpty) 0 else text.split(" ", -1).length
      assert(n.toLong === after, s"doc $id: n_after $after != tokens $n")
    }
    // IDEMPOTENCE: feeding the cleaned corpus back through the
    // transformation changes nothing — after pass 1 every duplicated
    // span's only survivor is its owner.
    val cleaned = once.select(col("doc_id"),
      col("text_clean").as("text"))
    val twiceRows = graft.llm.Dedup.removeDupSpans(cleaned).collect()
      .map(r => (r.getLong(0), r.getString(3))).sortBy(_._1)
    val onceTexts = onceRows.map(t => (t._1, t._4))
    assert(twiceRows.toSeq === onceTexts.toSeq,
      "second span-removal pass changed the corpus")
  }

  test("q_curation_pipeline: temperature mixing only downsamples, never invents") {
    // stage-5 members must be a subset of stage-4 survivors per the hash
    // gate; verified through counts already, here check determinism: two
    // runs produce identical roots (the hash gate has no RNG).
    val again = SparkEntry.queries("q_curation_pipeline")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(4)))
    val first = pipeline.map(t => (t._1, t._5))
    assert(again.sortBy(_._1).toSeq === first.sortBy(_._1).toSeq)
  }
}
