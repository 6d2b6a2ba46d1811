package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end curation CAPSTONE (q_curation_pipeline and its write
  * path): where q_curation_funnel only ACCOUNTS for stages from one scan,
  * this MATERIALIZES the FineWeb-style chain as a single staged DAG —
  * quality filter → exact dedup → near-dup drop (true transitive-closure
  * clusters, min-id representative) → decontamination vs the held-out
  * src0 benchmark (8-token shingles, the q_contamination rule) →
  * temperature mixing (τ=0.5 α-sampling, over-represented sources
  * down-sampled by an all-integer md5 hash-rate gate) → leakage-safe
  * train/val/test split — and stamps EVERY stage's surviving doc set with
  * a Merkle root (engine.Merkle), so each intermediate snapshot is
  * integrity-checkable against a re-run or a second copy without moving
  * data.
  *
  * Execution shape: stage membership is cumulative booleans on ONE corpus
  * scan (localCheckpointed once; tok + leaf hash computed there too, so
  * text never rides a second checkpoint or any stage shuffle); the graph,
  * contamination, and rate stages come back as NARROW key joins — never a
  * per-stage corpus rescan. The dup graph keys off the STABLE
  * pre-checkpoint plan (a localCheckpoint's plan is a fresh RDD-scan node
  * per run, which would miss Dedup's memo on every re-execution). After
  * the near-dup drop every cluster's sole survivor IS its min-id
  * representative, so the doc-keyed split hash is exactly the rep-keyed
  * q_leakage_safe_split rule.
  *
  * Determinism: all-integer hash gates, round-6/4 share arithmetic (the
  * q_mix_temperature contract), ×65536 is exact in FP (a power of two),
  * so any engine cuts identical doc sets and therefore identical roots —
  * the precondition for the composed DuckDB oracle.
  */
object Curation {

  /** The staged membership frame: one (stage, stage_name, doc_id, n_chars,
    * h) row per stage a doc survives — stages 0..5 are the pipeline, 6..8
    * the final split partitions. Returns (staged, rawPoolSize); `staged`
    * is localCheckpointed (narrow rows), rawPoolSize bounds the Merkle
    * depth. */
  /** The per-doc stage-independent columns (tok count, leaf hash, quality
    * verdict, dedup digest) — shared by the whole-corpus build and the
    * incremental append so the per-doc arithmetic is one definition. */
  private def baseCols(docs: DataFrame): DataFrame =
    docs.filter(col("source") =!= "src0")
      .select(col("source"), col("doc_id"), col("n_chars"), col("text"),
        size(split(col("text"), " ")).cast("bigint").as("tok"),
        md5(col("text")).as("h"),
        (TextStats.qualityVerdict(col("text")) === "keep").as("s1"),
        Dedup.digest(col("text")).as("dg"))

  def stagedMembers(docs: DataFrame): (DataFrame, Long) = {
    val flaggedPlan = baseCols(docs)
      .withColumn("s2", col("s1") && col("doc_id") ===
        min(when(col("s1"), col("doc_id"))).over(Window.partitionBy("dg")))
      .drop("dg")
    val flagged = flaggedPlan
      .localCheckpoint(eager = true) // every later stage re-enters it
    val losers = Dedup.dupGraphComponents(
        flaggedPlan.filter(col("s2")).select(col("doc_id"), col("text")))
      .filter(col("comp") < col("id"))
      .select(col("id").as("doc_id"), lit(true).as("__loser"))
    def withS3(df: DataFrame) = df.join(losers, Seq("doc_id"), "left")
      .withColumn("s3", col("s2") && col("__loser").isNull).drop("__loser")
    val evalSh = TextStats.md5ShingleHashes(
      docs.filter(col("source") === "src0"), "text", 8).distinct()
    val contam = TextStats.md5ShingleHashes(
        withS3(flagged).filter(col("s3")), "text", 8, "doc_id")
      .dropDuplicates("doc_id", "h")
      .join(evalSh, "h").select("doc_id").distinct()
      .withColumn("__cont", lit(true))
    val f4 = withS3(flagged.drop("text")).join(contam, Seq("doc_id"), "left")
      .withColumn("s4", col("s3") && col("__cont").isNull).drop("__cont")
      .localCheckpoint(eager = true) // rates + stack both re-enter it
    val staged = stackStages(f4)
    val maxN = flagged.count() // scalar action: raw pool size = max stage
    (staged, maxN)
  }

  /** Stages 5–8 (temperature mix + leakage-safe split) stacked onto the
    * cumulative booleans — shared VERBATIM by the whole-corpus build and
    * the incremental append ([[appendWave]]), so the mixing arithmetic
    * cannot drift between the two paths. `f4` must carry (source, doc_id,
    * n_chars, tok, h, s1, s2, s3, s4); extra columns are dropped by the
    * final select. Returns the narrow localCheckpointed staged frame. */
  private def stackStages(f4: DataFrame): DataFrame = {
    val perSrc = f4.filter(col("s4"))
      .groupBy("source").agg(sum("tok").as("n_tok"))
      .withColumn("r",
        round(sqrt(col("n_tok").cast("double")), 6).cast("decimal(20,6)"))
    val tot = perSrc.agg(sum("n_tok").cast("double").as("tot_tok"),
      sum("r").as("tot_r"))
    val rates = perSrc.crossJoin(broadcast(tot))
      .select(col("source"),
        floor(least(lit(1.0),
          round(round(col("r").cast("double") / col("tot_r").cast("double"), 6) /
            round(col("n_tok").cast("double") / col("tot_tok"), 6), 4))
          * 65536).cast("long").as("cap"))
    val hvMix = expr("CAST(conv(substring(md5(concat('mix_', " +
      "CAST(doc_id AS STRING))), 1, 4), 16, 10) AS BIGINT)")
    val hvSplit = expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), " +
      "1, 2), 16, 10) AS INT)")
    f4.join(broadcast(rates), Seq("source"), "left")
      .withColumn("s5", col("s4") && hvMix < coalesce(col("cap"), lit(0L)))
      .withColumn("sp", when(hvSplit < 204, "train")
        .when(hvSplit < 230, "val").otherwise("test"))
      .select(col("doc_id"), col("n_chars"), col("h"),
        expr("stack(9, 0, 'raw', true, 1, 'quality', s1, " +
          "2, 'exact_dedup', s2, 3, 'neardup_drop', s3, " +
          "4, 'decontaminated', s4, 5, 'temperature_mix', s5, " +
          "6, 'split_train', s5 AND sp = 'train', " +
          "7, 'split_val', s5 AND sp = 'val', " +
          "8, 'split_test', s5 AND sp = 'test') " +
          "AS (stage, stage_name, alive)"))
      .filter(col("alive"))
      // narrow (stage, doc_id, n_chars, h) rows; materialized once so the
      // counts rollup and the Merkle leaves don't each re-run the stack +
      // rate-broadcast join
      .localCheckpoint(eager = true)
  }

  /** The q_curation_pipeline report: per stage (stage, stage_name, n_docs,
    * n_chars, root), ordered by stage. */
  def report(docs: DataFrame): DataFrame = {
    val (staged, maxN) = stagedMembers(docs)
    reportOf(staged, maxN)
  }

  /** Test hook: the report for an externally-produced staged frame (the
    * Round11 spec drives [[appendWave]] on non-default splits). */
  private[graft] def reportForTest(staged: DataFrame, maxN: Long): DataFrame =
    reportOf(staged, maxN)

  private def reportOf(staged: DataFrame, maxN: Long): DataFrame = {
    val counts = staged.groupBy("stage", "stage_name")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
    // leaf numbering via the bucketed global rank (Merkle.numberedLeaves)
    // — stage 0 is the whole raw pool, which a per-stage window would
    // serialize through one reducer at production scale
    val leaves = graft.engine.Merkle.numberedLeaves(
      staged, "stage", "doc_id", "h",
      // staged is localCheckpointed (narrow rows) two lines up in
      // stackStages — a second eager checkpoint inside numberedLeaves
      // would only add a fixed-latency job (the round-11 regression)
      materialize = false)
    graft.engine.Merkle.rootPerKey(leaves, "stage", "pos", "h",
        graft.engine.Merkle.depthFor(maxN))
      .join(counts, "stage")
      .select(col("stage"), col("stage_name"), col("n_docs"),
        col("n_chars"), col("root"))
      .orderBy("stage")
  }

  /** The PRODUCTION write path: materialize the curated corpus as
    * `path/data/split={train,val,test}/` parquet (full rows joined back by
    * id — text rides only this final write, never a stage shuffle) plus
    * `path/_MANIFEST.json` carrying every stage's count/chars/root, so a
    * consumer can verify any split (or any earlier snapshot) against the
    * manifest by recomputing one hash, without re-reading the producer's
    * copy. Returns the manifest rows. */
  def writeSplits(docs: DataFrame, path: String): Seq[(Int, String, Long, Long, String)] = {
    val (staged, maxN) = stagedMembers(docs)
    val rep = reportOf(staged, maxN).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    val members = staged.filter(col("stage") >= 6)
      .select(col("doc_id"), expr("substring(stage_name, 7)").as("split"))
    docs.join(members, "doc_id")
      .write.mode("overwrite").partitionBy("split").parquet(s"$path/data")
    val manifest = rep.map { case (st, name, n, ch, root) =>
      s"""  {"stage": $st, "stage_name": "$name", "n_docs": $n, "n_chars": $ch, "root": "$root"}"""
    }.mkString("{\n \"stages\": [\n", ",\n", "\n ]\n}\n")
    // write the manifest through the SAME filesystem as the data (the
    // Hadoop FS resolved from `path`), so hdfs:// and s3a:// destinations
    // get data and manifest side by side; local paths behave as before
    val mPath = new org.apache.hadoop.fs.Path(path, "_MANIFEST.json")
    val fs = mPath.getFileSystem(
      docs.sparkSession.sparkContext.hadoopConfiguration)
    val os = fs.create(mPath, true)
    try os.write(manifest.getBytes("UTF-8")) finally os.close()
    rep
  }

  /** Everything an APPEND needs from an already-curated corpus — none of
    * it the curated text, which is the 100 TB contract: a daily refresh
    * re-reads the NEW wave only.
    *  - `docs`: one narrow text-free row per pool doc (stage flags s1/s2
    *    final — quality is per-doc, and append-only ascending ids can
    *    never unseat an exact-dedup winner — plus the contamination bit,
    *    final because the benchmark is static);
    *  - `grams`: the mergeable rare-gram index ([[Dedup.gramStats]]) over
    *    the exact-dedup survivors — near-dup edges are NOT append-
    *    monotone (a new doc can both create and DESTROY `nd = 2` grams),
    *    so the index keeps the per-gram sufficient stats, not the edges;
    *  - `evalSh`: the held-out benchmark's distinct shingle hashes.
    * All three are localCheckpointed — the append path never re-enters
    * wave-1 lineage. */
  final case class CurationState(docs: DataFrame, grams: DataFrame,
                                 evalSh: DataFrame)

  /** Curate `docs` AND capture the incremental state. The staged flags
    * match [[stagedMembers]] on the same input by construction (same
    * baseCols / window / graph rules); contamination is computed for ALL
    * exact-dedup survivors — not just near-dup survivors — because a
    * later wave can flip s3 either way (cluster merges AND destroyed
    * rare-gram edges), and the per-doc contamination bit must already be
    * there when it does. */
  def buildState(docs: DataFrame): CurationState = {
    val flaggedPlan = baseCols(docs)
      .withColumn("s2", col("s1") && col("doc_id") ===
        min(when(col("s1"), col("doc_id"))).over(Window.partitionBy("dg")))
    val flagged = flaggedPlan.localCheckpoint(eager = true)
    val grams = Dedup.gramStats(flagged.filter(col("s2")))
      .localCheckpoint(eager = true)
    val evalSh = TextStats.md5ShingleHashes(
        docs.filter(col("source") === "src0"), "text", 8).distinct()
      .localCheckpoint(eager = true)
    val cont = TextStats.md5ShingleHashes(
        flagged.filter(col("s2")), "text", 8, "doc_id")
      .dropDuplicates("doc_id", "h")
      .join(evalSh, "h").select("doc_id").distinct()
      .withColumn("__cont", lit(true))
    val docsState = flagged.drop("text")
      .join(cont, Seq("doc_id"), "left")
      .withColumn("cont", coalesce(col("__cont"), lit(false)))
      .drop("__cont")
      .localCheckpoint(eager = true)
    CurationState(docsState, grams, evalSh)
  }

  /** Shared first half of an append: wave-local quality/exact-dedup verdicts
    * for the new wave (text dropped after the contamination probe) plus the
    * MERGED rare-gram index. Factored out so [[appendWave]] (which goes on
    * to re-derive edges and stack stages) and [[appendState]] (which just
    * packages the next state) stay one definition — the associativity of
    * the gram merge is exactly what the three-wave spec pins. */
  private def absorbWave(state: CurationState, wave2: DataFrame)
      : (DataFrame, DataFrame) = {
    val w1dg = state.docs.filter(col("s1"))
      .select(col("dg")).distinct().withColumn("__seen", lit(true))
    val w2 = baseCols(wave2)
      .withColumn("s2w", col("s1") && col("doc_id") ===
        min(when(col("s1"), col("doc_id"))).over(Window.partitionBy("dg")))
      .join(w1dg, Seq("dg"), "left")
      .withColumn("s2", col("s2w") && col("__seen").isNull)
      .drop("s2w", "__seen")
      .localCheckpoint(eager = true)
    val merged = state.grams
      .unionByName(Dedup.gramStats(w2.filter(col("s2"))))
      .groupBy("gram")
      .agg(sum("nd").as("nd"), min("mn").as("mn"), max("mx").as("mx"))
    val cont2 = TextStats.md5ShingleHashes(
        w2.filter(col("s2")), "text", 8, "doc_id")
      .dropDuplicates("doc_id", "h")
      .join(state.evalSh, "h").select("doc_id").distinct()
      .withColumn("__cont", lit(true))
    val w2docs = w2.drop("text").join(cont2, Seq("doc_id"), "left")
      .withColumn("cont", coalesce(col("__cont"), lit(false)))
      .drop("__cont")
    (w2docs, merged)
  }

  /** Absorb a wave into the STATE (no report): the next state's docs are
    * the union of per-doc verdict rows, its gram index the merged
    * sufficient stats, the benchmark shingles unchanged (static benchmark).
    * Chaining contract: appendWave(appendState(s, w2), w3) ==
    * appendWave(s, w2 ∪ w3) == rebuild(w1 ∪ w2 ∪ w3) — the gram index
    * merges by (sum, min, max), all associative+commutative, and s3/s4 are
    * re-derived from the merged index each time, never carried. Pinned
    * (with an empty middle wave) by the round-13 three-wave spec. */
  def appendState(state: CurationState, wave2: DataFrame): CurationState = {
    val (w2docs, merged) = absorbWave(state, wave2)
    CurationState(
      state.docs.unionByName(w2docs).localCheckpoint(eager = true),
      merged.localCheckpoint(eager = true),
      state.evalSh)
  }

  /** Append a new wave (ids strictly above the state's — the append-only
    * id contract) and produce the staged frame of the UNION, reading
    * wave-1 text exactly zero times:
    *  1. wave-2 quality + exact dedup = per-doc verdicts, a wave-local
    *     min window (batch-sized), and a digest anti-join against the
    *     state (the q_dedup_incremental rule);
    *  2. near-dup = merge the wave-2 gram stats into the state index
    *     (sum nd, fold mn/mx) and re-derive the `nd = 2` edge set — this
    *     re-ranks EXISTING docs too (merged clusters drop old docs,
    *     destroyed edges resurrect them), which is why the index, not the
    *     edge list, is the state;
    *  3. decontaminate the new docs against the static benchmark
    *     shingles;
    *  4. temperature mix + split re-rank globally from the narrow
    *     per-doc frame (token sums changed), via the SAME stackStages.
    * Returns (staged, rawPoolSize) — identical, stage for stage and root
    * for root, to stagedMembers(wave1 ∪ wave2). */
  def appendWave(state: CurationState, wave2: DataFrame): (DataFrame, Long) = {
    val (w2docs, merged) = absorbWave(state, wave2)
    val edges = merged.filter(col("nd") === 2 && col("mn") =!= col("mx"))
      .select(col("mn").as("src"), col("mx").as("dst")).distinct()
    val losers = Dedup.connectedComponents(edges, "src", "dst")
      .filter(col("comp") < col("id"))
      .select(col("id").as("doc_id"), lit(true).as("__loser"))
    val f4 = state.docs.unionByName(w2docs)
      .join(losers, Seq("doc_id"), "left")
      .withColumn("s3", col("s2") && col("__loser").isNull).drop("__loser")
      .withColumn("s4", col("s3") && !col("cont"))
      .localCheckpoint(eager = true)
    (stackStages(f4), f4.count())
  }

  /** The q_curation_incremental drill: split the pool at the id midpoint
    * (the benchmark source rides with wave 1 — benchmarks are curated up
    * front, not appended), build state on wave 1, append wave 2, report.
    * The report is bit-identical to [[report]] on the full corpus — the
    * oracle for both is the SAME full-rebuild SQL, so a green check IS
    * the proof that append ∘ build == rebuild. */
  def incrementalReport(docs: DataFrame): DataFrame = {
    val pool = docs.filter(col("source") =!= "src0")
    val r = pool.agg(min("doc_id"), max("doc_id")).head()
    val mid = (r.getLong(0) + r.getLong(1)) / 2
    val state = buildState(
      pool.filter(col("doc_id") <= mid)
        .unionByName(docs.filter(col("source") === "src0")))
    val (staged, maxN) = appendWave(state, pool.filter(col("doc_id") > mid))
    reportOf(staged, maxN)
  }
}
