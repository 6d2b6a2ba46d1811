package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{Catalog, Checks, Ops, Sinks}
import graft.llm.{Bpe, Classify, Dedup, Pq, Similarity, Spectral, TextStats, Unigram}
import graft.multimodal.Multimodal
import graft.streaming.EventStreams
import SparkEntry.{cat, scratch, withPathLock, dirFingerprint}

/** Text-analysis / quality-scoring / corpus-modeling tier of the driver surface: token and subword counting, language-ID and balance, quality scores/filters/blends, repetition and entropy signals, boilerplate handling, PII redaction, char n-grams, BM25, PMI, LM perplexity, keyphrases (RAKE/TextRank), readability, Zipf, OOV, inverted index and phrase search.
  *
  * Extracted verbatim from [[SparkEntry.queriesBase]] (round 14) — same
  * keys, same closures, zero behavior change; the matching oracle SQL
  * stays in [[OracleSql]]. */
object TextQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --------------------------------------------- LLM-pipeline: text ops
    "q_text_stats" -> ((s, dir) =>
      TextStats.corpusStats(cat(s, dir).documents, "text", Seq("lang"))),

    "q_token_count" -> ((s, dir) => {
      val d = cat(s, dir).documents
      d.groupBy("source").agg(
          sum(TextStats.tokenCount(col("text"))).as("tokens"),
          round(avg(TextStats.tokenCount(col("text"))), 2).as("avg_tokens"))
        .orderBy("source")
    }),

    "q_subword_count" -> ((s, dir) => {
      // BPE-ish subword splitting uses lookaround regex (not RE2-
      // expressible), but the SPLIT COUNT is a pure character fold:
      // 1 + #maximal-whitespace-runs + #{positions q ≥ 2 with a
      // digit↔letter transition or an ASCII-punct char} — Java's split
      // suppresses the zero-width match at position 0 and keeps trailing
      // empties (limit −1), which is exactly what the formula counts. The
      // oracle restates that fold in DuckDB list SQL (the q_soundex_key
      // pattern), so the kernel and its spec can't drift.
      val d = cat(s, dir).documents
      d.groupBy("lang").agg(
          sum(TextStats.subwordCount(col("text"))).as("subwords"),
          round(avg(TextStats.subwordCount(col("text"))), 2).as("avg_subwords"))
        .orderBy("lang")
    }),

    "q_repetition_signals" -> ((s, dir) => {
      // Gopher-style INTRA-document repetition signals (Rae et al. 2021's
      // repetition filters — the quality axis the rule filter doesn't
      // cover; cross-doc duplication is q_dup_spans' axis): per doc, the
      // share of 2-gram and 3-gram positions whose gram repeats within
      // the doc, plus the share of immediate token repeats
      // (tok[i] == tok[i−1]); a doc is flagged repetitive on the integer
      // compare dup3·10 > total3·3 (> 30% duplicated 3-gram positions).
      // Every signal is a sort + lambda fold on the per-doc token array —
      // no corpus shuffle ever carries gram strings — and the per-source
      // rollup is a ratio of integer SUMS, order-free. Index arithmetic
      // is clamped (greatest/least) so both engines evaluate in-range:
      // Spark's element_at throws on 0 where DuckDB's list index returns
      // NULL, so the clamped form is the one that can't drift.
      val sig = TextStats.repetitionSignals(col("text"))
      val per = cat(s, dir).documents.select(col("source"),
        sig.getField("n_tok").as("n_tok"),
        sig.getField("n_rep").as("n_rep"),
        sig.getField("dup2").as("dup2"), sig.getField("n2").as("n2"),
        sig.getField("dup3").as("dup3"), sig.getField("n3").as("n3"))
      per.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(sum("dup2").cast("double") / sum("n2"), 4).as("dup2_frac"),
          round(sum("dup3").cast("double") / sum("n3"), 4).as("dup3_frac"),
          round(sum("n_rep").cast("double") / sum("n_tok"), 4)
            .as("repeat_frac"),
          sum(when(col("dup3") * 10 > col("n3") * 3, 1L).otherwise(0L))
            .as("n_repetitive"))
        .orderBy("source")
    }),

    "q_quality_filter" -> ((s, dir) => {
      // Explainable keep/drop accounting per language — the filter stage a
      // training-data pipeline runs before dedup/embedding.
      cat(s, dir).documents
        .groupBy(col("lang"), TextStats.qualityVerdict(col("text")).as("verdict"))
        .agg(count(lit(1)).as("docs"))
        .orderBy("lang", "verdict")
    }),

    "q_normalize" -> ((s, dir) => {
      // Normalization ahead of exact dedup: same text modulo
      // case/punctuation/whitespace collapses to one digest.
      val d = cat(s, dir).documents
      d.agg(
        countDistinct(Dedup.digest(col("text"))).as("raw_distinct"),
        countDistinct(Dedup.digest(TextStats.normalize(col("text")))).as("norm_distinct"))
    }),

    "q_quantile_group" -> ((s, dir) => {
      cat(s, dir).lineitem.groupBy("l_returnflag").agg(
          round(expr("percentile(l_quantity, 0.5)"), 2).as("med_qty"),
          round(expr("percentile(l_extendedprice, 0.95)"), 2).as("p95_price"))
        .orderBy("l_returnflag")
    }),

    "q_quality" -> ((s, dir) => {
      val d = cat(s, dir).documents
      d.groupBy("lang").agg(
          round(sum(TextStats.stopwordCount(col("text"))).cast("double") /
                sum(TextStats.tokenCount(col("text"))), 4).as("stop_ratio"))
        .orderBy("lang")
    }),

    "q_quality_score" -> ((s, dir) => {
      cat(s, dir).documents
        .select(col("doc_id"), TextStats.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }),

    "q_lang_id" -> ((s, dir) => {
      cat(s, dir).documents
        .groupBy(col("lang"), TextStats.langId(col("text")).as("pred"))
        .agg(count(lit(1)).as("docs"))
        .orderBy("lang", "pred")
    }),

    "q_token_budget" -> ((s, dir) => {
      // Budget-based sampling: take documents per source in deterministic
      // id order until a 5000-char budget fills — the "N tokens from each
      // source" curation step (q_mix_sample is rate-based; this is
      // budget-based, the form dataset cards specify). One running-sum
      // window over the source partition (distributed across shards),
      // then a 1-row-per-source rollup.
      val w = Window.partitionBy("source").orderBy("doc_id")
      cat(s, dir).documents
        .withColumn("ctoks", sum(col("n_chars")).over(w))
        .filter(col("ctoks") <= 5000)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("bigint").as("chars_used"))
        .orderBy("source")
    }),

    "q_quality_blend" -> ((s, dir) => {
      // Multi-signal curation ranking: incommensurate signals (heuristic
      // quality score, document length) are percentile-normalized per
      // source — rank-based, so no hand-tuned scaling — and blended
      // 0.6/0.4; the top-3 per source is what a curation review queue
      // surfaces. Windows partition by source (distributed across shards;
      // never a global sort) and the cut is the bounded-heap top-k.
      val wq = Window.partitionBy("source").orderBy(col("quality"))
      val wl = Window.partitionBy("source").orderBy(col("n_chars"))
      val d = cat(s, dir).documents
        .select(col("source"), col("doc_id"), col("n_chars"),
          TextStats.qualityScore(col("text")).as("quality"))
        .withColumn("pq", percent_rank().over(wq))
        .withColumn("pl", percent_rank().over(wl))
        .withColumn("blend", round(col("pq") * 0.6 + col("pl") * 0.4, 6))
      graft.plans.TopKPerGroup.topKPerGroup(d, Seq(col("source")),
          Seq(col("blend").desc, col("doc_id")), 3)
        .select(col("source"), col("doc_id"), col("blend"))
        .orderBy("source", "doc_id")
    }),

    "q_quantile_align" -> ((s, dir) => {
      // Cross-source score calibration by QUANTILE MAPPING — before a
      // single global threshold can gate a multi-source corpus, each
      // source's score distribution must be aligned to the pooled one
      // (source A's 90th percentile ≠ source B's). Every doc maps to its
      // source-local percentile cell k = ((r−1)·100) div (n_s−1) — pure
      // integer arithmetic, no float ranks — and the cell's aligned score
      // is the POOLED distribution's k-th percentile (type-1/disc: the
      // value at global rank ((N−1)·k) div 100 + 1). The pooled rank
      // reuses the q_surrogate_keys bucketed-rank shape (min/max scan →
      // order-preserving integer buckets → per-bucket row_number +
      // broadcast offsets), so NO single-partition sort ever sees the
      // corpus; the 101 percentile targets join back broadcast. Output is
      // the bounded sources×cells calibration table.
      val d = cat(s, dir).documents.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("score"))
      val ws = Window.partitionBy("source").orderBy("score", "doc_id")
      val cells = d.withColumn("r", row_number().over(ws))
        .withColumn("ns", count(lit(1)).over(Window.partitionBy("source")))
        .withColumn("k", expr("CAST(CASE WHEN ns > 1 THEN " +
          "((CAST(r AS BIGINT) - 1) * 100) DIV (ns - 1) ELSE 0 END AS INT)"))
        .groupBy("source", "k")
        .agg(count(lit(1)).as("n_docs"), min("score").as("min_score"),
          max("score").as("max_score"))
      // pooled rank, bucketed (no global single-partition window)
      val mmr = d.agg(min("score"), max("score"), count(lit(1))).head()
      val (mn, mx, n) = (mmr.getLong(0), mmr.getLong(1), mmr.getLong(2))
      val span = mx - mn + 1
      val g = d.withColumn("b",
          expr(s"CAST(((score - $mn) * 64) DIV $span AS INT)"))
      val offs = g.groupBy("b").agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum("cnt").over(Window.orderBy("b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("b", "off")
      val ranked = g.withColumn("rn",
          row_number().over(Window.partitionBy("b").orderBy("score", "doc_id")))
        .join(broadcast(offs), "b")
        .select(col("score"), (col("off") + col("rn")).as("gr"))
      import s.implicits._
      val tgt = (0 to 100).map(k => (k, (n - 1) * k / 100 + 1)).toDF("k", "rk")
      val pv = ranked.join(broadcast(tgt), col("gr") === col("rk"))
        .select(col("k"), col("score").as("aligned_score"))
      cells.join(broadcast(pv), Seq("k"))
        .select(col("source"), col("k"), col("n_docs"), col("aligned_score"),
          col("min_score"), col("max_score"))
        .orderBy("source", "k")
    }),

    "q_fingerprint" -> ((s, dir) => {
      // Per-doc winnowing fingerprint SUMMARY over the WHOLE corpus,
      // rebased on portable md5 gram hashes (the q_winnow_fingerprint
      // hash rule) so the production winnowing kernel
      // (ArrayKernels.winnowMins — the codegen window-min scan) is
      // oracle-checked end to end: n_fp = |sorted-distinct window
      // minima|, fp_min = the smallest fingerprint (the join key a
      // near-dup prefilter blocks on). The xxhash64 fast path of the
      // same kernel chain stays spec-tested (TextStatsSpec). Unlike
      // q_winnow_fingerprint's exploded 200-doc panel, no repartition
      // barrier is needed: the hash array feeds ONE kernel call, so
      // CollapseProject inlines it exactly once.
      val hs = transform(TextStats.wordGramsPositional(col("text"), 3),
        g => conv(substring(md5(g), 1, 7), 16, 10).cast("bigint"))
      val fp = graft.functions.ArrayKernels.winnowMins(hs, 4)
      cat(s, dir).documents
        .select(col("doc_id"), size(fp).as("n_fp"), element_at(fp, 1).as("fp_min"))
        .orderBy("doc_id")
    }),

    "q_edit_distance" -> ((s, dir) => {
      // Levenshtein near-dup over id-adjacent pairs — the blocked-pair shape
      // fuzzy key matching uses (blocking here = id adjacency).
      val c = cat(s, dir)
      val a = c.customer.select(col("c_custkey").as("id_a"), col("c_name").as("na"))
      val b = c.customer.select((col("c_custkey") - 1).as("id_a"), col("c_name").as("nb"))
      a.join(b, "id_a")
        .select(col("id_a"), levenshtein(col("na"), col("nb")).as("dist"))
        .orderBy("id_a")
    }),

    "q_heavy_hitters" -> ((s, dir) => {
      // Exact frequent tokens WITHOUT a full-width groupBy: Misra-Gries
      // candidates (bounded k-counter Aggregator, superset guarantee) +
      // exact recount of candidates only — equals GROUP BY/HAVING exactly
      // while the widest aggregation has <= k groups (llm.HeavyHitters).
      graft.llm.HeavyHitters.heavyHitters(
        cat(s, dir).documents
          .select(explode(split(col("text"), "\\s+")).as("tok")),
        col("tok"), support = 100)
    }),

    "q_explode_tokens" -> ((s, dir) => {
      cat(s, dir).documents
        .select(explode(split(col("text"), "\\s+")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(50)
    }),

    "q_tfidf" -> ((s, dir) => {
      TextStats.tfIdf(cat(s, dir).documents, "doc_id", "text")
        .orderBy(col("score").desc, col("doc_id"), col("token")).limit(100)
    }),

    "q_repetition" -> ((s, dir) => {
      // Repetition ratio (1 - distinct/total tokens): the C4/Gopher-style
      // boilerplate signal — high ratio = template/spam candidate. Map-only
      // until the bounded top-20.
      val toks = split(col("text"), "\\s+")
      cat(s, dir).documents
        .select(col("doc_id"),
          round(lit(1.0) - size(array_distinct(toks)).cast("double") /
            greatest(size(toks), lit(1)), 4).as("rep_ratio"),
          size(toks).as("n_tokens"))
        .orderBy(col("rep_ratio").desc, col("doc_id"))
        .limit(20)
    }),

    "q_entropy" -> ((s, dir) => {
      // Token Shannon entropy per source: H = ln(N) - Σ c·ln(c) / N over
      // the (source, token) counts — corpus-diversity QA signal. Two
      // partial-aggregable groupBys, the second over |vocab| rows only.
      val cnt = cat(s, dir).documents
        .select(col("source"), explode(split(col("text"), "\\s+")).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      cnt.groupBy("source")
        .agg(round(log(sum("c")) - sum(col("c") * log(col("c"))) / sum("c"), 4)
            .as("entropy"),
          sum("c").as("n_tokens"))
        .orderBy("source")
    }),

    "q_vocab_truncate" -> ((s, dir) => {
      // Vocabulary truncation: tokens under a frequency floor collapse to
      // '<unk>' — the long-tail cut before tokenizer training. The truncated
      // distribution is derived from the COUNTS table alone (rename + re-sum
      // over distinct tokens): one partial-agg shuffle over the corpus, and
      // never a join or broadcast against the unbounded raw vocabulary.
      val toks = cat(s, dir).documents
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      toks.groupBy("tok").agg(count(lit(1)).as("n"))
        .select(when(col("n") < 50, lit("<unk>")).otherwise(col("tok")).as("tok2"),
          col("n"))
        .groupBy("tok2").agg(sum("n").as("n_tok"))
        .orderBy(col("n_tok").desc, col("tok2"))
    }),

    "q_pii_redact" -> ((s, dir) => {
      // PII scrubbing: deterministic synthetic emails appended (the corpus
      // has none), pattern-redacted, and audited — the privacy filter every
      // pre-training corpus passes through. Pure codegen'd regex kernels.
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
      cat(s, dir).documents
        .withColumn("aug", concat(col("text"), lit(" contact: user"),
          col("doc_id"), lit("@example.com")))
        .withColumn("redacted", regexp_replace(col("aug"), emailRe, "<EMAIL>"))
        .groupBy("lang").agg(count(lit(1)).as("n_docs"),
          sum(size(regexp_extract_all(col("aug"), lit(emailRe), lit(0)))
            .cast("bigint")).as("n_emails"),
          sum(length(col("redacted"))).as("total_len"))
        .orderBy("lang")
    }),

    "q_char_ngrams" -> ((s, dir) => {
      // Top-5 character trigrams per language — the n-gram profile behind
      // the lang-id heuristic. The hot path is the PACKED-TRIGRAM kernel
      // (functions.TrigramKernels): one codegen'd UTF-8 decode per document
      // emits every trigram as 3 code points packed into a long, so the
      // exploded rows and the (lang, gram) aggregation keys are primitive
      // longs — no per-position substring allocation, no string hashing
      // (2.6x at sf0.1 over the explode+substring plan, identical rows:
      // packed order == UTF-8 byte order, so even the ORDER BY g tie-break
      // is preserved; Round13QueriesSpec pins the equality). Top-k runs on
      // the CUSTOM bounded-heap TopKPerGroup operator (no per-language
      // sort); only the <= 5-per-language winners are unpacked to strings.
      val grams = cat(s, dir).documents
        .filter(length(col("text")) >= 3)
        .select(col("lang"),
          explode(graft.functions.TrigramKernels.charTrigramCodes(col("text"))).as("gc"))
      val counts = grams.groupBy("lang", "gc").agg(count(lit(1)).as("n"))
      graft.plans.TopKPerGroup.topKPerGroup(counts, Seq(col("lang")),
          Seq(col("n").desc, col("gc")), 5)
        .select(col("lang"), col("rk").cast("bigint").as("rk"),
          graft.functions.TrigramKernels.trigramFromCode(col("gc")).as("g"), col("n"))
        .orderBy("lang", "rk")
    }),

    "q_bm25" -> ((s, dir) => {
      // BM25 relevance scoring for a fixed query over the corpus — the
      // retrieval scorer behind corpus search/selection. tf comes from one
      // explode+count with the term filter applied BEFORE the shuffle (only
      // query-term postings move); df (|terms| rows) and the corpus stats
      // (1 row) are broadcast, so the only corpus-wide shuffle is the
      // (doc, term) count.
      val terms = Seq("spark", "join", "filter")
      val (k1, b) = (1.2, 0.75)
      val docs = cat(s, dir).documents
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), size(col("w")).cast("double").as("dl"), col("w"))
      val stats = docs.agg(count(lit(1)).cast("double").as("n"),
        avg("dl").as("avgdl"))
      val tf = docs.select(col("doc_id"), col("dl"), explode(col("w")).as("tok"))
        .filter(col("tok").isin(terms: _*))
        .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).cast("double").as("tf"))
      val dfreq = tf.groupBy("tok")
        .agg(countDistinct("doc_id").cast("double").as("df"))
      tf.join(broadcast(dfreq), "tok").crossJoin(broadcast(stats))
        .withColumn("idf", log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1))
        .withColumn("contrib", col("idf") * col("tf") * lit(k1 + 1) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
        .groupBy("doc_id").agg(round(sum("contrib"), 4).as("bm25"))
        .orderBy("doc_id")
    }),

    "q_quantile_band" -> ((s, dir) => {
      // Percentile-band trim: drop each language's length tails (<p05,
      // >p95) — the distribution-aware length filter of corpus curation.
      // Exact per-group percentiles come from one partial-agg pass and
      // broadcast back (|langs| rows); NO window over the low-cardinality
      // lang key, which would funnel the corpus into |langs| tasks.
      val d = cat(s, dir).documents
      val bounds = d.groupBy("lang").agg(
        expr("percentile(n_chars, 0.05)").as("lo"),
        expr("percentile(n_chars, 0.95)").as("hi"))
      d.join(broadcast(bounds), "lang")
        .filter(col("n_chars") >= col("lo") && col("n_chars") <= col("hi"))
        .groupBy("lang").agg(count(lit(1)).as("n_kept"),
          min("n_chars").as("min_len"), max("n_chars").as("max_len"))
        .orderBy("lang")
    }),

    "q_boilerplate_chunks" -> ((s, dir) => {
      // Boilerplate detection at the sub-document level (the C4/RefinedWeb
      // line-dedup shape, over fixed 8-token chunks since the corpus has no
      // newlines): chunks repeated across ≥10 distinct docs are boilerplate.
      // Chunks are hashed BEFORE the count shuffle (fixed-width keys); the
      // per-doc audit joins the narrow (hash, nd) table back.
      val d = cat(s, dir).documents
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      val chunks = d.filter(size(col("w")) >= 8)
        .select(col("doc_id"),
          explode(expr("sequence(0, size(w) DIV 8 - 1)")).as("i"), col("w"))
        .select(col("doc_id"), expr("md5(array_join(slice(w, i * 8 + 1, 8), ' '))").as("h"))
      val counts = chunks.groupBy("h")
        .agg(countDistinct("doc_id").as("nd"))
      chunks.join(counts, "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("nd") >= 10, 1L).otherwise(0L)).as("n_boiler"))
        .orderBy("doc_id")
    }),

    "q_boilerplate_strip" -> ((s, dir) => {
      // The q_boilerplate_chunks audit turned into the TRANSFORMATION (the
      // CCNet line-dedup step that actually cleans a corpus): chunks
      // repeated across ≥10 distinct docs are dropped from every document
      // and the survivors reassemble in order. Unlike the audit, chunking
      // covers ALL words (ceil(n/8) chunks — the ragged tail participates),
      // so reassembly is lossless for clean docs. Scale shape: frequency
      // counts shuffle on fixed-width hashes; the drop is a left-anti join
      // against the narrow boilerplate-hash list; the one corpus-sized
      // shuffle is the per-doc regather that any reconstruction needs.
      val d = cat(s, dir).documents
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      val chunked = d
        .select(col("doc_id"),
          explode(expr("sequence(0, (size(w) + 7) DIV 8 - 1)")).as("i"), col("w"))
        .select(col("doc_id"), col("i"),
          expr("array_join(slice(w, i * 8 + 1, 8), ' ')").as("chunk"))
        .withColumn("h", md5(col("chunk")))
      val boiler = chunked.groupBy("h")
        .agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") >= 10).select("h")
      val kept = chunked.join(boiler, Seq("h"), "left_anti")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          concat_ws(" ", transform(
            array_sort(collect_list(struct(col("i"), col("chunk")))),
            c => c.getField("chunk"))).as("clean_text"))
      // Fully-boilerplate docs must surface as empty rows, not vanish.
      d.select("doc_id").join(kept, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("clean_text"), lit("")).as("clean_text"))
        .orderBy("doc_id")
    }),

    "q_lang_balance" -> ((s, dir) => {
      // Language rebalancing: downsample every language to the rarest one's
      // volume. keep iff hv * n_lang < 65536 * n_min, where hv is a 16-bit
      // value from the doc's md5 — ALL-INTEGER math (exact on any engine,
      // no float rate), deterministic across retries, and evaluated as a
      // plain filter against a broadcast 1-row/|langs|-row side.
      def nib(i: Int): org.apache.spark.sql.Column = {
        val c = ascii(substring(md5(col("doc_id").cast("string")), i, 1))
        when(c < 58, c - 48).otherwise(c - 87)
      }
      val hv = nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)
      val d = cat(s, dir).documents
      val counts = d.groupBy("lang").agg(count(lit(1)).as("n_lang"))
      val mn = counts.agg(min("n_lang").as("n_min"))
      d.join(broadcast(counts), "lang").crossJoin(broadcast(mn))
        .groupBy("lang")
        .agg(max("n_lang").as("n_total"),
          sum(when(hv * col("n_lang") < lit(65536L) * col("n_min"), 1L)
            .otherwise(0L)).as("n_kept"))
        .orderBy("lang")
    }),

    "q_bigram_pmi" -> ((s, dir) => {
      // PMI collocation mining: pointwise mutual information of adjacent
      // token pairs vs their unigram frequencies. Bigrams keep (a, b) as
      // separate columns so the two unigram joins are plain equality joins
      // on the token key. The vocab side is NOT hint-broadcast (a 100 TB
      // corpus's vocabulary can outgrow one executor; AQE is free to
      // broadcast when it measures small). Corpus totals (1 row) broadcast.
      // Output is top-20 by PMI, tie-broken lexically, via
      // TakeOrderedAndProject.
      val toks = cat(s, dir).documents
        .select(split(col("text"), " ").as("w"))
      val uni = toks.select(explode(col("w")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
      val bi = toks.filter(size(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS a, w[i] AS b))")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 20)
      val n = uni.agg(sum("c").cast("double").as("n_tok"))
      bi.join(uni.select(col("tok").as("a"), col("c").as("c_a")), "a")
        .join(uni.select(col("tok").as("b"), col("c").as("c_b")), "b")
        .crossJoin(broadcast(n))
        .withColumn("pmi", round(
          log(col("c_ab") * col("n_tok") / (col("c_a") * col("c_b"))), 4))
        .select("a", "b", "c_ab", "pmi")
        .orderBy(col("pmi").desc, col("a").asc, col("b").asc)
        .limit(20)
    }),

    "q_unigram_logprob" -> ((s, dir) => {
      // Unigram LM scoring — the CCNet-style quality proxy: per-doc mean
      // negative log-probability under the corpus's own unigram model. The
      // model (token → p) is vocab-sized, so scoring is an equality shuffle
      // join on the token key, then one per-doc aggregate; text never
      // re-shuffles, only (doc_id, token) pairs.
      val toks = cat(s, dir).documents
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val uni = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      val n = uni.agg(sum("c").cast("double").as("n_tok"))
      toks.join(uni, "tok").crossJoin(broadcast(n))
        .groupBy("doc_id")
        .agg(round(avg(-log(col("c") / col("n_tok"))), 4).as("xent"))
        .orderBy("doc_id")
    }),

    "q_lm_perplexity" -> ((s, dir) => {
      // Bigram-LM quality scoring — the next order up from
      // q_unigram_logprob's CCNet-style proxy: per-doc mean negative
      // log-probability under an add-1-smoothed bigram model trained on the
      // corpus itself (high xent = the doc's word TRANSITIONS look nothing
      // like the corpus — gibberish and boilerplate both score high even
      // when their unigram mix looks normal). Scale shape: the model is two
      // count tables keyed on (prev, cur) and (prev) — equality shuffle
      // joins of narrow token pairs; the vocab size is one broadcast
      // scalar; text never re-shuffles.
      val d = cat(s, dir).documents
      val ws = split(col("text"), " ")
      val pairs = d.filter(size(ws) >= 2)
        .select(col("doc_id"), explode(arrays_zip(
          slice(ws, lit(1), size(ws) - 1).as("prev"),
          slice(ws, lit(2), size(ws) - 1).as("cur"))).as("bg"))
        .select(col("doc_id"), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
      val c2 = pairs.groupBy("prev", "cur").agg(count(lit(1)).as("c2"))
      // A bigram-head count IS the sum of its continuations: deriving c1
      // from c2 drops the second instance-wide shuffle the old per-prev
      // count paid (c2 is distinct-pair-sized, orders of magnitude
      // smaller). A per-doc pair dedup before the model join was measured
      // SLOWER on this corpus — word-salted text repeats few in-doc
      // bigrams, so the dedup only widened the shuffle key.
      val c1 = c2.groupBy("prev").agg(sum("c2").as("c1"))
      val v = d.select(explode(ws).as("tok")).agg(countDistinct("tok").as("v"))
      pairs.join(c2, Seq("prev", "cur")).join(c1, Seq("prev"))
        .crossJoin(broadcast(v))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(-log((col("c2") + 1) / (col("c1") + col("v")))), 4).as("xent"))
        .orderBy("doc_id")
    }),

    "q_zipf" -> ((s, dir) => {
      // Zipf-exponent fit per source — corpus-health QA (natural text slopes
      // ≈ -1; boilerplate/spam flattens or steepens it). The top-500 cut
      // runs on the bounded-heap TopKPerGroup operator, NOT a row_number
      // window over the low-cardinality source key: the window would funnel
      // each source's ENTIRE vocabulary into one task, while the heap pass
      // keeps ≤500 rows per source per partition. Ranks are then assigned
      // by a window over the ≤500-row survivors (bounded by k, not vocab).
      // The OLS slope uses the same portable sum formula as q_regr
      // (identical arithmetic on both engines, no regr_* builtin drift).
      val counts = cat(s, dir).documents
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      val top = graft.plans.TopKPerGroup.topKPerGroup(counts,
        Seq(col("source")), Seq(col("c").desc, col("tok").asc), 500)
      val w = Window.partitionBy("source").orderBy(col("c").desc, col("tok").asc)
      val pts = top.withColumn("rk", row_number().over(w))
        .select(col("source"), log(col("rk").cast("double")).as("x"),
          log(col("c").cast("double")).as("y"))
      pts.groupBy("source")
        .agg(count(lit(1)).as("n_pts"),
          round((count(lit(1)) * sum(col("x") * col("y")) - sum("x") * sum("y")) /
            (count(lit(1)) * sum(col("x") * col("x")) - sum("x") * sum("x")), 4)
            .as("zipf_slope"))
        .orderBy("source")
    }),

    "q_oov_rate" -> ((s, dir) => {
      // Out-of-vocabulary rate per source against the corpus top-1000
      // vocabulary — the tokenizer-coverage gate before committing to a
      // vocab. Vocabulary selection is a bounded top-k (TakeOrdered, no
      // global sort); the 1000-row vocab broadcasts to the token stream, so
      // the corpus itself never shuffles for the join.
      val toks = cat(s, dir).documents
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok")).limit(1000)
        .select(col("tok").as("vtok"))
      toks.join(broadcast(vocab), col("tok") === col("vtok"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_tok"),
          sum(when(col("vtok").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_rate", round(col("n_oov") / col("n_tok"), 6))
        .orderBy("source")
    }),

    "q_cooccur_lift" -> ((s, dir) => {
      // Association-rule mining over the co-purchase graph: support /
      // confidence / lift for part pairs (1-in-5 subset, support ≥ 5), top
      // 20 by lift. Item supports join UN-hinted — |parts| is unbounded in
      // principle, so the engine (AQE) picks broadcast only while the frame
      // is actually small; the total-order count rides a one-row broadcast
      // (the q_tfidf corpus-frame pattern) — no scalar collect, no corpus
      // re-shuffle.
      val li = cat(s, dir).lineitem
        .filter(col("l_partkey") % 5 === 0)
        .select(col("l_orderkey").as("okey"), col("l_partkey").as("pk"))
        .distinct()
      val n = li.select(countDistinct("okey").as("n_orders"))
      val item = li.groupBy(col("pk")).agg(count(lit(1)).as("s_i"))
      val pairs = li.as("a").join(li.as("b"),
          col("a.okey") === col("b.okey") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
        .agg(count(lit(1)).as("s_ab"))
        .filter(col("s_ab") >= 5)
      pairs
        .join(item.select(col("pk").as("pa"), col("s_i").as("s_a")), "pa")
        .join(item.select(col("pk").as("pb"), col("s_i").as("s_b")), "pb")
        .crossJoin(broadcast(n))
        .select(col("pa"), col("pb"), col("s_ab"),
          round(col("s_ab") / col("s_a"), 4).as("conf"),
          round(col("s_ab") * col("n_orders") / (col("s_a") * col("s_b")), 4).as("lift"))
        .orderBy(col("lift").desc, col("pa"), col("pb"))
        .limit(20)
    }),

    "q_inverted_index" -> ((s, dir) =>
      // Inverted-index build: token → document-frequency + sorted posting
      // list, for the mid-frequency band (df 5..8) whose postings stay
      // bounded. ONE shuffle: collect_set dedups doc_ids itself AND
      // partially aggregates map-side, so the shuffle carries per-partition
      // distinct (tok, ids) sets — the explicit .distinct() this used to
      // run first was a second full pass over every token instance for a
      // dedup the aggregate already performs. Posting lists serialize as
      // comma-joined strings so the oracle's string_agg compares exactly.
      cat(s, dir).documents
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(collect_set(col("doc_id")).as("ids"))
        .filter(size(col("ids")).between(5, 8))
        .select(col("tok"), size(col("ids")).cast("bigint").as("df"),
          array_join(transform(array_sort(col("ids")), x => x.cast("string")), ",")
            .as("postings"))
        .orderBy("tok")),

    "q_rare_token_docs" -> ((s, dir) => {
      // Lexical-rarity density: score each doc by how much of it is spent on
      // the corpus's 10 LOWEST-FREQUENCY vocabulary terms (rank-based, so it
      // degrades gracefully on any corpus — an absolute-frequency cutoff
      // goes empty on small vocabularies). The rare set is tiny by
      // construction (bottom-k of the vocab) → broadcast to a codegen'd
      // hash-set membership filter on the token stream; only (doc, hits)
      // pairs ever shuffle. The "is this doc niche jargon or common
      // boilerplate" signal used in domain-balanced sampling.
      val docs = cat(s, dir).documents
      val toks = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      val rare = toks.groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n"), col("tok")).limit(10)
        .select(col("tok"), lit(1).as("is_rare"))
      toks.join(broadcast(rare), Seq("tok"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"),
          sum(coalesce(col("is_rare").cast("bigint"), lit(0L)))
            .as("n_rare"))
        .withColumn("rare_density",
          round(col("n_rare").cast("double") / col("n_tok"), 4))
        .orderBy(col("rare_density").desc, col("doc_id")).limit(20)
    }),

    "q_rake_keyphrases" -> ((s, dir) => {
      // RAKE keyphrase extraction (Rose et al. 2010): candidate phrases =
      // maximal stopword-free token runs (gaps-and-islands: position −
      // row_number inside each doc), word score = deg/freq over candidate
      // co-occurrence (deg = Σ phrase length per occurrence), phrase score
      // = Σ member word scores — the zero-model keyphrase pass a corpus
      // card runs beside TextRank. All stats are exact integers until the
      // per-word division; the phrase score folds word scores in INDEX
      // order via aggregate() (left-to-right, the oracle's
      // list_sum(list(s ORDER BY i)) — the spectral-oracle precedent), so
      // no summation-order slack is needed. Scale shape: one exploded
      // scan → vocab-sized word stats → distinct-phrase-sized scoring;
      // top-20 by (score, phrase) total order.
      val stops = TextStats.EnglishStops
      val toks = cat(s, dir).documents
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p", "w")))
        .filter(length(col("w")) > 0)
      val wd = Window.partitionBy("doc_id").orderBy("p")
      val runs = toks.filter(!col("w").isin(stops: _*))
        .withColumn("grp", col("p") - row_number().over(wd))
      val phr = runs.groupBy("doc_id", "grp")
        .agg(transform(array_sort(collect_list(struct(col("p"), col("w")))),
          x => x.getField("w")).as("words"))
      val ws = phr.select(explode(col("words")).as("w"),
          size(col("words")).cast("long").as("l"))
        .groupBy("w").agg(count(lit(1)).as("freq"), sum("l").as("deg"))
      val cnt = phr.groupBy("words").agg(count(lit(1)).as("n_occur"))
      val ex = cnt.select(col("words"), col("n_occur"),
        posexplode(col("words")).as(Seq("i", "w")))
      val ps = ex.join(ws, "w")
        .groupBy("words", "n_occur")
        .agg(aggregate(
          transform(array_sort(collect_list(struct(col("i"),
            (col("deg").cast("double") / col("freq")).as("sc")))),
            x => x.getField("sc")),
          lit(0.0), (acc, x) => acc + x).as("score"))
      ps.select(concat_ws(" ", col("words")).as("phrase"),
          size(col("words")).cast("bigint").as("n_words"),
          col("n_occur"), round(col("score"), 6).as("score"))
        .orderBy(col("score").desc, col("phrase"))
        .limit(20)
    }),

    "q_textrank" -> ((s, dir) => {
      // TextRank keyword extraction: WEIGHTED PageRank over the word
      // co-occurrence graph (undirected edges between ADJACENT tokens,
      // weight = occurrence count — the Mihalcea-Tarau recurrence;
      // unweighted rank degenerates to near-uniform on this corpus's
      // near-regular co-occurrence graph), top-20 by rank. Pure
      // composition of pinned primitives — the bigram adjacency
      // derivation (the q_lm_perplexity slice-zip), then
      // Graph.pageRankWeightedKeyed on STRING nodes (no long-id
      // dictionary pass; every step joins on the word itself), 3
      // iterations with the 9-decimal trajectory snap, final 6-decimal
      // rank order with the token as tie-break. Scale shape: the
      // text-wide explode collapses to a vocab-sized weighted edge list
      // before anything iterates — iterations touch only the (src, dst,
      // w) word graph.
      val ws = split(col("text"), " ")
      val pairs = cat(s, dir).documents.filter(size(ws) >= 2)
        .select(explode(arrays_zip(
          slice(ws, lit(1), size(ws) - 1).as("prev"),
          slice(ws, lit(2), size(ws) - 1).as("cur"))).as("bg"))
        .select(col("bg.prev").as("p"), col("bg.cur").as("c"))
        .filter(col("p") =!= col("c"))
        .groupBy(least(col("p"), col("c")).as("src"),
          greatest(col("p"), col("c")).as("dst"))
        .agg(count(lit(1)).as("w"))
      // edgesCanonical: pairs is one row per (least, greatest) word pair by
      // construction, so the symmetrization skips its 2|E| re-aggregation.
      val pr = graft.engine.Graph.pageRankWeightedKeyed(pairs, "src", "dst", "w",
        edgesCanonical = true)
      pr.select(col("id").as("tok"), round(col("pr"), 6).as("pr"))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("pr").desc, col("tok"))))
        .filter(col("rank") <= 20)
        .select(col("rank").cast("long").as("rank"), col("tok"), col("pr"))
        .orderBy("rank")
    }),

    "q_lexical_diversity" -> ((s, dir) => {
      // Per-source lexical diversity: Yule's K = 10⁴·(Σf²−N)/N² and
      // Simpson's D = Σf(f−1)/(N(N−1)) over token frequencies — the
      // length-robust repetitiveness scores (high K = low diversity =
      // boilerplate-ish source) a corpus-mixing decision reads alongside
      // q_entropy/q_zipf. All moments are exact integer sums; floats only
      // in the final closed forms. One explode + two partial-agg'd
      // shuffles, vocabulary-sized intermediates.
      val f = cat(s, dir).documents
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("f"))
      f.groupBy("source")
        .agg(sum("f").as("n_tok"), count(lit(1)).as("vocab"),
          sum(col("f") * col("f")).as("sf2"),
          sum(col("f") * (col("f") - 1)).as("sd"))
        .select(col("source"), col("n_tok"), col("vocab"),
          round(lit(10000.0) * (col("sf2") - col("n_tok")).cast("double")
            / (col("n_tok").cast("double") * col("n_tok").cast("double")),
            6).as("yule_k"),
          round(col("sd").cast("double")
            / (col("n_tok").cast("double") * (col("n_tok") - 1).cast("double")),
            9).as("simpson_d"))
        .orderBy("source")
    }),

    "q_kneser_ney" -> ((s, dir) => {
      // Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; Chen &
      // Goodman 1999) — the smoothing that actually ships in production
      // n-gram LMs, one fidelity order up from q_lm_perplexity's add-1: the
      // backoff mass is the discount freed from seen bigrams (D = 0.75)
      // and the backoff distribution is the CONTINUATION unigram (in how
      // many distinct contexts a word appears), not raw frequency —
      // "Francisco" is frequent but only ever follows "San", so its
      // continuation probability is tiny. Model = four count tables
      // (bigram, context total+fanout, continuation fanout, type total) —
      // all narrow equality shuffles on token keys; the text shuffles once
      // into bigrams and never again, and T broadcasts as one scalar.
      val d = cat(s, dir).documents
      val ws = split(col("text"), " ")
      val pairs = d.filter(size(ws) >= 2)
        .select(col("doc_id"), explode(arrays_zip(
          slice(ws, lit(1), size(ws) - 1).as("prev"),
          slice(ws, lit(2), size(ws) - 1).as("cur"))).as("bg"))
        .select(col("doc_id"), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
      val c2 = pairs.groupBy("prev", "cur").agg(count(lit(1)).as("c2"))
      val ctx = pairs.groupBy("prev")
        .agg(count(lit(1)).as("c1"), countDistinct("cur").as("nv"))
      val cont = pairs.groupBy("cur").agg(countDistinct("prev").as("nw"))
      val t = c2.agg(count(lit(1)).as("t"))
      pairs.join(c2, Seq("prev", "cur")).join(ctx, Seq("prev"))
        .join(cont, Seq("cur")).crossJoin(broadcast(t))
        .select(col("doc_id"), (-log(
          greatest(col("c2") - 0.75, lit(0.0)) / col("c1") +
            lit(0.75) * col("nv") / col("c1") * (col("nw") / col("t")))).as("nll"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), round(avg("nll"), 4).as("xent"))
        .orderBy("doc_id")
    }),

    "q_readability" -> ((s, dir) => {
      // Flesch reading-ease per doc (Flesch 1948) — the classic
      // dictionary-free readability gate a curation pipeline runs beside
      // stopword/punctuation quality: 206.835 − 1.015·(words/sentences) −
      // 84.6·(syllables/word), sentences = terminal-punct marks (floor 1),
      // syllables = vowel-group runs. Pure per-row arithmetic over one
      // projected scan — zero shuffles before the output sort, so at 100 TB
      // it is scan-bound by construction.
      val wsz = size(split(col("text"), " ")).cast("double")
      val sents = greatest(lit(1),
        length(regexp_replace(col("text"), "[^.!?]", ""))).cast("double")
      val syll = size(regexp_extract_all(lower(col("text")),
        lit("[aeiouy]+"), lit(0))).cast("double")
      cat(s, dir).documents
        .select(col("doc_id"), wsz.cast("bigint").as("n_words"),
          sents.cast("bigint").as("n_sents"), syll.cast("bigint").as("n_syll"),
          round(lit(206.835) - lit(1.015) * (wsz / sents) -
            lit(84.6) * (syll / wsz), 4).as("flesch"))
        .orderBy("doc_id")
    }),

    "q_phrase_search" -> ((s, dir) => {
      // Exact phrase search over a positional inverted index — the IR
      // primitive BM25/tfidf can't express (term adjacency). One pass
      // builds (doc, pos, token) postings; the broadcast phrase-vocabulary
      // join FILTERS postings to query terms BEFORE anything shuffles, so
      // at 100 TB the exchange carries only query-term postings. A phrase
      // of length L matches at (doc, start) iff all L (start+i, wordᵢ)
      // postings exist — counted with one grouped agg, no L-way self-join.
      import s.implicits._
      val phrases = Seq("part filter", "batch scan", "big order",
        "agg table", "slow hash batch")
      val words = phrases.toDF("phrase")
        .select(col("phrase"), size(split(col("phrase"), " ")).as("plen"),
          posexplode(split(col("phrase"), " ")).as(Seq("idx", "w")))
      val post = cat(s, dir).documents
        .select(col("doc_id"), posexplode(split(col("text"), " "))
          .as(Seq("pos", "tok")))
      post.join(broadcast(words), col("tok") === col("w"))
        .select(col("phrase"), col("plen"), col("doc_id"),
          (col("pos") - col("idx")).as("start"))
        .groupBy("phrase", "plen", "doc_id", "start")
        .agg(count(lit(1)).as("m"))
        .filter(col("m") === col("plen"))
        .groupBy("phrase")
        .agg(count(lit(1)).as("n_hits"),
          countDistinct("doc_id").as("n_docs"),
          min("doc_id").as("first_doc"))
        .orderBy("phrase")
    }),

  )
}
