package graft

/** DuckDB oracle SQL for the unigram-LM tokenizer family
  * (q_unigram_train / q_unigram_segment / q_wordpiece_audit /
  * q_tokenizer_bench) — the hard-EM training loop UNROLLED, the
  * q_kmeans/q_bpe_learn pattern applied to SentencePiece's EM half.
  *
  * Expressible because the whole trajectory is pinned:
  *  - log-probs live on a 6-decimal grid (Unigram.snapLogp — round(ln(…),6)
  *    is the same double on both engines), so Viterbi comparisons can never
  *    fork on a last-ulp ln() difference;
  *  - the Viterbi DP is a recursive CTE carrying a 4-deep best[] window
  *    (pieces are ≤ 4 chars by the seed rule), candidates max-folded — the
  *    kernel's strictly-greater ascending-j scan picks the smallest j
  *    achieving the max, i.e. the LONGEST piece, which the backtrack
  *    recovers as max(l) among score-equality witnesses;
  *  - WordPiece maximum-munch is a longest-prefix walk driven by a
  *    precomputed (word, pos) → longest-matching-piece table;
  *  - every weight sum is exact (integers + 0.5 floors in doubles), and
  *    segmentation scores fold left-to-right like the Spark kernel.
  * Nothing data-dependent is inlined — DuckDB re-derives the seed, every
  * EM round, and all segmentations from the parquet text. */
object UnigramOracles {
  private val oov = "(-25.0)" // UnigramViterbi.OovLogp
  private val vocabSize = llm.Unigram.DefaultVocabSize
  private val emIters = llm.Unigram.DefaultIters
  // The 4-slot DP window and the range(1, 5) substring explode below both
  // encode Unigram.DefaultMaxLen = 4; a maxLen change must widen them.

  /** Word-frequency table + substring seed + init model m0 (the
    * Unigram.seed rules: positional substrings of length 1..4 weighted by
    * word frequency, all single chars + top-200 multis by (w desc, piece),
    * logp = round-6 ln(w / total)). */
  private def seedCtes: Seq[String] = Seq(
    "wf AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS f " +
      "FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t " +
      "WHERE length(word) > 0 GROUP BY 1)",
    "sub AS (SELECT substr(word, CAST(t1.i AS INT), CAST(t2.l AS INT)) AS piece, " +
      "CAST(sum(f) AS BIGINT) AS w " +
      "FROM wf, unnest(range(1, length(word) + 1)) t1(i), unnest(range(1, 5)) t2(l) " +
      "WHERE CAST(t1.i AS INT) + CAST(t2.l AS INT) - 1 <= length(word) GROUP BY 1)",
    s"seedv AS (SELECT piece, w FROM sub WHERE length(piece) = 1 " +
      "UNION ALL SELECT piece, w FROM (SELECT piece, w, " +
      "row_number() OVER (ORDER BY w DESC, piece) AS rn FROM sub WHERE length(piece) > 1) t " +
      s"WHERE rn <= $vocabSize)",
    "m0 AS MATERIALIZED (SELECT piece, " +
      "round(ln(w / (SELECT CAST(sum(w) AS DOUBLE) FROM seedv)), 6) AS lp FROM seedv)")

  /** Viterbi segmentation of `src`(word, …) under `model`(piece, lp):
    * forward DP (fw$tag: best[i] carried as a 4-slot window, OOV falls to
    * best[i−1] − 25), the per-position backtrack choice table (chx$tag:
    * largest l whose candidate score equals best[i] — the kernel's
    * longest-piece-on-ties rule), and the backtrack walk (bk$tag) ending
    * in segs$tag(word, segs). */
  private def vitCtes(tag: String, src: String, model: String): Seq[String] = Seq(
    s"fw$tag AS (SELECT word, length(word) AS n, 0 AS i, CAST(0.0 AS DOUBLE) AS b0, " +
      "CAST(NULL AS DOUBLE) AS b1, CAST(NULL AS DOUBLE) AS b2, CAST(NULL AS DOUBLE) AS b3 " +
      s"FROM $src UNION ALL SELECT word, n, i + 1, " +
      "coalesce((SELECT max(CASE t.ll WHEN 1 THEN f.b0 WHEN 2 THEN f.b1 WHEN 3 THEN f.b2 ELSE f.b3 END + vp.lp) " +
      s"FROM (VALUES (1), (2), (3), (4)) t(ll) JOIN $model vp " +
      "ON t.ll <= f.i + 1 AND vp.piece = substr(f.word, f.i + 2 - t.ll, t.ll)), " +
      s"f.b0 + $oov), f.b0, f.b1, f.b2 FROM fw$tag f WHERE f.i < f.n)",
    s"chx$tag AS (SELECT cur.word, cur.i AS pos, max(t.ll) AS l " +
      s"FROM fw$tag cur, (VALUES (1), (2), (3), (4)) t(ll), $model vp, fw$tag pv " +
      "WHERE cur.i > 0 AND t.ll <= cur.i " +
      "AND vp.piece = substr(cur.word, cur.i - t.ll + 1, t.ll) " +
      "AND pv.word = cur.word AND pv.i = cur.i - t.ll " +
      "AND pv.b0 + vp.lp = cur.b0 GROUP BY 1, 2)",
    s"bk$tag AS (SELECT word, length(word) AS pos, CAST([] AS VARCHAR[]) AS segs FROM $src " +
      "UNION ALL SELECT b.word, b.pos - coalesce(m.l, 1), " +
      "list_prepend(substr(b.word, b.pos - coalesce(m.l, 1) + 1, CAST(coalesce(m.l, 1) AS INT)), b.segs) " +
      s"FROM bk$tag b LEFT JOIN chx$tag m ON m.word = b.word AND m.pos = b.pos WHERE b.pos > 0)",
    s"segs$tag AS MATERIALIZED (SELECT word, segs FROM bk$tag WHERE pos = 0)")

  /** WordPiece maximum-munch of `src`(word, …) under `model`: the
    * (word, pos) → longest-matching-multi-char-piece table gm$tag (absent
    * → the single-char floor, in or out of vocab), then the greedy walk
    * gk$tag ending in gsegs$tag(word, segs). */
  private def greedyCtes(tag: String, src: String, model: String): Seq[String] = Seq(
    s"gm$tag AS (SELECT w.word, CAST(t.p AS INT) AS pos, CAST(max(length(vp.piece)) AS INT) AS l " +
      s"FROM $src w, unnest(range(1, length(w.word) + 1)) t(p), $model vp " +
      "WHERE length(vp.piece) BETWEEN 2 AND 4 " +
      "AND CAST(t.p AS INT) + length(vp.piece) - 1 <= length(w.word) " +
      "AND vp.piece = substr(w.word, CAST(t.p AS INT), length(vp.piece)) GROUP BY 1, 2)",
    s"gk$tag AS (SELECT word, length(word) AS n, 1 AS pos, CAST([] AS VARCHAR[]) AS segs FROM $src " +
      "UNION ALL SELECT g.word, g.n, g.pos + coalesce(m.l, 1), " +
      "list_append(g.segs, substr(g.word, g.pos, coalesce(m.l, 1))) " +
      s"FROM gk$tag g LEFT JOIN gm$tag m ON m.word = g.word AND m.pos = g.pos WHERE g.pos <= g.n)",
    s"gsegs$tag AS MATERIALIZED (SELECT word, segs FROM gk$tag WHERE pos = n + 1)")

  /** One hard-EM round: segment the vocab under m(i−1), count pieces
    * frequency-weighted, keep cnt>0 (single chars float at 0.5), round-6
    * re-normalized log-probs. */
  private def emCtes(i: Int): Seq[String] =
    vitCtes(s"_e$i", "wf", s"m${i - 1}") ++ Seq(
      s"cnt$i AS (SELECT piece, CAST(sum(f) AS BIGINT) AS cnt " +
        s"FROM (SELECT wf.f, unnest(s.segs) AS piece FROM segs_e$i s JOIN wf ON wf.word = s.word) t GROUP BY 1)",
      s"mw$i AS MATERIALIZED (SELECT m.piece, coalesce(c.cnt, 0) AS cnt, " +
        "CASE WHEN coalesce(c.cnt, 0) > 0 THEN CAST(c.cnt AS DOUBLE) ELSE 0.5 END AS w " +
        s"FROM m${i - 1} m LEFT JOIN cnt$i c USING (piece) " +
        "WHERE coalesce(c.cnt, 0) > 0 OR length(m.piece) = 1)",
      s"m$i AS MATERIALIZED (SELECT piece, round(ln(w / (SELECT sum(w) FROM mw$i)), 6) AS lp FROM mw$i)")

  private def trainChain: Seq[String] =
    seedCtes ++ (1 to emIters).flatMap(emCtes)
  private val fm = s"m$emIters" // the final model
  private val fw = s"mw$emIters" // its weights/counts

  /** q_unigram_train: the top-20 model rows by (cnt desc, piece). */
  def unigramTrain: String =
    "WITH RECURSIVE " + trainChain.mkString(", ") +
      " SELECT CAST(rn AS INT) AS rank, piece, cnt, lp AS logp FROM " +
      s"(SELECT m.piece, w.cnt, m.lp, row_number() OVER (ORDER BY w.cnt DESC, m.piece) AS rn " +
      s"FROM $fm m JOIN $fw w USING (piece)) t WHERE rn <= 20 ORDER BY rank"

  /** q_unigram_segment: Viterbi segmentation of the 10 most frequent
    * corpus words under the final model. */
  def unigramSegment: String =
    "WITH RECURSIVE " + (trainChain ++ Seq(
      "wt AS (SELECT word, f FROM (SELECT word, f, " +
        "row_number() OVER (ORDER BY f DESC, word) AS rn FROM wf) t WHERE rn <= 10)") ++
      vitCtes("_s", "wt", fm)).mkString(", ") +
      " SELECT w.word, w.f, array_to_string(s.segs, '|') AS segmentation, " +
      "CAST(len(s.segs) AS INT) AS n_pieces " +
      "FROM wt w JOIN segs_s s ON s.word = w.word ORDER BY w.f DESC, w.word"

  /** q_wordpiece_audit: greedy-vs-Viterbi over the top-500 glued
    * adjacent-word bigrams — fertilities, optimal share, log-prob gaps. */
  def wordpieceAudit: String =
    "WITH RECURSIVE " + (trainChain ++ Seq(
      "gl0 AS (SELECT t.a || t.b AS word FROM (SELECT unnest(list_slice(ws, 1, len(ws) - 1)) AS a, " +
        "unnest(list_slice(ws, 2, len(ws))) AS b " +
        "FROM (SELECT string_split(text, ' ') AS ws FROM documents) d) t WHERE length(t.a || t.b) > 0)",
      "pan AS MATERIALIZED (SELECT word, f FROM (SELECT word, CAST(count(*) AS BIGINT) AS f, " +
        "row_number() OVER (ORDER BY count(*) DESC, word) AS rn FROM gl0 GROUP BY word) t WHERE rn <= 500)") ++
      vitCtes("_a", "pan", fm) ++ greedyCtes("_a", "pan", fm) ++ Seq(
      s"mlut AS (SELECT map(list(piece ORDER BY piece), list(lp ORDER BY piece)) AS mm FROM $fm)",
      s"vsc AS (SELECT s.word, list_sum(list_transform(s.segs, p -> coalesce(mm[p][1], $oov))) AS sc, " +
        "len(s.segs) AS np FROM segs_a s, mlut)",
      s"gsc AS (SELECT s.word, list_sum(list_transform(s.segs, p -> coalesce(mm[p][1], $oov))) AS sc, " +
        "len(s.segs) AS np FROM gsegs_a s, mlut)")).mkString(", ") +
      " SELECT CAST(count(*) AS BIGINT) AS n_words, " +
      "CAST(sum(CASE WHEN g.sc >= v.sc - 1e-9 THEN 1 ELSE 0 END) AS BIGINT) AS n_greedy_optimal, " +
      "round(sum(CAST(p.f AS DOUBLE) * v.np) / sum(CAST(p.f AS DOUBLE)), 4) AS fertility_viterbi, " +
      "round(sum(CAST(p.f AS DOUBLE) * g.np) / sum(CAST(p.f AS DOUBLE)), 4) AS fertility_greedy, " +
      "round(CAST(sum(CAST(v.sc - g.sc AS DECIMAL(28,12))) AS DOUBLE) / count(*), 4) AS avg_logp_gap, " +
      "round(max(v.sc - g.sc), 4) AS max_logp_gap " +
      "FROM pan p JOIN vsc v ON v.word = p.word JOIN gsc g ON g.word = p.word"

  /** q_tokenizer_bench: corpus fertility/compression for BPE (10 merges,
    * the shared bpeTrainCtes chain), unigram Viterbi, and WordPiece greedy
    * over the word-frequency table. */
  def tokenizerBench(bpeCtes: String): String =
    "WITH RECURSIVE " + (trainChain ++
      vitCtes("_t", "wf", fm) ++ greedyCtes("_t", "wf", fm)).mkString(", ") +
      ", " + bpeCtes + ", " +
      "bleg AS (SELECT 'bpe_10merge' AS tokenizer, f, " +
      "CAST(len(string_split(substr(w, 2, length(w) - 2), chr(2) || chr(1))) AS BIGINT) AS nt, " +
      "length(word) AS nc FROM bv10), " +
      "uleg AS (SELECT 'unigram_viterbi' AS tokenizer, wf.f, CAST(len(s.segs) AS BIGINT) AS nt, " +
      "length(wf.word) AS nc FROM wf JOIN segs_t s ON s.word = wf.word), " +
      "wleg AS (SELECT 'wordpiece_greedy' AS tokenizer, wf.f, CAST(len(s.segs) AS BIGINT) AS nt, " +
      "length(wf.word) AS nc FROM wf JOIN gsegs_t s ON s.word = wf.word), " +
      "allleg AS (SELECT * FROM bleg UNION ALL SELECT * FROM uleg UNION ALL SELECT * FROM wleg) " +
      "SELECT tokenizer, CAST(sum(f * nt) AS BIGINT) AS n_tokens, " +
      "round(CAST(sum(f * nt) AS DOUBLE) / CAST(sum(f) AS DOUBLE), 4) AS fertility, " +
      "round(CAST(sum(f * nc) AS DOUBLE) / CAST(sum(f * nt) AS DOUBLE), 4) AS chars_per_token " +
      "FROM allleg GROUP BY 1 ORDER BY tokenizer"
}
