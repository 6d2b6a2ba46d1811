package graft

/** DuckDB oracle SQL for the ANN probe family (q_ann_lsh / q_ann_ivf /
  * q_ann_ivf_indexed / q_ann_ivf_incremental / q_ann_recall /
  * q_ann_tradeoff).
  *
  * Expressible because every stage of the probe path is pinned:
  *  - the IVF coarse quantizer is [[llm.Similarity.kmeansLloyd]] over unit
  *    vectors (deterministic first-k init, exact-DECIMAL per-dim means
  *    snapped to 9 decimals), so the fit restates as the q_kmeans unrolled
  *    per-iteration CTE chain — bit-identical centroids on both engines;
  *  - probe selection, pruned brute-force cosine, and the assign-to-existing
  *    -centroids append rule are plain double arithmetic in the SAME
  *    index-order folds (`list_dot_product` ≡ the codegen dot kernel);
  *  - the sign-LSH hyperplanes are seed-derived constants (input-data
  *    independent, like a query panel's id list), inlined as exact
  *    round-trip double literals.
  * What is NOT inlined anywhere: trained centroids, buckets, assignments,
  * similarities — everything data-dependent is recomputed by DuckDB from
  * the parquet tables, so the oracle genuinely re-derives the result. */
object AnnOracles {
  private val dim = 64
  private val nLists = 8
  private val iters = llm.Similarity.ivfIters
  private val ldpQQ = "sqrt(list_dot_product(q.qv, q.qv))"

  /** Exact round-trip double literal: DuckDB's string→double parse of
    * Java's shortest round-trip repr lands on the identical bits. */
  private def dLit(x: Double): String =
    s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
  private def vecLit(v: Seq[Double]): String =
    v.map(dLit).mkString("[", ", ", "]")

  /** The 8 sign-LSH hyperplanes every declared LSH leg uses
    * (hyperplanes(8, 64, seed = 42)). */
  private lazy val planes: Seq[Array[Double]] =
    llm.Similarity.hyperplanes(8, dim)

  /** Bit-packed sign bucket of DOUBLE[] expression `v`: bit i set iff
    * dot(v, plane_i) > 0. Bits are disjoint, so the OR is a sum. */
  private def bucketExpr(v: String): String =
    planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product($v, ${vecLit(p.toSeq)}) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Multi-probe flip masks: the bucket itself plus each single-bit flip. */
  private val flipValues: String =
    (0L +: (0 until 8).map(i => 1L << i)).map(f => s"($f)").mkString(", ")

  /** The IVF training chain: `e` (id, v) → `u` (+ unit vector uv) →
    * ic0..ic$iters (the kmeansLloyd trajectory over `fitSrc`) → `iaf`, the
    * final assignment of every `fitSrc` row ((u−c)² index-order fold,
    * min-distance ties to the lowest cluster — row_number(d2, cl)). */
  private def trainCtes(fitSrc: String): Seq[String] = {
    val sb = scala.collection.mutable.ArrayBuffer.empty[String]
    sb += "e AS (SELECT CAST(vec_id AS BIGINT) AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"
    sb += "u AS MATERIALIZED (SELECT id, v, CASE WHEN nrm > 0 THEN list_transform(v, x -> x / nrm) ELSE v END AS uv " +
      "FROM (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e) t)"
    if (fitSrc != "u")
      sb += s"$fitSrc AS (SELECT * FROM u WHERE id < 400)"
    sb += s"ic0 AS (SELECT CAST(id AS INTEGER) AS cl, uv AS c FROM $fitSrc WHERE id < $nLists)"
    val d2 = s"list_sum(list_transform(range(1, len($fitSrc.uv) + 1), " +
      s"ix -> ($fitSrc.uv[ix] - c.c[ix]) * ($fitSrc.uv[ix] - c.c[ix])))"
    for (i <- 1 to iters) {
      sb += s"ia$i AS (SELECT id, uv, cl FROM (SELECT $fitSrc.id, $fitSrc.uv, c.cl, " +
        s"row_number() OVER (PARTITION BY $fitSrc.id ORDER BY $d2, c.cl) AS rn " +
        s"FROM $fitSrc, ic${i - 1} c) t WHERE rn = 1)"
      sb += s"im$i AS (SELECT cl, CAST(x.d AS INTEGER) AS dd, " +
        "round(CAST(sum(CAST(uv[CAST(x.d AS INTEGER)] AS DECIMAL(28,12))) AS DOUBLE) / count(*), 9) AS m " +
        s"FROM ia$i, unnest(range(1, len(uv) + 1)) AS x(d) GROUP BY 1, 2)"
      // A cluster that loses every member keeps its previous centroid.
      sb += s"ic$i AS MATERIALIZED (SELECT p.cl, coalesce(n.c, p.c) AS c FROM ic${i - 1} p " +
        s"LEFT JOIN (SELECT cl, list(m ORDER BY dd) AS c FROM im$i GROUP BY cl) n ON p.cl = n.cl)"
    }
    sb += s"iaf AS MATERIALIZED (SELECT id, v, uv, cl FROM (SELECT $fitSrc.id, $fitSrc.v, $fitSrc.uv, c.cl, " +
      s"row_number() OVER (PARTITION BY $fitSrc.id ORDER BY $d2, c.cl) AS rn " +
      s"FROM $fitSrc, ic$iters c) t WHERE rn = 1)"
    sb.toSeq
  }

  /** Centroid table with norms, + per-query probe ranking — the
    * nearestCentroids rule: cosine(centroid, RAW query), descending, ties
    * to the lower cluster index (Scala's stable sortBy), zero-norm → −1. */
  private val centroidNorms =
    s"cns AS (SELECT cl, c, sqrt(list_dot_product(c, c)) AS cn FROM ic$iters)"
  private def probeRank(qsrc: String): String =
    s"prk AS (SELECT q_id, cl, rn FROM (SELECT q.q_id, cns.cl, " +
      "row_number() OVER (PARTITION BY q.q_id ORDER BY " +
      "CASE WHEN cns.cn = 0 OR q.qn = 0 THEN -1.0 ELSE list_dot_product(cns.c, q.qv) / (cns.cn * q.qn) END DESC, cns.cl) AS rn " +
      s"FROM cns, $qsrc q) t)"

  /** cosine(v, qv) rounded to 4 — the bruteForceTopK formula:
    * dot / (sqrt(dot_vv) * sqrt(dot_qq)). */
  private def cos4(v: String, qv: String): String =
    s"round(list_dot_product($v, $qv) / (sqrt(list_dot_product($v, $v)) * sqrt(list_dot_product($qv, $qv))), 4)"

  /** q_ann_lsh: bucket the corpus under the literal planes, probe the
    * query's bucket plus every 1-bit flip, brute-force cosine within. */
  def annLsh: String =
    "WITH e AS (SELECT CAST(vec_id AS BIGINT) AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "q AS (SELECT v AS qv FROM e WHERE id = 0), " +
      s"b AS (SELECT id, v, ${bucketExpr("v")} AS bkt FROM e), " +
      s"qb AS (SELECT ${bucketExpr("qv")} AS bkt FROM q), " +
      s"prb AS (SELECT DISTINCT xor(qb.bkt, f.f) AS bkt FROM qb, (VALUES $flipValues) f(f)) " +
      s"SELECT b.id AS vec_id, ${cos4("b.v", "q.qv")} AS sim " +
      "FROM b JOIN prb USING (bkt), q ORDER BY sim DESC, vec_id LIMIT 10"

  /** q_ann_ivf / q_ann_ivf_indexed: fit on the whole corpus, probe the 3
    * nearest lists for query 0, exact cosine top-10 within. The persisted
    * (`_indexed`) path round-trips doubles through parquet — identical. */
  def annIvf: String =
    "WITH " + (trainCtes("u") ++ Seq(
      "q AS (SELECT id AS q_id, v AS qv, sqrt(list_dot_product(v, v)) AS qn FROM e WHERE id = 0)",
      centroidNorms,
      probeRank("q"),
      "prb AS (SELECT cl FROM prk WHERE rn <= 3)"
    )).mkString(", ") +
      s" SELECT a.id AS vec_id, ${cos4("a.v", "q.qv")} AS sim " +
      "FROM iaf a JOIN prb USING (cl), q ORDER BY sim DESC, vec_id LIMIT 10"

  /** q_ann_ivf_incremental: fit on the head (id < 400), Lloyd-assign the
    * head (what writeIvfIndex stored), append ids 400..449 with the
    * assignToCentroids rule (argmax 2·u·c − ‖c‖², ties to the lowest
    * cluster), probe 3 lists per query id ∈ {0, 400, 440}, top-5 each. */
  def annIvfIncremental: String =
    "WITH " + (trainCtes("uh") ++ Seq(
      "ua AS (SELECT * FROM u WHERE id >= 400 AND id < 450)",
      "apx AS (SELECT id, v, cl FROM (SELECT a.id, a.v, c.cl, " +
        "row_number() OVER (PARTITION BY a.id ORDER BY " +
        "2.0 * list_dot_product(a.uv, c.c) - list_sum(list_transform(c.c, x -> x * x)) DESC, c.cl) AS rn " +
        s"FROM ua a, ic$iters c) t WHERE rn = 1)",
      "idx AS (SELECT id, v, cl FROM iaf UNION ALL SELECT id, v, cl FROM apx)",
      "qs AS (SELECT id AS q_id, v AS qv, sqrt(list_dot_product(v, v)) AS qn FROM e WHERE id IN (0, 400, 440))",
      centroidNorms,
      probeRank("qs"),
      "prb AS (SELECT q_id, cl FROM prk WHERE rn <= 3)",
      s"cand AS (SELECT p.q_id, x.id AS nid, ${cos4("x.v", "q.qv")} AS sim " +
        "FROM idx x JOIN prb p ON x.cl = p.cl JOIN qs q ON q.q_id = p.q_id)",
      "top AS (SELECT q_id, nid, sim FROM (SELECT q_id, nid, sim, " +
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, nid) AS rn FROM cand) t WHERE rn <= 5)"
    )).mkString(", ") +
      " SELECT q_id AS qid, nid, sim, nid >= 400 AS from_append FROM top ORDER BY qid, nid"

  /** Shared by recall/tradeoff: the 5-query panel, the per-(query, vector)
    * exact scores, and the exact top-10 — the TopKPerGroup baseline. */
  private val panelCtes = Seq(
    "qs AS (SELECT id AS q_id, v AS qv, sqrt(list_dot_product(v, v)) AS qn FROM e WHERE id IN (0, 1, 2, 3, 4))",
    "vv AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)",
    "sc AS (SELECT q.q_id, x.id, round(list_dot_product(q.qv, x.v) / (q.qn * x.nrm), 4) AS sim FROM vv x, qs q)",
    "ext AS MATERIALIZED (SELECT q_id, id FROM (SELECT q_id, id, " +
      "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, id) AS rn FROM sc) t WHERE rn <= 10)")

  /** q_ann_recall: recall@10 of multi-probe sign-LSH and IVF(nProbe=3)
    * against the exact cosine top-10, per query × method. */
  def annRecall: String =
    "WITH " + (trainCtes("u") ++ panelCtes ++ Seq(
      s"bk AS (SELECT id, ${bucketExpr("v")} AS bkt FROM e)",
      s"qbk AS (SELECT q_id, ${bucketExpr("qv")} AS bkt FROM qs)",
      s"lprb AS (SELECT DISTINCT q_id, xor(bkt, f.f) AS bkt FROM qbk, (VALUES $flipValues) f(f))",
      "lcand AS (SELECT p.q_id, b.id FROM bk b JOIN lprb p ON b.bkt = p.bkt)",
      "lsc AS (SELECT c.q_id, c.id, round(list_dot_product(x.v, q.qv) / (x.nrm * q.qn), 4) AS sim " +
        "FROM lcand c JOIN vv x ON c.id = x.id JOIN qs q ON q.q_id = c.q_id)",
      "ltop AS (SELECT q_id, 'lsh' AS method, id FROM (SELECT q_id, id, " +
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, id) AS rn FROM lsc) t WHERE rn <= 10)",
      centroidNorms,
      probeRank("qs"),
      "iprb AS (SELECT q_id, cl FROM prk WHERE rn <= 3)",
      "icand AS (SELECT p.q_id, a.id FROM iaf a JOIN iprb p ON a.cl = p.cl)",
      "isc AS (SELECT c.q_id, c.id, round(list_dot_product(x.v, q.qv) / (x.nrm * q.qn), 4) AS sim " +
        "FROM icand c JOIN vv x ON c.id = x.id JOIN qs q ON q.q_id = c.q_id)",
      "itop AS (SELECT q_id, 'ivf' AS method, id FROM (SELECT q_id, id, " +
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, id) AS rn FROM isc) t WHERE rn <= 10)",
      "hits AS (SELECT t.q_id, t.method, CASE WHEN x.id IS NULL THEN 0 ELSE 1 END AS hit " +
        "FROM (SELECT * FROM ltop UNION ALL SELECT * FROM itop) t " +
        "LEFT JOIN ext x ON t.q_id = x.q_id AND t.id = x.id)"
    )).mkString(", ") +
      " SELECT q_id, method, round(CAST(sum(hit) AS DOUBLE) / 10, 2) AS recall_at_10 " +
      "FROM hits GROUP BY 1, 2 ORDER BY q_id, method"

  /** q_ann_ivfpq: IVF-PQ/IVFADC — the coarse fit (ic5/iaf), product
    * quantization of the RESIDUAL unit − centroid (the pqTrainCtes rules:
    * first-16 init, (d2, code) tie-break, decimal means snapped to 9),
    * per-(query, probed-list) round-9 LUTs summed in exact DECIMAL (the
    * Pq.adcDistance contract), a 100-candidate shortlist cut on (adc, id),
    * exact re-rank over unit vectors cut on (round-6 d2, id). */
  def annIvfPq(m: Int = 8, kCodes: Int = 16, pqIters: Int = 3,
               nProbe: Int = 6, panel: Seq[Long] = Seq(3L, 57L, 201L),
               shortlist: Int = 100, topK: Int = 10): String = {
    val dsub = dim / m
    val sb = scala.collection.mutable.ArrayBuffer.empty[String]
    sb ++= trainCtes("u")
    // residuals of the WHOLE corpus against each row's own list centroid
    sb += "rsd AS MATERIALIZED (SELECT a.id, a.cl, " +
      "list_transform(range(1, len(a.uv) + 1), ix -> a.uv[ix] - c.c[ix]) AS r " +
      s"FROM iaf a JOIN ic$iters c ON a.cl = c.cl)"
    // PQ training chain over residual subspace rows (the pqTrainCtes shape)
    sb += s"se2 AS MATERIALIZED (SELECT id, CAST(u2.j AS INTEGER) AS j, " +
      s"list_slice(r, CAST(u2.j AS INTEGER) * $dsub + 1, CAST(u2.j AS INTEGER) * $dsub + $dsub) AS sv " +
      s"FROM rsd, unnest(range(0, $m)) AS u2(j))"
    sb += s"pc0 AS MATERIALIZED (SELECT j, CAST(id AS INTEGER) AS c, sv AS cv FROM se2 WHERE id < $kCodes)"
    val d2 = "list_sum(list_transform(range(1, len(se2.sv) + 1), ix -> (se2.sv[ix] - cc.cv[ix]) * (se2.sv[ix] - cc.cv[ix])))"
    for (i <- 1 to pqIters) {
      sb += s"pa$i AS (SELECT id, j, sv, c FROM (SELECT se2.id, se2.j, se2.sv, cc.c, " +
        s"row_number() OVER (PARTITION BY se2.id, se2.j ORDER BY $d2, cc.c) AS rn " +
        s"FROM se2 JOIN pc${i - 1} cc ON se2.j = cc.j) t WHERE rn = 1)"
      sb += s"pm$i AS (SELECT j, c, CAST(u2.d AS INTEGER) AS d, " +
        "round(CAST(sum(CAST(sv[CAST(u2.d AS INTEGER)] AS DECIMAL(28,12))) AS DOUBLE) / count(*), 9) AS mu " +
        s"FROM pa$i, unnest(range(1, len(sv) + 1)) AS u2(d) GROUP BY 1, 2, 3)"
      sb += s"pc$i AS MATERIALIZED (SELECT p.j, p.c, coalesce(n.cv, p.cv) AS cv FROM pc${i - 1} p " +
        s"LEFT JOIN (SELECT j, c, list(mu ORDER BY d) AS cv FROM pm$i GROUP BY 1, 2) n " +
        "ON p.j = n.j AND p.c = n.c)"
    }
    sb += s"enc2 AS MATERIALIZED (SELECT id, j, c FROM (SELECT se2.id, se2.j, cc.c, " +
      s"row_number() OVER (PARTITION BY se2.id, se2.j ORDER BY $d2, cc.c) AS rn " +
      s"FROM se2 JOIN pc$pqIters cc ON se2.j = cc.j) t WHERE rn = 1)"
    // panel probes: nearestCentroids over the UNIT query vector
    sb += s"qp AS (SELECT id AS q_id, uv AS qv, sqrt(list_dot_product(uv, uv)) AS qn " +
      s"FROM iaf WHERE id IN (${panel.mkString(", ")}))"
    sb += centroidNorms
    sb += probeRank("qp")
    sb += s"prb AS (SELECT q_id, cl FROM prk WHERE rn <= $nProbe)"
    // per-(query, list) residual LUT, entries snapped to 9 decimals
    sb += "qr AS (SELECT p.q_id, p.cl AS ci, " +
      "list_transform(range(1, len(q.qv) + 1), ix -> q.qv[ix] - c.c[ix]) AS qres " +
      s"FROM prb p JOIN qp q ON q.q_id = p.q_id JOIN ic$iters c ON c.cl = p.cl)"
    sb += "lutt AS MATERIALIZED (SELECT qr.q_id, qr.ci, cc.j, cc.c, " +
      "round(list_sum(list_transform(range(1, len(cc.cv) + 1), " +
      s"ix -> (qr.qres[CAST(cc.j AS INT) * $dsub + CAST(ix AS INT)] - cc.cv[ix]) * " +
      s"(qr.qres[CAST(cc.j AS INT) * $dsub + CAST(ix AS INT)] - cc.cv[ix]))), 9) AS l " +
      s"FROM qr, pc$pqIters cc)"
    // ADC inside the probed lists only (the lutt join carries the probe
    // membership), decimal accumulation, qid's own row excluded
    sb += "adc AS (SELECT l.q_id, en.id, CAST(sum(CAST(l.l AS DECIMAL(28,12))) AS DOUBLE) AS ad " +
      "FROM enc2 en JOIN rsd x ON x.id = en.id " +
      "JOIN lutt l ON l.ci = x.cl AND l.j = en.j AND l.c = en.c " +
      "WHERE en.id <> l.q_id GROUP BY 1, 2)"
    sb += s"shl AS (SELECT q_id, id FROM (SELECT q_id, id, " +
      s"row_number() OVER (PARTITION BY q_id ORDER BY ad, id) AS rn FROM adc) t WHERE rn <= $shortlist)"
    sb += "rr AS (SELECT s2.q_id, s2.id, round(list_sum(list_transform(range(1, len(ev.uv) + 1), " +
      "ix -> (ev.uv[ix] - q.qv[ix]) * (ev.uv[ix] - q.qv[ix]))), 6) AS dist2 " +
      "FROM shl s2 JOIN iaf ev ON s2.id = ev.id JOIN qp q ON q.q_id = s2.q_id)"
    sb += s"t10 AS (SELECT q_id, id, dist2, rn FROM (SELECT q_id, id, dist2, " +
      s"row_number() OVER (PARTITION BY q_id ORDER BY dist2, id) AS rn FROM rr) t WHERE rn <= $topK)"
    "WITH " + sb.mkString(", ") +
      " SELECT q_id AS qid, CAST(rn AS INT) AS rank, id AS vec_id, dist2 FROM t10 ORDER BY qid, rank"
  }

  /** q_ann_tradeoff: the full IVF tuning curve — per nProbe ∈ 1..nLists,
    * panel-averaged recall@10 and fraction of corpus scanned. A candidate
    * probed at rank r serves every nProbe ≥ r (prefix property), hence the
    * lateral range(rank, nLists + 1) explode on both legs. */
  def annTradeoff: String =
    "WITH " + (trainCtes("u") ++ panelCtes ++ Seq(
      centroidNorms,
      probeRank("qs"),
      "cand AS (SELECT r.q_id, a.id, round(list_dot_product(a.v, q.qv) / " +
        "(sqrt(list_dot_product(a.v, a.v)) * q.qn), 4) AS sim, u2.np " +
        "FROM iaf a JOIN prk r ON a.cl = r.cl JOIN qs q ON q.q_id = r.q_id, " +
        s"unnest(range(r.rn, ${nLists + 1})) AS u2(np))",
      "tops AS (SELECT q_id, np, id FROM (SELECT q_id, np, id, " +
        "row_number() OVER (PARTITION BY q_id, np ORDER BY sim DESC, id) AS rn FROM cand) t WHERE rn <= 10)",
      "hit AS (SELECT t.np, CASE WHEN x.id IS NULL THEN 0 ELSE 1 END AS h " +
        "FROM tops t LEFT JOIN ext x ON t.q_id = x.q_id AND t.id = x.id)",
      "rec AS (SELECT np, round(CAST(sum(h) AS DOUBLE) / 50, 4) AS avg_recall FROM hit GROUP BY 1)",
      "csz AS (SELECT cl, count(*) AS sz FROM iaf GROUP BY 1)",
      s"scn AS (SELECT u2.np, CAST(sum(sz) AS DOUBLE) AS scanned FROM prk r JOIN csz USING (cl), " +
        s"unnest(range(r.rn, ${nLists + 1})) AS u2(np) GROUP BY 1)",
      "tot AS (SELECT CAST(sum(sz) AS DOUBLE) AS n_total FROM csz)",
      "fs AS (SELECT np, round(scanned / (n_total * 5), 4) AS frac_scanned FROM scn, tot)"
    )).mkString(", ") +
      " SELECT CAST(rec.np AS BIGINT) AS nprobe, avg_recall, frac_scanned " +
      "FROM rec JOIN fs USING (np) ORDER BY nprobe"
}
