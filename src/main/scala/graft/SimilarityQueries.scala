package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{Catalog, Checks, Ops, Sinks}
import graft.llm.{Bpe, Classify, Dedup, Pq, Similarity, Spectral, TextStats, Unigram}
import graft.multimodal.Multimodal
import graft.streaming.EventStreams
import SparkEntry.{cat, scratch, withPathLock, dirFingerprint}

/** Similarity-search / embedding tier of the driver surface: exact cosine top-k, RRF fusion, the ANN family (LSH, IVF, IVF-PQ, persisted + incremental IVF, recall/tradeoff audits), k-means and classifier heads over embeddings, random projection, Matryoshka truncation, quantization, diversity/centroid moments, kNN joins, hard negatives, k-center coresets and MMR.
  *
  * Extracted verbatim from [[SparkEntry.queriesBase]] (round 14) — same
  * keys, same closures, zero behavior change; the matching oracle SQL
  * stays in [[OracleSql]]. */
object SimilarityQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_kmeans" -> ((s, dir) => {
      // Embedding-space clustering audit: DataFrame-native Lloyd's k-means
      // (k=4, 5 iterations, deterministic first-k init) — the transparent,
      // reproducible counterpart to the MLlib fit behind the IVF index,
      // and the clustering step SemDeDup-style semantic curation runs
      // before per-cluster dedup. One scan per iteration; the model rides
      // the plan as literals, only k×d averages ever reach the driver.
      // The trajectory is pinned (exact-DECIMAL per-dim means snapped to 9
      // decimals, deterministic init), so the DuckDB oracle's unrolled
      // per-iteration CTE chain computes bit-identical centroids;
      // Round6dQueriesSpec carries the in-memory Lloyd's mirror besides.
      val (assigned, cents) = Similarity.kmeansLloyd(
        cat(s, dir).embeddings, "vec_id", "embedding", 4, 5)
      val norms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
      // avg_dist2 via exact-DECIMAL accumulation too: a double avg() is
      // partition-order-dependent at the last ulp — the oracle hash hinges
      // on the round-4 value.
      assigned.groupBy("cluster")
        .agg(count(lit(1)).as("n_vecs"),
          round(sum(col("dist2").cast("decimal(28,12)")).cast("double") /
            count(lit(1)), 4).as("avg_dist2"))
        .withColumn("centroid_norm",
          round(element_at(array(norms.toSeq.map(lit): _*), col("cluster") + 1), 4))
        .orderBy("cluster")
    }),

    "q_knn_classify" -> ((s, dir) => {
      // Supervised tier 1 — lazy k-NN voting over the labeled embedding
      // table (the baseline any quality/domain classifier must beat). The
      // held-out panel broadcasts (every-5th-id under an absolute cap: the
      // q_knn_join bounded-panel rule); the training corpus streams through
      // the codegen'd dot kernel ONCE with bounded-heap top-k — no
      // per-query scan, no corpus shuffle, so the shape holds at 100 TB.
      Classify.knnClassify(cat(s, dir).embeddings, "vec_id", "embedding",
        "label", k = 5)
    }),

    "q_centroid_classify" -> ((s, dir) => {
      // Supervised tier 2 — nearest-class-centroid (Rocchio). Training is
      // one partial-agg scan to |labels|×dim rows with EXACT DECIMAL
      // per-dim sums (the q_embed_centroid discipline — order-independent,
      // so the oracle lands on the identical centroid), inference a
      // broadcast join against |labels| rows. Output: confusion matrix.
      Classify.centroidClassify(cat(s, dir).embeddings, "vec_id",
        "embedding", "label")
    }),

    // --------------------------------------- LLM-pipeline: similarity/ANN
    "q_sim_topk" -> ((s, dir) => {
      val c = cat(s, dir)
      val q = c.embeddings.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
      Similarity.bruteForceTopK(c.embeddings, "vec_id", "embedding", q, 20)
    }),

    "q_rrf_fusion" -> ((s, dir) => {
      // Hybrid retrieval for RAG: fuse a lexical retriever (occurrence
      // count of the probe term) with a semantic retriever (cosine to the
      // vec_id=0 probe, 4-decimal rounded like q_sim_topk) by reciprocal-
      // rank fusion, rrf = Σ_lists 1/(60+rank). Scale shape: candidate
      // generation is per-retriever top-100 (TakeOrderedAndProject — a
      // bounded-heap reduce, no global sort), so the rank windows run on
      // 100-row panels, never the corpus; the doc↔embedding join is the
      // one corpus-size shuffle. Ranks are integers and the fused score
      // is a single 2-term double add → exact oracle hash-match.
      val c = cat(s, dir)
      val q = c.embeddings.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
      val lex = ((length(col("text")) -
        length(regexp_replace(col("text"), "join", ""))) / lit(4))
        .cast("bigint")
      val scored = c.documents.select(col("doc_id"), lex.as("lex"))
        .join(c.embeddings.select(col("vec_id").as("doc_id"),
          round(Similarity.cosine(col("embedding"), array(q.map(lit): _*)),
            4).as("sim")), Seq("doc_id"))
      val lexTop = scored.orderBy(col("lex").desc, col("doc_id")).limit(100)
        .withColumn("r_lex",
          row_number().over(Window.orderBy(col("lex").desc, col("doc_id"))))
        .select("doc_id", "r_lex")
      val semTop = scored.orderBy(col("sim").desc, col("doc_id")).limit(100)
        .withColumn("r_sem",
          row_number().over(Window.orderBy(col("sim").desc, col("doc_id"))))
        .select("doc_id", "r_sem")
      lexTop.join(semTop, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("r_lex"), col("r_sem"),
          round(coalesce(lit(1.0) / (lit(60) + col("r_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("r_sem")), lit(0.0)), 9)
            .as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(20)
    }),

    "q_ann_lsh" -> ((s, dir) => {
      val c = cat(s, dir)
      val q = c.embeddings.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
      // 8 planes ≈ 2 vectors/bucket at this corpus size; more planes at scale.
      Similarity.lshTopK(c.embeddings, "vec_id", "embedding", q, 10, nPlanes = 8)
    }),

    "q_ann_ivf" -> ((s, dir) => {
      val c = cat(s, dir)
      val q = c.embeddings.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
      Similarity.ivfTopK(c.embeddings, "vec_id", "embedding", q, 10,
        nLists = 8, nProbe = 3)
    }),

    "q_ann_ivfpq" -> ((s, dir) => {
      // IVF-PQ / IVFADC (Jégou et al. 2011 §IV) — THE production ANN
      // composition (the FAISS IVFx,PQy index): the coarse quantizer
      // prunes the corpus to nProbe of 8 lists, product quantization of
      // the RESIDUAL unit(v) − c(v) (32× smaller codes, and residuals
      // concentrate near 0 so the same k=16 codebook covers them far
      // tighter than raw vectors) ranks candidates by ADC INSIDE the
      // probed lists — the LUT rebuilds per (query, list) because the
      // residual depends on the list centroid, a per-list literal CASE on
      // one pruned scan — and the shortlist winners re-rank exactly via
      // isin pushdown. Memoized coarse fit + codebooks; oracle-checked end
      // to end (AnnOracles.annIvfPq composes the kmeansLloyd and PQ CTE
      // chains), with the recall-floor mirror in Round9QueriesSpec besides.
      val c = cat(s, dir)
      val (assigned, centers) =
        Similarity.ivfFitted(c.embeddings, "embedding", nLists = 8)
      val vd = col("embedding").cast("array<double>")
      val nrm = sqrt(Similarity.dot(vd, vd))
      val unit = when(nrm > 0, transform(vd, x => x / nrm)).otherwise(vd)
      val cLit = array(centers.map(cc => array(cc.map(lit): _*)): _*)
      val resid = zip_with(unit,
        element_at(cLit, col("ivf_cluster") + 1), (x, y) => x - y)
      val rdf = assigned.select(col("vec_id").as("rid"),
        col("ivf_cluster"), resid.as("r"))
      val cb = Pq.trained(rdf, "rid", "r", dim = 64, m = 8, k = 16, iters = 3)
      val encoded = Pq.encode(rdf, "rid", "r", 64, cb)
        .join(rdf.select(col("rid").as("id"), col("ivf_cluster")), "id")
        .localCheckpoint(eager = true) // one tiny (id, codes, list) frame
      val units = assigned.select(col("vec_id").as("id"), unit.as("u"))
      // ONE job fetches all three panel vectors (round 15) — the per-qid
      // filter().head() formulation paid a separate scan-the-assignment
      // job per panel member for three driver-side doubles[64].
      val panelIds = Seq(3L, 57L, 201L)
      val panelVecs = units.filter(col("id").isin(panelIds: _*))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val panel = panelIds.map { qid =>
        val qv = panelVecs(qid)
        val probes = Similarity.nearestCentroids(
          centers.zipWithIndex.map { case (cc, i) => (i, cc.toSeq) }.toSeq,
          qv, nProbe = 6)
        // Per-list ADC: one CASE over the probed lists, each with its own
        // residual LUT — a single scan of the pruned code frame.
        val luts = probes.map { ci =>
          ci -> Pq.lut(qv.zip(centers(ci)).map { case (x, y) => x - y }, cb)
        }
        val adc = luts.tail.foldLeft(
          when(col("ivf_cluster") === luts.head._1,
            Pq.adcDistance(col("codes"), luts.head._2))) {
          case (acc, (ci, l)) =>
            acc.when(col("ivf_cluster") === ci, Pq.adcDistance(col("codes"), l))
        }
        val short = encoded
          .filter(col("ivf_cluster").isin(probes: _*) && col("id") =!= qid)
          .select(col("id"), adc.as("adc"))
          .orderBy(col("adc"), col("id")).limit(100)
          .collect().map(_.getLong(0))
        val qLit = array(qv.map(lit): _*)
        units.filter(col("id").isin(short: _*))
          .select(lit(qid).as("qid"), col("id").as("vec_id"),
            round(aggregate(zip_with(col("u"), qLit,
              (x, y) => (x - y) * (x - y)), lit(0.0), (a, z) => a + z), 6)
              .as("dist2"))
      }.reduce(_ unionAll _)
      panel
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("dist2"), col("vec_id"))))
        .filter(col("rank") <= 10)
        .select("qid", "rank", "vec_id", "dist2")
        .orderBy("qid", "rank")
    }),

    "q_ann_ivf_indexed" -> ((s, dir) => {
      // The durable ANN path: index persisted partitionBy(ivf_cluster) so a
      // probe is a partition-pruned read touching nProbe/nLists of the
      // corpus (SimilaritySpec pins the PartitionFilters). Build once, probe
      // many — the index is only (re)built when absent for this corpus.
      val c = cat(s, dir)
      // v2: the quantizer moved from MLlib k-means|| to the pinned
      // kmeansLloyd trajectory — a v1 index persisted by an older JVM on
      // this machine would silently serve stale assignments to the oracle.
      val path = s"${sys.props("java.io.tmpdir")}/graft_ivf_index_v2_" +
        dirFingerprint(dir)
      if (!new java.io.File(s"$path/vectors/_SUCCESS").exists())
        Similarity.writeIvfIndex(
          c.embeddings.select(col("vec_id"),
            col("embedding").cast("array<double>").as("embedding")),
          "vec_id", "embedding", path, nLists = 8)
      val q = c.embeddings.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
      Similarity.ivfTopKFromIndex(s, path, "vec_id", "embedding", q, 10, nProbe = 3)
    }),

    "q_ann_ivf_incremental" -> ((s, dir) => {
      // Index FRESHNESS: a persisted IVF built over the corpus HEAD
      // (vec_id < 400 — present at every SF), then the next batch appended
      // WITHOUT refitting
      // (Similarity.appendToIvfIndex: assign against the stored centroids,
      // append into the same partition layout). Probes for appended ids
      // must find them through the identical partition-pruned path — the
      // production pattern where yesterday's quantizer serves today's
      // ingest. Build+append run once per corpus behind an `_APPENDED`
      // marker (append is not idempotent); each probe row reports whether
      // its hits come from the appended batch. Oracle-checked
      // (AnnOracles.annIvfIncremental: head fit + the assignToCentroids
      // append rule); Round8oQueriesSpec carries the mirror besides.
      import s.implicits._
      val c = cat(s, dir)
      val path = scratch(s, s"ivf_inc_${dirFingerprint(dir)}")
      val marker = new java.io.File(s"$path/_APPENDED")
      // The append is NOT idempotent, so the check-then-act must be atomic:
      // two concurrent first invocations in one app would both pass a bare
      // `!exists` and double-append. withPathLock serializes check+work+mark.
      withPathLock(path) {
        if (!marker.exists()) {
          val e = c.embeddings
            .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
          Similarity.writeIvfIndex(e.filter(col("vec_id") < 400),
            "vec_id", "embedding", path, nLists = 8)
          Similarity.appendToIvfIndex(
            e.filter(col("vec_id") >= 400 && col("vec_id") < 450),
            "vec_id", "embedding", path)
          marker.getParentFile.mkdirs(); marker.createNewFile()
        }
      }
      val queries = Seq(0L, 400L, 440L) // one head id, two appended ids
      queries.map { qid =>
        val qv = c.embeddings.filter(col("vec_id") === qid)
          .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
        Similarity.ivfTopKFromIndex(s, path, "vec_id", "embedding",
            qv, k = 5, nProbe = 3)
          .select(lit(qid).as("qid"), col("vec_id").as("nid"),
            col("sim"), (col("vec_id") >= 400).as("from_append"))
      }.reduce(_ unionAll _).orderBy("qid", "nid")
    }),

    "q_ann_recall" -> ((s, dir) => {
      // ANN quality evaluation as a first-class query: recall@10 of the two
      // approximate paths (multi-probe sign-LSH, IVF) against exact cosine
      // top-10, over a fixed 5-query panel. The panel is bounded by
      // construction, so the exact baseline is ONE corpus pass — queries
      // broadcast, per-query top-10 on the bounded-heap TopKPerGroup (the
      // q_knn_join shape), never a scan per query. The approximate sides
      // run their real probe paths (filtered bucket scans; the IVF fit is
      // session-memoized across the panel). Deterministic end to end:
      // fixed seeds, round(sim,4), ties by vec_id.
      val c = cat(s, dir)
      val k = 10
      val qids = Seq(0L, 1L, 2L, 3L, 4L)
      val e = c.embeddings
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val v = e.withColumn("nrm",
        sqrt(graft.functions.ArrayKernels.dot(col("emb"), col("emb"))))
      val q = v.filter(col("vec_id").isin(qids: _*))
        .select(col("vec_id").as("q_id"), col("emb").as("qe"), col("nrm").as("qn"))
      val scored = v.join(broadcast(q), lit(true))
        .select(col("q_id"), col("vec_id"),
          round(graft.functions.ArrayKernels.dot(col("qe"), col("emb")) /
            (col("qn") * col("nrm")), 4).as("sim"))
      val exact = graft.plans.TopKPerGroup.topKPerGroup(scored,
          Seq(col("q_id")), Seq(col("sim").desc, col("vec_id")), k)
        .select(col("q_id"), col("vec_id"))
      // 5 query vectors to the driver — the bounded panel, not the corpus.
      val qvecs = c.embeddings.filter(col("vec_id").isin(qids: _*))
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
      // Both approximate methods evaluate the WHOLE panel in one scan each:
      // probe membership becomes a tiny broadcast (q_id, bucket/cluster)
      // table joined against the bucketed corpus, then one bounded-heap
      // top-k per q_id — 2 jobs instead of 2×|panel|, the shape that holds
      // when the panel is 10⁴ queries against 100 TB. Probe selection and
      // sim arithmetic are byte-identical to the per-query lshTopK/ivfTopK
      // paths (same planes/seeds, same round(dot/(qn·nrm), 4), same ties).
      import s.implicits._
      val dim = qvecs.head._2.length
      val qdf = broadcast(q)
      def panelTopK(cands: DataFrame, method: String): DataFrame = {
        val scoredQ = cands.join(qdf, "q_id")
          .select(col("q_id"), col("vec_id"),
            round(graft.functions.ArrayKernels.dot(col("emb"), col("qe")) /
              (col("nrm") * col("qn")), 4).as("sim"))
        graft.plans.TopKPerGroup.topKPerGroup(scoredQ,
            Seq(col("q_id")), Seq(col("sim").desc, col("vec_id")), k)
          .select(col("q_id"), lit(method).as("method"), col("vec_id"))
      }
      val planes = Similarity.hyperplanes(8, dim)
      val lshProbes = broadcast(qvecs.flatMap { case (qid, qv) =>
        val qb = Similarity.bucketOf(qv, planes)
        (qb +: (0 until 8).map(i => qb ^ (1L << i))).distinct.map(b => (qid, b))
      }.toSeq.toDF("q_id", "bucket"))
      val lsh = panelTopK(
        v.withColumn("bucket", Similarity.signBucket(col("emb"), planes))
          .join(lshProbes, "bucket"), "lsh")
      val (indexed, centers) = Similarity.ivfFitted(c.embeddings, "embedding", nLists = 8)
      val centerSeq = centers.zipWithIndex.map { case (cn, i) => (i, cn.toSeq) }.toSeq
      val ivfProbes = broadcast(qvecs.flatMap { case (qid, qv) =>
        Similarity.nearestCentroids(centerSeq, qv, nProbe = 3).map(cl => (qid, cl))
      }.toSeq.toDF("q_id", "ivf_cluster"))
      val ivf = panelTopK(
        indexed.join(ivfProbes, "ivf_cluster")
          .select(col("q_id"), col("vec_id"),
            col("embedding").cast("array<double>").as("emb"))
          .withColumn("nrm",
            sqrt(graft.functions.ArrayKernels.dot(col("emb"), col("emb")))), "ivf")
      // The exact side is ≤ k·|panel| rows by construction; broadcast it
      // explicitly — the custom top-k operator exposes no stats, so AQE
      // would otherwise leave this tiny join a sort-merge exchange.
      lsh.unionAll(ivf)
        .join(broadcast(exact.withColumn("hit", lit(1))), Seq("q_id", "vec_id"), "left")
        .groupBy("q_id", "method")
        .agg(round(coalesce(sum("hit"), lit(0)) / k, 2).as("recall_at_10"))
        .orderBy("q_id", "method")
    }),

    "q_ann_tradeoff" -> ((s, dir) => {
      // The IVF tuning curve: recall@10 (panel-averaged) and fraction of
      // corpus scanned for EVERY nProbe in 1..nLists, in one pass. The
      // trick: probe sets are PREFIXES of each query's centroid ranking,
      // so a candidate probed at rank r serves every nProbe ≥ r — one
      // corpus join + an explode(sequence(rank, nLists)) replicates each
      // candidate to its curve points, and one bounded-heap top-k over
      // (q_id, nprobe) scores the whole sweep. nProbe = nLists degrades to
      // exact search, so the curve must END at recall 1.0 — the built-in
      // self-check the spec pins.
      val c = cat(s, dir)
      val k = 10
      val qids = Seq(0L, 1L, 2L, 3L, 4L)
      val nLists = 8
      import s.implicits._
      val (indexed, centers) = Similarity.ivfFitted(c.embeddings, "embedding", nLists)
      val centerSeq = centers.zipWithIndex.map { case (cn, i) => (i, cn.toSeq) }.toSeq
      val e = c.embeddings
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val v = e.withColumn("nrm",
        sqrt(graft.functions.ArrayKernels.dot(col("emb"), col("emb"))))
      val qdf = broadcast(v.filter(col("vec_id").isin(qids: _*))
        .select(col("vec_id").as("q_id"), col("emb").as("qe"), col("nrm").as("qn")))
      val exact = graft.plans.TopKPerGroup.topKPerGroup(
          v.join(qdf, lit(true)).select(col("q_id"), col("vec_id"),
            round(graft.functions.ArrayKernels.dot(col("qe"), col("emb")) /
              (col("qn") * col("nrm")), 4).as("sim")),
          Seq(col("q_id")), Seq(col("sim").desc, col("vec_id")), k)
        .select(col("q_id"), col("vec_id"))
      val qvecs = c.embeddings.filter(col("vec_id").isin(qids: _*))
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
      val probeRank = broadcast(qvecs.flatMap { case (qid, qv) =>
        Similarity.nearestCentroids(centerSeq, qv, nLists).zipWithIndex
          .map { case (cl, r) => (qid, cl, r + 1) }
      }.toSeq.toDF("q_id", "ivf_cluster", "rank"))
      val cands = indexed.join(probeRank, "ivf_cluster")
        .select(col("q_id"), col("rank"), col("vec_id"),
          col("embedding").cast("array<double>").as("emb"))
        .withColumn("nrm",
          sqrt(graft.functions.ArrayKernels.dot(col("emb"), col("emb"))))
        .join(qdf.withColumnRenamed("q_id", "q_id2"),
          col("q_id") === col("q_id2"))
        .select(col("q_id"), col("vec_id"),
          round(graft.functions.ArrayKernels.dot(col("emb"), col("qe")) /
            (col("nrm") * col("qn")), 4).as("sim"),
          explode(expr(s"sequence(rank, $nLists)")).as("nprobe"))
      val hits = graft.plans.TopKPerGroup.topKPerGroup(cands,
          Seq(col("q_id"), col("nprobe")), Seq(col("sim").desc, col("vec_id")), k)
        .join(broadcast(exact.withColumn("hit", lit(1))),
          Seq("q_id", "vec_id"), "left")
        .groupBy("nprobe")
        .agg(round(coalesce(sum("hit"), lit(0)) / (k * qids.size), 4)
          .as("avg_recall"))
      val csize = indexed.groupBy("ivf_cluster").agg(count(lit(1)).as("sz"))
      val scanned = probeRank.join(csize, "ivf_cluster")
        .withColumn("nprobe", explode(expr(s"sequence(rank, $nLists)")))
        .groupBy("nprobe").agg(sum("sz").as("scanned"))
        .crossJoin(broadcast(csize.agg(sum("sz").as("n_total"))))
        .select(col("nprobe"),
          round(col("scanned") / (col("n_total") * qids.size), 4).as("frac_scanned"))
      hits.join(scanned, "nprobe")
        .select(col("nprobe").cast("bigint").as("nprobe"),
          col("avg_recall"), col("frac_scanned"))
        .orderBy("nprobe")
    }),

    "q_embed_norm" -> ((s, dir) => {
      cat(s, dir).embeddings
        .select(col("vec_id"),
          round(Similarity.norm(col("embedding").cast("array<double>")), 4).as("nrm"))
        .orderBy("vec_id")
    }),

    "q_embed_quantize" -> ((s, dir) => {
      // int8 scalar quantization summary per vector — size/extremes/checksum
      // instead of the raw code array so the oracle compare stays scalar.
      val qv = Similarity.quantizeInt8(col("embedding"))
      cat(s, dir).embeddings
        .select(col("vec_id"), qv.as("qv"))
        .select(col("vec_id"), size(col("qv")).as("n"),
          array_min(col("qv")).as("qmin"), array_max(col("qv")).as("qmax"),
          aggregate(col("qv"), lit(0L), (a, x) => a + x).as("qsum"))
        .orderBy("vec_id")
    }),

    "q_embed_diversity" -> ((s, dir) => {
      // Corpus-diversity audit per label WITHOUT the O(n²) pairwise pass:
      // mean pairwise dot = (||Σv||² − Σ||v||²) / (n(n−1)) — the sum-vector
      // identity collapses all-pairs similarity into ONE scan, the trick
      // that makes "how self-similar is this 100 TB shard" answerable at
      // all. Per-dimension component sums and the norm sum run in exact
      // DECIMAL (order-independent — double summation order would drift
      // between engines); only the final 64-term combine is double, and
      // the result is rounded far above ulp noise.
      // ONE scan feeds both aggregates: the exploded (label, dim, x) frame
      // yields the component sums AND the norm sum (Σ‖v‖² = Σ over all
      // elements of x²), and n recovers as rows-per-(label,dim) — at 100 TB
      // the second full read of the corpus is the cost that matters. The
      // (label, dim) key space is tiny (64·L), so the shuffle after the
      // map-side combine is a few thousand rows regardless of corpus size.
      val terms = cat(s, dir).embeddings
        .select(col("label"), posexplode(col("embedding").cast("array<double>"))
          .as(Seq("d", "x")))
      val perDim = terms.groupBy("label", "d")
        .agg(sum(col("x").cast("decimal(28,12)")).as("sd"),
          sum((col("x") * col("x")).cast("decimal(28,12)")).as("sq"),
          count(lit(1)).as("nd"))
      perDim.groupBy("label")
        .agg(sum(col("sd").cast("double") * col("sd").cast("double")).as("ssq"),
          sum(col("sq")).as("nsum"), max(col("nd")).as("n"))
        .filter(col("n") >= 2)
        .select(col("label"), col("n"),
          round((col("ssq") - col("nsum").cast("double")) /
            (col("n") * (col("n") - lit(1.0))), 6).as("avg_dot"))
        .orderBy("label")
    }),

    "q_random_projection" -> ((s, dir) => {
      // Johnson-Lindenstrauss dimensionality reduction (64 → 16) with its
      // own distortion audit — the cheap first move when ANN probing or
      // pairwise audits get too expensive at full dim. The ±1 plane matrix
      // derives from md5 parity (the portable-hash idiom), built ONCE on
      // the driver and shipped as plan literals; each component is a
      // codegen DotProduct against a literal sign row, folding in index
      // order — so both engines compute bit-identical projections and the
      // audit needs no rounding slack beyond the display round. The audit
      // itself: original vs projected cosine on the consecutive-id pair
      // blocking (SQL-expressible, output-sized, no all-pairs stage).
      val k = 16
      val dim = 64
      val signs = Array.tabulate(k, dim) { (j, d) =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"${j}_$d".getBytes("UTF-8"))
        val prefix = ((md(0) & 0xff) << 16) | ((md(1) & 0xff) << 8) | (md(2) & 0xff)
        if (prefix % 2 == 0) 1.0 else -1.0
      }
      val vd = col("embedding").cast("array<double>")
      def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        graft.functions.ArrayKernels.dot(a, b)
      val proj = array((0 until k).map { j =>
        dot(vd, array(signs(j).map(lit): _*)) / math.sqrt(k)
      }: _*)
      val e = cat(s, dir).embeddings
        .select(col("vec_id"), vd.as("v"), proj.as("p"))
      val a = e.select(col("vec_id").as("id_a"), col("v").as("va"), col("p").as("pa"))
      val b = e.select((col("vec_id") - 1).as("id_a"), col("vec_id").as("id_b"),
        col("v").as("vb"), col("p").as("pb"))
      val j = a.join(b, "id_a")
      def cos(x: String, y: String) =
        dot(col(x), col(y)) / (sqrt(dot(col(x), col(x))) * sqrt(dot(col(y), col(y))))
      j.select(col("id_a"), col("id_b"),
          round(cos("va", "vb"), 6).as("cos_orig"),
          round(cos("pa", "pb"), 6).as("cos_proj"),
          round(abs(cos("va", "vb") - cos("pa", "pb")), 6).as("abs_err"))
        .orderBy("id_a")
    }),

    "q_sparse_cosine" -> ((s, dir) => {
      // Sparse TF-IDF doc-doc cosine — the LEXICAL similarity join (the
      // classic MapReduce all-pairs-similarity shape) beside the dense
      // embedding joins: docs pair ONLY through shared terms (a term-keyed
      // equality join), and high-df hub terms are pruned first, which is
      // both the scale bound — per-term pair fanout ≤ df² — and standard
      // stop-term hygiene; cosine lives in the pruned term space.
      // The prune is CORPUS-RELATIVE, df ≤ max(25, ceil(0.001·n)): an
      // absolute cut would, at 100× corpus scale, exceed nearly every real
      // term's df and silently drop almost all pairs — the relative form
      // keeps the admitted term set (and so recall against the pruned-space
      // truth) stable as n grows, while the fanout bound per term stays
      // df² ≤ (0.001·n)², linear in n per doc on Zipfian vocabularies.
      // RECALL NOTE: pairs similar ONLY through hub terms above the cut are
      // lost by design at every scale — the same documented behavior as
      // q_cosine_neardup's LSH recall floor; the oracle mirrors the cut.
      // Determinism: idf/weights/products all 9-snap, pair dots and norms
      // accumulate in exact DECIMAL (summation-order-free), threshold on
      // the ROUNDED similarity. Output: pairs at cos ≥ 0.3.
      val docs = cat(s, dir).documents
      val n = docs.count().toDouble // scalar action: |corpus| only
      val dfCap = math.max(25L, math.ceil(0.001 * n).toLong)
      val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .filter(length(col("t")) > 0)
        .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      val dfx = tf.groupBy("t").agg(count(lit(1)).as("df"))
        .filter(col("df") <= dfCap)
      val w = tf.join(dfx, "t")
        .select(col("doc_id"), col("t"),
          round(col("tf") * round(log(lit(n) / col("df")), 9), 9).as("w"))
      def dsum(c: org.apache.spark.sql.Column) =
        sum(c.cast("decimal(28,12)")).cast("double")
      val norms = w.groupBy("doc_id")
        .agg(sqrt(dsum(round(col("w") * col("w"), 9))).as("nrm"))
      val a = w.select(col("t"), col("doc_id").as("id_a"), col("w").as("wa"))
      val b = w.select(col("t"), col("doc_id").as("id_b"), col("w").as("wb"))
      val dots = a.join(b, "t").filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(dsum(round(col("wa") * col("wb"), 9)).as("dot"),
          count(lit(1)).as("shared_terms"))
      dots
        .join(norms.select(col("doc_id").as("id_a"), col("nrm").as("na")), "id_a")
        .join(norms.select(col("doc_id").as("id_b"), col("nrm").as("nb")), "id_b")
        .select(col("id_a"), col("id_b"), col("shared_terms"),
          round(col("dot") / (col("na") * col("nb")), 6).as("cos_sim"))
        .filter(col("cos_sim") >= 0.3)
        .orderBy("id_a", "id_b")
    }),

    "q_matryoshka" -> ((s, dir) => {
      // Matryoshka-truncation audit (Kusupati et al. 2022): how much
      // cosine structure survives keeping only the first k dims of the
      // 64-dim embedding — the question a retrieval stack asks before
      // shipping truncated vectors to cut index cost 2–4×. Same
      // consecutive-id pair blocking as q_random_projection (output-sized,
      // no all-pairs stage); per-prefix cosines are codegen DotProduct
      // folds over slices, so both engines compute bit-identical doubles.
      val vd = col("embedding").cast("array<double>")
      def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        graft.functions.ArrayKernels.dot(a, b)
      val e = cat(s, dir).embeddings.select(col("vec_id"), vd.as("v"))
      val a = e.select(col("vec_id").as("id_a"), col("v").as("va"))
      val b = e.select((col("vec_id") - 1).as("id_a"),
        col("vec_id").as("id_b"), col("v").as("vb"))
      val j = a.join(b, "id_a")
      def cosK(k: Int) = {
        val x = slice(col("va"), 1, k)
        val y = slice(col("vb"), 1, k)
        dot(x, y) / (sqrt(dot(x, x)) * sqrt(dot(y, y)))
      }
      j.select(col("id_a"), col("id_b"),
          round(cosK(64), 6).as("cos64"),
          round(cosK(16), 6).as("cos16"),
          round(cosK(32), 6).as("cos32"),
          round(cosK(48), 6).as("cos48"),
          round(abs(cosK(16) - cosK(64)), 6).as("err16"),
          round(abs(cosK(32) - cosK(64)), 6).as("err32"),
          round(abs(cosK(48) - cosK(64)), 6).as("err48"))
        .orderBy("id_a")
    }),

    "q_knn_join" -> ((s, dir) => {
      // Batch k-NN join: every query vector gets its top-3 cosine
      // neighbors. The query set is EXPLICITLY bounded (1-in-50 subset AND
      // an id cap ≤ 100 queries) so its broadcast is provably small AND the
      // per-corpus-row work is CONSTANT at any corpus scale — a
      // fraction-only rule would grow linearly and eventually exceed
      // executor memory (the round-3 cosineAllPairs lesson), and a cap
      // above the probed corpus sizes silently turns the probe quadratic
      // (the round-8 lesson: the old 1000-query cap only bound at sf≥1, so
      // sf0.1→sf1 measured panel×corpus = 100× work). Corpora with more
      // queries batch them through this same join. The corpus streams through the codegen'd dot kernel
      // once; per-query top-3 runs on the custom bounded-heap TopKPerGroup
      // — no per-query sort, no corpus shuffle.
      val e = cat(s, dir).embeddings
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val norm = graft.functions.ArrayKernels.dot(col("emb"), col("emb"))
      val v = e.withColumn("nrm", sqrt(norm))
      val q = v.select(col("vec_id").as("qid"), col("emb").as("qe"), col("nrm").as("qn"))
        .filter(col("qid") % 50 === 0 && col("qid") < 5000)
      val scored = v.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nid"),
          (graft.functions.ArrayKernels.dot(col("qe"), col("emb")) /
            (col("qn") * col("nrm"))).as("sim"))
      graft.plans.TopKPerGroup.topKPerGroup(scored, Seq(col("qid")),
          Seq(col("sim").desc, col("nid")), 3)
        .select(col("qid"), col("rk").cast("bigint").as("rk"), col("nid"),
          round(col("sim"), 4).as("sim"))
        .orderBy("qid", "rk")
    }),

    "q_hard_negatives" -> ((s, dir) => {
      // Hard-negative mining for contrastive training: for each anchor,
      // the top-3 most-similar vectors with a DIFFERENT label — the
      // negatives that actually teach a bi-encoder (random negatives are
      // trivially separable; same-label near neighbors are positives, not
      // negatives). Exactly the q_knn_join economics — bounded broadcast
      // anchor panel, one corpus scan through the codegen dot kernel,
      // bounded-heap per-anchor top-k — with the label-mismatch predicate
      // folded into the join so same-label rows never reach the heap.
      val e = cat(s, dir).embeddings
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"),
          col("label"))
      val norm = graft.functions.ArrayKernels.dot(col("emb"), col("emb"))
      val v = e.withColumn("nrm", sqrt(norm))
      val q = v.select(col("vec_id").as("qid"), col("emb").as("qe"),
          col("nrm").as("qn"), col("label").as("qlbl"))
        .filter(col("qid") % 50 === 0 && col("qid") < 5000)
      val scored = v.join(broadcast(q), col("label") =!= col("qlbl"))
        .select(col("qid"), col("qlbl"), col("vec_id").as("nid"),
          col("label").as("neg_label"),
          (graft.functions.ArrayKernels.dot(col("qe"), col("emb")) /
            (col("qn") * col("nrm"))).as("sim"))
      graft.plans.TopKPerGroup.topKPerGroup(scored, Seq(col("qid")),
          Seq(col("sim").desc, col("nid")), 3)
        .select(col("qid"), col("qlbl").cast("int").as("anchor_label"),
          col("rk").cast("bigint").as("rk"), col("nid"),
          col("neg_label").cast("int").as("neg_label"),
          round(col("sim"), 4).as("sim"))
        .orderBy("qid", "rk")
    }),

    "q_negative_sampling" -> ((s, dir) => {
      // word2vec-style negative sampling (Mikolov et al. 2013): k=5
      // negatives per document from the unigram^0.75 distribution,
      // DETERMINISTIC end to end. The distribution is quantized onto a
      // 4096-bucket alias table in EXACT integer arithmetic (bucket b's
      // probe point u_b = (2b+1)·total DIV 2B; each vocab row emits only
      // its covered bucket range via a bounded sequence-explode — never a
      // vocab×buckets range join), and f^0.75 is computed as
      // sqrt(f·sqrt(f)) — two exactly-rounded IEEE ops, so both engines
      // land on bit-identical weights where pow() could differ by an ulp.
      // Draws are md5 fractions (reproducible across retries), each an
      // EQUALITY join against the broadcast 4096-row alias table — the
      // production contrastive-negatives shape: the table builds once at
      // vocab size, the per-row draw cost is a broadcast-hash lookup.
      val B = 4096
      val vocab = cat(s, dir).documents
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("f"))
        .withColumn("wt", round(sqrt(col("f").cast("double") *
          sqrt(col("f").cast("double"))) * lit(1000000.0)).cast("long"))
      // Vocab-sized window (the alias table is built to be broadcast);
      // the q_surrogate_keys bucketed-rank shape is the escape hatch for
      // extreme vocabularies.
      val cum = vocab
        .withColumn("hi", sum("wt").over(Window.orderBy("w")))
        .withColumn("lo", col("hi") - col("wt"))
        .localCheckpoint(eager = true)
      val total = cum.agg(max("hi")).head().getLong(0)
      val alias = cum
        .withColumn("b", explode(sequence(
          greatest(lit(0L), expr(s"((2 * $B * lo) DIV $total) DIV 2 - 1")),
          least(lit((B - 1).toLong),
            expr(s"((2 * $B * hi) DIV $total) DIV 2 + 1")))))
        .withColumn("u", expr(s"((2 * b + 1) * ${total}L) DIV ${2 * B}"))
        .filter(col("u") >= col("lo") && col("u") < col("hi"))
        .select(col("b"), col("w").as("neg"))
      val draws = cat(s, dir).documents.select(col("doc_id"))
        .withColumn("k", explode(sequence(lit(0), lit(4))))
        .withColumn("b", expr(s"CAST(conv(substring(md5(concat(" +
          s"CAST(doc_id AS STRING), '_', CAST(k AS STRING))), 1, 7), 16, 10) " +
          s"AS BIGINT) % $B"))
      draws.join(broadcast(alias), "b")
        .select(col("doc_id"), col("k"), col("neg"))
        .orderBy("doc_id", "k")
    }),

    "q_embed_centroid" -> ((s, dir) => {
      // Per-label centroid audit — the k-means/IVF cluster-quality
      // primitive: centroid norm ‖Σv‖/n and dispersion E‖v‖² − ‖c‖²
      // (mean squared distance to the centroid), both from ONE exploded
      // scan via the same sum-vector identity as q_embed_diversity. A
      // centroid near 0 with high dispersion = an incoherent cluster;
      // the shuffle after map-side combine is 64·L rows regardless of
      // corpus size. Per-dim sums run in exact DECIMAL (order-independent
      // across engines); only the 64-term final combine is double, rounded
      // far above ulp noise.
      val terms = cat(s, dir).embeddings
        .select(col("label"), posexplode(col("embedding").cast("array<double>"))
          .as(Seq("d", "x")))
      val perDim = terms.groupBy("label", "d")
        .agg(sum(col("x").cast("decimal(28,12)")).as("sd"),
          sum((col("x") * col("x")).cast("decimal(28,12)")).as("sq"),
          count(lit(1)).as("nd"))
      perDim.groupBy("label")
        .agg(sum(col("sd").cast("double") * col("sd").cast("double")).as("ssq"),
          sum(col("sq")).as("nsum"), max(col("nd")).as("n"))
        .select(col("label"), col("n"),
          round(sqrt(col("ssq")) / col("n"), 6).as("centroid_norm"),
          round(col("nsum").cast("double") / col("n") -
            col("ssq") / (col("n") * col("n")), 6).as("dispersion"))
        .orderBy("label")
    }),

    "q_mmr_diverse" -> ((s, dir) => {
      // Diversified panel selection by maximal marginal relevance: pick 10
      // embeddings maximizing λ·(cosine to the corpus mean direction) −
      // (1−λ)·(max cosine to anything already picked) — the standard
      // exemplar-pool/eval-panel primitive. Greedy is inherently
      // sequential but DETERMINISTIC (round-6 rel/sims, min-id ties), so
      // the oracle unrolls one CTE pair per pick (the q_kcenter pattern);
      // Round8hQueriesSpec keeps the plain-Scala mirror. The Spark shape
      // is the kCenterGreedy economics — k single-job struct-max argmax
      // passes over a cached unit-normalized projection, selected vectors
      // riding the plan as literals.
      Similarity.mmrSelect(cat(s, dir).embeddings, "vec_id", "embedding",
        k = 10, lam = 0.7)
    }),

    "q_kcenter_coreset" -> ((s, dir) => {
      // Coreset selection by greedy k-center (Gonzalez 1985): the 8 most
      // mutually distant embeddings plus the covering radius after each
      // pick — the diversity-sampling primitive (pick the next training
      // example FARTHEST from everything already chosen). k scans, each a
      // single max-of-struct aggregate with the chosen centers as in-plan
      // literals; one row per scan reaches the driver. ORACLE-CHECKED:
      // the greedy is deterministic (bit-identical left-to-right d2 folds,
      // min-id ties), so the oracle unrolls one CTE pair per pick — the
      // q_kmeans pattern for data-dependent iteration with a FIXED, small
      // step count; Round8cQueriesSpec besides replays the exact greedy
      // sequentially and pins the non-increasing radii.
      import s.implicits._
      Similarity.kCenterGreedy(cat(s, dir).embeddings, "vec_id", "embedding", k = 8)
        .map { case (r, id, rad) =>
          (r, id, BigDecimal(rad).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .toDF("rank", "vec_id", "radius")
        .orderBy("rank")
    }),

    "q_pq_topk" -> ((s, dir) => {
      // Product-quantized ANN (Jégou et al. 2011): train 8 sub-quantizers
      // of 16 codes fused (see Pq.train — iters+1 scans total regardless
      // of m), encode the corpus map-only to 8 small ints per vector (32×
      // smaller than the float vectors), then answer a pinned 3-query
      // panel the production way — ADC shortlist (50 candidates, 8 LUT
      // lookups each, floats never touched) followed by ONE exact re-rank
      // scan over just the shortlist ids (isin pushdown). ORACLE-CHECKED
      // (the q_kmeans unrolled-CTE pattern): the PQ trajectory is pinned —
      // deterministic init, exact-DECIMAL round-9 sub-quantizer means,
      // round-9 LUT entries summed in DECIMAL — so the oracle unrolls
      // training per iteration and restates the shortlist/rerank cuts
      // exactly; PqSpec additionally pins reranked and raw-ADC recall
      // floors vs exact brute force plus the self-distance identity.
      val emb = cat(s, dir).embeddings
      val cb = Pq.trained(emb, "vec_id", "embedding", dim = 64, m = 8, k = 16, iters = 3)
      // Materialize the (id, codes) frame ONCE: it is 32× smaller than the
      // vectors and every panel query's ADC scan re-enters it — without
      // this each shortlist pass re-runs the m·k argmin encoding.
      val encoded = Pq.encode(emb, "vec_id", "embedding", 64, cb)
        .localCheckpoint(eager = true)
      val panel = emb.filter(col("vec_id").isin(3L, 57L, 201L))
        .select(col("vec_id").as("qid"),
          col("embedding").cast("array<double>").as("qv"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
        .sortBy(_._1)
      panel.map { case (qid, qv) =>
        Pq.topKReranked(encoded.filter(col("id") =!= qid), emb,
            "vec_id", "embedding", qv, cb, k = 10, shortlist = 50)
          .select(lit(qid).as("qid"), col("id").as("vec_id"),
            round(col("dist2"), 6).as("dist2"))
      }.reduce(_ unionAll _)
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("dist2"), col("vec_id"))))
        .select("qid", "rank", "vec_id", "dist2")
        .orderBy("qid", "rank")
    }),

    "q_pq_distortion" -> ((s, dir) => {
      // The "is the codebook pulling its weight" audit: per-subspace mean
      // quantization error vs the subspace-variance baseline (distortion
      // of coding everything as the subspace mean). var_explained ≈ 0
      // means that subspace's codebook is wasted bits. One exploded scan
      // computes both sides; the baseline means are one m·dsub collect.
      val emb = cat(s, dir).embeddings
      val cb = Pq.trained(emb, "vec_id", "embedding", dim = 64, m = 8, k = 16, iters = 3)
      val sub = Pq.subspaceRows(emb, "vec_id", "embedding", 64, 8)
      val means: Pq.Codebooks = {
        // Exact-DECIMAL per-dim means (the kmeansLloyd m-step contract) so
        // the baseline codebook is bit-identical across engines too.
        val rows = sub.select(col("j"), posexplode(col("sv")).as(Seq("d", "x")))
          .groupBy("j", "d")
          .agg(round(sum(col("x").cast("decimal(28,12)")).cast("double") /
            count(lit(1)), 9).as("mu")).collect()
        val byJ = rows.groupBy(_.getInt(0))
        (0 until 8).map(j => Array(byJ(j).sortBy(_.getInt(1))
          .map(_.getDouble(2)))).toArray
      }
      // Per-row errors snap to 9 and accumulate in exact DECIMAL: a double
      // avg() is partition-order-dependent at the last ulp — the oracle
      // hash hinges on the round-6 quotient (the q_kmeans avg_dist2 rule).
      def davg(c: org.apache.spark.sql.Column) =
        round(sum(round(c, 9).cast("decimal(28,12)")).cast("double") /
          count(lit(1)), 6)
      sub.select(col("j"),
          Pq.subspaceError(col("j"), col("sv"), cb).as("err"),
          Pq.subspaceError(col("j"), col("sv"), means).as("base"))
        .groupBy("j").agg(count(lit(1)).as("n"),
          davg(col("err")).as("avg_distortion"),
          davg(col("base")).as("avg_variance"))
        .withColumn("var_explained",
          round(lit(1.0) - col("avg_distortion") / col("avg_variance"), 4))
        .orderBy("j")
    }),

  )
}
