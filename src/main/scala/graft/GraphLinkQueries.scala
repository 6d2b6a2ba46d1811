package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Dedup
import SparkEntry.cat

/** Graph-analytics and entity-resolution/record-linkage tier of the driver surface: degree/PageRank/PPR/HITS/label-propagation/k-core/triangles/BFS/max-span-forest over the co-purchase graph, plus the blocking + scoring + evaluation linkage chain (Jaro-Winkler, sorted neighborhood, Fellegi-Sunter, phonetic keys).
  *
  * Extracted verbatim from [[SparkEntry.queriesBase]] — same keys, same
  * closures, zero behavior change; the matching oracle SQL stays in
  * [[OracleSql]]. */
object GraphLinkQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_graph_degree" -> ((s, dir) => {
      // Dup-graph degree profile: the histogram (degree → node count) reads
      // the near-dup graph's shape at a glance (isolated pairs vs chains vs
      // cliques) — the QA step before trusting transitive-closure dedup.
      // Edges come from the same rare-gram rule as q_dedup_clusters; after
      // edge distinct, only narrow (src, dst) longs flow — degree is one
      // groupBy, the histogram a second over |nodes| rows.
      val edges = Dedup.dupGraphEdges(
        cat(s, dir).documents.filter(col("source") === "src0"))
      edges.select(col("src").as("id"))
        .unionAll(edges.select(col("dst").as("id")))
        .groupBy("id").agg(count(lit(1)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
        .orderBy("degree")
    }),

    // -------------------------------------------------- round 5, batch d
    "q_jaro_winkler" -> ((s, dir) => {
      // Record-linkage scoring: Jaro / Jaro-Winkler over candidate pairs
      // (adjacent-key pairing stands in for a blocking stage's output) via
      // the native codegen kernel — Spark ships levenshtein but not the
      // standard name-matcher, and a Scala UDF here would box every row.
      // DuckDB's jaro(_winkler)_similarity is the exact oracle.
      val c = cat(s, dir).customer.select("c_custkey", "c_name", "c_mktsegment")
      val b = c.select(col("c_custkey").as("k2"), col("c_name").as("name2"))
      c.join(b, col("c_custkey") + 1 === col("k2"))
        .select(col("c_custkey").as("k"),
          round(graft.functions.StringKernels.jaroWinkler(col("c_name"), col("name2")), 5).as("jw_name"),
          round(graft.functions.StringKernels.jaro(col("c_name"), col("name2")), 5).as("j_name"),
          round(graft.functions.StringKernels.jaroWinkler(col("c_name"), col("c_mktsegment")), 5).as("jw_seg"))
        .orderBy("k")
    }),

    "q_sorted_neighborhood" -> ((s, dir) => {
      // Entity-resolution stage 1 — sorted-neighborhood blocking (see
      // Linkage.scala): the dirty roster (clean customers + planted
      // trailing-char-typo duplicates) sorted by name within each market
      // segment, each record paired with its next 2 neighbors. Candidates
      // are O(n·w) from ONE window exchange — never the O(n²) all-pairs
      // join. JW scored per pair by the codegen kernel.
      val d = graft.engine.Linkage.dirtyCustomers(cat(s, dir).customer)
      graft.engine.Linkage
        .sortedNeighborhoodPairs(d, "segment", "name", "id",
          carry = Seq("name"), window = 3)
        .select(col("id_a"), col("id_b"), col("dist"),
          round(graft.functions.StringKernels.jaroWinkler(
            col("name_a"), col("name_b")), 5).as("jw"))
        .orderBy("id_a", "id_b")
    }),

    "q_fellegi_sunter" -> ((s, dir) => {
      // Entity-resolution stage 2 — Fellegi–Sunter match scoring over the
      // sorted-neighborhood candidates: pinned integer deci-weights on
      // name-JW / nation / balance-band agreement, summed exactly and
      // banded match / possible / non_match. The name threshold (0.985)
      // sits between a trailing-typo JW (0.98889) and a one-digit
      // substitution (0.97778), so planted dups land in `match` and mere
      // sort-neighbors need corroborating fields to leave `non_match`.
      val d = graft.engine.Linkage.dirtyCustomers(cat(s, dir).customer)
      val pairs = graft.engine.Linkage.sortedNeighborhoodPairs(
        d, "segment", "name", "id",
        carry = Seq("name", "nation", "bal_band"), window = 3)
      graft.engine.Linkage.fellegiSunterScore(pairs)
        .orderBy("id_a", "id_b")
    }),

    "q_soundex_key" -> ((s, dir) => {
      // Phonetic blocking, stage 0: the codegen Soundex kernel
      // (functions/StringKernels.scala) keying every roster last name —
      // oracle-checked against the full algorithm RESTATED in DuckDB list
      // SQL (code chars → drop H/W transparently → collapse adjacent →
      // first-3-nonzero, the Ashcraft/Pfister rules), so the kernel and
      // the SQL spec can never drift apart.
      val r = graft.engine.Linkage.namedRoster(cat(s, dir).customer)
      val last = element_at(split(col("name"), " "), 2)
      r.select(col("id"), last.as("last_name"),
          graft.functions.StringKernels.soundex(last).as("skey"))
        .orderBy("id")
    }),

    "q_phonetic_block" -> ((s, dir) => {
      // Entity resolution, SECOND blocking pass: sorted-neighborhood over
      // the PHONETIC key (first-name|soundex(last-name)) instead of the
      // market segment, feeding the SAME Fellegi–Sunter scorer. Phonetic
      // blocks are per-sound tight (33 vs 308 candidates at sf0.001) and
      // catch the planted family-0 dups whose segment shifted out of the
      // first blocker's reach; the window inside each block keeps
      // candidates O(n·w), never all-pairs-per-block.
      val r = graft.engine.Linkage.namedRoster(cat(s, dir).customer)
      val keyed = r.withColumn("pkey",
        graft.engine.Linkage.phoneticKey(col("name")))
      val pairs = graft.engine.Linkage.sortedNeighborhoodPairs(
        keyed, "pkey", "name", "id",
        carry = Seq("name", "nation", "bal_band"), window = 3)
      // JW runs on the NAME WORDS with the record tag stripped: semantic
      // ("name similarity must not credit the record id"), and it pins the
      // oracle — near-identical numeric tags hit a repeated-character Jaro
      // ambiguity where the standard greedy and DuckDB's bit-parallel
      // matcher count transpositions differently (t=3 vs t=2 on
      // "…000021"/"…001021"); the word domain (same first name + pool last
      // names sharing a soundex, 1160 ordered pairs) is exhaustively
      // verified divergence-free between the two engines.
      def words(c: org.apache.spark.sql.Column) =
        concat(element_at(split(c, " "), 1), lit(" "),
          element_at(split(c, " "), 2))
      graft.engine.Linkage.fellegiSunterScore(
          pairs.withColumn("name_a", words(col("name_a")))
            .withColumn("name_b", words(col("name_b"))))
        .orderBy("id_a", "id_b")
    }),

    "q_er_eval_blockers" -> ((s, dir) => {
      // Per-blocker pair completeness against the planted truth: the
      // segment-blocked sorted-neighborhood pass, the phonetic pass, and
      // their UNION, each graded on candidates generated and planted pairs
      // surviving. The roster's three corruption families make the union
      // STRICTLY dominate either blocker alone by construction (family 0
      // invisible to segment blocking, family 2 invisible to soundex) —
      // the textbook argument for multi-pass blocking, here as an
      // oracle-checked readout.
      val c = cat(s, dir).customer
      val r = graft.engine.Linkage.namedRoster(c)
      val keyed = r.withColumn("pkey",
        graft.engine.Linkage.phoneticKey(col("name")))
      def candidates(src: org.apache.spark.sql.DataFrame, block: String) =
        graft.engine.Linkage.sortedNeighborhoodPairs(
            src, block, "name", "id", carry = Seq("name"), window = 3)
          .select(least(col("id_a"), col("id_b")).as("lo"),
            greatest(col("id_a"), col("id_b")).as("hi"))
      // Each blocker's raw pair stream is computed ONCE, tagged, and
      // deduped in a single (lo, hi) aggregation carrying per-blocker
      // membership flags — the per-blocker counts, the union count, and
      // the planted-pair hits all read off that one frame (the separate
      // sn/ph/union formulation paid 3 distinct shuffles and re-ran both
      // sorted-neighborhood windows for the union leg). max(flag) under
      // groupBy (lo, hi) ≡ set membership, so every readout is unchanged.
      val tagged = candidates(r, "segment")
          .select(col("lo"), col("hi"), lit(1L).as("sn"), lit(0L).as("ph"))
        .unionAll(candidates(keyed, "pkey")
          .select(col("lo"), col("hi"), lit(0L).as("sn"), lit(1L).as("ph")))
      val flags = tagged.groupBy("lo", "hi")
        .agg(max("sn").as("sn"), max("ph").as("ph"))
      val planted = col("hi") === col("lo") + 1000000L && col("lo") % 10 === 0
      // coalesce(…, 0): on an empty flags frame sum() is NULL where the old
      // per-blocker count(lit(1)) read 0 — the advisor-r16 edge case (both
      // blockers emitting zero candidate pairs must report 0, not null).
      val tot = flags.agg(
        coalesce(sum("sn"), lit(0L)).as("sn_n"),
        sum(when(col("sn") === 1L && planted, 1L).otherwise(0L)).as("sn_p"),
        coalesce(sum("ph"), lit(0L)).as("ph_n"),
        sum(when(col("ph") === 1L && planted, 1L).otherwise(0L)).as("ph_p"),
        count(lit(1)).as("un_n"),
        sum(when(planted, 1L).otherwise(0L)).as("un_p"))
      val metrics = tot.select(explode(array(
          struct(lit("sorted_neighborhood").as("blocker"),
            col("sn_n").as("n_candidates"), col("sn_p").as("planted_found")),
          struct(lit("phonetic").as("blocker"),
            col("ph_n").as("n_candidates"), col("ph_p").as("planted_found")),
          struct(lit("union").as("blocker"),
            col("un_n").as("n_candidates"), col("un_p").as("planted_found"))))
          .as("m"))
        .select(col("m.blocker").as("blocker"),
          col("m.n_candidates").as("n_candidates"),
          col("m.planted_found").as("planted_found"))
      val nPlant = c.filter(col("c_custkey") % 10 === 0)
        .agg(count(lit(1)).as("n_planted"))
      metrics
        .crossJoin(broadcast(nPlant)) // 1-row frame
        .select(col("blocker"), col("n_candidates"), col("planted_found"),
          col("n_planted"),
          round(col("planted_found").cast("double") /
            col("n_planted").cast("double"), 4).as("pair_completeness"))
        .orderBy("blocker")
    }),

    "q_er_clusters" -> ((s, dir) => {
      // Entity-resolution endgame: transitive closure of the `match`-band
      // edges into entity ids (min member id), via the shared union-find /
      // pointer-jumping closure. Planted duplicates resolve to their
      // originals; the whole pipeline is one window exchange + per-row
      // scoring + a closure over the (small) match edge set.
      val d = graft.engine.Linkage.dirtyCustomers(cat(s, dir).customer)
      val pairs = graft.engine.Linkage.sortedNeighborhoodPairs(
        d, "segment", "name", "id",
        carry = Seq("name", "nation", "bal_band"), window = 3)
      val edges = graft.engine.Linkage.fellegiSunterScore(pairs)
        .filter(col("band") === "match")
        .select(least(col("id_a"), col("id_b")).as("src"),
          greatest(col("id_a"), col("id_b")).as("dst"))
      Dedup.connectedComponents(edges, "src", "dst")
        .select(col("id"), col("comp").as("entity"))
        .orderBy("id")
    }),

    "q_pagerank" -> ((s, dir) => {
      // PageRank over the dup graph (same rare-gram edge rule as
      // q_dedup_clusters): rank = how central a document is in its near-dup
      // neighborhood — the signal for choosing cluster representatives by
      // connectivity instead of min-id. 3 fixed iterations, per-iteration
      // 9-decimal rounding keeps Spark and the oracle's unrolled CTE chain
      // on bit-identical doubles (see Graph.pageRank).
      val edges = Dedup.dupGraphEdges(
        cat(s, dir).documents.filter(col("source") === "src0"))
      graft.engine.Graph.pageRank(edges, "src", "dst", iterations = 3)
        .select(col("id"), round(col("pr"), 6).as("pr"))
        .orderBy("id")
    }),

    "q_ppr" -> ((s, dir) => {
      // Personalized PageRank over the same dup graph: restart mass goes
      // only to a seed panel (the 5 lowest node ids — deterministic and
      // present at every SF), answering "which documents are in THESE
      // documents' near-dup neighborhood" — the seed-set expansion a
      // curation pass runs to grow a known-bad cluster before dropping.
      // Unreachable nodes sit at exactly 0 (kept — absence vs zero
      // matters downstream). 2 iterations; the oracle unrolls the same
      // left-joined walk (Graph.personalizedPageRankKeyed).
      val edges = Dedup.dupGraphEdges(
        cat(s, dir).documents.filter(col("source") === "src0"))
        .select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
      val nodes = edges.select(col("src").as("id"))
        .unionAll(edges.select(col("dst").as("id"))).distinct()
      val seeds = nodes.orderBy("id").limit(5)
      graft.engine.Graph.personalizedPageRankKeyed(
          edges, "src", "dst", seeds, iterations = 2)
        .select(col("id"), col("is_seed"), round(col("pr"), 6).as("ppr"))
        .orderBy("id")
    }),

    "q_max_span_forest" -> ((s, dir) => {
      // Borůvka maximum spanning forest over the co-purchase graph (same
      // deterministic edge rule as q_triangle_count, weight = co-occurrence
      // count): the Chow–Liu backbone — the strongest-association skeleton
      // a taxonomy/dependency-tree builder extracts from pairwise counts.
      // Ties broken by the total order (−w, src, dst), which makes the
      // forest UNIQUE, so the edge set is comparable against any correct
      // MSF build: GraphSpec holds an in-memory Kruskal mirror, and the
      // DuckDB oracle mirrors Borůvka itself (12 unrolled phases with
      // recursive-CTE contraction — labels differ, partition evolution
      // and hence the picked edge set are identical).
      val li = cat(s, dir).lineitem
        .filter(col("l_partkey") % 5 === 0)
        .select(col("l_orderkey").as("okey"), col("l_partkey").as("pk"))
        .distinct()
      val pairs = li.as("a").join(li.as("b"),
          col("a.okey") === col("b.okey") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("src"), col("b.pk").as("dst"))
        .agg(count(lit(1)).as("w"))
      graft.engine.Graph.maxSpanningForest(pairs, "src", "dst", "w")
        .orderBy("src", "dst")
    }),

    "q_triangle_count" -> ((s, dir) => {
      // Triangle count on the co-purchase graph (parts sharing an order, on
      // a deterministic 1-in-5 part subset): the clustering-coefficient
      // numerator — how clique-ish the association graph is. Edges oriented
      // low→high before the wedge join, so each triangle counts once and
      // wedge fan-out is bounded by oriented degree.
      val li = cat(s, dir).lineitem
        .filter(col("l_partkey") % 5 === 0)
        .select(col("l_orderkey").as("okey"), col("l_partkey").as("pk"))
        .distinct()
      val pairs = li.as("a").join(li.as("b"),
          col("a.okey") === col("b.okey") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        .distinct()
      graft.engine.Graph.triangleCount(pairs, "src", "dst")
    }),

    "q_bfs_layers" -> ((s, dir) => {
      // BFS hop-distance layers over the dup graph from its local-minimum
      // representatives — "how far is each doc from its cluster anchor",
      // the iterate-until-bound complement to PageRank's fixed recurrence.
      // Same rare-gram edge rule; the capped expansion contract makes the
      // recursive-CTE oracle exact.
      val edges = Dedup.dupGraphEdges(
        cat(s, dir).documents.filter(col("source") === "src0"))
      graft.engine.Graph.bfsLayers(edges, "src", "dst", maxDepth = 6)
        .orderBy("id")
    }),

    "q_hits" -> ((s, dir) => {
      // HITS hubs/authorities (Kleinberg 1999) over the bipartite
      // customer→supplier purchase graph (edge = customer ever received a
      // lineitem from that supplier): hubs = broad buyers weighted by the
      // strength of their suppliers, authorities = suppliers endorsed by
      // the strongest hubs — the mutually-recursive centrality pair
      // PageRank can't express. 2 alternating L1-normalized passes; see
      // Graph.hits for the per-pass 9-decimal determinism contract. The
      // edge derivation is one orderkey equi-join distinct'd to the
      // narrow (cust, supp) pair before any iteration touches it.
      val c = cat(s, dir)
      // Deterministic 1-in-4 customer subset (the q_triangle_count
      // discipline): the declared query bounds the edge-derivation scan
      // while Graph.hits itself stays fully general.
      val edges = c.orders.filter(col("o_custkey") % 4 === 0)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(c.lineitem.select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
      graft.engine.Graph.hits(edges, "src", "dst", iterations = 2)
        .select(col("side"), col("id"), round(col("s"), 6).as("score"))
        .orderBy("side", "id")
    }),

    "q_label_prop" -> ((s, dir) => {
      // Community detection by synchronous label propagation over the
      // co-purchase graph (same deterministic edge rule as
      // q_triangle_count): 4 fixed sweeps, min-label tie-break — the
      // reproducible LPA variant. Communities partition the association
      // graph without any global state beyond the narrow (id, label)
      // frame; see Graph.labelPropagation for the per-iteration shuffle
      // shape.
      val li = cat(s, dir).lineitem
        .filter(col("l_partkey") % 5 === 0)
        .select(col("l_orderkey").as("okey"), col("l_partkey").as("pk"))
        .distinct()
      val pairs = li.as("a").join(li.as("b"),
          col("a.okey") === col("b.okey") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        .distinct()
      graft.engine.Graph.labelPropagation(pairs, "src", "dst", iterations = 4)
        .select(col("id"), col("lbl").as("community"))
        .orderBy("id")
    }),

    "q_er_eval" -> ((s, dir) => {
      // Entity-resolution EVALUATION — the readout that grades the whole
      // ER tier against its planted ground truth (every 10th customer has
      // a known trailing-typo duplicate at key+1,000,000): blocking
      // reduction ratio (candidates vs all-pairs), pair completeness
      // (planted pairs surviving the blocker), and match-band precision/
      // recall. Everything reduces to exact integer counts from the same
      // candidate/score frames the declared ER queries use, so the grades
      // can't drift from the system they grade.
      val c = cat(s, dir).customer
      val d = graft.engine.Linkage.dirtyCustomers(c)
      val pairs = graft.engine.Linkage.sortedNeighborhoodPairs(
        d, "segment", "name", "id",
        carry = Seq("name", "nation", "bal_band"), window = 3)
      val scored = graft.engine.Linkage.fellegiSunterScore(pairs)
        .withColumn("planted",
          (greatest(col("id_a"), col("id_b")) ===
            least(col("id_a"), col("id_b")) + 1000000L &&
            least(col("id_a"), col("id_b")) % 10 === 0).cast("long"))
      val cand = scored.agg(count(lit(1)).as("n_candidates"),
        sum("planted").as("planted_found"),
        sum(when(col("band") === "match", 1L).otherwise(0L)).as("n_pred"),
        sum(when(col("band") === "match", col("planted")).otherwise(0L))
          .as("tp"))
      val nRec = d.agg(count(lit(1)).as("n_records"))
      val nPlant = c.filter(col("c_custkey") % 10 === 0)
        .agg(count(lit(1)).as("n_planted"))
      val nr = col("n_records").cast("double")
      cand.crossJoin(broadcast(nRec)).crossJoin(broadcast(nPlant)) // 1-row frames
        .select(col("n_records"), col("n_candidates"), col("n_planted"),
          round(lit(1.0) - col("n_candidates").cast("double") /
            (nr * (nr - 1.0) / 2.0), 6).as("reduction_ratio"),
          round(col("planted_found").cast("double") /
            col("n_planted").cast("double"), 4).as("pair_completeness"),
          round(col("tp").cast("double") / col("n_pred").cast("double"), 4)
            .as("match_precision"),
          round(col("tp").cast("double") / col("n_planted").cast("double"), 4)
            .as("match_recall"))
    }),

    "q_kcore" -> ((s, dir) => {
      // k-core (k=12) of the co-purchase graph via Graph.kCore — iterative
      // min-degree peeling, the density-community primitive that
      // complements q_triangle_count (clique-ishness) and q_label_prop
      // (communities). Each Spark round is a degree agg + two semi-joins
      // over the shrinking edge frame; the oracle unrolls the same sweep a
      // fixed 12 times (idempotent past the fixpoint, so the two agree
      // whenever peeling converges within the cap — Round8lQueriesSpec pins
      // that it does, in ≤ 5 rounds at every test SF).
      val li = cat(s, dir).lineitem
        .filter(col("l_partkey") % 5 === 0)
        .select(col("l_orderkey").as("okey"), col("l_partkey").as("pk"))
        .distinct()
      val edges = li.as("a").join(li.as("b"),
          col("a.okey") === col("b.okey") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        .distinct()
      graft.engine.Graph.kCore(edges, "src", "dst", k = 12)
    }),

  )
}
