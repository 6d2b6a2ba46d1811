package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised classification over embedding columns — the quality/domain
  * classifier pillar of a curation pipeline (SURVEY.md §2.12 Y6). Real
  * pipelines gate corpora with trained classifiers (a quality model scoring
  * "reference-like"-ness, a domain model routing docs into mixture buckets);
  * this module provides the three standard tiers, each built so the model —
  * never the corpus — is what moves:
  *
  *  - [[knnClassify]]: lazy k-NN voting. No training at all; the test panel
  *    broadcasts and the corpus streams through the codegen'd dot kernel
  *    once, with the bounded-heap top-k picking neighbors (the q_knn_join
  *    shape). The right baseline before trusting any parametric model.
  *  - [[centroidClassify]]: nearest-class-centroid (Rocchio). Training is
  *    ONE partial-agg pass producing |labels|×dim rows; inference joins the
  *    tiny broadcast centroid table. The cheapest model that generalizes.
  *  - [[logregWeights]] / [[logregScore]]: binary logistic regression by
  *    full-batch gradient descent. Each iteration is one corpus scan: the
  *    weight vector rides INSIDE the plan as a literal array (model-to-data,
  *    like [[Similarity.kmeansLloyd]]), and the gradient comes back as a
  *    dim-row aggregate — the only driver collect is model-sized.
  *
  * Determinism contract (all three are DuckDB-oracle-checked): cosine uses
  * the strict left-to-right [[graft.functions.ArrayKernels.dot]] fold that
  * matches `list_dot_product`; per-dim centroid sums run in exact
  * DECIMAL(28,12) (order-independent across engines — the q_embed_centroid
  * discipline); gradient-descent weights round to 9 decimals per iteration
  * (the pageRank/kmeans trajectory-pinning contract) and sigmoid inputs
  * round to 6 so both engines feed `exp` the identical double. The
  * gradient's inner sum is plain double, so the 9-decimal snap is a
  * PROBABILISTIC stabilizer (the kmeansLloyd guarantee, not a bit-exact
  * one): a trajectory split needs an accumulated sum within ~1e-15 of a
  * rounding midpoint AND an order change crossing it — decimal terms would
  * close even that, but measured 1.7-3× slower per epoch (see
  * [[logregWeights]]).
  */
object Classify {

  private def dot(a: Column, b: Column): Column =
    graft.functions.ArrayKernels.dot(a, b)

  /** Deterministic test/train split rule shared by every classifier here:
    * test = every 5th id UNDER an absolute cap, train = the rest. The cap
    * (the q_knn_join lesson) keeps the test panel broadcast-small at ANY
    * corpus scale — a fraction-only rule would grow with the corpus and
    * eventually exceed executor memory; corpora with more held-out data
    * batch their panels through the same joins. */
  def isTestRow(id: Column, cap: Long = 1000L): Column =
    id % 5 === 0 && id < cap

  /** k-NN majority vote: each test vector's label is the mode of its k
    * nearest training neighbors by cosine (ties: higher vote count first,
    * then smaller label). One corpus scan; per-query neighbor selection on
    * the bounded-heap [[graft.plans.TopKPerGroup]] — no per-query sort, no
    * corpus shuffle. Output: (vec_id, actual, predicted) per test row. */
  def knnClassify(df: DataFrame, idCol: String, vecCol: String,
                  labelCol: String, k: Int = 5, cap: Long = 1000L): DataFrame = {
    val vd = col(vecCol).cast("array<double>")
    val v = df.select(col(idCol).as("vid"), vd.as("v"),
      sqrt(dot(vd, vd)).as("nrm"), col(labelCol).cast("int").as("lbl"))
    val test = v.filter(isTestRow(col("vid"), cap))
      .select(col("vid").as("qid"), col("v").as("qv"),
        col("nrm").as("qn"), col("lbl").as("actual"))
    val train = v.filter(!isTestRow(col("vid"), cap))
    val scored = train.join(broadcast(test), lit(true))
      .select(col("qid"), col("actual"), col("lbl"), col("vid"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 4).as("sim"))
    val neighbors = graft.plans.TopKPerGroup.topKPerGroup(scored,
      Seq(col("qid")), Seq(col("sim").desc, col("vid")), k)
    // Votes per (qid, label) are ≤ k rows per test id — window over a
    // panel-bounded frame, not the corpus.
    val votes = neighbors.groupBy("qid", "actual", "lbl")
      .agg(count(lit(1)).as("nv"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("nv").desc, col("lbl"))
    votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("qid").as("vec_id"), col("actual"),
        col("lbl").as("predicted"))
      .orderBy("vec_id")
  }

  /** Per-label centroids with EXACT per-dim sums: components are
    * round(decimal_sum / n, 9) — the decimal sum is order-independent, so
    * any engine computes the identical centroid, and the array rebuilds in
    * dim order so downstream dot products fold left-to-right identically.
    * Returns (label, centroid array, n). |labels|×dim intermediate rows —
    * model-sized, partial-agg'd, one corpus scan. */
  def labelCentroids(train: DataFrame, vecCol: String,
                     labelCol: String): DataFrame = {
    val terms = train.select(col(labelCol).cast("int").as("lbl"),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("d", "x")))
    terms.groupBy("lbl", "d")
      .agg(round(sum(col("x").cast("decimal(28,12)")).cast("double") /
        count(lit(1)), 9).as("m"))
      .groupBy("lbl")
      .agg(transform(array_sort(collect_list(struct(col("d"), col("m")))),
        s => s.getField("m")).as("centroid"))
  }

  /** Nearest-centroid (Rocchio) classification: assign each test vector to
    * the label whose centroid is most cosine-similar (ties: smaller label).
    * Output: the confusion matrix (actual, predicted, n) — the per-class
    * quality surface a gating decision reads. Centroid table is |labels|
    * rows, broadcast; inference is one panel-sized join. */
  def centroidClassify(df: DataFrame, idCol: String, vecCol: String,
                       labelCol: String, cap: Long = 1000L): DataFrame = {
    val vd = col(vecCol).cast("array<double>")
    val v = df.select(col(idCol).as("vid"), vd.as("v"),
      col(labelCol).cast("int").as("lbl"))
    val cents = labelCentroids(v.filter(!isTestRow(col("vid"), cap)), "v", "lbl")
      .select(col("lbl").as("clbl"), col("centroid"),
        sqrt(dot(col("centroid"), col("centroid"))).as("cn"))
    val test = v.filter(isTestRow(col("vid"), cap))
      .select(col("vid"), col("v"), sqrt(dot(col("v"), col("v"))).as("tn"),
        col("lbl").as("actual"))
    val scored = test.join(broadcast(cents), lit(true))
      .select(col("vid"), col("actual"), col("clbl"),
        round(dot(col("v"), col("centroid")) / (col("tn") * col("cn")), 4)
          .as("sim"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("vid")
      .orderBy(col("sim").desc, col("clbl"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("actual"), col("clbl").as("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy("actual", "predicted")
  }

  /** K-fold cross-validated nearest-centroid classifier — the model-selection
    * readout a gating decision runs BEFORE trusting [[centroidClassify]]'s
    * single split: every row is scored by the centroid model trained on the
    * other k−1 folds (blocked leave-fold-out by `id % folds`), so the whole
    * corpus is test data exactly once and the per-fold accuracy SPREAD
    * exposes the variance a single holdout hides.
    *
    * Training cost is independent of the fold count: ONE corpus scan builds
    * per-(fold, label, dim) DECIMAL sufficient statistics, and the fold-f
    * training centroid is pure algebra over them — (total − fold_f sums) /
    * (n − fold_f count) — never k re-scans. The grid cross-joins folds ×
    * (label, dim) totals so a label absent from a fold still gets its
    * trained-on-the-rest centroid. Determinism: exact-decimal numerators →
    * round-9 centroids bit-identical across engines (the kmeansLloyd
    * m-step contract); d² folds left-to-right in dim order; argmin is a
    * partial-aggregable min-of-struct (d2, label) — map-side combinable,
    * no corpus×labels window sort — with ties to the smaller label.
    * Output: per-fold (n_test, n_correct, accuracy). */
  def cvCentroid(df: DataFrame, idCol: String, vecCol: String,
                 labelCol: String, folds: Int = 5): DataFrame = {
    val base = df.select((col(idCol) % folds).cast("int").as("fold"),
      col(labelCol).cast("int").as("lbl"), col(idCol).as("vid"),
      col(vecCol).cast("array<double>").as("v"))
    val pf = base.select(col("fold"), col("lbl"),
        posexplode(col("v")).as(Seq("d", "x")))
      .groupBy("fold", "lbl", "d")
      .agg(sum(col("x").cast("decimal(28,12)")).as("sx"),
        count(lit(1)).as("n"))
    val tt = pf.groupBy("lbl", "d").agg(sum("sx").as("tx"), sum("n").as("tn"))
    val grid = base.select("fold").distinct().crossJoin(tt)
    val ct = grid.join(pf, Seq("fold", "lbl", "d"), "left")
      // A label living entirely inside one fold makes the leave-fold-out
      // denominator tn − n = 0; its 0/0 "centroid" would be null/NaN, and
      // Spark's min-of-struct orders null d2 FIRST so the degenerate
      // candidate silently wins every argmin (DuckDB's NULLS LAST would
      // then diverge). Drop the candidate instead: that fold simply has no
      // trained model for the label — the honest leave-fold-out semantics.
      .filter(col("tn") - coalesce(col("n"), lit(0L)) > 0)
      .select(col("fold"), col("lbl"), col("d"),
        round((col("tx") - coalesce(col("sx"), lit(0).cast("decimal(28,12)")))
          .cast("double") /
          (col("tn") - coalesce(col("n"), lit(0L))), 9).as("c"))
    val cents = ct.groupBy("fold", "lbl")
      .agg(transform(array_sort(collect_list(struct(col("d"), col("c")))),
        s => s.getField("c")).as("cv"))
      .select(col("fold"), col("lbl").as("cand"), col("cv"))
    val sc = base.join(broadcast(cents), Seq("fold"))
      .select(col("fold"), col("vid"), col("lbl").as("actual"), col("cand"),
        aggregate(zip_with(col("v"), col("cv"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, z) => a + z).as("d2"))
    sc.groupBy("fold", "vid", "actual")
      .agg(min(struct(col("d2"), col("cand"))).as("m"))
      .groupBy("fold")
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("m.cand") === col("actual"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("fold"), col("n_test"), col("n_correct"),
        round(col("n_correct").cast("double") / col("n_test"), 4)
          .as("accuracy"))
      .orderBy("fold")
  }

  /** Full-batch gradient-descent weights for binary logistic regression on
    * the TRAINING split (bias term included as weight 0). Each of the
    * `iters` iterations is ONE training scan: margins evaluate against the
    * current weights as in-plan literals, and the gradient aggregates to
    * dim+1 rows (posexplode → partial agg → model-sized collect). The
    * trajectory is pinned: margins round to 6 before the sigmoid (identical
    * `exp` input everywhere), per-dim gradient means and updated weights
    * round to 9 (the pageRank contract), so engines unrolling the same
    * recurrence land on the same weights up to the probabilistic guarantee
    * in the module note — the inner gradient sum is double, so the snap
    * fails only if an accumulation-order change crosses a 9-decimal
    * midpoint (~1e-15 window; the decimal-term alternative measured 1.7-3×
    * slower per epoch and was deliberately rejected).
    *
    * 100 TB shape: iters × one corpus scan, shuffle is dim-row partial
    * aggregation, driver holds dim+1 doubles — the same economics as
    * [[Similarity.kmeansLloyd]]; nothing scales with corpus size except the
    * scans themselves. Keep `iters` small when oracle-checking: the DuckDB
    * side unrolls one CTE layer per iteration and CTE inlining re-evaluates
    * each weight frame ~3× per layer — cost grows exponentially in `iters`
    * there (Spark's cost stays linear). */
  def logregWeights(train: DataFrame, vecCol: String, yCol: String,
                    iters: Int = 3, lr: Double = 1.0): Array[Double] = {
    // lr must keep lr·gradient ON the 1e-9 decimal grid (integral lr, or a
    // power of 10 ≥ 1): gradients are 9-decimal values, so a fractional lr
    // like 0.5 would park updates EXACTLY half-way between grid points,
    // where Spark's BigDecimal HALF_UP and an oracle engine's
    // scaled-binary rounding can legitimately disagree by 1e-9 — and a
    // 1-ulp weight split compounds across iterations (the pageRank teleport
    // lesson, one level up).
    require(lr == math.rint(lr), s"lr must be integral to stay on the 9-decimal grid: $lr")
    val vd = col(vecCol).cast("array<double>")
    // Iterative fit: the (possibly featurizer-derived) training frame is
    // re-scanned every epoch — cache for the fit, release after (the
    // kmeansLloyd economics; without this a hashedTf featurization would
    // re-run iters+2 times).
    val cached = train.select(vd.as("v"), col(yCol).cast("double").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dim = cached.select(size(col("v"))).head().getInt(0)
      var wts = Array.fill(dim + 1)(0.0) // w(0) = bias
      for (_ <- 1 to iters) {
        val wv = array(wts.drop(1).map(lit): _*)
        val margin = round(lit(wts(0)) + dot(col("v"), wv), 6)
        val p = round(lit(1.0) / (lit(1.0) + exp(-margin)), 9)
        val resid = cached.select(col("v"), (p - col("y")).as("r"))
        // Gradient rows: d = 0 is the bias (x ≡ 1), d = 1..dim the features.
        // Gradient sums are plain double — a DELIBERATE trade, measured:
        // per-term decimal accumulation (the labelCentroids discipline,
        // which WOULD make the sum order-independent) benched 1.7-3×
        // slower end-to-end on the three logreg queries at the sf0.1/sf1
        // probe, even with long-backed DECIMAL(18,12) terms, because the
        // cast runs per (row × dim). The residual risk it would buy out is
        // a double sum landing within ~1e-15 of a 9-decimal rounding
        // midpoint AND a partition-order change flipping the HALF_UP side
        // — see the probabilistic note on the determinism contract above.
        val grad = resid.select(col("r"),
            posexplode(concat(array(lit(1.0)), col("v"))).as(Seq("d", "x")))
          .groupBy("d").agg(round(sum(col("r") * col("x")) / count(lit(1)), 9).as("g"))
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
        // wd and lr·g both sit on the 1e-9 decimal grid, so the difference
        // does too (up to ~1e-17 binary error) — HALF_UP here recovers the
        // exact grid point every engine agrees on.
        wts = wts.zipWithIndex.map { case (wd, d) =>
          BigDecimal(wd - lr * grad(d)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
            .toDouble
        }
      }
      wts
    } finally cached.unpersist(blocking = false)
  }

  /** Two independent [[logregWeights]] fits — one per value of a binary
    * arm column — in ONE grouped pass per iteration: the per-row residual
    * picks its own arm's margin (identical round-6/round-9 arithmetic to
    * the single-arm path), and the gradient aggregation groups by
    * (arm, dim) so both arms' gradients come back in one dim×2-row
    * collect. Per-arm values are the SAME sums over the SAME rows as two
    * arm-filtered fits (the double-sum order caveat on [[logregWeights]]
    * applies unchanged), but the frame is cached once and each iteration
    * is one job instead of two — the T-learner (q_uplift_bands) trains
    * both arm models for half the fixed job cost. An absent arm keeps its
    * weights at zero (its gradients default to 0); an arm value OUTSIDE
    * {0,1} raises in-plan rather than silently scoring with arm 0. */
  def logregWeightsTwoArm(train: DataFrame, vecCol: String, yCol: String,
                          armCol: String, iters: Int = 3,
                          lr: Double = 1.0): Map[Double, Array[Double]] = {
    require(lr == math.rint(lr), s"lr must be integral to stay on the 9-decimal grid: $lr")
    val vd = col(vecCol).cast("array<double>")
    val cached = train.select(col(armCol).cast("double").as("t"),
        vd.as("v"), col(yCol).cast("double").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dim = cached.select(size(col("v"))).head().getInt(0)
      var wts = Map(0.0 -> Array.fill(dim + 1)(0.0),
        1.0 -> Array.fill(dim + 1)(0.0))
      for (_ <- 1 to iters) {
        def marginOf(arm: Double): Column = {
          val w = wts(arm)
          round(lit(w(0)) + dot(col("v"), array(w.drop(1).map(lit): _*)), 6)
        }
        // Arm values outside {0,1} fail LOUDLY (advisor, r16): a bare
        // `otherwise(marginOf(0.0))` scored such rows with arm-0's margin
        // while their gradients landed under their own arm key and were
        // silently dropped — diverging from two filtered fits with no
        // visible error. raise_error rides the existing per-row compute,
        // so the guard costs no extra job.
        val margin = when(col("t") === 1.0, marginOf(1.0))
          .when(col("t") === 0.0, marginOf(0.0))
          .otherwise(raise_error(concat(
            lit(s"logregWeightsTwoArm: $armCol must be in {0,1}; found "),
            col("t"))))
        val p = round(lit(1.0) / (lit(1.0) + exp(-margin)), 9)
        val resid = cached.select(col("t"), col("v"), (p - col("y")).as("r"))
        val grad = resid.select(col("t"), col("r"),
            posexplode(concat(array(lit(1.0)), col("v"))).as(Seq("d", "x")))
          .groupBy("t", "d")
          .agg(round(sum(col("r") * col("x")) / count(lit(1)), 9).as("g"))
          .collect()
          .map(r => (r.getDouble(0), r.getInt(1)) -> r.getDouble(2)).toMap
        wts = wts.map { case (arm, w) =>
          arm -> w.zipWithIndex.map { case (wd, d) =>
            BigDecimal(wd - lr * grad.getOrElse((arm, d), 0.0))
              .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
          }
        }
      }
      wts
    } finally cached.unpersist(blocking = false)
  }

  /** Predicted probability under trained weights, as a pure in-plan column
    * (margin→6, sigmoid→9 — the same pinned arithmetic training used).
    * Being a plain expression, it scores batch and STREAMING frames alike:
    * train offline with [[logregWeights]], score a live stream with this —
    * the model ships inside the plan, stateless per row. */
  def logregProb(wts: Array[Double], vec: Column): Column = {
    val wv = array(wts.drop(1).map(lit): _*)
    val margin = round(lit(wts(0)) + dot(vec.cast("array<double>"), wv), 6)
    round(lit(1.0) / (lit(1.0) + exp(-margin)), 9)
  }

  /** Binary quality-classifier evaluation: train on the training split
    * (positive = `positiveLabel`), score the held-out panel, report per-class
    * calibration — (y, n, mean_p, acc): class size, mean predicted
    * probability, and accuracy at the 0.5 threshold. The numbers a gating
    * decision actually reads (a well-calibrated quality model shows
    * mean_p(y=1) ≫ mean_p(y=0)). */
  def logregScore(df: DataFrame, idCol: String, vecCol: String,
                  labelCol: String, positiveLabel: Int, iters: Int = 3,
                  lr: Double = 1.0, cap: Long = 1000L): DataFrame = {
    val vd = col(vecCol).cast("array<double>")
    val v = df.select(col(idCol).as("vid"), vd.as("v"),
      when(col(labelCol) === positiveLabel, 1.0).otherwise(0.0).as("y"))
    val wts = logregWeights(v.filter(!isTestRow(col("vid"), cap)), "v", "y", iters, lr)
    calibration(v.filter(isTestRow(col("vid"), cap))
      .select(col("y"), logregProb(wts, col("v")).as("p")))
  }

  /** Per-class calibration rollup of a scored frame with columns (y, p):
    * (y, n, mean_p, acc). Works on batch and streaming frames (plain
    * grouped aggregation — streaming runs it in complete mode). */
  def calibration(scored: DataFrame): DataFrame =
    scored.select(col("y").cast("int").as("y"), col("p"))
      .groupBy("y")
      .agg(count(lit(1)).as("n"), round(avg("p"), 4).as("mean_p"),
        round(avg(when((col("p") >= 0.5) === (col("y") === 1), 1.0)
          .otherwise(0.0)), 4).as("acc"))
      .orderBy("y")

  /** Supervised tier 6 — multinomial Naive Bayes over raw-text bag-of-words
    * with add-1 smoothing, the classic generative counterpart to the
    * discriminative [[logregScore]] gate (and the standard first model for
    * language/domain routing because training IS counting). Split follows
    * [[isTestRow]]; the model is three aggregates of the training half:
    * per-(class, token) occurrence counts, per-class doc/token totals, and
    * the train vocabulary size. Scoring a held-out doc is the log-space sum
    *   score(d, c) = ln(docs_c/docs_all) + Σ_t ln(n_ct + 1) − N_d·ln(toks_c + V)
    * over its token OCCURRENCES (the Σ re-association keeps every unseen
    * token's ln(0+1) = 0 term implicit in the left join), argmax per doc.
    *
    * Determinism: every ln input is a ratio/sum of exact integers, so both
    * engines feed libm identical doubles; the per-doc Σ is a double sum over
    * ~doc-length terms snapped with round(·,6) before the argmax, and ties
    * break on the class key ascending (the langId discipline).
    *
    * 100 TB shape: training is two grouped scans plus a distinct — all
    * map-side-combinable on (class, token) keys; the held-out panel is
    * bounded by `cap`, so the scoring grid (panel tokens × |classes|) joins
    * the vocab-sized count table on the token key and never scales with the
    * corpus. Output: confusion matrix (actual, predicted, n). */
  def naiveBayes(df: DataFrame, idCol: String, textCol: String,
                 labelCol: String, cap: Long = 1000L): DataFrame = {
    val toks = df.select(col(idCol).as("id"), col(labelCol).as("lbl"),
      explode(TextStats.tokens(col(textCol))).as("tok"))
    val test = toks.filter(isTestRow(col("id"), cap))
    val train = toks.filter(!isTestRow(col("id"), cap))
    val counts = train.groupBy(col("lbl").as("cls"), col("tok"))
      .agg(count(lit(1)).as("ct"))
    val classes = train.groupBy(col("lbl").as("cls"))
      .agg(countDistinct("id").as("docs_c"), count(lit(1)).as("toks_c"))
    val totals = train.agg(countDistinct("id").as("docs_all"),
      countDistinct("tok").as("vocab"))
    val scored = test.select(col("id"), col("lbl").as("actual"), col("tok"))
      .crossJoin(broadcast(classes))
      .join(counts, Seq("cls", "tok"), "left")
      .groupBy(col("id"), col("actual"), col("cls"),
        col("docs_c"), col("toks_c"))
      .agg(count(lit(1)).as("n_d"),
        sum(log(coalesce(col("ct"), lit(0L)) + 1)).as("sl"))
      .crossJoin(broadcast(totals))
      .select(col("id"), col("actual"), col("cls"),
        round(log(col("docs_c") / col("docs_all")) + col("sl")
          - col("n_d") * log(col("toks_c") + col("vocab")), 6).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("score").desc, col("cls"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("actual"), col("cls").as("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy("actual", "predicted")
  }

  /** Leave-one-SOURCE-out data valuation (the ablation a curation decision
    * actually needs: "which ingest source helps, which hurts?"): for every
    * training source, score the held-out evaluation split under the
    * nearest-centroid model trained WITHOUT that source, beside the
    * full-pool model — delta = acc_without − acc_full, so a NEGATIVE delta
    * means the source was pulling its weight and a positive one means the
    * model is better off without it.
    *
    * The cvCentroid economics, re-keyed from folds to sources: ONE pool
    * scan builds per-(source, label, dim) exact-DECIMAL sufficient
    * statistics; every leave-source-out centroid is algebra over them —
    * (total − source sums) / (total − source count), never a re-scan per
    * source — and the evaluation panel joins the broadcast (models ×
    * labels) centroid table once. Degenerate guard: a label living
    * entirely inside one source yields no centroid for that source's LSO
    * model (tn − n = 0 filtered, the cvCentroid rule). Determinism:
    * round-9 centroids, left-to-right d² folds, min-of-struct (d2, label)
    * argmin with ties to the smaller label, round-4 accuracies — the
    * oracle restates every step.
    *
    * Output: per model ('all' + one per source) — n_train, n_eval,
    * n_correct, accuracy, delta vs 'all'. */
  def sourceAblation(df: DataFrame, sourceCol: String, labelCol: String,
                     vecCol: String, evalSource: String): DataFrame = {
    // Materialize the featurized frame ONCE: the caller's vector column is
    // typically an expensive per-row featurizer (hashedTf over raw text),
    // and pool/eval/stats/count each re-enter this frame — uncheckpointed,
    // the featurization re-ran per branch (measured 8.9s -> 2.4s at sf0.1).
    val base = df.select(col(sourceCol).as("src"),
      col(labelCol).cast("string").as("lbl"),
      col(vecCol).cast("array<double>").as("v"))
      .localCheckpoint(eager = true)
    val pool = base.filter(col("src") =!= evalSource)
    val ev = base.filter(col("src") === evalSource)
      .select(monotonically_increasing_id().as("vid"),
        col("lbl").as("actual"), col("v"))
    // sources x labels x dims rows — model-sized; feeds totals AND the
    // per-source subtraction, so materialize once too.
    val pf = pool.select(col("src"), col("lbl"),
        posexplode(col("v")).as(Seq("d", "x")))
      .groupBy("src", "lbl", "d")
      .agg(sum(col("x").cast("decimal(28,12)")).as("sx"),
        count(lit(1)).as("n"))
      .localCheckpoint(eager = true)
    val tt = pf.groupBy("lbl", "d").agg(sum("sx").as("tx"), sum("n").as("tn"))
    val mfull = tt.select(lit("all").as("model"), col("lbl"), col("d"),
      round(col("tx").cast("double") / col("tn"), 9).as("c"))
    val mlso = pool.select("src").distinct().crossJoin(tt)
      .join(pf, Seq("src", "lbl", "d"), "left")
      .filter(col("tn") - coalesce(col("n"), lit(0L)) > 0)
      .select(col("src").as("model"), col("lbl"), col("d"),
        round((col("tx") - coalesce(col("sx"), lit(0).cast("decimal(28,12)")))
          .cast("double") /
          (col("tn") - coalesce(col("n"), lit(0L))), 9).as("c"))
    val cents = mfull.unionAll(mlso)
      .groupBy(col("model"), col("lbl").as("cand"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("c")))),
        s => s.getField("c")).as("cv"))
    val sc = ev.join(broadcast(cents))
      .select(col("model"), col("vid"), col("actual"), col("cand"),
        graft.functions.ArrayKernels.sqDist(col("v"), col("cv")).as("d2"))
    val acc = sc.groupBy("model", "vid", "actual")
      .agg(min(struct(col("d2"), col("cand"))).as("m"))
      .groupBy("model")
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("m.cand") === col("actual"), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("accuracy",
        round(col("n_correct").cast("double") / col("n_eval"), 4))
    val nt = pool.count() // scalar action: pool size only
    val spark = df.sparkSession
    import spark.implicits._
    val ntr = pool.groupBy("src").agg(count(lit(1)).as("ns"))
      .select(col("src").as("model"), (lit(nt) - col("ns")).as("n_train"))
      .unionAll(Seq(("all", nt)).toDF("model", "n_train"))
    val fullAcc = acc.filter(col("model") === "all")
      .select(col("accuracy").as("af"))
    acc.join(ntr, "model").crossJoin(broadcast(fullAcc))
      .select(col("model"), col("n_train"), col("n_eval"), col("n_correct"),
        col("accuracy"), round(col("accuracy") - col("af"), 4).as("delta"))
      .orderBy("model")
  }

  /** EXACT Data Shapley at SOURCE granularity (Ghorbani & Zou 2019, done
    * exactly rather than by Monte Carlo — feasible because the players are
    * ingest sources, not rows): the Shapley value of source i is its
    * average marginal accuracy contribution over all coalitions,
    * φ_i = Σ_{S ⊆ N∖{i}} |S|!(n−1−|S|)!/n! · (v(S∪{i}) − v(S)), with
    * v(S) = held-out accuracy of the centroid model trained on S and
    * v(∅) = 0. The [[sourceAblation]] marginal (leave-one-out delta) is
    * just ONE of these terms; Shapley is the principled attribution that
    * satisfies efficiency — Σ φ_i = v(N) — which the spec asserts.
    *
    * 100 TB shape: the corpus is scanned ONCE for per-(source, label, dim)
    * exact-DECIMAL sufficient statistics; every one of the 2ⁿ−1 coalition
    * models is addition over that model-sized frame (a tiny broadcast-
    * mapped explode, never a re-scan), and the eval panel joins one
    * broadcast (coalitions × labels) centroid table. Exponential only in
    * the SOURCE count — the number a pipeline actually has (4–20), never
    * the row count.
    *
    * Determinism: round-9 centroids, (d2, label) argmin, round-4 coalition
    * accuracies; the Shapley fold runs in EXACT INTEGERS — accuracies
    * scale by 10⁴, weights by n! (s!(n−1−s)! each) — so the sum is
    * order-free and φ = round(scaled / (n!·10⁴), 6) is bit-identical in
    * any engine.
    *
    * PLAYER BOUNDING: cost is 2^players, so when the corpus has more than
    * `maxPlayers` sources, the top maxPlayers−1 by (doc count, name)
    * stay singleton players and the tail lumps into one '__rest__' player
    * — exact group-Shapley at that granularity (the q_knn_join
    * bounded-panel rule applied to game players; 19 raw sources would be
    * 2^19 coalition models). Output: (source, n_docs, solo_acc,
    * shapley) per player. */
  def sourceShapley(df: DataFrame, sourceCol: String, labelCol: String,
                    vecCol: String, evalSource: String,
                    maxPlayers: Int = 6): DataFrame = {
    val base = df.select(col(sourceCol).as("rawsrc"),
      col(labelCol).cast("string").as("lbl"),
      col(vecCol).cast("array<double>").as("v"))
      .localCheckpoint(eager = true) // the sourceAblation featurizer rule
    val rawPool = base.filter(col("rawsrc") =!= evalSource)
    val srcCounts = rawPool.groupBy("rawsrc").agg(count(lit(1)).as("nd"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val singles: Set[String] =
      if (srcCounts.length <= maxPlayers) srcCounts.map(_._1).toSet
      else srcCounts.sortBy { case (src, nd) => (-nd, src) }
        .take(maxPlayers - 1).map(_._1).toSet
    val pool = rawPool.withColumn("src",
      when(col("rawsrc").isin(singles.toSeq: _*), col("rawsrc"))
        .otherwise(lit("__rest__")))
    val ev = base.filter(col("rawsrc") === evalSource)
      .select(monotonically_increasing_id().as("vid"),
        col("lbl").as("actual"), col("v"))
    val pf = pool.select(col("src"), col("lbl"),
        posexplode(col("v")).as(Seq("d", "x")))
      .groupBy("src", "lbl", "d")
      .agg(sum(col("x").cast("decimal(28,12)")).as("sx"),
        count(lit(1)).as("n"))
      .localCheckpoint(eager = true)
    val spark = df.sparkSession
    import spark.implicits._
    val srcs = pf.select("src").distinct().orderBy("src")
      .collect().map(_.getString(0)) // player list: bounded by maxPlayers
    val nSrc = srcs.length
    require(nSrc >= 1 && nSrc <= 20, s"sourceShapley: $nSrc players")
    // src → every coalition id containing it (n·2^(n−1) rows — tiny).
    val cmap = srcs.zipWithIndex.flatMap { case (s, i) =>
      (1 until (1 << nSrc)).filter(c => ((c >> i) & 1) == 1).map(c => (s, c))
    }.toSeq.toDF("src", "cid")
    val cstats = pf.join(broadcast(cmap), "src")
      .groupBy("cid", "lbl", "d")
      .agg(sum("sx").as("sx"), sum("n").as("n"))
      .select(col("cid"), col("lbl"), col("d"),
        round(col("sx").cast("double") / col("n"), 9).as("c"))
    val cents = cstats.groupBy(col("cid"), col("lbl").as("cand"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("c")))),
        s => s.getField("c")).as("cv"))
    val accs = ev.join(broadcast(cents))
      .select(col("cid"), col("vid"), col("actual"), col("cand"),
        graft.functions.ArrayKernels.sqDist(col("v"), col("cv")).as("d2"))
      .groupBy("cid", "vid", "actual")
      .agg(min(struct(col("d2"), col("cand"))).as("m"))
      .groupBy("cid")
      .agg(round(sum(when(col("m.cand") === col("actual"), 1L).otherwise(0L))
        .cast("double") / count(lit(1)), 4).as("acc"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // Exact-integer Shapley fold (order-free; v(∅) = 0).
    def fact(k: Int): Long = (1 to k).foldLeft(1L)(_ * _)
    def accScaled(cid: Int): Long =
      math.round(accs.getOrElse(cid, 0.0) * 1e4)
    val poolCounts = pool.groupBy("src").agg(count(lit(1)).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = srcs.zipWithIndex.map { case (s, i) =>
      val bit = 1 << i
      // BigInt accumulation: the summed weights reach n!·10⁴, which
      // overflows Long from n = 19 players — negligible cost next to the
      // 2ⁿ coalition-model evaluations.
      val phiScaled = (0 until (1 << nSrc)).filter(c => (c & bit) == 0)
        .map { cS =>
          val sz = Integer.bitCount(cS)
          BigInt(fact(sz)) * BigInt(fact(nSrc - 1 - sz)) *
            BigInt(accScaled(cS | bit) - accScaled(cS))
        }.sum
      val phi = BigDecimal(phiScaled) /
        (BigDecimal(fact(nSrc)) * BigDecimal(10000))
      (s, poolCounts(s), accs.getOrElse(1 << i, 0.0),
        phi.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    out.toSeq.toDF("source", "n_docs", "solo_acc", "shapley")
      .orderBy("source")
  }
}
