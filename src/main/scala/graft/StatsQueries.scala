package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{Catalog, Checks, Ops, Sinks}
import graft.llm.{Bpe, Classify, Dedup, Pq, Similarity, Spectral, TextStats, Unigram}
import graft.multimodal.Multimodal
import graft.streaming.EventStreams
import SparkEntry.cat

/** Statistics / causal-inference / forecasting / ML-evaluation tier of the
  * driver surface, extracted verbatim from [[SparkEntry]] (round 13 —
  * same keys, same closures, zero behavior change; the matching oracle SQL
  * stays in [[OracleSql]]). Covers the AB-test family (lift, power, SRM,
  * sequential, CUPED, DiD), the causal estimators (IPW/AIPW/CATE/uplift),
  * classical tests (chi-square, Welch, Mann-Whitney, KS, trend), model
  * evaluation (AUC, calibration, conformal, rank metrics), tree/markov/
  * shapley attribution, and the Holt/Holt-Winters forecast family. */
object StatsQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_kaplan_meier" -> ((s, dir) => {
      // Kaplan–Meier product-limit estimate of the user WAITING TIME —
      // hours until the same user's next event — right-censored at the
      // corpus horizon (every user's final event has no successor; dropping
      // those rows instead of censoring them is exactly the bias KM
      // exists to correct). Corpus-sized work is one lag/lead pass
      // partitioned by user; the KM table itself is distinct-gap-sized
      // (≤ corpus-span hours), so the unpartitioned product-limit windows
      // are bounded-frame. The cumulative product rides exp∘sum∘ln with a
      // zero-factor guard (ln(0) is null in Spark, an error in DuckDB —
      // the flag keeps both engines exact).
      val wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val ev = cat(s, dir).events.select(col("user_id"), col("ts"), col("event_id"))
      val maxTs = ev.agg(max("ts").as("max_ts"))
      val obs = ev
        .withColumn("nxt", lead("ts", 1).over(wu))
        .crossJoin(broadcast(maxTs))
        .select(
          expr("(unix_micros(coalesce(nxt, max_ts)) - unix_micros(ts)) div 3600000000")
            .cast("int").as("t"),
          col("nxt").isNotNull.cast("int").as("churned"))
      val byT = obs.groupBy("t").agg(
        sum("churned").as("d"), sum(expr("1 - churned")).as("c"))
      val wPrev = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wCum = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      byT
        .withColumn("n_risk",
          sum(col("d") + col("c")).over(wAll) -
            coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
        .withColumn("factor", lit(1.0) - col("d") / col("n_risk"))
        .withColumn("zf",
          max(when(col("factor") === 0, 1).otherwise(0)).over(wCum))
        .withColumn("lnsum",
          sum(log(when(col("factor") === 0, 1.0).otherwise(col("factor"))))
            .over(wCum))
        .select(col("t"), col("n_risk"), col("d"), col("c"),
          when(col("zf") === 1, 0.0)
            .otherwise(round(exp(col("lnsum")), 6)).as("surv"))
        .orderBy("t")
    }),
    "q_trend_test" -> ((s, dir) => {
      // Robust trend detection per event type: Theil–Sen slope (median of
      // all pairwise daily-volume slopes — outlier-immune where OLS is
      // not) plus the Mann–Kendall S statistic with tie-corrected variance
      // and the continuity-corrected z — the standard nonparametric "is
      // volume really trending" monitor. The corpus-sized work is one
      // daily groupBy; pairs form over the AGGREGATED calendar table
      // (days², not rows²), the same bounded-panel economics as
      // q_anomaly_days.
      val daily = cat(s, dir).events
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
      val pairs = daily.as("a").join(daily.as("b"),
          col("a.event_type") === col("b.event_type") && col("a.d") < col("b.d"))
        .select(col("a.event_type").as("event_type"),
          ((col("b.n") - col("a.n")).cast("double") /
            datediff(col("b.d"), col("a.d"))).as("slope"),
          signum((col("b.n") - col("a.n")).cast("double")).as("sg"))
      val base = pairs.groupBy("event_type")
        .agg(expr("percentile(slope, 0.5)").as("sen"),
          sum(col("sg")).cast("bigint").as("s_stat"))
      // Tie-corrected MK variance: n(n−1)(2n+5)/18 − Σ_t t(t−1)(2t+5)/18
      // over tie groups of the daily values.
      val ties = daily.groupBy("event_type", "n").agg(count(lit(1)).as("t"))
        .groupBy("event_type")
        .agg(count(lit(1)).cast("double").as("_ng"),
          sum(col("t")).cast("double").as("nd"),
          sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
            .cast("double").as("tsum"))
        .select(col("event_type"), col("nd"),
          ((col("nd") * (col("nd") - 1) * (lit(2) * col("nd") + 5) - col("tsum"))
            / 18.0).as("var_s"))
      base.join(ties, Seq("event_type"))
        .select(col("event_type"), col("nd").cast("bigint").as("n_days"),
          round(col("sen"), 6).as("sen_slope"), col("s_stat"),
          round(col("var_s"), 4).as("var_s"),
          round((col("s_stat") - signum(col("s_stat").cast("double")))
            / sqrt(col("var_s")), 4).as("z"))
        .orderBy("event_type")
    }),
    "q_autocorr" -> ((s, dir) => {
      // Autocorrelation of each event type's daily-volume series at lags
      // 1-3 — the seasonality probe behind "is this weekly-periodic"
      // monitoring. Pearson r is computed from EXACT integer co-moments
      // (daily counts are integers, so Σx Σy Σxy Σx² Σy² are LongType
      // sums both engines evaluate exactly); the only float ops are the
      // final closed form — zero accumulation-order risk at any scale,
      // unlike a native corr() whose one-pass co-moments drift with
      // partition order. One shuffle for the daily rollup, one narrow
      // window pass for the lags, one partial-agg'd shuffle for the
      // moments: days-sized frames throughout.
      val daily = cat(s, dir).events
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("d")
      val lagged = daily.select(col("event_type"), col("n"),
        lag("n", 1).over(w).as("l1"), lag("n", 2).over(w).as("l2"),
        lag("n", 3).over(w).as("l3"))
      val stacked = lagged.selectExpr("event_type",
        "stack(3, 1L, n, l1, 2L, n, l2, 3L, n, l3) AS (lag, x, y)")
        .filter(col("y").isNotNull)
      stacked.groupBy("event_type", "lag")
        .agg(count(lit(1)).as("k"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("event_type"), col("lag"), col("k").as("n_pairs"),
          round((col("k") * col("sxy") - col("sx") * col("sy")).cast("double")
            / sqrt((col("k") * col("sxx") - col("sx") * col("sx")).cast("double")
              * (col("k") * col("syy") - col("sy") * col("sy")).cast("double")),
            6).as("acf"))
        .orderBy("event_type", "lag")
    }),
    "q_auc" -> ((s, dir) => {
      // Model-evaluation tier: exact tie-corrected AUC (the Mann–Whitney
      // rank statistic), Gini = 2·AUC−1, and the KS statistic (max CDF
      // gap over score thresholds) for a scorer against the embeddings
      // labels (positive = label 0, the logreg convention). Ranks are
      // NEVER materialized per row: group by distinct score once, then
      // cumulative window sums over the SCORE-LEVEL frame (bounded by
      // score granularity, not corpus size) — average-rank tie handling
      // falls out as cnt_less + (cnt+1)/2 per level. All counts are exact
      // integers; halves are exact in binary doubles, so both engines
      // land on identical statistics before any rounding.
      val scored = cat(s, dir).embeddings
        .select(round(element_at(col("embedding"), 1).cast("double"), 2).as("sc"),
          (col("label") === 0).cast("long").as("y"))
      val levels = scored.groupBy("sc")
        .agg(count(lit(1)).as("cnt"), sum("y").as("pos"))
      val w = Window.orderBy("sc").rowsBetween(Window.unboundedPreceding, -1)
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val cum = levels.select(col("cnt"), col("pos"),
        coalesce(sum("cnt").over(w), lit(0L)).as("cless"),
        coalesce(sum("pos").over(w), lit(0L)).as("pless"),
        sum("pos").over(wAll).as("n1"),
        (sum("cnt").over(wAll) - sum("pos").over(wAll)).as("n0"))
      cum.groupBy("n1", "n0") // constants: a 1-row "group" keying the totals
        .agg(sum(col("pos").cast("double") *
            (col("cless").cast("double") + (col("cnt") + 1).cast("double") / 2.0))
            .as("spr"),
          max(abs((col("pless") + col("pos")).cast("double") / col("n1").cast("double")
            - ((col("cless") + col("cnt")) - (col("pless") + col("pos"))).cast("double")
              / col("n0").cast("double"))).as("ks_raw"))
        .select(col("n1"), col("n0"),
          round((col("spr") - col("n1").cast("double")
              * (col("n1") + 1).cast("double") / 2.0)
            / (col("n1").cast("double") * col("n0").cast("double")), 6).as("auc"),
          round(lit(2.0) * (col("spr") - col("n1").cast("double")
              * (col("n1") + 1).cast("double") / 2.0)
            / (col("n1").cast("double") * col("n0").cast("double")) - 1.0, 6)
            .as("gini"),
          round(col("ks_raw"), 6).as("ks"))
    }),
    "q_ab_sequential" -> ((s, dir) => {
      // Always-valid sequential monitoring (Johari et al., "Peeking at
      // A/B Tests"): the mixture SPRT over DAILY cumulative (trials,
      // conversions) per hash arm — the statistic an experimentation
      // platform recomputes at every peek without an alpha-spending
      // schedule. Corpus work is ONE day×arm grouped aggregation to exact
      // integers; the mSPRT closed form (two-proportion normal
      // approximation, mixture variance τ²=0.01) evaluates on the bounded
      // day frame with the exp argument snapped to 6 decimals (the logreg
      // identical-exp-input discipline) and Λ to 6; the always-valid
      // p-value is the running min of 1/Λ clamped at 1 — every window
      // here sees the calendar-bounded day grid, never the corpus.
      import s.implicits._
      val daily = cat(s, dir).events
        .select(to_date(col("ts")).as("day"), (col("user_id") % 2).as("arm"),
          (col("event_type") === "purchase" && col("value") >= 150)
            .cast("long").as("conv"))
        .groupBy("day", "arm").agg(count(lit(1)).as("n"), sum("conv").as("x"))
      val grid = daily.select("day").distinct()
        .crossJoin(Seq(0L, 1L).toDF("arm"))
      val filled = grid.join(daily, Seq("day", "arm"), "left")
        .select(col("day"), col("arm"), coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("x"), lit(0L)).as("x"))
      val wc = Window.partitionBy("arm").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      val piv = filled
        .withColumn("cn", sum("n").over(wc)).withColumn("cx", sum("x").over(wc))
        .groupBy("day")
        .agg(max(when(col("arm") === 0, col("cn"))).as("n_c"),
          max(when(col("arm") === 0, col("cx"))).as("x_c"),
          max(when(col("arm") === 1, col("cn"))).as("n_t"),
          max(when(col("arm") === 1, col("cx"))).as("x_t"))
        .filter(col("n_c") > 0 && col("n_t") > 0 &&
          col("x_c") + col("x_t") > 0 &&
          col("x_c") + col("x_t") < col("n_c") + col("n_t"))
      val nc = col("n_c").cast("double"); val nt = col("n_t").cast("double")
      val delta = col("x_t").cast("double") / nt -
        col("x_c").cast("double") / nc
      val pp = (col("x_c") + col("x_t")).cast("double") /
        (col("n_c") + col("n_t")).cast("double")
      val q = piv.withColumn("delta_u", delta)
        .withColumn("vn", pp * (lit(1.0) - pp) * (lit(1.0) / nc + lit(1.0) / nt))
      val arg = round(col("delta_u") * col("delta_u") * lit(0.01) /
        (col("vn") * lit(2.0) * (col("vn") + lit(0.01))), 6)
      val lam = q.withColumn("lambda",
        round(sqrt(col("vn") / (col("vn") + lit(0.01))) * exp(arg), 6))
      val wm = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
      lam.select(col("day"), col("n_c"), col("x_c"), col("n_t"), col("x_t"),
          round(col("delta_u"), 6).as("delta"), col("lambda"),
          round(least(lit(1.0), min(lit(1.0) / col("lambda")).over(wm)), 6)
            .as("always_valid_p"))
        .orderBy("day")
    }),
    "q_decayed_counts" -> ((s, dir) => {
      // Freshness-weighted event counts: each (type, day) cell weighted by
      // a 7-day half-life decay from the corpus's last day — the recency
      // prior a trending/mixing decision applies before comparing sources
      // of different ages. The corpus collapses to the bounded day×type
      // grid FIRST (one grouped scan, exact integers); the decay weight
      // pow(0.5, age/7) — a double, identical in both engines for the
      // same integer age — snaps to 6 decimals and multiplies as EXACT
      // DECIMAL against the integer counts, so the weighted sum is
      // order-independent (the kmeans decimal discipline applied to a
      // decayed aggregate).
      val daily = cat(s, dir).events
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val mx = daily.agg(max("day")).head().getDate(0)
      val aged = daily.withColumn("age", datediff(lit(mx), col("day")))
        .withColumn("w", round(pow(lit(0.5), col("age").cast("double") / 7.0), 6)
          .cast("decimal(18,6)"))
      aged.groupBy("event_type")
        .agg(sum("n").as("raw_count"),
          round(sum(col("w") * col("n")).cast("double"), 4).as("decayed_count"))
        .orderBy("event_type")
    }),
    "q_ab_lift" -> ((s, dir) => {
      // A/B incrementality readout: deterministic hash arms (user_id
      // parity — the reproducible assignment a real experiment ships),
      // outcome = user ever made a HIGH-VALUE purchase (value >= 150,
      // ~45% of users at every SF — a plain "ever purchased" outcome is
      // degenerate here: every synthetic user purchases, pooling p to 1
      // and dividing z by zero), then conversion rates, absolute lift,
      // and the pooled two-proportion z statistic — the go/no-go
      // numbers an experimentation pipeline emits. Everything reduces to
      // FOUR exact integers (users and converters per arm) from one
      // grouped scan; the closed forms after that are deterministic.
      val perUser = cat(s, dir).events
        .groupBy(col("user_id"))
        .agg(max((col("event_type") === "purchase" && col("value") >= 150)
          .cast("long")).as("conv"))
        .select((col("user_id") % 2).as("arm"), col("conv"))
      val arms = perUser.groupBy("arm")
        .agg(count(lit(1)).as("n"), sum("conv").as("c"))
      val a = arms.filter(col("arm") === 0).select(
        col("n").as("n_a"), col("c").as("conv_a"))
      val b = arms.filter(col("arm") === 1).select(
        col("n").as("n_b"), col("c").as("conv_b"))
      val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
      val ca = col("conv_a").cast("double"); val cb = col("conv_b").cast("double")
      val pPool = (ca + cb) / (na + nb)
      a.crossJoin(broadcast(b)) // two 1-row frames
        .select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
          round(ca / na, 6).as("rate_a"), round(cb / nb, 6).as("rate_b"),
          round(cb / nb - ca / na, 6).as("abs_lift"),
          round((cb / nb - ca / na)
            / sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / na + lit(1.0) / nb)),
            4).as("z"))
    }),
    "q_seasonal_dow" -> ((s, dir) => {
      // Additive day-of-week seasonal decomposition of the daily volume
      // series: trend = centered 7-day moving average (complete windows
      // only), seasonal index per ISO weekday = mean of the detrended
      // series. The mean is algebraically re-associated so every
      // accumulation stays in EXACT integer arithmetic — Σ(n − s7/7) =
      // Σn − Σs7/7 with Σn and Σs7 LongType sums — and floats appear
      // only in the final closed form, the q_autocorr discipline.
      val daily = cat(s, dir).events
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
      val w7 = Window.partitionBy("event_type").orderBy("d").rowsBetween(-3, 3)
      val windowed = daily.select(col("event_type"),
          (weekday(col("d")) + 1).cast("long").as("dow"), col("n"),
          sum("n").over(w7).as("s7"), count(lit(1)).over(w7).as("c7"))
        .filter(col("c7") === 7) // complete centered weeks only
      windowed.groupBy("event_type", "dow")
        .agg(count(lit(1)).as("k_days"), sum("n").as("sn"), sum("s7").as("ss7"))
        .select(col("event_type"), col("dow"), col("k_days"),
          round((col("sn").cast("double") - col("ss7").cast("double") / 7.0)
            / col("k_days").cast("double"), 4).as("seasonal"))
        .orderBy("event_type", "dow")
    }),
    "q_naive_bayes" -> ((s, dir) => {
      // Supervised tier 6 — multinomial Naive Bayes language router over
      // raw-text bag-of-words (training IS counting: two grouped scans +
      // a distinct, all map-side combinable; the held-out panel is
      // cap-bounded so the scoring grid never scales with the corpus).
      // Every ln input is a ratio of exact integers, per-doc log-sums snap
      // to 6 decimals before the argmax, ties break on the class key —
      // the whole trajectory is DuckDB-oracle-checked. See
      // Classify.naiveBayes for the full determinism/scale contract.
      Classify.naiveBayes(cat(s, dir).documents, "doc_id", "text", "lang")
    }),
    "q_ols_multi" -> ((s, dir) => {
      // Two-feature OLS by the normal equations — value ~ hour-of-day +
      // ISO weekday, per event type. The Gram matrix arrives as ONE
      // grouped scan of raw moments (the integer feature sums are exact
      // BIGINT; only the y cross-moments are double), then Cramer's rule
      // solves the centered 2×2 system in the projection — the d²-moment
      // one-pass pattern that is the whole scale story for linear models:
      // nothing but d(d+3)/2 numbers per group ever leaves the scan.
      val e = cat(s, dir).events.select(col("event_type"),
        hour(col("ts")).cast("long").as("x1"),
        (weekday(to_date(col("ts"))) + 1).cast("long").as("x2"),
        col("value").as("y"))
      val m = e.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum("x1").as("s1"), sum("x2").as("s2"),
        sum(col("x1") * col("x1")).as("s11"),
        sum(col("x2") * col("x2")).as("s22"),
        sum(col("x1") * col("x2")).as("s12"),
        sum("y").as("sy"),
        sum(col("x1") * col("y")).as("s1y"),
        sum(col("x2") * col("y")).as("s2y"),
        sum(col("y") * col("y")).as("syy"))
      val nd = col("n").cast("double")
      def d(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        c.cast("double")
      val c11 = d(col("s11")) - d(col("s1")) * d(col("s1")) / nd
      val c22 = d(col("s22")) - d(col("s2")) * d(col("s2")) / nd
      val c12 = d(col("s12")) - d(col("s1")) * d(col("s2")) / nd
      val c1y = col("s1y") - d(col("s1")) * col("sy") / nd
      val c2y = col("s2y") - d(col("s2")) * col("sy") / nd
      val cyy = col("syy") - col("sy") * col("sy") / nd
      val det = c11 * c22 - c12 * c12
      val b1 = (c1y * c22 - c2y * c12) / det
      val b2 = (c2y * c11 - c1y * c12) / det
      m.select(col("event_type"), col("n"),
          round(col("sy") / nd - b1 * d(col("s1")) / nd
            - b2 * d(col("s2")) / nd, 4).as("b0"),
          round(b1, 4).as("b1"), round(b2, 4).as("b2"),
          round((b1 * c1y + b2 * c2y) / cyy, 6).as("r2"))
        .orderBy("event_type")
    }),
    "q_pareto_front" -> ((s, dir) => {
      // Skyline (Pareto-frontier) selection — the data-curation question
      // "which docs are undominated on (length, lexical diversity)?" asked
      // exactly: doc r survives iff no doc beats it weakly on both axes
      // and strictly on one. Spark-first shape: the divide-and-conquer
      // skyline — a LOCAL frontier pass windowed inside each id-bucket
      // (anything locally dominated is globally dominated, so pruning is
      // safe), then the GLOBAL pass over the tiny candidate set; the
      // single-partition window only ever sees local survivors, which is
      // what makes the operator hold at 100 TB. The 2-D frontier filter
      // itself is one sorted window: survive iff ttr strictly beats the
      // running max over strictly-longer docs AND attains the max within
      // its own length. All comparisons are IEEE-exact: ttr is a ratio of
      // small ints, so distinct rationals differ by ≥1e-6 ≫ the 1e-16
      // division error, and equal rationals divide to identical doubles.
      val t = TextStats.tokens(col("text"))
      val base = cat(s, dir).documents.select(col("doc_id"),
          size(t).cast("long").as("n_tok"),
          size(array_distinct(t)).cast("long").as("n_dist"))
        .withColumn("ttr",
          col("n_dist").cast("double") / col("n_tok").cast("double"))
      def frontier(df: DataFrame, part: Seq[String]): DataFrame = {
        val wGt = Window.partitionBy(part.map(col): _*)
          .orderBy(col("n_tok").desc)
          .rangeBetween(Window.unboundedPreceding, -1)
        val wEq = Window.partitionBy((part :+ "n_tok").map(col): _*)
        df.withColumn("mgt", max("ttr").over(wGt))
          .withColumn("meq", max("ttr").over(wEq))
          .filter((col("mgt").isNull || col("ttr") > col("mgt"))
            && col("ttr") === col("meq"))
          .drop("mgt", "meq")
      }
      val local = frontier(base.withColumn("b", col("doc_id") % 32), Seq("b"))
      frontier(local.drop("b"), Seq.empty)
        .select(col("doc_id"), col("n_tok"), col("n_dist"),
          round(col("ttr"), 6).as("ttr"))
        .orderBy("doc_id")
    }),
    "q_calibration" -> ((s, dir) => {
      // Reliability diagram for a [0,1] quality score used as P(en): decile
      // bins of predicted confidence vs empirical positive rate, plus the
      // per-bin |conf − acc| gap (the rows a spec sums into ECE). This is
      // the audit that decides whether a score can gate by THRESHOLD
      // rather than merely rank — q_logreg_quality's lesson
      // institutionalized for any scorer. One pruned scan + one 10-group
      // aggregate; the score is a ratio of small exact ints so binning is
      // bit-identical across engines.
      val p = least(TextStats.stopRatio(col("text")) * 2.5, lit(1.0))
      cat(s, dir).documents
        .select((col("lang") === "en").cast("long").as("y"), p.as("p"))
        .groupBy(least(floor(col("p") * 10), lit(9.0)).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"), round(avg("p"), 6).as("conf"),
          round(avg(col("y").cast("double")), 6).as("acc"),
          round(abs(avg(col("p")) - avg(col("y").cast("double"))), 6).as("gap"))
        .orderBy("bin")
    }),
    "q_conformal" -> ((s, dir) => {
      // Split-conformal prediction sets for the binary en/non-en gate:
      // calibrate the nonconformity threshold on one bounded panel,
      // evaluate marginal coverage on a DISJOINT panel. The panels are
      // md5-prefix buckets (the q_sample_hash portable-hash idiom), NOT
      // id-mod buckets — the generator assigns source = src(doc_id % 20),
      // so any mod-k split aliases with source and silently breaks the
      // exchangeability the coverage guarantee needs (measured: a mod-5
      // split reads 0.81–0.94 across panels; hash panels restore it). q̂
      // is the ⌈0.9(n+1)⌉-th smallest nonconformity score — the rank is
      // computed in exact integer arithmetic ((9(n+1)+9) DIV 10; a float
      // ceil can land off-by-one when 0.9(n+1) sits just above an
      // integer) — and every downstream comparison reuses the identical
      // doubles, so the whole readout is deterministic. Scale shape: both
      // panels are cap-bounded, the corpus scan is pruned to them, and q̂
      // broadcasts; nothing scales with corpus size.
      val p = least(TextStats.stopRatio(col("text")) * 2.5, lit(1.0))
      val hx = substring(md5(col("doc_id").cast("string")), 1, 1)
      val base = cat(s, dir).documents.select(col("doc_id"), hx.as("hx"),
        (col("lang") === "en").as("is_en"), p.as("p"))
      val calib = base
        .filter(col("hx").isin("0", "1", "2") && col("doc_id") < 1000)
        .select(when(col("is_en"), lit(1.0) - col("p"))
          .otherwise(col("p")).as("a"))
      val nk = calib.agg(count(lit(1)).as("n_calib"),
        expr("CAST((9 * (count(1) + 1) + 9) DIV 10 AS BIGINT)").as("k"))
      val qhat = calib
        .withColumn("rn", row_number().over(Window.orderBy("a")))
        .crossJoin(broadcast(nk))
        .filter(col("rn") === least(col("k"), col("n_calib")))
        .select(col("n_calib"), col("k"), col("a").as("qh"))
      base.filter(col("hx").isin("3", "4", "5") && col("doc_id") < 1000)
        .crossJoin(broadcast(qhat))
        .select(col("n_calib"), col("k"), col("qh"),
          (lit(1.0) - col("p") <= col("qh")).as("set_en"),
          (col("p") <= col("qh")).as("set_non"), col("is_en"))
        .groupBy("n_calib", "k")
        .agg(round(first(col("qh")), 6).as("qhat"),
          count(lit(1)).as("n_eval"),
          round(avg(when(col("is_en") && col("set_en"), 1.0)
            .when(!col("is_en") && col("set_non"), 1.0)
            .otherwise(0.0)), 4).as("coverage"),
          round(avg(col("set_en").cast("double")
            + col("set_non").cast("double")), 4).as("avg_set_size"),
          sum((!col("set_en") && !col("set_non")).cast("long")).as("n_empty"))
    }),
    "q_bootstrap_ci" -> ((s, dir) => {
      // Poisson-bootstrap confidence intervals — THE resampling design
      // that survives 100 TB (one pass, no replicate materialization of
      // the data): each unit gets an independent Poisson(1) weight per
      // replicate, so a replicate's statistic is just a weighted
      // aggregate, and all B replicates ride ONE grouped scan. Here the
      // unit is the DAY (block bootstrap over the daily-volume series —
      // resampling raw events would understate variance for a
      // day-level statistic), so the expensive raw scan happens once and
      // the resampling cost is O(days × B), independent of corpus size.
      // Weights are deterministic: the md5-prefix uniform (portable-hash
      // idiom) inverted through the Poisson(1) CDF staircase. Replicate
      // means snap to 6 decimals; the CI bounds are exact order
      // statistics (ranks 10/190 of B=200 — the ceil(0.05·B)/ceil(0.95·B)
      // ranks), so the whole readout is engine-independent.
      val daily = cat(s, dir).events
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).cast("double").as("x"))
      val reps = daily
        .withColumn("b", explode(sequence(lit(0), lit(199))))
        .withColumn("u",
          (expr("CAST(conv(substring(md5(concat(event_type, ':', d, ':', b)), 1, 4), 16, 10) AS BIGINT)")
            + 0.5) / 65536.0)
        .withColumn("w",
          when(col("u") < 0.36787944117144233, 0.0)
            .when(col("u") < 0.7357588823428847, 1.0)
            .when(col("u") < 0.9196986029286058, 2.0)
            .when(col("u") < 0.9810118431238462, 3.0)
            .when(col("u") < 0.9963401531726563, 4.0)
            .when(col("u") < 0.9994058151824183, 5.0)
            .otherwise(6.0))
      val rm = reps.groupBy("event_type", "b")
        .agg(round(sum(col("w") * col("x")) / nullif(sum(col("w")), lit(0.0)), 6)
          .as("m"))
      val ranked = rm.withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy(col("m"), col("b"))))
      val ci = ranked.groupBy("event_type").agg(
        max(when(col("rn") === 10, col("m"))).as("lo"),
        max(when(col("rn") === 190, col("m"))).as("hi"),
        round(stddev_samp(col("m")), 4).as("se"))
      daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), round(avg("x"), 4).as("mean_daily"))
        .join(ci, "event_type")
        .orderBy("event_type")
    }),
    "q_tree_depth2" -> ((s, dir) => {
      // Supervised tier 5 — DEPTH-2 tree induction by exact recursive
      // split search: the q_stump_split level trick finds the root, rows
      // route L/R on the root's (feature, threshold) — a driver-side
      // 1-row collect, model-sized — and the SAME level trick, now
      // partitioned by side, finds each child's best split within its
      // branch. Three rows out: root + both children, each with its
      // within-node Gini, majority accuracy, and population (a child
      // that is pure or single-level has no valid split and emits no
      // row — the leaf contract, spec-pinned at sf0.001). This is the
      // histogram-free exact form of one boosting/tree round: O(levels)
      // per node, never O(n²), and every pass is one stack+groupBy over
      // the checkpointed staged frame.
      val staged = cat(s, dir).embeddings.selectExpr(
          "vec_id AS id", "CAST(label = 0 AS BIGINT) AS y",
          "round(CAST(embedding[0] AS DOUBLE), 2) AS s1",
          "round(CAST(embedding[1] AS DOUBLE), 2) AS s2",
          "round(CAST(embedding[2] AS DOUBLE), 2) AS s3",
          "round(CAST(embedding[3] AS DOUBLE), 2) AS s4")
        .localCheckpoint(eager = true) // re-enters three plan legs
      val stackExpr =
        "stack(4, 1L, s1, 2L, s2, 3L, s3, 4L, s4) AS (f, sc)"
      // Per-group best split from a (grp, f, sc, cnt, pos) level frame —
      // identical arithmetic shape to q_stump_split, grouped.
      def bestSplit(levels: DataFrame): DataFrame = {
        val wf = Window.partitionBy("grp", "f").orderBy("sc")
          .rowsBetween(Window.unboundedPreceding, 0)
        val wg = Window.partitionBy("grp", "f").rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        val cum = levels.select(col("grp"), col("f"), col("sc"),
          sum("cnt").over(wf).as("cl"), sum("pos").over(wf).as("pl"),
          sum("cnt").over(wg).as("n"), sum("pos").over(wg).as("n1"))
        val dl = col("cl").cast("double"); val dp = col("pl").cast("double")
        val dn = col("n").cast("double"); val d1 = col("n1").cast("double")
        val gini = (dl * (lit(1.0) - (dp / dl) * (dp / dl)
            - ((dl - dp) / dl) * ((dl - dp) / dl))
          + (dn - dl) * (lit(1.0)
            - ((d1 - dp) / (dn - dl)) * ((d1 - dp) / (dn - dl))
            - (((dn - dl) - (d1 - dp)) / (dn - dl))
              * (((dn - dl) - (d1 - dp)) / (dn - dl)))) / dn
        val acc = (greatest(dp, dl - dp)
          + greatest(d1 - dp, (dn - dl) - (d1 - dp))) / dn
        cum.filter(col("cl") < col("n"))
          .select(col("grp"), col("f"), col("sc").as("threshold"),
            round(gini, 9).as("g9"), round(gini, 6).as("gini"),
            round(acc, 6).as("acc"), col("n"))
          .withColumn("rk", row_number().over(Window.partitionBy("grp")
            .orderBy(col("g9"), col("f"), col("threshold"))))
          .filter(col("rk") === 1)
          .drop("rk", "g9")
      }
      val rootLevels = staged.selectExpr("y", stackExpr)
        .groupBy(lit("root").as("grp"), col("f"), col("sc"))
        .agg(count(lit(1)).as("cnt"), sum("y").as("pos"))
      val root = bestSplit(rootLevels)
      val Array(f0, t0) = root.select("f", "threshold").head()
        .toSeq.toArray // 1-row model collect: the root split parameters
      val sided = staged.withColumn("grp",
        when(col(s"s$f0") <= lit(t0), "L").otherwise("R"))
      val childLevels = sided.selectExpr("grp", "y", stackExpr)
        .groupBy("grp", "f", "sc")
        .agg(count(lit(1)).as("cnt"), sum("y").as("pos"))
      root.unionAll(bestSplit(childLevels))
        .select(col("grp").as("node"), col("f"), col("threshold"),
          col("gini"), col("acc"), col("n").as("n_node"))
        .orderBy("node")
    }),
    "q_mutual_info" -> ((s, dir) => {
      // Categorical-association audit between event type and ISO weekday:
      // mutual information, normalized MI (÷ √(H(X)·H(Y))), Pearson χ²
      // with its dof, and Cramér's V — the feature-relevance numbers a
      // pipeline reads before one-hot-ing a column into a model. One scan
      // collapses to the |X|×|Y| contingency cells (partial-agg'd);
      // marginals ride windows over the CELL frame, entropies reuse the
      // q_entropy idiom; everything downstream of the scan is
      // dozens-of-rows arithmetic.
      val cells = cat(s, dir).events
        .select(col("event_type").as("x"), (weekday(col("ts")) + 1).as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("nxy"))
      val e = cells.select(col("x"), col("y"), col("nxy").cast("double").as("o"),
        sum("nxy").over(Window.partitionBy("x")).cast("double").as("nx"),
        sum("nxy").over(Window.partitionBy("y")).cast("double").as("ny"),
        sum("nxy").over().cast("double").as("n"))
      val assoc = e.select(col("o"), col("nx"), col("ny"), col("n"),
          (col("o") - col("nx") * col("ny") / col("n")).as("d"))
        .agg(max("n").as("n"),
          sum((col("o") / col("n"))
            * log(col("o") * col("n") / (col("nx") * col("ny")))).as("mi_raw"),
          sum(col("d") * col("d") / (col("nx") * col("ny") / col("n")))
            .as("chi2_raw"))
      def marginalEntropy(keyCol: String, alias: String) =
        cells.groupBy(keyCol).agg(sum("nxy").as("m"))
          .agg((log(sum("m")) - sum(col("m") * log(col("m"))) / sum("m"))
            .as(alias), count(lit(1)).as(s"k_$alias"))
      assoc.crossJoin(broadcast(marginalEntropy("x", "hx")))
        .crossJoin(broadcast(marginalEntropy("y", "hy")))
        .select(col("n").cast("long").as("n"),
          round(col("mi_raw"), 6).as("mi"),
          round(col("mi_raw") / sqrt(col("hx") * col("hy")), 6).as("nmi"),
          round(col("chi2_raw"), 4).as("chi2"),
          ((col("k_hx") - 1) * (col("k_hy") - 1)).as("dof"),
          round(sqrt(col("chi2_raw")
            / (col("n") * least(col("k_hx") - 1, col("k_hy") - 1))), 6)
            .as("cramers_v"))
    }),
    "q_stump_split" -> ((s, dir) => {
      // Supervised tier 4 — decision-stump induction by EXACT split
      // search: for each of the first 4 embedding dims, every distinct
      // (2-rounded) value is a candidate threshold; weighted Gini
      // impurity of (x ≤ t) picks the best (feature, threshold), ties
      // broken by (f, t) ascending. The q_auc level trick does the heavy
      // lifting: one stack+groupBy pass to score-level counts, inclusive
      // cumulative windows per feature, so split search is O(levels) not
      // O(n²) — the scalable exact formulation of what tree libraries
      // approximate with histograms. All counts exact integers; the Gini
      // closed form is written with the identical op order both engines.
      val lv = cat(s, dir).embeddings
        .selectExpr("CAST(label = 0 AS BIGINT) AS y",
          "stack(4, 1L, round(CAST(embedding[0] AS DOUBLE), 2), " +
            "2L, round(CAST(embedding[1] AS DOUBLE), 2), " +
            "3L, round(CAST(embedding[2] AS DOUBLE), 2), " +
            "4L, round(CAST(embedding[3] AS DOUBLE), 2)) AS (f, sc)")
        .groupBy("f", "sc").agg(count(lit(1)).as("cnt"), sum("y").as("pos"))
      val wf = Window.partitionBy("f").orderBy("sc")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy("f").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val cum = lv.select(col("f"), col("sc"),
        sum("cnt").over(wf).as("cl"), sum("pos").over(wf).as("pl"),
        sum("cnt").over(wAll).as("n"), sum("pos").over(wAll).as("n1"))
      val nl = col("cl").cast("double"); val pl = col("pl").cast("double")
      val nt = col("n").cast("double"); val p1 = col("n1").cast("double")
      val nr = nt - nl; val pr = p1 - pl
      val gini = (nl * (lit(1.0) - (pl / nl) * (pl / nl)
          - ((nl - pl) / nl) * ((nl - pl) / nl))
        + nr * (lit(1.0) - (pr / nr) * (pr / nr)
          - ((nr - pr) / nr) * ((nr - pr) / nr))) / nt
      val acc = (greatest(pl, nl - pl) + greatest(pr, nr - pr)) / nt
      cum.filter(col("cl") < col("n")) // degenerate all-left split excluded
        .select(col("f"), col("sc").as("threshold"),
          round(gini, 9).as("g9"), round(gini, 6).as("gini"),
          round(acc, 6).as("acc"), col("cl").as("n_left"),
          (col("n") - col("cl")).as("n_right"))
        .orderBy(col("g9"), col("f"), col("threshold"))
        .limit(1)
        .select("f", "threshold", "gini", "acc", "n_left", "n_right")
    }),
    "q_markov_stationary" -> ((s, dir) => {
      // Markov mixing audit: the event-type transition matrix (from each
      // user's consecutive events under the established (ts, event_id)
      // total order) powered 3 steps from the uniform start, vs the
      // empirical visit share. The corpus-sized work is ONE lag-window
      // scan + one grouped count; the matrix itself is k² rows (k = event
      // types) — model-sized, so the power iteration runs driver-side on
      // collected doubles (the kmeansLloyd collect economics) with the
      // pageRank per-step 9-decimal rounding so the oracle's unrolled CTE
      // chain lands on identical values.
      val ev = cat(s, dir).events
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val pairs = ev.select(col("event_type").as("cur"),
          lag("event_type", 1).over(w).as("prev"))
        .filter(col("prev").isNotNull)
      val cnt = pairs.groupBy("prev", "cur").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val outTot = cnt.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val p = cnt.map { case (i, j, n) => (i, j, n.toDouble / outTot(i)) }
      val states = cnt.map(_._1).distinct.sorted
      def r9(x: Double): Double = math.rint(x * 1e9) / 1e9
      var pi = states.map(_ -> r9(1.0 / states.length)).toMap
      for (_ <- 1 to 3)
        pi = p.groupBy(_._2).view
          .mapValues(es => r9(es.map { case (i, _, pij) => pi(i) * pij }.sum))
          .toMap
      val piDf = { import s.implicits._; pi.toSeq.toDF("event_type", "pi") }
      val emp = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
        .select(col("event_type"), (col("n").cast("double") /
          sum("n").over()).as("emp"))
      piDf.join(emp, Seq("event_type"))
        .select(col("event_type"), round(col("pi"), 6).as("pi_3"),
          round(col("emp"), 6).as("emp_share"),
          round(abs(col("pi") - col("emp")), 6).as("gap"))
        .orderBy("event_type")
    }),
    "q_markov_attribution" -> ((s, dir) => {
      // Markov removal-effect attribution (Anderl et al. 2016) — the
      // data-driven upgrade over q_first_touch/q_attribution_linear's
      // positional rules: build the first-order journey chain start →
      // channels → purchase (paths truncated at each user's FIRST
      // purchase under the established (ts, event_id) total order), then
      // for each channel ask "how much conversion mass survives 6 steps
      // if this channel is deleted from the graph?" (mass entering the
      // removed channel is LOST — the standard no-renormalization rule).
      // lift = conv_full − conv_removed is the channel's removal effect.
      // Corpus-sized work: one window pass (first-purchase cut + lag
      // pairs) and one grouped count; the chain itself is k² rows, so the
      // absorbing walk runs driver-side on collected doubles with the
      // q_markov_stationary per-step 9-decimal rounding — the oracle's
      // per-removal unrolled CTE chain lands on identical values.
      val ev = cat(s, dir).events
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      val wp = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val firstPurch = ev.filter(col("event_type") === "purchase")
        .withColumn("rn", row_number().over(wp)).filter(col("rn") === 1)
        .select(col("user_id"), col("ts").as("pts"), col("event_id").as("pid"))
      val kept = ev.join(firstPurch, Seq("user_id"), "left")
        .filter(col("pts").isNull || col("ts") < col("pts") ||
          (col("ts") === col("pts") && col("event_id") <= col("pid")))
      val pairs = kept.select(col("event_type").as("cur"),
        coalesce(lag("event_type", 1).over(wp), lit("start")).as("prev"))
      val cnt = pairs.groupBy("prev", "cur").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val tot = cnt.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val p = cnt.map { case (i, j, n) => (i, j, n.toDouble / tot(i)) }
      def r9(x: Double): Double = math.rint(x * 1e9) / 1e9
      def conv(removed: Option[String]): Double = {
        val pr = p.filter { case (i, j, _) =>
          removed.forall(c => i != c && j != c) }
        var mass = Map("start" -> 1.0)
        var cv = 0.0
        for (_ <- 1 to 6) {
          val next = pr.filter { case (i, _, _) => mass.contains(i) }
            .groupBy(_._2).view
            .mapValues(es =>
              r9(es.map { case (i, _, pij) => mass(i) * pij }.sum))
            .toMap
          cv += next.getOrElse("purchase", 0.0)
          mass = next - "purchase"
        }
        r9(cv)
      }
      val full = conv(None)
      val rows = Seq("click", "error", "signup", "view").map { c =>
        val cr = conv(Some(c)); (c, full, cr, r9(full - cr))
      }
      import s.implicits._
      rows.toDF("channel", "conv_full", "conv_removed", "lift")
        .orderBy("channel")
    }),
    "q_shapley_attribution" -> ((s, dir) => {
      // Exact Shapley-value attribution (Shapley 1953 via Zhao et al.
      // 2018's coalition formulation) — the axiomatic counterpart to
      // q_markov_attribution's removal effects: coalition value v(S) =
      // conversion RATE among users whose whole pre-purchase journey is
      // covered by channel set S (exact-set groups T contribute to every
      // S ⊇ T), and φ_c = Σ_{S∌c} |S|!(n−1−|S|)!/n! · (v(S∪c) − v(S)).
      // The rate-based v has no dividend shortcut, so the full 2⁴
      // enumeration is genuinely Shapley (a count-based v would collapse
      // to uniform credit — the "simplified Shapley" degeneracy).
      // Corpus-sized work: one window pass + one grouped count; the
      // collect is ≤ 2⁴ exact-set rows (bounded by the channel alphabet,
      // never by corpus size), the same k²-collect economics as
      // q_markov_attribution. φ folds in fixed mask order with /4.0 and
      // /12.0 divisions and 9-decimal rounding so the oracle's 16-CTE
      // enumeration lands on identical doubles. Journey unit = a
      // (user, day) session (user-level is degenerate on this corpus:
      // every user eventually purchases, so every coalition value would
      // be 1), truncated at the day's first purchase.
      val ev = cat(s, dir).events
        .select(col("user_id"), to_date(col("ts")).as("day"),
          col("event_type"), col("ts"), col("event_id"))
      val wp = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
      val firstPurch = ev.filter(col("event_type") === "purchase")
        .withColumn("rn", row_number().over(wp)).filter(col("rn") === 1)
        .select(col("user_id"), col("day"),
          col("ts").as("pts"), col("event_id").as("pid"))
      val kept = ev.join(firstPurch, Seq("user_id", "day"), "left")
        .filter(col("pts").isNull || col("ts") < col("pts") ||
          (col("ts") === col("pts") && col("event_id") <= col("pid")))
      val groups = kept.groupBy("user_id", "day")
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"),
          concat_ws(",", array_sort(array_distinct(collect_list(
            when(col("event_type") =!= "purchase", col("event_type"))))))
            .as("key"))
        .groupBy("key")
        .agg(count(lit(1)).as("n"), sum("conv").as("k"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val channels = Vector("click", "error", "signup", "view")
      def r9(x: Double): Double = math.rint(x * 1e9) / 1e9
      val exact = groups.map { case (key, n, k) =>
        (key.split(',').filter(_.nonEmpty).toSet, n, k) }
      // v per coalition mask (bit i = channels(i)), rate over covered sets.
      val v = (0 until 16).map { m =>
        val coal = channels.zipWithIndex.collect {
          case (c, i) if (m & (1 << i)) != 0 => c }.toSet
        val covered = exact.filter { case (t, _, _) => t.subsetOf(coal) }
        val (nn, kk) = (covered.map(_._2).sum, covered.map(_._3).sum)
        m -> (if (nn == 0) 0.0 else r9(kk.toDouble / nn.toDouble))
      }.toMap
      val rows = channels.zipWithIndex.map { case (c, i) =>
        val bit = 1 << i
        // Masks without c in increasing order — the oracle's term order.
        val phi = r9((0 until 16).filter(m => (m & bit) == 0).map { m =>
          val d = v(m | bit) - v(m)
          if (java.lang.Integer.bitCount(m) == 0 ||
            java.lang.Integer.bitCount(m) == 3) d / 4.0 else d / 12.0
        }.sum)
        // HALF_UP display round (away from zero — φ can be negative),
        // matching the oracle's round(x, 6); rint's half-even would split.
        (c, BigDecimal(phi).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      }
      import s.implicits._
      rows.toDF("channel", "phi").orderBy("channel")
    }),
    "q_mmd_distance" -> ((s, dir) => {
      // Maximum mean discrepancy (Gretton et al. 2012) between two
      // embedding populations — the kernel two-sample test a data pipeline
      // runs to answer "does source B's embedding distribution match source
      // A's?" before mixing corpora. Unbiased MMD² with an RBF kernel
      // (γ = 1/d): saa/(m(m−1)) + sbb/(n(n−1)) − 2·sab/(mn) over the
      // label-0 vs label-1 panels, id-capped so the all-pairs stage is
      // bounded by construction at ANY corpus scale (the q_semantic_dedup
      // rule). Determinism: per-dim squared diffs round to 12 and sum in
      // exact DECIMAL inside the array fold (order-free), each kernel
      // value rounds to 9 and sums in DECIMAL — the doubles that reach
      // round() are bit-identical across engines.
      val emb = cat(s, dir).embeddings
        .filter(col("vec_id") < 500 && col("label").isin(0, 1))
        .select(col("vec_id").as("id"), col("label").as("lbl"),
          col("embedding").cast("array<double>").as("v"))
      val pairs = emb.as("x").join(emb.as("y"), col("x.id") < col("y.id"))
        .select(col("x.lbl").as("lx"), col("y.lbl").as("ly"),
          expr("aggregate(zip_with(x.v, y.v, (p, q) -> CAST(round((p - q) * (p - q), 12) AS DECIMAL(28,12))), " +
            "CAST(0 AS DECIMAL(28,12)), (acc, z) -> CAST(acc + z AS DECIMAL(28,12)))").as("d2"))
        .select(col("lx"), col("ly"),
          round(exp(-col("d2").cast("double") / 64.0), 9)
            .cast("decimal(18,9)").as("k"))
      val counts = emb.agg(
        sum(when(col("lbl") === 0, 1).otherwise(0)).as("m"),
        sum(when(col("lbl") === 1, 1).otherwise(0)).as("n"))
      pairs.agg(
          sum(when(col("lx") === 0 && col("ly") === 0, col("k"))).as("saa"),
          sum(when(col("lx") === 1 && col("ly") === 1, col("k"))).as("sbb"),
          sum(when(col("lx") =!= col("ly"), col("k"))).as("sab"))
        .crossJoin(broadcast(counts))
        .select(col("m").cast("bigint").as("m"), col("n").cast("bigint").as("n"),
          col("saa").cast("double").as("sum_aa"),
          col("sbb").cast("double").as("sum_bb"),
          col("sab").cast("double").as("sum_ab"),
          round(lit(2) * col("saa").cast("double") / (col("m") * (col("m") - 1)) +
            lit(2) * col("sbb").cast("double") / (col("n") * (col("n") - 1)) -
            lit(2) * col("sab").cast("double") / (col("m") * col("n")), 6).as("mmd2"))
    }),
    "q_holt_forecast" -> ((s, dir) => {
      // Holt double exponential smoothing (α = 0.5, β = 0.3) of each event
      // type's daily volume, plus the 7-step-ahead linear forecast — the
      // capacity-planning primitive over ingest telemetry. The recurrence
      // is sequential per key, so it runs as the q_ema pattern: one shuffle
      // groups each type's daily series (calendar-bounded, never
      // corpus-sized), then aggregate() folds the sorted days in INTEGER
      // MICRO-UNITS — α=1/2 and β=3/10 become exact integer div steps, so
      // any engine (and the oracle's recursive CTE) lands on bit-identical
      // trajectories with no float rounding contract at all.
      val daily = cat(s, dir).events
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg((count(lit(1)) * 1000000L).as("yus"))
      daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          array_sort(collect_list(struct(col("day"), col("yus")))).as("seq"))
        .select(col("event_type"), col("n_days"), expr(
          "aggregate(slice(seq, 2, size(seq) - 1), " +
            "named_struct('l', element_at(seq, 1).yus, 'b', CAST(0 AS BIGINT)), " +
            "(st, y) -> named_struct(" +
            "'l', (y.yus + st.l + st.b) div 2, " +
            "'b', (3 * (((y.yus + st.l + st.b) div 2) - st.l) + 7 * st.b) div 10))")
          .as("st"))
        .select(col("event_type"), col("n_days"),
          (col("st.l") / 1000000.0).as("level"),
          (col("st.b") / 1000000.0).as("trend"),
          ((col("st.l") + lit(7) * col("st.b")) / 1000000.0).as("forecast_7"))
        .orderBy("event_type")
    }),
    "q_corr_matrix" -> ((s, dir) => {
      // Pairwise Pearson correlation matrix over the lineitem measures —
      // the d(d+3)/2-raw-moment pattern from q_ols_multi generalized to all
      // column pairs: ONE projected scan emits n + 4 sums + 4 sum-of-squares
      // + 6 cross-moments (15 doubles total leave the scan, independent of
      // corpus size), then every corr assembles in the projection with the
      // exact association the oracle mirrors. At 100 TB this is scan-bound
      // by construction — the shuffle carries 15 numbers.
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val li = cat(s, dir).lineitem.select(cs.map(col): _*)
      val moments =
        count(lit(1)).cast("double").as("n") +:
        cs.map(c => sum(col(c)).as(s"s_$c")) ++:
        (for (i <- cs.indices; j <- i until cs.length) yield
          sum(col(cs(i)) * col(cs(j))).as(s"x_${cs(i)}_${cs(j)}"))
      val m = li.agg(moments.head, moments.tail: _*)
      def corr(a: String, b: String) = {
        def cm(p: String, q: String) =
          col(s"x_${p}_$q") - col(s"s_$p") * col(s"s_$q") / col("n")
        round(cm(a, b) / (sqrt(cm(a, a)) * sqrt(cm(b, b))), 4)
      }
      val pairs = for (i <- cs.indices; j <- (i + 1) until cs.length) yield
        struct(lit(cs(i)).as("col_a"), lit(cs(j)).as("col_b"),
          corr(cs(i), cs(j)).as("r"))
      m.select(explode(array(pairs: _*)).as("p"))
        .select(col("p.col_a"), col("p.col_b"), col("p.r"))
        .orderBy("col_a", "col_b")
    }),
    "q_chi_square" -> ((s, dir) => {
      // Chi-square test of independence (order priority × order status)
      // plus Cramér's V — the categorical-association audit in its classic
      // inferential form. The contingency table is ONE grouped scan of
      // exact integers; margins re-aggregate the (≤ r×c)-row cell frame, so
      // after the first exchange nothing scales with the corpus. Expected
      // counts and the statistic are closed forms over those integers —
      // deterministic to the ulp, rounded at 4.
      val cells = cat(s, dir).orders
        .groupBy(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("obs"))
      val rm = cells.groupBy("pri").agg(sum("obs").as("rn"))
      val cm = cells.groupBy("st").agg(sum("obs").as("cn"))
      val tot = cells.agg(sum("obs").as("n"),
        countDistinct("pri").as("r"), countDistinct("st").as("c"))
      val e = col("rn").cast("double") * col("cn").cast("double") /
        col("n").cast("double")
      cells.join(rm, Seq("pri")).join(cm, Seq("st"))
        .crossJoin(broadcast(tot))
        .select(col("obs"), e.as("e"), col("n"), col("r"), col("c"))
        .groupBy("n", "r", "c")
        .agg(sum(pow(col("obs").cast("double") - col("e"), 2) / col("e"))
          .as("chi2raw"))
        .select(col("n"), ((col("r") - 1) * (col("c") - 1)).as("dof"),
          round(col("chi2raw"), 4).as("chi2"),
          round(sqrt(col("chi2raw") / (col("n").cast("double") *
            least(col("r") - 1, col("c") - 1).cast("double"))), 6)
            .as("cramers_v"))
    }),
    "q_welch_ttest" -> ((s, dir) => {
      // Welch's unequal-variance t-test on the continuous experiment metric
      // (purchase value across the deterministic hash arms of q_ab_lift) —
      // the companion readout when the outcome is a spend amount, not a
      // conversion bit. One grouped scan emits per-arm (n, Σv, Σv²); the
      // t statistic and Welch–Satterthwaite df are closed forms over those
      // six numbers. Σv/Σv² are double sums (order-dependent at the
      // 1e-15 relative level) — the 4-decimal snap absorbs that, the same
      // contract q_regr ships with.
      val arms = cat(s, dir).events
        .filter(col("event_type") === "purchase")
        .groupBy((col("user_id") % 2).as("arm"))
        .agg(count(lit(1)).as("n"), sum("value").as("sv"),
          sum(col("value") * col("value")).as("svv"))
        .select(col("arm"), col("n"), col("sv"), col("svv"),
          (col("sv") / col("n")).as("m"),
          ((col("svv") - col("sv") * col("sv") / col("n")) / (col("n") - 1))
            .as("v"))
      val a = arms.filter(col("arm") === 0)
        .select(col("n").as("n0"), col("m").as("m0"), col("v").as("v0"))
      val b = arms.filter(col("arm") === 1)
        .select(col("n").as("n1"), col("m").as("m1"), col("v").as("v1"))
      val se0 = col("v0") / col("n0"); val se1 = col("v1") / col("n1")
      a.crossJoin(broadcast(b)) // two 1-row frames
        .select(col("n0"), col("n1"), round(col("m0"), 4).as("mean0"),
          round(col("m1"), 4).as("mean1"),
          round((col("m1") - col("m0")) / sqrt(se0 + se1), 4).as("t"),
          round(pow(se0 + se1, 2) / (pow(se0, 2) / (col("n0") - 1) +
            pow(se1, 2) / (col("n1") - 1)), 2).as("df"))
    }),
    "q_mann_whitney" -> ((s, dir) => {
      // Mann–Whitney U (rank-sum) test on the same two arms — the
      // distribution-free alternative to q_welch_ttest. Formulation avoids
      // any per-row global rank: group by exact VALUE first (purchase
      // values are cent-quantized doubles, so the distinct-value domain is
      // bounded by the price range — constant in corpus size, the
      // q_mann_whitney scale story), then mid-ranks come from a running sum
      // over that bounded value table and every input to U is an integer or
      // half-integer — exact in double, no rounding hazard anywhere before
      // the final z.
      val g = cat(s, dir).events
        .filter(col("event_type") === "purchase")
        .select((col("user_id") % 2).as("arm"), col("value").as("v"))
        .groupBy("v")
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0g"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1g"))
      // Window over the bounded distinct-value table (not the event rows).
      val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
      val ranked = g.select(col("n0g"), col("n1g"),
        (col("n0g") + col("n1g")).as("ng"),
        (coalesce(sum(col("n0g") + col("n1g")).over(w), lit(0L))
          .cast("double") +
          (col("n0g") + col("n1g") + 1).cast("double") / 2.0).as("midrank"))
      val m = ranked.agg(sum("n0g").as("n0"), sum("n1g").as("n1"),
        sum(col("n1g").cast("double") * col("midrank")).as("r1"),
        sum(pow(col("ng").cast("double"), 3) - col("ng").cast("double"))
          .as("ties"))
      val n0 = col("n0").cast("double"); val n1 = col("n1").cast("double")
      val nn = n0 + n1
      val u1 = col("r1") - n1 * (n1 + 1) / 2.0
      val varU = n0 * n1 / 12.0 * ((nn + 1) - col("ties") / (nn * (nn - 1)))
      m.select(col("n0"), col("n1"), round(u1, 1).as("u1"),
        round((u1 - n0 * n1 / 2.0) / sqrt(varU), 4).as("z"))
    }),
    "q_srm_check" -> ((s, dir) => {
      // Sample-ratio-mismatch guardrail — the FIRST check any experiment
      // readout runs: do the assigned populations actually split 50/50?
      // Distinct users per arm (one grouped scan of exact integers),
      // chi-square against the expected half-split, flagged at the 1-dof
      // 95% critical value. A hash-parity assignment that fails this is a
      // broken bucketing pipeline, not a treatment effect.
      val arms = cat(s, dir).events
        .select((col("user_id") % 2).as("arm"), col("user_id"))
        .distinct()
        .groupBy("arm").agg(count(lit(1)).as("n"))
      val a = arms.filter(col("arm") === 0).select(col("n").as("n0"))
      val b = arms.filter(col("arm") === 1).select(col("n").as("n1"))
      val e = (col("n0") + col("n1")).cast("double") / 2.0
      val chi2 = pow(col("n0").cast("double") - e, 2) / e +
        pow(col("n1").cast("double") - e, 2) / e
      a.crossJoin(broadcast(b)) // two 1-row frames
        .select(col("n0"), col("n1"), round(chi2, 4).as("chi2"),
          (chi2 > 3.841).as("srm_flag"))
    }),
    "q_ab_power" -> ((s, dir) => {
      // Post-hoc power readout: the minimum detectable effect the running
      // experiment could actually resolve (α=0.05 two-sided, 80% power ⇒
      // z-sum 2.8016 = 1.9600 + 0.8416), absolute and relative to the
      // control mean. Six numbers out of one grouped scan; every output is
      // a closed form over them. The "is this test even worth reading"
      // companion to q_ab_lift/q_welch_ttest.
      val arms = cat(s, dir).events
        .filter(col("event_type") === "purchase")
        .groupBy((col("user_id") % 2).as("arm"))
        .agg(count(lit(1)).as("n"), sum("value").as("sv"),
          sum(col("value") * col("value")).as("svv"))
        .select(col("arm"), col("n"), (col("sv") / col("n")).as("m"),
          ((col("svv") - col("sv") * col("sv") / col("n")) / (col("n") - 1))
            .as("v"))
      val a = arms.filter(col("arm") === 0)
        .select(col("n").as("n0"), col("m").as("m0"), col("v").as("v0"))
      val b = arms.filter(col("arm") === 1)
        .select(col("n").as("n1"), col("v").as("v1"))
      val mde = lit(2.8016) * sqrt(col("v0") / col("n0") + col("v1") / col("n1"))
      a.crossJoin(broadcast(b)) // two 1-row frames
        .select(col("n0"), col("n1"), round(col("m0"), 4).as("control_mean"),
          round(mde, 4).as("mde_abs"),
          round(mde * 100.0 / col("m0"), 4).as("mde_rel_pct"))
    }),
    "q_winsorize" -> ((s, dir) => {
      // Winsorized robust mean per event type: clamp to the exact discrete
      // p05/p95 (smallest value whose cumulative count reaches ⌈q·n⌉ —
      // integer-exact, no interpolation ambiguity across engines), then
      // re-aggregate. The heavy-tail-robust companion to q_mad/
      // q_zscore_outliers, and the rank work runs over the BOUNDED
      // distinct-value table (the q_mann_whitney scale story).
      val g = cat(s, dir).events
        .groupBy(col("event_type"), col("value").as("v"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("event_type").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = g.select(col("event_type"), col("v"), col("cnt"),
        sum("cnt").over(w).as("c"))
      val tot = g.groupBy("event_type").agg(sum("cnt").as("n"))
      val ranked = cum.join(tot, Seq("event_type"))
      def bound(q: Double, name: String) = ranked
        .filter(col("c") >= ceil(col("n").cast("double") * q))
        .groupBy("event_type").agg(min("v").as(name))
      val lo = bound(0.05, "p05"); val hi = bound(0.95, "p95")
      val cl = g.join(lo, Seq("event_type")).join(hi, Seq("event_type"))
        .select(col("event_type"), col("cnt"),
          greatest(col("p05"), least(col("p95"), col("v"))).as("cv"),
          col("v"))
      cl.groupBy("event_type")
        .agg(sum("cnt").as("n"),
          round(sum(col("cnt") * col("v")) / sum("cnt"), 4).as("raw_mean"),
          round(sum(col("cnt") * col("cv")) / sum("cnt"), 4).as("wins_mean"))
        .orderBy("event_type")
    }),
    "q_ipw_effect" -> ((s, dir) => {
      // Inverse-propensity-weighted treatment effect (Horvitz–Thompson /
      // Hájek) — the observational-causal counterpart to q_diff_in_diff.
      // Unit = a (user, day) activity cell (user-level is degenerate on
      // this corpus: every user touches every event type): treatment =
      // the cell contains a click, outcome = it contains a purchase,
      // confounders = the cell's (view, error, signup) counts. The
      // propensity model is the SAME pinned-trajectory batch-GD logistic
      // regression as q_logreg_quality (margins→6, sigmoid→9, 9-decimal
      // weight grid), fit on the user frame and scored in-plan, so the
      // oracle's unrolled CTE chain computes bit-identical propensities.
      // Probabilities clip to [0.05, 0.95] (standard overlap trimming).
      // Each weighted term rounds to the 1e-9 grid and sums as exact
      // DECIMAL (order-independent — the labelCentroids discipline), so
      // the Hájek ratio needs no summation-order slack. Corpus work: one
      // per-user groupBy + iters model scans of the USER-sized frame;
      // everything after is one aggregate row.
      val u = cat(s, dir).events
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(
          max(when(col("event_type") === "click", 1.0).otherwise(0.0)).as("t"),
          max(when(col("event_type") === "purchase", 1.0).otherwise(0.0)).as("y"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .cast("double").as("x1"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .cast("double").as("x2"),
          sum(when(col("event_type") === "signup", 1L).otherwise(0L))
            .cast("double").as("x3"))
        .select(col("t"), col("y"),
          array(col("x1"), col("x2"), col("x3")).as("v"))
        // Two consumers (propensity cache fill + the weighted-moment pass).
        .localCheckpoint(eager = true)
      val wts = Classify.logregWeights(u, "v", "t", iters = 3, lr = 1.0)
      val e = Classify.logregProb(wts, col("v"))
      val scored = u.select(col("t"), col("y"),
        greatest(least(e, lit(0.95)), lit(0.05)).as("e"))
      val terms = scored.select(col("t"), col("y"),
        round(col("t") * col("y") / col("e"), 9).as("ty"),
        round(col("t") / col("e"), 9).as("tw"),
        round((lit(1.0) - col("t")) * col("y") / (lit(1.0) - col("e")), 9)
          .as("cy"),
        round((lit(1.0) - col("t")) / (lit(1.0) - col("e")), 9).as("cw"))
      def dsum(c: String) =
        sum(col(c).cast("decimal(28,12)")).cast("double")
      terms.agg(
          count(lit(1)).as("n"),
          sum(col("t")).cast("bigint").as("n_treat"),
          sum(col("t") * col("y")).cast("bigint").as("k_treat"),
          sum((lit(1.0) - col("t")) * col("y")).cast("bigint").as("k_ctrl"),
          dsum("ty").as("sty"), dsum("tw").as("stw"),
          dsum("cy").as("scy"), dsum("cw").as("scw"))
        .select(col("n"), col("n_treat"),
          round(col("k_treat").cast("double") / col("n_treat")
            - col("k_ctrl").cast("double") / (col("n") - col("n_treat")),
            6).as("ate_naive"),
          round(col("sty") / col("stw") - col("scy") / col("scw"), 6)
            .as("ate_ipw"))
    }),
    "q_uplift_bands" -> ((s, dir) => {
      // Two-model uplift estimation (the T-learner) with its calibration
      // readout: per treatment arm, the SAME pinned-GD logistic regression
      // as q_logreg_quality predicts conversion from the cell's activity
      // counts; uplift(v) = p₁(v) − p₀(v). Instead of uplift deciles (a
      // global sort = single-partition window), cells group into 0.05-wide
      // uplift BANDS — shuffle-friendly and more decision-useful: each
      // band compares its mean PREDICTED uplift against the ACTUAL
      // treated-minus-control conversion gap, the calibration curve that
      // decides whether the model can gate a rollout. Conversion counts
      // are exact integers; predicted means 9-snap into exact-DECIMAL
      // sums. Corpus work: the cell groupBy + 2×iters arm-sized GD scans
      // + one grouped pass.
      val u = cat(s, dir).events
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(
          max(when(col("event_type") === "click", 1.0).otherwise(0.0)).as("t"),
          max(when(col("event_type") === "purchase", 1.0).otherwise(0.0)).as("y"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .cast("double").as("x1"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .cast("double").as("x2"),
          sum(when(col("event_type") === "signup", 1L).otherwise(0L))
            .cast("double").as("x3"))
        .select(col("t"), col("y"),
          array(col("x1"), col("x2"), col("x3")).as("v"))
        // Three consumers re-enter this corpus-sized aggregation (each
        // arm's GD cache fill + the scoring pass) — materialize the narrow
        // (t, y, v) cell frame once instead of re-aggregating events 3×.
        .localCheckpoint(eager = true)
      // Both arm models fit in ONE grouped pass per iteration (gradients
      // keyed by (arm, dim)): same per-arm sums and 9-decimal trajectory
      // as two arm-filtered fits, half the fixed job count — one cache
      // fill and 3 gradient jobs instead of two of each
      // (Classify.logregWeightsTwoArm; equality pinned in ClassifySpec).
      val wm = Classify.logregWeightsTwoArm(u, "v", "y", "t",
        iters = 3, lr = 1.0)
      val (w1, w0) = (wm(1.0), wm(0.0))
      val uplift = round(Classify.logregProb(w1, col("v"))
        - Classify.logregProb(w0, col("v")), 9)
      u.select(col("t"), col("y"), uplift.as("uplift"))
        .withColumn("band", floor(col("uplift") * 20).cast("long"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"),
          sum(col("t")).cast("bigint").as("n_treat"),
          sum(col("t") * col("y")).cast("bigint").as("k_treat"),
          sum((lit(1.0) - col("t")) * col("y")).cast("bigint").as("k_ctrl"),
          sum(col("uplift").cast("decimal(28,12)")).cast("double").as("su"))
        .select(col("band"), col("n"), col("n_treat"),
          round(col("su") / col("n"), 6).as("mean_pred_uplift"),
          when(col("n_treat") === 0 || col("n_treat") === col("n"),
            lit(null).cast("double"))
            .otherwise(round(col("k_treat").cast("double") / col("n_treat")
              - col("k_ctrl").cast("double") / (col("n") - col("n_treat")),
              6)).as("actual_uplift"))
        .orderBy("band")
    }),
    "q_cate_segments" -> ((s, dir) => {
      // Conditional average treatment effects (CATE) by stratum — "who
      // does the treatment actually move": the identical pinned propensity
      // and Hájek machinery as q_ipw_effect, with the final aggregation
      // GROUPED by the cell's view-count segment (v0 / v1_2 / v3plus).
      // Heterogeneity across the strata is the decision signal a rollout
      // reads (ship only to segments the treatment moves). The segment is
      // a function of a confounder, so per-stratum weighting still
      // balances within each group. Same exact-DECIMAL term sums.
      val u = cat(s, dir).events
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(
          max(when(col("event_type") === "click", 1.0).otherwise(0.0)).as("t"),
          max(when(col("event_type") === "purchase", 1.0).otherwise(0.0)).as("y"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .cast("double").as("x1"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .cast("double").as("x2"),
          sum(when(col("event_type") === "signup", 1L).otherwise(0L))
            .cast("double").as("x3"))
        .select(col("t"), col("y"), col("x1"), col("x2"), col("x3"),
          array(col("x1"), col("x2"), col("x3")).as("v"))
        // Consumed by the propensity fit's cache fill AND the moment pass —
        // materialize the narrow cell frame once, don't re-aggregate events.
        .localCheckpoint(eager = true)
      val wts = Classify.logregWeights(u, "v", "t", iters = 3, lr = 1.0)
      val e = Classify.logregProb(wts, col("v"))
      val seg = when(col("x1") === 0, "v0")
        .when(col("x1") <= 2, "v1_2").otherwise("v3plus")
      val terms = u.select(seg.as("segment"), col("t"), col("y"),
          greatest(least(e, lit(0.95)), lit(0.05)).as("e"))
        .select(col("segment"), col("t"),
          round(col("t") * col("y") / col("e"), 9).as("ty"),
          round(col("t") / col("e"), 9).as("tw"),
          round((lit(1.0) - col("t")) * col("y") / (lit(1.0) - col("e")), 9)
            .as("cy"),
          round((lit(1.0) - col("t")) / (lit(1.0) - col("e")), 9).as("cw"))
      def dsum(c: String) =
        sum(col(c).cast("decimal(28,12)")).cast("double")
      terms.groupBy("segment")
        .agg(count(lit(1)).as("n"),
          sum(col("t")).cast("bigint").as("n_treat"),
          dsum("ty").as("sty"), dsum("tw").as("stw"),
          dsum("cy").as("scy"), dsum("cw").as("scw"))
        .select(col("segment"), col("n"), col("n_treat"),
          // A stratum with an empty arm has no contrast — null, not a
          // division error (CaseWhen evaluates lazily per row).
          when(col("stw") === 0.0 || col("scw") === 0.0,
            lit(null).cast("double"))
            .otherwise(round(col("sty") / col("stw")
              - col("scy") / col("scw"), 6)).as("cate_ipw"))
        .orderBy("segment")
    }),
    "q_aipw_effect" -> ((s, dir) => {
      // Doubly-robust AIPW (augmented IPW, Robins et al. 1994) — the
      // estimator that stays consistent if EITHER the propensity model OR
      // the outcome model is right, the production standard over plain
      // IPW. Same (user, day) cells, treatment and propensity as
      // q_ipw_effect; outcome models m₁/m₀ are per-arm 3-feature OLS fit
      // by normal equations whose moments are ALL exact integers (y is
      // 0/1, features are counts), so both engines derive bit-identical
      // betas from the same closed-form Cramer expressions — no GD needed
      // for the outcome side. ψ = m₁−m₀ + t(y−m₁)/e − (1−t)(y−m₀)/(1−e),
      // 9-decimal-snapped per cell and summed in exact DECIMAL. Corpus
      // work: the cell groupBy + iters propensity scans + ONE moment
      // aggregate (d²-moment pattern, 2 rows collected).
      val u = cat(s, dir).events
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(
          max(when(col("event_type") === "click", 1.0).otherwise(0.0)).as("t"),
          max(when(col("event_type") === "purchase", 1.0).otherwise(0.0)).as("y"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .cast("double").as("x1"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .cast("double").as("x2"),
          sum(when(col("event_type") === "signup", 1L).otherwise(0L))
            .cast("double").as("x3"))
        .select(col("t"), col("y"), col("x1"), col("x2"), col("x3"),
          array(col("x1"), col("x2"), col("x3")).as("v"))
        // Consumed by the propensity fit's cache fill AND the moment pass —
        // materialize the narrow cell frame once, don't re-aggregate events.
        .localCheckpoint(eager = true)
      val wts = Classify.logregWeights(u, "v", "t", iters = 3, lr = 1.0)
      val eProp = greatest(least(Classify.logregProb(wts, col("v")),
        lit(0.95)), lit(0.05))
      // Per-arm OLS moments — every sum is an exact integer in a double.
      val mo = u.groupBy("t").agg(
          count(lit(1)).cast("double").as("n"),
          sum("x1").as("s1"), sum("x2").as("s2"), sum("x3").as("s3"),
          sum(col("x1") * col("x1")).as("s11"),
          sum(col("x1") * col("x2")).as("s12"),
          sum(col("x1") * col("x3")).as("s13"),
          sum(col("x2") * col("x2")).as("s22"),
          sum(col("x2") * col("x3")).as("s23"),
          sum(col("x3") * col("x3")).as("s33"),
          sum("y").as("sy"),
          sum(col("x1") * col("y")).as("s1y"),
          sum(col("x2") * col("y")).as("s2y"),
          sum(col("x3") * col("y")).as("s3y"))
        .collect().map(r => r.getDouble(0) -> r).toMap // 2 rows: the arms
      def r9(x: Double): Double =
        BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      // Centered 3x3 Cramer — the EXACT expression structure the oracle
      // SQL computes, term for term, so the betas agree bitwise pre-snap.
      def betas(arm: Double): (Double, Double, Double, Double) = {
        val r = mo(arm)
        def g(name: String): Double = r.getAs[Any](name) match {
          case d: java.lang.Double => d
          case l: java.lang.Long => l.toDouble
        }
        val n = g("n")
        val (s1, s2, s3) = (g("s1"), g("s2"), g("s3"))
        val c11 = g("s11") - s1 * s1 / n
        val c12 = g("s12") - s1 * s2 / n
        val c13 = g("s13") - s1 * s3 / n
        val c22 = g("s22") - s2 * s2 / n
        val c23 = g("s23") - s2 * s3 / n
        val c33 = g("s33") - s3 * s3 / n
        val c1y = g("s1y") - s1 * g("sy") / n
        val c2y = g("s2y") - s2 * g("sy") / n
        val c3y = g("s3y") - s3 * g("sy") / n
        val det = c11 * (c22 * c33 - c23 * c23) -
          c12 * (c12 * c33 - c23 * c13) + c13 * (c12 * c23 - c22 * c13)
        val b1 = (c1y * (c22 * c33 - c23 * c23) -
          c12 * (c2y * c33 - c23 * c3y) + c13 * (c2y * c23 - c22 * c3y)) / det
        val b2 = (c11 * (c2y * c33 - c23 * c3y) -
          c1y * (c12 * c33 - c23 * c13) + c13 * (c12 * c3y - c2y * c13)) / det
        val b3 = (c11 * (c22 * c3y - c2y * c23) -
          c12 * (c12 * c3y - c2y * c13) + c1y * (c12 * c23 - c22 * c13)) / det
        val b0 = g("sy") / n - b1 * s1 / n - b2 * s2 / n - b3 * s3 / n
        (r9(b0), r9(b1), r9(b2), r9(b3))
      }
      val (t0, t1) = (betas(0.0), betas(1.0))
      def m(b: (Double, Double, Double, Double)) =
        round(lit(b._1) + lit(b._2) * col("x1") + lit(b._3) * col("x2") +
          lit(b._4) * col("x3"), 6)
      val scored = u.select(col("t"), col("y"), eProp.as("e"),
        m(t1).as("m1"), m(t0).as("m0"))
      val terms = scored.select(col("t"),
        round(col("m1") - col("m0"), 9).as("om"),
        round(col("m1") - col("m0") +
          col("t") * (col("y") - col("m1")) / col("e") -
          (lit(1.0) - col("t")) * (col("y") - col("m0")) /
            (lit(1.0) - col("e")), 9).as("psi"))
      def dsum(c: String) =
        sum(col(c).cast("decimal(28,12)")).cast("double")
      terms.agg(count(lit(1)).as("n"),
          sum(col("t")).cast("bigint").as("n_treat"),
          dsum("om").as("som"), dsum("psi").as("spsi"))
        .select(col("n"), col("n_treat"),
          round(col("som") / col("n"), 6).as("ate_om"),
          round(col("spsi") / col("n"), 6).as("ate_aipw"))
    }),
    "q_diff_in_diff" -> ((s, dir) => {
      // Difference-in-differences across the hash arms and a mid-series
      // cutover — the quasi-experimental readout when assignment isn't
      // randomized per event. Four cells (arm × period) reduce out of ONE
      // grouped scan as (n, Σv, Σv²); DiD, its Welch-style SE, and t are
      // closed forms over those 12 numbers, 4-decimal snapped.
      val cut = lit("2024-01-16").cast("date")
      val cells = cat(s, dir).events
        .filter(col("event_type") === "purchase")
        .groupBy((col("user_id") % 2).as("arm"),
          (to_date(col("ts")) >= cut).cast("int").as("post"))
        .agg(count(lit(1)).as("n"), sum("value").as("sv"),
          sum(col("value") * col("value")).as("svv"))
        .select(col("arm"), col("post"), col("n"),
          (col("sv") / col("n")).as("m"),
          ((col("svv") - col("sv") * col("sv") / col("n")) / (col("n") - 1))
            .as("vr"))
      def cell(a: Int, p: Int, suf: String) =
        cells.filter(col("arm") === a && col("post") === p)
          .select(col("n").as(s"n$suf"), col("m").as(s"m$suf"),
            col("vr").as(s"v$suf"))
      val j = cell(0, 0, "00").crossJoin(broadcast(cell(0, 1, "01")))
        .crossJoin(broadcast(cell(1, 0, "10")))
        .crossJoin(broadcast(cell(1, 1, "11"))) // four 1-row frames
      val did = (col("m11") - col("m10")) - (col("m01") - col("m00"))
      val se = sqrt(col("v00") / col("n00") + col("v01") / col("n01") +
        col("v10") / col("n10") + col("v11") / col("n11"))
      j.select(col("n00"), col("n01"), col("n10"), col("n11"),
        round(col("m00"), 4).as("mean_c_pre"),
        round(col("m01"), 4).as("mean_c_post"),
        round(col("m10"), 4).as("mean_t_pre"),
        round(col("m11"), 4).as("mean_t_post"),
        round(did, 4).as("did"), round(did / se, 4).as("t"))
    }),
    "q_cuped" -> ((s, dir) => {
      // CUPED variance reduction (Deng et al. 2013) — the modern A/B
      // readout: adjust each user's post-period spend by their pre-period
      // covariate, y* = y − θ(x − x̄), θ = cov(x,y)/var(x). Stage 1 is one
      // per-user grouped scan (pre/post spend per user, zeros kept — a
      // user with no pre activity still counts); stage 2 is one global
      // raw-moment aggregate; per-arm adjusted means assemble in the
      // projection. Reports the variance-reduction percentage that
      // justifies shipping the adjustment.
      val cut = lit("2024-01-16").cast("date")
      val e = cat(s, dir).events.filter(col("event_type") === "purchase")
      val perUser = e.groupBy(col("user_id"))
        .agg(sum(when(to_date(col("ts")) < cut, col("value"))
          .otherwise(lit(0.0))).as("x"),
          sum(when(to_date(col("ts")) >= cut, col("value"))
            .otherwise(lit(0.0))).as("y"))
        .select((col("user_id") % 2).as("arm"), col("x"), col("y"))
      val m = perUser.agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum("y").as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"), sum(col("y") * col("y")).as("syy"))
      val nd = col("n").cast("double")
      val theta = (col("sxy") - col("sx") * col("sy") / nd) /
        (col("sxx") - col("sx") * col("sx") / nd)
      val mt = m.select(col("n"), theta.as("theta"),
        (col("sx") / nd).as("mx"), col("sy"), col("sxx"), col("sxy"),
        col("syy"), col("sx"))
      val arms = perUser.crossJoin(broadcast(mt))
        .select(col("arm"), col("y"),
          (col("y") - col("theta") * (col("x") - col("mx"))).as("ystar"))
        .groupBy("arm")
        .agg(count(lit(1)).as("n_users"), round(avg("y"), 4).as("mean_y"),
          round(avg("ystar"), 4).as("mean_y_adj"),
          round(var_samp("y"), 2).as("var_y"),
          round(var_samp("ystar"), 2).as("var_y_adj"))
      arms.select(col("arm"), col("n_users"), col("mean_y"),
          col("mean_y_adj"),
          round((lit(1.0) - col("var_y_adj") / col("var_y")) * 100.0, 2)
            .as("var_reduction_pct"))
        .orderBy("arm")
    }),
    "q_ks_test" -> ((s, dir) => {
      // Two-sample Kolmogorov–Smirnov on the experiment arms — the
      // distribution-shape companion to q_mann_whitney's location test
      // (q_auc's KS is classifier-score KS; this is the two-sample form).
      // Same bounded distinct-value table: D = sup|F0 − F1| assembles from
      // exact integer cumulative counts, so the statistic is deterministic
      // to the bit; the asymptotic p-value uses the 3-term alternating
      // Kolmogorov series, mirrored term-for-term in the oracle.
      val g = cat(s, dir).events
        .filter(col("event_type") === "purchase")
        .select((col("user_id") % 2).as("arm"), col("value").as("v"))
        .groupBy("v")
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0g"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1g"))
      val w = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = g.select(sum("n0g").over(w).as("c0"), sum("n1g").over(w).as("c1"))
      val tot = g.agg(sum("n0g").as("n0"), sum("n1g").as("n1"))
      val d = cum.crossJoin(broadcast(tot))
        .select(abs(col("c0").cast("double") / col("n0").cast("double") -
          col("c1").cast("double") / col("n1").cast("double")).as("gap"),
          col("n0"), col("n1"))
        .groupBy("n0", "n1").agg(max("gap").as("d"))
      val lam = sqrt(col("n0").cast("double") * col("n1").cast("double") /
        (col("n0") + col("n1")).cast("double")) * col("d")
      def term(k: Int) = lit(if (k % 2 == 1) 2.0 else -2.0) *
        exp(lit(-2.0 * k * k) * lam * lam)
      d.select(col("n0"), col("n1"), round(col("d"), 6).as("d_stat"),
        round(lam, 4).as("ks_lambda"),
        round(term(1) + term(2) + term(3), 6).as("p_approx"))
    }),
    "q_interpolate" -> ((s, dir) => {
      // Linear gap interpolation over a sparse daily series — the two-sided
      // complement of q_forward_fill: missing days take the straight line
      // between their bracketing observations, ends stay null. The series
      // (daily MAX of high-value purchases — max, not avg, so every known
      // point is an exact input double) has real gaps at small SF and
      // densifies at scale, where interpolation degrades gracefully to
      // identity. The windows are over the CALENDAR SPINE (bounded by the
      // date range, not the corpus), so the single-partition window holds
      // at any data scale.
      val e = cat(s, dir).events
      val bounds = e.agg(min(to_date(col("ts"))).as("d0"),
        max(to_date(col("ts"))).as("d1"))
      val spine = bounds.select(explode(sequence(col("d0"), col("d1"))).as("d"))
      val known = e
        .filter(col("event_type") === "purchase" && col("value") >= 250)
        .groupBy(to_date(col("ts")).as("d")).agg(max("value").as("v"))
      val wPrev = Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wNext = Window.orderBy("d")
        .rowsBetween(0, Window.unboundedFollowing)
      spine.join(known, Seq("d"), "left")
        .select(col("d"), col("v"),
          last("v", ignoreNulls = true).over(wPrev).as("pv"),
          last(when(col("v").isNotNull, col("d")), ignoreNulls = true)
            .over(wPrev).as("pd"),
          first("v", ignoreNulls = true).over(wNext).as("nv"),
          first(when(col("v").isNotNull, col("d")), ignoreNulls = true)
            .over(wNext).as("nd"))
        .select(col("d"), col("v").isNotNull.as("is_known"),
          round(when(col("v").isNotNull, col("v"))
            .when(col("pv").isNotNull && col("nv").isNotNull,
              col("pv") + (col("nv") - col("pv")) *
                datediff(col("d"), col("pd")) / datediff(col("nd"), col("pd"))),
            4).as("v_fill"))
        .orderBy("d")
    }),
    "q_holt_winters" -> ((s, dir) => {
      // Holt–Winters ADDITIVE triple smoothing (α=1/2, β=3/10, γ=1/5,
      // period 7) of each type's daily volume — q_holt_forecast plus the
      // seasonal component, the full classical forecaster. Same integer
      // micro-unit discipline: the smoothing constants are exact integer
      // div steps, the seasonal array rides the fold state, so every
      // engine lands on a bit-identical trajectory (the oracle unrolls the
      // identical recurrence with s0..s6 columns in a recursive CTE).
      // Init: l₀ = first-week mean, b₀ = 0, s_d = y_d − l₀; the fold then
      // consumes days 8..n. One shuffle groups each type's calendar-bounded
      // series — the q_ema/q_holt_forecast scale shape.
      val lNew = "((y.yus - element_at(st.s, CAST(st.i % 7 AS INT) + 1) " +
        "+ st.l + st.b) div 2)"
      val daily = cat(s, dir).events
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg((count(lit(1)) * 1000000L).as("yus"))
      daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          array_sort(collect_list(struct(col("day"), col("yus")))).as("seq"))
        .filter(col("n_days") >= 8) // need a full init week + one step
        .select(col("event_type"), col("n_days"), expr(
          // l0 in µ-units; s init = deviations of the first week from l0
          "aggregate(slice(seq, 8, size(seq) - 7), " +
            "named_struct(" +
            "'l', aggregate(slice(seq, 1, 7), CAST(0 AS BIGINT), (a, x) -> a + x.yus) div 7, " +
            "'b', CAST(0 AS BIGINT), " +
            "'s', transform(slice(seq, 1, 7), x -> x.yus - " +
            "(aggregate(slice(seq, 1, 7), CAST(0 AS BIGINT), (a, x) -> a + x.yus) div 7)), " +
            "'i', 7), " +
            "(st, y) -> named_struct(" +
            s"'l', $lNew, " +
            s"'b', (3 * ($lNew - st.l) + 7 * st.b) div 10, " +
            s"'s', transform(st.s, (v, k) -> IF(k = CAST(st.i % 7 AS INT), " +
            s"(y.yus - $lNew + 4 * v) div 5, v)), " +
            "'i', st.i + 1))")
          .as("st"))
        .select(col("event_type"), col("n_days"),
          (col("st.l") / 1000000.0).as("level"),
          (col("st.b") / 1000000.0).as("trend"),
          ((array_max(col("st.s")) - array_min(col("st.s"))) / 1000000.0)
            .as("seas_range"),
          ((col("st.l") + col("st.b") +
            element_at(col("st.s"), (col("n_days") % 7).cast("int") + 1))
            / 1000000.0).as("forecast_1"),
          ((col("st.l") + lit(7) * col("st.b") +
            element_at(col("st.s"), ((col("n_days") + 6) % 7).cast("int") + 1))
            / 1000000.0).as("forecast_7"))
        .orderBy("event_type")
    }),
    "q_forecast_backtest" -> ((s, dir) => {
      // Forecaster model selection: one-step-ahead backtest of Holt
      // (level+trend) against Holt–Winters (level+trend+weekly season)
      // over the SAME fold — both models share the first-week-mean init
      // and score days 8..n, so the MAE comparison is apples-to-apples.
      // One pass, one state struct carrying both models; every forecast
      // error accumulates in exact integer micro-units, so the winner
      // column can't flip on float noise. This is the readout that decides
      // whether the seasonal component earns its state.
      val sd = "element_at(st.s, CAST(st.i % 7 AS INT) + 1)"
      val lH = "((y.yus + st.hl + st.hb) div 2)"
      val lW = s"((y.yus - $sd + st.wl + st.wb) div 2)"
      val daily = cat(s, dir).events
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg((count(lit(1)) * 1000000L).as("yus"))
      daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          array_sort(collect_list(struct(col("day"), col("yus")))).as("seq"))
        .filter(col("n_days") >= 8)
        .select(col("event_type"), col("n_days"), expr(
          "aggregate(slice(seq, 8, size(seq) - 7), " +
            "named_struct(" +
            "'hl', aggregate(slice(seq, 1, 7), CAST(0 AS BIGINT), (a, x) -> a + x.yus) div 7, " +
            "'hb', CAST(0 AS BIGINT), " +
            "'wl', aggregate(slice(seq, 1, 7), CAST(0 AS BIGINT), (a, x) -> a + x.yus) div 7, " +
            "'wb', CAST(0 AS BIGINT), " +
            "'s', transform(slice(seq, 1, 7), x -> x.yus - " +
            "(aggregate(slice(seq, 1, 7), CAST(0 AS BIGINT), (a, x) -> a + x.yus) div 7)), " +
            "'i', 7, 'he', CAST(0 AS BIGINT), 'we', CAST(0 AS BIGINT)), " +
            "(st, y) -> named_struct(" +
            s"'hl', $lH, " +
            s"'hb', (3 * ($lH - st.hl) + 7 * st.hb) div 10, " +
            s"'wl', $lW, " +
            s"'wb', (3 * ($lW - st.wl) + 7 * st.wb) div 10, " +
            s"'s', transform(st.s, (v, k) -> IF(k = CAST(st.i % 7 AS INT), " +
            s"(y.yus - $lW + 4 * v) div 5, v)), " +
            "'i', st.i + 1, " +
            "'he', st.he + abs(y.yus - (st.hl + st.hb)), " +
            s"'we', st.we + abs(y.yus - (st.wl + st.wb + $sd))))")
          .as("st"))
        .select(col("event_type"), (col("n_days") - 7).as("n_eval"),
          round(col("st.he").cast("double") /
            ((col("n_days") - 7).cast("double") * 1e6), 4).as("mae_holt"),
          round(col("st.we").cast("double") /
            ((col("n_days") - 7).cast("double") * 1e6), 4).as("mae_hw"),
          when(col("st.we") < col("st.he"), lit("holt_winters"))
            .when(col("st.he") < col("st.we"), lit("holt"))
            .otherwise(lit("tie")).as("winner"))
        .orderBy("event_type")
    }),
    "q_rank_metrics" -> ((s, dir) => {
      // Retrieval-evaluation capstone: P@10, nDCG@10, MRR@10 for the
      // cosine retriever, with same-label membership as graded-binary
      // relevance — the ranking-side complement of q_auc (classifier
      // scores) and q_ann_recall (index fidelity). Candidate generation is
      // the q_knn_join shape (bounded broadcast anchor panel, one corpus
      // scan, bounded-heap top-10); the metric arithmetic runs on exact
      // integer ranks and counts, log2 mirrored in both engines, and only
      // the final per-anchor means round.
      val e = cat(s, dir).embeddings
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"),
          col("label"))
      val norm = graft.functions.ArrayKernels.dot(col("emb"), col("emb"))
      val v = e.withColumn("nrm", sqrt(norm))
      val q = v.select(col("vec_id").as("qid"), col("emb").as("qe"),
          col("nrm").as("qn"), col("label").as("qlbl"))
        .filter(col("qid") % 50 === 0 && col("qid") < 5000)
      val scored = v.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("qlbl"), col("vec_id").as("nid"),
          col("label"),
          (graft.functions.ArrayKernels.dot(col("qe"), col("emb")) /
            (col("qn") * col("nrm"))).as("sim"))
      val top10 = graft.plans.TopKPerGroup.topKPerGroup(scored,
          Seq(col("qid")), Seq(col("sim").desc, col("nid")), 10)
        .withColumn("rel", (col("label") === col("qlbl")).cast("long"))
      // per-label corpus counts → per-anchor total relevant (minus self)
      val labCnt = e.groupBy("label").agg(count(lit(1)).as("lc"))
      val perQ = top10.groupBy("qid", "qlbl")
        .agg(sum("rel").as("hits"),
          sum(col("rel").cast("double") / log2(col("rk") + 1)).as("dcg"),
          min(when(col("rel") === 1, col("rk"))).as("first_rel"))
        .join(broadcast(labCnt), col("qlbl") === col("label"))
        .select(col("qid"), col("hits"), col("dcg"), col("first_rel"),
          (col("lc") - 1).as("nrel"))
      val idcg = expr(
        "aggregate(sequence(1, CAST(least(10, nrel) AS INT)), " +
          "CAST(0.0 AS DOUBLE), (a, i) -> a + 1.0 / log2(i + 1))")
      perQ.select(col("hits"), col("first_rel"),
          when(col("nrel") > 0, col("dcg") / idcg).otherwise(lit(0.0))
            .as("ndcg"),
          coalesce(lit(1.0) / col("first_rel"), lit(0.0)).as("rr"))
        .agg(count(lit(1)).as("n_queries"),
          round(avg(col("hits").cast("double") / 10.0), 4).as("p_at_10"),
          round(avg("ndcg"), 4).as("ndcg_at_10"),
          round(avg("rr"), 4).as("mrr_at_10"))
    }),
  )
}
