package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import SparkEntry.cat

/** Privacy/disclosure-audit tier of the driver surface: k-anonymity, l-diversity, t-closeness, and differentially-private count/quantile release over the documents corpus.
  *
  * Extracted verbatim from [[SparkEntry.queriesBase]] — same keys, same
  * closures, zero behavior change; the matching oracle SQL stays in
  * [[OracleSql]]. */
object PrivacyQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_k_anonymity" -> ((s, dir) => {
      // Privacy-side curation audit: k-anonymity of the quasi-identifier
      // tuple (nation, market segment, account-balance band). Every class
      // with fewer than k=5 members is a re-identification risk the
      // release gate must generalize or suppress. One partial-agg'd scan;
      // class cardinality is bounded by the QI domain, not the corpus.
      cat(s, dir).customer
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("bigint").as("bal_band"))
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(count(lit(1)).as("n"))
        .withColumn("at_risk", (col("n") < 5).cast("int"))
        .orderBy("c_nationkey", "c_mktsegment", "bal_band")
    }),

    "q_l_diversity" -> ((s, dir) => {
      // k-anonymity's companion audit: a QI class can be k-anonymous yet
      // still leak if every member shares the sensitive value. l-diversity
      // counts DISTINCT sensitive values (market segment) per
      // (nation, balance-band) class; l < 3 is a homogeneity risk the
      // release gate must generalize away. Same single partial-agg'd scan
      // shape as q_k_anonymity.
      cat(s, dir).customer
        .select(col("c_nationkey"),
          floor(col("c_acctbal") / 1000).cast("bigint").as("bal_band"),
          col("c_mktsegment"))
        .groupBy("c_nationkey", "bal_band")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("c_mktsegment")).as("l"))
        .withColumn("at_risk", (col("l") < 3).cast("int"))
        .orderBy("c_nationkey", "bal_band")
    }),

    "q_t_closeness" -> ((s, dir) => {
      // Third leg of the release-audit triad (k-anonymity → l-diversity →
      // t-closeness): a QI class can be k-anonymous AND l-diverse yet still
      // leak when its sensitive-value DISTRIBUTION is skewed vs the table
      // (all l values present but 90% one of them). t = total-variation
      // distance between the class's market-segment distribution and the
      // global one. Computed in exact integer arithmetic — Σ|cnt·N − g·n_c|
      // stays BIGINT (order-free sum), one double division at the end — so
      // the result is bit-deterministic across engines and partitionings
      // (same discipline as the decimal centroid path). The grid join is
      // QI-bounded (classes × |segments|), never corpus-bounded: both
      // sides broadcast at any scale. Overflow bound: cnt·N ≤ N² must fit
      // a long, i.e. N ≲ 3e9 rows per audit — beyond that, cast the two
      // count factors to decimal(19,0) (products become exact
      // decimal(38,0)) or shard the audit by a QI column first.
      val cust = cat(s, dir).customer
        .select(col("c_nationkey"),
          floor(col("c_acctbal") / 1000).cast("bigint").as("bal_band"),
          col("c_mktsegment").as("seg"))
      val glob = cust.groupBy("seg").agg(count(lit(1)).as("g"))
      val tot = cust.agg(count(lit(1)).as("n_tot"))
      val cls = cust.groupBy("c_nationkey", "bal_band")
        .agg(count(lit(1)).as("n_c"))
      val cell = cust.groupBy("c_nationkey", "bal_band", "seg")
        .agg(count(lit(1)).as("cnt"))
      cls.crossJoin(broadcast(glob))
        .join(cell, Seq("c_nationkey", "bal_band", "seg"), "left")
        .na.fill(0L, Seq("cnt"))
        .crossJoin(broadcast(tot))
        .groupBy(col("c_nationkey"), col("bal_band"), col("n_c"),
          col("n_tot"))
        .agg(sum(abs(col("cnt") * col("n_tot") - col("g") * col("n_c")))
          .as("tvd_num"))
        .select(col("c_nationkey"), col("bal_band"), col("n_c").as("n"),
          round(col("tvd_num") / (lit(2.0) * col("n_c") * col("n_tot")), 9)
            .as("t"),
          // t > 0.2 in exact integers: 5·tvd_num > 2·n_c·N
          (col("tvd_num") * 5 > col("n_c") * col("n_tot") * 2).cast("int")
            .as("at_risk"))
        .orderBy("c_nationkey", "bal_band")
    }),

    "q_dp_count" -> ((s, dir) => {
      // Differentially-private release of the per-nation customer
      // histogram: Laplace(1/ε) noise via inverse-CDF over a seeded
      // per-key uniform (Knuth multiplicative hash of the group key), so
      // the release is reproducible AND oracle-checkable — a production
      // release swaps the hash draw for a CSPRNG, identical plan shape.
      // ε=1, sensitivity 1 (each customer lands in exactly one bucket).
      // Corpus-size work is only the grouped count; the noise math is a
      // handful of scalar ops on the nation-bounded aggregate. The ln()
      // draw is a single libm call per group, rounded to 3 decimals —
      // like kmeansLloyd this is a probabilistic (≈1e-13/row) rather than
      // absolute cross-engine guarantee.
      // +0.5 grain shift keeps u in the OPEN interval (-0.5, 0.5): the
      // key-0 draw would otherwise hit u = -0.5 exactly → ln(0) = -∞.
      val u = ((col("c_nationkey") * lit(2654435761L)) % lit(4294967296L) +
        lit(0.5)) / lit(4294967296.0) - lit(0.5)
      val noise =
        round(lit(-1.0) * signum(u) * log(lit(1.0) - lit(2.0) * abs(u)), 3)
      cat(s, dir).customer
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_true"))
        .select(col("c_nationkey"), col("n_true"), noise.as("noise"),
          round(col("n_true") + noise, 3).as("n_dp"))
        .orderBy("c_nationkey")
    }),

    // ------------------------------------------------------------ round 8j
    "q_dp_quantile" -> ((s, dir) => {
      // Differentially-private median via the EXPONENTIAL MECHANISM — the
      // selection-query complement of q_dp_count's Laplace release:
      // candidates are the distinct purchase values (bounded table),
      // utility is the integer rank distance to the median, and the
      // Gumbel-max trick samples ∝ exp(ε·u/2) with the q_dp_count seeding
      // discipline (Knuth multiplicative hash of the cent-quantized value
      // — integer, so no cross-engine float-to-string hazard; a production
      // release swaps the hash draw for a CSPRNG, identical plan shape).
      // Everything before the two libm calls is exact integer arithmetic.
      val g = cat(s, dir).events
        .filter(col("event_type") === "purchase")
        .groupBy(col("value").as("v")).agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
      val tot = g.agg(sum("cnt").as("n"))
      val ranked = g.select(col("v"), col("cnt"),
          coalesce(sum("cnt").over(w), lit(0L)).as("cb"))
        .crossJoin(broadcast(tot))
      // center2 = 2·cumBefore + cnt: twice the value's mid-rank; utility
      // is −|center2 − n| (integer half-steps, sensitivity 2 per record)
      val util = -abs(col("cb") * 2 + col("cnt") - col("n"))
      val cents = round(col("v") * 100.0).cast("long")
      val u = ((cents * lit(2654435761L)) % lit(4294967296L) + lit(0.5)) /
        lit(4294967296.0)
      val gumbel = -log(-log(u))
      val score = util.cast("double") * 0.25 + gumbel // ε/2 with ε=0.5
      val trueMed = ranked.filter(col("cb") * 2 + col("cnt") >= col("n"))
        .agg(min("v").as("true_median"))
      val pick = ranked
        .select(col("n"), struct(score.as("s"), (-col("v")).as("nv"),
          col("v").as("v"), (-util).as("gap")).as("t"))
        .groupBy("n").agg(max("t").as("t"))
        .select(col("n"), col("t.v").as("dp_median"),
          col("t.gap").as("rank_gap"))
      pick.crossJoin(broadcast(trueMed)) // 1-row frames
        .select(col("n"), col("true_median"), col("dp_median"),
          col("rank_gap"))
    }),

  )
}
