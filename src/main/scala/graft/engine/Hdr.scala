package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HdrHistogram-style mergeable quantile sketch (Gil Tene's HdrHistogram /
  * the base-2 DDSketch family, VLDB'19): every positive integer value lands
  * in bucket `octave(v) * 8 + linear-sub-bucket`, where `2^e <= v < 2^(e+1)`
  * defines the octave and the octave is split into 8 equal-width linear
  * sub-buckets. Bucket counts are plain `groupBy(bkt).count` — mergeable by
  * addition, bounded state (64 octaves x 8 buckets max, regardless of row
  * count), one scan — which is why this is the quantile monitor that
  * survives an unbounded 100 TB feed where the exact `percentile`'s global
  * sort-and-histogram does not. The midpoint estimate carries a DETERMINISTIC
  * relative-error bound of 1/16 (half the 1/8 sub-bucket relative width).
  *
  * Every step is integer arithmetic, so the sketch is FULLY oracle-checkable
  * (the [[Kmv]] discipline): `log2` only seeds the octave GUESS; the two
  * integer shift-compare corrections make the octave exact in any engine
  * regardless of the log's last-ulp behavior, and sub-bucket / estimate
  * reconstruction are shifts and integer division all the way down.
  *
  * Reference behavior context: the reference tool delegates aggregates to
  * ClickHouse, whose `quantileTiming`/`quantileBFloat16` are exactly this
  * class of bounded-memory histogram quantile (reference
  * `server/server.js:418` runs plain aggregate pushdown); this module is the
  * Spark-native equivalent with an explicit error contract.
  */
object Hdr {

  /** Sub-buckets per octave (8 = 3 bits): relative sub-bucket width 1/8,
    * midpoint relative error <= 1/16. */
  val SubBuckets = 8

  /** Integer cents for a 2-decimal dollar column: `round(x*100)` is within
    * 1 ulp of the true integer for any double that was parsed from a
    * 2-decimal literal, so both engines land on the same BIGINT. */
  def cents(dollars: Column): Column =
    round(dollars * 100).cast("long")

  /** Exact integer bucket id for positive-long column `c` (staged through
    * `_er`/`_e` so the octave expression is named once): bucket = e*8 + sub
    * with 2^e <= c < 2^(e+1) and sub = ((c - 2^e) * 8) >> e in [0, 8). */
  def withBucket(df: DataFrame, c: String): DataFrame =
    df.withColumn("_er", expr(s"CAST(floor(log2($c)) AS INT)"))
      .withColumn("_e", expr(
        s"""CASE WHEN shiftleft(CAST(1 AS BIGINT), _er) > $c THEN _er - 1
           |     WHEN shiftleft(CAST(1 AS BIGINT), _er + 1) <= $c THEN _er + 1
           |     ELSE _er END""".stripMargin))
      .withColumn("bkt", expr(
        s"""_e * $SubBuckets + CAST(shiftright(
           |  ($c - shiftleft(CAST(1 AS BIGINT), _e)) * $SubBuckets, _e) AS INT)"""
          .stripMargin))
      .drop("_er", "_e")

  /** The sketch itself: bounded bucket-count grid per group. This is the
    * ONLY corpus-sized pass; everything downstream is grid-sized. */
  def bucketCounts(df: DataFrame, group: String, c: String): DataFrame =
    withBucket(df, c).groupBy(col(group), col("bkt"))
      .agg(count(lit(1)).as("cnt"))

  /** The quantiles the panel evaluates, as exact rationals (num/den) so the
    * target rank `ceil(q*n)` is the INTEGER `(n*num + den - 1) div den` —
    * no float crosses an engine boundary. */
  val Quantiles: Seq[(Int, Int, String)] =
    Seq((1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99"))

  /** Estimate each quantile from a (group, bkt, cnt) grid: cumulative counts
    * up the bucket axis, first bucket whose cumulative count reaches the
    * target rank, midpoint of that bucket's [lower, lower+width) value range
    * mapped back to dollars. Grid-sized work (octaves x 8 rows per group). */
  def quantileEstimates(counts: DataFrame, group: String): DataFrame = {
    val w = Window.partitionBy(group).orderBy("bkt")
    val cum = counts
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(Window.partitionBy(group)))
    val spark = counts.sparkSession
    import spark.implicits._
    val qs = Quantiles.toDF("num", "den", "q")
    val targets = cum.select(col(group), col("n")).distinct()
      .crossJoin(broadcast(qs))
      .withColumn("target", expr("(n * num + den - 1) div den"))
    val pick = targets.alias("t")
      .join(cum.alias("c"),
        col(s"t.$group") === col(s"c.$group") && col("c.cum") >= col("t.target"))
      .groupBy(col(s"t.$group").as(group), col("t.q"), col("t.n"))
      .agg(min("c.bkt").as("bkt"))
    pick
      .withColumn("_e", expr(s"bkt div $SubBuckets"))
      .withColumn("_sub", expr(s"bkt % $SubBuckets"))
      .withColumn("_width", expr("shiftright(shiftleft(CAST(1 AS BIGINT), _e), 3)"))
      .withColumn("_lower", expr(
        "shiftleft(CAST(1 AS BIGINT), _e) + _sub * _width"))
      .withColumn("est", round((col("_lower") + col("_width") / 2.0) / 100.0, 2))
      .select(col(group), col("q"), col("n"), col("est"))
  }

  /** Join the sketch estimates against the exact interpolated percentiles
    * they approximate and report the realized relative error (the 1/16
    * contract, checked by HdrSpec). `exactWide` carries one column per
    * quantile label (e50/e90/e99) in CENTS. */
  def withExact(est: DataFrame, exactWide: DataFrame, group: String): DataFrame =
    est.join(exactWide, Seq(group))
      .withColumn("exact", round(expr(
        "CASE q WHEN 'p50' THEN e50 WHEN 'p90' THEN e90 ELSE e99 END") / 100.0, 2))
      .withColumn("rel_err", round(abs(col("est") - col("exact")) / col("exact"), 4))
      .select(col(group), col("q"), col("n"), col("est"), col("exact"), col("rel_err"))
      .orderBy(group, "q")
}
