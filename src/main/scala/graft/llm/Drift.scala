package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distribution-shift (PSI) machinery shared by the batch audit
  * (q_source_drift) and its streaming deployment (q_stream_drift): token
  * mass is routed into 64 md5-hashed buckets (portable-hash idiom), each
  * source's Laplace-smoothed bucket distribution is compared to the corpus
  * reference via PSI = Σ (p−q)·ln(p/q) — every term ≥ 0, so the sum is a
  * true divergence. The fold runs over the sorted 64-bucket list so any
  * engine sums in index order. */
object Drift {

  val Buckets = 64

  /** (source, b) token-bucket rows: one exploded pass over (source, text). */
  def bucketize(df: DataFrame): DataFrame =
    df.select(col("source"), explode(split(col("text"), " ")).as("w"))
      .select(col("source"),
        expr(s"CAST(conv(substring(md5(w), 1, 6), 16, 10) AS BIGINT) % $Buckets").as("b"))

  /** PSI per source from bucket-count frames: `perSrc` = (source, b, c),
    * `corpus` = (b, cc), `nc` = corpus token total. Densifies the
    * (source × Buckets) grid so absent buckets still contribute their
    * smoothed mass. Output: (source, n_tokens, psi) ordered by source. */
  def psiFromCounts(spark: SparkSession, perSrc: DataFrame, corpus: DataFrame,
                    nc: Long): DataFrame = {
    val srcTot = perSrc.groupBy("source").agg(sum("c").as("n"))
    val buckets = spark.range(0, Buckets).select(col("id").as("b"))
    val dense = srcTot.crossJoin(broadcast(buckets))
      .join(perSrc, Seq("source", "b"), "left")
      .select(col("source"), col("b"), col("n"),
        coalesce(col("c"), lit(0L)).as("c"))
    val denseC = buckets.join(corpus, Seq("b"), "left")
      .select(col("b"), coalesce(col("cc"), lit(0L)).as("cc"))
    val terms = dense
      .join(broadcast(denseC), "b")
      .select(col("source"), col("b"), col("n"),
        ((col("c") + 1).cast("double") / (col("n") + Buckets)).as("p"),
        ((col("cc") + 1).cast("double") / lit((nc + Buckets).toDouble)).as("q"))
      .select(col("source"), col("b"), col("n"),
        ((col("p") - col("q")) * log(col("p") / col("q"))).as("t"))
    terms.groupBy("source")
      .agg(max(col("n")).as("n_tokens"),
        round(aggregate(
          transform(array_sort(collect_list(struct(col("b"), col("t")))),
            s => s.getField("t")),
          lit(0.0), (acc, x) => acc + x), 6).as("psi"))
      .orderBy("source")
  }
}
