package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact heavy hitters (frequent items) without a full-width groupBy —
  * the token/domain/url frequency analysis a training-data pipeline runs
  * where the naive `GROUP BY token` would shuffle one row per DISTINCT token
  * (billions of group keys at corpus scale).
  *
  * Two passes, both bounded:
  *  1. Misra-Gries sketch as a typed `Aggregator` (partial aggregation:
  *     each map task folds its rows into a k-counter summary; the shuffle
  *     carries one small map per task). Guarantee: every item with true
  *     frequency > n/(k+1) survives in the merged summary — the candidate
  *     set is a SUPERSET of the true heavy hitters, never a miss.
  *  2. Exact recount of the ≤k candidates only (a broadcast-able IN filter,
  *     then a groupBy over ≤k keys), thresholded at > n/support.
  *
  * Because pass 1 can only over-admit and pass 2 is exact, the output equals
  * the full `GROUP BY x HAVING count(*) > n/support` EXACTLY (oracle-checked)
  * while the widest aggregation ever performed has ≤k groups. Choose
  * k >= support so the guarantee threshold n/(k+1) sits below the reporting
  * threshold n/support.
  */
object HeavyHitters {

  /** Misra-Gries summary of a string column: at most k counters.
    * reduce: hit → increment; miss with room → insert; miss without room →
    * decrement all (drop zeros). merge: sum counts, then subtract the
    * (k+1)-th largest count and truncate — error bounds add, staying
    * ≤ n/(k+1) overall. */
  class MisraGries(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, "MisraGries: k must be >= 1")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], x: String): Map[String, Long] = {
      if (x == null) b
      else b.get(x) match {
        case Some(c) => b.updated(x, c + 1)
        case None if b.size < k => b.updated(x, 1L)
        case None =>
          b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
      }
    }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val summed = b.foldLeft(a) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (summed.size <= k) summed
      else {
        // subtract the (k+1)-th largest count from everyone, keep positives
        val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
        summed.view.mapValues(_ - cut).filter(_._2 > 0).toMap
      }
    }

    override def finish(m: Map[String, Long]): Map[String, Long] = m
    override def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Column form: Misra-Gries summary (map token → residual count). */
  def misraGries(item: Column, k: Int): Column =
    udaf(new MisraGries(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[String]())
      .apply(item)

  /** Exact items with count > n/support over `itemCol`, as
    * (item, cnt) ordered by (cnt desc, item). `k` is the sketch width
    * (default 2×support, comfortably above the guarantee threshold). */
  def heavyHitters(df: DataFrame, itemCol: Column, support: Int,
                   k: Int = 0): DataFrame = {
    val kk = if (k > 0) k else 2 * support
    require(kk >= support, s"sketch width $kk below support $support — " +
      "the survival guarantee n/(k+1) must sit under the n/support threshold")
    val items = df.select(itemCol.cast("string").as("item"))
    // Pass 1: candidates + total row count from ONE aggregation.
    val row = items.agg(misraGries(col("item"), kk).as("mg"),
      count(lit(1)).as("n")).head()
    val candidates = row.getMap[String, Long](0).keys.toSeq
    val n = row.getLong(1)
    // Pass 2: exact recount of ≤k candidate keys only.
    items.filter(col("item").isin(candidates: _*))
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > n / support)
      .orderBy(col("cnt").desc, col("item"))
  }
}
