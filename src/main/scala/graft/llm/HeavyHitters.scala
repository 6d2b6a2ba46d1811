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
    * ≤ n/(k+1) overall.
    *
    * The buffer is a MUTABLE HashMap updated in place: the udaf wrapper is a
    * TypedImperativeAggregate, whose buffer lives as a deserialized JVM
    * object for a whole partition and crosses the wire (kryo) only at the
    * shuffle boundary — so per-row reduce is one hash probe + in-place
    * update, not a full immutable-Map rebuild (the sketch's hot path: every
    * input row of the corpus goes through it). */
  class MisraGries(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, scala.collection.mutable.HashMap[String, Long], Map[String, Long]] {
    require(k >= 1, "MisraGries: k must be >= 1")
    private type Buf = scala.collection.mutable.HashMap[String, Long]

    override def zero: Buf = scala.collection.mutable.HashMap.empty

    override def reduce(b: Buf, x: String): Buf = {
      if (x == null) return b
      val cur = b.getOrElse(x, -1L)
      if (cur >= 0) b.update(x, cur + 1)
      else if (b.size < k) b.update(x, 1L)
      else {
        // miss without room: decrement every counter, drop the zeroed ones
        // (two passes so the map isn't mutated mid-iteration; no allocation
        // beyond the usually-empty drop list)
        var dropped = List.empty[String]
        b.mapValuesInPlace { (t, c) => if (c == 1L) { dropped ::= t }; c - 1L }
        dropped.foreach(b.remove)
      }
      b
    }

    override def merge(a: Buf, b: Buf): Buf = {
      b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
      if (a.size > k) {
        // subtract the (k+1)-th largest count from everyone, keep positives
        val cut = a.values.toArray.sorted(Ordering[Long].reverse)(k)
        var dropped = List.empty[String]
        a.mapValuesInPlace { (t, c) => if (c <= cut) { dropped ::= t }; c - cut }
        dropped.foreach(a.remove)
      }
      a
    }

    override def finish(m: Buf): Map[String, Long] = m.toMap
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
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
