package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

/** K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002) shared
  * by the batch audit (q_kmv_distinct, which rides the bounded-heap
  * TopKPerGroup operator) and the streaming deployment (q_stream_kmv,
  * which rides this typed Aggregator): hash every key to [0,1), keep the
  * K smallest DISTINCT hash values per group, estimate |distinct| =
  * (K−1)/h_K. State per group is K doubles REGARDLESS of how long the
  * stream runs — the cardinality dual of [[Cms]]'s fixed counter grid,
  * and the reason a sketch (not countDistinct) is the right cardinality
  * monitor for an unbounded 100 TB/day feed.
  */
object Kmv {

  val K = 32
  private val prime = 2147483647L

  /** Affine-mod-prime hash to [0,1). The multiplier is LCG-SIZED
    * deliberately: hashes must spread consecutive ids across the range —
    * a small multiplier (the classic rookie KMV bug, caught by the
    * error-envelope spec) leaves small ids clustered near 0 and the
    * estimate lands orders of magnitude high. Exactly computable by any
    * engine in 64-bit integer arithmetic, which is what keeps the sketch
    * DuckDB-oracle-checkable rather than rows-only. */
  def hash(u: Column): Column =
    ((lit(1103515245L) * u + lit(12345L)) % prime).cast("double") / prime.toDouble

  /** Typed Aggregator: the K smallest distinct hash values as a SORTED
    * ascending Array[Double] buffer. The array is natively encoded
    * (ExpressionEncoder, no kryo — a kryo'd ordered-set buffer fails to
    * DECODE inside the streaming state store, which needs the buffer
    * round-trippable through the row format). Once the buffer is full,
    * any row hashing at or above the current K-th value returns the
    * buffer untouched — the overwhelmingly common case on a large feed
    * (probability ≈ K/n_distinct) — so the O(K) arraycopy insert is paid
    * only while the sketch is still learning its tail. */
  class KMinValues(k: Int) extends org.apache.spark.sql.expressions.Aggregator[
      Double, Array[Double], Seq[Double]] {
    require(k >= 2, "KMinValues: k must be >= 2")

    override def zero: Array[Double] = Array.empty

    override def reduce(b: Array[Double], x: Double): Array[Double] = {
      if (b.length == k && x >= b(k - 1)) return b
      val idx = java.util.Arrays.binarySearch(b, x)
      if (idx >= 0) return b // duplicate hash: set semantics
      val ins = -idx - 1
      val n = math.min(b.length + 1, k)
      val nb = new Array[Double](n)
      System.arraycopy(b, 0, nb, 0, ins)
      nb(ins) = x
      System.arraycopy(b, ins, nb, ins + 1, n - ins - 1) // drops old K-th when full
      nb
    }

    override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
      b.foldLeft(a)(reduce)

    override def finish(b: Array[Double]): Seq[Double] =
      b.toSeq // ascending

    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
  }

  /** Column form: ascending K smallest distinct hashes of `h`. */
  def kMinValues(h: Column, k: Int = K): Column =
    udaf(new KMinValues(k), ExpressionEncoder[Double]()).apply(h)

  /** The q_kmv_distinct output frame from a (group, hk) kth-hash frame and
    * the exact distinct counts — shared by the batch and streaming paths
    * so one oracle checks both. */
  def estimates(kth: DataFrame, exact: DataFrame, groupCol: String,
                k: Int = K): DataFrame =
    exact.join(kth, Seq(groupCol))
      .select(col(groupCol), col("n_exact"),
        round(col("hk"), 9).as("kth_h"),
        round(lit((k - 1).toDouble) / col("hk"), 4).as("est"),
        round(abs(lit((k - 1).toDouble) / col("hk") - col("n_exact"))
          / col("n_exact"), 4).as("rel_err"))
      .orderBy(groupCol)
}
