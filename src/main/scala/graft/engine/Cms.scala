package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–min sketch kernel (Cormode & Muthukrishnan 2005) shared by the
  * batch audit (q_cms_counts) and its streaming deployment (q_stream_cms):
  * depth 4 × width 64 cells, pairwise-independent affine hashes modulo the
  * Mersenne prime 2^31−1. The sketch is 256 counters REGARDLESS of input
  * size — the whole point at 100 TB: cells are a partial-aggregated
  * grouped count (batch) or a bounded complete-mode streaming state, and
  * point estimates are min-over-4-rows lookups. Estimates never
  * undercount; the overcount is the collision price of the fixed width.
  */
object Cms {

  val depth = 4
  val width = 64L
  private val prime = 2147483647L
  private val as = Seq(1117L, 2333L, 4787L, 9241L)
  private val bs = Seq(313L, 601L, 977L, 1361L)

  /** Bucket of key column `k` under hash row j. */
  def bucket(j: Int, k: Column): Column =
    (lit(as(j)) * k + lit(bs(j))) % prime % width

  /** (j, b) pairs for a key column, one per hash row, as an explodable
    * array — the map-side shape both the batch groupBy and the streaming
    * aggregation consume. */
  def jbs(k: Column): Column = explode(array((0 until depth).map(j =>
    struct(lit(j).as("j"), bucket(j, k).as("b"))): _*))

  /** Sketch cells for a keyed frame: (j, b, c). */
  def cells(keyed: DataFrame, keyCol: String): DataFrame =
    keyed.select(jbs(col(keyCol)).as("jb"))
      .select(col("jb.j").as("j"), col("jb.b").as("b"))
      .groupBy("j", "b").agg(count(lit(1)).as("c"))

  /** Point estimates for a (k, true_cnt) panel against a cells frame:
    * the q_cms_counts output shape (user_id, true_cnt, est_cnt,
    * overcount), ordered by key. */
  def estimates(cellsDf: DataFrame, truth: DataFrame): DataFrame =
    truth.select(col("k"), col("true_cnt"), jbs(col("k")).as("jb"))
      .select(col("k"), col("true_cnt"), col("jb.j").as("j"), col("jb.b").as("b"))
      .join(cellsDf, Seq("j", "b"))
      .groupBy("k", "true_cnt").agg(min("c").as("est_cnt"))
      .select(col("k").as("user_id"), col("true_cnt"), col("est_cnt"),
        (col("est_cnt") - col("true_cnt")).as("overcount"))
      .orderBy("user_id")
}
