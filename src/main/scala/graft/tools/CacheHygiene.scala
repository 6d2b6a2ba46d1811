package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic storage release for localCheckpoint'ed frames.
  *
  * `Dataset.unpersist` only releases CacheManager entries (persist/cache);
  * a localCheckpoint materializes into RDD blocks referenced by the plan's
  * `LogicalRDD` leaf, and those blocks otherwise live until the driver GCs
  * the last frame reference and the ContextCleaner notices. Session memos
  * that EVICT entries (the dup-graph LRU, any checkpoint-backed cache) must
  * release those blocks eagerly, or a long-lived session cycling corpora
  * accretes stale edge/component storage in the block manager.
  */
object CacheHygiene {

  /** Unpersist the block-manager storage behind every `LogicalRDD` leaf of
    * `df`'s plan (the shape a localCheckpoint'ed frame has). No-op for plans
    * without such leaves; swallows failures from already-stopped sessions —
    * their blocks died with the executors. */
  def releaseLocalCheckpoint(df: DataFrame): Unit =
    try {
      df.queryExecution.logical.collectLeaves().foreach {
        case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
    } catch { case _: Throwable => () }

  /** Storage ids of the RDDs behind `df`'s `LogicalRDD` leaves — lets a spec
    * assert their blocks actually left `SparkContext.getPersistentRDDs`
    * after a forced eviction. */
  def checkpointRddIds(df: DataFrame): Seq[Int] =
    df.queryExecution.logical.collectLeaves().collect {
      case lr: LogicalRDD => lr.rdd.id
    }.toSeq
}
