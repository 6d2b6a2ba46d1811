package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Cms, TsNorm}

/** The count–min sketch DEPLOYED on the streaming engine: cells accumulate
  * as a complete-mode aggregation whose state is exactly the 4×64 counter
  * grid — bounded no matter how long the stream runs, which is what makes
  * a sketch the right frequency monitor for an unbounded 100 TB/day feed
  * (an exact per-key count would grow state with key cardinality).
  * Estimates drain at the end against exact panel counts, producing the
  * SAME frame as the batch q_cms_counts — one oracle checks both paths,
  * the [[StreamingDrift]] / [[StreamingClassify]] parity discipline.
  */
object StreamingSketch {

  /** Drain the events table through the streaming CMS, then evaluate the
    * point-estimate panel. Output == the batch q_cms_counts frame. */
  def runStreamCmsOnce(spark: SparkSession, parquetPath: String,
                       queryName: String = "graft_stream_cms"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(parquetPath)
    val batch = TsNorm.normalizeTs(raw)
    val dir = EventStreams.stageToDir(parquetPath, queryName)
    val keyed = TsNorm.normalizeTs(
        spark.readStream.schema(raw.schema).parquet(dir))
      .select(col("user_id").cast("long").as("k"))
    // Streaming leg: the sketch. groupBy(j, b) counts in complete mode —
    // state is the 256-cell grid, never per-key.
    val cells = keyed.select(Cms.jbs(col("k")).as("jb"))
      .select(col("jb.j").as("j"), col("jb.b").as("b"))
      .groupBy("j", "b").agg(count(lit(1)).as("c"))
    val drained = EventStreams.drainOnce(spark, cells, queryName, "complete")
    // Re-base the drained grid locally (256 rows — model-sized, the
    // StreamingDrift collect economics) before joining the panel.
    import spark.implicits._
    val cellsLocal = drained.select(col("j").cast("int"), col("b"), col("c"))
      .as[(Int, Long, Long)].collect().toSeq.toDF("j", "b", "c")
    // Offline leg: the exact panel truth (12-ish keys at sf0.01).
    val truth = batch.select(col("user_id").cast("long").as("k"))
      .filter(col("k") % 13 === 0)
      .groupBy("k").agg(count(lit(1)).as("true_cnt"))
    Cms.estimates(cellsLocal, truth)
  }
}
