package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Drift

/** PSI drift monitoring DEPLOYED (the q_source_drift audit in its
  * production shape): the corpus reference marginals are fitted OFFLINE —
  * 64 bucket counts, the model a snapshot is compared against — and
  * incoming documents score ONLINE. Streaming state is exactly the
  * |sources| × 64 per-bucket count grid (complete-mode aggregation —
  * nothing grows with stream length); the PSI fold runs on the drained
  * counts. A 100 TB/day ingest runs this plan against each new crawl
  * snapshot with the reference marginals swapped in at restart, the same
  * model-ships-as-literals economics as [[StreamingClassify]].
  */
object StreamingDrift {

  /** Drain the documents table through the streaming bucket counter, then
    * compute per-source PSI against the batch-fitted corpus marginals.
    * Output == the batch q_source_drift frame, so one oracle checks both
    * paths. */
  def runStreamDriftOnce(spark: SparkSession, parquetPath: String,
                         queryName: String = "graft_stream_drift"): DataFrame = {
    val batch = spark.read.parquet(parquetPath)
    val schema = batch.schema
    // Offline fit: the reference distribution (64 rows + one scalar).
    val corpus = Drift.bucketize(batch).groupBy("b").agg(count(lit(1)).as("cc"))
    val nc = corpus.agg(sum("cc")).head().getLong(0)
    // Online: per-(source, bucket) counts — bounded complete-mode state.
    val dir = EventStreams.stageToDir(parquetPath, queryName)
    val perSrc = Drift.bucketize(spark.readStream.schema(schema).parquet(dir))
      .groupBy("source", "b").agg(count(lit(1)).as("c"))
    val drained = EventStreams.drainOnce(spark, perSrc, queryName, "complete")
    // Re-base the drained grid as a local frame: it is MODEL-sized
    // (|sources| × 64 rows — the same collect economics as the classifier
    // weights), and the memory-sink lineage otherwise trips Catalyst's
    // conflicting-reference resolution inside psiFromCounts' densify
    // self-joins.
    import spark.implicits._
    val counts = drained.select(col("source"), col("b"), col("c"))
      .as[(String, Long, Long)].collect().toSeq.toDF("source", "b", "c")
    Drift.psiFromCounts(spark, counts, corpus, nc)
  }
}
