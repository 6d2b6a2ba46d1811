package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only plan-audit harness (not part of the driver contract): dumps the
  * physical plan of the named queries (args, or a default recent batch) so
  * a new operator's plan can be eyeballed for the standing red flags —
  * full-width ReadSchema, missing PushedFilters, an unexpected
  * BroadcastNestedLoopJoin/CartesianProduct (1-row stat builds are fine),
  * or an Exchange SinglePartition whose input is NOT a bounded aggregate. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
    else Seq("q_train_split", "q_doc_chunk", "q_transition_matrix",
      "q_inflight", "q_bigram_pmi", "q_unigram_logprob", "q_map_funcs",
      "q_anomaly_days", "q_zipf", "q_debounce", "q_graph_degree")
    names.foreach { n =>
      println(s"========== $n ==========")
      println(graft.SparkEntry.queries(n)(spark, sf)
        .queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
