package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only phase timer for the curation capstone: separates the staged-
  * membership cost from the Merkle report cost. */
object CurationProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.count()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val (staged, maxN) = graft.llm.Curation.stagedMembers(docs)
      val t1 = System.nanoTime()
      graft.llm.Curation.reportForTest(staged, maxN).collect()
      val t2 = System.nanoTime()
      println(f"run $i: staged=${(t1 - t0) / 1e9}%.2f report=${(t2 - t1) / 1e9}%.2f maxN=$maxN")
    }
    spark.stop()
  }
}
