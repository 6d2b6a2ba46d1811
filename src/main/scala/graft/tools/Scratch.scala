package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.Catalog
import graft.llm.Dedup

/** Dev-only profiling scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = new Catalog(spark, "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("warmup")(c.documents.count())
    for (i <- 1 to 3)
      t(s"minhashNearDups run $i")(
        Dedup.minhashNearDups(c.documents, "doc_id", "text", threshold = 0.2).count())
    spark.stop()
  }
}
