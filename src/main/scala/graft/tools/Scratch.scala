package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
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

    val docs = c.documents
    t("warmup docs")(docs.count())
    val sh = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    t("shingles")(sh.count())
    val sigs = sh.withColumn("sig", Dedup.minhashSignature(col("sh"))).select("id", "sig")
      .repartition(col("id"))
    val banded = sigs.select(col("id"), posexplode(Dedup.lshBands(col("sig"), 32, 4)))
      .toDF("id", "band", "bucket")
    t("banded")(banded.count())
    val cand = banded.alias("a").join(banded.alias("b"), Seq("band", "bucket"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    t("candidates")(cand.count())
    t("full")(Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.2).count())
    t("full again")(Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.2).count())
    spark.stop()
  }
}
