package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only micro-timer (not part of the driver contract): run named
  * queries N times each after a warmup pass and print per-run wall times —
  * finer-grained than Bench for isolating a single query's job structure. */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    new graft.engine.Catalog(spark, sf).listTables()
      .foreach(t => spark.read.parquet(s"$sf/$t.parquet").count())
    args(0).split(",").foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sf).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
