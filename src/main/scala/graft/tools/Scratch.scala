package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratchpad (not part of the driver contract): run one declared
  * query by name and dump its frame as CSV for an ad-hoc oracle diff. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    args(0).split(",").foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      println(s"=== $name ===")
      println(df.schema.simpleString)
      df.collect().foreach(r => println(r.mkString("|")))
    }
    spark.stop()
  }
}
