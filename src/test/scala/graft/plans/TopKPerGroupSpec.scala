package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The custom top-k-per-group operator (LogicalPlan + Strategy + SparkPlan):
  * result parity with the window formulation, the no-sort plan property that
  * justifies its existence, and edge cases. */
class TopKPerGroupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample(n: Int) = {
    // duplicated order values so the tiebreak column is load-bearing
    spark.range(0, n).toDF("id")
      .withColumn("g", pmod(col("id") * 7, lit(23)))
      .withColumn("v", pmod(col("id") * 13, lit(5)))
      .repartition(8)
  }

  test("matches row_number window formulation exactly (k=3, ties broken)") {
    val df = sample(2000)
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    val expected = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("id", "g", "v", "rk").orderBy("g", "rk")
      .as[(Long, Long, Long, Int)].collect().toSeq
    val got = TopKPerGroup.topKPerGroup(df,
        Seq(col("g")), Seq(col("v").desc, col("id").asc), 3)
      .select("id", "g", "v", "rk").orderBy("g", "rk")
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(got == expected)
  }

  test("k larger than every group returns whole groups, ranked") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "g")
    val got = TopKPerGroup.topKPerGroup(df, Seq(col("g")), Seq(col("id")), 10)
      .orderBy("g", "rk").as[(Long, String, Int)].collect().toSeq
    assert(got == Seq((1L, "a", 1), (2L, "a", 2), (3L, "b", 3 - 2)))
  }

  test("plans as TopKPerGroupExec with NO sort and NO window") {
    val df = sample(500)
    val top = TopKPerGroup.topKPerGroup(df,
      Seq(col("g")), Seq(col("v"), col("id")), 2)
    top.collect()
    val plan = top.queryExecution.executedPlan.toString
    // physical node prints without the Exec suffix (SparkPlan.nodeName)
    assert(plan.contains("TopKPerGroup ["), plan)
    assert(!plan.contains("Window"), s"custom op fell back to a window:\n$plan")
    // the one Sort the window formulation needs per partition must be absent
    assert(!plan.contains("Sort "), s"heap operator still sorts:\n$plan")
  }

  test("downstream operators compose over the custom node") {
    val df = sample(1000)
    val agg = TopKPerGroup.topKPerGroup(df,
        Seq(col("g")), Seq(col("v").desc, col("id")), 2)
      .groupBy("g").agg(count(lit(1)).as("n"), max("rk").as("maxrk"))
    val rows = agg.as[(Long, Long, Int)].collect()
    assert(rows.forall { case (_, n, maxrk) => n == 2 && maxrk == 2 })
  }
}
