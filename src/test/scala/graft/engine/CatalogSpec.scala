package graft.engine

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Catalog surface (SURVEY.md §2.1 S6-S11): list/describe/ping/bootstrap over
  * a directory of parquet tables. */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("listTables and describe over a parquet directory") {
    val dir = Files.createTempDirectory("graft_cat").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/t1.parquet")
    Seq((1.5, 2)).toDF("x", "y").write.parquet(s"$dir/t2.parquet")
    val c = new Catalog(spark, dir)
    assert(c.listTables() == Seq("t1", "t2"))
    assert(c.describe("t1") == Seq("id" -> "bigint", "v" -> "string"))
    assert(c.table("t2").count() == 1)
    assert(c.ping())
  }

  test("bootstrapSampleData seeds 5 rows only into an empty catalog (S11)") {
    val dir = Files.createTempDirectory("graft_cat_boot").toString
    val c = new Catalog(spark, dir)
    assert(c.listTables().isEmpty)
    assert(c.bootstrapSampleData())
    assert(c.listTables() == Seq("sample_data"))
    val df = c.table("sample_data")
    assert(df.count() == 5)
    assert(df.columns.toSeq == Seq("id", "name", "age", "email", "created_at"))
    // second call is a no-op: tables exist now
    assert(!c.bootstrapSampleData())
    assert(c.table("sample_data").count() == 5)
  }
}
