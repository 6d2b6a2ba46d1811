package graft.engine

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Sinks (SURVEY.md §2.9): CSV export round-trip, ClickHouse DDL generation,
  * observed ingest counts. */
class SinksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("exportCsv round-trips: write → all-String read == original as strings") {
    val df = Seq((1L, "alice", 10.5), (2L, "bob", 20.0)).toDF("id", "name", "amount")
    val out = tmpDir("graft_csv_sink")
    Sinks.exportCsv(df, out, singleFile = true)
    val files = new java.io.File(out).listFiles.filter(_.getName.endsWith(".csv"))
    assert(files.length == 1) // singleFile mirrors the reference's one attachment
    val back = CsvSource.readWithHeader(spark, files(0).getAbsolutePath)
    assert(back.columns.toSeq == Seq("id", "name", "amount"))
    val rows = back.orderBy("id").collect().map(_.toSeq)
    assert(rows(0) == Seq("1", "alice", "10.5"))
    assert(rows(1) == Seq("2", "bob", "20.0"))
  }

  test("clickHouseDdl mirrors the reference's CREATE TABLE shape (server.js:586-589)") {
    val df = Seq((1, "x", Option(2.5))).toDF("id", "name", "score")
    val ddl = Sinks.clickHouseDdl("target_tbl", df)
    assert(ddl ==
      "CREATE TABLE IF NOT EXISTS target_tbl (id Int32, name Nullable(String), " +
      "score Nullable(Float64)) ENGINE = MergeTree() ORDER BY tuple()")
  }

  test("ingestCopy materializes the projected subset; re-read matches") {
    val df = Seq((3L, "c", 1.0), (1L, "a", 2.0), (2L, "b", 3.0)).toDF("k", "v", "x")
    val out = tmpDir("graft_ingest") + "/t"
    Sinks.ingestCopy(df, Seq("k", "v"), out)
    val back = spark.read.parquet(out)
    assert(back.columns.toSeq == Seq("k", "v"))
    assert(back.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("ingestCopyObserved reports the true written row count (not the reference's total===count bug)") {
    val df = Seq.tabulate(123)(i => (i.toLong, s"v$i")).toDF("k", "v")
    val out = tmpDir("graft_ingest_obs") + "/t"
    val n = Sinks.ingestCopyObserved(spark, df, Seq("k"), out)
    assert(n == 123L)
    assert(spark.read.parquet(out).count() == 123L)
  }
}
