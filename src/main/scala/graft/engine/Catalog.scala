package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spark-native analog of the reference's catalog surface: `SHOW TABLES`
  * (reference/server/server.js:139-144) and `DESCRIBE TABLE`
  * (reference/server/server.js:230-246), re-expressed over a directory of
  * parquet tables.
  *
  * On a real cluster this is a thin veneer over the metastore
  * (`spark.catalog`); here tables are `{dir}/{name}.parquet`. Reads are lazy
  * DataFrames, so Catalyst column pruning / predicate pushdown reach the
  * parquet scan untouched.
  */
final class Catalog(val spark: SparkSession, val dir: String) {

  // Parquet TIMESTAMP(NANOS) columns are rejected by Spark unless read as
  // raw longs; [[TsNorm.normalizeTs]] then converts whatever physical shape
  // the generator produced (ns-as-long, µs NTZ, µs UTC) to TimestampType.
  spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Full-table scan (reference S6, `SELECT * FROM t`, server.js:400-404). */
  def table(name: String): DataFrame =
    TsNorm.normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))

  /** SHOW TABLES (reference S8). */
  def listTables(): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.list()).getOrElse(Array.empty[String]).toSeq
      .filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet"))
      .sorted
  }

  /** DESCRIBE TABLE → (name, type) pairs (reference S9, server.js:230-246). */
  def describe(name: String): Seq[(String, String)] =
    table(name).schema.fields.toSeq.map(f => f.name -> f.dataType.simpleString)

  /** Connection test (reference S10, `client.ping()`, server.js:126-136). */
  def ping(): Boolean = spark.range(1).count() == 1L

  /** Sample-data bootstrap (reference S11, server.js:146-179 +
    * clickhouse/create_sample_table.sql): if the catalog directory holds no
    * tables, seed the 5-row `sample_data` table (so a fresh catalog has
    * something to browse, exactly the reference's empty-database behavior).
    * Returns true when seeding happened. */
  def bootstrapSampleData(): Boolean = {
    if (listTables().nonEmpty) false
    else {
      import org.apache.spark.sql.functions._
      val rows = Seq(
        (1, "John Doe", 30, "john@example.com"),
        (2, "Jane Smith", 25, "jane@example.com"),
        (3, "Bob Johnson", 40, "bob@example.com"),
        (4, "Alice Brown", 35, "alice@example.com"),
        (5, "Charlie Wilson", 28, "charlie@example.com"))
      import spark.implicits._
      rows.toDF("id", "name", "age", "email")
        .withColumn("created_at", current_timestamp()) // reference uses now()
        .write.mode("ignore").parquet(s"$dir/sample_data.parquet")
      true
    }
  }

  /** Convenience accessors for the standard testdata tables. */
  def region: DataFrame    = table("region")
  def nation: DataFrame    = table("nation")
  def customer: DataFrame  = table("customer")
  def supplier: DataFrame  = table("supplier")
  def part: DataFrame      = table("part")
  def orders: DataFrame    = table("orders")
  def lineitem: DataFrame  = table("lineitem")
  def events: DataFrame    = table("events")
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
