package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Flat-file (CSV/TXT) sources with the reference's semantics: every column
  * is `String`, schemas come from the header row, a preset, or positional
  * `column_N` names — never inferred from data values (SURVEY.md §2.1 S2-S5,
  * §2.8 F5; reference/server/server.js:261-349).
  */
object CsvSource {

  /** The reference's hard-coded UK property-price schema, triggered by
    * filenames containing `pp-` or `price-paid`
    * (reference/server/server.js:32-49, 263-266). 16 columns, all String,
    * no header row. */
  val ukPropertyColumns: Seq[String] = Seq(
    "transaction_id", "price", "date_of_transfer", "postcode",
    "property_type", "old_new", "duration", "paon", "saon", "street",
    "locality", "town_city", "district", "county", "ppd_category_type",
    "record_status")

  private def allStringSchema(names: Seq[String]): StructType =
    StructType(names.map(n => StructField(n, StringType, nullable = true)))

  /** Does the filename select the preset UK property schema?
    * (reference/server/server.js:263-266) */
  def isUkPropertyFile(fileName: String): Boolean = {
    val f = fileName.toLowerCase
    f.contains("pp-") || f.contains("price-paid")
  }

  /** Header-row CSV scan (S2): first line supplies trimmed column names,
    * every column String, blank lines dropped (csv-parse `skip_empty_lines`,
    * server.js:480). Spark's CSV reader drops blank lines natively. */
  def readWithHeader(spark: SparkSession, path: String, delimiter: String = ","): DataFrame = {
    val header = firstLine(spark, path)
    val names = header.split(java.util.regex.Pattern.quote(delimiter), -1).map(_.trim).toSeq
    spark.read
      .option("header", "true")
      .option("sep", delimiter)
      .schema(allStringSchema(names))
      .csv(path)
  }

  /** Headerless CSV fallback scan (S3): `column_1..column_N` counted from the
    * first record (server.js:322-349). */
  def readHeaderless(spark: SparkSession, path: String, delimiter: String = ","): DataFrame = {
    val n = firstLine(spark, path).split(java.util.regex.Pattern.quote(delimiter), -1).length
    val names = (1 to n).map(i => s"column_$i")
    spark.read
      .option("header", "false")
      .option("sep", delimiter)
      .schema(allStringSchema(names))
      .csv(path)
  }

  /** Preset-schema scan (S4): UK property files — fixed 16-col String schema,
    * no header row consumed (server.js:261-278). */
  def readUkProperty(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "false")
      .schema(allStringSchema(ukPropertyColumns))
      .csv(path)

  /** Upload staging (S1, reference/server/server.js: multer writes the
    * multipart body under `uploads/` and the original filename rides along
    * in the request): copy an incoming flat file into the staging
    * directory PRESERVING the original filename — schema dispatch (the
    * `pp-`/`price-paid` preset, [[isUkPropertyFile]]) keys off that name,
    * so staging under an anonymized temp name would silently lose the
    * preset. Goes through the Hadoop FS API on both ends, so the staging
    * dir can be HDFS/S3 exactly like local disk, and the staged file is
    * immediately scannable by every reader here. Returns the staged path
    * for [[read]]. */
  def stageUpload(spark: SparkSession, sourcePath: String, stagingDir: String,
                  fileName: Option[String] = None): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(sourcePath)
    val dstDir = new org.apache.hadoop.fs.Path(stagingDir)
    val dst = new org.apache.hadoop.fs.Path(dstDir, fileName.getOrElse(src.getName))
    val dfs = dstDir.getFileSystem(conf)
    dfs.mkdirs(dstDir)
    org.apache.hadoop.fs.FileUtil.copy(
      src.getFileSystem(conf), src, dfs, dst,
      false /* keep source */, true /* overwrite */, conf)
    dst.toString
  }

  /** Dispatch the way the reference does: preset by filename, else header
    * presence decides (the reference always assumes a header unless the
    * preset matched; callers that know better use readHeaderless). */
  def read(spark: SparkSession, path: String, hasHeader: Boolean = true): DataFrame = {
    val name = new java.io.File(path).getName
    if (isUkPropertyFile(name)) readUkProperty(spark, path)
    else if (hasHeader) readWithHeader(spark, path)
    else readHeaderless(spark, path)
  }

  // Header sniffing: one line off the top of the file. Goes through the
  // Hadoop filesystem API (spark.read.text), not local java.io, so it works
  // against object storage (s3a/gcs/hdfs) the same as a local path; the
  // limit(1) stops the scan after the first record batch.
  private def firstLine(spark: SparkSession, path: String): String = {
    import org.apache.spark.sql.functions.{length => strlen, col}
    spark.read.text(path)
      .filter(strlen(col("value")) > 0)
      .limit(1)
      .collect()
      .headOption.map(_.getString(0)).getOrElse("")
  }
}
