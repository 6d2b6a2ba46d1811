package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sinks (SURVEY.md §2.9): CSV export, target-table materialization, batched
  * ingest copy, and observable progress — re-expressed as single lazy Spark
  * write pipelines instead of the reference's 1,000-row literal-INSERT loops
  * (server.js:603-718), which were O(n²) reads via an unordered OFFSET
  * cursor. One `df.write` is a single distributed job with atomic
  * directory-commit semantics.
  */
object Sinks {

  /** CSV export (K1, server.js:391-415: `SELECT * … FORMAT CSVWithNames`).
    * `singleFile = true` mirrors the reference's one-attachment download; at
    * scale leave it false so each task writes its own part file. */
  def exportCsv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(path)
  }

  /** JSON-lines export (K1's other wire format — the reference emits
    * `FORMAT JSON` for query results, server.js:126-136): one object per
    * line, so the file splits on line boundaries and re-reads in parallel
    * with an explicit schema (schema-on-read without an inference scan). */
  def exportJsonl(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").json(path)
  }

  /** ORC export — the third columnar wire format beside parquet and the
    * text formats above: columnar + compressed + min/max-indexed, so a
    * re-read gets pushdown and pruning like parquet (the right interchange
    * format when the consumer is Hive/Trino rather than a CSV client). */
  def exportOrc(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").orc(path)
  }

  /** XML export (Spark 4's built-in XML source) — the markup wire format
    * for consumers that want element-per-row documents. Like CSV, XML
    * carries no type system, so the matching read side supplies an explicit
    * schema (schema-on-read; never an inference scan over the corpus). */
  def exportXml(df: DataFrame, path: String, rowTag: String,
                singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").format("xml").option("rowTag", rowTag).save(path)
  }

  /** Target-table DDL (K2, server.js:586-601): the CREATE TABLE string the
    * reference ships to ClickHouse, generated from a Spark schema. For a real
    * ClickHouse target this becomes JDBC `createTableOptions`. */
  def clickHouseDdl(targetTable: String, df: DataFrame,
                    engine: String = "MergeTree()",
                    orderBy: String = "tuple()"): String = {
    val cols = df.schema.fields
      .map(f => s"${f.name} ${ClickHouseTypes.toClickHouse(f.dataType, f.nullable)}")
      .mkString(", ")
    s"CREATE TABLE IF NOT EXISTS $targetTable ($cols) ENGINE = $engine ORDER BY $orderBy"
  }

  /** Ingest copy (K3/K4 + L3): projected copy of a source into a parquet
    * "table". Replaces the reference's paged SELECT/INSERT loop with one
    * shuffle-free scan→project→write job. */
  def ingestCopy(df: DataFrame, cols: Seq[String], targetPath: String): Unit =
    df.select(cols.map(col): _*).write.mode("overwrite").parquet(targetPath)

  /** Writer configured for a real ClickHouse target over JDBC (K2-K4's
    * production path): DDL options carry the reference's engine clause, rows
    * stream in `batchsize` batches — the reference's 1,000-row INSERT loop
    * (server.js:603-655) collapsed into Spark's partition-parallel JDBC
    * writer. Caller supplies url/auth via `options` and invokes `.save()`.
    * `options` is also the dialect hook: later `.options()` entries override
    * the ClickHouse `driver`/`createTableOptions` defaults, so the same
    * writer targets any JDBC endpoint. Executed end-to-end against embedded
    * Derby (JdbcSinkDerbySpec: DDL, batched append, multi-partition flush,
    * parquet parity); the live-ClickHouse leg stays env-gated in
    * ClickHouseIntegrationSpec. */
  def clickHouseJdbcWriter(df: DataFrame, url: String, table: String,
                           batchSize: Int = 1000,
                           engine: String = "MergeTree()",
                           orderBy: String = "tuple()",
                           options: Map[String, String] = Map.empty) =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize.toString)
      .option("createTableOptions", s"ENGINE = $engine ORDER BY $orderBy")
      .option("driver", "com.clickhouse.jdbc.ClickHouseDriver")
      .options(options)
      .mode("append")

  /** Sorted-layout parquet write for data skipping: clustering rows by the
    * filter columns tightens per-row-group min/max statistics, so range
    * predicates skip whole row groups at scan time (the poor man's Z-order;
    * the reference's `ORDER BY id` MergeTree sort key serves the same role,
    * create_sample_table.sql:9). `repartitionByRange` pre-ranges partitions
    * so file-level min/max are disjoint too — predicates then skip whole
    * FILES, not just row groups. */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String],
                  numFiles: Option[Int] = None): Unit = {
    val ranged = numFiles match {
      case Some(n) => df.repartitionByRange(n, sortCols.map(col): _*)
      case None    => df.repartitionByRange(sortCols.map(col): _*)
    }
    ranged.sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Bucketed table write: pre-shuffles once at write time so every later
    * equi-join/aggregation on `key` between co-bucketed tables runs with NO
    * exchange (the 100 TB lever for repeated joins on the same key — pay the
    * shuffle once, reuse it forever). Requires a metastore table, not a bare
    * path. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Drop-and-rewrite a bucketed table, clearing any orphan warehouse
    * directory a previous JVM's in-memory catalog left behind (saveAsTable
    * refuses to overwrite a location it has no metadata for). */
  def rewriteBucketed(spark: SparkSession, df: DataFrame, table: String,
                      key: String, buckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    if (loc.exists()) rm(loc)
    writeBucketed(df, table, key, buckets)
  }

  /** Small-files compaction: rewrite a parquet directory into
    * ceil(bytes / targetBytes) files. Streaming sinks and incremental
    * ingests accrete thousands of tiny files; at scale that turns every
    * scan's file-listing + footer-reads into the bottleneck. Coalesce (no
    * shuffle) just concatenates partitions. Returns (filesBefore,
    * filesAfter). Not atomic w.r.t. concurrent readers of `path` — compact
    * into `outPath` and swap, or schedule in a maintenance window. */
  def compact(spark: SparkSession, path: String, outPath: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    // Hadoop FS recursive listing, not java.io.File: partitioned layouts
    // nest their files in subdirectories and the input may be HDFS/S3 — a
    // local top-level listing would see 0 bytes and coalesce(1) the world.
    // (Note compaction rewrites FLAT — a partitionBy layout should compact
    // per partition directory.)
    def listParquet(p: String): Seq[org.apache.hadoop.fs.FileStatus] = {
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(hp)) Seq.empty
      else {
        val it = fs.listFiles(hp, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile && st.getPath.getName.endsWith(".parquet")) buf += st
        }
        buf.toSeq
      }
    }
    val files = listParquet(path)
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(path).coalesce(nOut)
      .write.mode("overwrite").parquet(outPath)
    (files.length, listParquet(outPath).length)
  }

  /** Incremental ingest progress (K5): the reference streams an NDJSON
    * `{processed, total}` chunk after every 1,000-row batch
    * (server.js:645-649, consumed at App.jsx:206-219). Spark's write is one
    * distributed job, so "a batch finished" becomes "a write task finished":
    * a SparkListener accumulates each task's `outputMetrics.recordsWritten`
    * and invokes `onProgress(processed, total)` with the running total —
    * monotonic, true counts (the reference reports `total === count`, so its
    * percentage is always 100 — a bug we do not replicate).
    *
    * Only tasks of THIS write's job group are counted, so concurrent jobs on
    * the same session don't pollute the stream. Listener events post
    * asynchronously; the method drains until the final count (from the same
    * write's `observe` metric) has been reported or 10s elapse, so the event
    * log is complete when it returns. Returns (rowsWritten, progressEvents).
    */
  def ingestCopyProgress(spark: SparkSession, df: DataFrame, cols: Seq[String],
                         targetPath: String,
                         onProgress: (Long, Long) => Unit = (_, _) => ())
      : (Long, Seq[(Long, Long)]) = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
    val projected = df.select(cols.map(col): _*)
    // One cheap count pass for the reference's `total` field: at scale this
    // reads parquet row-group metadata only (count-star pushdown).
    val total = projected.count()
    val tag = s"graft-ingest-${java.util.UUID.randomUUID()}"
    val events = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Long)]())
    val processed = new java.util.concurrent.atomic.AtomicLong(0L)
    val myStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (tag == e.properties.getProperty("spark.jobGroup.id"))
          e.stageIds.foreach(id => myStages.add(id))
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (myStages.contains(e.stageId)) {
          val recs = Option(e.taskMetrics).map(_.outputMetrics.recordsWritten).getOrElse(0L)
          if (recs > 0) {
            val p = processed.addAndGet(recs)
            events.add((p, total))
            onProgress(p, total)
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(tag, s"ingest copy -> $targetPath",
        interruptOnCancel = false)
      val obs = org.apache.spark.sql.Observation(s"rows_$tag")
      projected.observe(obs, count(lit(1)).as("rows_written"))
        .write.mode("overwrite").parquet(targetPath)
      val written = obs.get("rows_written").asInstanceOf[Long]
      // Listener bus is async: wait for the last task's event to land.
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (processed.get() < written && System.nanoTime() < deadline)
        Thread.sleep(10)
      (written, scala.jdk.CollectionConverters.ListHasAsScala(events).asScala.toSeq)
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  /** Ingest with true progress accounting (K5). The reference emits NDJSON
    * progress chunks where `total === count` at write time (reported % is
    * always 100 — a reference bug, server.js:645-649). We report true row
    * counts via `observe`, collected by a QueryExecutionListener or read off
    * the returned observation after the action completes. */
  def ingestCopyObserved(spark: SparkSession, df: DataFrame, cols: Seq[String],
                         targetPath: String): Long = {
    // Observation registers its own QueryExecutionListener, so the metric is
    // captured from the write's QueryExecution (df.write plans a fresh one —
    // reading observedMetrics off the pre-write plan would always miss).
    val obs = org.apache.spark.sql.Observation("ingest_progress")
    df.select(cols.map(col): _*)
      .observe(obs, count(lit(1)).as("rows_written"))
      .write.mode("overwrite").parquet(targetPath)
    obs.get("rows_written").asInstanceOf[Long]
  }
}
