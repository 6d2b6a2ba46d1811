package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** The single event-time normalizer for the `events.ts` column.
  *
  * The testdata generator has shipped `ts` in three physical shapes over
  * time, and every reader in the repo must tolerate all of them:
  *
  *  - parquet TIMESTAMP(NANOS): Spark only reads it under
  *    `spark.sql.legacy.parquet.nanosAsLong`, so it arrives as a raw
  *    LongType of epoch-nanoseconds → `timestamp_micros(ts div 1000)`
  *    (the same ns→µs truncation DuckDB applies, keeping oracle
  *    comparisons exact);
  *  - parquet TIMESTAMP(MICROS) without `isAdjustedToUTC`: Spark 4 infers
  *    TimestampNTZType, which `unix_micros` and `withWatermark` both
  *    reject → cast to TimestampType. The session timezone is pinned to
  *    UTC (build.sbt), so the cast relabels without changing values;
  *  - plain TIMESTAMP(MICROS) UTC: already TimestampType → pass through.
  *
  * Works on batch and streaming frames alike (schema-only dispatch).
  * Every ts consumer — [[Catalog.table]], the streaming sources, the
  * scale-up tool, and the test fixtures — goes through here so the next
  * testdata regeneration cannot silently break one copy of the logic.
  */
object TsNorm {
  def normalizeTs(df: DataFrame, name: String = "ts"): DataFrame =
    if (!df.columns.contains(name)) df
    else df.schema(name).dataType match {
      case LongType =>
        df.withColumn(name, expr(s"timestamp_micros(`$name` div 1000)"))
      case TimestampNTZType =>
        df.withColumn(name, col(name).cast(TimestampType))
      case _ => df
    }
}
