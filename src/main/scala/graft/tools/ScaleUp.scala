package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic testdata scale-up: replicate an sf directory K× with
  * key-offset strides, producing a corpus whose statistical shape matches a
  * driver-generated one K scale-factors up. Used for the sf1.0 scale-probe
  * (`runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf1 10`).
  *
  * Design choices that keep the scaled corpus REPRESENTATIVE rather than
  * degenerate:
  *  - Every key column is shifted by `replica × (max(key)+1)` with strides
  *    shared across tables (custkey stride is the same in `customer` and
  *    `orders`), so referential integrity and join fan-outs are preserved
  *    while key cardinality grows K×.
  *  - `region`/`nation` are copied unchanged — dimensions don't scale with
  *    volume (TPC-H's own rule), so broadcast-ability is preserved.
  *  - `documents.text` is word-salted per replica (`w~r3`): within-replica
  *    duplicate/near-dup structure is preserved exactly, while cross-replica
  *    shingles are disjoint. Naive replication would turn every document
  *    into a K-clique of near-duplicates — quadratic pair blowup that no
  *    real corpus has; salting models K independent shards, which is what a
  *    larger crawl actually looks like (dup RATE constant, dup COUNT ∝ K).
  *  - `embeddings.embedding` gets a deterministic per-(vec,dim,replica)
  *    perturbation (murmur3-hash-seeded, ±0.05): replicas of a vector stay
  *    in the same region of space (cluster structure survives) without
  *    being cosine≈1 artificial near-duplicates.
  *  - `events.ts` (TIMESTAMP(NANOS), read as long under `nanosAsLong`) is
  *    written back as TimestampType(µs) — the same ns→µs truncation the
  *    Catalog applies on read — so Spark and DuckDB read the scaled file
  *    identically and oracle spot-checks still line up.
  */
object ScaleUp {

  /** key-column → stride-group per table; strides are shared by group. */
  private val keyGroups: Map[String, Seq[(String, String)]] = Map(
    "customer"   -> Seq("c_custkey" -> "cust"),
    "orders"     -> Seq("o_orderkey" -> "ord", "o_custkey" -> "cust"),
    "lineitem"   -> Seq("l_orderkey" -> "ord", "l_partkey" -> "part",
                        "l_suppkey" -> "supp"),
    "part"       -> Seq("p_partkey" -> "part"),
    "supplier"   -> Seq("s_suppkey" -> "supp"),
    "events"     -> Seq("event_id" -> "event", "user_id" -> "user"),
    "documents"  -> Seq("doc_id" -> "doc"),
    "embeddings" -> Seq("vec_id" -> "vec")
  )

  /** (table, column) that defines each stride group's max. */
  private val strideSource: Map[String, (String, String)] = Map(
    "cust"  -> ("customer", "c_custkey"),
    "ord"   -> ("orders", "o_orderkey"),
    "part"  -> ("part", "p_partkey"),
    "supp"  -> ("supplier", "s_suppkey"),
    "event" -> ("events", "event_id"),
    "user"  -> ("events", "user_id"),
    "doc"   -> ("documents", "doc_id"),
    "vec"   -> ("embeddings", "vec_id")
  )

  def main(args: Array[String]): Unit = {
    val (src, dst, factor) = (args(0), args(1), args(2).toInt)
    val spark = SparkSession.builder()
      .appName("graft-scaleup").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()

    def read(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    val strides: Map[String, Long] = strideSource.map { case (g, (t, c)) =>
      g -> (read(t).agg(max(col(c))).head.getLong(0) + 1L)
    }

    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val base = read(t)
      val out: DataFrame =
        if (!keyGroups.contains(t)) base // dimension table: copy unchanged
        else {
          val reps = (0 until factor).map { r =>
            var df = base
            keyGroups(t).foreach { case (c, g) =>
              df = df.withColumn(c,
                (col(c) + lit(r * strides(g))).cast(base.schema(c).dataType))
            }
            if (t == "documents" && r > 0) {
              df = df
                .withColumn("text", array_join(
                  transform(split(col("text"), " "),
                    w => concat(w, lit(s"~r$r"))), " "))
                .withColumn("n_chars", length(col("text")).cast("bigint"))
            }
            if (t == "embeddings" && r > 0) {
              df = df.withColumn("embedding",
                transform(col("embedding"), (x, i) =>
                  (x + (pmod(hash(col("vec_id"), i, lit(r)), lit(1000))
                    .cast("double") / 1000.0 - 0.5) * 0.1).cast("float")))
            }
            df
          }
          reps.reduce(_ unionAll _)
        }
      val finalOut =
        if (t == "events")
          graft.engine.TsNorm.normalizeTs(out)
        else out
      finalOut.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"scaleup: $t × ${if (keyGroups.contains(t)) factor else 1}")
    }
    spark.stop()
  }
}
