package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints (the Deequ-style validation gate an
  * ingest pipeline runs before a table goes live — reference behavior: the
  * tool trusts ClickHouse to reject bad rows; a Spark-native engine has to
  * assert its own invariants). Each constraint evaluates to ONE row
  * (check, violations); a suite unions them and flags `passed`.
  *
  * Scale shape: every constraint is an aggregate — violations COUNTS cross
  * the wire, never violating rows. Same-table scalar constraints
  * (non-null, range, set membership) are FUSED into one scan via
  * [[fused]]'s conditional sums; uniqueness adds a count-distinct to the
  * same pass. Referential integrity is a null-producing broadcast-or-hash
  * LEFT join aggregated to a count — the parent's key column is all that
  * joins, so the child table streams through once. Nothing here collects
  * more than |constraints| rows.
  */
object Checks {

  /** One fused scan evaluating every (name, violation-predicate) pair plus
    * optional uniqueness column sets over the same table. Uniqueness
    * violations = rows − distinct keys (0 iff the key is unique). */
  def fused(df: DataFrame,
            predicates: Seq[(String, Column)],
            uniqueKeys: Seq[(String, Seq[String])] = Nil): DataFrame = {
    val aggs =
      predicates.map { case (name, bad) =>
        sum(when(bad, 1L).otherwise(0L)).as(name)
      } ++ uniqueKeys.map { case (name, cols) =>
        // count_distinct over the bare columns (not a struct): SQL
        // COUNT(DISTINCT …) excludes null keys, and the oracle must agree.
        (count(lit(1)) - count_distinct(col(cols.head), cols.tail.map(col): _*))
          .as(name)
      }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val names = predicates.map(_._1) ++ uniqueKeys.map(_._1)
    // |constraints| rows out of one scan: unpivot the single agg row.
    row.select(names.map(n =>
        struct(lit(n).as("check"), col(n).cast("long").as("violations")).as(n)): _*)
      .select(explode(array(names.map(col): _*)).as("c"))
      .select(col("c.check"), col("c.violations"))
  }

  /** Referential-integrity violations: child rows whose key has no match in
    * the parent's key column (SQL FK semantics: NULL child keys are exempt).
    * The parent side projects to its key only before the join. */
  def foreignKey(name: String, child: DataFrame, childKey: String,
                 parent: DataFrame, parentKey: String): DataFrame = {
    val p = parent.select(col(parentKey).as("__pk")).distinct()
    child.select(col(childKey).as("__ck"))
      .join(p, col("__ck") === col("__pk"), "left")
      .agg(sum(when(col("__ck").isNotNull && col("__pk").isNull, 1L)
        .otherwise(0L)).cast("long").as("violations"))
      .select(lit(name).as("check"), col("violations"))
  }

  /** Union a suite into the report frame: (check, violations, passed),
    * ordered by check name — the gate reads `passed`, the on-call reads
    * `violations`. */
  def report(results: Seq[DataFrame]): DataFrame =
    results.reduce(_ unionAll _)
      .withColumn("passed", (col("violations") === 0L).cast("int"))
      .orderBy("check")
}
