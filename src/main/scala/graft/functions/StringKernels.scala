package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native string-similarity kernels for record linkage (SURVEY.md §2 Y-rows:
  * entity resolution over a staged CSV/parquet corpus — the fuzzy-match step
  * a dedup pipeline runs after exact and shingle-based passes).
  *
  * Spark ships `levenshtein` but no Jaro/Jaro-Winkler, the standard name /
  * address matcher (edit distance over-penalizes transpositions that
  * human-keyed fields are full of). Implemented as a Catalyst
  * `BinaryExpression` with `doGenCode`, not a UDF: the O(len·window) match
  * loop runs as a tight primitive method call inside whole-stage codegen —
  * no boxing, no Row serialization, stays fused with the surrounding
  * projection.
  *
  * Numeric contract: the textbook definition (match window
  * max(len)/2 − 1, transpositions counted over aligned match sequences,
  * Winkler boost `j + ℓ·0.1·(1−j)` applied only when j > 0.7 with prefix ℓ
  * capped at 4) — verified equal to DuckDB's `jaro_similarity` /
  * `jaro_winkler_similarity` on the classic pairs (MARTHA/MARHTA,
  * DIXON/DICKSONX, prefix-cap and below-threshold cases), so oracle
  * comparisons hold to double precision.
  */
object StringKernels {
  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  /** Jaro similarity in [0,1] of two string columns. */
  def jaro(a: Column, b: Column): Column =
    column(JaroWinkler(expression(a), expression(b), winkler = false))

  /** Jaro-Winkler similarity (prefix-boosted above 0.7) of two strings. */
  def jaroWinkler(a: Column, b: Column): Column =
    column(JaroWinkler(expression(a), expression(b), winkler = true))
}

/** Jaro / Jaro-Winkler similarity of two strings (see [[StringKernels]]). */
case class JaroWinkler(left: Expression, right: Expression, winkler: Boolean)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString,
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString,
      winkler)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.compute(" +
        s"$a.toString(), $b.toString(), $winkler);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Textbook Jaro(-Winkler). Called from both interpreted eval and the
    * generated code, so the two paths cannot diverge. */
  def compute(s1: String, s2: String, winkler: Boolean): Double = {
    val n1 = s1.length
    val n2 = s2.length
    if (n1 == 0 || n2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val window = math.max(0, math.max(n1, n2) / 2 - 1)
    val m1 = new Array[Boolean](n1)
    val m2 = new Array[Boolean](n2)
    var matches = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // Transpositions: walk the two matched subsequences in order; each
    // aligned position whose characters differ contributes half a
    // transposition.
    var t = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val j = (m / n1 + m / n2 + (m - t / 2.0) / m) / 3.0
    if (!winkler || j <= 0.7) return j
    var l = 0
    val cap = math.min(4, math.min(n1, n2))
    while (l < cap && s1.charAt(l) == s2.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }
}
