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

  /** American Soundex code (e.g. Robert → R163) of a string column. */
  def soundex(c: Column): Column = column(Soundex(expression(c)))
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
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes,
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes,
      winkler)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.compute(" +
        s"$a.getBytes(), $b.getBytes(), $winkler);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** String convenience overload (tests, driver-side callers): UTF-8 encode
    * and delegate to the byte kernel. */
  def compute(s1: String, s2: String, winkler: Boolean): Double =
    compute(s1.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      s2.getBytes(java.nio.charset.StandardCharsets.UTF_8), winkler)

  /** Textbook Jaro(-Winkler) over UTF-8 BYTES. Called from both interpreted
    * eval and the generated code, so the two paths cannot diverge.
    *
    * Unit choice, verified empirically against DuckDB 1.x: its
    * jaro/jaro_winkler_similarity compare raw UTF-8 bytes, not codepoints
    * and not UTF-16 units (jaro('ée','ee') = 0.0; jaro('𝕏a','𝕏b') = 13/15 —
    * both are the byte-model answers). Matching that keeps the oracle
    * contract exact for NON-ASCII corpora too, and lets the Expression feed
    * `UTF8String.getBytes` straight in with no String materialization.
    * Convention (also DuckDB's): two empty strings compare 0.0, not 1.0 —
    * the empty check precedes the equality check on purpose. */
  def compute(s1: Array[Byte], s2: Array[Byte], winkler: Boolean): Double = {
    val n1 = s1.length
    val n2 = s2.length
    if (n1 == 0 || n2 == 0) return 0.0
    if (java.util.Arrays.equals(s1, s2)) return 1.0
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
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // Transpositions: walk the two matched subsequences in order; each
    // aligned position whose bytes differ contributes half a transposition.
    var t = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val j = (m / n1 + m / n2 + (m - t / 2.0) / m) / 3.0
    if (!winkler || j <= 0.7) return j
    var l = 0
    val cap = math.min(4, math.min(n1, n2))
    while (l < cap && s1(l) == s2(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }
}

/** American Soundex phonetic code — the classic blocking key for entity
  * resolution (Hernández & Stolfo list it beside sorted-neighborhood as the
  * standard second pass): same-sounding name variants (Smith/Smyth,
  * Johnson/Jonson, Meyer/Meier) collapse to one 4-character key, so records
  * whose SORT positions diverge still land in the same block. Spark ships
  * `soundex` in functions._ and it agrees with this spec on alphabetic
  * input (verified: Ashcraft→A261, Tymczak→T522, Pfister→P236, O'Brien→
  * O165), but diverges on a non-letter FIRST character (Spark returns the
  * input verbatim; this kernel codes it as a separator like any other
  * non-letter) — a data-dependent passthrough a SQL oracle restatement
  * must not inherit silently. This kernel pins ONE total spec implemented
  * identically here and in the DuckDB oracle's list-SQL restatement:
  *
  *   1. keep the first character (uppercased);
  *   2. code the rest: BFPV→1 CGJKQSXZ→2 DT→3 L→4 MN→5 R→6, vowels/Y and
  *      any non-letter→0, H/W transparent (removed BEFORE collapsing, so
  *      equal codes separated only by H/W merge — the Ashcraft rule);
  *   3. collapse adjacent equal codes (the first character's own code heads
  *      the chain, so Pfister → P236 not P136);
  *   4. digits = the collapsed chain after the head, zeros dropped, first 3,
  *      right-padded with '0'.
  *
  * Codegen Expression (not a UDF): the per-row loop is a static primitive
  * call inside whole-stage codegen, same shape as [[JaroWinkler]]. */
case class Soundex(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft soundex expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(s: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      Soundex.compute(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Soundex.compute($s.toString()));")

  override protected def withNewChildInternal(newChild: Expression): Soundex =
    copy(child = newChild)
}

object Soundex {
  private def code(ch: Char): Int = Character.toUpperCase(ch) match {
    case 'B' | 'F' | 'P' | 'V' => 1
    case 'C' | 'G' | 'J' | 'K' | 'Q' | 'S' | 'X' | 'Z' => 2
    case 'D' | 'T' => 3
    case 'L' => 4
    case 'M' | 'N' => 5
    case 'R' => 6
    case 'H' | 'W' => -1 // transparent: removed before collapsing
    case _ => 0 // vowels, Y, and any non-letter act as code separators
  }

  /** The pinned spec (see the case-class doc). Empty in → empty out. */
  def compute(s: String): String = {
    if (s.isEmpty) return ""
    val first = code(s.charAt(0))
    val rest = s.substring(1).map(code).filter(_ != -1)
    val filt = first +: rest
    val sb = new StringBuilder
    sb += Character.toUpperCase(s.charAt(0))
    var prev = filt(0)
    var i = 1
    while (i < filt.length && sb.length < 4) {
      val k = filt(i)
      if (k != prev && k > 0) sb += ('0' + k).toChar
      prev = k
      i += 1
    }
    while (sb.length < 4) sb += '0'
    sb.toString
  }
}
