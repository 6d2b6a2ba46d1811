package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Packed character-trigram kernels (q_char_ngrams' hot path).
  *
  * The declarative formulation — explode a position sequence, then
  * `substring(text, pos, 3)` — allocates one short-lived String per
  * character position and makes the (lang, gram) aggregation hash
  * variable-length strings: ~100M allocations at sf1 for the documents
  * corpus. [[CharTrigramCodes]] instead decodes the UTF-8 bytes ONCE per
  * document and emits each trigram as three code points packed into a
  * long (21 bits each — every Unicode scalar fits), so the aggregation
  * keys are primitive longs.
  *
  * Faithfulness contract (what keeps the DuckDB oracle green unchanged):
  * Spark's `substring`/`length` operate on code points, and so does the
  * decoder here, so code i corresponds exactly to `substring(text, i+1,
  * 3)`. Packing preserves order: UTF-8 byte comparison — the tie-break
  * `ORDER BY g` used by the top-k — is code-point order, and so is the
  * numeric order of the packed longs. Unpacking ([[TrigramFromCode]])
  * reproduces the exact substring, so results are bit-identical to the
  * explode+substring plan, only cheaper.
  */
object TrigramKernels {
  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  /** All packed trigram codes of a string column, in position order;
    * empty array when the text has fewer than 3 code points. */
  def charTrigramCodes(text: Column): Column =
    column(CharTrigramCodes(expression(text)))

  /** The 3-code-point string a packed code denotes. */
  def trigramFromCode(code: Column): Column =
    column(TrigramFromCode(expression(code)))
}

case class CharTrigramCodes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_trigram_codes expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(CharTrigramCodes.compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.CharTrigramCodes.compute($c));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharTrigramCodes =
    copy(child = newChild)
}

object CharTrigramCodes {

  /** One UTF-8 decode pass, then a sliding 3-code-point window packed
    * (cp0 << 42) | (cp1 << 21) | cp2. Shared by interpreted eval and
    * codegen — the per-row work dwarfs one method call. */
  def compute(s: UTF8String): Array[Long] = {
    val nChars = s.numChars()
    if (nChars < 3) return Array.emptyLongArray
    val cps = new Array[Int](nChars)
    val nb = s.numBytes()
    var i = 0
    var c = 0
    while (i < nb) {
      val b = s.getByte(i)
      var cp = 0
      var len = 1
      if ((b & 0x80) == 0) { cp = b }
      else if ((b & 0xE0) == 0xC0) { cp = b & 0x1F; len = 2 }
      else if ((b & 0xF0) == 0xE0) { cp = b & 0x0F; len = 3 }
      else { cp = b & 0x07; len = 4 }
      var k = 1
      while (k < len) { cp = (cp << 6) | (s.getByte(i + k) & 0x3F); k += 1 }
      cps(c) = cp
      c += 1
      i += len
    }
    val out = new Array[Long](nChars - 2)
    var j = 0
    while (j < out.length) {
      out(j) = (cps(j).toLong << 42) | (cps(j + 1).toLong << 21) | cps(j + 2).toLong
      j += 1
    }
    out
  }
}

case class TrigramFromCode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"trigram_from_code expects bigint, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    TrigramFromCode.compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.TrigramFromCode.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): TrigramFromCode =
    copy(child = newChild)
}

object TrigramFromCode {
  def compute(code: Long): UTF8String = {
    val sb = new java.lang.StringBuilder(6)
    sb.appendCodePoint(((code >> 42) & 0x1FFFFF).toInt)
    sb.appendCodePoint(((code >> 21) & 0x1FFFFF).toInt)
    sb.appendCodePoint((code & 0x1FFFFF).toInt)
    UTF8String.fromString(sb.toString)
  }
}
