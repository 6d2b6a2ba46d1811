package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rolling md5 window digests (the decontamination hot path).
  *
  * The declarative formulation — `split(text, " ")`, explode a position
  * sequence, `md5(array_join(slice(w, i, width), ' '))` — has two scale
  * problems: every generated row carries a COPY of the full token array
  * (O(tokens²) bytes per document through the generate), and every window
  * allocates a slice plus a joined string before hashing.
  *
  * [[Md5WindowHashes]] exploits that the separator is the single space the
  * text was split on: with `split(text, " ")` keeping empty tokens, the
  * space-joined window `slice(w, i, width)` is EXACTLY the byte range of
  * the original text from token i's first byte to token i+width-1's last
  * byte (0x20 never occurs inside a multi-byte UTF-8 sequence, so byte
  * scanning finds precisely the split points). One byte scan finds the
  * token starts; each window md5-updates directly over the original byte
  * range — no token array, no slice, no join, no copies. Hex output is
  * identical to `md5(...)`, so every DuckDB oracle over these hashes is
  * unchanged.
  */
object DigestKernels {
  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  /** Lowercase-hex md5 of every `width`-token window of a space-separated
    * string, in position order; empty array when the text has fewer than
    * `width` tokens. Value-identical to
    * `md5(array_join(slice(split(text, " "), i, width), ' '))`. */
  def md5WindowHashes(text: Column, width: Int): Column =
    column(Md5WindowHashes(expression(text), width))
}

case class Md5WindowHashes(child: Expression, width: Int)
    extends UnaryExpression {
  require(width >= 1, "window width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_window_hashes expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      Md5WindowHashes.compute(input.asInstanceOf[UTF8String], width))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.Md5WindowHashes.compute($c, $width));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Md5WindowHashes =
    copy(child = newChild)
}

object Md5WindowHashes {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  def compute(s: UTF8String, width: Int): Array[UTF8String] = {
    val bytes = s.getBytes
    val nb = bytes.length
    // Token starts under split-on-single-space-KEEPING-empties semantics:
    // position 0, and the byte after every 0x20.
    var nTokens = 1
    var i = 0
    while (i < nb) { if (bytes(i) == 0x20) nTokens += 1; i += 1 }
    if (nTokens < width) return Array.empty
    val starts = new Array[Int](nTokens)
    var t = 1
    i = 0
    while (i < nb) {
      if (bytes(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val digest = md.get()
    val out = new Array[UTF8String](nTokens - width + 1)
    var w = 0
    while (w < out.length) {
      val from = starts(w)
      // window ends one byte before token w+width starts, or at the end
      val until = if (w + width < nTokens) starts(w + width) - 1 else nb
      digest.reset()
      digest.update(bytes, from, until - from)
      val d = digest.digest()
      val hex = new Array[Byte](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = HexDigits((d(j) >> 4) & 0xF).toByte
        hex(2 * j + 1) = HexDigits(d(j) & 0xF).toByte
        j += 1
      }
      out(w) = UTF8String.fromBytes(hex)
      w += 1
    }
    out
  }
}
