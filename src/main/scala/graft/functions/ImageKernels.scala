package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen image-fingerprint kernels over `binary` payloads — the same
  * native-`Expression` discipline as the text kernels in [[ArrayKernels]]
  * ([[SimHash64]], [[HashedTf]]): a per-row pure function wrapped as a
  * `UnaryExpression` with `doGenCode`, so the media scan → hash stage is one
  * whole-stage-codegen span with no Dataset (de)serialization barrier.
  * The actual byte-level kernels live in [[graft.multimodal.Multimodal]]
  * beside the decoders they share (`dHash64`, `isBmp24`).
  */
object ImageKernels {
  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  /** 64-bit perceptual difference-hash of a binary payload (real 9×8 luma
    * grid for uncompressed 24-bpp BMPs, deterministic byte sampling
    * otherwise — [[graft.multimodal.Multimodal.dHash64]]). */
  def dhash64(media: Column): Column = column(DHash64(expression(media)))

  /** Which tier hashed the payload: 'bmp24' (true perceptual) vs
    * 'byte-sample' (fallback). Pair-join within a tier only. */
  def dhashMode(media: Column): Column = column(DHashMode(expression(media)))
}

/** Perceptual dHash of a binary column; delegates to the shared static
  * kernel beside the BMP decoder. */
case class DHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dhash64 expects binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    graft.multimodal.Multimodal.dHash64(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.multimodal.Multimodal.dHash64($c);")

  override protected def withNewChildInternal(newChild: Expression): DHash64 =
    copy(child = newChild)
}

/** Decode-tier tag for a binary payload's dHash: 'bmp24' when the real luma
  * grid hashed it, 'byte-sample' for the fallback. */
case class DHashMode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dhash_mode expects binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    DHashMode.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DHashMode.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): DHashMode =
    copy(child = newChild)
}

object DHashMode {
  private val Bmp24 = UTF8String.fromString("bmp24")
  private val ByteSample = UTF8String.fromString("byte-sample")

  def compute(b: Array[Byte]): UTF8String =
    if (graft.multimodal.Multimodal.isBmp24(b)) Bmp24 else ByteSample
}
