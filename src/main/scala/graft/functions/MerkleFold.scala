package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Block fold for the distributed Merkle reduction (engine.Merkle).
  *
  * The reduction rule pairs positions (2i, 2i+1) → md5(left ∥ right) with
  * odd tails carrying up — so the level-k node at position p is a pure
  * function of the leaves in [p·2^k, (p+1)·2^k): BLOCK-LOCAL. Folding a
  * whole aligned block to its level-k node inside ONE grouped aggregate
  * replaces k per-level exchange stages (each a whole stage of fixed
  * latency) with one, without moving a byte more — and the roots are
  * bit-identical because the in-block fold is the identical pairing rule.
  *
  * Input: array<struct<p: long, h: string>> — a block's (global position,
  * hex hash) leaves, any order (sorted internally; positions are globally
  * dense per key, so in-block order == local index). Output: the block's
  * single fold node (identity for a 1-leaf block), matching
  * Merkle.referenceRoot on the position-sorted hashes.
  */
object MerkleFold {
  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  /** Fold a block's (p, h) structs to its subtree-root hex hash. */
  def blockRoot(posHash: Column): Column =
    column(MerkleBlockRoot(expression(posHash)))

  /** Shared by interpreted eval and generated code: sort by position, fold
    * pairwise with md5(hex_l ∥ hex_r) until a single node remains. */
  def fold(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    require(n > 0,
      "merkle_block_root: empty block — leaf positions violate the dense-unique contract")
    val ps = new Array[Long](n)
    val hs = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      ps(i) = row.getLong(0)
      hs(i) = row.getUTF8String(1)
      i += 1
    }
    // insertion-order sort by position (blocks are ≤ 2^blockBits entries;
    // positions unique — ties impossible under the dense-unique contract)
    val idx = (0 until n).sortBy(ps)
    var lvl = idx.map(hs).toArray
    val md = java.security.MessageDigest.getInstance("MD5")
    while (lvl.length > 1) {
      val next = new Array[UTF8String]((lvl.length + 1) / 2)
      var j = 0
      while (j + 1 < lvl.length) {
        md.reset()
        md.update(lvl(j).getBytes)
        md.update(lvl(j + 1).getBytes)
        next(j / 2) = toHex(md.digest())
        j += 2
      }
      if (lvl.length % 2 == 1) next(lvl.length / 2) = lvl(lvl.length - 1)
      lvl = next
    }
    lvl(0)
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def toHex(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = HexChars((bytes(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexChars(bytes(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

case class MerkleBlockRoot(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(Array(p, h)), _)
          if p.dataType == LongType && h.dataType == StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"merkle_block_root expects array<struct<p: bigint, h: string>>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    MerkleFold.fold(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // one digest-bound call per BLOCK row (≤ one per 2^blockBits leaves)
      // — delegating to the shared static fold keeps the surrounding
      // whole-stage codegen span intact at zero per-leaf overhead. The
      // fold never returns null (an empty block violates the dense-unique
      // contract and throws), so ev.isNull — the literal `false` for
      // non-nullable children — is never written.
      s"${ev.value} = graft.functions.MerkleFold.fold($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): MerkleBlockRoot =
    copy(child = newChild)
}
