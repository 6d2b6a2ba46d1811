package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot array kernels (SURVEY.md §4.3).
  *
  * The declarative equivalents (`transform`/`aggregate`/`zip_with`) are
  * interpreted per-element closures — fine for one-off columns, ~100× too
  * slow when a kernel runs numHashes × shingles times per row. These
  * expressions evaluate as tight primitive loops and stay inside
  * whole-stage codegen via `doGenCode`, which is the difference between a
  * shuffle-free map stage and a bottleneck at 100 TB.
  *
  * Numeric contract: [[DotProduct]] folds strictly left-to-right in double
  * precision, the same order as the higher-order-function formulation and
  * DuckDB's `list_dot_product`, so oracle comparisons stay bit-identical.
  */
object ArrayKernels {
  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  /** dot(a, b) over two array<double> columns — codegen'd primitive loop. */
  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** MinHash signature: array of `numHashes` minima of
    * h_j(x) = (a_j·x + b_j) mod (2^31-1) over the input hash array. */
  def minhash(shingleHashes: Column, numHashes: Int = 128, seed: Long = 42L): Column =
    column(MinHashSignature(expression(shingleHashes), numHashes, seed))
}

/** Left-to-right double-precision dot product of two array<double> columns. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects (array<double>, array<double>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |${ev.value} = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature over an array<bigint> of element hashes.
  *
  * Permutation family h_j(x) = (a_j·x + b_j) mod P with P = 2^31-1 (products
  * stay within signed-64 range). Coefficients are derived from `seed` on the
  * driver and shipped as reference objects into the generated code.
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  private val P = (1L << 31) - 1

  @transient private lazy val (aCoeffs, bCoeffs): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val as = Array.fill(numHashes)(math.abs(rnd.nextLong()) % (P - 1) + 1)
    val bs = Array.fill(numHashes)(math.abs(rnd.nextLong()) % P)
    (as, bs)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      var x = arr.getLong(i) % P
      if (x < 0) x += P
      var j = 0
      while (j < numHashes) {
        val v = (aCoeffs(j) * x + bCoeffs(j)) % P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val as = ctx.addReferenceObj("minhashA", aCoeffs, "long[]")
      val bs = ctx.addReferenceObj("minhashB", bCoeffs, "long[]")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      s"""
         |long[] $out = new long[$numHashes];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = $c.getLong($i) % ${P}L;
         |  if ($x < 0) $x += ${P}L;
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $v = ($as[$j] * $x + $bs[$j]) % ${P}L;
         |    if ($v < $out[$j]) $out[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
