package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Native codegen kernels vs their declarative higher-order-function
  * formulations — both code paths (interpreted eval and whole-stage codegen)
  * must agree bit-for-bit. */
class ArrayKernelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // The HOF formulations the native kernels replaced (kept here as the
  // executable spec of the kernels' semantics).
  private def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)

  private val MersennePrime = (1L << 31) - 1
  private def minhashHof(shingleHashes: Column, n: Int, seed: Long): Column = {
    // Same coefficient draw order as the kernel: all a's, then all b's.
    val rnd = new scala.util.Random(seed)
    val as = Seq.fill(n)(math.abs(rnd.nextLong()) % (MersennePrime - 1) + 1)
    val bs = Seq.fill(n)(math.abs(rnd.nextLong()) % MersennePrime)
    val coeffs = as.zip(bs)
    val perms = array(coeffs.map { case (a, b) =>
      struct(lit(a).as("a"), lit(b).as("b"))
    }: _*)
    transform(perms, p =>
      array_min(transform(shingleHashes,
        h => pmod(p.getField("a") * pmod(h, lit(MersennePrime)) + p.getField("b"),
                  lit(MersennePrime)))))
  }

  private def randArrays(n: Int, dim: Int, seed: Long = 11L): Seq[(Array[Double], Array[Double])] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((Array.fill(dim)(rnd.nextGaussian() * 10), Array.fill(dim)(rnd.nextGaussian() * 10)))
  }

  test("DotProduct == HOF fold, bit-identical, on random inputs") {
    val df = randArrays(200, 64).toDF("a", "b")
    val diffs = df.select(
        ArrayKernels.dot(col("a"), col("b")).as("native"),
        dotHof(col("a"), col("b")).as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(diffs == 0)
  }

  test("DotProduct: empty arrays → 0.0; null input → null") {
    val df = Seq((Array.empty[Double], Array.empty[Double])).toDF("a", "b")
    assert(df.select(ArrayKernels.dot(col("a"), col("b"))).as[Double].head() == 0.0)
    val withNull = df.select(lit(null).cast("array<double>").as("a"), col("b"))
    assert(withNull.select(ArrayKernels.dot(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("DotProduct rejects non-double arrays at analysis time") {
    val df = Seq(Tuple1(Array(1L, 2L))).toDF("a")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(ArrayKernels.dot(col("a"), col("a"))).collect()
    }
  }

  test("MinHashSignature == HOF formulation on random shingle sets") {
    val rnd = new scala.util.Random(3L)
    val df = Seq.fill(100)(Array.fill(rnd.nextInt(50) + 1)(rnd.nextLong()))
      .toDF("sh")
    val rows = df.select(
        ArrayKernels.minhash(col("sh"), 64, 42L).as("native"),
        minhashHof(col("sh"), 64, 42L).as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
    for ((native, hof) <- rows) assert(native == hof)
  }

  test("MinHashSignature: interpreted eval equals codegen result") {
    // Force the interpreted path through a fresh expression's nullSafeEval.
    val hashes = Array(123456789L, -987654321L, 42L)
    val expr = MinHashSignature(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        hashes, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      numHashes = 16, seed = 42L)
    val interpreted = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq
    val viaSpark = Seq(Tuple1(hashes)).toDF("sh")
      .select(ArrayKernels.minhash(col("sh"), 16, 42L)).as[Seq[Long]].head()
    assert(interpreted == viaSpark)
  }

  test("MinHash signature is permutation-family stable: same seed → same sig") {
    val df = Seq(Tuple1(Array(1L, 2L, 3L))).toDF("sh")
    val s1 = df.select(ArrayKernels.minhash(col("sh"), 32, 7L)).as[Seq[Long]].head()
    val s2 = df.select(ArrayKernels.minhash(col("sh"), 32, 7L)).as[Seq[Long]].head()
    val s3 = df.select(ArrayKernels.minhash(col("sh"), 32, 8L)).as[Seq[Long]].head()
    assert(s1 == s2)
    assert(s1 != s3)
  }

  test("kernels stay inside whole-stage codegen") {
    // repartition defeats ConvertToLocalRelation, which would otherwise
    // evaluate the projection eagerly into a LocalTableScan.
    val df = randArrays(4, 8).toDF("a", "b").repartition(2)
      .select(ArrayKernels.dot(col("a"), col("b")).as("d"),
              ArrayKernels.minhash(col("a").cast("array<bigint>"), 8).as("mh"))
    df.collect() // AQE finalizes the physical plan only on execution
    // "*(n)" is the whole-stage-codegen stage marker in plan strings.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"plan was:\n$plan")
  }
}
