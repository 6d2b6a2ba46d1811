package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Round-13 kernel contracts: each new codegen Expression must (a) equal
  * the declarative formulation it replaced value-for-value, and (b) stay
  * inside whole-stage codegen — (a) is what keeps the oracles green, (b)
  * is the entire reason the kernel exists. Codegen containment is asserted
  * on a `range`-fed projection (a literal table constant-folds to a
  * LocalTableScan and nothing gets codegen'd — the DeflateRatio lesson). */
class Round13KernelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Md5WindowHashes == md5(array_join(slice(split(text, ' '), i, w), ' '))") {
    import spark.implicits._
    // Mixed shapes: multi-space runs (empty tokens kept by split-on-space),
    // trailing space, short text, non-ASCII bytes inside tokens.
    val texts = Seq("a b c d e", "a  b c", "ab", "", "héllo wörld über tokens",
      "x y z w v u t s r q p", "trailing space ")
    for (w <- Seq(2, 3, 8)) {
      val kern = texts.toDF("t")
        .select(col("t"), explode(DigestKernels.md5WindowHashes(col("t"), w)).as("h"))
        .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      val decl = texts.toDF("t")
        .select(col("t"), split(col("t"), " ").as("tk"))
        .filter(size(col("tk")) >= w)
        .select(col("t"), explode(expr(s"sequence(1, size(tk) - ${w - 1})")).as("i"),
          col("tk"))
        .select(col("t"), expr(s"md5(array_join(slice(tk, i, $w), ' '))").as("h"))
        .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      assert(kern === decl, s"width $w")
    }
  }

  test("Md5WindowHashes stays inside whole-stage codegen") {
    val df = spark.range(3)
      .select(DigestKernels.md5WindowHashes(
        concat_ws(" ", lit("a b c d"), col("id").cast("string")), 2).as("hs"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"plan was:\n$plan")
  }

  test("CharTrigramCodes stays inside whole-stage codegen") {
    val df = spark.range(3)
      .select(graft.functions.TrigramKernels.charTrigramCodes(
        concat_ws("", lit("abcd"), col("id").cast("string"))).as("cs"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"plan was:\n$plan")
  }

  test("SqDistsToCentroids == the zip_with+aggregate fold, bit for bit") {
    import spark.implicits._
    val cents = Array(Array(0.25, -1.5, 3.0), Array(1e-9, 2.0, -7.25),
      Array(0.1 + 0.2, 0.3, 0.7)) // non-representable doubles on purpose
    val vecs = Seq(Seq(1.0, 2.0, 3.0), Seq(-0.5, 1e9, 2e-9), Seq(0.3, 0.3, 0.3))
    val df = vecs.toDF("v").select(col("v").cast("array<double>").as("v"))
    val kern = df.select(ArrayKernels.sqDistsToCentroids(col("v"), cents).as("d"))
      .as[Seq[Double]].collect().toSeq
    val decl = df.select(array(cents.map { c =>
        aggregate(zip_with(col("v"), array(c.map(lit(_)): _*),
          (x, y) => (x - y) * (x - y)), lit(0.0), (acc, z) => acc + z)
      }: _*).as("d"))
      .as[Seq[Double]].collect().toSeq
    // exact comparison — the kernel's contract is BIT-identity, which is
    // what lets the pinned k-means/IVF trajectories keep their oracles
    assert(kern === decl)
  }

  test("SqDistsToCentroids stays inside whole-stage codegen") {
    val df = spark.range(3)
      .select(array(col("id").cast("double"), lit(1.0)).as("v"))
      .select(ArrayKernels.sqDistsToCentroids(col("v"),
        Array(Array(0.0, 1.0), Array(2.0, 3.0))).as("d"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"plan was:\n$plan")
  }

  // Round-14 contract (advisor): the distance kernels require MATCHED dims
  // and fail LOUDLY on a malformed row instead of silently scoring a
  // clamped partial sum (the old behavior) or null-dropping it (the HOF's).
  test("SqDist and SqDistsToCentroids throw on mismatched vector dims") {
    import spark.implicits._
    val bad = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
      .select(col("a").cast("array<double>").as("a"),
        col("b").cast("array<double>").as("b"))
    val e1 = intercept[Exception] {
      bad.select(ArrayKernels.sqDist(col("a"), col("b")).as("d")).collect()
    }
    assert(e1.toString.contains("sq_dist") ||
      Option(e1.getCause).exists(_.toString.contains("sq_dist")))
    val e2 = intercept[Exception] {
      bad.select(ArrayKernels.sqDistsToCentroids(col("a"),
        Array(Array(0.0, 1.0, 2.0))).as("d")).collect()
    }
    assert(e2.toString.contains("sq_dists_to_centroids") ||
      Option(e2.getCause).exists(_.toString.contains("sq_dists_to_centroids")))
    // matched dims still compute (and agree between the two kernels)
    val ok = Seq((Seq(1.0, 2.0), Seq(3.0, 5.0))).toDF("a", "b")
      .select(col("a").cast("array<double>").as("a"),
        col("b").cast("array<double>").as("b"))
      .select(ArrayKernels.sqDist(col("a"), col("b")).as("d"))
      .as[Double].head()
    assert(ok === 13.0)
  }
}
