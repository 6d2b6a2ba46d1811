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

  // HOF formulations the shingle/simhash kernels replaced — executable spec.
  private def shinglesHof(text: Column, k: Int): Column = {
    val toks = split(text, "\\s+")
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - lit(k), lit(0))),
      i => xxhash64(concat_ws(" ", slice(toks, i + lit(1), lit(k))))))
  }

  private def simhashHof(text: Column): Column = {
    val toks = split(text, "\\s+")
    val zero = array((0 until 64).map(_ => lit(0L)): _*)
    val counts = aggregate(toks, zero, (acc, t) => {
      val h = xxhash64(t)
      transform(acc, (c, i) =>
        c + when(call_function("shiftright", h, i).bitwiseAND(lit(1L)) === 1L, lit(1L))
          .otherwise(lit(-1L)))
    })
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)), (c, i) =>
        when(c > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, bit) => acc.bitwiseOR(bit))
  }

  private def randTexts(n: Int, seed: Long = 5L): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "théta", "ωmega")
    Seq.fill(n)(Seq.fill(rnd.nextInt(30) + 1)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
  }

  test("ShingleHashes == HOF shingles (values AND order), incl. short docs") {
    val df = (randTexts(150) ++ Seq("one", "one two", "a b c")).toDF("text")
    val toks = split(col("text"), "\\s+")
    val rows = df.select(
        ArrayKernels.shingleHashes(toks, 3).as("native"),
        shinglesHof(col("text"), 3).as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
    for ((native, hof) <- rows) assert(native == hof)
  }

  test("ShingleHashes distinct=false keeps positional duplicates") {
    val df = Seq("x y x y x y").toDF("text") // grams repeat: "x y x","y x y",...
    val toks = split(col("text"), "\\s+")
    val (dis, pos) = df.select(
        ArrayKernels.shingleHashes(toks, 3).as("d"),
        ArrayKernels.shingleHashes(toks, 3, distinct = false).as("p"))
      .as[(Seq[Long], Seq[Long])].head()
    assert(pos.length == 4 && dis.length == 2)
    assert(pos.toSet == dis.toSet)
  }

  test("SimHash64 == HOF simhash on random inputs") {
    val df = randTexts(150).toDF("text")
    val diffs = df.select(
        ArrayKernels.simhash(split(col("text"), "\\s+")).as("native"),
        simhashHof(col("text")).as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(diffs == 0)
  }

  test("WordSetHits == HOF filter+array_contains count") {
    val stops = Seq("the", "a", "of")
    val stopArr = array(stops.map(lit): _*)
    val df = (randTexts(100) ++ Seq("the the the", "", "zz")).toDF("text")
    val toks = split(col("text"), "\\s+")
    val diffs = df.select(
        ArrayKernels.wordSetHits(toks, stops).as("native"),
        size(filter(toks, t => array_contains(stopArr, t))).as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(diffs == 0)
  }

  test("WinnowMins == HOF sliding array_min windows (sorted distinct)") {
    val k = 3; val w = 4
    val df = (randTexts(120) ++ Seq("a", "a b", "a b c d e")).toDF("text")
    val toks = split(col("text"), "\\s+")
    val grams = ArrayKernels.shingleHashes(toks, k, distinct = false)
    val nWins = greatest(size(toks) - lit(k) - lit(w - 1), lit(0))
    val hof = array_sort(array_distinct(transform(sequence(lit(0), nWins),
      j => array_min(slice(grams, j + lit(1), lit(w))))))
    val rows = df.select(ArrayKernels.winnowMins(grams, w).as("native"), hof.as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
    for ((native, h) <- rows) assert(native == h)
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

  test("DeflateRatio: repetition compresses far below prose; bounds hold") {
    import spark.implicits._
    val rows = Seq(
      ("rep", "spam spam spam " * 200),
      ("prose", (1 to 400).map(i => s"w${i * 2654435761L % 9973}").mkString(" ")),
      ("empty", ""))
      .toDF("k", "t")
      .select(col("k"), ArrayKernels.deflateRatio(col("t")).as("r"))
      .as[(String, Double)].collect().toMap
    assert(rows("empty") == 1.0)
    assert(rows("rep") < 0.1, s"repetition ratio ${rows("rep")}")
    assert(rows("prose") > rows("rep") * 3, s"prose ${rows("prose")} vs rep ${rows("rep")}")
    assert(rows.values.forall(r => r > 0 && r <= 1.2))
    // deterministic across evaluations (thread-local deflater reset per row)
    val again = Seq(("rep", "spam spam spam " * 200)).toDF("k", "t")
      .select(ArrayKernels.deflateRatio(col("t"))).as[Double].collect().head
    assert(again == rows("rep"))
  }

  test("DeflateRatio stays inside whole-stage codegen") {
    // range, not a literal table: a foldable input constant-folds the whole
    // projection into a LocalTableScan and nothing gets codegen'd
    val df = spark.range(3)
      .select(ArrayKernels.deflateRatio(
        concat_ws(" ", lit("a b c"), col("id").cast("string"))).as("r"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"plan was:\n$plan")
  }

  test("HashedTf == the declarative per-dim md5-filter formulation") {
    // Value-identity with the formulation the kernel replaced (and with the
    // DuckDB oracle's list_transform/list_filter form): same md5-prefix
    // routing, same counts, every dim.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 50).select("doc_id", "text")
    val dims = 64
    val dimOf = transform(split(col("text"), " "),
      w => pmod(conv(substring(md5(w), 1, 6), 16, 10).cast("int"), lit(dims)))
    val declarative = transform(sequence(lit(0), lit(dims - 1)),
      d => size(filter(dimOf, x => x === d)).cast("double"))
    val rows = docs.select(
        ArrayKernels.hashedTf(col("text"), dims).as("k"),
        declarative.as("d"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Double](0) == r.getSeq[Double](1))
    }
  }

  test("HashedTf stays inside whole-stage codegen") {
    val df = spark.range(3)
      .select(ArrayKernels.hashedTf(
        concat_ws(" ", lit("a b c"), col("id").cast("string")), 16).as("v"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"plan was:\n$plan")
  }
}
