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

  /** Squared Euclidean distance between two array<double> columns —
    * left-to-right index-order fold of (x−y)², bit-identical to the
    * `aggregate(zip_with(a, b, (x,y) => (x−y)*(x−y)), 0.0, _+_)` HOF it
    * replaces in the classifier scoring paths (each (x−y)² computed
    * independently, summed in order). The panel variant against a FIXED
    * centroid matrix is [[sqDistsToCentroids]]; this one takes both sides
    * from the row (e.g. a broadcast-joined per-class centroid column). */
  def sqDist(a: Column, b: Column): Column =
    column(SqDist(expression(a), expression(b)))

  /** MinHash signature: array of `numHashes` minima of
    * h_j(x) = (a_j·x + b_j) mod (2^31-1) over the input hash array. */
  def minhash(shingleHashes: Column, numHashes: Int = 128, seed: Long = 42L): Column =
    column(MinHashSignature(expression(shingleHashes), numHashes, seed))

  /** xxhash64 of each k-token gram ("t1 t2 … tk" space-joined) over an
    * array<string> of tokens; hash values identical to
    * `xxhash64(concat_ws(" ", slice(toks, i, k)))`. */
  def shingleHashes(tokens: Column, k: Int, distinct: Boolean = true): Column =
    column(ShingleHashes(expression(tokens), k, distinct))

  /** 64-bit SimHash over an array<string> of tokens; values identical to the
    * declarative xxhash64-per-token sign-sum formulation. */
  def simhash(tokens: Column): Column = column(SimHash64(expression(tokens)))

  /** SimHash over PRECOMPUTED array<bigint> token hashes — the same sign-sum
    * bit rule as [[simhash]] minus the internal xxhash64, so callers can
    * feed an engine-portable hash (md5-derived) and keep the signature
    * DuckDB-oracle-checkable. */
  def simhashOfHashes(hashes: Column): Column =
    column(SimHashOfHashes(expression(hashes)))

  /** LSH band bucket keys: hash of each `rows`-element band slice of a
    * minhash signature (array<bigint>) → array<bigint> of `bands` keys. */
  def lshBandHashes(sig: Column, bands: Int, rows: Int): Column =
    column(LshBandHashes(expression(sig), bands, rows))

  /** Stopword-profile language ID over an array<string> of tokens. */
  def langId(tokens: Column, profiles: Seq[(String, Seq[String])]): Column =
    column(LangIdExpr(expression(tokens), profiles))

  /** Count of tokens contained in the fixed word set. */
  def wordSetHits(tokens: Column, words: Seq[String]): Column =
    column(WordSetHits(expression(tokens), words))

  /** Sliding-window minima of positional gram hashes, sorted distinct. */
  def winnowMins(grams: Column, w: Int): Column =
    column(WinnowMins(expression(grams), w))

  /** Per-vector int8 min-max quantization of an array<double>. */
  def quantizeInt8(vec: Column): Column = column(QuantizeInt8(expression(vec)))

  /** Z-order (Morton) interleave of two bigint keys' low 32 bits. */
  def zorder(a: Column, b: Column): Column =
    column(ZOrder64(expression(a), expression(b)))

  /** Banded sign-LSH signatures of an array<double> vector: array<bigint> of
    * `bands` bucket keys, band b's bit j set iff dot(vec, plane_{b·ppb+j})>0.
    * One fused loop over a seed-derived plane matrix — the composed
    * formulation (bands × planes separate dot+when nodes) builds an
    * expression tree that defeats whole-stage codegen at realistic plane
    * counts (32×16 = 512 nodes). */
  def signBands(vec: Column, bands: Int, planesPerBand: Int, dim: Int,
                seed: Long = 42L): Column =
    column(SignBands(expression(vec), bands, planesPerBand, dim, seed))

  /** Deflate compression ratio (compressed bytes / raw bytes) of a string —
    * the classic redundancy quality signal: boilerplate and template spam
    * compress far below ~0.4, natural prose sits around 0.5-0.7. */
  def deflateRatio(text: Column): Column =
    column(DeflateRatio(expression(text)))

  /** Feature-hashed bag-of-words: `dims`-component Double count vector,
    * token → dim by md5-prefix routing (first 3 digest bytes mod dims —
    * exactly `conv(substring(md5(w),1,6),16,10) % dims`, the engine-portable
    * rule). One primitive pass over the tokens; the declarative
    * per-dim-filter formulation it replaces is O(dims × tokens) of
    * interpreted lambda evals per row (measured 34 s for 3 GD epochs over
    * sf0.1 documents vs sub-second here). */
  def hashedTf(text: Column, dims: Int): Column =
    column(HashedTf(expression(text), dims))

  /** Squared Euclidean distance from an array<double> vector to each of a
    * fixed centroid panel — array<double> of `cents.length` values, each
    * the left-to-right index-order fold of (x−c)². BIT-IDENTICAL to the
    * `aggregate(zip_with(v, c, (x,y) => (x−y)*(x−y)), 0.0, _+_)` HOF
    * formulation it replaces in the Lloyd assignment rule (same per-dim
    * square, same summation order), so the pinned k-means/IVF trajectories
    * and their DuckDB oracles are unchanged — only the interpreted
    * per-element lambdas (k × dim closure evals per row) become one
    * codegen'd primitive loop. */
  def sqDistsToCentroids(vec: Column, cents: Array[Array[Double]]): Column =
    column(SqDistsToCentroids(expression(vec),
      cents.map(_.toIndexedSeq).toIndexedSeq))
}

/** Left-to-right double-precision dot product of two array<double> columns.
  *
  * Length contract (deliberate ASYMMETRY vs the Euclidean kernels —
  * advisor, round 14): mismatched input lengths are CLAMPED to the shorter
  * array here, while [[SqDist]]/[[SqDistsToCentroids]] THROW. The Euclidean
  * twins feed hard assignment rules (k-means, IVF routing) where a partial
  * sum silently mis-assigns a row and MUST fail loudly; DotProduct is a
  * general scoring primitive whose declared callers all pass matched
  * lengths already (prefix-truncation scoring like q_matryoshka slices
  * BOTH sides to k first), so tightening it buys no declared caller
  * anything while adding a new runtime abort path. Do not assume the
  * array kernels share one length convention. */
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

  private val P = MinHashSignature.P

  @transient private lazy val (aCoeffs, bCoeffs): (Array[Long], Array[Long]) =
    MinHashSignature.coefficients(numHashes, seed)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_signature expects array<bigint> of element hashes, got ${other.simpleString}")
    }

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

object MinHashSignature {
  /** Mersenne prime 2³¹−1: a·x+b stays under 2⁶² for a,x < P, so the affine
    * permutations are exact in 64-bit arithmetic on ANY engine — what keeps
    * a signature built from portable element hashes oracle-checkable. */
  val P: Long = (1L << 31) - 1

  /** The seed-derived permutation coefficients — shared by the expression
    * and the DuckDB oracle builder so the two can never drift. */
  def coefficients(numHashes: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val as = Array.fill(numHashes)(math.abs(rnd.nextLong()) % (P - 1) + 1)
    val bs = Array.fill(numHashes)(math.abs(rnd.nextLong()) % P)
    (as, bs)
  }
}

/** Hashes of the k-token shingles of an array<string> token column.
  *
  * Gram i = tokens[i..i+k-1] joined by a single space, hashed with Spark's
  * xxhash64 (seed 42) — byte-identical to
  * `xxhash64(concat_ws(" ", slice(toks, i+1, k)))`, so swapping the HOF
  * formulation for this kernel changes nothing downstream (MinHash
  * signatures, Jaccard counts, winnowing fingerprints all keep their values).
  * Tokens shorter than k yield the single whole-array gram, matching
  * `slice`'s clamping. Null array elements are skipped by concat_ws
  * semantics.
  */
case class ShingleHashes(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleHashes.compute(input.asInstanceOf[ArrayData], k, distinct))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ShingleHashes.compute($c, $k, $distinct));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  import org.apache.spark.unsafe.types.UTF8String

  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and codegen (the per-gram work is dominated
    * by string concat + hashing, so a method call per row costs nothing). */
  def compute(arr: ArrayData, k: Int, distinct: Boolean): Array[Long] = {
    val n = arr.numElements()
    val nGrams = math.max(n - k, 0) + 1
    val out = new Array[Long](nGrams)
    val gram = new Array[UTF8String](k)
    var i = 0
    var m = 0
    while (i < nGrams) {
      var j = 0
      val len = math.min(k, n - i) // slice clamps at the array end
      while (j < len) { gram(j) = arr.getUTF8String(i + j); j += 1 }
      val joined =
        if (len == k) UTF8String.concatWs(Space, gram: _*)
        else UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(gram, 0, len): _*)
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        joined, StringType, 42L)
      if (!distinct || !contains(out, m, h)) { out(m) = h; m += 1 }
      i += 1
    }
    if (m == out.length) out else java.util.Arrays.copyOfRange(out, 0, m)
  }

  // Linear scan dedup: gram counts per doc are small (tens to hundreds) and
  // first-occurrence order must be preserved (array_distinct semantics).
  private def contains(a: Array[Long], len: Int, v: Long): Boolean = {
    var i = 0
    while (i < len) { if (a(i) == v) return true; i += 1 }
    false
  }
}

/** 64-bit SimHash of an array<string> token column.
  *
  * Per token: h = xxhash64(token, seed 42); per bit j: count += (h>>j & 1) ?
  * +1 : -1; signature bit j set iff count > 0 — identical to the declarative
  * fold (`aggregate` over +1/-1 arrays) it replaces, at primitive-loop cost.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** SimHash over an array<bigint> of PRECOMPUTED token hashes: per bit j,
  * count += (h>>j & 1) ? +1 : -1; signature bit j set iff count > 0 — the
  * [[SimHash64]] rule with the hashing step lifted out, so the caller
  * chooses an engine-portable hash and the DuckDB oracle can restate the
  * signature as a per-bit sign-sum. */
case class SimHashOfHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash_of_hashes expects array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    SimHashOfHashes.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashOfHashes.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashOfHashes =
    copy(child = newChild)
}

object SimHashOfHashes {
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }
}

object SimHash64 {
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        arr.getUTF8String(i), StringType, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }
}

/** Bucket key per LSH band: XXH64 chained over the band's `rows` signature
  * values. Bucket keys are internal join keys only — any deterministic hash
  * of the slice gives the same banding semantics (equal slices ⇔ equal keys,
  * up to negligible 64-bit collisions, which only add candidates that the
  * exact-Jaccard verify step then filters).
  */
case class LshBandHashes(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lsh_band_hashes expects array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(LshBandHashes.compute(input.asInstanceOf[ArrayData], bands, rows))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.LshBandHashes.compute($c, $bands, $rows));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): LshBandHashes =
    copy(child = newChild)
}

object LshBandHashes {
  def compute(sig: ArrayData, bands: Int, rows: Int): Array[Long] = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var r = 0
      while (r < rows) {
        val idx = b * rows + r
        if (idx < sig.numElements())
          h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(sig.getLong(idx), h)
        r += 1
      }
      out(b) = h
      b += 1
    }
    out
  }
}

/** Stopword-profile language ID over an array<string> token column.
  *
  * One pass over the tokens scoring every profile via hash-set membership,
  * then argmax — semantics identical to the declarative formulation in
  * graft.llm.TextStats (per-profile filter + greatest(struct(score, lang)):
  * score ties resolve to the lexicographically greatest language code, and
  * zero hits → "und").
  */
case class LangIdExpr(child: Expression, profiles: Seq[(String, Seq[String])])
    extends UnaryExpression {
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lang_id expects array<string>, got ${other.simpleString}")
    }

  // Sorted by language code so argmax tie-breaking (last max wins) matches
  // greatest(struct(score, lang)) exactly.
  @transient private lazy val table: LangIdExpr.Profiles = {
    val sorted = profiles.sortBy(_._1)
    new LangIdExpr.Profiles(
      sorted.map(p => UTF8String.fromString(p._1)).toArray,
      sorted.map { p =>
        val s = new java.util.HashSet[UTF8String]()
        p._2.foreach(w => s.add(UTF8String.fromString(w)))
        s
      }.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    table.score(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tbl = ctx.addReferenceObj("langProfiles", table,
        classOf[LangIdExpr.Profiles].getName)
      s"${ev.value} = $tbl.score($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

object LangIdExpr {
  import org.apache.spark.unsafe.types.UTF8String

  private val Und = UTF8String.fromString("und")

  final class Profiles(langs: Array[UTF8String],
                       sets: Array[java.util.HashSet[UTF8String]])
      extends Serializable {
    def score(arr: ArrayData): UTF8String = {
      val scores = new Array[Int](langs.length)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val tok = arr.getUTF8String(i)
        var p = 0
        while (p < langs.length) {
          if (sets(p).contains(tok)) scores(p) += 1
          p += 1
        }
        i += 1
      }
      var best = 0
      var p = 1
      while (p < langs.length) { if (scores(p) >= scores(best)) best = p; p += 1 }
      if (scores(best) > 0) langs(best) else Und
    }
  }
}

/** Count of tokens contained in a fixed word set (stopword profiles,
  * vocabulary hits). One hash-set pass; replaces the interpreted
  * `size(filter(toks, t => array_contains(wordArr, t)))` formulation. */
case class WordSetHits(child: Expression, words: Seq[String])
    extends UnaryExpression {
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_set_hits expects array<string>, got ${other.simpleString}")
    }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var hits = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) { if (set.contains(arr.getUTF8String(i))) hits += 1; i += 1 }
    hits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |${ev.value} = 0;
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($s.contains($c.getUTF8String($i))) ${ev.value}++;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordSetHits =
    copy(child = newChild)
}

/** Winnowing fingerprint tail: sliding-window minima over positional gram
  * hashes, returned sorted+distinct (Schleimer et al., SIGMOD'03). Window
  * count and end-clamping match the declarative
  * `transform(sequence(0, greatest(n-w, 0)), j => array_min(slice(grams,
  * j+1, w)))` formulation exactly. */
case class WinnowMins(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_mins expects array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(WinnowMins.compute(input.asInstanceOf[ArrayData], w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.WinnowMins.compute($c, $w));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WinnowMins =
    copy(child = newChild)
}

object WinnowMins {
  def compute(grams: ArrayData, w: Int): Array[Long] = {
    val n = grams.numElements()
    val nWins = math.max(n - w, 0) + 1
    val mins = new Array[Long](nWins)
    var j = 0
    while (j < nWins) {
      var m = Long.MaxValue
      val end = math.min(j + w, n)
      var i = j
      while (i < end) { val v = grams.getLong(i); if (v < m) m = v; i += 1 }
      mins(j) = m
      j += 1
    }
    val sorted = mins.distinct
    java.util.Arrays.sort(sorted)
    sorted
  }
}

/** int8 min-max scalar quantization of an array<double> (ANN compression).
  *
  * Two O(d) passes — extremes, then codes — with the same IEEE arithmetic
  * as the declarative/SQL formulation (`scale = (mx-mn)/255.0`,
  * `code = floor((x-mn)/scale + 0.5) - 128`), so for finite inputs any
  * engine computes the identical codes. The higher-order-function version
  * re-evaluated array_min/array_max inside the per-element lambda — O(d²)
  * per vector.
  *
  * Degenerate inputs are explicit, not engine-defined: null elements pass
  * through as null codes (skipped for the extremes), and a vector
  * containing NaN quantizes to all-null codes — NaN poisons the scale in
  * every formulation, so surfacing null beats emitting garbage codes.
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"quantize_int8 expects array<double>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    QuantizeInt8.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.QuantizeInt8.compute($c);""")

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object QuantizeInt8 {
  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var hasNaN = false
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val x = v.getDouble(i)
        if (x.isNaN) hasNaN = true
        else {
          if (x < mn) mn = x
          if (x > mx) mx = x
        }
      }
      i += 1
    }
    val out = new Array[Any](n)
    if (!hasNaN) { // NaN → all-null codes (see scaladoc); else code per element
      val scale = if (mx > mn) (mx - mn) / 255.0 else 1.0
      i = 0
      while (i < n) {
        if (!v.isNullAt(i))
          out(i) = math.floor((v.getDouble(i) - mn) / scale + 0.5).toInt - 128
        i += 1
      }
    }
    new GenericArrayData(out)
  }
}

/** Z-order (Morton) interleave of two bigint keys' low 32 bits.
  *
  * Sorting by the interleaved value clusters rows that are close in BOTH
  * dimensions, so a sorted parquet layout gets tight per-file min/max
  * statistics on both columns at once — 2-D data skipping, where a plain
  * sort gives it on the leading column only. Keys are taken modulo 2^32
  * (ids and hashes; negative values contribute their low bits).
  */
case class ZOrder64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"zorder expects (bigint, bigint), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder64.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrder64.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder64 =
    copy(left = newLeft, right = newRight)
}

object ZOrder64 {
  /** Spread the low 32 bits of x into the even bit positions — the standard
    * constant-time Morton spread (5 shift-mask steps), ~an order of
    * magnitude fewer ops than a per-bit loop on the table-write hot path. */
  private def spread(x: Long): Long = {
    var v = x & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8))  & 0x00FF00FF00FF00FFL
    v = (v | (v << 4))  & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2))  & 0x3333333333333333L
    v = (v | (v << 1))  & 0x5555555555555555L
    v
  }

  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

/** Banded random-hyperplane LSH signatures over an array<double> vector.
  *
  * Output: array<bigint> of `bands` bucket keys; band b's key has bit j set
  * iff dot(vec, plane_{b·planesPerBand+j}) > 0. The plane matrix is derived
  * from `seed` on the driver (same Gaussian sequence as
  * `Similarity.hyperplanes`) and shipped into generated code as one flat
  * double[] — evaluating bands·planesPerBand·dim multiply-adds in a single
  * fused loop nest. The composed alternative (one dot + when node per plane)
  * is semantically identical but produces a 512-node expression tree at
  * production plane counts, which overruns JVM method limits and drops the
  * stage out of whole-stage codegen.
  */
case class SignBands(child: Expression, bands: Int, planesPerBand: Int,
                     dim: Int, seed: Long) extends UnaryExpression {
  require(bands >= 1 && planesPerBand >= 1 && planesPerBand <= 63 && dim >= 1,
    "signBands expects bands >= 1, 1 <= planesPerBand <= 63, dim >= 1")

  // Flat row-major [plane][component]; identical Gaussian draw order to
  // Similarity.hyperplanes(bands * planesPerBand, dim, seed).
  @transient private lazy val planesFlat: Array[Double] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bands * planesPerBand * dim)(rnd.nextGaussian())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sign_bands expects array<double>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var j = 0
      while (j < planesPerBand) {
        val base = (b * planesPerBand + j) * dim
        var s = 0.0
        var k = 0
        while (k < n) { s += planesFlat(base + k) * v.getDouble(k); k += 1 }
        if (s > 0) sig |= 1L << j
        j += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val planes = ctx.addReferenceObj("signBandPlanes", planesFlat, "double[]")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      val base = ctx.freshName("base")
      s"""
         |long[] $out = new long[$bands];
         |int $n = java.lang.Math.min($dim, $c.numElements());
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $sig = 0L;
         |  for (int $j = 0; $j < $planesPerBand; $j++) {
         |    int $base = ($b * $planesPerBand + $j) * $dim;
         |    double $s = 0.0;
         |    for (int $k = 0; $k < $n; $k++) {
         |      $s += $planes[$base + $k] * $c.getDouble($k);
         |    }
         |    if ($s > 0) $sig |= 1L << $j;
         |  }
         |  $out[$b] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignBands =
    copy(child = newChild)
}

/** Deflate compression ratio of a UTF-8 string: deflate(bytes).length /
  * bytes.length, raw deflate (no zlib header), BEST_SPEED. Values are
  * deterministic for a given JDK zlib, which is all the quality FILTER needs
  * (the threshold is calibrated on the same pipeline that scores) — hence a
  * rows-only query: no SQL oracle can reproduce another engine's deflate.
  *
  * The Deflater is thread-local and reset per row — allocating one per row
  * costs more than the compression itself at short document lengths.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"deflate_ratio expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    DeflateRatio.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeflateRatio.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatio {
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true)
  }

  def compute(s: org.apache.spark.unsafe.types.UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](4096)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }
}

/** Feature-hashed bag-of-words of a space-separated string: Double count
  * vector of `dims` components, token routed to dim = (first 3 md5 digest
  * bytes as int) mod dims — bit-identical to the declarative
  * `pmod(conv(substring(md5(w), 1, 6), 16, 10), dims)` routing and to the
  * DuckDB `CAST(concat('0x', substr(md5(w), 1, 6)) AS INTEGER) % dims`
  * oracle form (3 bytes ≡ 6 hex digits; < 2^24 so never negative). */
case class HashedTf(child: Expression, dims: Int) extends UnaryExpression {
  require(dims >= 1, "dims must be >= 1")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hashed_tf expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(HashedTf.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], dims))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.HashedTf.compute($c, $dims));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): HashedTf =
    copy(child = newChild)
}

object HashedTf {
  import org.apache.spark.unsafe.types.UTF8String

  private val Space = UTF8String.fromString(" ")

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Splits on the literal single space (what `split(text, " ")` and
    * DuckDB's `string_split(text, ' ')` both produce, empty tokens
    * included) and counts md5-routed dims in one pass. */
  def compute(s: UTF8String, dims: Int): Array[Double] = {
    val counts = new Array[Double](dims)
    val toks = s.split(Space, -1)
    val md = md5Local.get()
    var i = 0
    while (i < toks.length) {
      md.reset()
      val digest = md.digest(toks(i).getBytes)
      val prefix = ((digest(0) & 0xff) << 16) | ((digest(1) & 0xff) << 8) |
        (digest(2) & 0xff)
      counts(prefix % dims) += 1.0
      i += 1
    }
    counts
  }
}

/** Squared Euclidean distances from a vector to a fixed centroid panel.
  *
  * The centroid matrix rides the generated code as one flat reference
  * array (row-major, stride = dim); per centroid the fold is strictly
  * index-order left-to-right in double precision — the exact arithmetic of
  * the zip_with+aggregate formulation (each (x−y)² computed independently,
  * then summed in order), so assignments and the 9-decimal-rounded means
  * downstream can never fork from the pinned trajectory.
  *
  * Input contract (advisor, round 13): MATCHED-DIM dense vectors only —
  * element nulls unsupported, and a vector whose length differs from the
  * centroid dim throws rather than silently scoring a partial sum. (This
  * diverges from the aggregate(zip_with(...)) HOF, which pads to the
  * longer array and null-propagates the whole distance; a malformed
  * embedding row should fail LOUDLY here, not drop out silently — every
  * declared caller fits vectors of one fixed dim.) */
case class SqDistsToCentroids(child: Expression, cents: IndexedSeq[IndexedSeq[Double]])
    extends UnaryExpression {

  @transient private lazy val flat: Array[Double] = cents.flatten.toArray
  private def k: Int = cents.length
  private def dim: Int = if (cents.isEmpty) 0 else cents.head.length

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sq_dists_to_centroids expects array<double>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(SqDistsToCentroids.compute(
      input.asInstanceOf[ArrayData], flat, k, dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lloydCents", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.SqDistsToCentroids.compute($c, $ref, $k, $dim));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SqDistsToCentroids =
    copy(child = newChild)
}

object SqDistsToCentroids {
  def compute(v: ArrayData, flat: Array[Double], k: Int, dim: Int): Array[Double] = {
    if (k > 0 && v.numElements() != dim)
      throw new IllegalArgumentException(
        s"sq_dists_to_centroids: vector dim ${v.numElements()} != centroid dim $dim " +
          "(matched-dim dense vectors required; see SqDistsToCentroids scaladoc)")
    val n = dim
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      val base = j * dim
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = v.getDouble(i) - flat(base + i)
        acc += d * d
        i += 1
      }
      out(j) = acc
      j += 1
    }
    out
  }
}

/** Left-to-right (x−y)² fold of two array<double> columns — the squared-
  * Euclidean twin of [[DotProduct]].
  *
  * Input contract (advisor, round 13): MATCHED-LENGTH dense vectors only —
  * element nulls unsupported; a length mismatch throws rather than
  * silently scoring a partial sum (the HOF formulation null-propagates
  * instead; a malformed embedding row should fail loudly here). */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sq_dist expects (array<double>, array<double>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = SqDist.checkedLen(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |${ev.value} = 0.0;
         |int $n = graft.functions.SqDist.checkedLen($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  ${ev.value} += $d * $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

object SqDist {
  /** One int compare per row; called from both eval and generated code. */
  def checkedLen(a: Int, b: Int): Int = {
    if (a != b)
      throw new IllegalArgumentException(
        s"sq_dist: vector lengths differ ($a vs $b) — matched-length dense " +
          "vectors required; see SqDist scaladoc")
    a
  }
}
