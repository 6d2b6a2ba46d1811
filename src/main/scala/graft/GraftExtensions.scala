package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions._

/** SQL surface for graft's native kernels.
  *
  * Two registration paths, both standard Spark extension mechanisms:
  *  - config: `--conf spark.sql.extensions=graft.GraftExtensions` (the
  *    SparkSessionExtensions injection point, applied at session build);
  *  - programmatic: `GraftFunctions.register(spark)` on a live session.
  *
  * After either, the kernels are plain SQL functions:
  * {{{
  *   SELECT dot_product(a, b),
  *          minhash_signature(shingle_hashes(split(text, '\\s+'), 3), 128, 42),
  *          simhash(split(text, '\\s+'))
  *   FROM docs
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, info, builder) triples in the shape FunctionRegistry wants. */
  val descriptors: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("dot_product",
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException("dot_product(arrA, arrB)")
      }),
    ("minhash_signature",
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => MinHashSignature(c, 128, 42L)
        case Seq(c, n) => MinHashSignature(c, intArg(n, "numHashes"), 42L)
        case Seq(c, n, s) => MinHashSignature(c, intArg(n, "numHashes"), longArg(s, "seed"))
        case _ => throw new IllegalArgumentException(
          "minhash_signature(hashes[, numHashes[, seed]])")
      }),
    ("shingle_hashes",
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => ShingleHashes(c, 3, distinct = true)
        case Seq(c, k) => ShingleHashes(c, intArg(k, "k"), distinct = true)
        case Seq(c, k, d) => ShingleHashes(c, intArg(k, "k"),
          d match { case Literal(b: Boolean, _) => b
                    case other => throw new IllegalArgumentException(
                      s"distinct must be a boolean literal, got $other") })
        case _ => throw new IllegalArgumentException("shingle_hashes(tokens[, k[, distinct]])")
      }),
    ("simhash",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => SimHash64(c)
        case _ => throw new IllegalArgumentException("simhash(tokens)")
      }),
    ("lsh_band_hashes",
      new ExpressionInfo(classOf[LshBandHashes].getName, "lsh_band_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(c, b, r) => LshBandHashes(c, intArg(b, "bands"), intArg(r, "rows"))
        case _ => throw new IllegalArgumentException("lsh_band_hashes(sig, bands, rows)")
      }),
    ("lang_id",
      new ExpressionInfo(classOf[LangIdExpr].getName, "lang_id"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => LangIdExpr(c, graft.llm.TextStats.LangProfiles.toSeq)
        case _ => throw new IllegalArgumentException("lang_id(tokens)")
      }),
    ("stopword_hits",
      new ExpressionInfo(classOf[WordSetHits].getName, "stopword_hits"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => WordSetHits(c, graft.llm.TextStats.EnglishStops)
        case _ => throw new IllegalArgumentException("stopword_hits(tokens)")
      }),
    ("winnow_mins",
      new ExpressionInfo(classOf[WinnowMins].getName, "winnow_mins"),
      (args: Seq[Expression]) => args match {
        case Seq(c, w) => WinnowMins(c, intArg(w, "w"))
        case _ => throw new IllegalArgumentException("winnow_mins(grams, w)")
      }),
    ("quantize_int8",
      new ExpressionInfo(classOf[QuantizeInt8].getName, "quantize_int8"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => QuantizeInt8(c)
        case _ => throw new IllegalArgumentException("quantize_int8(vec)")
      }),
    ("zorder",
      new ExpressionInfo(classOf[ZOrder64].getName, "zorder"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => ZOrder64(a, b)
        case _ => throw new IllegalArgumentException("zorder(keyA, keyB)")
      }),
    ("jaro_winkler",
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => JaroWinkler(a, b, winkler = true)
        case _ => throw new IllegalArgumentException("jaro_winkler(strA, strB)")
      }),
    ("jaro",
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => JaroWinkler(a, b, winkler = false)
        case _ => throw new IllegalArgumentException("jaro(strA, strB)")
      }),
    ("deflate_ratio",
      new ExpressionInfo(classOf[DeflateRatio].getName, "deflate_ratio"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => DeflateRatio(c)
        case _ => throw new IllegalArgumentException("deflate_ratio(text)")
      }),
    ("sign_bands",
      new ExpressionInfo(classOf[SignBands].getName, "sign_bands"),
      (args: Seq[Expression]) => args match {
        case Seq(v, b, p, d) => SignBands(v, intArg(b, "bands"),
          intArg(p, "planesPerBand"), intArg(d, "dim"), 42L)
        case Seq(v, b, p, d, s) => SignBands(v, intArg(b, "bands"),
          intArg(p, "planesPerBand"), intArg(d, "dim"), longArg(s, "seed"))
        case _ => throw new IllegalArgumentException(
          "sign_bands(vec, bands, planesPerBand, dim[, seed])")
      }),
    ("hashed_tf",
      new ExpressionInfo(classOf[HashedTf].getName, "hashed_tf"),
      (args: Seq[Expression]) => args match {
        case Seq(t, d) => HashedTf(t, intArg(d, "dims"))
        case _ => throw new IllegalArgumentException("hashed_tf(text, dims)")
      }),
    ("dhash64",
      new ExpressionInfo(classOf[DHash64].getName, "dhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => DHash64(c)
        case _ => throw new IllegalArgumentException("dhash64(media)")
      }),
    ("dhash_mode",
      new ExpressionInfo(classOf[DHashMode].getName, "dhash_mode"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => DHashMode(c)
        case _ => throw new IllegalArgumentException("dhash_mode(media)")
      })
  )

  /** Register into a live session (the non-config path). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    descriptors.foreach { case (name, info, builder) =>
      registry.registerFunction(FunctionIdentifier(name), info, builder)
    }
  }
}
