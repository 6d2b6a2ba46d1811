package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation under a unigram language model over subword pieces
  * (the decode step of SentencePiece's unigram tokenizer, Kudo 2018,
  * "Subword Regularization"): best[i] = max over pieces ending at i of
  * best[j] + logp(piece). The MODEL (pieces + log-probabilities) travels as
  * constructor state — plan-embedded constants, the StreamingClassify
  * weights-in-plan economics — so scoring is a stateless per-row kernel
  * that stays inside whole-stage codegen via `addReferenceObj`, and the EM
  * trainer ([[graft.llm.Unigram]]) rebuilds the expression with fresh
  * literals each iteration instead of shipping a model table into a join.
  *
  * Determinism contract (the spec mirror depends on it): candidate pieces
  * are scanned by ascending start position j, a candidate replaces the
  * incumbent only on a STRICTLY greater score, so score ties resolve to the
  * longest piece. Characters absent from the model score [[UnigramViterbi.OovLogp]]
  * (single-character closure is the trainer's job; the floor keeps the DP
  * total even on unseen input).
  */
case class UnigramViterbi(child: Expression,
                          pieces: Array[String],
                          logp: Array[Double]) extends UnaryExpression {
  require(pieces.length == logp.length, "pieces and logp must align")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unigram_viterbi expects string, got ${other.simpleString}")
    }

  @transient private lazy val model: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), logp(i)); i += 1 }
    m
  }

  @transient private lazy val maxLen: Int =
    if (pieces.isEmpty) 1 else pieces.map(_.length).max

  /** The per-row kernel: segment `word`, returning the piece array. */
  def segment(word: UTF8String): Array[UTF8String] = {
    val s = word.toString
    val n = s.length
    if (n == 0) return Array.empty
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      best(i) = Double.NegativeInfinity
      back(i) = i - 1
      var j = math.max(0, i - maxLen)
      var found = false
      while (j < i) {
        val lp = model.get(s.substring(j, i))
        if (lp != null) {
          val cand = best(j) + lp.doubleValue
          if (cand > best(i)) { best(i) = cand; back(i) = j; found = true }
        }
        j += 1
      }
      if (!found) {
        // unseen character fallback: consume one char at the floor score
        best(i) = best(i - 1) + UnigramViterbi.OovLogp
        back(i) = i - 1
      }
      i += 1
    }
    // backtrack
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var pos = n
    while (pos > 0) {
      val j = back(pos)
      out += UTF8String.fromString(s.substring(j, pos))
      pos = j
    }
    out.reverse.toArray
  }

  /** DP total score of the best segmentation (same loop as [[segment]]). */
  def score(word: UTF8String): Double = {
    val s = word.toString
    val n = s.length
    val best = new Array[Double](n + 1)
    var i = 1
    while (i <= n) {
      best(i) = Double.NegativeInfinity
      var j = math.max(0, i - maxLen)
      var found = false
      while (j < i) {
        val lp = model.get(s.substring(j, i))
        if (lp != null) {
          val cand = best(j) + lp.doubleValue
          if (cand > best(i)) { best(i) = cand; found = true }
        }
        j += 1
      }
      if (!found) best(i) = best(i - 1) + UnigramViterbi.OovLogp
      i += 1
    }
    best(n)
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      segment(input.asInstanceOf[UTF8String]).asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramViterbi", this,
      classOf[UnigramViterbi].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) $ref.segment($c));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramViterbi =
    copy(child = newChild)
}

object UnigramViterbi {
  /** Log-probability charged for a character the model has never seen. */
  val OovLogp: Double = -25.0

  def apply(col: Column, pieces: Array[String], logp: Array[Double]): Column = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    column(UnigramViterbi(expression(col), pieces, logp))
  }
}

/** Greedy longest-match-first segmentation over the same piece vocabulary —
  * the WordPiece DECODE rule (Wu et al. 2016; BERT's tokenizer applies the
  * same maximum-munch scan): at each position consume the LONGEST vocab
  * piece, falling back to a single character when nothing matches. Same
  * model-as-constructor-state economics as [[UnigramViterbi]]; the two
  * kernels share a vocabulary so q_wordpiece_audit can measure exactly what
  * the O(n·maxLen) greedy rule gives up against the O(n·maxLen) DP optimum.
  *
  * Determinism: maximum munch is inherently deterministic (longest match is
  * unique at a fixed position); the only convention is the OOV fallback,
  * which mirrors the Viterbi kernel's single-char floor.
  */
case class WordPieceGreedy(child: Expression,
                           pieces: Array[String],
                           logp: Array[Double]) extends UnaryExpression {
  require(pieces.length == logp.length, "pieces and logp must align")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"wordpiece_greedy expects string, got ${other.simpleString}")
    }

  @transient private lazy val vocab: java.util.HashSet[String] = {
    val v = new java.util.HashSet[String](pieces.length * 2)
    pieces.foreach(v.add)
    v
  }

  @transient private lazy val maxLen: Int =
    if (pieces.isEmpty) 1 else pieces.map(_.length).max

  /** The per-row kernel: maximum-munch scan, returning the piece array. */
  def segment(word: UTF8String): Array[UTF8String] = {
    val s = word.toString
    val n = s.length
    if (n == 0) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var pos = 0
    while (pos < n) {
      var len = math.min(maxLen, n - pos)
      while (len > 1 && !vocab.contains(s.substring(pos, pos + len))) len -= 1
      // len == 1 falls through whether in-vocab or the OOV single-char floor
      out += UTF8String.fromString(s.substring(pos, pos + len))
      pos += len
    }
    out.toArray
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      segment(input.asInstanceOf[UTF8String]).asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordPieceGreedy", this,
      classOf[WordPieceGreedy].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) $ref.segment($c));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceGreedy =
    copy(child = newChild)
}

object WordPieceGreedy {
  def apply(col: Column, pieces: Array[String], logp: Array[Double]): Column = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    column(WordPieceGreedy(expression(col), pieces, logp))
  }
}
