package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FITTED-tokenizer expressions for the SQL surface (the registerLangNb
  * loadfn-with-state analog): a trained model artifact rides into the
  * generated code via `addReferenceObj`, so SQL text reaches the exact
  * per-word walks the t86 (WordPiece greedy encode) and t72 (unigram
  * Viterbi) oracles replay — one codegen pass, no explode, no join.
  * Registered per session by `Graft.registerWordPiece` /
  * `Graft.registerUnigram`. */
object TokenizeExprs {

  private[functions] def checkString(dt: DataType, fn: String)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (dt == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$fn expects a string input, got $dt")

  /** The fitted WordPiece artifact shipped into codegen. */
  final class WpModel(val vocab: Set[String],
                      val unk: String) extends Serializable

  /** The fitted unigram artifact: census counts + smoothing total. */
  final class UgModel(val counts: java.util.HashMap[String, java.lang.Long],
                      val cv: Long,
                      val maxPieceSyms: Int) extends Serializable

  def computeWp(text: UTF8String, m: WpModel): GenericArrayData = {
    val out = Array.newBuilder[UTF8String]
    text.toString.split(" ", -1).foreach { w =>
      if (w.nonEmpty)
        graft.operators.WordPiece.encodeWord(w, m.vocab, m.unk)
          .foreach(p => out += UTF8String.fromString(p))
    }
    new GenericArrayData(
      out.result().asInstanceOf[Array[Any]])
  }

  def computeUg(text: UTF8String, m: UgModel): GenericArrayData = {
    val out = Array.newBuilder[UTF8String]
    val cnt: String => Option[Long] =
      s => Option(m.counts.get(s)).map(_.longValue())
    text.toString.split(" ", -1).foreach { w =>
      if (w.nonEmpty) {
        val (_, pieces) = graft.operators.Unigram.viterbi(
          graft.operators.Bpe.toSyms(w), cnt, m.cv, m.maxPieceSyms)
        pieces.foreach(p => out += UTF8String.fromString(p))
      }
    }
    new GenericArrayData(
      out.result().asInstanceOf[Array[Any]])
  }
}

/** `wordpiece_encode(text)` with a FITTED vocabulary: whitespace words
  * encode through the greedy longest-match walk
  * ([[graft.operators.WordPiece.encodeWord]] — the t86 semantics incl.
  * the `##`-continuation-only rule and the whole-word `[UNK]`
  * fallback), pieces concatenated across words. Null in → null out. */
case class WordPieceEncode(child: Expression,
                           vocab: Seq[String], unk: String)
    extends UnaryExpression {
  require(vocab.nonEmpty, "wordpiece_encode needs a non-empty vocabulary")
  require(unk.nonEmpty, "wordpiece_encode needs a non-empty unk token")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TokenizeExprs.checkString(child.dataType, "wordpiece_encode")

  @transient private lazy val model =
    new TokenizeExprs.WpModel(vocab.toSet, unk)

  override def nullSafeEval(input: Any): Any =
    TokenizeExprs.computeWp(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpModel", model,
      classOf[TokenizeExprs.WpModel].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenizeExprs.computeWp($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WordPieceEncode = copy(child = newChild)
}

/** `unigram_segment(text)` with a FITTED census: whitespace words
  * segment through the exact-integer Viterbi DP
  * ([[graft.operators.Unigram.viterbi]] — the t72 semantics: cost =
  * s64(C+V) − s64(cnt+1), tie-break (cost, n_pieces, earliest split)),
  * pieces (symbol strings, end-marked last symbol included)
  * concatenated across words. Null in → null out. */
case class UnigramSegment(child: Expression,
                          counts: Seq[(String, Long)], cv: Long,
                          maxPieceSyms: Int)
    extends UnaryExpression {
  require(counts.nonEmpty, "unigram_segment needs a non-empty census")
  require(cv >= 1 && cv < (1L << 57),
    s"unigram_segment: C+V = $cv outside surprisal64's shift domain")
  require(maxPieceSyms >= 1,
    s"unigram_segment needs maxPieceSyms >= 1, got $maxPieceSyms")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TokenizeExprs.checkString(child.dataType, "unigram_segment")

  @transient private lazy val model = {
    val m = new java.util.HashMap[String, java.lang.Long](counts.length * 2)
    counts.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
    new TokenizeExprs.UgModel(m, cv, maxPieceSyms)
  }

  override def nullSafeEval(input: Any): Any =
    TokenizeExprs.computeUg(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugModel", model,
      classOf[TokenizeExprs.UgModel].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenizeExprs.computeUg($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : UnigramSegment = copy(child = newChild)
}
