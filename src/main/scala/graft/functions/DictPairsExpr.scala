package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Dictionary-encoded adjacent-word pairs in ONE codegen pass — the
  * TextRank edge extractor (t92). For each space-adjacent token pair
  * (a, b) with BOTH tokens in the bounded node dictionary and a ≠ b,
  * emits the packed long `id(a) << 32 | id(b)`. Replaces the
  * arrays_zip-slice explode + two broadcast string joins: the struct
  * explode materialized every adjacent pair of the corpus as a
  * (string, string) row and probed two broadcast maps per row —
  * this walk tokenizes, filters, and encodes in one scan, and only
  * IN-DICTIONARY pairs ever become rows (the dictionary is ≤ maxNodes
  * words, so the surviving pair stream is graph-sized, not
  * corpus-sized). The dictionary ships into the generated code via
  * `addReferenceObj` (the AcAutomaton/Bloom precedent).
  *
  * Tokenization is `split(" ", -1)` semantics (the t69 trailing-empty
  * rule): empty tokens break adjacency exactly like any
  * out-of-dictionary token — both endpoints must be dictionary words,
  * and an empty string is never one. Pair identity is by dictionary
  * id, so a ≠ b ⟺ id(a) ≠ id(b) — bit-identical to the string filter
  * the DuckDB oracle replays (spec-fuzzed against the zip replica). */
case class DictPairCodes(child: Expression, dict: Seq[String])
    extends UnaryExpression {
  require(dict.nonEmpty && dict.forall(_.nonEmpty),
    "dict_pair_codes needs a non-empty dictionary of non-empty words")
  require(dict.distinct.length == dict.length,
    "dict_pair_codes dictionary must be duplicate-free")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dict_pair_codes expects a string input, got ${child.dataType}")

  @transient private lazy val map: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](dict.length * 2)
    dict.zipWithIndex.foreach { case (w, i) => m.put(w, i) }
    m
  }

  override def nullSafeEval(input: Any): Any =
    DictPairCodes.compute(input.asInstanceOf[UTF8String], map)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("dictMap", map,
      "java.util.HashMap<String, Integer>")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DictPairCodes.compute($c, $mapRef)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : DictPairCodes = copy(child = newChild)
}

object DictPairCodes {

  def compute(text: UTF8String,
              dict: java.util.HashMap[String, Integer]): GenericArrayData = {
    val s = text.toString
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    val n = s.length
    var prevId = -1
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        var id = -1
        if (i > start) {
          val v = dict.get(s.substring(start, i))
          if (v != null) id = v.intValue()
        }
        // ids are a duplicate-free dictionary, so id(a) != id(b) IS the
        // a != b string filter
        if (prevId >= 0 && id >= 0 && prevId != id)
          out += (prevId.toLong << 32) | id.toLong
        prevId = id
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.result())
  }

  /** Column form: array<long> of packed in-dictionary adjacent pairs. */
  def dictPairCodes(text: Column, dict: Seq[String]): Column =
    ColumnInternals.column(DictPairCodes(ColumnInternals.expr(text), dict))
}
