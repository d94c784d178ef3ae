package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character n-gram array in ONE codegen pass — the hot-loop form of
  * `transform(sequence(1, length(t)-n+1), i -> substr(t, i, n))`:
  * that HOF chain is CodegenFallback AND re-seeks the byte offset of
  * character i on every call (O(len²) on multibyte text); this walks
  * the UTF-8 byte offsets once and slices each gram directly. LangNb
  * scoring over a 500k-doc corpus went ~20× faster when its gram
  * explode switched over (the t33 "go codegen when the scan dominates"
  * rule). Character counting = code points, exactly what Spark's
  * substr/length and DuckDB's substr/length count, so the oracle's
  * substr replay stays bit-identical (LangNbSpec pins this form equal
  * to the HOF chain). */
case class CharGrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && n >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_grams expects a string input and n >= 1, got " +
          s"${child.dataType}, n=$n")

  override def nullSafeEval(input: Any): Any =
    CharGrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharGrams.compute($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): CharGrams = copy(child = newChild)
}

object CharGrams {
  /** All length-n code-point windows of `text`, empty below n chars. */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val bytes = text.getBytes
    // one walk: byte offset of every character start
    var count = 0
    var i = 0
    while (i < bytes.length) {
      count += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    val offs = new Array[Int](count + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      offs(c) = i
      c += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(count) = bytes.length
    val m = math.max(count - n + 1, 0)
    val out = new Array[AnyRef](m)
    var k = 0
    while (k < m) {
      val start = offs(k)
      val len = offs(k + n) - start
      val b = new Array[Byte](len)
      System.arraycopy(bytes, start, b, 0, len)
      out(k) = UTF8String.fromBytes(b)
      k += 1
    }
    new GenericArrayData(out)
  }

  def charGrams(c: Column, n: Int): Column =
    ColumnInternals.column(CharGrams(ColumnInternals.expr(c), n))
}
