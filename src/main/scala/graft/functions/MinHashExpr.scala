package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All-k MinHash signature in ONE pass over the tokens.
  *
  * Semantically identical to k copies of `Text.minhashExpr` —
  * `array_min(transform(split(text,' '), w -> (a*code(w)+b) % P))` —
  * but those are CodegenFallback higher-order functions that re-split
  * the text and re-hash every token k times. This expression tokenizes
  * once and folds all k (a,b) pairs per token: the signature stage of
  * LSH dedup drops from k passes to one (the reference's analogous
  * kernels are single-pass monomorphic loops, `/root/reference/core/math.c`).
  *
  * Token semantics match `split(text, ' ')` with Spark's default limit
  * (-1): consecutive separators yield empty tokens and trailing empties
  * are kept. Codes match `Text.tokenCodeSql`: cp(c1) + 31·cp(c2) +
  * 961·cp(c3) + 29791·len over code points.
  */
case class MinHashes(child: Expression, seedsA: Seq[Long], seedsB: Seq[Long])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhashes expects a string input, got ${child.dataType}")

  @transient private lazy val aArr: Array[Long] = seedsA.toArray
  @transient private lazy val bArr: Array[Long] = seedsB.toArray

  override def nullSafeEval(input: Any): Any =
    MinHashes.compute(input.asInstanceOf[UTF8String], aArr, bArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashes.compute($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashes =
    copy(child = newChild)
}

object MinHashes {
  val P: Long = Text.minhashPrime

  /** One pass: for each ' '-separated token (empty tokens included, as
    * with split's limit=-1), fold min((a_i*code+b_i) mod P) for all i. */
  def compute(text: UTF8String, a: Array[Long], b: Array[Long]): ArrayData = {
    val s = text.toString
    val k = a.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        val code = tokenCode(s, start, i)
        var j = 0
        while (j < k) {
          val h = (a(j) * code + b(j)) % P
          if (h < mins(j)) mins(j) = h
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** cp(c1) + 31·cp(c2) + 961·cp(c3) + 29791·len over code points of
    * s[from, until) — `Text.tokenCodeSql` exactly (ascii('')=0). */
  private[functions] def tokenCode(s: String, from: Int, until: Int): Long = {
    var cpLen = 0L
    var code = 0L
    var i = from
    var mult = 1L
    while (i < until) {
      val cp = s.codePointAt(i)
      if (cpLen < 3) { code += mult * cp; mult *= 31L }
      cpLen += 1
      i += Character.charCount(cp)
    }
    code + 29791L * cpLen
  }
}

object MinHashExpr {
  /** Column of all-k MinHash values (array<long>), one pass. */
  def minhashes(text: Column, seeds: Seq[(Long, Long)]): Column =
    ColumnInternals.column(MinHashes(
      ColumnInternals.expr(text), seeds.map(_._1), seeds.map(_._2)))
}
