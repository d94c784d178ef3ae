package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Intersection size of two SORTED string (or i64) arrays by a single
  * merge scan.
  *
  * `size(array_intersect(a, b))` builds a hash set per row pair; in a
  * blocked self-join (n-gram Jaccard dedup) the pair count is quadratic
  * in block size, so the per-pair kernel dominates. With both sides
  * sorted once per ROW (not per pair), the merge costs O(|a|+|b|) with
  * zero allocation. Equivalent to the reference's sorted-vector `sect`
  * fast path (`/root/reference/core/items.c:898`, ATTR_ASC kernels).
  *
  * Inputs MUST be sorted ascending (Spark `sort_array` binary order) and
  * duplicate-free (`array_distinct`) — the produced count is then
  * exactly `size(array_intersect(a, b))`.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(StringType, _) => true
    case ArrayType(LongType, _) => true
    case _ => false
  }

  private def isLong: Boolean =
    left.dataType.isInstanceOf[ArrayType] &&
      left.dataType.asInstanceOf[ArrayType].elementType == LongType

  private def sameElementType: Boolean = (left.dataType, right.dataType) match {
    // containsNull may differ between e.g. a literal array and split()'s
    // output; only the element type matters for the merge scan.
    case (ArrayType(a, _), ArrayType(b, _)) => a == b
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (ok(left.dataType) && sameElementType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_size expects matching array<string>/array<bigint>" +
          s" inputs, got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(a: Any, b: Any): Any =
    if (isLong)
      SortedIntersectSize.mergeLong(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      SortedIntersectSize.merge(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isLong) "mergeLong" else "merge"
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectSize.$fn($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  def merge(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val x = a.getUTF8String(i)
      val y = b.getUTF8String(j)
      val c = x.compareTo(y)
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  /** Same merge over sorted distinct i64 arrays (gram-hash sets —
    * `sort_array` on longs is numeric order, matching the scan). */
  def mergeLong(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}

object ArrayExprs {
  /** `size(array_intersect(a, b))` for sorted distinct string arrays —
    * one merge scan, no per-pair hash set. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    ColumnInternals.column(SortedIntersectSize(
      ColumnInternals.expr(a), ColumnInternals.expr(b)))
}
