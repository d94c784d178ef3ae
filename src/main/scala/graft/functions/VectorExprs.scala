package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`) are
  * CodegenFallback — every row pays lambda interpretation. Similarity
  * scans over millions of vectors live or die on this loop, so the dot
  * product is a real `Expression` with `doGenCode`: a tight primitive
  * Java loop inside whole-stage codegen (the Spark-idiomatic analog of
  * the reference's monomorphic SIMD kernels,
  * `/root/reference/core/math.c`, autovectorized by JIT).
  */
/** Input validation shared by the SQL-exposed kernels (adc_lookup,
  * sq8_codes, sq8_dot, array_sub, nearest_centroid[_l2]): arbitrary SQL
  * can hand them containsNull=true arrays or mismatched dimensions, and
  * UnsafeArrayData reads a null slot as garbage bytes — fail fast with
  * the offending operand instead (the HOF forms these kernels are
  * pinned against error under ANSI element_at on the same inputs). */
private[functions] object KernelChecks {
  def nullElem(fn: String, operand: String, i: Int): Nothing =
    throw new IllegalArgumentException(
      s"$fn: null $operand element at index $i")
  def sameLen(fn: String, n: Int, mins: ArrayData, maxs: ArrayData): Unit =
    if (mins.numElements() != n || maxs.numElements() != n)
      throw new IllegalArgumentException(
        s"$fn: vector/ranges dimension mismatch (vec $n, " +
          s"mins ${mins.numElements()}, maxs ${maxs.numElements()})")
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  private def isArrayOfDouble(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // Both children must be array<double>: ArrayData.getDouble on e.g. a
    // packed array<float> would silently misread bytes, not error.
    if (isArrayOfDouble(left.dataType) && isArrayOfDouble(right.dataType)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<double> inputs, got " +
          s"(${left.dataType}, ${right.dataType})")
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
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** One-pass nearest-centroid assignment: argmax cosine of `vec` against a
  * (small, typically literal/broadcast) array-of-arrays of centroids,
  * returning the winning index. Replaces the crossJoin×nCells +
  * row_number-window assignment (an n×nCells shuffle — the dominant cost
  * of IVF index build at scale) with a narrow codegen'd scan: one pass
  * per row, all centroids, no Exchange (the MinHashes pattern).
  * Tie-break matches `ORDER BY sim DESC, cell ASC` row_number()=1 under
  * Spark's NaN-greatest double ordering: strict `Double.compare` greater
  * replaces, so the lowest index wins ties and NaN beats all.
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid expects (array<double>, array<array<double>>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    NearestCentroid.nearest(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, c) => s"graft.functions.NearestCentroid.nearest($v, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {
  /** Static kernel shared by eval and codegen: fused dot/norm loop per
    * centroid, sequential accumulation (bit-identical to
    * dot(v,c)/(sqrt(dot(v,v))*sqrt(dot(c,c))) per element order). */
  def nearest(v: ArrayData, cents: ArrayData): Int = {
    val n = cents.numElements()
    var best = Double.NegativeInfinity
    var bestCell = 0
    var c = 0
    while (c < n) {
      if (cents.isNullAt(c))
        KernelChecks.nullElem("nearest_centroid", "centroid", c)
      val cv = cents.getArray(c)
      val m = math.min(v.numElements(), cv.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < m) {
        if (v.isNullAt(i) || cv.isNullAt(i))
          KernelChecks.nullElem("nearest_centroid", "vector", i)
        val x = v.getDouble(i); val y = cv.getDouble(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val sim = dot / (math.sqrt(na) * math.sqrt(nb))
      if (java.lang.Double.compare(sim, best) > 0) { best = sim; bestCell = c }
      c += 1
    }
    bestCell
  }
}

/** Argmin-EUCLIDEAN centroid assignment — the product-quantization
  * sub-codebook rule (PQ trains and assigns in L2, Jégou et al. 2011,
  * "Product quantization for nearest neighbor search"). Same one-pass
  * narrow-scan shape as [[NearestCentroid]]; distance per centroid is
  * the sequential `s += d*d` loop, so the DuckDB oracle's left-
  * associated unrolled sum reproduces it bit-for-bit. Strict `<` keeps
  * the LOWEST index on ties (ORDER BY dist ASC, cell ASC); NaN never
  * replaces (compare(NaN, best) > 0 for every finite best — so a NaN
  * distance loses, keeping assignment total). */
case class NearestCentroidL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid_l2 expects (array<double>, array<array<double>>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    NearestCentroidL2.nearest(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, c) => s"graft.functions.NearestCentroidL2.nearest($v, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroidL2 =
    copy(left = newLeft, right = newRight)
}

object NearestCentroidL2 {
  /** Static kernel shared by eval and codegen: sequential squared-L2
    * accumulation per centroid, argmin with lowest-index tie-break. */
  def nearest(v: ArrayData, cents: ArrayData): Int = {
    val n = cents.numElements()
    var best = Double.PositiveInfinity
    var bestCell = 0
    var c = 0
    while (c < n) {
      if (cents.isNullAt(c))
        KernelChecks.nullElem("nearest_centroid_l2", "centroid", c)
      val cv = cents.getArray(c)
      val d2 = dist2(v, cv)
      if (java.lang.Double.compare(d2, best) < 0) { best = d2; bestCell = c }
      c += 1
    }
    bestCell
  }

  /** Sequential squared Euclidean distance (the ADC table entry). */
  def dist2(v: ArrayData, cv: ArrayData): Double = {
    val m = math.min(v.numElements(), cv.numElements())
    var s = 0.0; var i = 0
    while (i < m) {
      if (v.isNullAt(i) || cv.isNullAt(i))
        KernelChecks.nullElem("nearest_centroid_l2", "vector", i)
      val d = v.getDouble(i) - cv.getDouble(i)
      s += d * d; i += 1
    }
    s
  }
}

/** Sign-LSH bucket id in ONE codegen pass over all hyperplanes: bit i
  * set iff dot(v, plane_i) > 0. Replaces nBits stacked
  * `zip_with`/`aggregate` columns (CodegenFallback — a lambda
  * interpretation per element per bit, the round-2 lesson). Sequential
  * per-plane accumulation keeps the sums bit-identical to the
  * higher-order-function form, so the seeds-in-SQL oracle is unchanged. */
case class LshBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_bucket expects (array<double>, array<array<double>>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    LshBucket.bucket(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, p) => s"graft.functions.LshBucket.bucket($v, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LshBucket =
    copy(left = newLeft, right = newRight)
}

object LshBucket {
  /** Static kernel shared by eval and codegen. */
  def bucket(v: ArrayData, planes: ArrayData): Int = {
    val n = planes.numElements()
    var bkt = 0
    var p = 0
    while (p < n) {
      val pv = planes.getArray(p)
      val m = math.min(v.numElements(), pv.numElements())
      var dot = 0.0; var i = 0
      while (i < m) { dot += v.getDouble(i) * pv.getDouble(i); i += 1 }
      if (dot > 0) bkt |= 1 << p
      p += 1
    }
    bkt
  }
}

/** Fused SQ8 scoring: quantize → dequantize → dot-accumulate in ONE
  * pass per row. The column form (`transform` for codes, `transform`
  * for dequantize, then the dot) pays two CodegenFallback lambda
  * interpretations per element — 8× the runtime at 100× corpus scale.
  * `right` packs [mins, maxs, dequantizedQuery] as one
  * array<array<double>> literal; the arithmetic chain per element is
  * IDENTICAL (floor((x-mn)/(mx-mn)*255+0.5), mn+c*(mx-mn)/255,
  * s += deq*q — all correctly-rounded IEEE ops in the same order), so
  * the s09 oracle is unchanged. */
case class Sq8Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sq8_dot expects (array<double>, array<array<double>>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    Sq8Dot.score(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, p) => s"graft.functions.Sq8Dot.score($v, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8Dot =
    copy(left = newLeft, right = newRight)
}

/** Batched ADC scoring: sum the flat (m·kSub) distance-table entries
  * selected by a PQ code word — `Σ_s table[s·kSub + codes[s]]`, kSub
  * derived from the operand lengths. One primitive loop per row, in
  * subspace order (the same left-associated chain as the single-query
  * `adcDistance` column), so batched and single-query scores are
  * bit-identical. */
case class AdcLookup(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.IntegerType, _),
            ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"adc_lookup expects (array<int> codes, array<double> table), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    AdcLookup.score(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (c, t) => s"graft.functions.AdcLookup.score($c, $t)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcLookup =
    copy(left = newLeft, right = newRight)
}

object AdcLookup {
  def score(codes: ArrayData, table: ArrayData): Double = {
    val m = codes.numElements()
    if (m == 0) return 0.0
    val n = table.numElements()
    val kSub = n / m
    // bounds- and null-check every element: the function is SQL-exposed
    // (adc_lookup) and UnsafeArrayData.getInt/getDouble would otherwise
    // silently read arbitrary row-buffer bytes for an out-of-range index
    // or garbage for a null slot. The branches are perfectly predicted
    // on the valid hot path.
    if (kSub * m != n)
      throw new IllegalArgumentException(
        s"adc_lookup: table size $n not divisible by code count $m")
    var s = 0.0; var i = 0
    while (i < m) {
      if (codes.isNullAt(i)) KernelChecks.nullElem("adc_lookup", "codes", i)
      val c = codes.getInt(i)
      if (c < 0 || c >= kSub)
        throw new IllegalArgumentException(
          s"adc_lookup: code $c out of range [0, $kSub) at subspace $i")
      val idx = i * kSub + c
      if (table.isNullAt(idx)) KernelChecks.nullElem("adc_lookup", "table", idx)
      s += table.getDouble(idx)
      i += 1
    }
    s
  }
}

/** SQ8 encode: per-dimension min-max codes 0..255 in one primitive
  * loop (`right` packs [mins, maxs]). Same chain as the
  * `transform`-based `Quantize.codes` column — floor((x-mn)/(mx-mn)
  * ·255+0.5), degenerate dims code 0 — but codegen instead of a
  * lambda interpretation per element (the corpus quantize pass at
  * 100 TB is exactly this loop). */
case class Sq8Codes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sq8_codes expects (array<double>, array<array<double>>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    Sq8Codes.encode(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, p) => s"graft.functions.Sq8Codes.encode($v, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8Codes =
    copy(left = newLeft, right = newRight)
}

object Sq8Codes {
  def encode(v: ArrayData, pack: ArrayData): ArrayData = {
    val mins = pack.getArray(0); val maxs = pack.getArray(1)
    val n = v.numElements()
    KernelChecks.sameLen("sq8_codes", n, mins, maxs)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) KernelChecks.nullElem("sq8_codes", "vector", i)
      if (mins.isNullAt(i) || maxs.isNullAt(i))
        KernelChecks.nullElem("sq8_codes", "ranges", i)
      val mn = mins.getDouble(i); val mx = maxs.getDouble(i)
      out(i) = if (mx == mn) 0L
        else math.floor((v.getDouble(i) - mn) / (mx - mn) * 255d + 0.5d).toLong
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Max |x − dequant(code)| in the same pass shape — the s05
    * reconstruction-error column, identical chain to the HOF form
    * INCLUDING edges: an empty vector yields null (array_max of an
    * empty array) and a NaN element propagates (array_max sorts NaN
    * greatest — Double.compare does the same here). */
  def maxErr(v: ArrayData, pack: ArrayData): Any = {
    val mins = pack.getArray(0); val maxs = pack.getArray(1)
    val n = v.numElements()
    KernelChecks.sameLen("sq8_max_err", n, mins, maxs)
    if (n == 0) return null
    var worst = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) KernelChecks.nullElem("sq8_max_err", "vector", i)
      if (mins.isNullAt(i) || maxs.isNullAt(i))
        KernelChecks.nullElem("sq8_max_err", "ranges", i)
      val mn = mins.getDouble(i); val mx = maxs.getDouble(i)
      val err = if (mx == mn) math.abs(v.getDouble(i) - mn) else {
        val c = math.floor((v.getDouble(i) - mn) / (mx - mn) * 255d + 0.5d)
        math.abs(v.getDouble(i) - (mn + c * (mx - mn) / 255d))
      }
      if (java.lang.Double.compare(err, worst) > 0) worst = err
      i += 1
    }
    worst
  }
}

/** Max reconstruction error twin of [[Sq8Codes]] (one loop, double). */
case class Sq8MaxErr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sq8_max_err expects (array<double>, array<array<double>>), got ($l, $r)")
    }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    Sq8Codes.maxErr(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, p) => {
      val r = ctx.freshName("r")
      // boxed call: an empty vector yields null (array_max-of-empty
      // parity), which a primitive-returning kernel cannot express
      s"""
         |Object $r = graft.functions.Sq8Codes.maxErr($v, $p);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $r).doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8MaxErr =
    copy(left = newLeft, right = newRight)
}

/** Element-wise array<double> subtraction (the PQ residual map).
  * `zip_with(a, b, _-_)` is CodegenFallback — a lambda interpretation
  * per element; this is one primitive loop, identical doubles out. */
case class ArraySub(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"array_sub expects two array<double>, got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ArraySub.sub(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ArraySub.sub($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArraySub =
    copy(left = newLeft, right = newRight)
}

object ArraySub {
  def sub(a: ArrayData, b: ArrayData): ArrayData = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"array_sub: input lengths differ ($n vs ${b.numElements()})")
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        KernelChecks.nullElem("array_sub", "input", i)
      out(i) = a.getDouble(i) - b.getDouble(i); i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object Sq8Dot {
  /** Static kernel shared by eval and codegen. pack = [mins, maxs,
    * dequantized query]; a degenerate dimension (mx == mn) codes to 0
    * and reconstructs to mn — the Quantize.codes/dequantize rule. */
  def score(v: ArrayData, pack: ArrayData): Double = {
    val mins = pack.getArray(0)
    val maxs = pack.getArray(1)
    val qd = pack.getArray(2)
    val n = v.numElements()
    KernelChecks.sameLen("sq8_dot", n, mins, maxs)
    if (qd.numElements() != n)
      throw new IllegalArgumentException(
        s"sq8_dot: vector/query dimension mismatch ($n vs ${qd.numElements()})")
    var s = 0.0; var i = 0
    while (i < n) {
      if (v.isNullAt(i)) KernelChecks.nullElem("sq8_dot", "vector", i)
      if (mins.isNullAt(i) || maxs.isNullAt(i) || qd.isNullAt(i))
        KernelChecks.nullElem("sq8_dot", "pack", i)
      val mn = mins.getDouble(i); val mx = maxs.getDouble(i)
      val deq = if (mx == mn) mn else {
        val c = math.floor((v.getDouble(i) - mn) / (mx - mn) * 255d + 0.5d)
        mn + c * (mx - mn) / 255d
      }
      s += deq * qd.getDouble(i)
      i += 1
    }
    s
  }
}

/** Binary (sign-bit) quantization: pack an array<double> into
  * ceil(d/32) little-endian 32-bit sign words carried as BIGINTs —
  * bit (i mod 32) of word (i div 32) is set iff v[i] >= 0. -0.0 packs
  * as 1 in both engines; NaN packs as 0 HERE (Java's NaN >= 0.0 is
  * false) while DuckDB orders NaN greater-than-everything, so the s20
  * oracle spells the test `>= 0 AND NOT isnan(...)` to match this
  * expression exactly. 32-bit words, not 64:
  * the replay builds each word as a SUM of `1::BIGINT << (pos-1)`
  * terms, and a 64-bit word's top bit would need the sign bit of a
  * BIGINT — shift semantics at bit 63 differ across engines, ≤ 2^31
  * terms never do. One codegen pass per row; 64 dims → 16 bytes per
  * vector, a 16× scan-footprint cut before any exact math. */
case class SignPack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_pack expects array<double>, got $t")
    }

  override def nullSafeEval(a: Any): Any =
    SignPack.pack(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SignPack.pack($a)")

  override protected def withNewChildInternal(newChild: Expression): SignPack =
    copy(child = newChild)
}

object SignPack {
  def pack(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val words = new Array[Long]((n + 31) / 32)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) KernelChecks.nullElem("sign_pack", "vec", i)
      if (v.getDouble(i) >= 0.0) words(i >> 5) |= 1L << (i & 31)
      i += 1
    }
    new GenericArrayData(words)
  }
}

/** Hamming distance between two sign-word arrays (see [[SignPack]]):
  * Σ bitCount(a XOR b) over the words — the number of coordinates
  * whose signs disagree. Codegen'd; fails fast on length mismatch or
  * null slots (arbitrary SQL inputs, the KernelChecks rule). */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  private def ok(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hamming_dist expects array<bigint> inputs, got " +
          s"(${left.dataType}, ${right.dataType})")

  override def nullSafeEval(a: Any, b: Any): Any =
    HammingDist.dist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HammingDist.dist($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDist =
    copy(left = newLeft, right = newRight)
}

object HammingDist {
  def dist(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"hamming_dist: length mismatch (${n} vs ${b.numElements()})")
    var s = 0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) KernelChecks.nullElem("hamming_dist", "left", i)
      if (b.isNullAt(i)) KernelChecks.nullElem("hamming_dist", "right", i)
      s += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    s
  }
}

/** Codegen'd dimension permutation `out(i) = in(perm(i))` — the OPQ
  * allocation's one hot-path operation. The naive spelling
  * `array(element_at(v, p0+1), ..., element_at(v, p63+1))` is 64
  * expression nodes that CollapseProject re-inlines into EVERY
  * consumer (cell assignment, residuals, per-subspace encode), blowing
  * the projection past codegen limits — the s31 scan measured
  * ~300 µs/row interpreted. One reference-object int[] walk keeps the
  * tree a single node. Fail-fast on out-of-range indices and null
  * elements (the ANSI element_at discipline). */
case class PermuteVec(child: Expression, perm: Seq[Int])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"permute_vec expects array<double>, got $t")
    }

  @transient private lazy val permArr = perm.toArray

  override def nullSafeEval(v: Any): Any =
    PermuteVec.permute(v.asInstanceOf[ArrayData], permArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("perm", permArr, "int[]")
    defineCodeGen(ctx, ev, a => s"graft.functions.PermuteVec.permute($a, $p)")
  }

  override protected def withNewChildInternal(newChild: Expression): PermuteVec =
    copy(child = newChild)
}

object PermuteVec {
  def permute(a: ArrayData, perm: Array[Int]): ArrayData = {
    val n = a.numElements()
    val out = new Array[Double](perm.length)
    var i = 0
    while (i < perm.length) {
      val j = perm(i)
      if (j < 0 || j >= n)
        throw new IllegalArgumentException(
          s"permute_vec: index $j out of bounds for vector length $n")
      if (a.isNullAt(j)) KernelChecks.nullElem("permute_vec", "input", j)
      out(i) = a.getDouble(j); i += 1
    }
    new GenericArrayData(out)
  }
}

object VectorExprs {
  /** Codegen'd dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    ColumnInternals.column(
      DotProduct(ColumnInternals.expr(a), ColumnInternals.expr(b)))

  /** Codegen'd sign-bit pack (see [[SignPack]]). */
  def signPack(vec: Column): Column =
    ColumnInternals.column(SignPack(ColumnInternals.expr(vec)))

  /** Codegen'd Hamming distance over sign words (see [[HammingDist]]). */
  def hammingDist(a: Column, b: Column): Column =
    ColumnInternals.column(
      HammingDist(ColumnInternals.expr(a), ColumnInternals.expr(b)))

  /** Codegen'd one-pass sign-LSH bucket (see [[LshBucket]]). */
  def lshBucket(vec: Column, planes: Column): Column =
    ColumnInternals.column(
      LshBucket(ColumnInternals.expr(vec), ColumnInternals.expr(planes)))

  /** Codegen'd argmax-cosine centroid index (see [[NearestCentroid]]). */
  def nearestCentroid(vec: Column, centroids: Column): Column =
    ColumnInternals.column(
      NearestCentroid(ColumnInternals.expr(vec), ColumnInternals.expr(centroids)))

  /** Codegen'd argmin-L2 centroid index (see [[NearestCentroidL2]]). */
  def nearestCentroidL2(vec: Column, centroids: Column): Column =
    ColumnInternals.column(
      NearestCentroidL2(ColumnInternals.expr(vec), ColumnInternals.expr(centroids)))

  /** Codegen'd fused SQ8 quantize+dequantize+dot (see [[Sq8Dot]]). */
  def sq8Dot(vec: Column, pack: Column): Column =
    ColumnInternals.column(
      Sq8Dot(ColumnInternals.expr(vec), ColumnInternals.expr(pack)))

  /** Codegen'd element-wise array<double> subtraction (see [[ArraySub]]). */
  def arraySub(a: Column, b: Column): Column =
    ColumnInternals.column(
      ArraySub(ColumnInternals.expr(a), ColumnInternals.expr(b)))

  /** Codegen'd dimension permutation (see [[PermuteVec]]). */
  def permuteVec(vec: Column, perm: Seq[Int]): Column =
    ColumnInternals.column(PermuteVec(ColumnInternals.expr(vec), perm))

  /** Codegen'd batched ADC table lookup (see [[AdcLookup]]). */
  def adcLookup(codes: Column, table: Column): Column =
    ColumnInternals.column(
      AdcLookup(ColumnInternals.expr(codes), ColumnInternals.expr(table)))

  /** Codegen'd SQ8 encode (see [[Sq8Codes]]). */
  def sq8Codes(vec: Column, pack: Column): Column =
    ColumnInternals.column(
      Sq8Codes(ColumnInternals.expr(vec), ColumnInternals.expr(pack)))

  /** Codegen'd SQ8 max reconstruction error (see [[Sq8MaxErr]]). */
  def sq8MaxErr(vec: Column, pack: Column): Column =
    ColumnInternals.column(
      Sq8MaxErr(ColumnInternals.expr(vec), ColumnInternals.expr(pack)))
}
