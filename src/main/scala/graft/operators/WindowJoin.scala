package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window (interval) join: for each left row, aggregate the right rows
  * with the same keys whose time lies in the row's window
  * (reference `window-join`/`window-join1`,
  * `/root/reference/core/join.c:358-489`, `core/index.c:3287-3346`).
  *
  * Window semantics follow the reference's aggregation kernel
  * (`core/aggr.c:39-68,133-158`), which are the kdb `wj`/`wj1` rules:
  *  - jtype 0 (`window-join`): rows in `(lo, hi]` PLUS the PREVAILING
  *    row — the last right row with `ts <= lo` (`li = indexr_bin(lo)`,
  *    `ri = indexr_bin(hi)`, aggregate `li..ri`; empty iff
  *    `ts[li] > hi`).
  *  - jtype 1 (`window-join1`): rows in `[lo, hi]` inclusive
  *    (`li = indexl_bin(lo)`).
  *
  * Spark-first plan: an equi-join on the keys with the range predicate as
  * a join condition (hash-join on keys, range filter inside), then a
  * groupBy on the left row identity, then a left join back so left rows
  * with no right rows in range survive with NULL aggregates — matching
  * the reference, which emits every left row. For jtype 0 the prevailing
  * pairs come from the as-of machinery (left time = window start), then
  * union with the in-window pairs — the two sets are disjoint because a
  * prevailing row has `ts <= lo` and in-window rows have `ts > lo`.
  *
  * Scale notes: the equi-keys carry the shuffle, so this is a standard
  * shuffled hash/sort-merge join — no broadcast needed. If a single key's
  * interval fans out too wide (hot key × wide window), bucket time into
  * coarse chunks and join on (key, chunk) to bound the fan-out.
  */
object WindowJoin {

  /** @param leftId   column(s) uniquely identifying a left row
    * @param keys     equi-join keys in both sides
    * @param ts       time column name in both sides (numeric or timestamp)
    * @param loOffset lower bound offset (added to left ts; may be negative)
    * @param hiOffset upper bound offset
    * @param aggs     aggregates over right columns, pre-aliased
    * @param jtype    0 = `window-join` (prevailing row + `(lo, hi]`),
    *                 1 = `window-join1` (inclusive `[lo, hi]`)
    */
  def windowJoin(left: DataFrame, right: DataFrame, leftId: Seq[String],
                 keys: Seq[String], ts: String, loOffset: Column, hiOffset: Column,
                 aggs: Seq[Column], jtype: Int = 1): DataFrame = {
    require(jtype == 0 || jtype == 1, s"jtype must be 0 or 1, got $jtype")
    val l = left.select(left.columns.map(c => col(c).as(s"l_$c")).toSeq: _*)
    val keyCond = keys.map(k => col(s"l_$k") === col(k)).reduce(_ && _)
    val lo = col(s"l_$ts") + loOffset
    val hi = col(s"l_$ts") + hiOffset
    val lIds = leftId.map(c => s"l_$c")

    val pairs =
      if (jtype == 1)
        l.join(right, keyCond && col(ts) >= lo && col(ts) <= hi, "inner")
      else {
        val inWin = l.join(right, keyCond && col(ts) > lo && col(ts) <= hi,
          "inner")
        // prevailing row per left row: as-of join at the window start.
        // __wjhit distinguishes a real match (whose payload may be null)
        // from a miss; among right rows tied on ts the asof tie rule
        // (last in table order) picks the one the reference's
        // indexr_bin lands on.
        val rightPlus = right.withColumn("__wjhit", lit(1L))
        val payload =
          right.columns.filterNot(keys.contains).toSeq :+ "__wjhit"
        val asofLeft = l.select(
          lIds.map(col) ++ keys.map(k => col(s"l_$k").as(k)) :+ lo.as(ts): _*)
        val prev = AsofJoin.asofJoin(asofLeft, rightPlus, keys, ts, payload)
          .filter(col("__wjhit").isNotNull)
        val common = (lIds ++ keys ++
          right.columns.filterNot(keys.contains)).distinct
        inWin.select(common.map(col): _*)
          .unionByName(prev.select(common.map(col): _*))
      }

    val grouped = pairs
      .groupBy(lIds.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

    val idCond = leftId.map(c => left(c) === grouped(s"l_$c")).reduce(_ && _)
    left.join(grouped, idCond, "left")
      .drop(leftId.map(c => s"l_$c"): _*)
  }

  /** One supported sliding aggregate: op ∈ min|max|sum|count over a
    * numeric right column (LongType or DoubleType). */
  final case class Agg(op: String, col: String, as: String)

  /** SLIDING window join — the reference's own algorithm
    * (`aggr_map_window`, `/root/reference/core/aggr.c:331-373`): per key,
    * both sides sorted by ts, a two-pointer window advances monotonically
    * and min/max maintain monotonic deques, so the cost is O(n+m) per key
    * with NO fan-out materialization. The generic [[windowJoin]] builds
    * every (left, right-in-window) pair first, which explodes when
    * windows are wide relative to event spacing (the reference's 1e7
    * window-join benchmark has ~10k quotes per window: 1e11 pairs).
    *
    * Scale shape: cogroup shuffles each side once on the keys; a hot key
    * is processed by one task, but linearly — same contract as the
    * reference's per-key kernel. jtype 1 (`window-join1`, the default)
    * aggregates inclusive `[lo, hi]`; jtype 0 (`window-join`) adds the
    * prevailing row — the last right row with ts <= lo
    * (`core/aggr.c:143-151`).
    */
  def windowJoinSliding(left: DataFrame, right: DataFrame,
                        keys: Seq[String], ts: String,
                        loOffset: Long, hiOffset: Long,
                        aggs: Seq[Agg], jtype: Int = 1): DataFrame = {
    require(jtype == 0 || jtype == 1, s"jtype must be 0 or 1, got $jtype")
    // integral time axes only: a TimestampType would read as seconds on
    // one side (cast long) and millis on the other (getTime) — reject
    // rather than silently mis-join (this engine carries time as long
    // nanos/millis per the repo convention)
    for ((df, side) <- Seq((left, "left"), (right, "right")))
      require(Seq(LongType, IntegerType).contains(df.schema(ts).dataType),
        s"windowJoinSliding needs an integral $side ts column, got " +
          s"${df.schema(ts).dataType}")
    val spark = left.sparkSession
    val leftCols = left.columns.toSeq
    val aggFields = aggs.map { a =>
      val src = right.schema(a.col).dataType
      val t = a.op match {
        case "count" => LongType
        case "sum" => if (src == DoubleType) DoubleType else LongType
        case _ => src
      }
      StructField(a.as, t, nullable = true)
    }
    val outSchema = StructType(left.schema.fields.map(_.copy()) ++ aggFields)
    val outEnc = Encoders.row(outSchema)

    // single composite string key for the cogroup (unit separator
    // avoids accidental key collisions like ("a","bc") vs ("ab","c"))
    val sep = "\u001f"
    val lKeyed = left.withColumn("__k",
      concat_ws(sep, keys.map(c => col(c).cast("string")): _*))
    val rKeyed = right.withColumn("__k",
      concat_ws(sep, keys.map(c => col(c).cast("string")): _*))
    val rSlim = rKeyed.select(col("__k"), col(ts).cast("long").as("__ts"),
      struct(aggs.map(_.col).distinct.map(col): _*).as("__v"))

    import spark.implicits._
    val lGrouped = lKeyed.groupByKey(r => r.getAs[String]("__k"))(Encoders.STRING)
    val rGrouped = rSlim.groupByKey(r => r.getAs[String]("__k"))(Encoders.STRING)
    val tsIdx = lKeyed.columns.indexOf(ts)
    val kIdx = lKeyed.columns.indexOf("__k")
    val aggB = aggs.toArray
    val jt = jtype
    // static per-agg layout: struct field index + whether a sum is double
    val structCols = aggs.map(_.col).distinct
    val fieldOf = aggs.map(a => structCols.indexOf(a.col)).toArray
    val isDouble = aggs.map(a =>
      right.schema(a.col).dataType == DoubleType).toArray
    val colKinds = structCols.map(c => right.schema(c).dataType match {
      case DoubleType => 2
      case IntegerType => 1
      case _ => 0 // LongType
    }).toArray

    // cogroupSorted hands each side's iterator already ts-sorted (Spark
    // sorts within the shuffle, not in task memory), so the LEFT side
    // STREAMS through the two-pointer kernel — a hot key with 1e8 left
    // rows never materializes in the task (SkewSpec pins this with a
    // single-key 1e6 input). Only the right side buffers, which is the
    // algorithm's contract (the deques need indexed lookback) — and it
    // buffers COLUMNAR PRIMITIVES, not Row objects: each right Row is
    // dropped as soon as its fields are extracted, so a 2e7-quote hot
    // key holds ~9 bytes/column/row instead of a boxed GenericRow
    // (the 1e7 benchmark's GC variance came from the Row buffer).
    val joined = lGrouped.cogroupSorted(rGrouped)(col(ts).asc)(col("__ts").asc) {
      (_, lIt, rIt) =>
        val tsB = new scala.collection.mutable.ArrayBuilder.ofLong
        val nF = structCols.length
        val colBs = Array.tabulate(nF)(i => ColVec.builder(colKinds(i)))
        rIt.foreach { r =>
          tsB += r.getLong(1)
          val st = r.getStruct(2)
          var i = 0
          while (i < nF) { colBs(i).add(st, i); i += 1 }
        }
        SlidingWindow.run(lIt, tsB.result(), colBs.map(_.result()),
          tsIdx, kIdx, loOffset, hiOffset, jt, aggB, fieldOf, isDouble)
    }(outEnc)
    joined
  }

  private[operators] def anyToLong(x: Any): Long = x match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
    case t: java.sql.Timestamp => t.getTime
    case x => throw new IllegalArgumentException(s"unsupported ts $x")
  }
}

/** Columnar primitive buffer for ONE right-side agg source column:
  * kind 0 = long, 1 = int (carried as long, boxed back to Integer on
  * output), 2 = double. Nulls ride a parallel boolean array. */
private[operators] final class ColVec(val kind: Int, val ls: Array[Long],
                                      val ds: Array[Double],
                                      val nulls: Array[Boolean]) {
  def isNull(i: Int): Boolean = nulls(i)
  def numL(i: Int): Long = if (kind == 2) ds(i).toLong else ls(i)
  def numD(i: Int): Double = if (kind == 2) ds(i) else ls(i).toDouble
  def cmp(a: Int, b: Int): Int =
    if (kind == 2) java.lang.Double.compare(ds(a), ds(b))
    else java.lang.Long.compare(ls(a), ls(b))
  def boxed(i: Int): Any =
    if (nulls(i)) null
    else if (kind == 2) java.lang.Double.valueOf(ds(i))
    else if (kind == 1) java.lang.Integer.valueOf(ls(i).toInt)
    else java.lang.Long.valueOf(ls(i))
}

private[operators] object ColVec {
  final class Builder(kind: Int) {
    private val lB = if (kind != 2) new scala.collection.mutable.ArrayBuilder.ofLong else null
    private val dB = if (kind == 2) new scala.collection.mutable.ArrayBuilder.ofDouble else null
    private val nB = new scala.collection.mutable.ArrayBuilder.ofBoolean
    def add(st: Row, field: Int): Unit =
      if (st.isNullAt(field)) {
        nB += true
        if (kind == 2) dB += 0.0 else lB += 0L
      } else {
        nB += false
        kind match {
          case 2 => dB += st.getDouble(field)
          case 1 => lB += st.getInt(field).toLong
          case _ => lB += st.getLong(field)
        }
      }
    def result(): ColVec = new ColVec(kind,
      if (kind != 2) lB.result() else null,
      if (kind == 2) dB.result() else null, nB.result())
  }
  def builder(kind: Int): Builder = new Builder(kind)
}

/** The per-key two-pointer sliding aggregation. min/max use monotonic
  * deques (amortized O(1) per step); sum/count are incremental. */
private[operators] object SlidingWindow {
  import WindowJoin.Agg

  def run(ls: Iterator[Row], rTs: Array[Long], rCols: Array[ColVec],
          tsIdx: Int, kIdx: Int, lo: Long, hi: Long, jtype: Int,
          aggs: Array[Agg], fieldOf: Array[Int],
          isDouble: Array[Boolean]): Iterator[Row] = {
    val nR = rTs.length
    // per-agg state
    val deques = aggs.map(_ => new java.util.ArrayDeque[Int]())
    val sumL = new Array[Long](aggs.length)
    val sumD = new Array[Double](aggs.length)
    var from = 0 // first right idx inside the window
    var to = 0   // first right idx beyond the window

    def numL(ri: Int, ai: Int): Long = rCols(fieldOf(ai)).numL(ri)
    def numD(ri: Int, ai: Int): Double = rCols(fieldOf(ai)).numD(ri)
    def cmp(a: Int, b: Int, ai: Int, isMin: Boolean): Boolean = {
      // deque keeps candidates: drop tail while new elem is better-or-equal
      val c = rCols(fieldOf(ai)).cmp(a, b)
      if (isMin) c <= 0 else c >= 0
    }

    ls.map { l =>
      val ts = WindowJoin.anyToLong(l.get(tsIdx))
      val wLo = ts + lo
      val wHi = ts + hi
      // advance `to`: add rows entering the window (null values are
      // skipped for min/max/sum — null-skipping aggregation; count
      // counts every window row, the reference's unconditional count)
      while (to < nR && rTs(to) <= wHi) {
        var ai = 0
        while (ai < aggs.length) {
          val isNull = aggs(ai).op != "count" &&
            rCols(fieldOf(ai)).isNull(to)
          aggs(ai).op match {
            case _ if isNull => ()
            case "min" =>
              val dq = deques(ai)
              while (!dq.isEmpty && cmp(to, dq.peekLast, ai, isMin = true))
                dq.pollLast()
              dq.addLast(to)
            case "max" =>
              val dq = deques(ai)
              while (!dq.isEmpty && cmp(to, dq.peekLast, ai, isMin = false))
                dq.pollLast()
              dq.addLast(to)
            case "sum" => sumL(ai) += numL(to, ai); sumD(ai) += numD(to, ai)
            case "count" => sumL(ai) += 1
          }
          ai += 1
        }
        to += 1
      }
      // advance `from`: drop rows leaving the window. jtype 1 keeps
      // rows with ts >= lo; jtype 0 additionally keeps the PREVAILING
      // row — the last row with ts <= lo (it is dropped only when a
      // later row is still at-or-before lo), mirroring the reference's
      // li = indexr_bin(lo) lower index (core/aggr.c:143-151).
      while (from < to &&
          (if (jtype == 0) from + 1 < to && rTs(from + 1) <= wLo
           else rTs(from) < wLo)) {
        var ai = 0
        while (ai < aggs.length) {
          val isNull = aggs(ai).op != "count" &&
            rCols(fieldOf(ai)).isNull(from)
          aggs(ai).op match {
            case _ if isNull => ()
            case "min" | "max" =>
              val dq = deques(ai)
              if (!dq.isEmpty && dq.peekFirst == from) dq.pollFirst()
            case "sum" => sumL(ai) -= numL(from, ai); sumD(ai) -= numD(from, ai)
            case "count" => sumL(ai) -= 1
          }
          ai += 1
        }
        from += 1
      }
      val empty = from >= to
      val aggVals: Seq[Any] = aggs.zipWithIndex.map { case (a, ai) =>
        if (empty) null
        else a.op match {
          case "count" => sumL(ai)
          // box explicitly: `if (c) double else long` would widen the
          // Long branch to Double (Scala weak conformance)
          case "sum" =>
            if (isDouble(ai)) java.lang.Double.valueOf(sumD(ai))
            else java.lang.Long.valueOf(sumL(ai))
          case "min" | "max" =>
            // deque may be empty if every window value was null
            if (deques(ai).isEmpty) null
            else rCols(fieldOf(ai)).boxed(deques(ai).peekFirst)
        }
      }
      // drop the composite key column from the left row
      val base = l.toSeq.zipWithIndex.collect {
        case (v, i) if i != kIdx => v }
      Row.fromSeq(base ++ aggVals)
    }
  }
}
