package graft.operators

import java.util.IdentityHashMap

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{approx_count_distinct, col, collect_set, count, lit}
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Dictionary-encoded dense group-by kernel.
  *
  * The reference's group-by benchmark speed (group-by.md Q1 = 60 ms at 1e7)
  * comes from its columnar layout: SYMBOL columns are interned to small
  * integer ids at load time (`/root/reference/core/symbols.c`), so a
  * `(select {v1: (sum v1) by: id1})` is a single pass of
  * `acc[code[i]] += v1[i]` over primitive arrays — no per-row hashing at
  * all. Spark's row-based HashAggregate pays ~400-700 ns/row on the same
  * query (measured: the partial-agg stage alone is 4-10 s of CPU at 1e7),
  * which is the whole 5-7× gap on the sub-second H2O queries.
  *
  * This kernel re-creates that architecture Spark-natively, scoped to the
  * case where it wins: every group key is dictionary-encoded (global dict,
  * built once at load — the analog of the reference's typed
  * `(csv [SYMBOL …])` load) and the dense key-product fits in an array
  * (≤ 2^20 cells). Tables are encoded ONCE into one columnar block per
  * partition (primitive arrays, like operators.WindowJoin's ColVec);
  * a query is then: one map stage computing per-partition dense partial
  * aggregates (the map-side combine Spark would do, minus the hash map),
  * a tree-merge of the small dense arrays, and a driver-side decode of
  * occupied cells into a local DataFrame. Anything the kernel can't prove
  * it handles (filters, takes, huge key products, unsupported aggs,
  * un-encoded tables) returns None and the caller falls back to the
  * regular Catalyst plan — Q7's 1e7-group product correctly falls back.
  *
  * At 100 TB the same shape holds: global dictionaries exist only for
  * low-cardinality key columns (broadcast-sized by construction), partials
  * are O(key-product) per partition regardless of row count, and the merge
  * traffic is partials × partitions, independent of data size.
  */
object GroupKernel {

  /** Dense key-product cap: above this the partial arrays stop fitting in
    * cache and the hash-based Spark plan is the right one anyway. */
  val MaxDense: Int = 1 << 20

  /** Whether a (key-product, source-partitions) pair may merge on the
    * DRIVER instead of the executor chunk merge. Both bounds are
    * load-bearing and protect different sides:
    *  - p ≤ 2^14 bounds the DECODED result the driver path ships in a
    *    single task closure (a 1e5-group query sneaking through on a
    *    low-partition scan re-opens the round-7 LocalRelation trap:
    *    ~40 ms of closure deserialization per query);
    *  - p·partitions ≤ 2^21 bounds the partials COLLECT (a
    *    1000-executor scan with 100k partitions must not fan GBs of
    *    partials into the driver). */
  /** Probe toggle (TimeKernel A/B, SPARK_GRAFT_NO_DRIVER_MERGE): route
    * small-p merges through the executor path instead of the driver
    * collect. DOCUMENTED NEGATIVE (round 12, post-stage-fusion): even
    * with the executor path now ONE job (its 1-partition result also
    * declares SinglePartition, fusing the count into the merge stage),
    * Q1 measured 72-162 ms vs the driver path's steady 70-76 — the
    * repartition(1) shuffle's 32 map-output files still cost more than
    * the extra collect job saves. The driver merge stays. */
  private[graft] var driverMergeEnabled = true

  private[graft] def driverMergeEligible(p: Int, partitions: Int): Boolean =
    driverMergeEnabled &&
      p <= (1 << 14) &&
      p.toLong * partitions <= (1L << 12) * 512 &&
      partitions <= 512

  /** One columnar block per partition: name → Array[Int] (dict codes),
    * Array[Long] (integral values) or Array[Double] (floating values). */
  type Block = Map[String, AnyRef]

  final class Encoded(
      val dicts: Map[String, Array[Any]],
      val keyTypes: Map[String, DataType],
      val longCols: Set[String],
      val dblCols: Set[String],
      val intSourced: Set[String],
      val nullCols: Set[String],
      val blocks: RDD[Block],
      // decode dictionaries (strings pre-converted to UTF8String) as a
      // BROADCAST: a big-cardinality key's dictionary (the H2O id3 case,
      // 1e5 entries) must not travel in the merge stage's task closure —
      // closure deserialization re-built those 1e5 objects in EVERY task
      // of EVERY query (measured 120-150 ms per merge task before JIT
      // warm-up, the bulk of the Q3/Q5/Q6 per-rep variance). A broadcast
      // deserializes once per executor and is shared from then on.
      val bcDecode: org.apache.spark.broadcast.Broadcast[Map[String, Array[Any]]])

  private val registry = new IdentityHashMap[DataFrame, Encoded]()

  def has(df: DataFrame): Boolean = registry.synchronized(registry.containsKey(df))

  def unregister(df: DataFrame): Unit = registry.synchronized {
    Option(registry.remove(df)).foreach { e =>
      e.blocks.unpersist(blocking = false)
      e.bcDecode.destroy()
    }
  }

  /** Encode `df` for kernel group-bys on `keyCols` (the typed-load step —
    * run once, outside query timing). Key columns with more than
    * `MaxDense` distinct values, or with nulls, are silently skipped
    * (group-bys on them fall back to the Catalyst plan). */
  def encode(df: DataFrame, keyCols: Seq[String]): Unit = {
    val sc = df.sparkSession.sparkContext
    val fields = df.schema.fields.toSeq
    val typeOf = fields.map(f => f.name -> f.dataType).toMap

    // dictionary build in TWO jobs regardless of key count: one stats
    // pass (row count + per-key approx cardinality + null count) to pick
    // the dictionary-worthy keys, then one collect_set pass for the
    // survivors — instead of a distinct().collect() job per key column
    val candidates = keyCols.filter(k => typeOf.get(k).exists {
      case StringType | IntegerType | LongType | BooleanType => true
      case _ => false
    })
    // null-bearing VALUE columns are excluded from the encodable set:
    // the dense accumulate loops have no null slots (sum/min/max/avg over
    // them would silently treat null as 0 / let a phantom value compete,
    // and the kernel's count is a row count while Catalyst's count(col)
    // null-skips — reference and Spark both null-skip, core/ops.h:139-204),
    // so a query aggregating such a column must fall back to Catalyst.
    var nullValueCols: Set[String] = Set.empty
    val allNames = fields.map(_.name)
    val dicts: Map[String, Array[Any]] = if (candidates.isEmpty) Map.empty
    else {
      val statAggs = count(lit(1)).as("__n") +: (candidates.flatMap(k =>
        Seq(approx_count_distinct(col(k)).as(s"a_$k"),
          count(col(k)).as(s"c_$k"))) ++
        allNames.map(k => count(col(k)).as(s"v_$k")))
      val stats = df.agg(statAggs.head, statAggs.tail: _*).head()
      val total = stats.getAs[Long]("__n")
      nullValueCols = allNames.filter(k =>
        stats.getAs[Long](s"v_$k") != total).toSet
      val survivors = candidates.filter { k =>
        // 10% approx margin; the exact size is re-checked after collect
        stats.getAs[Long](s"a_$k") <= MaxDense.toLong * 11 / 10 &&
          stats.getAs[Long](s"c_$k") == total // nulls disqualify a key
      }
      if (survivors.isEmpty) Map.empty
      else {
        val setAggs = survivors.map(k => collect_set(col(k)).as(k))
        val sets = df.agg(setAggs.head, setAggs.tail: _*).head()
        survivors.flatMap { k =>
          val vs = sets.getSeq[Any](sets.fieldIndex(k)).toArray
          if (vs.length > MaxDense) None
          else Some(k -> (typeOf(k) match {
            case StringType => vs.map(_.asInstanceOf[String]).sorted.toArray[Any]
            case IntegerType => vs.map(_.asInstanceOf[Int]).sorted.toArray[Any]
            case LongType => vs.map(_.asInstanceOf[Long]).sorted.toArray[Any]
            case _ => vs.sortBy(_.toString)
          }))
        }.toMap
      }
    }

    val longCols = fields.collect {
      case f if (f.dataType == IntegerType || f.dataType == LongType) &&
        !nullValueCols(f.name) => f.name
    }.toSet
    val dblCols = fields.collect {
      case f if (f.dataType == DoubleType || f.dataType == FloatType) &&
        !nullValueCols(f.name) => f.name
    }.toSet
    val intSourced = fields.collect {
      case f if f.dataType == IntegerType => f.name
    }.toSet

    // per-column encoder index maps, broadcast once. String dicts are
    // keyed by UTF8String so the encode loop can probe with the scan's
    // zero-copy getUTF8String pointer — no per-row String allocation.
    val codeMaps: Map[String, java.util.HashMap[Any, Integer]] = dicts.map {
      case (k, vs) =>
        val m = new java.util.HashMap[Any, Integer](vs.length * 2)
        vs.zipWithIndex.foreach {
          case (v: String, i) =>
            m.put(org.apache.spark.unsafe.types.UTF8String.fromString(v), i)
          case (v, i) => m.put(v, i)
        }
        k -> m
    }
    val bcCodes = sc.broadcast(codeMaps)
    val names = fields.map(_.name).toArray
    val types = fields.map(_.dataType).toArray
    val wantCode = dicts.keySet
    val wantLong = longCols
    val wantDbl = dblCols

    // encode straight off InternalRows (the codegen'd scan output):
    // primitive getters, growable primitive builders, one pass — keeps
    // the load step off the Row-encoder path entirely
    val blocks: RDD[Block] = df.queryExecution.toRdd.mapPartitions { it =>
      val nCols = names.length
      val codeB = Array.tabulate(nCols)(ci =>
        if (wantCode(names(ci))) new scala.collection.mutable.ArrayBuilder.ofInt
        else null)
      val longB = Array.tabulate(nCols)(ci =>
        if (wantLong(names(ci))) new scala.collection.mutable.ArrayBuilder.ofLong
        else null)
      val dblB = Array.tabulate(nCols)(ci =>
        if (wantDbl(names(ci))) new scala.collection.mutable.ArrayBuilder.ofDouble
        else null)
      val maps = Array.tabulate(nCols)(ci =>
        if (wantCode(names(ci))) bcCodes.value(names(ci)) else null)
      var any = false
      while (it.hasNext) {
        val row = it.next()
        any = true
        var ci = 0
        while (ci < nCols) {
          if (codeB(ci) != null) {
            val key: Any = types(ci) match {
              case StringType => row.getUTF8String(ci)
              case IntegerType => Int.box(row.getInt(ci))
              case LongType => Long.box(row.getLong(ci))
              case BooleanType => Boolean.box(row.getBoolean(ci))
            }
            val code = maps(ci).get(key)
            if (code == null) throw new IllegalStateException(
              s"GroupKernel.encode: value $key of column ${names(ci)} not " +
                "in the dictionary — the table changed between the " +
                "dictionary build and the encode pass; cache the " +
                "DataFrame before registering it")
            codeB(ci) += code.intValue()
          }
          if (longB(ci) != null)
            longB(ci) += (if (types(ci) == IntegerType) row.getInt(ci).toLong
                          else row.getLong(ci))
          else if (dblB(ci) != null)
            dblB(ci) += (if (types(ci) == FloatType) row.getFloat(ci).toDouble
                         else row.getDouble(ci))
          ci += 1
        }
      }
      if (!any) Iterator.empty
      else {
        val out = Map.newBuilder[String, AnyRef]
        var ci = 0
        while (ci < nCols) {
          if (codeB(ci) != null) out += s"#${names(ci)}" -> codeB(ci).result()
          if (longB(ci) != null) out += names(ci) -> longB(ci).result()
          else if (dblB(ci) != null) out += names(ci) -> dblB(ci).result()
          ci += 1
        }
        Iterator.single(out.result())
      }
    }.persist(StorageLevel.MEMORY_AND_DISK)
    blocks.count()

    val decodeDicts: Map[String, Array[Any]] = dicts.map { case (k, vs) =>
      k -> vs.map {
        case s: String => org.apache.spark.unsafe.types.UTF8String.fromString(s)
        case x => x
      }
    }
    registry.synchronized {
      registry.put(df, new Encoded(dicts, dicts.keys.map(k => k -> typeOf(k)).toMap,
        longCols, dblCols, intSourced, nullValueCols, blocks,
        sc.broadcast(decodeDicts)))
    }
  }

  // accumulator ops
  private final val OpSum = 0
  private final val OpMin = 1
  private final val OpMax = 2

  /** Filter predicates the kernel can fuse into the dense pass — the
    * reference's canonical `(select {… where: … by: …})` always runs its
    * filter+group fused (`core/query.c:311-404`). The grammar mirrors the
    * script surface's simple predicate forms (comparison / in / within /
    * and / or / not over a plain column and literals); anything richer
    * fails to compile and the caller falls back to the Catalyst plan. */
  sealed trait Pred extends Serializable
  object Pred {
    /** op ∈ < <= > >= = != */
    final case class Cmp(col: String, op: String, value: Any) extends Pred
    final case class In(col: String, values: Seq[Any]) extends Pred
    /** inclusive both ends (reference `within` = between) */
    final case class Within(col: String, lo: Any, hi: Any) extends Pred
    final case class And(a: Pred, b: Pred) extends Pred
    final case class Or(a: Pred, b: Pred) extends Pred
    final case class Not(p: Pred) extends Pred
  }

  private type MaskFn = (Block, Int) => Array[Boolean]

  private def longMask(c: String, f: Long => Boolean): MaskFn = (blk, n) => {
    val vs = blk(c).asInstanceOf[Array[Long]]
    val m = new Array[Boolean](n); var i = 0
    while (i < n) { m(i) = f(vs(i)); i += 1 }; m
  }
  private def dblMask(c: String, f: Double => Boolean): MaskFn = (blk, n) => {
    val vs = blk(c).asInstanceOf[Array[Double]]
    val m = new Array[Boolean](n); var i = 0
    while (i < n) { m(i) = f(vs(i)); i += 1 }; m
  }
  private def codeMask(c: String, ok: Array[Boolean]): MaskFn = (blk, n) => {
    val cs = blk(s"#$c").asInstanceOf[Array[Int]]
    val m = new Array[Boolean](n); var i = 0
    while (i < n) { m(i) = ok(cs(i)); i += 1 }; m
  }

  private def isIntegral(x: Any): Boolean =
    x.isInstanceOf[java.lang.Long] || x.isInstanceOf[java.lang.Integer]
  private def toL(x: Any): Long = x match {
    case l: java.lang.Long => l; case i: java.lang.Integer => i.toLong
  }
  private def toD(x: Any): Double = x match {
    case l: java.lang.Long => l.toDouble; case i: java.lang.Integer => i.toDouble
    case d: java.lang.Double => d; case f: java.lang.Float => f.toDouble
  }
  private def isNum(x: Any): Boolean = x match {
    case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Double |
         _: java.lang.Float => true
    case _ => false
  }
  private def cmpL(op: String, v: Long, k: Long): Boolean = op match {
    case "<" => v < k; case "<=" => v <= k; case ">" => v > k
    case ">=" => v >= k; case "=" => v == k; case _ => v != k
  }
  private def cmpD(op: String, v: Double, k: Double): Boolean = op match {
    case "<" => v < k; case "<=" => v <= k; case ">" => v > k
    case ">=" => v >= k; case "=" => v == k; case _ => v != k
  }
  // string order must match Spark's (binary UTF-8), not UTF-16 compareTo
  private def cmpS(op: String, v: String, k: String): Boolean = {
    import org.apache.spark.unsafe.types.UTF8String
    val c = UTF8String.fromString(v).compareTo(UTF8String.fromString(k))
    op match {
      case "<" => c < 0; case "<=" => c <= 0; case ">" => c > 0
      case ">=" => c >= 0; case "=" => c == 0; case _ => c != 0
    }
  }

  /** Driver-side compile of a Pred over an encoded table: numeric block
    * columns evaluate per row; dictionary (string) columns pre-evaluate
    * ONCE PER DICT CODE — a predicate over a 1e5-value dictionary costs
    * 1e5 driver comparisons, then one array probe per row. Returns None
    * (→ Catalyst fallback) for any column/type pairing whose semantics
    * the kernel can't reproduce exactly. */
  private def compilePred(enc: Encoded, p: Pred): Option[MaskFn] = p match {
    case Pred.And(a, b) =>
      for (x <- compilePred(enc, a); y <- compilePred(enc, b)) yield {
        (blk: Block, n: Int) => {
          val m = x(blk, n); val o = y(blk, n); var i = 0
          while (i < n) { m(i) = m(i) && o(i); i += 1 }; m
        }: Array[Boolean]
      }
    case Pred.Or(a, b) =>
      for (x <- compilePred(enc, a); y <- compilePred(enc, b)) yield {
        (blk: Block, n: Int) => {
          val m = x(blk, n); val o = y(blk, n); var i = 0
          while (i < n) { m(i) = m(i) || o(i); i += 1 }; m
        }: Array[Boolean]
      }
    case Pred.Not(q) =>
      compilePred(enc, q).map { x => (blk: Block, n: Int) => {
        val m = x(blk, n); var i = 0
        while (i < n) { m(i) = !m(i); i += 1 }; m
      }: Array[Boolean] }
    case leaf =>
      val c = leaf match {
        case Pred.Cmp(c0, _, _) => c0
        case Pred.In(c0, _) => c0
        case Pred.Within(c0, _, _) => c0
        case _ => return None
      }
      if (enc.longCols(c)) compileNumLeaf(leaf, isLong = true)
      else if (enc.dblCols(c)) compileNumLeaf(leaf, isLong = false)
      else if (enc.dicts.contains(c) && enc.keyTypes(c) == StringType)
        compileDictLeaf(enc, c, leaf)
      else None

    }

  /** Numeric leaf: integral column+literals compare as Long, anything
    * floating compares as Double — the same promotions Catalyst applies. */
  private def compileNumLeaf(leaf: Pred, isLong: Boolean): Option[MaskFn] =
    leaf match {
      case Pred.Cmp(c, op, v) if isNum(v) =>
        if (isLong && isIntegral(v)) { val k = toL(v); Some(longMask(c, cmpL(op, _, k))) }
        else if (isLong) { val k = toD(v); Some(longMask(c, x => cmpD(op, x.toDouble, k))) }
        else { val k = toD(v); Some(dblMask(c, cmpD(op, _, k))) }
      case Pred.Within(c, lo, hi) if isNum(lo) && isNum(hi) =>
        if (isLong && isIntegral(lo) && isIntegral(hi)) {
          val l = toL(lo); val h = toL(hi)
          Some(longMask(c, x => x >= l && x <= h))
        } else if (isLong) {
          val l = toD(lo); val h = toD(hi)
          Some(longMask(c, x => { val d = x.toDouble; d >= l && d <= h }))
        } else {
          val l = toD(lo); val h = toD(hi)
          Some(dblMask(c, x => x >= l && x <= h))
        }
      case Pred.In(c, vs) if vs.nonEmpty && vs.forall(isNum) =>
        if (isLong && vs.forall(isIntegral)) {
          val ks = vs.map(toL).toArray
          Some(longMask(c, x => { var i = 0; var hit = false
            while (i < ks.length && !hit) { hit = ks(i) == x; i += 1 }; hit }))
        } else {
          val ks = vs.map(toD).toArray
          val f = (d: Double) => { var i = 0; var hit = false
            while (i < ks.length && !hit) { hit = ks(i) == d; i += 1 }; hit }
          if (isLong) Some(longMask(c, x => f(x.toDouble)))
          else Some(dblMask(c, f))
        }
      case _ => None
    }

  /** String-dictionary leaf: evaluate the predicate once per dict value
    * on the driver, probe per row. Only string literals compile (mixed
    * string/number comparisons fall back to Catalyst's cast semantics). */
  private def compileDictLeaf(enc: Encoded, c: String, leaf: Pred)
      : Option[MaskFn] = {
    val dict = enc.dicts(c)
    def build(f: String => Boolean): MaskFn =
      codeMask(c, dict.map(v => f(v.asInstanceOf[String])))
    leaf match {
      case Pred.Cmp(_, op, k: String) => Some(build(cmpS(op, _, k)))
      case Pred.Within(_, lo: String, hi: String) =>
        Some(build(v => cmpS(">=", v, lo) && cmpS("<=", v, hi)))
      case Pred.In(_, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        val set = vs.map(_.asInstanceOf[String]).toSet
        Some(build(set.contains))
      case _ => None
    }
  }

  /** Dense per-partition partials: occupancy counts + one slot array per
    * long/double accumulator. */
  private final case class Partial(
      counts: Array[Long],
      accL: Array[Array[Long]],
      accD: Array[Array[Double]]) {
    def merge(o: Partial, opsL: Array[Int], opsD: Array[Int]): Partial = {
      val p = counts.length
      var i = 0
      while (i < p) { counts(i) += o.counts(i); i += 1 }
      var a = 0
      while (a < accL.length) {
        val x = accL(a); val y = o.accL(a)
        opsL(a) match {
          // addExact: ANSI mode is on repo-wide, so the Catalyst plan this
          // kernel replaces raises on BIGINT sum overflow — match it
          case OpSum => var i = 0; while (i < p) { x(i) = Math.addExact(x(i), y(i)); i += 1 }
          case OpMin => var i = 0; while (i < p) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
          case OpMax => var i = 0; while (i < p) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
        }
        a += 1
      }
      a = 0
      while (a < accD.length) {
        val x = accD(a); val y = o.accD(a)
        opsD(a) match {
          case OpSum => var i = 0; while (i < p) { x(i) += y(i); i += 1 }
          case OpMin => var i = 0; while (i < p) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
          case OpMax => var i = 0; while (i < p) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
        }
        a += 1
      }
      this
    }
  }

  /** Try to run `keys`-grouped primitives `prims` (op ∈ sum|avg|min|max|
    * count, aligned with output columns `__p0…`) over an encoded table.
    * `finish` receives the small decoded DataFrame (key cols + `__pN`
    * primitive cols, Spark-typed) and applies the query's post-arithmetic
    * and naming. Returns None whenever the kernel doesn't apply. */
  def tryRun(df: DataFrame, keys: Seq[String], prims: Seq[(String, String)],
             finish: DataFrame => DataFrame,
             filter: Option[Pred] = None): Option[DataFrame] = {
    val enc = registry.synchronized(registry.get(df))
    if (enc == null || keys.isEmpty) return None
    if (!keys.forall(enc.dicts.contains)) return None
    val cards = keys.map(enc.dicts(_).length.toLong)
    val product = cards.foldLeft(1L)((a, b) =>
      if (a > MaxDense) a else a * b)
    if (product > MaxDense) return None
    val p = product.toInt
    if (p == 0) return None

    val supported = prims.forall { case (op, c) =>
      op match {
        // count is LENGTH semantics in the script surface (Rayfall maps
        // `(count v)` to count(lit(1)), like the reference) — row count
        // is correct parity even over a null-bearing column
        case "count" => true
        case "sum" | "avg" | "min" | "max" => enc.longCols(c) || enc.dblCols(c)
        case _ => false
      }
    }
    if (!supported) return None
    // fused filter: compile once on the driver (dict leaves pre-evaluate
    // per code); an uncompilable predicate falls back to Catalyst
    val maskF: MaskFn = filter match {
      case None => null
      case Some(pred) => compilePred(enc, pred).getOrElse(return None)
    }

    // accumulator plan: avg(int) sums in Long (exact), avg(double) in Double
    final case class Slot(op: Int, col: String, isLong: Boolean, init: Long, initD: Double)
    val slotOf = scala.collection.mutable.LinkedHashMap.empty[(String, String), Slot]
    prims.foreach { case (op, c) =>
      val isLong = enc.longCols(c)
      op match {
        case "count" => ()
        case "sum" | "avg" =>
          slotOf.getOrElseUpdate(("sum", c), Slot(OpSum, c, isLong, 0L, 0.0))
        case "min" =>
          slotOf.getOrElseUpdate(("min", c), Slot(OpMin, c, isLong, Long.MaxValue, Double.PositiveInfinity))
        case "max" =>
          slotOf.getOrElseUpdate(("max", c), Slot(OpMax, c, isLong, Long.MinValue, Double.NegativeInfinity))
      }
    }
    val slots = slotOf.values.toArray
    val slotsL = slots.filter(_.isLong)
    val slotsD = slots.filterNot(_.isLong)
    val slotIdx: Map[(String, String), (Boolean, Int)] =
      slotsL.zipWithIndex.map(s => (opName(s._1.op), s._1.col) -> (true, s._2)).toMap ++
        slotsD.zipWithIndex.map(s => (opName(s._1.op), s._1.col) -> (false, s._2)).toMap
    val opsL = slotsL.map(_.op)
    val opsD = slotsD.map(_.op)
    val cardsArr = cards.map(_.toInt).toArray
    val keyArr = keys.toArray
    val colL = slotsL.map(_.col)
    val colD = slotsD.map(_.col)
    val initL = slotsL.map(_.init)
    val initD = slotsD.map(_.initD)

    val debug = sys.env.contains("SPARK_GRAFT_KERNEL_DEBUG")
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = if (debug) {
      println(f"[kernel] $tag ${(System.nanoTime() - t0) / 1e6}%.1f ms")
      t0 = System.nanoTime()
    }
    // Large key products make the dense partial arrays the dominant
    // shipping cost (P=1e5 × 3 accumulators ≈ 2.4 MB per partition): merge
    // locally first by giving each task several cached blocks (coalesce
    // keeps locality on a cluster), so fewer, same-sized partials travel.
    // The fan-in is proportional (×4, floor 8) — a fixed small number
    // would collapse a big cluster's scan to a handful of tasks.
    val src =
      if (p >= (1 << 14))
        enc.blocks.coalesce(
          math.max(8, enc.blocks.getNumPartitions / 4), shuffle = false)
      else enc.blocks
    val partials = src.mapPartitions { blocks =>
      if (blocks.isEmpty) Iterator.empty
      else {
        val counts = new Array[Long](p)
        val accL = Array.tabulate(colL.length) { a =>
          val acc = new Array[Long](p)
          if (initL(a) != 0L) java.util.Arrays.fill(acc, initL(a))
          acc
        }
        val accD = Array.tabulate(colD.length) { a =>
          val acc = new Array[Double](p)
          if (initD(a) != 0.0) java.util.Arrays.fill(acc, initD(a))
          acc
        }
        var codes: Array[Int] = null
        var idx: Array[Int] = null
        blocks.foreach { block =>
          val keyCodes = keyArr.map(k => block(s"#$k").asInstanceOf[Array[Int]])
          val n = if (keyCodes.isEmpty) 0 else keyCodes(0).length
          if (codes == null || codes.length < n) codes = new Array[Int](n)
          val mask = if (maskF == null) null else maskF(block, n)
          // pass 1: combined dense codes + occupancy. With a fused filter
          // the surviving rows compact into codes[0..m) with idx mapping
          // back to source positions, so the value loops below stay tight
          // (branch-free over m) instead of re-testing the mask per slot.
          val k0 = keyCodes(0)
          var m = 0
          if (mask == null) {
            if (keyCodes.length == 1) {
              var i = 0
              while (i < n) { val c = k0(i); codes(i) = c; counts(c) += 1; i += 1 }
            } else {
              var i = 0
              while (i < n) {
                var c = k0(i)
                var j = 1
                while (j < keyCodes.length) { c = c * cardsArr(j) + keyCodes(j)(i); j += 1 }
                codes(i) = c; counts(c) += 1; i += 1
              }
            }
            m = n
          } else {
            if (idx == null || idx.length < n) idx = new Array[Int](n)
            var i = 0
            while (i < n) {
              if (mask(i)) {
                var c = k0(i)
                var j = 1
                while (j < keyCodes.length) { c = c * cardsArr(j) + keyCodes(j)(i); j += 1 }
                codes(m) = c; idx(m) = i; counts(c) += 1; m += 1
              }
              i += 1
            }
          }
          // pass 2: one tight loop per accumulator
          var a = 0
          while (a < colL.length) {
            val acc = accL(a)
            val vs = block(colL(a)).asInstanceOf[Array[Long]]
            if (mask == null) opsL(a) match {
              case OpSum => var i = 0; while (i < m) { val c = codes(i); acc(c) = Math.addExact(acc(c), vs(i)); i += 1 }
              case OpMin => var i = 0; while (i < m) { val c = codes(i); if (vs(i) < acc(c)) acc(c) = vs(i); i += 1 }
              case OpMax => var i = 0; while (i < m) { val c = codes(i); if (vs(i) > acc(c)) acc(c) = vs(i); i += 1 }
            } else opsL(a) match {
              case OpSum => var i = 0; while (i < m) { val c = codes(i); acc(c) = Math.addExact(acc(c), vs(idx(i))); i += 1 }
              case OpMin => var i = 0; while (i < m) { val c = codes(i); val v = vs(idx(i)); if (v < acc(c)) acc(c) = v; i += 1 }
              case OpMax => var i = 0; while (i < m) { val c = codes(i); val v = vs(idx(i)); if (v > acc(c)) acc(c) = v; i += 1 }
            }
            a += 1
          }
          a = 0
          while (a < colD.length) {
            val acc = accD(a)
            val vs = block(colD(a)).asInstanceOf[Array[Double]]
            if (mask == null) opsD(a) match {
              case OpSum => var i = 0; while (i < m) { acc(codes(i)) += vs(i); i += 1 }
              case OpMin => var i = 0; while (i < m) { val c = codes(i); if (vs(i) < acc(c)) acc(c) = vs(i); i += 1 }
              case OpMax => var i = 0; while (i < m) { val c = codes(i); if (vs(i) > acc(c)) acc(c) = vs(i); i += 1 }
            } else opsD(a) match {
              case OpSum => var i = 0; while (i < m) { acc(codes(i)) += vs(idx(i)); i += 1 }
              case OpMin => var i = 0; while (i < m) { val c = codes(i); val v = vs(idx(i)); if (v < acc(c)) acc(c) = v; i += 1 }
              case OpMax => var i = 0; while (i < m) { val c = codes(i); val v = vs(idx(i)); if (v > acc(c)) acc(c) = v; i += 1 }
            }
            a += 1
          }
        }
        Iterator.single(Partial(counts, accL, accD))
      }
    }
    lap("plan")

    // decode occupied cells into a local DataFrame
    val outFields =
      keyArr.map(k => StructField(k, enc.keyTypes(k))) ++
        prims.zipWithIndex.map { case ((op, c), i) =>
          val dt = op match {
            case "count" => LongType
            case "avg" => DoubleType
            case "sum" => if (enc.longCols(c)) LongType else DoubleType
            case "min" | "max" =>
              if (enc.intSourced(c)) IntegerType
              else if (enc.longCols(c)) LongType else DoubleType
          }
          StructField(s"__p$i", dt)
        }
    val schema = StructType(outFields.toArray)
    // decode dictionaries ride the per-table broadcast (see Encoded) —
    // only this stub enters the merge-task closure
    val bcDecode = enc.bcDecode
    // Merge + decode run where the partials are — nothing routes through
    // the driver, and the caller's action executes the whole thing as ONE
    // job: scan → tiny shuffle → merge + decode + project. Small key
    // products take a 1-partition shuffle (a few KB). Large products
    // (P ≥ 2^14 — the H2O 1e5-group family) split every partial into
    // `nChunks` contiguous code ranges and shuffle BY RANGE, so the
    // merge's fetch + deserialize + dense add + row decode all run
    // `nChunks`-wide instead of serializing ~partials × P cells through
    // one task (measured: that single task was the whole Q3/Q5/Q6 gap vs
    // the reference; the bytes moved are identical, only parallel).
    val nKeys = keyArr.length
    val primsArr = prims.toArray
    val intSrc = enc.intSourced
    // decode one merged dense range [base, base + counts.length) of the
    // global code space into output rows (key decode + post-agg slots)
    def decodeRange(merged: Partial, base: Int)
        : Iterator[org.apache.spark.sql.catalyst.InternalRow] = {
      // executor-side: resolve the broadcast once per range
      val dictsInternal: Array[Array[Any]] = {
        val m = bcDecode.value; keyArr.map(m)
      }
      val rows = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.catalyst.InternalRow]
      val len = merged.counts.length
      var i = 0
      while (i < len) {
        if (merged.counts(i) > 0) {
          val vals = new Array[Any](nKeys + primsArr.length)
          var rem = base + i
          var j = nKeys - 1
          while (j >= 0) {
            vals(j) = dictsInternal(j)(rem % cardsArr(j))
            rem /= cardsArr(j)
            j -= 1
          }
          var q = 0
          while (q < primsArr.length) {
            val (op, c) = primsArr(q)
            vals(nKeys + q) = op match {
              case "count" => merged.counts(i)
              case "avg" =>
                val (isL, s) = slotIdx(("sum", c))
                if (isL) merged.accL(s)(i).toDouble / merged.counts(i)
                else merged.accD(s)(i) / merged.counts(i)
              case o =>
                val (isL, s) = slotIdx((o, c))
                if (isL) {
                  val v = merged.accL(s)(i)
                  if (intSrc(c) && (o == "min" || o == "max")) v.toInt else v
                } else merged.accD(s)(i)
            }
            q += 1
          }
          rows += new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(vals)
        }
        i += 1
      }
      rows.iterator
    }
    val nChunks = if (p >= (1 << 14)) 8 else 1
    val mergedRows =
      if (GroupKernel.driverMergeEligible(p, src.getNumPartitions)) {
        // p ≤ 2^14 keeps the DECODED result small: the driver path
        // ships result rows in one task closure, and a 1e5-group query
        // sneaking under the product bound (few source partitions)
        // re-opened the round-7 LocalRelation trap — its single-task
        // stage paid ~40 ms of closure deserialization per query
        // (measured: Q6 255 ms vs 140 via the executor merge).
        // small dense space (the H2O Q1/Q2/Q4 shapes): the partials are
        // a few KB-to-hundreds-of-KB each — collect and merge on the
        // driver, decode locally, re-distribute the result rows as a
        // single-partition RDD. Removes the 1-partition shuffle stage
        // (its 32 map-output files + an extra scheduled stage cost more
        // than the result ships for). The large-row LocalRelation trap
        // (round 7) doesn't apply: rows enter as InternalRows, no
        // encoder pass. The gate bounds the PRODUCT slots×partitions
        // (≤ 2^21, the same worst-case driver pull as the original
        // p ≤ 4096 × 512-partition gate — round 10 widened it so a
        // 10k-group query on a 32-partition scan merges driver-side
        // too): a 1000-executor scan with 100k partitions must NOT fan
        // 10 GB of partials into the driver — past the gate the
        // executor-side merge below runs.
        val ps = partials.collect()
        val rows =
          if (ps.isEmpty) Array.empty[org.apache.spark.sql.catalyst.InternalRow]
          else decodeRange(ps.reduce((a, b) => a.merge(b, opsL, opsD)), 0).toArray
        df.sparkSession.sparkContext.parallelize(
          scala.collection.immutable.ArraySeq.unsafeWrapArray(rows), 1)
      }
      else if (nChunks == 1)
        partials.repartition(1).mapPartitions { ps =>
          if (ps.isEmpty) Iterator.empty
          else decodeRange(ps.reduce((a, b) => a.merge(b, opsL, opsD)), 0)
        }
      else {
        val chunkSize = (p + nChunks - 1) / nChunks
        partials.flatMap { pt =>
          (0 until nChunks).iterator.map { ch =>
            val from = ch * chunkSize
            val until = math.min(p, from + chunkSize)
            ch -> Partial(
              java.util.Arrays.copyOfRange(pt.counts, from, until),
              pt.accL.map(a => java.util.Arrays.copyOfRange(a, from, until)),
              pt.accD.map(a => java.util.Arrays.copyOfRange(a, from, until)))
          }
        }.partitionBy(new org.apache.spark.HashPartitioner(nChunks))
          .mapPartitions { it =>
            if (it.isEmpty) Iterator.empty
            else {
              // one chunk id per partition (ids 0..nChunks-1 hash to
              // themselves); merge its slices, decode its code range
              var ch = -1
              var merged: Partial = null
              it.foreach { case (c, slice) =>
                ch = c
                merged =
                  if (merged == null) slice else merged.merge(slice, opsL, opsD)
              }
              decodeRange(merged, ch * chunkSize)
            }
          }
      }
    // 1-partition results (driver merge, single-chunk executor merge)
    // declare SinglePartition so the caller's count/collect aggregate
    // plans exchange-free — one stage fewer per sub-second query
    val idf =
      if (mergedRows.getNumPartitions == 1)
        org.apache.spark.sql.graftshim.ColumnInternals
          .internalDataFrameSingle(df.sparkSession, schema, mergedRows)
      else org.apache.spark.sql.graftshim.ColumnInternals
        .internalDataFrame(df.sparkSession, schema, mergedRows)
    val out = finish(idf)
    lap("build")
    Some(out)
  }

  private def opName(op: Int): String = op match {
    case OpSum => "sum"; case OpMin => "min"; case OpMax => "max"
  }
}
