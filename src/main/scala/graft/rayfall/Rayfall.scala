package graft.rayfall

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.RF
import graft.{StringToColumn, Tbl}

/** A thin front-end for the reference's Rayfall query language
  * (s-expressions; parser mirrored on `/root/reference/core/parse.c`
  * grammar: lists `(f a b)`, vector literals `[a b]`, dict literals
  * `{k: v}`, quoted symbols `'sym`, numbers, strings).
  *
  * This is NOT the reference implementation re-done — expressions are
  * translated straight into Catalyst `Column`s and the `Tbl` facade, so
  * a Rayfall `select` compiles to the same optimized Spark plan as the
  * native API. Covered surface: `select`/`update` with
  * `from:/where:/by:/take:`, `insert`/`upsert`, the join family
  * (`left-join`/`inner-join`/`asof-join`/`window-join`/`window-join1`),
  * `distinct`/`xasc`/`xdesc`, arithmetic/comparison/logic, the
  * aggregation set, and the scalar library shims (`xbar`, `within`,
  * `like`, Euclidean `/` `%`).
  */
object Rayfall {

  // ---------------------------------------------------------------- AST
  sealed trait RExpr
  /** Numeric literal. Integer lexemes keep the exact i64 in `l` (the
    * reference parser holds exact i64 — `core/parse.c` number path — and the
    * engine's TIMESTAMP convention is nanos-as-long, ~1.7e18, above Double's
    * 2^53 exact range); `v` is only meaningful when `isInt` is false.
    */
  final case class RNum(v: Double, isInt: Boolean, l: Long = 0L) extends RExpr
  final case class RStr(v: String) extends RExpr
  final case class RSym(name: String) extends RExpr
  final case class RQuote(name: String) extends RExpr
  final case class RList(items: List[RExpr]) extends RExpr
  final case class RVec(items: List[RExpr]) extends RExpr
  final case class RDict(pairs: List[(String, RExpr)]) extends RExpr

  // ------------------------------------------------------------- parser
  def parse(src: String): RExpr = {
    val p = new Parser(src)
    val e = p.parseExpr()
    p.skipWs()
    require(p.eof, s"trailing input at ${p.pos}: '${p.rest.take(20)}'")
    e
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def rest: String = s.substring(pos)
    def skipWs(): Unit = {
      while (!eof && (s(pos).isWhitespace || s(pos) == ',')) pos += 1
      if (!eof && s(pos) == ';') { // comment to end of line
        while (!eof && s(pos) != '\n') pos += 1
        skipWs()
      }
    }
    def parseExpr(): RExpr = {
      skipWs()
      require(!eof, "unexpected end of input")
      s(pos) match {
        case '(' => pos += 1; RList(parseSeq(')'))
        case '[' => pos += 1; RVec(parseSeq(']'))
        case '{' => pos += 1; parseDict()
        case '\'' => pos += 1; RQuote(parseSymName())
        case '"' => parseStr()
        case c if c.isDigit || (c == '-' && pos + 1 < s.length &&
          s(pos + 1).isDigit) => parseNum()
        case _ => RSym(parseSymName())
      }
    }
    private def parseSeq(close: Char): List[RExpr] = {
      val buf = List.newBuilder[RExpr]
      skipWs()
      while ({ require(!eof, s"missing '$close'"); s(pos) != close }) {
        buf += parseExpr(); skipWs()
      }
      pos += 1
      buf.result()
    }
    private def parseDict(): RDict = {
      val buf = List.newBuilder[(String, RExpr)]
      skipWs()
      while ({ require(!eof, "missing '}'"); s(pos) != '}' }) {
        val key = parseSymName()
        require(!eof && s(pos) == ':', s"expected ':' after dict key $key")
        pos += 1
        buf += ((key, parseExpr()))
        skipWs()
      }
      pos += 1
      RDict(buf.result())
    }
    private def parseSymName(): String = {
      val start = pos
      while (!eof && !s(pos).isWhitespace &&
        "()[]{}':;,".indexOf(s(pos).toInt) < 0) pos += 1
      require(pos > start, s"expected symbol at $start")
      s.substring(start, pos)
    }
    private def parseStr(): RStr = {
      pos += 1
      val sb = new StringBuilder
      while ({ require(!eof, "unterminated string"); s(pos) != '"' }) {
        if (s(pos) == '\\' && pos + 1 < s.length) { pos += 1; sb += s(pos) }
        else sb += s(pos)
        pos += 1
      }
      pos += 1
      RStr(sb.toString)
    }
    private def parseNum(): RNum = {
      val start = pos
      if (s(pos) == '-') pos += 1
      while (!eof && (s(pos).isDigit || s(pos) == '.')) pos += 1
      val text = s.substring(start, pos)
      if (text.contains('.')) RNum(text.toDouble, isInt = false)
      else RNum(0.0, isInt = true, l = text.toLong)
    }
  }

  // ---------------------------------------------------------- evaluator

  /** Evaluate a Rayfall query string against a table catalog. */
  def query(src: String, tables: Map[String, DataFrame]): DataFrame =
    eval(parse(src), tables)

  /** Evaluate a SCRIPT: a sequence of top-level forms in the reference's
    * `.rfl` style (the scripts under `/root/reference/examples/`). Supported:
    *
    *  - `(set name form)` — bind a query result or table literal;
    *  - `(table [cols…] (list vec…))` — in-line table literal
    *    (`core/compose.c:217` ray_table), columns from vector literals;
    *  - `(show x)` — no-op (display form);
    *  - any query form from [[eval]].
    *
    * Returns the last table-valued result. `tables` seeds the
    * environment; `set` shadows it.
    */
  def script(spark: SparkSession, src: String,
             tables: Map[String, DataFrame] = Map.empty): DataFrame = {
    val p = new Parser(src)
    val env = scala.collection.mutable.Map[String, DataFrame](tables.toSeq: _*)
    var last: DataFrame = null
    p.skipWs()
    while (!p.eof) {
      val form = p.parseExpr()
      form match {
        case RList(RSym("set") :: RSym(name) :: value :: Nil) =>
          last = evalForm(spark, value, env.toMap)
          env(name) = last
        case RList(RSym("show") :: _) => // display form — no-op
        case other =>
          last = evalForm(spark, other, env.toMap)
      }
      p.skipWs()
    }
    require(last != null, "script produced no table")
    last
  }

  private def evalForm(spark: SparkSession, e: RExpr,
                       tables: Map[String, DataFrame]): DataFrame = e match {
    case RList(RSym("table") :: RVec(cols) :: RList(RSym("list") :: vecs) :: Nil) =>
      tableLiteral(spark, keyNames(cols), vecs)
    case other => eval(other, tables)
  }

  /** `(table [c…] (list [v…]…))` — build a DataFrame from vector
    * literals. Int vectors → LongType, decimals → DoubleType, strings /
    * quoted symbols → StringType. */
  private def tableLiteral(spark: SparkSession, names: Seq[String],
                           vecs: List[RExpr]): DataFrame = {
    require(names.length == vecs.length,
      s"table: ${names.length} names but ${vecs.length} columns")
    val cols: Seq[Seq[Any]] = vecs.map {
      case RVec(items) => items.map[Any] {
        case RNum(_, true, l) => l
        case RNum(v, false, _) => v
        case RStr(s) => s
        case RQuote(s) => s
        case RSym(s) => s // bare symbols in vector literals are symbols
        case x => throw new IllegalArgumentException(s"bad literal $x")
      }
      case RList(RSym("list") :: items) => items.map[Any] {
        case RStr(s) => s
        case RNum(_, true, l) => l
        case RNum(v, false, _) => v
        case RQuote(s) => s
        case x => throw new IllegalArgumentException(s"bad literal $x")
      }
      case x => throw new IllegalArgumentException(s"bad column vector $x")
    }
    val n = cols.headOption.map(_.length).getOrElse(0)
    require(cols.forall(_.length == n), "table: ragged columns")
    val typed = names.zip(cols).map { case (name, vals) =>
      val tpe = vals.collectFirst {
        case _: java.lang.Double => org.apache.spark.sql.types.DoubleType
        case _: String => org.apache.spark.sql.types.StringType
      }.getOrElse(org.apache.spark.sql.types.LongType)
      // coerce mixed int/decimal literals up to double
      val coerced =
        if (tpe == org.apache.spark.sql.types.DoubleType)
          vals.map[Any] { case l: java.lang.Long => l.doubleValue(); case v => v }
        else vals
      (org.apache.spark.sql.types.StructField(name, tpe, nullable = true),
        coerced)
    }
    val fields = typed.map(_._1)
    val rows = (0 until n).map(i =>
      org.apache.spark.sql.Row.fromSeq(typed.map(_._2(i))))
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      org.apache.spark.sql.types.StructType(fields))
  }

  def eval(e: RExpr, tables: Map[String, DataFrame]): DataFrame = e match {
    case RList(RSym("left-join") :: RVec(keys) :: l :: r :: Nil) =>
      graft.operators.Joins.leftJoinOverride(
        evalTable(l, tables), evalTable(r, tables), keyNames(keys))
    case RList(RSym("inner-join") :: RVec(keys) :: l :: r :: Nil) =>
      graft.operators.Joins.innerJoinOverride(
        evalTable(l, tables), evalTable(r, tables), keyNames(keys))
    case RList(RSym("asof-join") :: RVec(keys) :: l :: r :: Nil) =>
      // last key symbol is the time column (reference asof-join form)
      val ks = keyNames(keys)
      graft.operators.AsofJoin.asofJoin(
        evalTable(l, tables), evalTable(r, tables), ks.init, ks.last)

    // (window-join [k… t] intervals l r {aggs}) — reference form,
    // core/join.c:358. Intervals: either a literal [lo hi] offsets pair,
    // or the docs' (map-left + [lo hi] (at l 'ts)) construction — both
    // mean "per left row, [ts+lo, ts+hi]". window-join = exclusive
    // bounds, window-join1 = inclusive (examples/wj.rfl).
    case RList(RSym(wj @ ("window-join" | "window-join1")) :: RVec(keys) ::
        intervals :: l :: r :: RDict(aggPairs) :: Nil) =>
      val ks = keyNames(keys)
      val (eqKeys, ts) = (ks.init, ks.last)
      val (lo, hi) = intervals match {
        case RVec(List(a, b)) => (toColumn(a), toColumn(b))
        case RList(RSym("map-left") :: RSym("+") :: RVec(List(a, b)) :: _) =>
          (toColumn(a), toColumn(b))
        case x => throw new IllegalArgumentException(
          s"window-join intervals must be [lo hi] offsets, got $x")
      }
      val left = evalTable(l, tables)
      val aggs = aggPairs.map { case (n, a) => toColumn(a).as(n) }
      graft.operators.WindowJoin.windowJoin(
        left, evalTable(r, tables), left.columns.toSeq, eqKeys, ts,
        lo, hi, aggs, inclusive = wj == "window-join1")

    // (insert t rows) — append, aligning columns by name (reference
    // insert accepts reordered dict/table forms, examples/insert.rfl).
    case RList(RSym("insert") :: t :: rows :: Nil) =>
      Tbl(evalTable(t, tables)).insert(evalTable(rows, tables)).df

    // (upsert t n s) — keyed merge on the FIRST n columns of t
    // (reference upsert, core/update.c:556; examples/update.rfl).
    case RList(RSym("upsert") :: t :: RNum(_, true, n) :: s :: Nil) =>
      val target = evalTable(t, tables)
      Tbl(target).upsert(evalTable(s, tables),
        target.columns.take(n.toInt).toSeq).df

    // (update {col: expr from: t where: … by: …}) — rewrite columns in
    // place; under by:, aggregates broadcast per group (reference
    // ray_update, core/update.c; docs/.../queries/update.md).
    case RList(RSym("update") :: RDict(pairs) :: Nil) =>
      val opts = pairs.toMap
      val table = evalTable(opts.getOrElse("from",
        throw new IllegalArgumentException("update needs from:")), tables)
      val mappings = pairs.filterNot { case (k, _) =>
        Set("from", "where", "by").contains(k) }
        .map { case (k, v) => k -> toColumn(v) }
      val where = opts.get("where").map(toColumn)
      val by = opts.get("by").toList.flatMap(byNames)
      if (by.isEmpty)
        Tbl(table).update(mappings, where.orNull).df
      else {
        // grouped update: aggregates evaluate per group over the
        // where-filtered rows ONLY (the reference builds the group index
        // on the filtered rows, core/query.c:340) and broadcast back;
        // assignment still touches only where-matching rows
        val (aggM, rowM) = mappings.partition { case (_, c) => Tbl.isAggregate(c) }
        val withAggs =
          if (aggM.isEmpty) table
          else {
            val filtered = where.map(table.filter).getOrElse(table)
            val aggDf = filtered.groupBy(by.map(col): _*)
              .agg(aggM.head._2.as(s"__u_${aggM.head._1}"),
                aggM.tail.map { case (n, c) => c.as(s"__u_$n") }: _*)
            val joined = table.join(aggDf, by, "left")
            aggM.foldLeft(joined) { case (d, (n, _)) =>
              val v = where match {
                case Some(cond) if d.columns.contains(n) =>
                  when(cond, col(s"__u_$n")).otherwise(col(n))
                case Some(cond) => when(cond, col(s"__u_$n"))
                case None => col(s"__u_$n")
              }
              d.withColumn(n, v)
            }.drop(aggM.map(p => s"__u_${p._1}"): _*)
          }
        Tbl(withAggs).update(rowM, where.orNull).df
      }

    // (alter t fn 'col v) — apply a binary fn to a whole table column
    // (reference alter, docs/.../queries/alter.md: `(alter trades + 'price 10)`;
    // core/update.c:268). `set` overwrites.
    case RList(RSym("alter") :: t :: RSym(fn) :: RQuote(colName) :: v :: Nil) =>
      val table = evalTable(t, tables)
      val vc = toColumn(v)
      val newCol = fn match {
        case "set" => vc
        case _ => apply1(fn, List(col(colName), vc), List(RSym(colName), v))
      }
      Tbl(table).update(Seq(colName -> newCol)).df

    // (take n t) — first n rows of a table (reference take,
    // core/items.c:398; negative "from the end" has no stable meaning
    // on an unordered DataFrame and is rejected)
    case RList(RSym("take") :: RNum(_, true, n) :: tExpr :: Nil) =>
      require(n > 0, "(take n t) on a table needs n > 0")
      evalTable(tExpr, tables).limit(n.toInt)

    // (distinct t) / (xasc [c…] t) / (xdesc [c…] t) table forms
    case RList(RSym("distinct") :: t :: Nil) =>
      evalTable(t, tables).distinct()
    case RList(RSym("xasc") :: RVec(keys) :: t :: Nil) =>
      Tbl(evalTable(t, tables)).xasc(keyNames(keys): _*).df
    case RList(RSym("xdesc") :: RVec(keys) :: t :: Nil) =>
      Tbl(evalTable(t, tables)).xdesc(keyNames(keys): _*).df
    case RList(RSym("select") :: RDict(pairs) :: Nil) =>
      val opts = pairs.toMap
      val from = opts.getOrElse("from",
        throw new IllegalArgumentException("select needs from:"))
      val table = from match {
        case RSym(n) => tables.getOrElse(n,
          throw new IllegalArgumentException(s"unknown table $n"))
        case l: RList => eval(l, tables)
        case x => throw new IllegalArgumentException(s"bad from: $x")
      }
      val mappings = pairs.filterNot { case (k, _) =>
        Set("from", "where", "by", "take").contains(k) }
        .map { case (k, v) => k -> toColumn(v) }
      val where = opts.get("where").map(toColumn).orNull
      val by = opts.get("by").toList.flatMap(byNames)
      val take = opts.get("take").map {
        case RNum(_, true, l) => l.toInt
        case x => throw new IllegalArgumentException(s"bad take: $x")
      }.getOrElse(0)
      Tbl(table).select(mappings, where, by, take).df
    case x => throw new IllegalArgumentException(s"cannot evaluate $x as a query")
  }

  private def evalTable(e: RExpr, tables: Map[String, DataFrame]): DataFrame =
    e match {
      case RSym(n) => tables.getOrElse(n,
        throw new IllegalArgumentException(s"unknown table $n"))
      case l: RList => eval(l, tables)
      case x => throw new IllegalArgumentException(s"bad table ref $x")
    }

  private def keyNames(keys: List[RExpr]): Seq[String] = keys.map {
    case RSym(n) => n
    case RQuote(n) => n
    case x => throw new IllegalArgumentException(s"bad key $x")
  }

  /** by: accepts a symbol, quoted symbol, vector of symbols, or the
    * docs' dict form `{a: a b: b}`. */
  private def byNames(e: RExpr): Seq[String] = e match {
    case RSym(n) => Seq(n)
    case RQuote(n) => Seq(n)
    case RVec(items) => keyNames(items)
    case RDict(pairs) => pairs.map(_._1)
    case x => throw new IllegalArgumentException(s"bad by: $x")
  }

  /** Reference type symbols → Spark cast targets (§1.2 table; TIMESTAMP
    * stays LongType nanos per the repo-wide convention). */
  private val castTargets: Map[String, String] = Map(
    "B8" -> "boolean", "U8" -> "tinyint", "I16" -> "smallint",
    "I32" -> "int", "I64" -> "bigint", "F64" -> "double",
    "C8" -> "string", "SYMBOL" -> "string", "DATE" -> "date",
    "TIMESTAMP" -> "bigint")

  /** Rayfall expression → Catalyst Column. */
  def toColumn(e: RExpr): Column = e match {
    // (as 'TYPE x) — the reference cast (core/compose.c:42)
    case RList(RSym("as") :: RQuote(t) :: x :: Nil) =>
      val target = castTargets.getOrElse(t,
        throw new IllegalArgumentException(s"unknown cast type '$t"))
      toColumn(x).cast(target)
    case RNum(_, true, l) => lit(l)
    case RNum(v, false, _) => lit(v)
    case RStr(v) => lit(v)
    case RQuote(n) => lit(n)
    case RSym(n) => col(n)
    case RVec(items) => array(items.map(toColumn): _*)
    // ((fn [x…] body) arg…) — immediate lambda application (reference
    // lambdas, core/lambda.c; update.md uses ((fn [x] (+ x 11)) price)).
    // Compiled by substitution: the body IS the column expression with
    // params replaced by the argument expressions — Catalyst codegens it
    // like any other tree (the analog of the reference's bytecode
    // compilation, core/cc.c:395).
    case RList(RList(RSym("fn") :: RVec(params) :: body :: Nil) :: args) =>
      val names = keyNames(params)
      require(names.length == args.length,
        s"lambda arity ${names.length} != ${args.length} args")
      toColumn(substitute(body, names.zip(args).toMap))
    case RList(RSym(fn) :: args) => apply1(fn, args.map(toColumn), args)
    case x => throw new IllegalArgumentException(s"cannot translate $x")
  }

  /** Capture-free substitution of lambda params (shadowed names inside
    * nested lambdas are left untouched). */
  private def substitute(e: RExpr, env: Map[String, RExpr]): RExpr = e match {
    case RSym(n) if env.contains(n) => env(n)
    case RList(RList(RSym("fn") :: RVec(ps) :: body :: Nil) :: args) =>
      val inner = env -- keyNames(ps)
      RList(RList(RSym("fn") :: RVec(ps) :: substitute(body, inner) :: Nil) ::
        args.map(substitute(_, env)))
    case RList(items) => RList(items.map(substitute(_, env)))
    case RVec(items) => RVec(items.map(substitute(_, env)))
    case RDict(pairs) => RDict(pairs.map { case (k, v) => k -> substitute(v, env) })
    case other => other
  }

  private def apply1(fn: String, cs: List[Column], raw: List[RExpr]): Column =
    (fn, cs) match {
      case ("+", Seq(a, b)) => a + b
      case ("-", Seq(a, b)) => a - b
      case ("-", Seq(a)) => negate(a)
      case ("*", Seq(a, b)) => a * b
      case ("/", Seq(a, b)) => RF.euclidDiv(a, b)
      case ("%", Seq(a, b)) => RF.euclidMod(a, b)
      case ("div", Seq(a, b)) => a / b
      // docs use both (= a b) and (== a b) for equality
      case ("==" | "=", Seq(a, b)) => a === b
      case ("!=", Seq(a, b)) => a =!= b
      case ("<", Seq(a, b)) => a < b
      case (">", Seq(a, b)) => a > b
      case ("<=", Seq(a, b)) => a <= b
      case (">=", Seq(a, b)) => a >= b
      case ("and", args) => args.reduce(_ && _)
      case ("or", args) => args.reduce(_ || _)
      case ("not", Seq(a)) => !a
      case ("nil?", Seq(a)) => a.isNull
      case ("sum", Seq(a)) => sum(a)
      case ("avg", Seq(a)) => avg(a)
      case ("min", Seq(a)) => min(a)
      case ("max", Seq(a)) => max(a)
      // reference count (misc.c ray_count → aggr_count) increments
      // unconditionally — it counts null elements too, so map to group size
      // rather than Spark's null-skipping count(col).
      case ("count", Seq(_)) => count(lit(1))
      case ("first", Seq(a)) => first(a)
      case ("last", Seq(a)) => last(a)
      case ("med", Seq(a)) => RF.med(a)
      case ("dev", Seq(a)) => RF.dev(a)
      case ("distinct", Seq(a)) => countDistinct(a)
      case ("neg", Seq(a)) => negate(a)
      case ("abs", Seq(a)) => abs(a)
      case ("ceil", Seq(a)) => ceil(a)
      case ("floor", Seq(a)) => floor(a)
      case ("round", Seq(a)) => round(a)
      case ("xbar", Seq(w, x)) => RF.xbar(w, x)
      case ("within", Seq(x, bounds)) => raw(1) match {
        case RVec(List(lo, hi)) => RF.within(cs.head, toColumn(lo), toColumn(hi))
        case _ => throw new IllegalArgumentException("within needs [lo hi]")
      }
      case ("like", Seq(a, _)) => raw(1) match {
        case RStr(p) => RF.likeGlob(a, p)
        case _ => throw new IllegalArgumentException("like needs a pattern string")
      }
      case ("in", Seq(a, _)) => raw(1) match {
        case RVec(items) => a.isin(items.map {
          case RNum(_, true, l) => l: Any
          case RNum(v, false, _) => v: Any
          case RStr(s) => s: Any
          case RQuote(s) => s: Any
          case x => throw new IllegalArgumentException(s"bad in element $x")
        }: _*)
        case _ => throw new IllegalArgumentException("in needs a vector")
      }
      case _ => throw new IllegalArgumentException(
        s"unknown function $fn/${cs.length}")
    }
}
