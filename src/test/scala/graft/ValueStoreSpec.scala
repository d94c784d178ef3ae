package graft

import graft.rayfall.Rayfall
import graft.rayfall.Rayfall._

/** Generic `(set "path" v)` / `(get "path")` of NON-TABLE values
  * (reference `ray_set`/`ray_get` of any object, `core/binary.c:317`,
  * `core/unary.c:48-137`), and the `(timeit form)` shape
  * (`core/chrono.c:147`). Vectors persist as indexed parquet — a lazy
  * script vector writes distributed and comes back lazy. */
class ValueStoreSpec extends SparkSpec {

  private def sv(src: String): RVal = Rayfall.scriptValue(spark, src)
  private def tmp(name: String): String = {
    val p = s"/tmp/graft_vstore_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    p
  }

  test("vector round-trips through indexed parquet") {
    val p = tmp("vec")
    assert(sv(s"""(set "$p" [5 3 8 1]) (get "$p")""") ==
      VVec(Vector(5L, 3L, 8L, 1L)))
    assert(new java.io.File(p).isDirectory) // parquet dir, not a text blob
    assert(sv(s"""(set "$p" [1.5 2.5]) (get "$p")""") ==
      VVec(Vector(1.5, 2.5)))
    assert(sv(s"""(set "$p" ['a 'b 'c]) (get "$p")""") ==
      VVec(Vector("a", "b", "c")))
  }

  test("large lazy vector persists distributed and loads lazy") {
    val p = tmp("lazy")
    // (til 100000) is a VRange: the write is a spark.range scan, no
    // driver vector at any point; the read returns a lazy column view
    val got = sv(s"""(set "$p" (til 100000)) (get "$p")""")
    assert(got.isInstanceOf[VColView])
    assert(sv(s"""(count (get "$p"))""") == VAtom(100000L))
    assert(sv(s"""(sum (get "$p"))""") == VAtom(100000L * 99999L / 2))
  }

  test("dict (incl. nested) round-trips through s-expr text") {
    val p = tmp("dict")
    sv(s"""(set "$p" (dict [a b] (list 1 (dict [x y] [10 20]))))""")
    assert(!new java.io.File(p).isDirectory)
    assert(sv(s"""(at (at (get "$p") 'b) 'x)""") == VAtom(10L))
    assert(sv(s"""(key (get "$p"))""") == VVec(Vector("a", "b")))
  }

  test("atoms and heterogeneous lists round-trip") {
    val p = tmp("atom")
    assert(sv(s"""(set "$p" 42) (get "$p")""") == VAtom(42L))
    assert(sv(s"""(set "$p" "two words") (get "$p")""") == VAtom("two words"))
    assert(sv(s"""(set "$p" 2024.03.20) (get "$p")""") ==
      VAtom(java.time.LocalDate.of(2024, 3, 20)))
    assert(sv(s"""(set "$p" (list 1 "a" 2.5)) (get "$p")""") ==
      VVec(Vector(1L, "a", 2.5)))
  }

  test("lambda round-trips and applies (reference sets lambdas to paths)") {
    val p = tmp("fn")
    assert(sv(s"""(set "$p" (fn [x] (* x x)))
                 |(set f (get "$p"))
                 |(f 7)""".stripMargin) == VAtom(49L))
  }

  test("table round-trips as splayed parquet through the same forms") {
    val p = tmp("tab")
    val df = Rayfall.script(spark,
      s"""(set t (table [k v] (list [1 2 3] [10 20 30])))
         |(set "$p" t)
         |(get "$p")""".stripMargin)
    assert(df.orderBy("k").collect().map(_.getLong(1)).toSeq ==
      Seq(10L, 20L, 30L))
  }

  test("script write-csv writes ONE file that read-csv round-trips " +
      "(core/io.c:946)") {
    val p = tmp("wcsv") + ".csv"
    val df = Rayfall.script(spark,
      s"""(set t (table [id sym price d] (list [3 1 2] [a b c]
         | [1.5 2.5 3.5] [2024.01.02 2024.01.03 2024.01.04])))
         |(write-csv "$p" t)
         |(read-csv [I64 SYMBOL F64 DATE] "$p")""".stripMargin
        .replace("\n", " "))
    assert(new java.io.File(p).isFile) // one file at the exact path
    val rows = df.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(_.getString(1)).toSeq == Seq("b", "c", "a"))
    assert(rows.map(_.getDouble(2)).toSeq == Seq(2.5, 3.5, 1.5))
    assert(rows.map(_.get(3).toString).toSeq ==
      Seq("2024-01-03", "2024-01-04", "2024-01-02"))
  }

  test("script set-parted writes the bare-date layout get-parted reads " +
      "(one partitionBy job)") {
    val root = tmp("parted")
    val df = Rayfall.script(spark,
      s"""(set t (table [date k v] (list
         | [2024.01.01 2024.01.01 2024.01.02 2024.01.03]
         | [1 2 3 4] [10 20 30 40])))
         |(set-parted "$root" 'trades t)
         |(get-parted "$root" 'trades)""".stripMargin.replace("\n", " "))
    // the reference layout: root/yyyy.mm.dd/<tab>, date virtualized back
    for (d <- Seq("2024.01.01", "2024.01.02", "2024.01.03"))
      assert(new java.io.File(s"$root/$d/trades").isDirectory, d)
    assert(!new java.io.File(s"$root/.staging-trades").exists)
    val rows = df.orderBy("k").collect()
    val (vi, di) = (df.columns.indexOf("v"), df.columns.indexOf("date"))
    assert(rows.map(_.getLong(vi)).toSeq == Seq(10L, 20L, 30L, 40L))
    assert(rows.map(_.get(di).toString).toSeq ==
      Seq("2024-01-01", "2024-01-01", "2024-01-02", "2024-01-03"))
    // overwriting one partition replaces it, leaves the others
    val df2 = Rayfall.script(spark,
      s"""(set t2 (table [date k v] (list [2024.01.02] [9] [99])))
         |(set-parted "$root" 'trades t2)
         |(get-parted "$root" 'trades)""".stripMargin.replace("\n", " "))
    val rows2 = df2.orderBy("k").collect()
    assert(rows2.map(r => r.getLong(df2.columns.indexOf("v"))).toSeq ==
      Seq(10L, 20L, 40L, 99L))
  }

  test("(timeit form) returns elapsed ms >= 0 and evaluates the form") {
    val got = sv("(set acc 1) (set ms (timeit (set acc (+ acc 41)))) " +
      "(list acc ms)")
    got match {
      case VVec(Vector(acc, ms: java.lang.Long)) =>
        assert(acc == 42L) // the timed form's side effect happened
        assert(ms >= 0L)
      case x => fail(s"bad timeit shape $x")
    }
  }
}
