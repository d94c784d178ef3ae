package graft

import graft.rayfall.Rayfall
import graft.rayfall.Rayfall._

/** Golden sweep of the reference's own language assertions
  * (`/root/reference/tests/lang.c`, ~3.6k asserts in ~40 groups), lifted
  * group-by-group through the script interpreter (`Rayfall.scriptValue`)
  * with the cited line ranges. Translated to this engine's conventions
  * (SURVEY §1.2): sentinel nulls are SQL NULLs, TIME = millis long,
  * symbols and strings share one runtime repr, DATE = LocalDate.
  *
  * Documented divergences (each intentional):
  *  - U8/hex vectors and C8-with-NUL cases are untested — no byte/char
  *    atom types here (strings are the C8 vector analog);
  *  - (distinct [1i 0Ni 1i]) keeps the null (SQL semantics; the
  *    reference drops it);
  *  - (rand n b) is deterministic hash-based (count/range asserts hold);
  *  - guids are deterministic md5 (shape/distinctness asserts hold).
  */
class LangSpec extends SparkSpec {

  private def sv(src: String): RVal = Rayfall.scriptValue(spark, src)
  private def atom(src: String): Any = sv(src) match {
    case VAtom(x) => x
    case x => fail(s"expected atom from $src, got $x")
  }
  private def vecOf(src: String): Vector[Any] = sv(src) match {
    case VVec(xs) => xs
    case x => fail(s"expected vector from $src, got $x")
  }
  private def ms(h: Int, m: Int, s: Int, f: Int = 0): Long =
    ((h * 60L + m) * 60 + s) * 1000 + f
  private def d(s: String): java.time.LocalDate = java.time.LocalDate.parse(s)

  test("map/pmap square and aggregate bodies (lang.c:25-36)") {
    assert(vecOf("(map (fn [x] (* x x)) [1 2 3 4 5])") ==
      Vector(1L, 4L, 9L, 16L, 25L))
    assert(vecOf("(pmap (fn [x] (* x x)) [1 2 3 4 5])") ==
      Vector(1L, 4L, 9L, 16L, 25L))
    assert(vecOf("(map (fn [x] (sum (til 100))) (til 5))") ==
      Vector.fill(5)(4950L))
  }

  test("basic atoms and literals (lang.c:38-74)") {
    assert(atom("1") == 1L)
    assert(atom("1.1") == 1.1)
    assert(atom("true") == true && atom("false") == false)
    assert(atom("null") == null)
    assert(atom("(as 'i64 \" 1\")") == 1L)
    assert(atom("(as 'f64 \" 1.000000123555555555555555555555555e+01\")")
      .asInstanceOf[Double] > 9.99)
    assert(vecOf("(enlist 1 2 3)") == Vector(1L, 2L, 3L))
    assert(atom("'asd") == "asd")
  }

  test("null propagation in arithmetic (lang.c:77-90)") {
    assert(atom("(+ 0Nl 0Nl)") == null)
    assert(atom("(+ 0 0Nl)") == null)
    assert(atom("(+ 0Nf 5)") == null)
    assert(atom("(+ 0Ni -10.00)") == null)
    assert(vecOf("(+ 0Nf [-0.00])") == Vector(null))
  }

  test("scalar/vector arithmetic with dates and TIME (lang.c:92-171)") {
    assert(atom("(+ 3i 5i)") == 8L)
    assert(atom("(+ 3i 5.2)") == 8.2)
    assert(atom("(+ 3i 2024.03.20)") == d("2024-03-23"))
    assert(atom("(+ -3 2024.03.20)") == d("2024-03-17"))
    assert(atom("(+ 3i 20:15:07.000)") == ms(20, 15, 7, 3))
    assert(vecOf("(+ 2i [3 5])") == Vector(5L, 7L))
    assert(vecOf("(+ 2i [3.1 5.2])") == Vector(5.1, 7.2))
    assert(vecOf("(+ 5i [2024.03.20 2023.02.07])") ==
      Vector(d("2024-03-25"), d("2023-02-12")))
    assert(vecOf("(+ 60000i [20:15:07.000 15:41:47.087])") ==
      Vector(ms(20, 16, 7), ms(15, 42, 47, 87)))
  }

  test("Euclidean division and div-by-zero null (lang.c:426-437, 1742-1748, 5249)") {
    assert(atom("(/ -5 -2)") == 2L)
    assert(atom("(/ -5 6)") == -1L)
    assert(atom("(/ 1 0)") == null)
    assert(atom("(% 10 0)") == null)
    assert(atom("(% 11 5)") == 1L)
  }

  test("take: cyclic, negative, strings (lang.c:2629-2799)") {
    assert(vecOf("(take 1 2)") == Vector(1L, 1L))
    assert(vecOf("(take [0 1 2 3] 3)") == Vector(0L, 1L, 2L))
    assert(vecOf("(take [0 1 2 3] -3)") == Vector(1L, 2L, 3L))
    assert(vecOf("(take [0 1 2 3] 5)") == Vector(0L, 1L, 2L, 3L, 0L))
    assert(vecOf("(take [0 1 2 3] -5)") == Vector(3L, 0L, 1L, 2L, 3L))
    assert(vecOf("(take true 2)") == Vector(true, true))
    assert(vecOf("(take [false false true true] -3)") ==
      Vector(false, true, true))
    assert(atom("(take \"abcd\" 3)") == "abc")
    assert(atom("(take \"abcd\" -3)") == "bcd")
    assert(atom("(take \"abcd\" 5)") == "abcda")
    assert(atom("(take \"abcd\" -5)") == "dabcd")
    assert(atom("(take 'a' 2)") == "aa")
    assert(vecOf("(take 2025.05.01 2)") ==
      Vector(d("2025-05-01"), d("2025-05-01")))
  }

  test("split: strings by delimiter, vectors at indices (lang.c:2800-2854)") {
    assert(vecOf("(split \"hello,world\" \",\")") == Vector("hello", "world"))
    assert(vecOf("(split \"a,b,c\" \",\")") == Vector("a", "b", "c"))
    assert(vecOf("(split \"\" \",\")") == Vector(""))
    assert(vecOf("(split \",a,\" \",\")") == Vector("", "a", ""))
    assert(vecOf("(split \"a--b--c\" \"--\")") == Vector("a", "b", "c"))
    assert(vecOf("(split [1 2 3 4 5] [0 2 4])") ==
      Vector(VVec(Vector(1L, 2L)), VVec(Vector(3L, 4L)), VVec(Vector(5L))))
    assert(vecOf("(split [1 2 3 4 5] [0 3])") ==
      Vector(VVec(Vector(1L, 2L, 3L)), VVec(Vector(4L, 5L))))
    assert(vecOf("(split \"hello\" [0 2 4])") == Vector("he", "ll", "o"))
    assert(atom("(split [] [])") == null)
    assert(atom("(split [1 2 3] [])") == null)
  }

  test("table column access + grouped sum through select (lang.c:2855-2901)") {
    val pre = "(set t (table [sym price volume] " +
      "(list [apl vod god] [102 99 203] [500 400 900])))\n"
    assert(atom(pre + "(sum (at t 'price))") == 404L)
    assert(atom(pre + "(count (at t 'volume))") == 3L)
    val df = Rayfall.script(spark,
      "(set t (table [Group Value] (list [a a b b] [10 20 30 40])))\n" +
        "(select {Total: (sum Value) from: t by: Group})")
    assert(df.orderBy("Group").collect().map(r =>
      (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 30L), ("b", 70L)))
  }

  test("insert: immediate leaves the source unchanged, quoted rebinds (lang.c:2902-2965)") {
    val pre = "(set t (table [ID Name Value] " +
      "(list [1 2] [alice bob] [10.0 20.0])))\n"
    // immediate: new table has the row, t does not
    assert(atom(pre +
      "(count (insert t (list 3 'charlie 30.0)))") == 3L)
    assert(atom(pre +
      "(insert t (list 3 'charlie 30.0)) (count t)") == 2L)
    // quoted: in-place rebind
    assert(atom(pre +
      "(insert 't (list 3 'charlie 30.0)) (count t)") == 3L)
    // dict source with reordered columns
    assert(atom(pre +
      "(count (insert t (dict [Value ID Name] (list 30.0 3 'charlie))))") == 3L)
  }

  test("distinct keeps first occurrence (lang.c:3720-3737)") {
    assert(vecOf("(distinct [1 1 1 2 3 4 2 3 4 2 3 4])") ==
      Vector(1L, 2L, 3L, 4L))
    assert(vecOf("(distinct ['a 'b 'ab 'aa 'a 'aa])") ==
      Vector("a", "b", "ab", "aa"))
    assert(vecOf("(distinct [2012.12.12 2012.12.12])") ==
      Vector(d("2012-12-12")))
    assert(vecOf("(distinct [10:00:00.000 20:10:10.500 10:00:00.000])") ==
      Vector(ms(10, 0, 0), ms(20, 10, 10, 500)))
    assert(vecOf("(distinct [true true])") == Vector(true))
    assert(atom("(set l (guid 2)) (set l (concat l l)) (count (distinct l))")
      == 2L)
  }

  test("concat: atoms, vectors, strings, dates (lang.c:3739-3826)") {
    assert(vecOf("(concat 1 2)") == Vector(1L, 2L))
    assert(vecOf("(concat [1] 2)") == Vector(1L, 2L))
    assert(vecOf("(concat 1 [2])") == Vector(1L, 2L))
    assert(vecOf("(concat [1] [2])") == Vector(1L, 2L))
    assert(vecOf("(concat 'a 'b)") == Vector("a", "b"))
    assert(vecOf("(concat true false)") == Vector(true, false))
    assert(vecOf("(concat 2020.10.10 2020.10.12)") ==
      Vector(d("2020-10-10"), d("2020-10-12")))
    assert(atom("(concat \"te\" \"st\")") == "test")
    assert(atom("(concat 't' 's')") == "ts")
    assert(atom("(concat 't' \"est\")") == "test")
    assert(atom("(concat \"tes\" 't')") == "test")
    assert(vecOf("(concat 1.0 2.0)") == Vector(1.0, 2.0))
  }

  test("raze flattens one level (lang.c:3829-3839)") {
    assert(vecOf("(raze (list [1 2] [3 4]))") == Vector(1L, 2L, 3L, 4L))
    assert(vecOf("(raze (list [1 2] (list 3 4)))") == Vector(1L, 2L, 3L, 4L))
    assert(vecOf("(raze (list [1 2 3]))") == Vector(1L, 2L, 3L))
    assert(vecOf("(raze (list))") == Vector())
    assert(atom("(raze 42)") == 42L)
  }

  test("filter by boolean mask, incl. tables (lang.c:3841-3863)") {
    assert(vecOf("(filter [1 0Nl 2] [true true true])") ==
      Vector(1L, null, 2L))
    assert(vecOf("(filter ['a 'b 'c 'dd] [true false false true])") ==
      Vector("a", "dd"))
    assert(vecOf("(filter [1.0 2.0 3.0] [true false true])") ==
      Vector(1.0, 3.0))
    intercept[IllegalArgumentException](sv("(filter [1 2 3] [true true])"))
    // table × mask → first row dict {a:2 b:'b} (lang.c:3860)
    sv("(first (filter (table [a b] (list [1 2 3] (list 'a 'b 'c))) " +
      "[false true true]))") match {
      case VDict(ks, vs) =>
        assert(ks == Vector("a", "b") && vs == Vector(2L, "b"))
      case x => fail(s"expected row dict, got $x")
    }
  }

  test("in: membership over atoms, vectors, strings, nulls (lang.c:3865-3931)") {
    assert(atom("(in 2 2)") == true)
    assert(atom("(in false [true false])") == true)
    assert(atom("(in 1 [0Nl])") == false)
    assert(atom("(in 'a ['a 'b 'c 'dd])") == true)
    assert(atom("(in 1.0 [1.0 2.0 3.0])") == true)
    assert(atom("(in 3 [1i 0Ni 2i])") == false)
    assert(vecOf("(in [true false] [false])") == Vector(false, true))
    assert(atom("(in 'e' \"test\")") == true)
    assert(vecOf("(in \"asd\" \"asd\")") == Vector(true, true, true))
    assert(vecOf("(in \"asd\" 'a')") == Vector(true, false, false))
    assert(vecOf("(in \"test\" \"post\")") ==
      Vector(true, false, true, true))
    assert(vecOf("(in [3 2 5 0Nl] [1 0Nl 2 3])") ==
      Vector(true, true, false, true))
    assert(vecOf("(in [0 1 0Nl] 0Nl)") == Vector(false, false, true))
  }

  test("except drops members, keeps duplicates of the rest (lang.c:3934-3967)") {
    assert(vecOf("(except [1 2 3 4 5] [2 4])") == Vector(1L, 3L, 5L))
    assert(vecOf("(except ['a 'b 'c] ['a 'c])") == Vector("b"))
    assert(vecOf("(except [] [1 2 3])") == Vector())
    assert(vecOf("(except [1 2 3] [])") == Vector(1L, 2L, 3L))
    assert(vecOf("(except [1 2 3 4 5] 3)") == Vector(1L, 2L, 4L, 5L))
    assert(vecOf("(except [1 1 2 2 3] [1 3])") == Vector(2L, 2L))
  }

  test("or / and: atoms, vectors, 3-arg, broadcast (lang.c:3970-3992)") {
    assert(atom("(or true false)") == true)
    assert(atom("(and true false)") == false)
    assert(vecOf("(or [true false true] [false true false])") ==
      Vector(true, true, true))
    assert(vecOf("(and [true false true] [false true false])") ==
      Vector(false, false, false))
    assert(vecOf("(or [true false true] [false true false] [true false true])")
      == Vector(true, true, true))
    assert(vecOf("(and [true false true] true)") ==
      Vector(true, false, true))
  }

  test("bin / binr step search (lang.c:3994-4002)") {
    assert(atom("(bin [1 2 3 4 5] 3)") == 2L)
    assert(atom("(bin [0 2 4 6 8 10] 5)") == 2L)
    assert(vecOf("(bin [0 2 4 6 8 10] [-10 0 4 5 6 20])") ==
      Vector(-1L, 0L, 2L, 2L, 3L, 5L))
    assert(vecOf("(bin [0 1 1 2] [0 1 2])") == Vector(0L, 2L, 3L))
    assert(vecOf("(binr [0 1 1 2] [0 1 2])") == Vector(0L, 1L, 3L))
  }

  test("aggregations: sum/avg/min/max/count/first/last/med/dev (lang.c:4065-4121)") {
    assert(atom("(sum [1 2 3 4 5])") == 15L)
    assert(atom("(sum [1.0 2.0 3.0])") == 6.0)
    assert(atom("(sum [])") == 0L)
    assert(atom("(sum 5)") == 5L)
    assert(atom("(avg [1 2 3 4 5])") == 3.0)
    assert(atom("(avg [2 4 6 8])") == 5.0)
    assert(atom("(avg 10)") == 10.0)
    assert(atom("(min [5 2 8 1 9])") == 1L)
    assert(atom("(min [-5 -2 -8])") == -8L)
    assert(atom("(max [5 2 8 1 9])") == 9L)
    assert(atom("(count [1 2 3 4 5])") == 5L)
    assert(atom("(count \"hello\")") == 5L)
    assert(atom("(count (dict [a b c] [1 2 3]))") == 3L)
    assert(atom("(count (table [a b] (list [1 2 3] [4 5 6])))") == 3L)
    assert(atom("(count 5)") == 1L)
    assert(atom("(first [1 2 3 4 5])") == 1L)
    assert(atom("(first \"hello\")") == "h")
    assert(atom("(last [1 2 3 4 5])") == 5L)
    assert(atom("(last \"hello\")") == "o")
    assert(atom("(med [1 2 3 4 5])") == 3.0)
    assert(atom("(med [1 2 3 4])") == 2.5)
    assert(atom("(med [5 1 3 2 4])") == 3.0)
    assert(atom("(dev [1 1 1 1])") == 0.0)
    assert(math.abs(atom("(dev [1 2 3 4 5])").asInstanceOf[Double] -
      math.sqrt(2.0)) < 0.001)
    // null-skipping (lang.c:2455-2501)
    assert(atom("(sum [1 2 3 0Nl 4])") == 10L)
    assert(atom("(avg [-24 12 6 0Nl])") == -2.0)
    assert(atom("(avg [0Ni])") == null)
    assert(atom("(min [0Ni -24i 12i 6i])") == -24L)
  }

  test("first/last on tables are row dicts (lang.c:4102-4112)") {
    sv("(first (table [a b] (list [1 2 3] [4 5 6])))") match {
      case VDict(ks, vs) => assert(ks == Vector("a", "b") && vs == Vector(1L, 4L))
      case x => fail(s"bad first $x")
    }
    sv("(last (table [a b] (list [1 2 3] [4 5 6])))") match {
      case VDict(ks, vs) => assert(vs == Vector(3L, 6L))
      case x => fail(s"bad last $x")
    }
    assert(atom("(at (first (table [a b] (list [1 2] [3 4]))) 'a)") == 1L)
  }

  test("grouped aggregates through select (lang.c:4124-4146, 5040-5057)") {
    val pre = "(set t (table [Group Value] (list [a a b b] [10 20 30 40])))\n"
    def rows(q: String) = Rayfall.script(spark, pre + q).orderBy("Group").collect()
    val s = rows("(select {Sum: (sum Value) from: t by: Group})")
    assert(s.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 30L), ("b", 70L)))
    val a = rows("(select {Avg: (avg Value) from: t by: Group})")
    assert(a.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 15.0), ("b", 35.0)))
    val mm = rows("(select {Min: (min Value) Max: (max Value) from: t by: Group})")
    assert(mm.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("a", 10L, 20L), ("b", 30L, 40L)))
  }

  test("temporal arithmetic (lang.c:4388-4412)") {
    assert(atom("(+ 2024.01.01 1)") == d("2024-01-02"))
    assert(atom("(+ 2024.01.01 31)") == d("2024-02-01"))
    assert(atom("(- 2024.01.10 5)") == d("2024-01-05"))
    assert(atom("(- 2024.02.01 2024.01.01)") == 31L)
    assert(atom("(+ 10:00:00.000 1000)") == ms(10, 0, 1))
    assert(atom("(+ 10:00:00.000 3600000)") == ms(11, 0, 0))
    assert(atom("(- 10:00:01.000 10:00:00.000)") == ms(0, 0, 1))
    assert(vecOf("(+ [2024.01.01 2024.01.02] 1)") ==
      Vector(d("2024-01-02"), d("2024-01-03")))
    assert(vecOf("(- [2024.01.10 2024.01.20] [2024.01.01 2024.01.10])") ==
      Vector(9L, 10L))
  }

  test("map-left / map-right with operators (lang.c:4415-4425)") {
    assert(vecOf("(map-left - 10 [1 2 3])") == Vector(9L, 8L, 7L))
    assert(vecOf("(map-left / 100 [2 4 5])") == Vector(50L, 25L, 20L))
    assert(vecOf("(map-right - [10 20 30] 5)") == Vector(5L, 15L, 25L))
    assert(vecOf("(map-right / [10 20 30] 2)") == Vector(5L, 10L, 15L))
  }

  test("conditionals: nested, expressions, side effects (lang.c:4428-4453)") {
    assert(atom("(if true 1 2)") == 1L)
    assert(atom("(if false 1 2)") == 2L)
    assert(atom("(if true (if false 1 2) 3)") == 2L)
    assert(atom("(if (> 5 3) (+ 1 1) (- 1 1))") == 2L)
    assert(atom("(if (== 1 1) \"yes\" \"no\")") == "yes")
    assert(atom("(set y 0) (if true (set y 10) (set y 20)) y") == 10L)
    assert(atom("(set y 0) (if false (set y 10) (set y 20)) y") == 20L)
    assert(atom("(set x 5) (if (< x 0) 'neg (if (== x 0) 'zero 'pos))") == "pos")
    assert(atom("(set x -3) (if (< x 0) 'neg (if (== x 0) 'zero 'pos))") == "neg")
    assert(atom("(set x 0) (if (< x 0) 'neg (if (== x 0) 'zero 'pos))") == "zero")
  }

  test("dict creation, access, missing key, nesting (lang.c:4456-4486)") {
    sv("(dict [a b c] [1 2 3])") match {
      case VDict(ks, vs) =>
        assert(ks == Vector("a", "b", "c") && vs == Vector(1L, 2L, 3L))
      case x => fail(s"bad dict $x")
    }
    assert(atom("(set d (dict [a b c] [1 2 3])) (at d 'a)") == 1L)
    assert(atom("(set d (dict [a b c] [1 2 3])) (at d 'd)") == null)
    assert(vecOf("(key (dict [a b c] [1 2 3]))") == Vector("a", "b", "c"))
    assert(vecOf("(value (dict [a b c] [1 2 3]))") == Vector(1L, 2L, 3L))
    assert(atom("(set d (dict [a b] (list 1 (dict [x y] [10 20])))) " +
      "(at (at d 'b) 'x)") == 10L)
  }

  test("list ops: at-indexing, til, enlist (lang.c:4489-4525)") {
    assert(atom("(at [10 20 30 40] 0)") == 10L)
    assert(atom("(at [10 20 30 40] 2)") == 30L)
    assert(vecOf("(at [10 20 30 40] [0 2])") == Vector(10L, 30L))
    assert(atom("(at \"hello\" 1)") == "e")
    assert(atom("(at \"hello\" [0 4])") == "ho")
    assert(vecOf("(til 5)") == Vector(0L, 1L, 2L, 3L, 4L))
    assert(vecOf("(til 0)") == Vector())
    assert(vecOf("(enlist 5)") == Vector(5L))
    assert(vecOf("(take [1 2 3] 7)") == Vector(1L, 2L, 3L, 1L, 2L, 3L, 1L))
    sv("(at (table [a b] (list [1 2 3] [4 5 6])) 0)") match {
      case VDict(ks, vs) => assert(ks == Vector("a", "b") && vs == Vector(1L, 4L))
      case x => fail(s"bad table at $x")
    }
  }

  test("alter set/concat on vectors (lang.c:4528-4536)") {
    assert(atom("(set v [1 2 3 4 5]) (alter 'v set 0 100) (first v)") == 100L)
    assert(vecOf("(set v [1 2 3]) (alter 'v concat 4) v") ==
      Vector(1L, 2L, 3L, 4L))
  }

  test("null handling: nil?, propagation, equality, tables (lang.c:4539-4563)") {
    assert(atom("(nil? null)") == true)
    assert(atom("(nil? 0Nl)") == true)
    assert(atom("(nil? 0)") == false)
    assert(atom("(nil? \"\")") == false)
    assert(atom("(+ 1 0Nl)") == null)
    assert(atom("(* 5 0Nl)") == null)
    assert(vecOf("(+ [1 2 3] [0Nl 2 3])") == Vector(null, 4L, 6L))
    assert(atom("(== 0Nl 0Nl)") == true)
    assert(atom("(set t (table [a b] (list [1 0Nl 3] [4 5 6]))) " +
      "(at (at t 'a) 1)") == null)
  }

  test("set ops: union, sect, within (lang.c:4566-4587)") {
    assert(vecOf("(union [1 2 3] [3 4 5])") == Vector(1L, 2L, 3L, 4L, 5L))
    assert(vecOf("(union [1 2 3] [1 2 3])") == Vector(1L, 2L, 3L))
    assert(vecOf("(union [] [1 2 3])") == Vector(1L, 2L, 3L))
    assert(vecOf("(union ['a 'b] ['b 'c])") == Vector("a", "b", "c"))
    assert(vecOf("(sect [1 2 3 4] [2 4 6])") == Vector(2L, 4L))
    assert(vecOf("(sect [1 2 3] [4 5 6])") == Vector())
    assert(vecOf("(sect ['a 'b 'c] ['b 'c 'd])") == Vector("b", "c"))
    assert(vecOf("(within [5] [1 10])") == Vector(true))
    assert(vecOf("(within [5 0 15] [1 10])") ==
      Vector(true, false, false))
  }

  test("casts (lang.c:4590-4620, 44-47)") {
    assert(atom("(as 'b8 1h)") == true)
    assert(atom("(as 'b8 0h)") == false)
    assert(atom("(as 'i64 \" 42\")") == 42L)
    assert(atom("(as 'f64 2)") == 2.0)
    assert(atom("(as 'symbol 12)") == "12")
    assert(vecOf("(as 'f64 [1 2])") == Vector(1.0, 2.0))
  }

  test("lambdas: immediate, stored, recursion (lang.c:4995-5025)") {
    assert(atom("((fn [x] (+ x 1)) 5)") == 6L)
    assert(atom("((fn [x y] (+ x y)) 3 4)") == 7L)
    assert(atom("((fn [] 42))") == 42L)
    assert(atom("((fn [a b c] (+ a (+ b c))) 1 2 3)") == 6L)
    assert(atom("(set f (fn [x] (* x x))) (f 5)") == 25L)
    assert(vecOf("(map (fn [x] (* x 2)) [1 2 3 4 5])") ==
      Vector(2L, 4L, 6L, 8L, 10L))
    assert(vecOf("(filter [1 2 3 4 5 6] (map (fn [x] (> x 3)) [1 2 3 4 5 6]))")
      == Vector(4L, 5L, 6L))
    assert(atom("((fn [x] (if (> x 0) 'pos 'neg)) 5)") == "pos")
    assert(atom("(set factorial (fn [n] (if (<= n 1) 1 " +
      "(* n (factorial (- n 1)))))) (factorial 5)") == 120L)
  }

  test("group yields an index dict in first-occurrence order (lang.c:5027-5100)") {
    sv("(group ['a 'a 'b 'b 'c])") match {
      case VDict(ks, vs) =>
        assert(ks == Vector("a", "b", "c"))
        assert(vs == Vector(VVec(Vector(0L, 1L)), VVec(Vector(2L, 3L)),
          VVec(Vector(4L))))
      case x => fail(s"bad group $x")
    }
    assert(sv("(at (group [1 1 2 2 3]) '1)") == VVec(Vector(0L, 1L)))
    assert(atom("(count (group []))") == 0L)
    sv("(group (list \"apple\" \"banana\" \"apple\" \"cherry\" \"banana\"))") match {
      case VDict(ks, vs) =>
        assert(ks == Vector("apple", "banana", "cherry"))
        assert(vs(0) == VVec(Vector(0L, 2L)))
      case x => fail(s"bad string group $x")
    }
    // update-with-by rebinding (lang.c:5060-5066)
    val t = Rayfall.script(spark,
      "(set t (table [Group Value] (list [a a b b] [10 20 30 40])))\n" +
        "(update {from: 't GroupSum: (sum Value) by: Group})\nt")
    assert(t.orderBy("Value").collect().map(_.getLong(2)).toSeq ==
      Seq(30L, 30L, 70L, 70L))
  }

  test("find: index-of with null misses (lang.c:5103-5135)") {
    assert(atom("(find [10 20 30 40] 30)") == 2L)
    assert(atom("(find [10 20 30 40] 50)") == null)
    assert(atom("(find [10 20 30 40] 10)") == 0L)
    assert(atom("(find ['a 'b 'c] 'b)") == 1L)
    assert(atom("(find \"hello\" 'l')") == 2L)
    assert(vecOf("(find [10 20 30 40] [20 40])") == Vector(1L, 3L))
    assert(vecOf("(find [1 2 3] [4 2 5])") == Vector(null, 1L, null))
    assert(atom("(find [] 1)") == null)
    assert(vecOf("(find [] [1 2 3])") == Vector())
    assert(atom("(find \"\" 'a')") == null)
    assert(atom("(find [1000000000 2000000000 3000000000] 2000000000)") == 1L)
    assert(atom("(find ['apple 'banana 'cherry] 'banana)") == 1L)
  }

  test("rand: count and range (lang.c:5138-5147; deterministic here)") {
    assert(atom("(count (rand 10 100))") == 10L)
    assert(atom("(and (>= (min (rand 100 10)) 0) (< (max (rand 100 10)) 10))")
      == true)
    assert(vecOf("(rand 0 10)") == Vector())
  }

  test("neg / not / where (lang.c:5150-5169)") {
    assert(atom("(neg 5)") == -5L)
    assert(atom("(neg -5)") == 5L)
    assert(vecOf("(neg [1 -2 3 -4])") == Vector(-1L, 2L, -3L, 4L))
    assert(atom("(neg 5.0)") == -5.0)
    assert(atom("(not true)") == false)
    assert(vecOf("(not [true false true])") == Vector(false, true, false))
    assert(vecOf("(where [true false true false true])") ==
      Vector(0L, 2L, 4L))
    assert(vecOf("(where [false false false])") == Vector())
    assert(vecOf("(where (> [1 2 3 4 5] 3))") == Vector(3L, 4L))
  }

  test("string ops: concat/count/at/take/first/last (lang.c:5172-5195)") {
    assert(atom("(concat \"hel\" \"lo\")") == "hello")
    assert(atom("(concat \"\" \"test\")") == "test")
    assert(atom("(count \"hello\")") == 5L)
    assert(atom("(count \"\")") == 0L)
    assert(atom("(at \"hello\" 0)") == "h")
    assert(atom("(at \"hello\" 4)") == "o")
    assert(atom("(take \"hello\" 3)") == "hel")
    assert(atom("(take \"hello\" -2)") == "lo")
    assert(atom("(first \"hello\")") == "h")
    assert(atom("(last \"hello\")") == "o")
  }

  test("do evaluates in order, returns last (lang.c:5198-5204)") {
    assert(atom("(do (set x 1) (set y 2) (+ x y))") == 3L)
    assert(atom("(do 1 2 3)") == 3L)
  }

  test("try/raise (lang.c:5207-5219)") {
    assert(atom("(try (+ 1 2) (fn [e] 0))") == 3L)
    assert(atom("(try (raise \"error\") (fn [e] 99))") == 99L)
    assert(atom("(try (try (raise \"inner\") (fn [e] (raise \"outer\"))) " +
      "(fn [e] 42))") == 42L)
    intercept[Rayfall.RayfallError](sv("(raise \"boom\")"))
  }

  test("safety edges (lang.c:5222-5251)") {
    intercept[IllegalArgumentException](sv("(til -1)"))
    intercept[IllegalArgumentException](sv("(rand -1 10)"))
    intercept[IllegalArgumentException](sv("(rand 5 0)"))
    assert(vecOf("(til 0)") == Vector())
    assert(atom("(at [] 0)") == null)
    assert(atom("(first [])") == null)
    assert(atom("(last [])") == null)
    assert(atom("(/ 1 0)") == null)
    assert(atom("(count (group []))") == 0L)
  }
}
