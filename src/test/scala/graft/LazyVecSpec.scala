package graft

import org.apache.spark.sql.functions._
import graft.rayfall.Rayfall

/** Script vector ops past the driver-materialization cap must degrade to
  * the distributed plans (sort+zipWithIndex rank, running-window scan,
  * position-zip table build) with results IDENTICAL to the driver
  * semantics the goldens pin (`core/order.c:519,598`, `core/iter.c:1212`).
  * The cap is lowered here so the lazy path runs at test scale; suites
  * run sequentially in the forked test JVM, so the var is race-free. */
class LazyVecSpec extends SparkSpec {

  private val script =
    "(set k (at p 'k))" +
      "(set rnk (rank (at p 'v)))" +
      "(set tile (xrank (at p 'v) 4))" +
      "(set cum (scan + (at p 'v) 100))" +
      "(set ia (iasc (at p 'v)))" +
      "(table [k rnk tile cum ia] (list k rnk tile cum ia))"

  private def run(): Seq[Seq[Any]] = {
    val p = spark.range(500).select(col("id").as("k"),
      pmod(hash(col("id")), lit(97)).cast("long").as("v"))
    Rayfall.script(spark, script, Map("p" -> p))
      .orderBy("k").collect().map(_.toSeq).toSeq
  }

  test("r09-shaped script past the cap: lazy rank/xrank/scan/iasc match " +
      "driver semantics exactly (no materialization error)") {
    val want = run() // driver path (500 < default cap)
    val old = Rayfall.maxDriverVec
    try {
      Rayfall.maxDriverVec = 100 // force every lazy-vector op distributed
      val got = run()
      assert(got == want)
    } finally Rayfall.maxDriverVec = old
  }

  test("lazy asc/desc/reverse stay lazy and aggregate distributed") {
    val old = Rayfall.maxDriverVec
    try {
      Rayfall.maxDriverVec = 100
      // sum over a sorted/reversed lazy vector: no driver vector built,
      // value identical to the unsorted sum ((til 20000) is a lazy
      // VRange — above lazyVecLen — and 20000 > the lowered cap)
      val s = Rayfall.scriptValue(spark,
        "(set v (til 20000)) (sum (asc v))")
      assert(s == Rayfall.VAtom(20000L * 19999 / 2))
      val r = Rayfall.scriptValue(spark,
        "(set v (til 20000)) (sum (reverse v))")
      assert(r == Rayfall.VAtom(20000L * 19999 / 2))
      // prefix-scan type rule: double seed promotes, and the last
      // element of (scan + v seed) is sum(v) + seed
      val s2 = Rayfall.scriptValue(spark,
        "(set v (til 20000)) (last (scan + v 0.5))")
      s2 match {
        case Rayfall.VAtom(d: java.lang.Double) =>
          assert(math.abs(d - (20000.0 * 19999 / 2 + 0.5)) < 1e-6)
        case x => fail(s"expected double scan tail, got $x")
      }
    } finally Rayfall.maxDriverVec = old
  }

  test("FloatType-backed lazy vectors scan on the floating branch " +
      "(no MatchError on the long path)") {
    val old = Rayfall.maxDriverVec
    try {
      Rayfall.maxDriverVec = 100
      val p = spark.range(500).select(col("id").as("k"),
        (col("id") % 7).cast("float").as("v"))
      val got = Rayfall.script(spark,
        "(set c (scan + (at p 'v) 0)) (table [k c] (list (at p 'k) c))",
        Map("p" -> p)).orderBy("k").collect()
      // prefix-sum recurrence over the float column, checked exactly
      var acc = 0.0
      got.zipWithIndex.foreach { case (r, i) =>
        acc += (i % 7).toDouble
        assert(math.abs(r.getDouble(1) - acc) < 1e-9, s"row $i")
      }
      assert(got.length == 500)
    } finally Rayfall.maxDriverVec = old
  }
}
