package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.RF

/** Golden semantics ported from the reference's own eval tests
  * (`/root/reference/tests/lang.c` — line numbers cited per case),
  * translated to this engine's type conventions (SURVEY §1.2: real SQL
  * NULLs for sentinel nulls, TIME = millis int, TIMESTAMP = nanos long).
  */
class GoldenSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): Row =
    Seq(1).toDF("dummy").select(c.as("v")).collect().head

  test("Tables.load surfaces events.ts as LongType epoch-nanos whatever " +
      "the parquet physical type (µs since the 2026-08-13 regen; ns-as-long " +
      "before)") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(e.schema("ts").dataType == org.apache.spark.sql.types.LongType)
    val ts = e.orderBy($"event_id").limit(3).select($"ts")
      .collect().map(_.getLong(0))
    // ns values are whole microseconds (the physical resolution) and in
    // a sane epoch range (2020-2040)
    ts.foreach { t =>
      assert(t % 1000L == 0L, s"sub-µs residue in $t")
      assert(t > 1.5e18.toLong && t < 2.3e18.toLong, s"epoch range: $t")
    }
  }

  test("MicrosAsNanos reinterpret equals the unix_micros SQL route on the " +
      "real events column") {
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val both = raw.select(
      graft.functions.TsExprs.microsAsNanos($"ts").as("fast"),
      expr("unix_micros(cast(ts as timestamp)) * 1000").as("sql"))
    assert(both.filter($"fast" =!= $"sql").count() == 0)
    assert(both.count() > 0)
  }

  test("Euclidean division table (lang.c:426-437)") {
    // (/ -5 -5)=1  (/ -5 -2)=2  (/ -5 6)=-1  (/ -5 0)=null  (/ -5 -0.60)=8
    assert(one(RF.euclidDiv(lit(-5L), lit(-5L))).getLong(0) == 1L)
    assert(one(RF.euclidDiv(lit(-5L), lit(-2L))).getLong(0) == 2L)
    assert(one(RF.euclidDiv(lit(-5L), lit(6L))).getLong(0) == -1L)
    assert(one(RF.euclidDiv(lit(-5L), lit(0L))).isNullAt(0))
    assert(one(RF.euclidDiv(lit(-5L), lit(-0.60))).getLong(0) == 8L)
    assert(one(RF.euclidDiv(lit(-5L), lit(-1.00))).getLong(0) == 5L)
  }

  test("Euclidean remainder table (lang.c:1742-1748)") {
    // (% 10 0)=null  (% 10 5)=0  (% 11 5)=1  (% 11 5.0)=1.0
    assert(one(RF.euclidMod(lit(10L), lit(0L))).isNullAt(0))
    assert(one(RF.euclidMod(lit(10L), lit(5L))).getLong(0) == 0L)
    assert(one(RF.euclidMod(lit(11L), lit(5L))).getLong(0) == 1L)
    assert(one(RF.euclidMod(lit(11L), lit(5.0))).getDouble(0) == 1.0)
  }

  test("null propagation in arithmetic (lang.c:77-90)") {
    // (+ null x) = null for every numeric combination
    assert(one(lit(null).cast("long") + lit(0L)).isNullAt(0))
    assert(one(lit(null).cast("double") + lit(5L)).isNullAt(0))
    assert(one(lit(0.0) + lit(null).cast("int")).isNullAt(0))
  }

  test("null-skipping aggregation (lang.c:2455-2501)") {
    // (sum [1 2 3 0Nl 4])=10  (avg [-24 12 6 0Nl])=-2.0  (avg [0Ni])=null
    // (min [0Ni -24i 12i 6i])=-24i
    val xs = Seq(Some(1L), Some(2L), Some(3L), None, Some(4L)).toDF("x")
    assert(xs.agg(sum($"x")).collect().head.getLong(0) == 10L)
    val ys = Seq(Some(-24L), Some(12L), Some(6L), None).toDF("y")
    assert(ys.agg(avg($"y")).collect().head.getDouble(0) == -2.0)
    val ns = Seq(Option.empty[Long]).toDF("n")
    assert(ns.agg(avg($"n")).collect().head.isNullAt(0))
    val ms = Seq(None, Some(-24L), Some(12L), Some(6L)).toDF("m")
    assert(ms.agg(min($"m")).collect().head.getLong(0) == -24L)
  }

  test("scalar<->vector broadcast (lang.c:99-101, 151-171)") {
    // (+ 2i [3 5]) = [5 7];   (+ [3i 5i] [2 3]) = [5 8]
    val r1 = one(transform(array(lit(3L), lit(5L)), x => x + 2))
    assert(r1.getSeq[Long](0) == Seq(5L, 7L))
    val r2 = one(zip_with(array(lit(3L), lit(5L)),
      array(lit(2L), lit(3L)), (a, b) => a + b))
    assert(r2.getSeq[Long](0) == Seq(5L, 8L))
  }

  test("temporal arithmetic conventions (lang.c:96-98, 126-146)") {
    // (+ 3i 2024.03.20) = 2024.03.23 — DateType + days
    val d = one(date_add(lit(java.sql.Date.valueOf("2024-03-20")), 3))
    assert(d.getDate(0).toString == "2024-03-23")
    // (+ 60000 20:15:07.000) = 20:16:07.000 — TIME as millis int
    val t0 = (20 * 3600 + 15 * 60 + 7) * 1000
    assert(one(lit(t0) + lit(60000)).getInt(0) ==
      (20 * 3600 + 16 * 60 + 7) * 1000)
    // (+ ts 3000000000) = +3s — TIMESTAMP as nanos long
    val ts = 1741102907087221025L
    assert(one(lit(ts) + lit(3000000000L)).getLong(0) ==
      1741102910087221025L)
    // (+ 2024.03.20 20:15:03.020) → timestamp (date + time-of-day)
    val micros = one(expr(
      s"timestamp_micros(unix_date(DATE'2024-03-20') * 86400000000L + " +
        s"${(20 * 3600 + 15 * 60 + 3) * 1000L + 20}L * 1000)"))
    assert(micros.getTimestamp(0).toInstant.toString ==
      "2024-03-20T20:15:03.020Z")
  }

  test("take negative = tail; reverse; distinct keeps first occurrence") {
    // (take -2 [1 2 3]) = [2 3] (lang.c take group)
    assert(one(slice(array(lit(1), lit(2), lit(3)), -2, 2))
      .getSeq[Int](0) == Seq(2, 3))
    assert(one(reverse(array(lit(1), lit(2), lit(3))))
      .getSeq[Int](0) == Seq(3, 2, 1))
    assert(one(array_distinct(array(lit(2), lit(1), lit(2), lit(3))))
      .getSeq[Int](0) == Seq(2, 1, 3))
  }

  test("take cycles past the source length (docs table constructions)") {
    // (take [1 2 3] 5) = [1 2 3 1 2]; (take 'AAPL 3)-style atom repeat is
    // takeCycle on a 1-element array
    import graft.functions.RF
    assert(one(RF.takeCycle(array(lit(1L), lit(2L), lit(3L)), 5))
      .getSeq[Long](0) == Seq(1L, 2L, 3L, 1L, 2L))
    assert(one(RF.takeCycle(array(lit(7L)), 3))
      .getSeq[Long](0) == Seq(7L, 7L, 7L))
    // negative: from the end, cycling backwards
    assert(one(RF.takeCycle(array(lit(1L), lit(2L), lit(3L)), -2))
      .getSeq[Long](0) == Seq(2L, 3L))
    assert(one(RF.takeCycle(array(lit(1L), lit(2L), lit(3L)), -5))
      .getSeq[Long](0) == Seq(2L, 3L, 1L, 2L, 3L))
    // the reference's own assertions (lang.c:2642-2644, 4-elem vector)
    assert(one(RF.takeCycle(array((0L to 3L).map(lit): _*), -3))
      .getSeq[Long](0) == Seq(1L, 2L, 3L))
    assert(one(RF.takeCycle(array((0L to 3L).map(lit): _*), -5))
      .getSeq[Long](0) == Seq(3L, 0L, 1L, 2L, 3L))
  }

  test("except keeps x order and multiplicity; sect distinct (lang.c §2.7)") {
    // except on vectors: members of x not in y, x's order, non-distinct
    assert(one(array_except(array(lit(3), lit(1), lit(3), lit(2)),
      array(lit(2)))).getSeq[Int](0) == Seq(3, 1))
    // (array_except dedups — documented divergence; table-level except
    // (q14) and left_anti preserve the reference cardinality contract)
    assert(one(array_intersect(array(lit(1), lit(2), lit(2)),
      array(lit(2), lit(3)))).getSeq[Int](0) == Seq(2))
  }

  test("rank is 0-based sort position (lang.c rank group)") {
    val df = Seq(30L, 10L, 20L).toDF("x")
    val w = org.apache.spark.sql.expressions.Window.orderBy($"x")
    val got = df.withColumn("r", row_number().over(w) - 1)
      .orderBy($"x").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq == Seq((10L, 0), (20L, 1), (30L, 2)))
  }
}
