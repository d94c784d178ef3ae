package graft

import graft.rayfall.Rayfall

/** Edge semantics of the script runtime flagged by review: guid parity
  * across the lazy threshold, ANSI-safe TIME parsing in read-csv,
  * journal round-trips of arbitrary strings, and the lazy-map fallback
  * actually engaging for bodies the column translator can't express. */
class ScriptEdgeSpec extends SparkSpec {

  test("(guid n) agrees across the eager/lazy threshold for a given index") {
    // eager path (n < lazyVecLen) must emit the same md5-layout value the
    // lazy spark.range path computes for the same index
    val (_, eager) = Rayfall.scriptCapture(spark, "(show (guid 3))")
    val lazyDf = Rayfall.script(spark,
      "(table [g] (list (take (guid 20000) 3)))")
    val lazyVals = lazyDf.collect().map(_.getString(0)).toSeq
    val eagerVals = eager.trim.stripPrefix("[").stripSuffix("]").split(" ").toSeq
    assert(eagerVals == lazyVals)
    // RFC 8-4-4-4-12 shape
    assert(lazyVals.forall(_.matches("[0-9a-f]{8}(-[0-9a-f]{4}){3}-[0-9a-f]{12}")))
  }

  test("read-csv TIME: missing fraction is 0 ms, short fraction is width-padded") {
    val p = java.nio.file.Files.createTempFile("graft_time", ".csv")
    java.nio.file.Files.writeString(p,
      "t\n16:00:00\n09:30:00.25\n09:30:00.007\n")
    val df = Rayfall.script(spark, s"""(read-csv [TIME] "$p")""")
    val got = df.collect().map(_.getLong(0)).toSeq
    val base16 = 16L * 3600 * 1000
    val base930 = (9L * 3600 + 30 * 60) * 1000
    assert(got == Seq(base16, base930 + 250, base930 + 7))
  }

  test("journal write/read round-trips strings with spaces and quotes") {
    val path = "/tmp/graft_edge_journal.log"
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
    val (_, printed) = Rayfall.scriptCapture(spark,
      s"""(set f (fn [x y] (println "GOT: % %" x y)))
         |(set h (hopen "$path"))
         |(write h (list 'f "two words" "a\\"quote"))
         |(hclose h)
         |(set h (hopen "$path"))
         |(read h)
         |(hclose h)""".stripMargin)
    assert(printed == "GOT: two words a\"quote\n")
  }

  test("lazy map falls back to the driver path for non-column bodies") {
    // (format …) has no Column translation: the eager probe must reject
    // it at map time and take the guarded driver path — not defer the
    // failure to when the range is forced
    val df = Rayfall.script(spark,
      """(set v (map (fn [x] (format "n=%" x)) (til 10000)))
        |(table [s] (list v))""".stripMargin)
    assert(df.count() == 10000L)
    assert(df.collect().map(_.getString(0)).take(3).toSeq ==
      Seq("n=0", "n=1", "n=2"))
  }
}
