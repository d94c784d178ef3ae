package graft

import graft.operators.ArtifactMemo

/** The ONE memo home (r19 consolidation of Tables.loadMemo /
  * ArtifactMemo / Queries2Lm.SessionMemo): pins the lifecycle contract
  * the three spellings only informally shared — stamp invalidation on
  * a deleted non-newest part, dead-session release, size-cap (LRU)
  * displacement + re-load, supersede release. */
class MemoSpec extends SparkSpec {

  private def tmpDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("memo_spec").toFile
    d.deleteOnExit(); d
  }

  test("stamp: deleting a NON-newest part file changes the stamp " +
      "(rebuild/rebalance invalidate; an untouched model keeps it)") {
    val root = tmpDir()
    val part = new java.io.File(root, "meta"); part.mkdirs()
    val older = new java.io.File(part, "a.parquet")
    val newer = new java.io.File(part, "b.parquet")
    java.nio.file.Files.write(older.toPath, "aaaa".getBytes)
    java.nio.file.Files.write(newer.toPath, "bbbbbb".getBytes)
    older.setLastModified(1000000L); newer.setLastModified(2000000L)
    val s0 = ArtifactMemo.stamp(root.getPath, Seq("meta"))
    assert(s0 == ArtifactMemo.stamp(root.getPath, Seq("meta")),
      "stamp is deterministic while files are untouched")
    older.delete()
    assert(ArtifactMemo.stamp(root.getPath, Seq("meta")) != s0,
      "deleting a non-newest part must move the stamp")
  }

  test("stampTree: rewriting a file INSIDE a partition dir (and " +
      "renaming a partition dir) moves the recursive stamp — the " +
      "getParted invalidation contract stampPath cannot give") {
    val root = tmpDir()
    val part = new java.io.File(root, "m=1995-03"); part.mkdirs()
    val f = new java.io.File(part, "part-0.parquet")
    java.nio.file.Files.write(f.toPath, "aaaa".getBytes)
    f.setLastModified(1000000L)
    val s0 = ArtifactMemo.stampTree(root.getPath)
    assert(s0 == ArtifactMemo.stampTree(root.getPath))
    java.nio.file.Files.write(f.toPath, "bbbbbb".getBytes)
    f.setLastModified(2000000L)
    val s1 = ArtifactMemo.stampTree(root.getPath)
    assert(s1 != s0, "nested file rewrite must move the tree stamp")
    assert(part.renameTo(new java.io.File(root, "m=1995-04")))
    assert(ArtifactMemo.stampTree(root.getPath) != s1,
      "partition dir rename must move the tree stamp")
  }

  test("supersede: a changed stamp re-makes and RELEASES the live " +
      "superseded entry; an unchanged stamp never re-makes") {
    var made = 0
    val released = scala.collection.mutable.Buffer[Int]()
    val memo = new ArtifactMemo.Memo[Int](cap = 16, v => released += v)
    def get(stamp: Long) = memo(spark, "/scope/a", stamp) { made += 1; made }
    assert(get(1L) == 1 && get(1L) == 1 && made == 1)
    assert(get(2L) == 2 && made == 2, "changed stamp re-makes")
    assert(released.toSeq == Seq(1), "superseded live entry released")
    assert(get(2L) == 2 && made == 2)
  }

  test("dead session: a GC'd session's entry is dropped WITHOUT the " +
      "release callback (its cached tables died with the session)") {
    val released = scala.collection.mutable.Buffer[Int]()
    val memo = new ArtifactMemo.Memo[Int](cap = 16, v => released += v)
    val other = spark.newSession()
    memo(other, "/scope/dead", 1L)(7)
    // simulate the session being GC'd: clear its weak ref in place
    import scala.jdk.CollectionConverters._
    memo.m.asScala.values.foreach(_.ref.clear())
    memo(spark, "/scope/live", 1L)(9) // any miss sweeps dead entries
    assert(!memo.m.asScala.keys.exists(_.contains("/scope/dead")),
      "dead-session entry must be swept")
    assert(released.isEmpty, "dead entries must NOT run release")
  }

  test("size cap: LRU displacement — the least-recently-USED entry is " +
      "evicted (released), a displaced scope re-loads once, and " +
      "recently-used entries survive (the r18 blanket-evict thrash fix)") {
    var made = 0
    val released = scala.collection.mutable.Buffer[String]()
    val memo = new ArtifactMemo.Memo[String](cap = 4, v => released += v)
    def get(scope: String) =
      memo(spark, scope, 1L) { made += 1; scope }
    Seq("a", "b", "c", "d").foreach(get) // full at cap
    get("a"); get("b"); get("c") // d is now least recently used
    assert(made == 4)
    get("e") // displaces d
    assert(made == 5 && released.toSeq == Seq("d"),
      s"LRU victim must be d: released=$released")
    get("a"); get("b"); get("c")
    assert(made == 5, "recently-used entries survived the displacement")
    get("d") // re-loads once
    assert(made == 6)
  }
}
