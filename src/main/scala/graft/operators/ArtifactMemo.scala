package graft.operators

import org.apache.spark.sql.SparkSession

/** THE one memo home for per-(session, scope, stamp) driver-side
  * artifacts — r18 grew three stamp/evict spellings (`Tables.loadMemo`,
  * `ArtifactMemo`, `Queries2Lm.SessionMemo`) with two hand-rolled
  * eviction loops; r19 consolidates them onto [[ArtifactMemo.Memo]]
  * (MemoSpec pins the eviction contract). NEVER caches data-plane
  * results: values are loaded plans, model tables, merge lists —
  * things every action still recomputes from parquet.
  *
  * Contract (MemoSpec):
  *   - a changed stamp (any lifecycle step rewriting a covered file —
  *     including DELETING a non-newest part) re-makes the value and
  *     releases the superseded entry;
  *   - entries whose session is GC'd release without the `release`
  *     callback (their cached tables died with the session);
  *   - past `cap` entries, eviction is LRU over OTHER keys — a
  *     displaced live entry re-loads once; recently-used live sessions
  *     are not blanket-evicted (the r18 ADVICE thrash fix).
  *
  * The session is held weakly, but a value that itself pins its
  * session (a DataFrame strongly references its SparkSession — the
  * r18 self-review leak) can keep the weak ref live forever; the size
  * cap bounds that. */
private[graft] object ArtifactMemo {

  private[graft] final class Entry[V](
      val ref: java.lang.ref.WeakReference[SparkSession],
      val value: V) {
    @volatile var lastUsed: Long = tick.incrementAndGet()
  }

  private val tick = new java.util.concurrent.atomic.AtomicLong()

  /** One keyed memo. `cap` bounds resident entries (LRU past it);
    * `release` runs on superseded/displaced LIVE entries (unpersist
    * hooks — IllegalStateException from an already-stopped context is
    * swallowed). */
  private[graft] final class Memo[V](cap: Int,
                                     release: V => Unit = (_: V) => ()) {
    private[graft] val m = new java.util.concurrent.ConcurrentHashMap[
      String, Entry[V]]()

    private def drop(k: String, released: Boolean): Unit =
      Option(m.remove(k)).foreach { e =>
        if (released && e.ref.get != null)
          try release(e.value)
          catch { case _: IllegalStateException => () }
      }

    def apply(spark: SparkSession, scope: String, stamp: Long)
             (make: => V): V = {
      val pfx = s"${org.apache.spark.sql.graftshim.ColumnInternals
        .sessionUUID(spark)}@$scope@"
      val key = s"$pfx$stamp"
      val hit = m.get(key)
      if (hit != null) { hit.lastUsed = tick.incrementAndGet(); hit.value }
      else {
        import scala.jdk.CollectionConverters._
        // 1. dead sessions release for free; 2. superseded stamps of
        // THIS (session, scope) release explicitly; 3. past the cap,
        // evict least-recently-used other entries until back under it
        m.asScala.toList.foreach { case (k, e) =>
          if (e.ref.get == null) drop(k, released = false)
          else if (k.startsWith(pfx)) drop(k, released = true)
        }
        if (m.size >= cap)
          m.asScala.toList.sortBy(_._2.lastUsed)
            .take(math.max(m.size + 1 - cap, 0))
            .foreach { case (k, _) => drop(k, released = true) }
        m.computeIfAbsent(key,
          _ => new Entry(new java.lang.ref.WeakReference(spark), make)).value
      }
    }
  }

  /** Stamp over the FILES directly under `$path/$part` for each part:
    * sums name-hash, length and mtime. 0 for a missing part. A deleted
    * non-newest part moves the sum, so it invalidates too. */
  def stamp(path: String, parts: Seq[String]): Long =
    parts.map { p =>
      Option(new java.io.File(path, p).listFiles).toSeq.flatten
        .filter(_.isFile)
        .map(f => f.getName.hashCode * 31L + f.length + f.lastModified)
        .sum
    }.sum

  /** Stamp of one file, or of the files directly under one dir. */
  def stampPath(path: String): Long = {
    val f = new java.io.File(path)
    if (f.isFile) f.getName.hashCode * 31L + f.length + f.lastModified
    else stamp(path, Seq(""))
  }

  /** Recursive stamp over a whole tree (hive-partitioned layouts —
    * `stampPath` only sees direct children, which for a parted store
    * are the partition DIRS, not their files). Name+size+mtime of
    * every file, with each directory's name folded in so a renamed
    * partition moves the stamp too. */
  def stampTree(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.getName.hashCode * 31L + f.length + f.lastModified
      else f.getName.hashCode * 31L +
        Option(f.listFiles).toSeq.flatten.map(walk).sum
    walk(new java.io.File(path))
  }

  private val shared = new Memo[Any](cap = 256)

  /** Per-(session, path, artifact-stamp) memo for SMALL driver-side
    * index artifacts (meta rows, coarse centroids, codebooks,
    * permutations). The stamp covers exactly the model parts named in
    * `stampParts`: rebuild/rebalance/re-fit invalidate; a delete or
    * append that carries the model untouched correctly keeps the
    * memo. */
  def cached[V](spark: SparkSession, path: String,
                stampParts: Seq[String])(make: => V): V =
    shared(spark, s"$path@${stampParts.mkString(",")}",
      stamp(path, stampParts))(make).asInstanceOf[V]
}
