package graft.operators

import org.apache.spark.sql.SparkSession

/** Per-(session, path, artifact-stamp) memo for SMALL driver-side index
  * artifacts (meta rows, coarse centroids, codebooks, permutations) —
  * r18 optimization. A persisted-index probe paid 2–6 driver round-trip
  * jobs per call re-collecting tables that are a few KB and immutable
  * between lifecycle steps; at 100 TB the same pulls are remote reads
  * on every query. NEVER caches data-plane results: only the model
  * parts named in `stampParts`, and the stamp (file name/size/mtime of
  * exactly those parts) invalidates the entry the moment any lifecycle
  * step (rebuild, rebalance, re-fit) rewrites them — a delete or append
  * that carries the model untouched correctly keeps the memo. Sessions
  * are held weakly (the SessionMemo discipline, Queries2Lm.scala). */
private[graft] object ArtifactMemo {
  private val m = new java.util.concurrent.ConcurrentHashMap[
    String, (java.lang.ref.WeakReference[SparkSession], Any)]()

  /** Stamp over the FILES directly under `$path/$part` for each part:
    * sums name-hash, length and mtime. 0 for a missing part. */
  def stamp(path: String, parts: Seq[String]): Long =
    parts.map { p =>
      Option(new java.io.File(path, p).listFiles).toSeq.flatten
        .filter(_.isFile)
        .map(f => f.getName.hashCode * 31L + f.length + f.lastModified)
        .sum
    }.sum

  def cached[V](spark: SparkSession, path: String,
                stampParts: Seq[String])(make: => V): V = {
    val pfx = s"${org.apache.spark.sql.graftshim.ColumnInternals
      .sessionUUID(spark)}@$path@${stampParts.mkString(",")}@"
    val key = s"$pfx${stamp(path, stampParts)}"
    val hit = m.get(key)
    if (hit != null) hit._2.asInstanceOf[V]
    else {
      import scala.jdk.CollectionConverters._
      // The weak ref cannot clear an entry whose VALUE pins its session
      // (e.g. a cached Model holding DataFrames — the r18 self-review
      // leak), so past a size cap everything outside the CURRENT
      // session drops too; a displaced live session re-loads once.
      val uuid = org.apache.spark.sql.graftshim.ColumnInternals
        .sessionUUID(spark)
      val evictAll = m.size > 256
      m.asScala.keys.toList.foreach { k =>
        val e = m.get(k)
        if (e != null && (e._1.get == null || k.startsWith(pfx) ||
            (evictAll && !k.startsWith(s"$uuid@"))))
          m.remove(k)
      }
      m.computeIfAbsent(key,
        _ => (new java.lang.ref.WeakReference(spark), make))._2
        .asInstanceOf[V]
    }
  }
}
