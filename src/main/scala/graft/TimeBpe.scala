package graft

import org.apache.spark.sql.SparkSession

/** Dev probe for the BPE trainer scaling claim: times the incremental
  * pair-index trainer ([[operators.Bpe.trainMergesLocal]]) against the
  * round-11 full-rescan loop ([[operators.Bpe.trainMergesRescan]]) on
  * the REAL word-frequency dictionary of a testdata documents table, at
  * a production-ish merge count.
  *
  *   sbt "runMain graft.TimeBpe /root/testdata/sf0.1 1000"
  *   sbt "runMain graft.TimeBpe synth:1048576 1000 norescan"
  *
  * The testdata documents vocabulary is tiny (~31 distinct words), so
  * the scaling probe uses `synth:N` — N seeded pseudo-words with a
  * Zipf-ish frequency curve, the crawl-dict shape the trainer must
  * survive. Pass a third arg `norescan` to skip the quadratic
  * reference loop (at ≥10k merges it is the hours-long thing the
  * rewrite removes).
  */
object TimeBpe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val numMerges = if (args.length > 1) args(1).toInt else 1000
    val runRescan = !(args.length > 2 && args(2) == "norescan")
    val entries: Array[(Array[String], Long)] = if (dir.startsWith("synth:")) {
      val n = dir.stripPrefix("synth:").toInt
      val rnd = new scala.util.Random(7)
      val seen = scala.collection.mutable.HashSet.empty[String]
      val out = Array.newBuilder[(Array[String], Long)]
      var rank = 0
      while (rank < n) {
        val len = 3 + rnd.nextInt(10)
        val w = (0 until len)
          .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
        if (seen.add(w)) {
          out += ((operators.Bpe.toSyms(w), math.max(1L, n.toLong / (rank + 1))))
          rank += 1
        }
      }
      out.result()
    } else {
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val docs = Tables.load(spark, dir, "documents")
      val wf = operators.Bpe.wordFreq(docs, "text")
        .orderBy(org.apache.spark.sql.functions.col("freq").desc,
          org.apache.spark.sql.functions.col("word").asc)
        .limit(1 << 20).collect()
      spark.stop()
      wf.map(r => (operators.Bpe.toSyms(r.getString(0)), r.getLong(1)))
    }
    val totSyms = entries.iterator.map(_._1.length.toLong).sum
    println(s"dict: ${entries.length} words, $totSyms symbols")
    def clone2() = entries.map { case (s, f) => (s.clone(), f) }
    // JIT warm both paths on a small merge budget
    operators.Bpe.trainMergesLocal(clone2(), 50)
    if (runRescan) operators.Bpe.trainMergesRescan(clone2(), 50)
    val t0 = System.nanoTime()
    val fast = operators.Bpe.trainMergesLocal(clone2(), numMerges)
    val t1 = System.nanoTime()
    println(f"incremental: ${fast.length} merges in ${(t1 - t0) / 1e9}%.2f s")
    if (runRescan) {
      val t2 = System.nanoTime()
      val ref = operators.Bpe.trainMergesRescan(clone2(), numMerges)
      val t3 = System.nanoTime()
      println(f"rescan:      ${ref.length} merges in ${(t3 - t2) / 1e9}%.2f s")
      println(s"identical: ${fast == ref}")
    }
  }
}
