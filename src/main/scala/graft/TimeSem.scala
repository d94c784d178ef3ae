package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: semDedup runtime vs cell count at a given SF dir — the
  * SemDeDup scaling knob. Cells bound the quadratic within-cell pair
  * term, so production sizes nCells to the corpus (≈ n / targetCellSize),
  * exactly like the paper's 50k clusters at web scale.
  *
  *   sbt "runMain graft.TimeSem /tmp/sf1 8,64 3 0.35"
  */
object TimeSem {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cellsList = args(1).split(",").map(_.toInt).toSeq
    val iters = if (args.length > 2) args(2).toInt else 3
    val thr = if (args.length > 3) args(3).toDouble else 0.35
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.load(spark, dir, "embeddings")
    for (c <- cellsList) {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = operators.Dedup.semDedup(
          emb, "vec_id", "embedding", c, iters, thr).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[sem] nCells=$c%-4d rows=${times.head._2}%-8d " +
        times.map(t => f"${t._1}%.2f").mkString(" "))
    }
    spark.stop()
  }
}
