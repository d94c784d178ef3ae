package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** r18 optimization probe: per-stage breakdown of one warm rep of each
  * named query — job/stage counts, per-stage wall+task time, so the
  * scheduling floor (many tiny stages) separates from real compute.
  *
  *   sbt "runMain graft.TimeStage /root/testdata/sf0.1 q35_groupby_wide"
  */
object TimeStage {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var stages =
      List.empty[(Int, String, Long, Int, Long)] // id, name, wall, tasks, taskTime
    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        synchronized {
          val i = s.stageInfo
          val wall = (for {a <- i.completionTime; b <- i.submissionTime}
            yield a - b).getOrElse(-1L)
          stages = (i.stageId, i.name.takeWhile(_ != '\n').take(60), wall,
            i.numTasks, i.taskMetrics.executorRunTime) :: stages
        }
    }
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm (memos, codegen)
      fn(spark, sfDir).count()
      spark.sparkContext.addSparkListener(listener)
      stages = Nil; jobs = 0
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      spark.sparkContext.removeSparkListener(listener)
      val ss = stages.reverse
      println(f"=== $name wall=$t%.2fs jobs=$jobs stages=${ss.size} " +
        f"stageWallSum=${ss.map(_._3).sum / 1e3}%.2fs " +
        f"taskTimeSum=${ss.map(_._5).sum / 1e3}%.2fs")
      for ((id, nm, w, nt, tt) <- ss)
        println(f"  [$id%4d] wall=${w / 1e3}%6.3f tasks=$nt%3d " +
          f"taskTime=${tt / 1e3}%7.3f  $nm")
    }
    spark.stop()
  }
}
