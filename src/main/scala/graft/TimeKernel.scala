package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev probe for the H2O group-by floor: runs one query shape through
  * the dense kernel with a listener that attributes wall time to stage
  * scheduling vs executor run vs shuffle serde — the data the Q3/Q5/Q6
  * variance hunt needs (per-rep spikes show gc=0, so the question is
  * which phase stalls).
  *
  *   SPARK_GRAFT_H2O_N=10000000 sbt "runMain graft.TimeKernel Q6 8"
  */
object TimeKernel {
  def main(args: Array[String]): Unit = {
    val qname = if (args.nonEmpty) args(0) else "Q6"
    val reps = if (args.length > 1) args(1).toInt else 8
    // A/B: SPARK_GRAFT_NO_DRIVER_MERGE=1 forces the executor merge path
    if (sys.env.contains("SPARK_GRAFT_NO_DRIVER_MERGE"))
      operators.GroupKernel.driverMergeEnabled = false
    val n = sys.env.getOrElse("SPARK_GRAFT_H2O_N", "10000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.aggregate.map.vectorized.enable", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
    spark.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", "65536")
    val t = H2O.g1(spark, n).cache()
    t.count()
    operators.GroupKernel.encode(t, Seq("id1", "id2", "id3", "id4", "id5", "id6"))

    final case class Acc(var tasks: Int = 0, var run: Long = 0,
                         var deser: Long = 0, var resSer: Long = 0,
                         var shWriteMs: Long = 0, var shWriteBytes: Long = 0,
                         var fetchWait: Long = 0, var gc: Long = 0,
                         var stageWall: Long = 0, var launch2finish: Long = 0)
    val acc = new java.util.concurrent.ConcurrentHashMap[Int, Acc]()
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val a = acc.computeIfAbsent(te.stageId, _ => Acc())
          a.synchronized {
            a.tasks += 1
            a.run += m.executorRunTime
            a.deser += m.executorDeserializeTime
            a.resSer += m.resultSerializationTime
            a.shWriteMs += m.shuffleWriteMetrics.writeTime / 1000000L
            a.shWriteBytes += m.shuffleWriteMetrics.bytesWritten
            a.fetchWait += m.shuffleReadMetrics.fetchWaitTime
            a.gc += m.jvmGCTime
            a.launch2finish +=
              (te.taskInfo.finishTime - te.taskInfo.launchTime)
          }
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val a = acc.computeIfAbsent(i.stageId, _ => Acc())
        a.synchronized {
          a.stageWall = i.completionTime.getOrElse(0L) -
            i.submissionTime.getOrElse(0L)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val q = H2O.queries.toMap.apply(qname)
    rayfall.Rayfall.query(q, Map("t" -> t)).count() // warm
    for (r <- 1 to reps) {
      acc.clear()
      val t0 = System.nanoTime()
      rayfall.Rayfall.query(q, Map("t" -> t)).count()
      val wall = (System.nanoTime() - t0) / 1e6
      Thread.sleep(150) // let the listener bus drain
      import scala.jdk.CollectionConverters._
      val stages = acc.asScala.toSeq.sortBy(_._1)
      println(f"[tk] $qname rep$r wall=$wall%.0f ms")
      stages.foreach { case (sid, a) =>
        println(f"[tk]   stage$sid tasks=${a.tasks} wall=${a.stageWall}ms " +
          f"sumRun=${a.run} deser=${a.deser} resSer=${a.resSer} " +
          f"shWrite=${a.shWriteMs}ms/${a.shWriteBytes / 1024 / 1024}MB " +
          f"fetchWait=${a.fetchWait} gc=${a.gc} sched=" +
          f"${a.launch2finish - a.run - a.deser - a.resSer}")
      }
    }
    spark.stop()
  }
}
