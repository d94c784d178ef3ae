package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: typed mapPartitions decode stub, frame sampling,
  * metadata. Exact values pinned on a controlled fixture. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  // 130 bytes: 'A'(65) ×130 → frames of 64: [64, 64, 2]
  private def media = Seq(
    (1L, Array.fill[Byte](130)(65)),
    (2L, "abc".getBytes("UTF-8")),
    (3L, Array.emptyByteArray)
  ).toDF("media_id", "data")

  test("extractFeatures: byte-derived features, per-partition execution") {
    val got = Multimodal.extractFeatures(media, "media_id", "data")
      .orderBy($"media_id").collect()
    assert(got(0).getInt(1) == 130)           // n_bytes
    assert(got(0).getInt(2) == 3)             // ceil(130/64) frames
    assert(got(0).getDouble(3) == 65.0)       // all bytes are 'A'
    assert(got(1).getInt(2) == 1)
    // 'abc' = 97,98,99 → mean 98
    assert(got(1).getDouble(3) == 98.0)
    assert(got(2).getInt(2) == 0 && got(2).getDouble(3) == 0.0)
    // feature vector has the declared fixed width
    assert(got(0).getSeq[Double](4).length == Multimodal.FeatDim)
  }

  test("sampleFrames keeps every stride-th frame with correct sizes") {
    val got = Multimodal.sampleFrames(media, "media_id", "data", stride = 2)
      .orderBy($"media_id", $"frame_idx").collect()
    val m1 = got.filter(_.getLong(0) == 1L)
    // frames 0,1,2 → stride 2 keeps 0 and 2; frame 2 has 130-128=2 bytes
    assert(m1.map(_.getInt(1)).toSeq == Seq(0, 2))
    assert(m1.map(_.getInt(2)).toSeq == Seq(64, 2))
  }

  test("mediaMeta stays expression-level (no serialization barrier)") {
    val df = Multimodal.mediaMeta(
      media.withColumn("kind", lit("text")), "media_id", "data", "kind")
    assert(df.orderBy($"media_id").collect()(0).getLong(2) == 130L)
    // plan contains no DeserializeToObject (mapPartitions) node
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject"), plan.take(300))
  }
}
