package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import graft.StringToColumn

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines. Media payloads are opaque `binary` columns with typed
  * metadata; decode / feature-extraction / frame-sampling run as typed
  * `mapPartitions`/`flatMap` over the bytes — the Scala analog of
  * `mapInPandas` (same batch-iterator shape, executor-side, no
  * driver collect).
  *
  * The actual codec step is a STUB (this environment ships no
  * image/audio libraries): `fakeDecode` derives deterministic
  * pseudo-pixels from the bytes themselves, so the plumbing — schema,
  * partitioning, batch iteration, output shape — is real and testable,
  * and swapping in a real codec changes one function.
  */
object Multimodal {

  /** Decoded per-media features. `feat` is a fixed-width embedding-like
    * vector — the shape a downstream ANN/similarity stage consumes. */
  final case class MediaFeatures(media_id: Long, n_bytes: Int, n_frames: Int,
                                 mean_intensity: Double, feat: Array[Double])

  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Int,
                         intensity: Double)

  val FrameSize = 64
  val FeatDim = 4

  /** STUB codec: deterministic "pixels" from raw bytes. A real build
    * replaces this with an image/audio decode. */
  private[graft] def fakeDecode(bytes: Array[Byte]): Array[Int] =
    bytes.map(b => (b & 0xff))

  /** Feature extraction over a media table: one pass, executor-side,
    * partition-parallel. Input needs (idCol: long, dataCol: binary). */
  def extractFeatures(df: DataFrame, idCol: String, dataCol: String): DataFrame = {
    val src: Dataset[(Long, Array[Byte])] = df
      .select(col(idCol).cast("long"), col(dataCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val px = fakeDecode(bytes)
        val nFrames = (px.length + FrameSize - 1) / FrameSize
        val mean = if (px.isEmpty) 0.0 else px.sum.toDouble / px.length
        val feat = Array.tabulate(FeatDim) { k =>
          val slice = px.indices.filter(_ % FeatDim == k).map(px)
          if (slice.isEmpty) 0.0 else slice.sum.toDouble / slice.length
        }
        MediaFeatures(id, bytes.length, nFrames, mean, feat)
      }
    }(Encoders.product[MediaFeatures]).toDF()
  }

  /** Frame sampling: every `stride`-th fixed-size frame per media row —
    * flatMap (generator/UDTF shape), output is one row per kept frame. */
  def sampleFrames(df: DataFrame, idCol: String, dataCol: String,
                   stride: Int): DataFrame = {
    val src: Dataset[(Long, Array[Byte])] = df
      .select(col(idCol).cast("long"), col(dataCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.flatMap { case (id, bytes) =>
      val px = fakeDecode(bytes)
      px.grouped(FrameSize).zipWithIndex.collect {
        case (frame, i) if i % stride == 0 =>
          Frame(id, i, frame.length,
            if (frame.isEmpty) 0.0 else frame.sum.toDouble / frame.length)
      }
    }(Encoders.product[Frame]).toDF()
  }

  /** Expression-level media metadata (no decode): sizes, checksums,
    * kind census — stays in whole-stage codegen. */
  def mediaMeta(df: DataFrame, idCol: String, dataCol: String,
                kindCol: String): DataFrame =
    df.select(col(idCol).as("media_id"), col(kindCol).as("kind"),
      length(col(dataCol)).cast("long").as("n_bytes"),
      md5(col(dataCol)).as("checksum"))
}
