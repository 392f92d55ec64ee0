package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column model: media as opaque `binary` payloads + typed
  * metadata, processed partition-wise.
  *
  * The decode step is STUBBED — this container has no image/audio codecs, so
  * `decodeFeatures` derives a deterministic fake feature vector from the
  * payload bytes. Everything around it is the real Spark plumbing: the
  * (uri, mime, bytes, meta) schema, partition-wise batched processing via
  * `mapPartitions` (the Scala analogue of `mapInPandas` — one iterator per
  * partition, constant memory), and fixed-size typed output.
  */
object Multimodal {

  /** A media row: object-store pointer + inline payload + metadata. At
    * 100 TB, `bytes` would be null for cold rows and fetched by the
    * partition iterator from the `uri`; inline payloads keep the test
    * hermetic. */
  case class MediaRow(media_id: Long, uri: String, mime: String,
                      bytes: Array[Byte], width: Int, height: Int)

  case class MediaFeatures(media_id: Long, mime: String, n_bytes: Long,
                           features: Array[Double])

  /** Wrap documents as media rows (payload = utf-8 bytes standing in for an
    * encoded image; deterministic). */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      concat(lit("memory://media/"), col(idCol)).as("uri"),
      lit("image/png").as("mime"),
      encode(col(textCol), "UTF-8").as("bytes"),
      (length(col(textCol)) % 640 + 32).cast("int").as("width"),
      lit(480).cast("int").as("height"))

  /** STUB decode: a real implementation would decode `bytes` with an image
    * library inside the partition iterator. The fake is deterministic —
    * 8 stripe-mean features over the payload — so tests can pin outputs
    * while exercising the exact batching/schema contract. */
  def stubDecode(bytes: Array[Byte], dims: Int = 8): Array[Double] = {
    if (bytes == null || bytes.isEmpty) return Array.fill(dims)(0.0)
    val stripe = math.max(1, bytes.length / dims)
    Array.tabulate(dims) { d =>
      val from = d * stripe
      val to = math.min(bytes.length, from + stripe)
      if (from >= bytes.length) 0.0
      else {
        var s = 0L; var i = from
        while (i < to) { s += bytes(i) & 0xff; i += 1 }
        s.toDouble / (to - from)
      }
    }
  }

  /** Partition-wise feature extraction (mapPartitions = batched UDF shape:
    * per-partition setup cost amortized, streaming iterator, no
    * driver-side collection). */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // real impl: open codec context once per partition here
      rows.map { r =>
        MediaFeatures(r.media_id, r.mime,
          if (r.bytes == null) 0L else r.bytes.length.toLong,
          stubDecode(r.bytes))
      }
    }
  }

  /** Frame sampling stub for video-shaped payloads: every k-th stripe of the
    * payload as a "frame" (posexplode keeps lineage row→frames). */
  def sampleFrames(media: DataFrame, everyK: Int = 4): DataFrame = {
    val nFrames = greatest(floor(length(col("bytes")) / 1024), lit(1)).cast("int")
    media.select(col("media_id"),
        posexplode(sequence(lit(0), nFrames - 1)).as(Seq("frame_idx", "frame_no")))
      .filter(col("frame_idx") % everyK === 0)
      .select(col("media_id"), col("frame_idx"))
  }

  /** Resize planning: fit (width, height) into a bounding box preserving
    * aspect ratio — the metadata half of an image-resize operator (the
    * pixel half is the stubbed decode). Pure column arithmetic: the scale
    * is min(maxW/w, maxH/h) capped at 1 (never upscale), dims floored. */
  def resizePlan(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW) / col("width"), lit(maxH) / col("height"), lit(1.0))
    media.select(col("media_id"), col("width"), col("height"),
      round(scale, 6).as("scale"),
      floor(col("width") * scale).cast("int").as("out_w"),
      floor(col("height") * scale).cast("int").as("out_h"))
  }

  /** Audio-shaped stub: treat the payload as 8-bit samples and emit one
    * mean-energy value per `frameBytes` window — the batched-decode shape
    * of an audio feature extractor (windowing, per-window reduce), done as
    * a partition-wise iterator like [[decodeFeatures]]. */
  case class AudioFrame(media_id: Long, frame_no: Int, energy: Double)

  def audioFrameEnergy(spark: SparkSession, media: DataFrame,
                       frameBytes: Int = 256): Dataset[AudioFrame] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val bytes = if (r.bytes == null) Array.emptyByteArray else r.bytes
      val n = (bytes.length + frameBytes - 1) / frameBytes
      (0 until n).map { f =>
        val from = f * frameBytes
        val to = math.min(bytes.length, from + frameBytes)
        var s = 0L; var i = from
        while (i < to) { s += bytes(i) & 0xff; i += 1 }
        AudioFrame(r.media_id, f, s.toDouble / (to - from))
      }
    }
  }
}
