package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal decode plumbing: media as opaque `binary` columns fanned
  * out to typed frame rows via `mapPartitions`.
  *
  * THE DECODER IS A STUB. No image/audio codecs exist in this container,
  * so `StubCodec` produces deterministic fake pixels (byte-slice +
  * arithmetic). Everything else is the real production shape:
  *
  *  - binary payload column + typed metadata schema,
  *  - `mapPartitions` so the (expensive) codec is initialized ONCE PER
  *    PARTITION, not per row — the same reason the PySpark equivalent
  *    uses `mapInPandas` with a per-batch model/codec handle,
  *  - per-asset frame fan-out (1 row in, N frame rows out) as an
  *    iterator, never materializing a partition in memory,
  *  - feature extraction returning fixed-width `array<float>`, ready for
  *    the similarity-search operators (graft.queries.SimilaritySearch).
  *
  * A production build replaces StubCodec with a JNI/av codec behind the
  * same trait; no dataflow changes.
  */
object DecodeStub {

  final case class MediaAsset(doc_id: Long, media: Array[Byte])

  final case class Frame(
      doc_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      channels: Int,
      pixels: Array[Byte])

  /** What a real codec would expose; STUB implementation below. */
  trait Codec {
    def frames(asset: MediaAsset): Iterator[Frame]
  }

  val FrameBytes = 64
  val FramesPerAsset = 4

  /** STUB: deterministic fake decode — fixed-offset slices of the
    * payload, cycled when the payload is short; width/height derived
    * arithmetically from content. Replace with a real decoder here.
    */
  final class StubCodec extends Codec {
    def frames(asset: MediaAsset): Iterator[Frame] =
      (0 until FramesPerAsset).iterator.map { i =>
        val px = Array.tabulate(FrameBytes) { j =>
          val src = (i * FrameBytes + j) % math.max(asset.media.length, 1)
          if (asset.media.isEmpty) 0.toByte else asset.media(src)
        }
        Frame(asset.doc_id, i,
          width = 8, height = 8, channels = 1, pixels = px)
      }
  }

  /** Decode a (doc_id, media binary) DataFrame into frame rows. The codec
    * is constructed once per partition inside the task — the pattern that
    * makes per-row-expensive decode viable at scale.
    */
  def decodeFrames(spark: SparkSession, assets: DataFrame): Dataset[Frame] = {
    import spark.implicits._
    assets.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = new StubCodec // once per partition, not per row
        rows.flatMap { case (id, media) =>
          codec.frames(MediaAsset(id, if (media == null) Array.empty else media))
        }
      }
  }

  /** Nearest-neighbor "resize" on the stub pixel grid — real index
    * arithmetic, stub pixels.
    */
  def resize(f: Frame, w: Int, h: Int): Frame = {
    val px = Array.tabulate(w * h) { i =>
      val (x, y) = (i % w, i / w)
      val (sx, sy) = (x * f.width / w, y * f.height / h)
      f.pixels((sy * f.width + sx) * f.channels)
    }
    Frame(f.doc_id, f.frame_idx, w, h, f.channels, px)
  }

  /** Fixed-width feature vector: 16-bin byte histogram, L1-normalized —
    * the embedding-shaped output similarity search consumes.
    */
  def features(f: Frame): Array[Float] = {
    val hist = new Array[Float](16)
    f.pixels.foreach { b => hist((b & 0xFF) >> 4) += 1f }
    val n = math.max(f.pixels.length, 1).toFloat
    hist.map(_ / n)
  }

  /** End-to-end: documents' text bytes as the stand-in payload ->
    * decode -> per-frame features. Returns (doc_id, frame_idx, feature).
    */
  def featureTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    decodeFrames(spark,
      docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("media")))
      .map(f => (f.doc_id, f.frame_idx, features(f)))
      .toDF("doc_id", "frame_idx", "feature")
  }
}
