package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` media columns with typed
  * metadata, processed in partition-sized batches.
  *
  * The Spark-side plumbing — schema, partitioning, batch iteration shape —
  * is real and tested. The codec itself is a clearly-marked deterministic
  * STUB (`fakeDecode`): this container has no image/audio libraries, so the
  * "decode" computes reproducible pseudo-features from the raw bytes. A
  * production deployment swaps `fakeDecode` for a JNI/library call without
  * touching any of the dataflow.
  *
  * Why mapPartitions (Scala's analogue of a pandas-batch UDF): codecs have
  * per-call setup cost (decoder tables, native contexts); amortizing it per
  * partition instead of per row is the difference between codec-bound and
  * overhead-bound at 100 TB. Columns stay pruned: only (id, media) reach
  * the decoder.
  */
object Multimodal {

  /** A media row: id + opaque bytes + typed metadata. */
  final case class MediaRow(doc_id: Long, media: Array[Byte], mime: String, n_bytes: Long)

  /** Extracted features (the "decoded" representation). */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, byte_mean: Double,
                                 head_hash: Long, thumb: Array[Byte])

  /** Pack a text corpus into media rows — stands in for reading real image
    * bytes; the downstream plumbing is identical. */
  def pack(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("application/x-fake").as("mime"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
      .as[MediaRow]
  }

  /** STUB decoder — deterministic pseudo-features from raw bytes.
    * Replace with a real codec (libjpeg/ffmpeg/...) in production. */
  private def fakeDecode(bytes: Array[Byte]): (Double, Long, Array[Byte]) = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xFF; i += 1 }
    val mean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
    // byte-variant FNV-1a over the header (shared helper, see Fnv).
    val h = graft.functions.Fnv.bytes(bytes, limit = 64)
    (mean, h, bytes.take(16)) // "thumb" = byte prefix, stands in for a resize
  }

  /** Batch feature extraction: one decoder "context" per partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // Per-partition setup would init the native codec here (amortized).
      rows.map { r =>
        val (mean, hash, thumb) = fakeDecode(r.media)
        MediaFeatures(r.doc_id, r.n_bytes, mean, hash, thumb)
      }
    }
  }

  /** A sampled frame: 1→many child rows of a media row. */
  final case class MediaFrame(doc_id: Long, frame_idx: Long, frame: Array[Byte])

  /** Frame sampling — the video-side analogue of text chunking: treat the
    * byte stream as fixed-size frames and emit every `stride`-th one.
    * The slicer is the stub stand-in for a demuxer (the 1→many generate
    * shape, output cardinality ≈ bytes / (frameBytes · stride), is what
    * survives to production). A trailing partial frame is dropped, as a
    * demuxer drops a truncated frame. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 32,
                   stride: Int = 4): Dataset[MediaFrame] = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val n = r.media.length / frameBytes
      (0 until n by stride).iterator.map { i =>
        MediaFrame(r.doc_id, i.toLong,
          java.util.Arrays.copyOfRange(r.media, i * frameBytes, (i + 1) * frameBytes))
      }
    }
  }

  /** End-to-end: pack → batch-decode → feature table. */
  def pipeline(spark: SparkSession, docs: DataFrame): DataFrame =
    extractFeatures(pack(docs)).toDF()
      .select("doc_id", "n_bytes", "byte_mean", "head_hash")
}
