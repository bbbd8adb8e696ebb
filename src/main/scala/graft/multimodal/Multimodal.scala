package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` media columns with typed
  * metadata, processed in partition-sized batches.
  *
  * Two real decode paths (see [[ImageCodec]], both pure-JVM):
  *  - image bytes (PNG/JPEG/GIF/BMP) get a header parse for
  *    width/height/channels plus a full `javax.imageio` pixel decode for
  *    exact luma statistics and a nearest-neighbor thumbnail;
  *  - any other binary gets honest byte-level features (mean byte value,
  *    header hash, byte prefix) — the format-agnostic fallback a corpus
  *    gate applies to blobs it can't identify.
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

  /** Extracted features. Byte-level fields are populated for every blob;
    * image fields are None for non-image binary. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, byte_mean: Double,
                                 head_hash: Long, thumb: Array[Byte],
                                 format: String, width: Option[Int],
                                 height: Option[Int], channels: Option[Int],
                                 luma_mean: Option[Double])

  /** Pack a text corpus into opaque binary rows — the format-agnostic
    * ingest shape (bytes + mime + size); downstream plumbing is identical
    * for real media. */
  def pack(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("application/octet-stream").as("mime"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
      .as[MediaRow]
  }

  /** Pack a text corpus as REAL PNG bytes: each document's bytes are
    * rendered into a 16×12 grayscale-in-RGB raster and encoded with the
    * JDK's PNG writer on the executors. This feeds the image path genuine
    * lossless image bytes (decode recovers the exact raster) without
    * shipping binary fixtures — the multimodal analogue of the synthetic
    * text corpus. */
  def packImages(docs: DataFrame, width: Int = 16, height: Int = 12): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val src = Option(text).getOrElse("").getBytes("UTF-8")
      val png = ImageCodec.encodePng(width, height) { (x, y) =>
        val v = if (src.isEmpty) 0 else src(((y * width + x) % src.length + src.length) % src.length) & 0xFF
        (v << 16) | (v << 8) | v
      }
      MediaRow(id, png, "image/png", png.length.toLong)
    }
  }

  /** Byte-level features for opaque binary — real statistics of the raw
    * bytes (not a codec stand-in): mean byte value, FNV-1a of the header,
    * and the byte prefix as the "thumb". */
  private def byteFeatures(bytes: Array[Byte]): (Double, Long, Array[Byte]) = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xFF; i += 1 }
    val mean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
    val h = graft.functions.Fnv.bytes(bytes, limit = 64)
    (mean, h, bytes.take(16))
  }

  /** Batch feature extraction: one decoder "context" per partition; image
    * bytes take the real codec path, everything else the byte path. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // Per-partition setup would init a native codec here (amortized);
      // ImageIO's reader registry is JVM-global, so it already is.
      rows.map { r =>
        val (mean, hash, prefix) = byteFeatures(r.media)
        ImageCodec.decode(r.media) match {
          case Some(d) =>
            MediaFeatures(r.doc_id, r.n_bytes, mean, hash, d.thumb,
              d.meta.format, Some(d.meta.width), Some(d.meta.height),
              Some(d.meta.channels), Some(d.lumaMean))
          case None =>
            MediaFeatures(r.doc_id, r.n_bytes, mean, hash, prefix,
              "binary", None, None, None, None)
        }
      }
    }
  }

  /** Perceptual difference-hash (dHash) per image: decode, sample the
    * codec's 8×8 nearest-neighbor luma grid, emit one bit per horizontal
    * neighbor comparison — 7 bits × 8 rows = a 56-bit signature (the
    * standard 9×8 dHash uses 64; 56 keeps the value off the sign bit so
    * both engines sum bit·2^idx in plain BIGINTs). Gradient SIGNS are
    * what survive re-encode/resize/brightness shifts, which is why
    * dHash is the standard cheap image near-dup fingerprint (public
    * technique, widely documented alongside aHash/pHash). Non-image
    * blobs decode to None and carry no perceptual hash.
    *
    * Scale: one mapPartitions decode pass (the codec-amortized batch
    * shape above); downstream pairing reuses the token-simhash
    * chunk-bucket machinery unchanged
    * ([[graft.dedup.SimHash.nearDuplicatesFromSigs]]). */
  def dHashes(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        ImageCodec.decode(r.media, thumbSide = 8).map { d =>
          var h = 0L
          var gy = 0
          while (gy < 8) {
            var gx = 0
            while (gx < 7) {
              val a = d.thumb(gy * 8 + gx) & 0xFF
              val b = d.thumb(gy * 8 + gx + 1) & 0xFF
              if (a < b) h |= 1L << (gy * 7 + gx)
              gx += 1
            }
            gy += 1
          }
          (r.doc_id, h)
        }
      }
    }.toDF("doc_id", "simhash")
  }

  /** A sampled frame: 1→many child rows of a media row. */
  final case class MediaFrame(doc_id: Long, frame_idx: Long, frame: Array[Byte])

  /** Frame sampling — the video-side analogue of text chunking: treat the
    * byte stream as fixed-size frames and emit every `stride`-th one.
    * The slicer is the stand-in for a demuxer (the 1→many generate
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

  /** End-to-end: pack (even ids as real PNGs, odd ids as opaque bytes) →
    * batch-decode → feature table exercising both codec paths. */
  def pipeline(spark: SparkSession, docs: DataFrame): DataFrame = {
    val images = packImages(docs.filter(col("doc_id") % 2 === 0))
    val opaque = pack(docs.filter(col("doc_id") % 2 =!= 0))
    extractFeatures(images.unionByName(opaque)).toDF()
      .select("doc_id", "n_bytes", "byte_mean", "head_hash",
        "format", "width", "height", "channels", "luma_mean")
  }
}
