package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "abc"), (2L, ""), (3L, "hello world"))
    .toDF("doc_id", "text")

  test("pack produces binary media with correct byte metadata") {
    val packed = Multimodal.pack(docs).collect().sortBy(_.doc_id)
    packed.map(_.n_bytes).toSeq shouldBe Seq(3L, 0L, 11L)
    packed(0).media.toSeq shouldBe "abc".getBytes("UTF-8").toSeq
    packed.forall(_.mime == "application/x-fake") shouldBe true
  }

  test("feature extraction is deterministic and batch-shaped") {
    val f1 = Multimodal.pipeline(spark, docs).orderBy("doc_id").collect()
    val f2 = Multimodal.pipeline(spark, docs.repartition(3)).orderBy("doc_id").collect()
    f1.toSeq shouldBe f2.toSeq // partitioning must not change features
    // 'abc' = bytes 97,98,99 → mean 98
    f1(0).getAs[Double]("byte_mean") shouldBe 98.0
    f1(1).getAs[Double]("byte_mean") shouldBe 0.0 // empty payload guarded
  }

  test("thumb is a bounded byte prefix (resize stand-in)") {
    val feats = Multimodal.extractFeatures(Multimodal.pack(docs)).collect()
    all(feats.map(_.thumb.length)) should be <= 16
  }

  test("frame sampling emits every stride-th fixed-size frame, drops the tail") {
    import spark.implicits._
    // 100 bytes / 16-byte frames -> 6 whole frames (idx 0..5); stride 2
    // keeps 0, 2, 4; the 4-byte tail is dropped.
    val bytes = Array.tabulate[Byte](100)(_.toByte)
    val media = Seq(Multimodal.MediaRow(1L, bytes, "application/x-fake", 100L)).toDS()
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, stride = 2)
      .collect().sortBy(_.frame_idx)
    frames.map(_.frame_idx) shouldBe Array(0L, 2L, 4L)
    frames.foreach(_.frame.length shouldBe 16)
    frames(1).frame.head shouldBe 32.toByte // frame 2 starts at byte 32
  }
}
