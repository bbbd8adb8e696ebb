package graft.multimodal

import graft.SparkSpec
import graft.dedup.SimHash

class PerceptualHashSpec extends SparkSpec {
  import spark.implicits._

  private def pairsOf(docs: Seq[(Long, String)], maxDist: Int = 4) =
    SimHash.nearDuplicatesFromSigs(
      Multimodal.dHashes(Multimodal.packImages(
        docs.toDF("doc_id", "text"))), maxDist = maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("identical texts render identical images: a Hamming-0 pair") {
    val out = pairsOf(Seq(
      (1L, "the quick brown fox jumps over the lazy dog repeatedly"),
      (2L, "the quick brown fox jumps over the lazy dog repeatedly")))
    out should contain((1L, 2L, 0L))
  }

  test("a small byte mutation lands in the near-miss band, not at 0") {
    // 'am' -> 'zm' flips the (0,0)->(1,0) gradient sign: byte0 'a' < byte2
    // 'm' in the original, 'z' < 'm' fails in the mutant
    val base = "am" + ("x" * 300)
    val out = pairsOf(Seq((1L, base), (2L, "zz" + base.substring(2))))
    val p = out.find(t => t._1 == 1L && t._2 == 2L)
    p should be(defined)
    p.get._3 should be >= 1L
    p.get._3 should be <= 4L
  }

  test("opposite gradients share no signature bits: no pair within the band") {
    // strictly increasing vs strictly decreasing byte ramps tile the
    // raster with all-ascending vs all-descending gradients
    val up = ('a' to 'z').mkString * 10
    val down = ('a' to 'z').mkString.reverse * 10
    pairsOf(Seq((1L, up), (2L, down))) shouldBe empty
  }

  test("non-image blobs carry no perceptual hash") {
    val media = Multimodal.pack(
      Seq((1L, "just opaque bytes")).toDF("doc_id", "text"))
    Multimodal.dHashes(media).count() shouldBe 0L
  }

  test("dHash is a pure function of the decoded raster: stable across runs") {
    val docs = Seq((1L, "stability probe alpha"), (2L, "stability probe beta"))
      .toDF("doc_id", "text")
    val a = Multimodal.dHashes(Multimodal.packImages(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = Multimodal.dHashes(Multimodal.packImages(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    a shouldBe b
  }
}
