package graft.text

import graft.SparkSpec

class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String): Seq[(Long, String)] =
    CdcChunk.chunks(Seq((1L, text)).toDF("doc_id", "text"))
      .orderBy("chunk_idx")
      .collect().map(r => (r.getAs[Long]("chunk_idx"), r.getAs[String]("chunk_text"))).toSeq

  private def md5Hex1(tok: String): Char = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    java.lang.Character.forDigit((d(0) >> 4) & 0xf, 16)
  }

  test("boundaries are exactly the tokens whose md5 starts with 0 or 1") {
    val toks = "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split(" ")
    val chunks = chunksOf(toks.mkString(" "))
    // reconstruct expected boundaries independently
    val expected = scala.collection.mutable.ArrayBuffer(scala.collection.mutable.ArrayBuffer[String]())
    toks.zipWithIndex.foreach { case (t, i) =>
      if (i > 0 && "01".contains(md5Hex1(t))) expected += scala.collection.mutable.ArrayBuffer[String]()
      expected.last += t
    }
    chunks.map(_._2) shouldBe expected.map(_.mkString(" ")).toSeq
    chunks.map(_._1) shouldBe chunks.indices.map(_.toLong)
  }

  test("edit robustness: a front insertion leaves all later chunks identical") {
    val base = (1 to 60).map(i => s"w${i * 37 % 101}").mkString(" ")
    val a = chunksOf(base).map(_._2)
    val b = chunksOf(s"inserted $base").map(_._2)
    // Only the chunk containing the insertion differs; every chunk after
    // the first boundary re-aligns. (Fixed windows would shift them ALL.)
    a.size should be > 2
    (a.toSet intersect b.toSet).size should be >= a.size - 1
  }

  test("empty and whitespace-only docs yield no chunks; chunks partition the tokens") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val out = CdcChunk.chunks(df).collect()
    out.map(_.getLong(0)).distinct.toSeq shouldBe Seq(3L)
    out.map(_.getAs[Long]("n_tokens")).sum shouldBe 8L
    out.map(_.getAs[String]("chunk_text")).mkString(" ") shouldBe
      "one two three four five six seven eight"
  }

  test("plan is a pure generate: no shuffle") {
    val plan = CdcChunk.chunks(Seq((1L, "a b c")).toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }
}
