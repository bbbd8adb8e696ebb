package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // 5 docs share a boilerplate line; each has a unique content line.
  private def corpus = docs((0L to 4L).map(i =>
    i -> s"shared footer line\ncontent $i\nalso shared here"): _*)

  test("drops lines in >= minDocs docs, keeps unique content in order") {
    val out = LineDedup.dedupLines(corpus, minDocs = 5).orderBy("doc_id").collect()
    out should have length 5
    out.zipWithIndex.foreach { case (r, i) =>
      r.getAs[String]("text_clean") shouldBe s"content $i"
      r.getAs[Long]("n_lines") shouldBe 3
      r.getAs[Long]("n_dropped") shouldBe 2
    }
  }

  test("below-threshold lines survive") {
    val out = LineDedup.dedupLines(corpus, minDocs = 6).orderBy("doc_id").collect()
    out.foreach(_.getAs[Long]("n_dropped") shouldBe 0)
    out(0).getAs[String]("text_clean") shouldBe
      "shared footer line\ncontent 0\nalso shared here"
  }

  test("a line repeated within ONE doc does not count as boilerplate") {
    val df = docs(
      (1L, "echo\necho\necho"), // one doc, three copies of the same line
      (2L, "other"))
    // minDocs=2: 'echo' appears in only 1 distinct doc → kept.
    val out = LineDedup.dedupLines(df, minDocs = 2).orderBy("doc_id").collect()
    out(0).getAs[String]("text_clean") shouldBe "echo\necho\necho"
  }

  test("doc whose every line is boilerplate disappears") {
    val df = docs((1L, "x"), (2L, "x"), (3L, "x\nunique"))
    val out = LineDedup.dedupLines(df, minDocs = 3).orderBy("doc_id").collect()
    out.map(_.getLong(0)) shouldBe Array(3L)
    out(0).getAs[String]("text_clean") shouldBe "unique"
  }

  test("null text rows are excluded (corpus contract)") {
    val df = Seq((1L, Option("a\nb")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    LineDedup.dedupLines(df, minDocs = 10).count() shouldBe 1
  }

  test("heavy-line set is broadcast (no full second shuffle of the corpus)") {
    val plan = LineDedup.dedupLines(corpus, minDocs = 5)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should include("LeftAnti")
  }
}
