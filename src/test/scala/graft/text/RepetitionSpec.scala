package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("collapses consecutive duplicate runs, keeps non-adjacent repeats") {
    val r = Repetition.collapseRuns(docs((1L, "batch batch batch stream batch")))
      .collect()(0)
    r.getAs[String]("text_clean") shouldBe "batch stream batch"
    r.getAs[Long]("n_tokens") shouldBe 5
    r.getAs[Long]("n_collapsed") shouldBe 2
  }

  test("no runs → text unchanged (modulo lowering), zero collapsed") {
    val r = Repetition.collapseRuns(docs((1L, "The fast KEY order"))).collect()(0)
    r.getAs[String]("text_clean") shouldBe "the fast key order"
    r.getAs[Long]("n_collapsed") shouldBe 0
  }

  test("empty text and whitespace runs") {
    val rows = Repetition.collapseRuns(docs((1L, ""), (2L, "  a   a  b ")))
      .orderBy("doc_id").collect()
    rows(0).getAs[String]("text_clean") shouldBe ""
    rows(0).getAs[Long]("n_tokens") shouldBe 1 // split("") = [""]
    rows(0).getAs[Long]("n_collapsed") shouldBe 0
    rows(1).getAs[String]("text_clean") shouldBe "a b"
    rows(1).getAs[Long]("n_collapsed") shouldBe 1
  }

  test("null text rows are excluded (corpus contract)") {
    val df = Seq((1L, Option("a a")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    Repetition.collapseRuns(df).count() shouldBe 1
  }

  test("plan is a pure projection: no shuffle, no UDF") {
    val plan = Repetition.collapseRuns(docs((1L, "a a b")))
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should not include "BatchEvalPython"
  }
}
