package graft.text

import graft.SparkSpec

class PiiRedactSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("masks emails, IPv4s and phones; counts each category") {
    val r = PiiRedact.redact(docs(
      (1L, "mail a.b+c@ex-ample.org or root@h.io from 192.168.0.1 call +1 (555) 010-0042")))
      .collect()(0)
    r.getAs[Long]("n_emails") shouldBe 2
    r.getAs[Long]("n_ips") shouldBe 1
    r.getAs[Long]("n_phones") shouldBe 1
    r.getAs[String]("text_redacted") shouldBe
      "mail <EMAIL> or <EMAIL> from <IP> call <PHONE>"
  }

  test("clean text passes through untouched") {
    val r = PiiRedact.redact(docs((1L, "no pii here just words"))).collect()(0)
    r.getAs[String]("text_redacted") shouldBe "no pii here just words"
    r.getAs[Long]("n_emails") shouldBe 0
    r.getAs[Long]("n_ips") shouldBe 0
    r.getAs[Long]("n_phones") shouldBe 0
  }

  test("email is consumed before the IP pass (dotted-quad domain not split)") {
    // The host part contains a dotted quad; running the IP pass first
    // would shred the address into 'bob@<IP>.net'. Order: email wins whole.
    val r = PiiRedact.redact(docs((1L, "mail me at bob@10.0.0.1.net"))).collect()(0)
    r.getAs[String]("text_redacted") shouldBe "mail me at <EMAIL>"
    r.getAs[Long]("n_ips") shouldBe 1 // the count sees the raw text — documented
  }

  test("plan is a pure projection: no shuffle") {
    val plan = PiiRedact.redact(docs((1L, "a")))
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }
}
