package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CanonicalSpec extends SparkSpec {
  import spark.implicits._

  private def canonOf(s: String): String =
    Seq((1L, s)).toDF("doc_id", "text")
      .select(Canonical.canonicalize(col("text")).as("c"))
      .as[String].collect()(0)

  test("NFC composes combining marks before anything else sees them") {
    // e + U+0301 (combining acute) → é → unaccented e
    canonOf("e\u0301cole") shouldBe "ecole"
    // u + U+0308 (combining diaeresis) → ü → u
    canonOf("zu\u0308rich") shouldBe "zurich"
  }

  test("precomposed accents strip to their base letters") {
    canonOf("caf\u00e9 na\u00efve s\u00f8") shouldBe "cafe naive s\u00f8"
    // ø has no canonical decomposition — it must survive untouched
  }

  test("NBSP becomes a space and whitespace runs collapse") {
    canonOf("a\u00a0b") shouldBe "a b"
    canonOf("  a \t b\u00a0\u00a0 c  ") shouldBe "a b c"
  }

  test("pure-ASCII text only gets the whitespace treatment (fast path = slow path)") {
    canonOf("hello   world") shouldBe "hello world"
    canonOf("unchanged") shouldBe "unchanged"
  }

  test("null text stays null; lengths are code-point counts") {
    val out = Seq((1L, Option.empty[String]), (2L, Option("e\u0301, caf\u00e9")))
      .toDF("doc_id", "text")
    val rows = Canonical.canonicalized(out).orderBy("doc_id").collect()
    rows(0).isNullAt(1) shouldBe true
    rows(1).getString(1) shouldBe "e, cafe"
    rows(1).getLong(2) shouldBe 8L // e,0301,comma,space,c,a,f,é
    rows(1).getLong(3) shouldBe 7L
  }

  test("the expressions stay inside whole-stage codegen") {
    // a range-backed plan: local Seqs constant-fold to LocalTableScan
    val df = spark.range(4)
      .select(concat(lit("caf\u00e9 "), col("id").cast("string")).as("text"))
      .select(Canonical.canonicalize(col("text")))
    val plan = df.queryExecution.executedPlan.toString
    // "*(1)" is the WholeStageCodegen marker on the Project node
    plan should include("*(1) Project")
    plan.toLowerCase should include("graft_nfc")
  }

  test("idempotence: canonicalizing a canonical string is identity") {
    val samples = Seq("e\u0301cole  caf\u00e9\u00a0x", "plain ascii", "  pad  ")
    samples.foreach { s => canonOf(canonOf(s)) shouldBe canonOf(s) }
  }
}
