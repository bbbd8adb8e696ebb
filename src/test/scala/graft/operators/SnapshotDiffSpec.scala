package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("classifies every key: added, removed, changed, unchanged") {
    val old  = snap((1L, "same"), (2L, "before"), (3L, "gone"))
    val newer = snap((1L, "same"), (2L, "after"), (4L, "fresh"))
    val byId = SnapshotDiff.diff(old, newer, "doc_id")
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    byId shouldBe Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added")
  }

  test("null text fingerprints as empty — a null-to-empty edit is unchanged") {
    val old  = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
    val newer = Seq((1L, Option(""))).toDF("doc_id", "text")
    SnapshotDiff.diff(old, newer, "doc_id").select("status")
      .as[String].collect() shouldBe Array("unchanged")
  }

  test("fingerprints are present on both sides of changed rows, null on missing sides") {
    val old  = snap((1L, "x"))
    val newer = snap((2L, "y"))
    val rows = SnapshotDiff.diff(old, newer, "doc_id")
      .orderBy("doc_id").collect()
    rows(0).getAs[String]("status") shouldBe "removed"
    rows(0).getAs[String]("old_fp") should not be null
    rows(0).getAs[String]("new_fp") shouldBe null
    rows(1).getAs[String]("status") shouldBe "added"
    rows(1).getAs[String]("old_fp") shouldBe null
  }

  test("custom fingerprint column diffs on the chosen payload only") {
    val old  = Seq((1L, "a", 10)).toDF("doc_id", "text", "meta")
    val newer = Seq((1L, "a", 99)).toDF("doc_id", "text", "meta")
    // text-only fingerprint: meta churn is invisible
    SnapshotDiff.diff(old, newer, "doc_id").select("status")
      .as[String].collect() shouldBe Array("unchanged")
    // meta-inclusive fingerprint: the same edit is a change
    val fp = md5(concat_ws("", col("text"), col("meta").cast("string")))
    SnapshotDiff.diff(old, newer, "doc_id", fp).select("status")
      .as[String].collect() shouldBe Array("changed")
  }

  test("the join exchanges fingerprints, not text (projection below the join)") {
    val old  = snap((1L, "some long document body"))
    val newer = snap((1L, "some long document body"))
    val plan = SnapshotDiff.diff(old, newer, "doc_id")
      .queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    joins should not be empty
    // each join input is the per-side (key, fingerprint) projection
    joins.foreach(_.children.foreach(
      _.output.map(_.name) should contain noneOf ("text", "meta")))
  }
}
