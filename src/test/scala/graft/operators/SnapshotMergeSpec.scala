package graft.operators

import graft.SparkSpec

class SnapshotMergeSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("full transition matrix across three versions") {
    val v1 = snap(1L -> "stable", 2L -> "old", 3L -> "comeback", 6L -> "gone-after-v1")
    val v2 = snap(1L -> "stable", 2L -> "new", 4L -> "brief")
    val v3 = snap(1L -> "stable", 2L -> "new", 3L -> "comeback", 5L -> "fresh")
    val out = SnapshotMerge.mergeAll(Seq((1L, v1), (2L, v2), (3L, v3)))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))).toMap

    out(1L) shouldBe ((1L, 1L, 3L, "unchanged"))   // never changed
    out(2L) shouldBe ((1L, 2L, 3L, "unchanged"))   // changed at v2, stable at v3
    out(3L) shouldBe ((1L, 3L, 3L, "added"))       // removed at v2, re-added at v3; first_seen preserved
    out(4L) shouldBe ((2L, 2L, 2L, "removed"))     // lived only in v2
    out(5L) shouldBe ((3L, 3L, 3L, "added"))       // brand new at v3
    out(6L) shouldBe ((1L, 1L, 1L, "removed"))     // removed at v2, still gone at v3
    out.size shouldBe 6
  }

  test("single snapshot yields an all-added state") {
    val out = SnapshotMerge.mergeAll(Seq((7L, snap(1L -> "a", 2L -> "b"))))
      .collect()
    out.length shouldBe 2
    out.foreach { r =>
      r.getLong(2) shouldBe 7L
      r.getString(5) shouldBe "added"
    }
  }

  test("merge state agrees with pairwise diff on two snapshots") {
    val v1 = snap(1L -> "a", 2L -> "b", 3L -> "c")
    val v2 = snap(2L -> "b", 3L -> "c2", 4L -> "d")
    val merged = SnapshotMerge.mergeAll(Seq((1L, v1), (2L, v2)))
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    val diff = SnapshotDiff.diff(v1, v2, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    merged shouldBe diff
  }

  test("versions must ascend") {
    intercept[IllegalArgumentException] {
      SnapshotMerge.mergeAll(Seq((2L, snap(1L -> "a")), (1L, snap(1L -> "a"))))
    }
  }
}
