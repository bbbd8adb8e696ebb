package graft.queries

import graft.SparkSpec

class CleanHoldoutSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("planted copy families are never isolated; their window counts agree") {
    val rows = CorpusQueries.cleanHoldout(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val off = CorpusQueries.docOff(spark, dir)
    // every original 0..49 has an exact copy at +2·off: both fully shared
    (0L until 50L).foreach { id =>
      withClue(s"doc $id: ") {
        rows(id).getBoolean(3) shouldBe false
        rows(id + 2 * off).getBoolean(3) shouldBe false
        // the exact copy shares EVERY window
        rows(id + 2 * off).getLong(2) shouldBe rows(id + 2 * off).getLong(1)
      }
    }
  }

  test("isolation partitions the corpus: isolated docs have zero shared windows") {
    val rows = CorpusQueries.cleanHoldout(spark, dir).collect()
    rows.foreach { r =>
      r.getLong(1) should be >= 1L // every non-null doc has >= 1 window
      r.getLong(2) should be <= r.getLong(1)
      r.getBoolean(3) shouldBe (r.getLong(2) == 0L)
    }
    // the organic corpus is mostly unique text: some isolated docs exist
    rows.count(_.getBoolean(3)) should be > 0
  }
}
