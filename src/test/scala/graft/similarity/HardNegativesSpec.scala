package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  // 2-D unit-ish vectors with obvious geometry: ids 0/1/2 point east
  // (label 0 except id 2), id 3 north, id 4 north-east (label 1).
  private val vecs = Seq(
    (0L, Seq(1.0, 0.0), 0),
    (1L, Seq(0.99, 0.1), 0),
    (2L, Seq(0.98, 0.05), 1),
    (3L, Seq(0.0, 1.0), 1),
    (4L, Seq(0.7, 0.7), 1)).toDF("id", "vec", "label")

  test("negatives exclude the query's own label and itself") {
    val out = Ann.hardNegatives(vecs.filter($"id" === 0), vecs, k = 10).collect()
    out.map(_.getLong(2)) should contain theSameElementsAs Seq(2L, 3L, 4L)
    out.foreach(_.getInt(3) should not be 0)
  }

  test("ranking is by exact cosine: the closest other-label vector is rank 1") {
    val out = Ann.hardNegatives(vecs.filter($"id" === 0), vecs, k = 1).collect()
    out.length shouldBe 1
    out(0).getLong(2) shouldBe 2L // nearly parallel to the query, label 1
    out(0).getDouble(4) shouldBe
      (0.98 / math.sqrt(0.98 * 0.98 + 0.05 * 0.05)) +- 1e-12
  }

  test("a query whose label covers the whole corpus yields nothing") {
    val mono = Seq((0L, Seq(1.0, 0.0), 7), (1L, Seq(0.5, 0.5), 7))
      .toDF("id", "vec", "label")
    Ann.hardNegatives(mono.filter($"id" === 0), mono, k = 5).count() shouldBe 0
  }

  test("queries are broadcast; the corpus side streams") {
    val plan = Ann.hardNegatives(vecs.filter($"id" === 0), vecs, k = 2)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastNestedLoopJoin")
  }
}
