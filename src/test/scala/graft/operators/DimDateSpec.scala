package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DimDateSpec extends SparkSpec {

  test("reference golden: 2019-10-01..2020-03-31 is exactly 183 rows") {
    // logs/dag_id=load_dim_date: "Loaded 183 rows" (SURVEY §2.8 F2)
    DimDate.build(spark, "2019-10-01", "2020-03-31").count() shouldBe 183
  }

  test("weekday is Monday=0 like pandas (§7.4.4)") {
    val d = DimDate.build(spark, "2019-10-07", "2019-10-13") // Mon..Sun
      .orderBy("date").select("weekday").collect().map(_.getLong(0)).toSeq
    d shouldBe Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L)
  }

  test("ISO week boundary: 2019-12-30 and 31 belong to week 1 of 2020 (§7.4.5)") {
    val rows = DimDate.build(spark, "2019-12-28", "2020-01-01")
      .orderBy("date").select("date", "week").collect()
    rows.map(r => (r.getDate(0).toString, r.getLong(1))).toSeq shouldBe Seq(
      ("2019-12-28", 52L), ("2019-12-29", 52L),
      ("2019-12-30", 1L), ("2019-12-31", 1L), ("2020-01-01", 1L))
  }

  test("calendar parts are consistent") {
    val r = DimDate.build(spark, "2020-02-29", "2020-02-29").collect()(0)
    (r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe ((29L, 2L, 2020L))
    r.getLong(4) shouldBe 5L // Saturday
  }
}
