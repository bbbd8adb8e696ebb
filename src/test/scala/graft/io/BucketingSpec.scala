package graft.io

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** Plan evidence for the DESIGN.md §1 layout claims: bucketing pins the
  * co-located join, and Hive-style partitioning prunes day queries down to
  * one directory. These are the two levers that keep the 100 TB fact⋈fact
  * join and the per-day pipeline off the network. */
class BucketingSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val fact = (1L to 1000L).map(i => (i % 100, i, i * 2.0)).toDF("k", "id", "v")
    val other = (1L to 500L).map(i => (i % 100, i * 10)).toDF("k", "w")
    fact.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bspec_fact")
    other.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bspec_other")
    // disable broadcast so the join strategy must co-locate or shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bspec_fact").join(spark.table("bspec_other"), Seq("k"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      (p should not).include("Exchange hashpartitioning")
      joined.count() shouldBe (1000L * 5) // each k has 10 fact × 5 other rows
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE bspec_fact")
      spark.sql("DROP TABLE bspec_other")
    }
  }

  test("date-partitioned table prunes to one partition for a day query") {
    val days = Seq("2019-10-01", "2019-10-02", "2019-10-03")
    days.flatMap(d => (1 to 10).map(i => (d, i.toLong))).toDF("event_date", "v")
      .write.mode("overwrite").partitionBy("event_date").saveAsTable("bspec_part")
    try {
      val q = spark.table("bspec_part").filter($"event_date" === "2019-10-02")
      val scan = q.queryExecution.executedPlan.toString
      scan should include("PartitionFilters")
      // the physical scan must report exactly 1 of 3 partitions selected
      val pruned = q.queryExecution.executedPlan.collectLeaves().map(_.toString)
        .exists(s => s.contains("PartitionFilters") && s.contains("event_date"))
      pruned shouldBe true
      q.count() shouldBe 10
      // negative control: unfiltered reads all days
      spark.table("bspec_part").count() shouldBe 30
    } finally spark.sql("DROP TABLE bspec_part")
  }
}
