package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ArrayDotProductSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot matches the interpreted higher-order fold exactly") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq((Seq(1.5, -2.0, 3.25), Seq(4.0, 0.5, -1.0))).toDF("a", "b")
    val fast = df.select(GraftFunctions.dot(spark, $"a", $"b")).as[Double].collect()(0)
    val slow = df.select(graft.similarity.Vectors.dot($"a", $"b")).as[Double].collect()(0)
    fast shouldBe slow
    fast shouldBe (1.5 * 4.0 + -2.0 * 0.5 + 3.25 * -1.0)
  }

  test("null array yields null; registration is idempotent") {
    GraftFunctions.ensureRegistered(spark)
    GraftFunctions.ensureRegistered(spark)
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    df.select(GraftFunctions.dot(spark, $"a", $"b")).collect()(0).isNullAt(0) shouldBe true
  }

  test("expression participates in whole-stage codegen") {
    GraftFunctions.ensureRegistered(spark)
    // range + runtime-built arrays: not constant-foldable, so the plan must
    // actually run the expression inside a codegen stage.
    val df = spark.range(3)
      .select(array($"id".cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), lit(4.0)).as("b"))
      .select(GraftFunctions.dot(spark, $"a", $"b").as("d"))
    df.queryExecution.executedPlan.toString should include("*(1)")
    df.as[Double].collect().sorted.toSeq shouldBe Seq(8.0, 11.0, 14.0)
  }

  test("works via SQL after extension registration") {
    GraftFunctions.ensureRegistered(spark)
    spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].collect()(0) shouldBe 11.0
  }
}
