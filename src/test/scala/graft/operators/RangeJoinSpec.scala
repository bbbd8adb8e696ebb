package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq((1L, 0.0), (2L, 9.99), (3L, 10.0), (4L, 25.0), (5L, 99.0))
    .toDF("pid", "v")
  private val intervals = Seq((10L, 0.0, 10.0), (20L, 5.0, 30.0), (30L, 95.0, 95.5))
    .toDF("iid", "lo", "hi")

  test("point-in-interval matches the naive inequality join, half-open bounds") {
    val got = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 7.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = points.collect().flatMap { p =>
      intervals.collect().collect {
        case i if p.getDouble(1) >= i.getDouble(1) && p.getDouble(1) < i.getDouble(2) =>
          (p.getLong(0), i.getLong(0))
      }
    }.toSet
    got shouldBe want
    got should contain((1L, 10L)) // lo inclusive
    (got should not).contain((3L, 10L)) // hi exclusive
    (got should not).contain((5L, 30L)) // outside the short interval
  }

  test("no cartesian/nested-loop join in the plan — it's an equi join on buckets") {
    val plan = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 7.0)
      .queryExecution.executedPlan.toString
    (plan should not).include("CartesianProduct")
    (plan should not).include("BroadcastNestedLoopJoin")
  }

  test("overlapping column names and bad widths are rejected") {
    an[IllegalArgumentException] should be thrownBy
      RangeJoin.pointInInterval(points, "v", points, "v", "v", 1.0)
    an[IllegalArgumentException] should be thrownBy
      RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 0.0)
  }

  test("null points/bounds drop; negative values bucket correctly") {
    val p = Seq((1L, Some(-5.0)), (2L, None), (3L, Some(-20.0)))
      .toDF("pid", "v")
    val iv = Seq((10L, Some(-10.0), Some(0.0)), (20L, None, Some(5.0)), (30L, Some(0.0), None))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, "v", iv, "lo", "hi", 7.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    got shouldBe Set((1L, 10L)) // -5 ∈ [-10, 0); nulls never match
  }

  test("non-finite bounds raise the crafted guard, not an opaque ANSI overflow") {
    // hi=+inf: double-arithmetic span = +inf fails the guard; the old
    // long-typed check would ArithmeticException on ub−lb first.
    val inf = Seq((1L, -5.0, Double.PositiveInfinity)).toDF("iid", "lo", "hi")
    val ex1 = intercept[Exception] {
      RangeJoin.pointInInterval(points, "v", inf, "lo", "hi", 7.0).collect()
    }
    ex1.getMessage should include("buckets of width")
    // NaN sorts greatest in Spark, so a NaN hi passes the lo<=hi filter;
    // the NaN span must still route to the guard.
    val nan = Seq((1L, 0.0, Double.NaN)).toDF("iid", "lo", "hi")
    val ex2 = intercept[Exception] {
      RangeJoin.pointInInterval(points, "v", nan, "lo", "hi", 7.0).collect()
    }
    ex2.getMessage should include("buckets of width")
  }

  test("a pathologically wide interval fails fast with a usable message") {
    val iv = Seq((1L, 0.0, 1e12)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, "v", iv, "lo", "hi", 0.001).collect()
    }
    ex.getMessage should include("buckets of width")
  }
}
