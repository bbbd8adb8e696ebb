package graft

import org.apache.spark.sql.functions._

class GraftSessionSpec extends SparkSpec {

  test("getOrCreate registers graft_dot even on a pre-existing session") {
    // The shared test session was built WITHOUT the extensions conf —
    // the factory must still make the native expression callable.
    val s = GraftSession.getOrCreate()
    import s.implicits._
    val v = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .select(call_function("graft_dot", col("a"), col("b")))
      .as[Double].collect()(0)
    v shouldBe 11.0
  }

  test("builder pins UTC and AQE on the session it yields") {
    // getOrCreate applies the builder's options to the (shared) session.
    val s = GraftSession.getOrCreate()
    s.conf.get("spark.sql.session.timeZone") shouldBe "UTC"
    s.conf.get("spark.sql.adaptive.enabled") shouldBe "true"
  }
}
