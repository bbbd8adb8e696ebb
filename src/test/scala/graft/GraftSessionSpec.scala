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

  test("snapshot-free suppression denies ONLY the localCheckpoint caveat (ADVICE r15)") {
    GraftSession.silenceSnapshotFreeWarning()
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val name = "org.apache.spark.rdd.MapPartitionsRDD"
    val lc = ctx.getConfiguration.getLoggerConfig(name)
    // a DEDICATED config exists for the class (not the root fallback),
    // stays additive, and its filter is message-scoped, not a level cut
    lc.getName shouldBe name
    lc.isAdditive shouldBe true
    val filter = lc.getFilter
    filter should not be null
    def eventWith(msg: String) =
      org.apache.logging.log4j.core.impl.Log4jLogEvent.newBuilder()
        .setLoggerName(name)
        .setLevel(org.apache.logging.log4j.Level.WARN)
        .setMessage(new org.apache.logging.log4j.message.SimpleMessage(msg))
        .build()
    filter.filter(eventWith(
      "RDD 42 was locally checkpointed, its lineage has been truncated " +
        "and it can no longer be recomputed after unpersisting")) shouldBe
      org.apache.logging.log4j.core.Filter.Result.DENY
    // any OTHER warning from the same class passes through untouched
    filter.filter(eventWith(
      "Some unrelated warning about this RDD")) shouldBe
      org.apache.logging.log4j.core.Filter.Result.NEUTRAL
  }
}
