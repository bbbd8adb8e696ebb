package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S11 — the deleted `user_processing` DAG surface (SURVEY §0/§2.1): raw
  * SQL DDL + INSERT + SELECT through `spark.sql`, plus F8 random-id
  * generation. The reference ran these via SQLExecuteQueryOperator against
  * Postgres; the engine's SQL front-end covers them natively. */
class LegacySqlSpec extends SparkSpec {

  test("CREATE TABLE / INSERT / SELECT round-trip (user_processing DAG)") {
    spark.sql("DROP TABLE IF EXISTS users")
    spark.sql(
      """CREATE TABLE users (
        |  id BIGINT, firstname STRING, lastname STRING,
        |  email STRING, created_at TIMESTAMP)
        |USING parquet""".stripMargin)
    spark.sql(
      """INSERT INTO users VALUES
        |  (1, 'John', 'Doe', 'jd@example.com', TIMESTAMP '2025-07-24 10:00:00'),
        |  (2, 'Jane', 'Roe', 'jr@example.com', TIMESTAMP '2025-07-24 10:01:00')""".stripMargin)
    val rows = spark.sql("SELECT * FROM users ORDER BY id").collect()
    rows.length shouldBe 2 // reference log: "Rows affected: 2"
    rows(0).getAs[String]("firstname") shouldBe "John"
    spark.sql("DROP TABLE users")
  }

  test("F8: random id generation is bounded and seedable") {
    val ids = spark.range(1000)
      .select(floor(rand(seed = 7) * 10000).cast("long").as("user_id"))
    val collected = ids.collect().map(_.getLong(0))
    all(collected) should (be >= 0L and be < 10000L)
    // seeded → deterministic across plans
    val again = spark.range(1000)
      .select(floor(rand(seed = 7) * 10000).cast("long").as("user_id"))
      .collect().map(_.getLong(0))
    collected.toSeq shouldBe again.toSeq
  }

  test("q44: users DDL round-trip is idempotent — a re-run re-creates, never appends") {
    val d = sf("sf0.001")
    val first = LegacySql.usersRoundTrip(spark, d).collect()
    first.length shouldBe 2 // reference log: "Rows affected: 2"
    val again = LegacySql.usersRoundTrip(spark, d).collect()
    again.length shouldBe 2 // NOT 4 — drop+wipe+create, the reference's replace semantics
    first.map(_.toString).sorted.toSeq shouldBe again.map(_.toString).sorted.toSeq
  }

  test("q46: seeded ids are partition-invariant and bounded — the scaladoc's claim vs rand(seed)") {
    val d = sf("sf0.001")
    val base = LegacySql.seededIds(spark, d).orderBy("n").collect().map(_.getLong(1))
    all(base.toSeq) should (be >= 0L and be < 10000L)
    // the property rand(seed) does NOT have: invariance to partitioning
    val repart = LegacySql.seededIds(spark, d)
      .repartition(7).orderBy("n").collect().map(_.getLong(1))
    base.toSeq shouldBe repart.toSeq
    // different seeds give different streams
    val other = LegacySql.seededIds(spark, d, seed = 8L).orderBy("n")
      .collect().map(_.getLong(1))
    base.toSeq should not be other.toSeq
  }

  test("q47: mart round-trip is idempotent and the S6 empty day leaves no partition") {
    val d = sf("sf0.001")
    val first = LegacySql.martRoundTrip(spark, d).collect().map(_.toString).sorted.toSeq
    val again = LegacySql.martRoundTrip(spark, d).collect().map(_.toString).sorted.toSeq
    first shouldBe again // dynamic overwrite of the same day, not an append
    // S6: the empty 1999-01-01 write was skipped — the crawler table
    // holds exactly one dt partition
    spark.table("agg_daily_counts_rt").select("dt").distinct().collect()
      .map(_.getString(0)).toSeq shouldBe Seq("2024-01-15")
    // cross-dir re-point (review r18): running q47 over a SECOND corpus
    // in the same session must serve the second corpus's aggregate, not
    // the first root's stale partitions
    import spark.implicits._
    val other = LegacySql.martRoundTrip(spark, sf("sf0.01"))
      .agg(org.apache.spark.sql.functions.sum("n")).as[Long].head()
    val direct = graft.Tables.events(spark, sf("sf0.01"))
      .filter(org.apache.spark.sql.functions.to_date(col("ts")) === "2024-01-15")
      .count()
    other shouldBe direct
    first should not be LegacySql.martRoundTrip(spark, sf("sf0.01"))
      .collect().map(_.toString).sorted.toSeq
  }

  test("A7: legacy 7-key wide fact rollup shape") {
    import spark.implicits._
    val staged = Seq(
      ("2019-10-01", "view", 1L, 10L, "b1", 100L, "s1", 5.0),
      ("2019-10-01", "view", 1L, 10L, "b1", 100L, "s1", 5.0),
      ("2019-10-01", "purchase", 1L, 10L, "b1", 100L, "s1", 5.0)
    ).toDF("event_date", "event_type", "product_id", "category_id", "brand",
      "user_id", "user_session", "price")
    val out = staged.groupBy("event_date", "event_type", "product_id",
        "category_id", "brand", "user_id", "user_session")
      .agg(count(lit(1)).as("total_events"),
        sum(when($"event_type" === "purchase", $"price").otherwise(0.0))
          .as("total_revenue"))
    out.count() shouldBe 2
    out.filter($"event_type" === "view").select("total_events")
      .as[Long].collect()(0) shouldBe 2
  }
}
