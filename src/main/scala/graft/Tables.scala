package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated synthetic corpus (TESTDATA.md).
  *
  * Every loader is parameterized by the scale-factor directory so all queries
  * are scale-parametric: the same plan runs at sf0.001 (smoke), sf0.01
  * (duckdb-oracle correctness) and sf0.1+ (bench). At cluster scale these
  * would be partitioned/bucketed catalog tables; reading raw parquet keeps
  * the harness hermetic while still exercising the same Catalyst plans
  * (column pruning + predicate pushdown reach the parquet scan either way).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS) (TESTDATA corpus), which Spark's
    * vectorized reader rejects. Read it as a raw nanos long and floor-divide
    * to micros (integral `div` — a double division would lose precision at
    * 1e18 nanos), matching DuckDB's ns→µs truncation. TIMESTAMP_NTZ keeps
    * parity with how every other corpus timestamp is read
    * (inferTimestampNTZ) and avoids tz-adjustment on rewrite. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      // Driver corpus: TIMESTAMP(NANOS) read as nanos long under the
      // legacy conf — floor-divide to micros.
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      // Standard µs parquet timestamps (e.g. tools/GenData output): the
      // legacy conf leaves them untouched; normalize to the same NTZ type.
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
