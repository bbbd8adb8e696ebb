package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Headline analytical queries over the TPC-H-ish corpus — the bench
  * workload (BASELINE.md targets). Shapes chosen to exercise the three
  * plans that dominate a 100 TB warehouse: wide-scan hash aggregation,
  * broadcast star join + top-k, and a multi-way shuffle join tree that AQE
  * can re-plan at runtime.
  */
object Analytics {

  /** TPC-H Q1 shape: full lineitem scan → 2-key hash agg, many measures.
    * Partial (map-side) aggregation collapses 600k rows to a handful per
    * partition before the shuffle; decimal sums keep results
    * order-independent. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitemSpread(s, dir).filter(col("l_shipdate") <= lit("2000-12-01"))
    val extDec = col("l_extendedprice").cast("decimal(18,2)")
    val discPrice = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(22,6)")
    l.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(extDec).cast("double").as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        (sum(extDec).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem, grouped revenue, top-10.
    *
    * Lineitem revenue is pre-aggregated per orderkey BELOW the join —
    * partial-agg pushdown Catalyst doesn't do on its own. The group key set
    * is functionally dependent on o_orderkey, so per-order decimal sums are
    * exact and the join then moves one row per order instead of every line
    * item (4×+ row reduction before the shuffle at any scale; the win grows
    * with lines-per-order). customer is broadcast; the orderkey shuffle is
    * the one bucketing would pin at warehouse scale. Top-k is
    * TakeOrderedAndProject, not a full sort. */
  def topOrdersByRevenue(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, dir).filter(col("o_orderdate") < lit("2000-01-01"))
    val liAgg = Tables.lineitemSpread(s, dir)
      .filter(col("l_shipdate") > lit("1998-01-01"))
      .groupBy(col("l_orderkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(22,6)")).as("rev"))
    ord.join(liAgg, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"),
        col("rev").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5 shape: 5-way star join through region→nation→customer→orders→
    * lineitem. region/nation/customer broadcast into one dim table; lineitem
    * revenue/count pre-aggregate per orderkey below the join (see
    * [[topOrdersByRevenue]] — decimal partial sums re-sum exactly, counts
    * re-sum as longs), so the orderkey shuffle carries orders-cardinality
    * rows, not lineitem-cardinality. */
  def regionRevenue(s: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(s, dir)
    val reg = Tables.region(s, dir)
    val dims = Tables.customer(s, dir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    val liAgg = Tables.lineitemSpread(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(22,6)")).as("rev"),
        count(lit(1)).as("cnt"))
    Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      .join(liAgg, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("rev")).cast("double").as("revenue"),
        sum(col("cnt")).as("n_items"))
  }

  /** Correlated-style aggregate filter: parts priced above their brand's
    * average (decorrelated into a broadcast join on the brand aggregate). */
  def aboveBrandAvg(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    val brandAvg = p.groupBy(col("p_brand").as("b_brand"))
      .agg((sum(col("p_retailprice").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("avg_price"))
    p.join(broadcast(brandAvg), col("p_brand") === col("b_brand"))
      .filter(col("p_retailprice") > col("avg_price"))
      .select("p_partkey", "p_brand", "p_retailprice")
  }
}
