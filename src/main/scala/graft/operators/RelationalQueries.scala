package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational coverage queries over the TPC-H-ish testdata tables.
  *
  * The reference's engine surface is Flink SQL / Postgres SQL — projections,
  * equi-joins (J1–J5), grouped aggregates (A-family), sorts/limits (O1–O3)
  * — exercised there over clickstream tables. These queries exercise the
  * identical operator set over the star schema so the engine's join
  * planning (broadcast vs shuffle), partial aggregation, and top-k paths
  * are all covered at bench scale.
  *
  * Scale notes:
  *   - Dimension tables (region/nation/customer at these SFs, and region/
  *     nation at any SF) are broadcast explicitly — no shuffle of the fact
  *     side; at 100 TB customer would exceed the broadcast threshold and
  *     AQE falls back to shuffle join on exactly this plan.
  *   - Double-valued aggregates are rounded (2–4 dp) in both engines: fp
  *     summation order differs across engines/partitionings, and the
  *     driver hash-compares values.
  *   - Top-k = orderBy+limit compiles to TakeOrderedAndProject — per
  *     partition heap + driver merge, no global sort shuffle.
  */
object RelationalQueries {

  /** Pricing summary (TPC-H Q1 shape): scan-heavy grouped aggregate with
    * derived measures; flagship `SparkEntry.entry`. Mirrors reference
    * A-family grouped counts (`analysis/flink-analysis.sql:75-90`).
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Multi-way star join: orders ⋈ customer ⋈ nation ⋈ region, rolled up by
    * region and order status. Dimensions broadcast (J-family; reference runs
    * the analogous enrich joins in Postgres, `analysis/flink-analysis.sql:219-225`).
    */
  def regionRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_revenue"))
      .orderBy("r_name", "o_orderstatus")

  /** Top-10 orders by price with customer attribution (O2 limit-after-sort;
    * `analysis/flink-analysis.sql:41-50`). Tie-broken on o_orderkey.
    */
  def topOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)

  /** Fact-fact join lineitem ⋈ part rolled up by brand (shuffle join at
    * scale; part broadcasts at test SFs — AQE decides).
    */
  def brandVolume(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("n_lines"))
      .orderBy("p_brand")

  /** Semi-join: customers having ≥1 order, per market segment (EXISTS). */
  def segmentsWithOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")

  /** Anti-join: customers with no orders, per nation (NOT EXISTS). */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("n_name")

  /** Correlated-style per-group share: each order's price vs its customer's
    * total (window-function over join; W-family coverage on relational data).
    */
  def orderShareOfCustomer(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.orders(spark, dir)
      .withColumn("cust_total", sum("o_totalprice").over(Window.partitionBy("o_custkey")))
      .select(
        col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100.0 / col("cust_total"), 3).as("pct_of_customer"))
      .orderBy("o_orderkey")
  }

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_extendedprice), 4) AS avg_price,
        |       count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_region_revenue" ->
      """SELECT r_name, o_orderstatus, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS total_revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, o_orderstatus ORDER BY r_name, o_orderstatus""".stripMargin,
    "q_top_orders" ->
      """SELECT o_orderkey, c_name, round(o_totalprice, 2) AS o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_brand_volume" ->
      """SELECT p_brand, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_segments_with_orders" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_customers_without_orders" ->
      """SELECT n_name, count(*) AS n_customers
        |FROM customer c JOIN nation ON c_nationkey = n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_order_share" ->
      """SELECT o_orderkey, o_custkey,
        |       round(o_totalprice * 100.0 / sum(o_totalprice)
        |             OVER (PARTITION BY o_custkey), 3) AS pct_of_customer
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
