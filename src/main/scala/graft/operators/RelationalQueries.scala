package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PortableRound

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
  *   - Only *bounded* dimensions (region, nation — fixed-cardinality) are
  *     broadcast explicitly. Sides whose size scales with the data
  *     (customer, first-seen users) carry no hint: a forced broadcast
  *     would OOM at 1000×, whereas AQE broadcasts them while they fit and
  *     switches to shuffle join beyond the threshold.
  *   - Double-valued aggregates are rounded (2–4 dp) in both engines: fp
  *     summation order differs across engines/partitionings, and the
  *     driver hash-compares values.
  *   - Top-k = orderBy+limit compiles to TakeOrderedAndProject — per
  *     partition heap + driver merge, no global sort shuffle.
  */
object RelationalQueries {

  /** Exact integer cents of a 2-decimal money column. Summing doubles is
    * order-dependent and can flip a rounded result by a cent across
    * engines/partitionings; integer sums are exact in any order. (At
    * >~2·10⁹ rows per group switch the accumulator to DECIMAL(38,0) —
    * Long holds Σ cents·basis-points to ~9·10¹⁸.)
    */
  private def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")

  /** Pricing summary (TPC-H Q1 shape): scan-heavy grouped aggregate with
    * derived measures; flagship `SparkEntry.entry`. Mirrors reference
    * A-family grouped counts (`analysis/flink-analysis.sql:75-90`).
    * Money measures aggregate in exact cents (× basis points for the
    * discounted sum), converting to dollars only at the end.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"), // quantities are integral: exact
        (sum(cents(col("l_extendedprice"))) / 100.0).as("sum_base_price"),
        (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          / 10000.0).as("sum_disc_price"),
        PortableRound.r(avg("l_quantity"), 4).as("avg_qty"),
        PortableRound.r(sum(cents(col("l_extendedprice"))) / 100.0 / count(lit(1)), 4).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Multi-way star join: orders ⋈ customer ⋈ nation ⋈ region, rolled up by
    * region and order status. Dimensions broadcast (J-family; reference runs
    * the analogous enrich joins in Postgres, `analysis/flink-analysis.sql:219-225`).
    */
  def regionRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      // customer scales with data: no forced broadcast — AQE broadcasts
      // while it fits and falls back to shuffle join beyond the threshold
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        (sum(cents(col("o_totalprice"))) / 100.0).as("total_revenue"))
      .orderBy("r_name", "o_orderstatus")

  /** Top-10 orders by price with customer attribution (O2 limit-after-sort;
    * `analysis/flink-analysis.sql:41-50`). Tie-broken on o_orderkey.
    */
  def topOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
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
      .withColumn("cust_total_c",
        sum(cents(col("o_totalprice"))).over(Window.partitionBy("o_custkey")))
      .select(
        col("o_orderkey"), col("o_custkey"),
        PortableRound.r(cents(col("o_totalprice")) * 100.0 / col("cust_total_c"), 3)
          .as("pct_of_customer"))
      .orderBy("o_orderkey")
  }

  /** Shipping-priority shape (TPC-H Q3): selective filters on both fact
    * sides + join + grouped revenue + top-10. Exercises filter pushdown
    * into both scans and AQE join planning under reduced cardinalities.
    */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .join(
        Tables.lineitem(spark, dir)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
        / 10000.0).as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)

  /** ROLLUP hierarchy totals: region → nation subtotals + grand total
    * (grouping-set machinery; labels coalesced so NULL semantics match
    * the oracle).
    */
  def revenueRollup(spark: SparkSession, dir: String): DataFrame = {
    // Expressed via spark.sql: the Dataset rollup API re-emits grouping
    // columns in a way Spark 4's self-join ambiguity heuristic false-
    // positives on after a multi-join (SPARK- ambiguity check on
    // __dataset_id metadata); the SQL path resolves identically and plans
    // the same Expand + partial/final aggregate.
    Tables.orders(spark, dir).createOrReplaceTempView("graft_ru_orders")
    Tables.customer(spark, dir).createOrReplaceTempView("graft_ru_customer")
    Tables.nation(spark, dir).createOrReplaceTempView("graft_ru_nation")
    Tables.region(spark, dir).createOrReplaceTempView("graft_ru_region")
    spark.sql(
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        |       count(*) AS n_orders,
        |       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / CAST(100 AS DOUBLE) AS revenue
        |FROM graft_ru_orders JOIN graft_ru_customer ON o_custkey = c_custkey
        |  JOIN graft_ru_nation ON c_nationkey = n_nationkey
        |  JOIN graft_ru_region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY region, nation""".stripMargin)
  }

  /** PIVOT: order counts per market segment × order status (wide form).
    * Fixed pivot domain keeps the schema static — the distributed-safe
    * form (a dynamic domain would need a driver-side distinct first).
    */
  def segmentStatusPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o", "P" -> "n_p"))
      .orderBy("c_mktsegment")

  /** rank + lead window functions over each customer's order history
    * (W-family beyond the reference's lag/row_number/sum).
    */
  def orderHistoryRanks(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        rank().over(w).cast("long").as("order_rank"),
        lead("o_orderkey", 1).over(w).as("next_orderkey"))
      .orderBy("o_custkey", "order_rank", "o_orderkey")
  }

  val oracles: Map[String, String] = Map(
    "q_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderdate < TIMESTAMP '1996-01-01'
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q_revenue_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        |       count(*) AS n_orders,
        |       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name) ORDER BY region, nation""".stripMargin,
    "q_segment_status_pivot" ->
      """SELECT c_mktsegment,
        |       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_order_history_ranks" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(rank() OVER w AS BIGINT) AS order_rank,
        |       lead(o_orderkey, 1) OVER w AS next_orderkey
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, order_rank, o_orderkey""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
        |       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS sum_disc_price,
        |       floor(avg(l_quantity) * 10000 + 0.5) / 10000.0 AS avg_qty,
        |       floor(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 / count(*)
        |             * 10000 + 0.5) / 10000.0 AS avg_price,
        |       count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_region_revenue" ->
      """SELECT r_name, o_orderstatus, count(*) AS n_orders,
        |       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, o_orderstatus ORDER BY r_name, o_orderstatus""".stripMargin,
    "q_top_orders" ->
      """SELECT o_orderkey, c_name, o_totalprice
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
        |       floor(CAST(round(o_totalprice * 100) AS BIGINT) * 100.0
        |             / sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |               OVER (PARTITION BY o_custkey) * 1000 + 0.5) / 1000.0 AS pct_of_customer
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
