package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The reference's feature-engineering jobs — tumbling-window per-user
  * click/view counts for a Redis feature store (`flink-jobs/redis_sink.py:75-129`,
  * `flink-jobs/redis_sink copy.sql:64-182`) and the daily batch backfill
  * (`flink-jobs/feature_batch_update.py:85-113`) — as batch Spark jobs.
  * Streaming twins live in [[graft.streaming.StreamingFeatures]].
  *
  * The reference computes clicks and views as two windowed aggregates and
  * LEFT-OUTER-joins them on (uuid, window_end) (J1). We use the union-pivot
  * formulation instead (SURVEY §7.2 M4): one shuffle on (user, window) with a
  * conditional count per stream — bit-identical output to the join+COALESCE 0,
  * but at 100 TB it is one stateful operator instead of three (two aggs + a
  * join), and no join state/retention problem.
  */
object FeatureJobs {

  private def clicksViews(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).filter(col("event_type").isin("click", "view"))

  /** Tumbling-window per-user feature counts; `windowLen` e.g. "20 minutes"
    * (`redis_sink.py:83,100`) or "5 minutes" (`redis_sink copy.sql:70,78`).
    * Epoch-aligned windows (Spark default) so the oracle can reproduce
    * bucket edges with integer arithmetic.
    */
  def windowedFeatures(spark: SparkSession, dir: String, windowLen: String): DataFrame =
    windowedFeaturesUnordered(spark, dir, windowLen)
      .orderBy("user_id", "window_end")

  /** [[windowedFeatures]] without the presentation sort — the form for
    * composing into downstream joins (the trailing global `orderBy` is
    * a range-partition exchange the consumer's own shuffle would
    * immediately discard).
    */
  private[operators] def windowedFeaturesUnordered(
      spark: SparkSession, dir: String, windowLen: String): DataFrame =
    clicksViews(spark, dir)
      .groupBy(window(col("ts"), windowLen).as("w"), col("user_id"))
      .agg(
        count(when(col("event_type") === "click", 1)).as("clicks"),
        count(when(col("event_type") === "view", 1)).as("views"))
      .select(col("user_id"), col("w.end").as("window_end"), col("clicks"), col("views"))

  /** Daily batch feature backfill (`feature_batch_update.py:85-113`, J2/A7).
    * Reference labels the whole-day count with `window_end = day_start +
    * INTERVAL '20' MINUTE` — a semantic bug preserved deliberately for
    * parity (SURVEY §7.4 risk 4). Union-pivot replaces the RIGHT OUTER JOIN
    * + COALESCE-on-keys.
    */
  def dailyFeatures(spark: SparkSession, dir: String): DataFrame =
    clicksViews(spark, dir)
      .groupBy(col("user_id"),
        (date_trunc("day", col("ts")) + expr("INTERVAL 20 MINUTES")).as("window_end"))
      .agg(
        count(when(col("event_type") === "click", 1)).as("click20m"),
        count(when(col("event_type") === "view", 1)).as("view20m"))
      .orderBy("user_id", "window_end")

  /** The reference job's actual contract: one processing day per run.
    * `feature_batch_update.py:98-109` filters `[processingDate,
    * processingDate + 1 day)` from the `--processingDate` argument that
    * Airflow passes as `{{ ds }}` (`airflow/dags/20m_feature_update.py:32-40`);
    * each run PK-upserts that day's rows into the features table. Same
    * aggregate as [[dailyFeatures]] with the day-bound filter — a plain
    * scan predicate, so with date-partitioned parquet it is partition
    * pruning, and re-running a day is idempotent through the upsert sink.
    * `processingDate` format: `yyyy-MM-dd` (the Airflow `ds` format).
    */
  def dailyFeatures(spark: SparkSession, dir: String, processingDate: String): DataFrame = {
    val dayStart = to_timestamp(lit(processingDate), "yyyy-MM-dd")
    clicksViews(spark, dir)
      .filter(col("ts") >= dayStart && col("ts") < dayStart + expr("INTERVAL 1 DAY"))
      .groupBy(col("user_id"),
        (date_trunc("day", col("ts")) + expr("INTERVAL 20 MINUTES")).as("window_end"))
      .agg(
        count(when(col("event_type") === "click", 1)).as("click20m"),
        count(when(col("event_type") === "view", 1)).as("view20m"))
      .orderBy("user_id", "window_end")
  }

  /** Batch twin of the per-doc 5-min windowed counts (A5,
    * `redis_sink copy.sql:81-95`): doc id from the JSON `props.k`.
    */
  def docCounts5m(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.eventsEnriched(spark, dir)
      .filter(col("event_type").isin("click", "view"))
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("doc_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("w.end").as("window_end"), col("cnt"))
      .orderBy("doc_id", "window_end")

  /** Distinct active users per 5-min window over the UNION ALL of both
    * streams (`redis_sink copy.sql:154-163`, A6/O5). Batch form is exact
    * countDistinct; the streaming twin documents the approx/exact tradeoff.
    */
  def activeUsers5m(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val unioned = ev.filter(col("event_type") === "click").select("user_id", "ts")
      .unionByName(ev.filter(col("event_type") === "view").select("user_id", "ts"))
    unioned
      .groupBy(window(col("ts"), "5 minutes").as("w"))
      .agg(countDistinct("user_id").as("n_users"))
      .select(col("w.end").as("window_end"), col("n_users"))
      .orderBy("window_end")
  }

  /** Redis feature-hash rows: key grammar `feat:user:{<uuid>}:<yyyyMMddHHmm>`
    * (`redis_sink copy.sql:174`, `redis_sink.py:121-126`; F3/F4/F5). Values
    * stringified as the MAP<STRING,STRING> hash would be (F7); emitted as
    * columns here so the oracle can compare — the MAP form is exercised in
    * [[redisHashRows]] / the streaming sink.
    */
  def redisFeatureKeys(spark: SparkSession, dir: String): DataFrame =
    windowedFeatures(spark, dir, "20 minutes")
      .select(
        concat(lit("feat:user:{"), col("user_id").cast("string"), lit("}:"),
          date_format(col("window_end"), "yyyyMMddHHmm")).as("redis_key"),
        col("clicks").cast("string").as("click20m"),
        col("views").cast("string").as("view20m"))
      .orderBy("redis_key")

  /** The literal (key, MAP<STRING,STRING>) shape the Redis connector sink
    * consumes (`redis_sink copy.sql:45-48,172-182`). Not oracle-comparable
    * (map hashing is engine-specific) — covered by ScalaTest instead.
    */
  def redisHashRows(spark: SparkSession, dir: String): DataFrame =
    windowedFeatures(spark, dir, "20 minutes")
      .select(
        concat(lit("feat:user:{"), col("user_id").cast("string"), lit("}:"),
          date_format(col("window_end"), "yyyyMMddHHmm")).as("redis_key"),
        map(
          lit("click20m"), col("clicks").cast("string"),
          lit("view20m"), col("views").cast("string")).as("redis_hash"))

  // ---------------------------------------------------------------------
  // DuckDB oracle twins. Spark tumbling windows are epoch-aligned:
  // window_end = floor(epoch/len)*len + len, reproduced with integer math.
  // ---------------------------------------------------------------------

  private def windowOracle(seconds: Long): String =
    s"""WITH bucketed AS (
       |  SELECT user_id,
       |         to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // $seconds) * $seconds + $seconds)
       |           AT TIME ZONE 'UTC' AS window_end,
       |         event_type
       |  FROM events WHERE event_type IN ('click','view'))
       |SELECT user_id, window_end,
       |       count(*) FILTER (WHERE event_type = 'click') AS clicks,
       |       count(*) FILTER (WHERE event_type = 'view') AS views
       |FROM bucketed GROUP BY user_id, window_end ORDER BY user_id, window_end""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_features_20m" -> windowOracle(1200),
    "q_features_5m" -> windowOracle(300),
    "q_features_daily" ->
      """SELECT user_id,
        |       date_trunc('day', ts) + INTERVAL 20 MINUTE AS window_end,
        |       count(*) FILTER (WHERE event_type = 'click') AS click20m,
        |       count(*) FILTER (WHERE event_type = 'view') AS view20m
        |FROM events WHERE event_type IN ('click','view')
        |GROUP BY 1, 2 ORDER BY user_id, window_end""".stripMargin,
    "q_doc_counts_5m" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS doc_id,
        |       to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 + 300)
        |         AT TIME ZONE 'UTC' AS window_end,
        |       count(*) AS cnt
        |FROM events WHERE event_type IN ('click','view')
        |GROUP BY 1, 2 ORDER BY doc_id, window_end""".stripMargin,
    "q_active_users_5m" ->
      """WITH unioned AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, ts FROM events WHERE event_type = 'view')
        |SELECT to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 + 300)
        |         AT TIME ZONE 'UTC' AS window_end,
        |       count(DISTINCT user_id) AS n_users
        |FROM unioned GROUP BY 1 ORDER BY window_end""".stripMargin,
    "q_redis_feature_keys" ->
      """WITH bucketed AS (
        |  SELECT user_id,
        |         to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 1200) * 1200 + 1200)
        |           AT TIME ZONE 'UTC' AS window_end,
        |         event_type
        |  FROM events WHERE event_type IN ('click','view')),
        |feats AS (
        |  SELECT user_id, window_end,
        |         count(*) FILTER (WHERE event_type = 'click') AS clicks,
        |         count(*) FILTER (WHERE event_type = 'view') AS views
        |  FROM bucketed GROUP BY user_id, window_end)
        |SELECT concat('feat:user:{', CAST(user_id AS VARCHAR), '}:',
        |              strftime(window_end, '%Y%m%d%H%M')) AS redis_key,
        |       CAST(clicks AS VARCHAR) AS click20m,
        |       CAST(views AS VARCHAR) AS view20m
        |FROM feats ORDER BY redis_key""".stripMargin
  )
}
