package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated test tables (`TESTDATA.md`).
  *
  * The reference engine declares all schemas explicitly in DDL
  * (`postgres/init-scripts/01_init_tables.sql:2-36`,
  * `flink-jobs/events_postgres_sink.sql:14-23`); we keep the same stance:
  * every reader normalizes to a declared shape rather than trusting
  * whatever the file says. Partition pruning / column pruning stay native
  * because these are plain `spark.read.parquet` scans — at 100 TB the same
  * call reads a Hive-partitioned directory tree and Catalyst prunes.
  */
object Tables {

  private def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    GraftSession.tune(spark)
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    // Declared-shape normalization for timestamps: the driver-generated
    // parquet has shipped timestamp columns as isAdjustedToUTC=false
    // (round 10), which Spark infers as TIMESTAMP_NTZ — a type whose
    // rows collect as LocalDateTime and which would thread a second
    // timestamp flavor through every operator, window and streaming
    // twin. The session timezone is pinned UTC, so casting NTZ →
    // TIMESTAMP reinterprets the naive values as the same UTC instants
    // the oracle (DuckDB, equally naive-reading) sees; every green
    // round so far produced TIMESTAMP-typed outputs, so this is the
    // proven shape. Column-pruning unaffected: the cast is a projection
    // Catalyst pushes around, the scan still prunes. Scope: TOP-LEVEL
    // columns only — an NTZ field nested inside a struct/array would
    // pass through untouched (no driver generation has shipped one; add
    // a recursive cast here if one ever does).
    raw.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.TimestampNTZType => f.name
    }.foldLeft(raw) { (df, c) =>
      df.withColumn(c, col(c).cast(org.apache.spark.sql.types.TimestampType))
    }
  }

  /** Event stream at rest. Mirrors the reference `events`/`page_views`
    * tables (`flink-jobs/events_postgres_sink.sql:14-23`): `user_id` plays
    * `uuid`, `ts` plays `event_time`, `event_type` in
    * {click,view,purchase,signup,error} distinguishes the two reference
    * streams (click ↔ `events`, view ↔ `page_views`), and `props` is the
    * row's JSON payload (`{"k": N}` — `k` plays `document_id`).
    *
    * The parquet stores TIMESTAMP(NANOS); Spark reads it as Long under
    * `nanosAsLong`, and we convert to a µs timestamp exactly like DuckDB's
    * implicit ns→µs truncation, so oracle comparisons agree.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = read(spark, dir, "events")
    // The driver-generated ts column has shipped as three physical types
    // across rounds; normalize every generation to TIMESTAMP (UTC):
    //   - int64 nanos (nanosAsLong reads them as Long): integer `div`
    //     keeps ns→µs exact; a double-precision divide would round
    //     2024-epoch nanos (~1.7e18) before truncation and shift edge
    //     timestamps by 1 µs vs the oracle;
    //   - timestamp[us] with isAdjustedToUTC=false (round 10 data):
    //     Spark infers TIMESTAMP_NTZ — already normalized by read()'s
    //     generic top-level NTZ→TIMESTAMP cast before this match runs,
    //     so no NTZ case appears here (r10 advice: a TimestampNTZType
    //     branch at this point is unreachable dead code);
    //   - plain TIMESTAMP: already the target type.
    val tsCol = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case _ => col("ts")
    }
    raw.withColumn("ts", tsCol)
  }

  /** Events enriched with the columns every analysis query derives:
    * `doc_id` (JSON-extracted `props.k`, the reference `document_id` —
    * `get_json_object` ↔ Flink JSON format decode, SURVEY §2.7 F18). Cached
    * derivation happens in the plan, not materialized — Catalyst collapses
    * the projection into the scan.
    */
  def eventsEnriched(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("doc_id", get_json_object(col("props"), "$.k").cast("long"))

  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
}
