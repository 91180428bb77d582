package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declared schemas + JSON wire codec for the reference's two event streams.
  *
  * The reference declares these in Flink DDL (`flink-jobs/
  * events_postgres_sink.sql:14-23`, `page_views_postgres_sink.sql:14-23`)
  * and ships rows as whole-row JSON keyed by uuid on the Kafka wire
  * (`streaming/kafka_stream_producer.py:375-389,410-424`). We declare
  * `StructType`s explicitly (no inference — SURVEY §1.3) and decode with
  * `from_json`, which nulls malformed columns exactly like the Flink JSON
  * format default.
  */
object EventCodec {

  /** Dataset-epoch offset: `timestamp=0` ≡ 2016-06-14
    * (`flink-jobs/events_postgres_sink.sql:21`).
    */
  val EpochOffsetMs = 1465876799998L

  /** `events` stream schema (`events_postgres_sink.sql:14-23`). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("display_id", LongType),
    StructField("uuid", StringType),
    StructField("document_id", LongType),
    StructField("timestamp", LongType),
    StructField("geo_location", StringType),
    StructField("platform_id", IntegerType),
    StructField("act_prod_time", TimestampType)))

  /** `page_views` stream schema (`page_views_postgres_sink.sql:14-23`):
    * events minus display_id, plus traffic_source.
    */
  val pageViewsSchema: StructType = StructType(Seq(
    StructField("uuid", StringType),
    StructField("document_id", LongType),
    StructField("timestamp", LongType),
    StructField("geo_location", StringType),
    StructField("platform_id", IntegerType),
    StructField("traffic_source", IntegerType),
    StructField("act_prod_time", TimestampType)))

  /** Computed event-time column (S3):
    * `TO_TIMESTAMP_LTZ(timestamp + offset, 3)` → `timestamp_millis`.
    */
  def eventTime(tsMs: Column): Column = timestamp_millis(tsMs + lit(EpochOffsetMs))

  /** Decode a Kafka-wire frame (key: uuid bytes, value: JSON bytes) into
    * typed rows with the derived `event_time` (S1/S2/S3, F18).
    */
  def decode(wire: DataFrame, schema: StructType): DataFrame =
    wire
      .select(from_json(col("value").cast("string"), schema).as("r"))
      .select(col("r.*"))
      .withColumn("event_time", eventTime(col("timestamp")))

  /** Encode typed rows back to the wire shape (S12): whole-row JSON value,
    * uuid key — so a user's events stay ordered within a Kafka partition
    * (`kafka_stream_producer.py:382,417`).
    */
  def encode(rows: DataFrame): DataFrame = {
    val payload = rows.columns.filter(_ != "event_time")
    rows.select(
      col("uuid").cast("string").as("key"),
      to_json(struct(payload.toIndexedSeq.map(col): _*)).as("value"))
  }
}
