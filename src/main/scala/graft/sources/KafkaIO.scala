package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Kafka source/sink wiring (SURVEY §2.1 S1/S2/S12).
  *
  * Thin by design: every transformation downstream takes a decoded
  * `DataFrame`, so the identical pipeline runs from `MemoryStream`, files,
  * or Kafka. Deployment needs the `spark-sql-kafka-0-10` connector on the
  * classpath (not present in this zero-egress test image — these helpers
  * compile here and are covered by the MemoryStream twins in tests).
  */
object KafkaIO {

  /** Streaming Kafka JSON source, reference defaults: earliest reset for
    * replay (`events_postgres_sink.sql:29-30` vs `redis_sink copy.sql:19`),
    * decode + event_time derivation fused into the source projection.
    */
  def readJsonStream(
      spark: SparkSession,
      bootstrapServers: String,
      topic: String,
      schema: StructType,
      startingOffsets: String = "earliest"): DataFrame =
    EventCodec.decode(
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load(),
      schema)

  /** Batch Kafka read of the same topics (bounded replay). */
  def readJsonBatch(
      spark: SparkSession,
      bootstrapServers: String,
      topic: String,
      schema: StructType): DataFrame =
    EventCodec.decode(
      spark.read
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load(),
      schema)

  /** Kafka producer sink (S12): whole-row JSON, uuid key, lz4 — the
    * reference producer's wire contract (`streaming/kafka_config.yml:7-24`).
    */
  def writeJsonStream(
      decoded: DataFrame,
      bootstrapServers: String,
      topic: String,
      checkpointDir: String): DataStreamWriter[Row] =
    EventCodec.encode(decoded).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("kafka.compression.type", "lz4")
      .option("kafka.linger.ms", "50")
      .option("kafka.batch.size", "131072")
      .option("checkpointLocation", checkpointDir)
}
