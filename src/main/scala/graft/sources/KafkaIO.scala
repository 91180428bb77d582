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
  *
  * The reader/writer option sets are exposed as pure maps
  * ([[sourceOptions]]/[[sinkOptions]]) and the entry points consume THOSE
  * — so the option plumbing, which the OPERATIONS.md caveat names as
  * T8's residual risk, is golden-pinned by spec even with no broker in
  * the image; what remains untested live is only the connector itself.
  */
object KafkaIO {

  /** Reader options, reference defaults: earliest reset for replay
    * (`events_postgres_sink.sql:29-30` vs `redis_sink copy.sql:19`);
    * `bounded = true` adds the batch endingOffsets pin.
    */
  def sourceOptions(bootstrapServers: String, topic: String,
      startingOffsets: String = "earliest",
      bounded: Boolean = false): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets) ++
      (if (bounded) Map("endingOffsets" -> "latest") else Map.empty)

  /** Producer options (S12): uuid key + whole-row JSON handled by
    * [[EventCodec.encode]]; lz4 + linger/batch — the reference producer's
    * wire contract (`streaming/kafka_config.yml:7-24`).
    */
  def sinkOptions(bootstrapServers: String, topic: String,
      checkpointDir: String): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "topic" -> topic,
      "kafka.compression.type" -> "lz4",
      "kafka.linger.ms" -> "50",
      "kafka.batch.size" -> "131072",
      "checkpointLocation" -> checkpointDir)

  /** Streaming Kafka JSON source: decode + event_time derivation fused
    * into the source projection.
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
        .options(sourceOptions(bootstrapServers, topic, startingOffsets))
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
        .options(sourceOptions(bootstrapServers, topic, bounded = true))
        .load(),
      schema)

  /** Kafka producer sink (S12). */
  def writeJsonStream(
      decoded: DataFrame,
      bootstrapServers: String,
      topic: String,
      checkpointDir: String): DataStreamWriter[Row] =
    EventCodec.encode(decoded).writeStream
      .format("kafka")
      .options(sinkOptions(bootstrapServers, topic, checkpointDir))
}
