package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.EventCodec

/** Ordered two-stream replay harness (SURVEY §2.1 S13) — the test-fixture
  * twin of the reference's Kafka producer (`streaming/
  * kafka_stream_producer.py:275-463`): interleave events and page_views in
  * global `timestamp` order with a time-scale factor, optionally rate
  * limited. Not an engine operator; feeds e2e streaming tests the way the
  * producer feeds Kafka.
  */
object Replay {

  /** Merge two at-rest tables into one tagged, globally time-ordered
    * replay log (the producer's merge loop, `kafka_stream_producer.py:348-435`).
    */
  def mergedLog(events: DataFrame, pageViews: DataFrame): DataFrame = {
    val tag = (df: DataFrame, t: String) =>
      df.select(
        col("uuid"), col("timestamp"),
        lit(t).as("stream"),
        to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("payload"))
    tag(events, "events")
      .unionByName(tag(pageViews, "page_views"))
      .orderBy("timestamp", "uuid")
  }

  /** Replay batches: slice the merged log into `batches` contiguous
    * time-ordered chunks — each chunk is one MemoryStream.addData call in
    * tests, reproducing arrival order with bounded out-of-orderness inside
    * a chunk (the producer's scaled-sleep pacing collapses to batch
    * boundaries under test).
    */
  def batches(log: DataFrame, nBatches: Int): Array[Array[org.apache.spark.sql.Row]] = {
    val rows = log.collect()
    val size = math.max(1, math.ceil(rows.length.toDouble / nBatches).toInt)
    rows.grouped(size).toArray
  }

  /** Events-table shaped synthetic fixture for streaming tests: n rows,
    * deterministic, with the reference schema + derived event_time.
    */
  def syntheticEvents(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      (i.toLong, f"user${i % 7}%02d", (i % 13).toLong, i.toLong * 1000L,
        if (i % 5 == 0) "US" else s"US>TX>${600 + i % 3}", i % 3 + 1)
    }
    rows.toDF("display_id", "uuid", "document_id", "timestamp", "geo_location", "platform_id")
      .withColumn("event_time", EventCodec.eventTime(col("timestamp")))
  }
}
