package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Throughput monitoring — the engine-side twin of the reference's
  * Prometheus/kafka-exporter rate tracking (`analysis/prometheus.yml:1-8`,
  * README.md:79-86: `sum(rate(kafka_topic_partition_current_offset[1m]))`
  * and consumer-lag). Structured Streaming already computes per-batch
  * `inputRowsPerSecond` / `processedRowsPerSecond` and batch durations;
  * this listener collects them per query for scraping/logging — the
  * consumer-lag analogue is `numRowsBehindLatest` in Kafka source
  * progress.
  */
class RateListener extends StreamingQueryListener {

  final case class BatchRate(queryName: String, batchId: Long,
      inputRowsPerSecond: Double, processedRowsPerSecond: Double,
      numInputRows: Long, durationMs: Long)

  private val rates = new ConcurrentLinkedQueue[BatchRate]()
  private val maxRetained = 10000 // bounded: one entry per micro-batch

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    // triggerExecution is the total batch wall time; the other durationMs
    // entries are its sub-phases — summing everything double-counts.
    val wallMs = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue())
      .getOrElse(p.durationMs.values().stream().mapToLong(_.longValue()).max().orElse(0L))
    rates.add(BatchRate(
      Option(p.name).getOrElse(p.id.toString), p.batchId,
      orZero(p.inputRowsPerSecond), orZero(p.processedRowsPerSecond),
      p.numInputRows, wallMs))
    while (rates.size > maxRetained) rates.poll()
  }

  private def orZero(d: Double): Double = if (d.isNaN) 0.0 else d

  def snapshot(): Seq[BatchRate] = {
    import scala.jdk.CollectionConverters._
    rates.iterator().asScala.toSeq
  }

  /** Aggregate rows/sec over all observed batches of a query. */
  def overallRate(queryName: String): Double = {
    val rs = snapshot().filter(_.queryName == queryName)
    val rows = rs.map(_.numInputRows).sum
    val secs = rs.map(_.durationMs).sum / 1000.0
    if (secs == 0) 0.0 else rows / secs
  }
}

object Monitoring {
  /** Attach a rate listener to the session; returns it for scraping. */
  def attach(spark: SparkSession): RateListener = {
    val l = new RateListener
    spark.streams.addListener(l)
    l
  }
}
