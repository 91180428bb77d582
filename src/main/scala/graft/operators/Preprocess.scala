package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{EventCodec, Sinks}

/** The reference's Spark preprocessing notebook (`notebooks/preprocess.ipynb`)
  * as a library pipeline: raw CSV → data-quality repair → time-derived
  * columns → partitioned, time-sorted parquet layout (SURVEY §2.1 S14/S15,
  * §2.2 P4/P5, §2.7 F17/F19).
  */
object Preprocess {

  /** S14: header CSV ingest. `inferSchema` mirrors the notebook (the only
    * schema inference in the system — everything downstream is declared).
    */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** P4+P5 (notebook cells 7-9): rows whose `platform` is outside the
    * {1,2,3} domain are either repaired (known display_ids get the value
    * the producer later re-derives) or dropped.
    */
  def repairPlatform(raw: DataFrame, knownDisplayIds: Seq[Long]): DataFrame =
    raw
      .withColumn("platform",
        when(col("display_id").isin(knownDisplayIds: _*), lit("1"))
          .otherwise(col("platform")))
      .filter(col("platform").isin("1", "2", "3"))

  /** F19/F17: epoch-ms → timestamp + date partitioning columns. */
  def deriveTime(df: DataFrame): DataFrame =
    df
      .withColumn("event_time", EventCodec.eventTime(col("timestamp")))
      .withColumn("event_date", to_date(col("event_time")))

  /** Full pipeline to the at-rest layout the replay producer consumes
    * (S15 — `platform=N/event_date=D/` dirs, sorted by `timestamp` within
    * each file). A18's distinct-partition enumeration + per-partition loop
    * from the notebook collapses into one distributed write.
    */
  def toPartitionedLayout(raw: DataFrame, outPath: String,
      knownDisplayIds: Seq[Long] = Nil): Unit =
    Sinks.writePartitionedSorted(
      deriveTime(repairPlatform(raw, knownDisplayIds)),
      outPath, Seq("platform", "event_date"), "timestamp")
}
