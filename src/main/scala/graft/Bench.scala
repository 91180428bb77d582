package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * A warmup pass at sf0.001 runs first so JVM/JIT/codegen compilation is
  * not billed to whichever query happens to execute first; timings then
  * reflect steady-state engine cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    // noop sink evaluates the FULL plan (count() would let Catalyst prune
    // projections and eliminate final sorts, timing a bare scan for
    // projection-only queries)
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val warmupDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmupDir).isDirectory) {
      SparkEntry.queries.foreach { case (_, fn) =>
        try run(fn(spark, warmupDir)) catch { case _: Throwable => () }
      }
    }

    // Min of two timed executions per query: the host shows heavy
    // run-to-run variance (GC/JIT/noisy neighbor), and min-of-N is the
    // standard steady-state estimator under one-sided noise. A query is
    // timed if ANY run completed and lands in the errors map only when
    // EVERY run failed — the two maps are disjoint, so the driver gets an
    // unambiguous completed/failed status per query (a swallowed failure
    // would otherwise record near-zero seconds and silently under-report
    // the suite).
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.flatMap { case (name, fn) =>
      var lastErr = "unknown"
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try { run(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
        catch { case t: Throwable =>
          lastErr = (t.getClass.getSimpleName + ": " +
            String.valueOf(t.getMessage).replaceAll("\\s+", " ").take(200))
          None
        }
      }
      if (times.isEmpty) { errors(name) = lastErr; None }
      else Some(name -> times.min)
    }
    val qs = results.map { case (k, v) => JsonText.escape(k) + ":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => JsonText.escape(k) + ":" + JsonText.escape(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val ingest = streamIngestRate(spark, sfDir)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir","stream_ingest_rows_per_sec":$ingest}""")
    spark.stop()
  }

  /** Streaming-ingest throughput vs BASELINE.md's 536 msg/s target: drive
    * the full watermarked 20-min feature pipeline (tag → window → pivot →
    * append sink) from a MemoryStream replay of the events table, report
    * rows/second sustained end-to-end.
    */
  private def streamIngestRate(spark: SparkSession, sfDir: String): Double = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    try {
      val rows = graft.Tables.events(spark, sfDir)
        .filter(col("event_type").isin("click", "view"))
        .select(col("user_id").cast("string"), col("ts"), col("event_type"))
        .orderBy("ts")
        .as[(String, java.sql.Timestamp, String)].collect()
      val stream = MemoryStream[(String, java.sql.Timestamp, String)](spark)
      val sdf = stream.toDF().toDF("uuid", "event_time", "tag")
      val features = graft.streaming.StreamingFeatures.windowedCounts(sdf, "20 minutes")
      val q = features.writeStream.outputMode("append").format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ingest").toString)
        .start()
      val t0 = System.nanoTime()
      rows.grouped(10000).foreach(chunk => stream.addData(chunk.toSeq))
      q.processAllAvailable()
      val secs = (System.nanoTime() - t0) / 1e9
      q.stop()
      math.round(rows.length / secs * 10.0) / 10.0
    } catch { case _: Throwable => -1.0 }
  }
}
