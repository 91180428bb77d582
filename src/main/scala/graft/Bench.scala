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

    // Several similarity/dedup queries materialize intermediates via lazy
    // localCheckpoint; their blocks are freed by the ContextCleaner only
    // when the JVM gets around to GC-ing the RDD references. Under the
    // bench's back-to-back load that lag lets dead blocks pile up and
    // bleed block-manager/GC pressure into UNRELATED queries (r3 saw
    // untouched queries swing 5x). Dropping every persisted RDD between
    // queries makes each measurement start from a clean block manager;
    // correctness is unaffected because every timed run rebuilds its
    // DataFrames (and checkpoints) from scratch. blocking = true: the
    // call sits OUTSIDE every timed region, so waiting here is free —
    // async removal would let the cleanup run inside the next query's
    // timed window, which is the exact bleed being eliminated.
    def dropLingeringBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

    val warmupDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmupDir).isDirectory) {
      SparkEntry.queries.foreach { case (_, fn) =>
        try run(fn(spark, warmupDir)) catch { case _: Throwable => () }
        dropLingeringBlocks()
      }
    }

    // Min of two timed executions per query: the host shows heavy
    // run-to-run variance (GC/JIT/noisy neighbor), and min-of-N is the
    // standard steady-state estimator under one-sided noise. Noise
    // magnitude on record: r6 flagged q_session_stats / q_top_orders /
    // q_trailing_count_1h as ~1.6-1.9x regressions vs r5; r7 re-measured
    // all three at r5 levels or better with ZERO commits touching them
    // (0.71→0.32, 0.45→0.23, 0.72→0.42 s) — swings of that size on
    // sub-second queries are host noise, not plan changes. A query is
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
        val r = try { run(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
        catch { case t: Throwable =>
          lastErr = (t.getClass.getSimpleName + ": " +
            String.valueOf(t.getMessage).replaceAll("\\s+", " ").take(200))
          None
        }
        dropLingeringBlocks()
        r
      }
      if (times.isEmpty) { errors(name) = lastErr; None }
      else Some(name -> times.min)
    }
    val qs = results.map { case (k, v) => JsonText.escape(k) + ":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => JsonText.escape(k) + ":" + JsonText.escape(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val (ingest, ingestRuns, ingestErr) = streamIngestRate(spark, sfDir)
    val runsJson = ingestRuns.mkString("[", ",", "]")
    val ingestErrJson =
      if (ingestErr == null) "null" else JsonText.escape(ingestErr)
    val scaleJson = scaleProbe(spark, sfDir, results, run, () => dropLingeringBlocks())
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":${JsonText.escape(sfDir)},"stream_ingest_rows_per_sec":$ingest,"ingest_runs":$runsJson,"ingest_error":$ingestErrJson,"scale":$scaleJson}""")
    spark.stop()
  }

  /** Scale-cliff probe: the corpus-pipeline subset re-timed on a
    * `ScaleFactor`× replication of the documents + embeddings tables —
    * the one data point plan-shape arguments can't fake. Each document
    * replica beyond the first gets a replica-token prefix (dup structure
    * per replica matches the original corpus — the dup RATE is
    * preserved, not multiplied); embeddings replicate byte-identical
    * (a deliberate dup-pile stress: the exact-collapse bound of
    * semanticDedup is exactly what must absorb it). Ids remap as
    * id·factor + replica so modulus-selected subsets stay proportional.
    *
    * Output per query: scaled seconds and `scaling` = t_scaled /
    * (t_base · factor) — 1.0 is perfectly linear, < 1 sublinear. The
    * base is the main loop's min-of-2 while the scaled run is timed
    * once (the probe doubles nothing), so ratios are a conservative
    * upper bound. Reading the ratios: PAIR-LIST operators
    * (q_ngram_jaccard, q_minhash_lsh) legitimately exceed 1.0 here —
    * the replica-token prefix makes the replicas of one doc near-dups
    * of EACH OTHER, so the answer itself grows superlinearly (no
    * operator can emit fewer rows than its answer); the cluster-form
    * operators over the same corpus (q_simhash_clusters,
    * q_semantic_dedup) stay well under 1.0 because their output is one
    * row per doc. Disable with SPARK_GRAFT_SCALE_FACTOR=0.
    */
  private val ScaleQueries = Seq(
    "q_dedup_exact", "q_dedup_stats", "q_passage_dedup", "q_minhash_lsh",
    "q_simhash_clusters", "q_simhash_components", "q_ngram_jaccard",
    "q_semantic_dedup", "q_bm25_search",
    "q_tfidf_top_terms", "q_perplexity_buckets", "q_perplexity_buckets_approx",
    "q_perplexity_bigram",
    "q_dsir_weights", "q_shard_interleave", "q_pack_sequences",
    "q_decontam", "q_curation_full", "q_curation_complete")

  private def scaleProbe(spark: SparkSession, sfDir: String,
      base: Map[String, Double],
      run: org.apache.spark.sql.DataFrame => Unit,
      dropBlocks: () => Unit): String = {
    import org.apache.spark.sql.functions._
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    if (factor <= 1) return "null"
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_scale").toString
      val t0 = System.nanoTime()
      val reps = spark.range(factor).select(col("id").cast("long").as("r"))
      spark.read.parquet(s"$sfDir/documents.parquet")
        .crossJoin(reps)
        .select((col("doc_id") * factor + col("r")).as("doc_id"),
          when(col("r") === 0, col("text"))
            .otherwise(concat(lit("r"), col("r"), lit(" "), col("text")))
            .as("text"),
          col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .crossJoin(reps)
        .select((col("vec_id") * factor + col("r")).as("vec_id"),
          col("embedding"), col("label"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val writeSec = (System.nanoTime() - t0) / 1e9
      dropBlocks()

      val errors = scala.collection.mutable.LinkedHashMap[String, String]()
      val timed = ScaleQueries.flatMap { name =>
        SparkEntry.queries.get(name).flatMap { fn =>
          val s0 = System.nanoTime()
          val r = try { run(fn(spark, dir)); Some(name -> (System.nanoTime() - s0) / 1e9) }
          catch { case t: Throwable =>
            errors(name) = (t.getClass.getSimpleName + ": " +
              String.valueOf(t.getMessage).replaceAll("\\s+", " ").take(200))
            None
          }
          dropBlocks()
          r
        }
      }
      // clean the replicated parquet before reporting
      import java.nio.file.{Files => JFiles, Paths}
      import scala.jdk.CollectionConverters._
      JFiles.walk(Paths.get(dir)).iterator().asScala.toSeq.reverse
        .foreach(p => JFiles.deleteIfExists(p))

      val qJson = timed.map { case (k, v) => JsonText.escape(k) + ":" + v }
        .mkString("{", ",", "}")
      val ratioJson = timed.flatMap { case (k, v) =>
        base.get(k).filter(_ > 0).map { b =>
          JsonText.escape(k) + ":" + (math.round(v / (b * factor) * 1000.0) / 1000.0)
        }
      }.mkString("{", ",", "}")
      val errJson = errors.map { case (k, v) =>
        JsonText.escape(k) + ":" + JsonText.escape(v) }.mkString("{", ",", "}")
      s"""{"factor":$factor,"write_sec":$writeSec,"queries":$qJson,"scaling":$ratioJson,"errors":$errJson}"""
    } catch { case t: Throwable =>
      s"""{"error":${JsonText.escape(t.getClass.getSimpleName + ": " +
        String.valueOf(t.getMessage).replaceAll("\\s+", " ").take(200))}}"""
    }
  }

  /** Streaming-ingest throughput vs BASELINE.md's 536 msg/s target: drive
    * the full watermarked 20-min feature pipeline (tag → window → pivot →
    * append sink) from a MemoryStream replay of the events table.
    *
    * Measurement discipline (this was the suite's least repeatable number
    * for three rounds — 6,549 → 1,511 → 7,686 rows/s with no change to the
    * measured path, while every batch query got min-of-2):
    *   - the replay is capped at [[IngestReplayRows]] time-ordered rows, so
    *     driver memory is bounded at ANY scale factor (the old unbounded
    *     `collect()` capped the measurable SF) and every round feeds the
    *     pipeline an identically-sized workload;
    *   - one untimed warmup pass absorbs state-store/codegen/stream-init
    *     cost, then the MEDIAN of three timed passes is reported — a
    *     two-sided estimator, because streaming throughput noise (GC pauses
    *     mid-batch, state-store flush timing) is not one-sided the way
    *     batch scheduling noise is. The per-pass rates are emitted
    *     alongside so a swing is visible as spread, not as silence;
    *   - a failure reports `-1` WITH the error string (`ingest_error`),
    *     never a silent sentinel.
    */
  private val IngestReplayRows = 250000

  private def streamIngestRate(
      spark: SparkSession, sfDir: String): (Double, Seq[Double], String) = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    try {
      // (ts, event_id) is a unique sort key: without the tie-break, rows
      // tied on ts at the 250k cutoff would be an arbitrary subset per
      // execution — workload drift in the one metric hardened for
      // repeatability
      val rows = graft.Tables.events(spark, sfDir)
        .filter(col("event_type").isin("click", "view"))
        .select(col("user_id").cast("string"), col("ts"), col("event_type"),
          col("event_id"))
        .orderBy("ts", "event_id").limit(IngestReplayRows)
        .drop("event_id")
        .as[(String, java.sql.Timestamp, String)].collect()
      def onePass(): Double = {
        val stream = MemoryStream[(String, java.sql.Timestamp, String)](spark)
        val sdf = stream.toDF().toDF("uuid", "event_time", "tag")
        val features =
          graft.streaming.StreamingFeatures.windowedCounts(sdf, "20 minutes")
        val ckpt = java.nio.file.Files.createTempDirectory("ingest")
        val q = features.writeStream.outputMode("append").format("noop")
          .option("checkpointLocation", ckpt.toString)
          .start()
        try {
          val t0 = System.nanoTime()
          // one processAllAvailable per chunk: every pass runs the SAME
          // micro-batch boundaries (5 × 50k) and hence the same state
          // commits. The old fire-all-then-drain shape raced addData
          // against background batch planning, so batch count — and with
          // it state-store flush work — varied per pass; that race was
          // the dominant term of the reported 2.5× per-pass spread.
          rows.grouped(50000).foreach { chunk =>
            stream.addData(chunk.toSeq)
            q.processAllAvailable()
          }
          val secs = (System.nanoTime() - t0) / 1e9
          math.round(rows.length / secs * 10.0) / 10.0
        } finally {
          q.stop()
          // state-store deltas for a 250k replay are sizable and four
          // passes run per bench — don't leave them in /tmp
          import java.nio.file.{Files => JFiles}
          import scala.jdk.CollectionConverters._
          JFiles.walk(ckpt).iterator().asScala.toSeq.reverse
            .foreach(p => JFiles.deleteIfExists(p))
        }
      }
      onePass() // warmup: stream/state-store/codegen init, not billed
      val rates = (1 to 3).map { _ =>
        // each pass starts from an equally-collected heap: the 77 batch
        // queries before this leave GC debt that otherwise lands inside
        // whichever pass triggers the full collection (r6: a 2.5×
        // per-pass spread with the median stable round-over-round)
        System.gc()
        onePass()
      }.sorted
      (rates(1), rates, null)
    } catch { case t: Throwable =>
      (-1.0, Seq.empty, t.getClass.getSimpleName + ": " +
        String.valueOf(t.getMessage).replaceAll("\\s+", " ").take(200))
    }
  }
}
