package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-off A/B measurement main (r19) — the committed-artifact side of
  * "measured and rejected/adopted" adjudications. Not part of the
  * driver contract (Bench/Verify are); like [[Explain]], it exists so
  * optimization experiments run from a documented entry point instead
  * of scratch code, and their JSON lands in the repo as evidence.
  *
  * Usage: sbt "runMain graft.Probe <name>" with SPARK_GRAFT_SF_DIR /
  * SPARK_GRAFT_CPUS as in Bench. Probes:
  *
  *   - winnow_cascade: the r18 w-cascade winnowTuning spelling vs the
  *     registered per-cell spelling (verdict ask #6 — re-adjudicate at
  *     constrained cores). Asserts row-identity first, then alternates
  *     warm timed runs of each arm and prints median-of-3 per arm.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Probe <winnow_cascade>")
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

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def dropBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    def timed(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      noop(f())
      val secs = (System.nanoTime() - t0) / 1e9
      dropBlocks()
      secs
    }
    // alternating warm medians: warmup each arm once, then 3 alternated
    // samples per arm — both arms see the same JVM/window drift
    def ab(a: () => DataFrame, b: () => DataFrame): (Double, Seq[Double], Double, Seq[Double]) = {
      timed(a); timed(b)
      val as = scala.collection.mutable.ArrayBuffer[Double]()
      val bs = scala.collection.mutable.ArrayBuffer[Double]()
      (1 to 3).foreach { _ => as += timed(a); bs += timed(b) }
      (as.sorted.apply(1), as.toSeq, bs.sorted.apply(1), bs.toSeq)
    }

    args(0) match {
      case "winnow_cascade" =>
        import graft.operators.TextAnalytics
        val cur = () => TextAnalytics.winnowTuningPerCell(spark, sfDir)
        val cas = () => TextAnalytics.winnowTuningCascade(spark, sfDir)
        val a = cur().collect().toSeq
        val b = cas().collect().toSeq
        require(a == b, s"cascade diverged:\n$a\n$b")
        dropBlocks()
        val (am, as, bm, bs) = ab(cur, cas)
        println(s"""{"metric":"winnow_cascade_ab","cpus":$cpus,"rows_identical":true,"current_median_sec":$am,"current_runs":${as.mkString("[", ",", "]")},"cascade_median_sec":$bm,"cascade_runs":${bs.mkString("[", ",", "]")},"sf":${JsonText.escape(sfDir)}}""")
      case "text_gate_plan" =>
        // batch-frame explain of the text-gate transform chain (the
        // streaming plan shares the same optimizer rules): how many
        // times does each fused census expression survive in the plan?
        val docs = Tables.documents(spark, sfDir)
          .filter(org.apache.spark.sql.functions.col("text").isNotNull)
          .select("doc_id", "text")
        val gated = graft.streaming.StreamingFeatures.repetitionGateStream(
          graft.streaming.StreamingFeatures.gopherGateStream(docs))
        val plan = gated.queryExecution.optimizedPlan.toString
        println(plan)
        println("multi occurrences: " +
          "ngramrepstatsmulti".r.findAllIn(plan).size)
        println("gopher occurrences: " +
          "gopherstats".r.findAllIn(plan).size)
      case "window_audit" =>
        // r18 verdict ask #8: enumerate every registered query whose
        // plan contains a Window with an EMPTY partition spec (the "No
        // Partition Defined" warning source), so each can be pinned
        // output-sized or fixed. Walks the optimized logical plan —
        // no execution.
        SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
          try {
            val plan = fn(spark, sfDir).queryExecution.optimizedPlan
            val hits = plan.collect {
              case w: org.apache.spark.sql.catalyst.plans.logical.Window
                  if w.partitionSpec.isEmpty =>
                w.windowExpressions.map(_.sql.take(60)).mkString("; ")
            }
            if (hits.nonEmpty)
              println(s"SINGLE-PARTITION-WINDOW $name :: ${hits.mkString(" || ")}")
          } catch { case t: Throwable =>
            println(s"WINDOW-AUDIT-ERROR $name ${t.getClass.getSimpleName}")
          }
        }
      case other =>
        sys.error(s"unknown probe $other")
    }
    spark.stop()
  }
}
