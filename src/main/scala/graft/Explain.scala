package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: print the formatted (and, with EXEC=1, the executed
  * AQE-final) plan of one registered query at a given SF dir. Usage:
  *
  *   sbt "runMain graft.Explain q_decontam /root/testdata/sf0.1"
  *   sbt "runMain graft.Explain --audit /root/testdata/sf0.01"
  *
  * With SPARK_GRAFT_EXPLAIN_EXEC=1 the query is first executed against
  * the noop sink so adaptive decisions (broadcast-vs-shuffle joins,
  * coalesced partitions) are final rather than speculative.
  *
  * `--audit` runs the verify skill's scan-count sweep over EVERY
  * registered query in one JVM: per query, the number of parquet scans,
  * hash exchanges, range exchanges, and whether ANY exchange input
  * (hash or range — r7's passage-dedup finding showed sort exchanges
  * were a blind spot) carries a raw `text#`/`text_clean#` column — the
  * one-glance smells (a multi-consumer frame re-running its scan, an
  * unexpected shuffle, the corpus crossing an exchange). Queries whose
  * first operator is a lazy localCheckpoint legitimately report 0
  * visible scans (the scan hides behind the checkpoint boundary) — read
  * those rows as "shape asserted elsewhere", not as free. The REWRITE
  * operators (q_passage_dedup, q_dup_span_scrub and its n=50 variant)
  * print "yes (answer-bearing sort)": their final range sort carries the
  * raw text because their ANSWER is the rebuilt corpus; PlanSpec pins
  * that the sort is the only text-bearing exchange and that the rebuild
  * runs above it. Any other text-crossing exchange renders "YES <--
  * smell" — a regression, no scaladoc cross-reference needed.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: Explain <queryName>|--audit [sfDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    if (name == "--audit") { audit(spark, sfDir); spark.stop(); return }
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val df = fn(spark, sfDir)
    if (sys.env.get("SPARK_GRAFT_EXPLAIN_EXEC").contains("1")) {
      // execute THIS QueryExecution (a sink write would plan a separate
      // one, leaving this plan speculative — isFinalPlan=false)
      df.queryExecution.toRdd.count()
      println("=== executed plan (AQE-final) ===")
      println(df.queryExecution.executedPlan.toString)
    } else {
      println("=== formatted plan ===")
      df.explain("formatted")
    }
    spark.stop()
  }

  private def audit(spark: SparkSession, sfDir: String): Unit = {
    println(f"${"query"}%-32s scans  hashEx  rangeEx  text-in-anyEx")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val lines = plan.linesIterator.toVector
        val scans = lines.count(_.matches("""\(\d+\) Scan parquet\s*"""))
        val exchanges = lines.zipWithIndex.collect {
          case (l, i) if l.matches("""\(\d+\) Exchange\b.*""") =>
            val detail = lines.slice(i + 1, i + 4)
            (detail.find(_.startsWith("Input")).getOrElse(""),
              detail.find(_.startsWith("Arguments")).getOrElse(""))
        }
        val hashEx = exchanges.filter(_._2.contains("hashpartitioning"))
        // range exchanges were the audit's blind spot until r8: the
        // passage-dedup global sort shipped the rebuilt corpus through
        // one while every HASH exchange stayed slim (r7 verdict)
        val rangeEx = exchanges.filter(_._2.contains("rangepartitioning"))
        // flag only a BARE text/text_clean attribute in the input list —
        // a derived name like `md5(cast(text#1 as binary))#18` is a
        // digest, not the corpus crossing the wire
        val bareText = """[\[ ]text(_clean)?#\d+[,\]]""".r
        val textCrossing = exchanges.exists(e => bareText.findFirstIn(e._1).isDefined)
        // the REWRITE operators' final range sort legitimately carries the
        // rebuilt corpus (their ANSWER is the text); render those as
        // sanctioned so only an UNEXPECTED text-crossing exchange reads as
        // a smell (r8 advice — no scaladoc cross-reference needed)
        val sanctionedTextSort =
          Set("q_passage_dedup", "q_dup_span_scrub", "q_dup_span_scrub_n50")
        val flag =
          if (!textCrossing) "-"
          else if (sanctionedTextSort(name)) "yes (answer-bearing sort)"
          else "YES <-- smell"
        println(f"$name%-32s $scans%5d  ${hashEx.size}%6d  ${rangeEx.size}%7d  $flag")
      } catch { case t: Throwable =>
        println(f"$name%-32s ERR ${t.getClass.getSimpleName}: ${String.valueOf(t.getMessage).take(80)}")
      }
    }
  }
}
