package graft

import org.apache.spark.sql.SparkSession

/** Plan-file dumper for the optimization-round deliverables: for each
  * named query, writes `<outDir>/<query>_<tag>.txt` containing the
  * `explain("formatted")` output AND (because this engine's partition-
  * economics claims are AQE-runtime decisions a speculative plan cannot
  * show) the AQE-final executed plan after one noop-sink execution.
  * One JVM for the whole list — [[Explain]] stays the single-query
  * interactive form.
  *
  * Usage: sbt "runMain graft.PlanDump plans/r19 after q_a,q_b[,...]"
  * with SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <outDir> <tag> <q1,q2,...>")
    val (outDir, tag, names) = (args(0), args(1), args(2).split(",").toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      val df = fn(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      df.write.format("noop").mode("overwrite").save()
      // executed plan of the SAME QueryExecution (the noop write plans
      // its own; executing toRdd finalizes this one's AQE decisions)
      df.queryExecution.toRdd.count()
      val executed = df.queryExecution.executedPlan.toString
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
        s"=== formatted plan ===\n$formatted\n=== executed plan (AQE-final) ===\n$executed\n")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      println(s"dumped $name")
    }
    spark.stop()
  }
}
