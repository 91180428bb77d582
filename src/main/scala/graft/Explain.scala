package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: print the formatted (and, with EXEC=1, the executed
  * AQE-final) plan of one registered query at a given SF dir. Usage:
  *
  *   sbt "runMain graft.Explain q_decontam /root/testdata/sf0.1"
  *
  * With SPARK_GRAFT_EXPLAIN_EXEC=1 the query is first executed against
  * the noop sink so adaptive decisions (broadcast-vs-shuffle joins,
  * coalesced partitions) are final rather than speculative.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: Explain <queryName> [sfDir]")
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
}
