package graft

import org.apache.spark.sql.SparkSession

/** One shared session for all suites (sbt forks one test JVM). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)
  val sf: String = "/root/testdata/sf0.001"
}
