package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewTools

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted aggregate equals direct groupBy for count and sum") {
    val ev = Tables.events(spark, TestSpark.sf)
    val direct = ev.groupBy("event_type")
      .agg(count(lit(1)).as("value"), sum("value").as("value_sum"))
      .select(col("event_type"), col("value"), round(col("value_sum"), 4).as("value_sum"))
      .collect().toSet
    val salted = SkewTools.saltedAggregate(
      ev.select("event_type", "value"), Seq("event_type"),
      Map("value" -> "sum"), saltBuckets = 8)
    val saltedCount = SkewTools.saltedAggregate(
      ev.select(col("event_type")), Seq("event_type"),
      Map("*" -> "count"), saltBuckets = 8)
    val merged = saltedCount.withColumnRenamed("count", "value")
      .join(salted.select(col("event_type"), round(col("value"), 4).as("value_sum")), "event_type")
      .collect().toSet
    assert(merged == direct)
  }

  test("salted join equals plain join") {
    val probe = Tables.orders(spark, TestSpark.sf).select("o_orderkey", "o_custkey")
    val build = Tables.customer(spark, TestSpark.sf)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = probe.join(build, "o_custkey").collect().toSet
    val salted = SkewTools.saltedJoin(probe, build, "o_custkey", 8).collect().toSet
    assert(salted.map(r => (r.getLong(0), r.getLong(1), r.getString(2))) ==
      plain.map(r => (r.getLong(0), r.getLong(1), r.getString(2))))
  }
}
