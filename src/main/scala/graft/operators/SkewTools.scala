package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB path.
  *
  * AQE's skew-join splitting (enabled in [[graft.GraftSession]]) covers
  * sort-merge joins; these helpers cover the two cases AQE does not:
  * aggregation skew (one hot grouping key saturating a reducer) and
  * broadcast-salted joins against a skewed build side.
  */
object SkewTools {

  /** Two-stage salted aggregation: count/sum-like measures survive
    * partial-then-final composition, so a hot key is first reduced across
    * `saltBuckets` parallel partials, then combined. Deterministic salt
    * (row-id modulo) — no RNG in the plan.
    *
    * Equivalent to `df.groupBy(keys).agg(count/sum)` for any input
    * (proved in SkewSpec); worst-case reducer load drops from |hot key|
    * to |hot key| / saltBuckets.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], measures: Map[String, String],
      saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(saltBuckets)))
    val partialAggs = measures.map { case (c, f) =>
      (f match {
        // "count" of a real column counts non-nulls (matching
        // groupBy.agg(count(col))); count("*") counts rows
        case "count" => if (c == "*") count(lit(1)) else count(col(c))
        case "sum" => sum(col(c))
        case "max" => max(col(c))
        case "min" => min(col(c))
        case other => throw new IllegalArgumentException(
          s"saltedAggregate: unsupported measure '$other' (count/sum/max/min)")
      }).as(s"__p_$c")
    }.toSeq
    val finalAggs = measures.map { case (c, f) =>
      (f match {
        case "count" | "sum" => sum(col(s"__p_$c"))
        case "max" => max(col(s"__p_$c"))
        case "min" => min(col(s"__p_$c"))
      }).as(if (c == "*") "count" else c)
    }.toSeq
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted broadcast join for a skewed probe side against a small build
    * side: replicate each build row `saltBuckets` times with a salt
    * column, salt the probe rows, equi-join on (key, salt). Distributes a
    * hot probe key across `saltBuckets` tasks even under a shuffle join.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      saltBuckets: Int = 16): DataFrame = {
    val saltedProbe = probe.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets)))
    val replicatedBuild = build.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit(_)): _*)))
    saltedProbe.join(replicatedBuild, Seq(key, "__salt")).drop("__salt")
  }
}
