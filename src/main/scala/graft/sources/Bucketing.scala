package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed at-rest layout for co-located joins (SURVEY §4 partitioning
  * stance; builder-prompt "bucketing for co-located joins").
  *
  * At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
  * sides; writing the tables bucketed by the join key with matching bucket
  * counts lets Spark plan a sort-merge join with **no Exchange on either
  * side** (verified in BucketingSpec by plan inspection). The write costs
  * one shuffle once; every subsequent join of the pair is shuffle-free.
  */
object Bucketing {

  /** Persist `df` as a bucketed managed table (overwrite). Drops any
    * previous incarnation first and clears an orphaned warehouse location
    * (a crashed run can leave the directory without catalog metadata,
    * which Spark refuses to overwrite).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, sortCol: Option[String] = None): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val orphan = new java.io.File(warehouse, table)
    if (orphan.exists()) FileUtils.deleteRecursively(orphan)
    val w = df.write.mode("overwrite").bucketBy(buckets, bucketCol)
    sortCol.fold(w)(s => w.sortBy(s)).saveAsTable(table)
  }

  /** Join two same-bucketed tables on the bucket key. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
