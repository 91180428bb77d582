package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column/Expression plumbing for the graft
  * engine's native Catalyst expressions (Spark 4 moved Column to a
  * ColumnNode facade; `classic.ExpressionUtils` is the sanctioned internal
  * converter). Lives in this package solely for access; contains no logic.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Runtime function registration (the `SparkSessionExtensions.injectFunction`
    * path needs to own session construction; the verify driver does not).
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
