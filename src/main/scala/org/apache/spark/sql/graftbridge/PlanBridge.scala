package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession, classic}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** DataFrame ⇄ LogicalPlan conversion for custom logical operators.
  * Spark 4 keeps `Dataset.ofRows` inside the `classic` implementation
  * package, so — like [[ColumnBridge]] — the accepted extension pattern
  * is this forwarding object in the `org.apache.spark.sql` namespace. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def logicalPlan(df: DataFrame): LogicalPlan = df.queryExecution.logical

  /** Parse a SQL expression into a bare catalyst tree. Unlike Column →
    * Expression conversion, the parsed tree carries no Column-API
    * ColumnNode baggage, so it survives task serialization inside
    * custom physical operators. */
  def parseExpression(spark: SparkSession, sql: String)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.sqlParser.parseExpression(sql)
}
