package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column <-> Expression converters of
  * Spark 4's classic module, so graft code can expose custom Catalyst
  * expressions as user-facing `Column`s. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eagerly convert a Column into a concrete catalyst expression tree
    * (UnresolvedAttribute / Literal / And / comparison nodes) — the lazy
    * ColumnNodeExpression wrapper hides the tree from pattern matching. */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Re-tag a batch DataFrame as a streaming one — required for V1
    * streaming Source.getBatch results (MicroBatchExecution asserts
    * isStreaming). */
  def asStreamingDataFrame(df: DataFrame): DataFrame = {
    val classicSpark = df.sparkSession.asInstanceOf[classic.SparkSession]
    classicSpark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
