package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge. Spark 4 made these conversions
  * `private[sql]` (Connect refactor), so custom native expressions need a
  * shim inside the org.apache.spark.sql namespace — the same technique
  * every OSS Spark extension library uses. Nothing else may live here. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a native-expression SQL function on a LIVE session (the
    * extensions path only applies to sessions built with withExtensions). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression, exprClass: String): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(
        new FunctionIdentifier(name),
        new ExpressionInfo(exprClass, name),
        builder)
}
