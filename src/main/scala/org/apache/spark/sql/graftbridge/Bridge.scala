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

  /** Free the storage blocks behind a checkpointed frame (localCheckpoint
    * pins its RDD via persist; waiting for the ContextCleaner means every
    * retired iteration round stays pinned until driver GC). No-op for
    * frames that are not checkpoint-backed, so callers can apply it to
    * whatever a caller-supplied materialize strategy produced. */
  def unpersistMaterialized(df: org.apache.spark.sql.DataFrame): Unit =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

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
