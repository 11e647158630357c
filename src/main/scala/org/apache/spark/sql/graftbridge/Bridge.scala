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
    * whatever a caller-supplied materialize strategy produced.
    *
    * PRECONDITION: nothing may still compute from `df` after this call.
    * A localCheckpoint's lineage is truncated, so its freed blocks are
    * UNRECOVERABLE — the caller must have fully materialized the successor
    * frame (eagerly, or forced via an action such as a convergence check)
    * before retiring its predecessor. Every current call site satisfies
    * this (ConnectedComponents retires round N only after round N+1's
    * materialize + converge-check actions ran). Spark logs that exact
    * caveat as a WARN on every such unpersist; since it is the designed
    * and documented behavior here, the warning is suppressed for the
    * duration of the call instead of spamming every bench/test log. */
  def unpersistMaterialized(df: org.apache.spark.sql.DataFrame): Unit =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        quietly(l.rdd.getClass.getName) { l.rdd.unpersist(blocking = false) }
      case _ => ()
    }

  /** Run `body` with `loggerName` raised to ERROR, restoring the previous
    * configuration after. Serialized under a lock (two concurrent retires
    * must not race the save/restore into pinning the level), and a logger
    * that had NO explicit config before is restored by REMOVING the
    * temporary config — re-setting the previously-effective level would
    * convert the inherited level into an explicit one, detaching the
    * (very common) concrete RDD class logger from future root-level
    * changes like sparkContext.setLogLevel. Driver-side only; the narrow
    * window can mask unrelated warnings from the same class, which is the
    * accepted trade. */
  private val logLock = new Object
  private def quietly(loggerName: String)(body: => Unit): Unit = logLock.synchronized {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.config.Configurator
    val ctx = LogManager.getContext(false) match {
      case c: LoggerContext => Some(c)
      case _ => None
    }
    val hadExplicit = ctx.exists(_.getConfiguration.getLoggers.containsKey(loggerName))
    val prev = LogManager.getLogger(loggerName).getLevel
    Configurator.setLevel(loggerName, Level.ERROR)
    try body
    finally {
      if (hadExplicit || ctx.isEmpty) Configurator.setLevel(loggerName, prev)
      else ctx.foreach { c =>
        c.getConfiguration.removeLogger(loggerName)
        c.updateLoggers()
      }
    }
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
