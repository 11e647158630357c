package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{Md5Fold32, QuantizedDotProduct}

/** Session-extension entry point: registers the engine's native
  * expressions as SQL functions so pure-SQL users get them too.
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)        // programmatic
  *   // or: spark.sql.extensions=graft.GraftExtensions
  *
  * Column-API users don't need this — graft.functions.VectorExpressions
  * and graft.wells.Cleaning expose the same kernels directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("quantized_dot"),
      new ExpressionInfo(classOf[QuantizedDotProduct].getName, "quantized_dot"),
      GraftExtensions.quantizedDotBuilder))
    ext.injectFunction((
      new FunctionIdentifier("md5_fold32"),
      new ExpressionInfo(classOf[Md5Fold32].getName, "md5_fold32"),
      GraftExtensions.md5Fold32Builder))
  }
}

object GraftExtensions {
  private[graft] val quantizedDotBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => QuantizedDotProduct(a, b)
    case children => throw new IllegalArgumentException(
      s"quantized_dot expects 2 arguments, got ${children.length}")
  }

  private[graft] val md5Fold32Builder: Seq[Expression] => Expression = {
    case Seq(c) => Md5Fold32(c)
    case children => throw new IllegalArgumentException(
      s"md5_fold32 expects 1 argument, got ${children.length}")
  }

  /** Register on an already-running session (getOrCreate ignores
    * withExtensions once a session exists). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, "quantized_dot", quantizedDotBuilder,
      classOf[QuantizedDotProduct].getName)
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, "md5_fold32", md5Fold32Builder, classOf[Md5Fold32].getName)
  }
}
