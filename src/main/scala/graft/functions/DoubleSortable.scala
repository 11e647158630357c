package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** IEEE-754 order-preserving DOUBLE ↔ BIGINT transform — the bridge
  * that lets every BIGINT-exact sketch in the engine hold double-valued
  * measurements (quantile sketches of quality/perplexity scores — the
  * sketch family's main customer type) without giving up
  * oracle-replayability: the transform is a TOTAL ORDER embedding
  * (Lucene's NumericUtils.doubleToSortableLong construction, public
  * literature), so any rank/sort/min/max computed on the transformed
  * BIGINT equals the same computation on the doubles, and the BIGINT
  * machinery — already integer-exact cross-engine — replays verbatim.
  *
  * Construction: d → bits = doubleToLongBits(d) (canonical NaN), then
  * bits ^ ((bits >> 63) & 0x7fffffffffffffffL): positives keep their
  * bit pattern (already ascending as signed longs), negatives flip
  * their 63 magnitude bits (reversing their order while keeping the
  * sign bit, so they stay below every positive). The map is an
  * INVOLUTION on the long side — the same xor-mask inverts it — so the
  * round trip is exact for every double, including ±0.0, ±Inf,
  * denormals, and (canonicalized) NaN.
  *
  * Total-order semantics (java.lang.Double.compare's, NOT SQL's):
  * -0.0 sorts strictly below +0.0, NaN sorts above +Infinity (one
  * canonical NaN — doubleToLongBits collapses payloads). A SQL engine
  * ordering raw doubles agrees everywhere except those two points
  * (SQL: -0.0 = +0.0; DuckDB places NaN above +Inf, matching), so an
  * oracle may replay transformed-BIGINT ranks with a plain ORDER BY on
  * the doubles whenever the data avoids -0.0 — the gates do, and the
  * spec pins the divergence point Spark-side. */
final case class DoubleToSortableLong(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "double_to_sortable_long"

  override protected def nullSafeEval(input: Any): Any =
    DoubleSortable.toSortable(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DoubleSortable.toSortable($c)")

  override protected def withNewChildInternal(newChild: Expression): DoubleToSortableLong =
    copy(child = newChild)
}

/** Inverse of [[DoubleToSortableLong]] — same xor-mask (the map is an
  * involution on the long side), then longBitsToDouble. */
final case class SortableLongToDouble(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sortable_long_to_double"

  override protected def nullSafeEval(input: Any): Any =
    DoubleSortable.toDouble(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DoubleSortable.toDouble($c)")

  override protected def withNewChildInternal(newChild: Expression): SortableLongToDouble =
    copy(child = newChild)
}

object DoubleSortable {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Called from generated code. */
  def toSortable(d: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(d)
    bits ^ ((bits >> 63) & 0x7fffffffffffffffL)
  }

  /** Called from generated code. */
  def toDouble(s: Long): Double =
    java.lang.Double.longBitsToDouble(s ^ ((s >> 63) & 0x7fffffffffffffffL))

  /** Column API: DOUBLE → order-preserving BIGINT. */
  def toSortableLong(c: Column): Column =
    Bridge.column(DoubleToSortableLong(Bridge.expression(c)))

  /** Column API: order-preserving BIGINT → DOUBLE. */
  def fromSortableLong(c: Column): Column =
    Bridge.column(SortableLongToDouble(Bridge.expression(c)))
}
