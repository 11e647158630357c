package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the vector kernels (SURVEY.md §2.9's
  * promotion path: built-in > custom Expression > UDF).
  *
  * The composed built-in form `aggregate(zip_with(a, b, _*_), 0, _+_)`
  * allocates an intermediate array per row and evaluates two higher-order
  * lambdas; this expression is one branch-free fused loop with full
  * whole-stage codegen — the difference between "fine at 60k rows" and
  * "fine at 100 TB" for the ANN scoring inner loop.
  */
final case class QuantizedDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quantized_dot"

  /** Whether a null ELEMENT can occur in either input array. Folded into
    * [[nullable]]: the expression returns null on a null element even when
    * both array columns are non-null, so deriving nullability from the
    * children alone (the BinaryExpression default) would both license the
    * optimizer to mis-fold IsNull on this expression AND make
    * nullSafeCodeGen bind `ev.isNull` to the literal `false` — the
    * generated `false = true;` in the loop's null branch then fails Janino
    * compilation (seen as whole-stage fallback in BroadcastHashJoin
    * conditions) and the hot loop silently runs interpreted. */
  private def elementsNullable: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, ln), ArrayType(_, rn)) => ln || rn
    case _ => true
  }
  override def nullable: Boolean =
    left.nullable || right.nullable || elementsNullable

  // null semantics match the composed aggregate∘zip_with form exactly: a
  // null ELEMENT in either array nulls the whole product (ArrayData.getLong
  // on a null slot would otherwise read garbage and rank ANN results wrong)
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      // The element-null branch exists only when an element CAN be null
      // (containsNull on either input). For containsNull=false inputs it is
      // dead code — and emitting it would assign ev.isNull, which for a
      // non-nullable expression is the literal `false` and fails Janino
      // ("not an rvalue"); that compile failure is invisible to correctness
      // (Spark falls back to interpreted) but forfeits codegen in exactly
      // the BHJ-condition hot path this expression exists for.
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API for the fused dot product over quantized (long) vectors. */
  def quantizedDot(a: Column, b: Column): Column =
    Bridge.column(
      QuantizedDotProduct(Bridge.expression(a), Bridge.expression(b)))
}
