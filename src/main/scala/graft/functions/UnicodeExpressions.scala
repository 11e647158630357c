package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** NFKC Unicode normalization (java.text.Normalizer) as a native
  * codegen'd expression — the production canonicalizer the ASCII fold in
  * dd15/pp17 documents as its swap-in: fullwidth forms fold to ASCII
  * (Ａ → A), compatibility ligatures decompose (ﬁ → fi), combining
  * sequences compose (e + U+0301 → é), circled/superscript digits fold
  * (① → 1). No Spark built-in exposes Normalizer, and a Scala UDF here
  * would break the §2.9 policy (and the WholeStageCodegen span) for a
  * one-line JDK call — exactly the native-Expression carve-out.
  *
  * ASCII-only strings short-circuit without allocation (isNormalized is
  * O(n) with no copy for ASCII), so mostly-ASCII corpora pay ~nothing.
  * Deliberately NOT oracle-gated: DuckDB has no NFKC function, so this
  * variant is pinned by ScalaTest goldens (UnicodeCanonSpec) while the
  * cross-engine dd15 gate keeps the byte-stable ASCII fold.
  */
final case class NfkcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfkc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfkcNormalize.nfkc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfkcNormalize.nfkc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfkcNormalize =
    copy(child = newChild)
}

object NfkcNormalize {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Called from generated code. Returns the input object unchanged when
    * already normalized (the overwhelmingly common ASCII case) so the
    * UnsafeRow bytes are reused instead of re-encoded. */
  def nfkc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFKC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFKC))
  }

  /** Column API for NFKC normalization. */
  def apply(c: Column): Column = Bridge.column(NfkcNormalize(Bridge.expression(c)))
}
