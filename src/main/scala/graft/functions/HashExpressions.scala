package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused md5 fold: the first 4 digest bytes of a string as a BIGINT in
  * [0, 2³²) — bit-identical to
  * `conv(substring(md5(c), 1, 8), 16, 10).cast("long")` (the first 8 hex
  * chars ARE the first 4 bytes big-endian), but computed straight off the
  * digest. The composed form materializes a 32-char hex string, substrings
  * it, and re-parses base-16 per call; the MinHash signature pass runs
  * this 8× per shingle (~50M calls at sf0.1), making those allocations
  * the measurable cost. DuckDB replays the same value nibble-wise
  * (QueryUtils.hex8Sql), so every oracle stays exact.
  */
final case class Md5Fold32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_fold32"

  override protected def nullSafeEval(input: Any): Any =
    Md5Fold32.fold(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Fold32.fold($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Md5Fold32 =
    copy(child = newChild)
}

object Md5Fold32 {
  // MessageDigest.getInstance per call is a measurable share of the
  // ~50M-call MinHash hot path this expression exists to speed up; MD5
  // instances are not thread-safe, so cache one per executor thread.
  // digest() resets the instance after completing; the explicit reset()
  // guards against a previous partially-fed, aborted update.
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Big-endian unsigned fold of the first 4 md5 digest bytes — equal to
    * parsing the first 8 hex chars of the hex digest. Called from
    * generated code. */
  def fold(bytes: Array[Byte]): Long = {
    val md = md5.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** fold of `prefix ++ bytes` without concatenating — the MinHash inner
    * loop calls this 8× per shingle with a static prefix, so the per-call
    * string build + UTF-8 encode is worth skipping. */
  def fold2(prefix: Array[Byte], bytes: Array[Byte]): Long = {
    val md = md5.get()
    md.reset()
    md.update(prefix)
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

object HashExpressions {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API for the fused md5 fold. */
  def md5Fold32(c: Column): Column = Bridge.column(Md5Fold32(Bridge.expression(c)))
}
