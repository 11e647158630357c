package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the TOKENIZE / word-n-gram kernels —
  * the r18 optimization round's guide-§4 promotion applied to the TEXT
  * family's hot path, the exact analog of [[PqExpressions]] for the
  * vector family. The composed forms they replace:
  *
  *  - `Text.tokens` = `filter(split(c, " "), t => t =!= "")` — `split`
  *    runs a Java-regex split per row and materializes the empty pieces,
  *    then `ArrayFilter` (a higher-order function, CodegenFallback) walks
  *    them with an interpreted per-element lambda dispatch;
  *  - `Text.wordNGrams` = `transform(sequence(0, size−n), i =>
  *    concat_ws(" ", element_at(toks, i+1), …))` — `ArrayTransform` is
  *    again CodegenFallback, paying a boxed lambda call + n boxed
  *    `element_at` lookups + a fresh `concat_ws` per gram.
  *
  * Every tokenize-family gate (ta01–ta23, the pp13/25/26/29/30 advances,
  * dd15 canon, sa10/sa11 token budgets) evaluates one or both per corpus
  * row — the measured dominant term of the text cluster. Each expression
  * here computes the identical value in one byte-scan (tokens) or one
  * fused copy loop (n-grams), inside the whole-stage-codegen span via a
  * static kernel call (the [[Md5Fold32]] pattern: interpreted eval and
  * generated code share ONE kernel, so the two paths cannot drift).
  *
  * Equivalence notes (spec-pinned in TextExpressionsSpec):
  *  - `split(c, " ")` splits on every single space (the pattern has no
  *    regex metachars) with limit −1, so empties appear exactly between
  *    consecutive spaces / at the ends; filtering them out leaves the
  *    maximal runs of non-space bytes. 0x20 never occurs inside a UTF-8
  *    multibyte sequence, so the byte scan is character-exact.
  *  - The composed wordNGrams yields an EMPTY ARRAY (never null) for a
  *    null token array (`size(null) ≥ n` is not TRUE → `otherwise`), and
  *    its grams join with `concat_ws`, which SKIPS null elements.
  *    [[WordNGrams]] mirrors both: nullable=false, null in → empty out,
  *    and the gram join skips nulls (compiled out when the child's
  *    containsNull=false — the [[WsTokens]]-fed catalog shape).
  */

/** Whitespace tokens, empties dropped: maximal runs of non-' ' bytes as
  * array<string> (containsNull=false). Null string → null array —
  * `filter(split(c, " "), …)`'s null contract. */
final case class WsTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ws_tokens"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.wsTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.wsTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): WsTokens =
    copy(child = newChild)
}

/** Space-joined word n-grams over a token array; fewer than n tokens —
  * or a NULL array — yield the EMPTY array (the composed
  * `when(size ≥ n, transform(…)).otherwise(array())` contract), so the
  * expression is never null. Null ELEMENTS are skipped within a gram
  * (concat_ws semantics); the skip branch is compiled out for
  * containsNull=false children. */
final case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"WordNGrams: n must be >= 1, got $n")

  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "word_ngrams"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TextKernels.EMPTY_ARRAY
    else TextKernels.wordNGrams(v.asInstanceOf[ArrayData], n, elementsNullable)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val kernel = s"graft.functions.TextKernels.wordNGrams(" +
      s"${childGen.value}, $n, $elementsNullable)"
    val value = ctx.freshName("ngrams")
    val code =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.GenericArrayData $value =
          ${childGen.isNull} ? graft.functions.TextKernels.EMPTY_ARRAY() : $kernel;
      """
    ev.copy(code = code, isNull = FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
        .variable(value, classOf[GenericArrayData]))
  }

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

/** One-pass per-row token statistics — (n, sl, nd, ntop, nstop) as a
  * struct, replacing ta16's composed battery whose `ntop` leg was
  * `array_max(transform(array_distinct(t), x => size(filter(t, y =>
  * y === x))))` — an O(distinct × n) interpreted HOF scan per row (each
  * distinct token re-walks the whole array through a boxed lambda), on
  * top of separate `aggregate`/`filter`/`array_distinct` passes for the
  * other four stats. One hash-map pass computes the identical values
  * (r19, guide §4):
  *
  *  - n     = size(t)                               (int)
  *  - sl    = aggregate(t, 0L, (a, x) => a + length(x)) — Σ CHARACTER
  *            lengths; null if any element is null (null + acc), 0 when
  *            empty                                (long, nullable)
  *  - nd    = size(array_distinct(t)) — a null element counts as one
  *            distinct value                        (int)
  *  - ntop  = the composed array_max form above: max frequency among
  *            non-null tokens (a null distinct entry contributes 0 —
  *            `y === null` is never TRUE); NULL for an empty array
  *            (array_max of empty)                  (int, nullable)
  *  - nstop = size(filter(t, x => x === "the" || x === "a")) (int)
  *
  * Null array → null struct (nullIntolerant — the composed forms all
  * propagate the null and the caller coalesces). Equality is UTF8String
  * binary equality, exactly `===`/array_distinct's. */
final case class TokenRowStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }
  override def dataType: DataType = TokenRowStats.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_row_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.tokenRowStats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.tokenRowStats($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenRowStats =
    copy(child = newChild)
}

object TokenRowStats {
  val schema: StructType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("sl", LongType, nullable = true),
    StructField("nd", IntegerType, nullable = false),
    StructField("ntop", IntegerType, nullable = true),
    StructField("nstop", IntegerType, nullable = false)))
}

/** Shared row-local kernels, called from BOTH interpreted eval and
  * generated code (the [[Md5Fold32]] pattern — one implementation, no
  * path drift). */
object TextKernels {
  private val EMPTY = new GenericArrayData(new Array[Any](0))
  // Java-facing accessor (generated code cannot read a Scala val field
  // through the static forwarder).
  def EMPTY_ARRAY(): GenericArrayData = EMPTY

  private val SPACE = UTF8String.fromString(" ")

  /** Maximal runs of non-0x20 bytes as UTF8String tokens — equal to
    * `list_filter(string_split(s, ' '), x -> x <> '')`. */
  def wsTokens(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    var cnt = 0
    var in = false
    var i = 0
    while (i < n) {
      if (bytes(i) != 0x20) { if (!in) { cnt += 1; in = true } }
      else in = false
      i += 1
    }
    if (cnt == 0) return EMPTY
    val out = new Array[Any](cnt)
    var t = 0
    var start = 0
    in = false
    i = 0
    while (i <= n) {
      val sp = i == n || bytes(i) == 0x20
      if (!sp && !in) { start = i; in = true }
      else if (sp && in) {
        out(t) = UTF8String.fromBytes(bytes, start, i - start)
        t += 1
        in = false
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Space-joined n-grams of a token array; < n tokens → empty. Null
    * elements are skipped inside a gram (concat_ws semantics) when
    * `elementsNullable`; the catalog's WsTokens-fed arrays never carry
    * them and compile the branch away. */
  def wordNGrams(toks: ArrayData, n: Int, elementsNullable: Boolean): GenericArrayData = {
    val sz = toks.numElements()
    if (sz < n) return EMPTY
    val m = sz - n + 1
    val out = new Array[Any](m)
    if (n == 2 && !elementsNullable) {
      // the dominant catalog shape (bigrams over non-null tokens): join
      // two tokens without the varargs array concat_ws builds
      var prev = toks.getUTF8String(0)
      var i = 0
      while (i < m) {
        val next = toks.getUTF8String(i + 1)
        out(i) = UTF8String.concat(prev, SPACE, next)
        prev = next
        i += 1
      }
    } else {
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i < m) {
        var k = 0
        while (k < n) {
          // concat_ws SKIPS nulls; concatWs handles that contract
          parts(k) = if (elementsNullable && toks.isNullAt(i + k)) null
            else toks.getUTF8String(i + k)
          k += 1
        }
        out(i) = UTF8String.concatWs(SPACE, parts: _*)
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  private val THE = UTF8String.fromString("the")
  private val A = UTF8String.fromString("a")

  /** One hash-map pass over the token array — [[TokenRowStats]]' kernel
    * (contract and equivalences in its Scaladoc). */
  def tokenRowStats(toks: ArrayData): GenericInternalRow = {
    val n = toks.numElements()
    val counts = new java.util.HashMap[UTF8String, Int](math.max(8, n * 2))
    var sl = 0L
    var slNull = false
    var sawNull = false
    var nstop = 0
    var ntop = 0
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) { slNull = true; sawNull = true }
      else {
        val t = toks.getUTF8String(i)
        sl += t.numChars()
        val c = counts.merge(t, 1, (a, b) => a + b)
        if (c > ntop) ntop = c
        if (t.equals(THE) || t.equals(A)) nstop += 1
      }
      i += 1
    }
    val nd = counts.size() + (if (sawNull) 1 else 0)
    new GenericInternalRow(Array[Any](
      n,
      if (slNull) null else sl,
      nd,
      if (n == 0) null else ntop,
      nstop))
  }
}

object TextExpressions {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API for the fused whitespace tokenizer. */
  def wsTokens(c: Column): Column = Bridge.column(WsTokens(Bridge.expression(c)))

  /** Column API for the fused word n-grams. */
  def wordNGrams(toks: Column, n: Int): Column =
    Bridge.column(WordNGrams(Bridge.expression(toks), n))

  /** Column API for the one-pass token statistics struct. */
  def tokenRowStats(toks: Column): Column =
    Bridge.column(TokenRowStats(Bridge.expression(toks)))
}
