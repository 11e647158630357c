package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

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

/** Row-local IVF cell assignment: argmax over a FIXED centroid set baked
  * into the expression (quantized centroid vectors, their norms, their
  * ids), by quantized cosine, ties to the lowest cid — one fused
  * codegen'd nlist × dim loop per row, zero exchanges, zero per-row
  * allocation.
  *
  * Why an expression and not composed built-ins: the compositional
  * row-local form (`greatest` over one (cos, −cid) struct per centroid,
  * each with its own literal-array dot) generates an expression tree —
  * and generated-code size — LINEAR in nlist; measured at nlist = 80 it
  * blows past Janino's inlining budget and the whole stage silently runs
  * interpreted, 10× slower than the grouped-argmax shuffle it replaced.
  * This expression is the same machine loop at any nlist (the centroid
  * matrix is a code-external reference object), so the production sizing
  * rule nlist ∝ N never degrades the plan. Children are (q, nrm); the
  * centroid arrays are constructor state, which is what FIXED-quantizer
  * semantics mean (a re-trained quantizer is a new plan — vs07's rebuild,
  * not maintenance).
  *
  * Null contract: null q / null nrm → null (null-intolerant children);
  * when the array type admits null ELEMENTS, any null element → null —
  * matching [[QuantizedDotProduct]]'s contract, and gated out of the
  * generated code entirely for containsNull=false inputs (the
  * `ev.isNull`-assignment Janino trap, see [[QuantizedDotProduct]]).
  *
  * Note: the centroid arrays participate in case-class equality by
  * REFERENCE, so two semantically-equal assignments built from separate
  * collect()s won't common-subexpression-merge — harmless (each
  * assignment is built once per plan), and the alternative (deep array
  * equality on every semanticEquals probe) taxes the optimizer.
  *
  * `rank` selects which centroid the fused loop returns under the total
  * order (cos DESC, cid ASC): 1 (default) is the assignment, 2 is the
  * SECOND-nearest cell — the row-local boundary probe vs14's
  * nProbe = 2 kNN graph needs (tracking two running bests in the same
  * loop instead of re-ranking centroids through a corpus-sized window;
  * the window form shuffles N × nlist rows to compute what is a pure
  * per-row function of the fixed quantizer). */
final case class NearestCentroid(left: Expression, right: Expression,
    cids: Array[Long], cqs: Array[Array[Long]], cns: Array[Double],
    rank: Int = 1)
    extends BinaryExpression {
  require(cids.nonEmpty && cids.length == cqs.length && cids.length == cns.length,
    "NearestCentroid: empty or ragged centroid arrays")
  require(rank == 1 || rank == 2, s"NearestCentroid: rank must be 1 or 2, got $rank")
  require(cids.length >= rank, s"NearestCentroid: rank $rank needs >= $rank centroids")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, double) inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid"

  private def elementsNullable: Boolean = left.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }
  override def nullable: Boolean =
    left.nullable || right.nullable || elementsNullable

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val nrm = b.asInstanceOf[Double]
    val qn = q.numElements()
    if (elementsNullable) {
      var i = 0
      while (i < qn) { if (q.isNullAt(i)) return null; i += 1 }
    }
    var best = Double.NegativeInfinity
    var bestCid = Long.MaxValue
    var best2 = Double.NegativeInfinity
    var bestCid2 = Long.MaxValue
    var c = 0
    while (c < cqs.length) {
      val cc = cqs(c)
      val n = math.min(qn, cc.length)
      var s = 0L
      var i = 0
      while (i < n) { s += q.getLong(i) * cc(i); i += 1 }
      val cos = s.toDouble / (nrm * cns(c))
      if (cos > best || (cos == best && cids(c) < bestCid)) {
        if (rank == 2) { best2 = best; bestCid2 = bestCid }
        best = cos; bestCid = cids(c)
      } else if (rank == 2 &&
          (cos > best2 || (cos == best2 && cids(c) < bestCid2))) {
        best2 = cos; bestCid2 = cids(c)
      }
      c += 1
    }
    if (rank == 2) bestCid2 else bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, nrm) => {
      val cqRef = ctx.addReferenceObj("cqs", cqs, "long[][]")
      val cidRef = ctx.addReferenceObj("cids", cids, "long[]")
      val cnRef = ctx.addReferenceObj("cns", cns, "double[]")
      val qn = ctx.freshName("qn")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val cc = ctx.freshName("cc")
      val n = ctx.freshName("n")
      val cos = ctx.freshName("cos")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val best2 = ctx.freshName("best2")
      val bestCid2 = ctx.freshName("bestCid2")
      // rank is a plan-time constant, so the rank-2 tracking compiles in
      // only when asked for — the rank-1 assignment loop is unchanged
      val trackDecls = if (rank == 2)
        s"""
           |double $best2 = java.lang.Double.NEGATIVE_INFINITY;
           |long $bestCid2 = java.lang.Long.MAX_VALUE;
         """.stripMargin else ""
      val demote = if (rank == 2)
        s"$best2 = $best; $bestCid2 = $bestCid;" else ""
      val elseTrack = if (rank == 2)
        s""" else if ($cos > $best2 || ($cos == $best2 && $cidRef[$c] < $bestCid2)) {
           |    $best2 = $cos; $bestCid2 = $cidRef[$c];
           |  }""".stripMargin else ""
      val result = if (rank == 2) bestCid2 else bestCid
      val body =
        s"""
           |double $best = java.lang.Double.NEGATIVE_INFINITY;
           |long $bestCid = java.lang.Long.MAX_VALUE;
           |$trackDecls
           |for (int $c = 0; $c < $cqRef.length; $c++) {
           |  final long[] $cc = $cqRef[$c];
           |  final int $n = java.lang.Math.min($qn, $cc.length);
           |  long $s = 0L;
           |  for (int $i = 0; $i < $n; $i++) { $s += $q.getLong($i) * $cc[$i]; }
           |  final double $cos = ((double) $s) / ($nrm * $cnRef[$c]);
           |  if ($cos > $best || ($cos == $best && $cidRef[$c] < $bestCid)) {
           |    $demote
           |    $best = $cos; $bestCid = $cidRef[$c];
           |  }$elseTrack
           |}
           |${ev.value} = $result;
         """.stripMargin
      // the element-null pre-scan exists only when an element CAN be null
      // (same Janino `ev.isNull`-assignment trap as QuantizedDotProduct)
      if (elementsNullable) {
        val j = ctx.freshName("j")
        s"""
           |final int $qn = $q.numElements();
           |for (int $j = 0; $j < $qn; $j++) {
           |  if ($q.isNullAt($j)) { ${ev.isNull} = true; break; }
           |}
           |if (!${ev.isNull}) {
           |  $body
           |}
         """.stripMargin
      } else {
        s"""
           |final int $qn = $q.numElements();
           |$body
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}

/** Row-local TOP-P centroid ranking under the same total order as
  * [[NearestCentroid]] (quantized cosine DESC, cid ASC): one fused
  * codegen'd nlist × dim loop per row maintaining a p-length insertion
  * buffer, returning the ranked cid array — the probe list of an
  * nProbe = p IVF flow ([[graft.queries.VectorOps.knnGraphP]]). p is a
  * plan-time constant and the scratch buffers are hoisted to operator
  * state, so the per-row cost over [[NearestCentroid]] is the insertion
  * chain alone (p ≤ nlist, typically 2–4) and the only per-row
  * allocation is the result array itself. Returns min(p, nlist) cids —
  * a quantizer with fewer cells than probes yields every cell, ranked.
  *
  * Null contract matches [[NearestCentroid]]: null q / null nrm → null;
  * any null ELEMENT → null, with the pre-scan compiled out for
  * containsNull = false inputs (the `ev.isNull`-assignment Janino trap —
  * see [[QuantizedDotProduct]]). */
final case class RankedCentroids(left: Expression, right: Expression,
    cids: Array[Long], cqs: Array[Array[Long]], cns: Array[Double], p: Int)
    extends BinaryExpression {
  require(cids.nonEmpty && cids.length == cqs.length && cids.length == cns.length,
    "RankedCentroids: empty or ragged centroid arrays")
  require(p >= 1, s"RankedCentroids: p must be >= 1, got $p")

  private val effP: Int = math.min(p, cids.length)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, double) inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ranked_centroids"

  private def elementsNullable: Boolean = left.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }
  override def nullable: Boolean =
    left.nullable || right.nullable || elementsNullable

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val nrm = b.asInstanceOf[Double]
    val qn = q.numElements()
    if (elementsNullable) {
      var i = 0
      while (i < qn) { if (q.isNullAt(i)) return null; i += 1 }
    }
    val best = Array.fill(effP)(Double.NegativeInfinity)
    val bcid = Array.fill(effP)(Long.MaxValue)
    var c = 0
    while (c < cqs.length) {
      val cc = cqs(c)
      val n = math.min(qn, cc.length)
      var s = 0L
      var i = 0
      while (i < n) { s += q.getLong(i) * cc(i); i += 1 }
      val cos = s.toDouble / (nrm * cns(c))
      // bounded insertion under (cos DESC, cid ASC)
      var pos = effP
      while (pos > 0 && (cos > best(pos - 1) ||
          (cos == best(pos - 1) && cids(c) < bcid(pos - 1)))) pos -= 1
      if (pos < effP) {
        var m = effP - 1
        while (m > pos) { best(m) = best(m - 1); bcid(m) = bcid(m - 1); m -= 1 }
        best(pos) = cos; bcid(pos) = cids(c)
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bcid, effP))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, nrm) => {
      val cqRef = ctx.addReferenceObj("cqs", cqs, "long[][]")
      val cidRef = ctx.addReferenceObj("cids", cids, "long[]")
      val cnRef = ctx.addReferenceObj("cns", cns, "double[]")
      // p-length insertion buffers hoisted to operator state: allocated
      // once, refilled per row — zero per-row scratch allocation
      val best = ctx.addMutableState("double[]", "rcBest",
        v => s"$v = new double[$effP];")
      val bcid = ctx.addMutableState("long[]", "rcCid",
        v => s"$v = new long[$effP];")
      val qn = ctx.freshName("qn")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val cc = ctx.freshName("cc")
      val n = ctx.freshName("n")
      val cos = ctx.freshName("cos")
      val pos = ctx.freshName("pos")
      val m = ctx.freshName("m")
      val f = ctx.freshName("f")
      val out = ctx.freshName("out")
      val body =
        s"""
           |for (int $f = 0; $f < $effP; $f++) {
           |  $best[$f] = java.lang.Double.NEGATIVE_INFINITY;
           |  $bcid[$f] = java.lang.Long.MAX_VALUE;
           |}
           |for (int $c = 0; $c < $cqRef.length; $c++) {
           |  final long[] $cc = $cqRef[$c];
           |  final int $n = java.lang.Math.min($qn, $cc.length);
           |  long $s = 0L;
           |  for (int $i = 0; $i < $n; $i++) { $s += $q.getLong($i) * $cc[$i]; }
           |  final double $cos = ((double) $s) / ($nrm * $cnRef[$c]);
           |  int $pos = $effP;
           |  while ($pos > 0 && ($cos > $best[$pos - 1] ||
           |      ($cos == $best[$pos - 1] && $cidRef[$c] < $bcid[$pos - 1]))) $pos--;
           |  if ($pos < $effP) {
           |    for (int $m = $effP - 1; $m > $pos; $m--) {
           |      $best[$m] = $best[$m - 1]; $bcid[$m] = $bcid[$m - 1];
           |    }
           |    $best[$pos] = $cos; $bcid[$pos] = $cidRef[$c];
           |  }
           |}
           |final long[] $out = java.util.Arrays.copyOf($bcid, $effP);
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      if (elementsNullable) {
        val j = ctx.freshName("j")
        s"""
           |final int $qn = $q.numElements();
           |for (int $j = 0; $j < $qn; $j++) {
           |  if ($q.isNullAt($j)) { ${ev.isNull} = true; break; }
           |}
           |if (!${ev.isNull}) {
           |  $body
           |}
         """.stripMargin
      } else {
        s"""
           |final int $qn = $q.numElements();
           |$body
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RankedCentroids =
    copy(left = newLeft, right = newRight)
}

/** Row-local LSH bucket ids of a quantized vector under EVERY table's
  * hyperplanes in one fused loop — array<long> of length `tables`
  * (bucket of table t at index t), r19's guide-§4 promotion of
  * [[graft.operators.Ann]]'s composed per-(table, bit) form:
  * `explode(array(struct(t, Σ_b when(dotQ(q, lit(plane_{t,b})) >= 0,
  * 1<<b, 0))))` — a plan tree (and generated-code size) LINEAR in
  * tables × bits with one 64-long literal per plane, the exact
  * Janino-budget failure mode [[NearestCentroid]]'s Scaladoc documents
  * at nlist = 80 (the catalog geometry is 8 × 4 = 32 plane literals per
  * side of every LSH gate). Here the plane matrix is a code-external
  * reference object and the work is one tables × bits × dim loop.
  *
  * Null contract mirrors the composed form EXACTLY, which is why this
  * expression is never null: a null array or a null element made every
  * projection null and `when(null >= 0)` took the otherwise-0 branch —
  * so every table's bucket is 0. Per-dot read range is
  * min(|q|, dim) ([[QuantizedDotProduct]]'s min-length loop), the null
  * scan covers exactly that range, and dim = 0 sets every bit
  * (empty dot = 0 ≥ 0), all as composed. */
final case class LshTableBuckets(child: Expression,
    planes: Array[Array[Long]], bits: Int)
    extends UnaryExpression {
  require(bits >= 1, s"LshTableBuckets: bits must be >= 1, got $bits")
  require(planes.nonEmpty && planes.length % bits == 0,
    s"LshTableBuckets: ${planes.length} planes not a multiple of bits=$bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "lsh_buckets"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    LshKernels.buckets(
      if (v == null) null else v.asInstanceOf[ArrayData], planes, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "long[][]")
    val childGen = child.genCode(ctx)
    val value = ctx.freshName("buckets")
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val code =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.GenericArrayData $value =
          graft.functions.LshKernels.buckets(
            ${childGen.isNull} ? null : ${childGen.value}, $planesRef, $bits);
      """
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
        .variable(value, classOf[org.apache.spark.sql.catalyst.util.GenericArrayData]))
  }

  override protected def withNewChildInternal(newChild: Expression): LshTableBuckets =
    copy(child = newChild)
}

/** Static kernel shared by [[LshTableBuckets]]' interpreted eval and
  * generated code (the Md5Fold32 pattern — one implementation, no path
  * drift). */
object LshKernels {
  def buckets(q: ArrayData, planes: Array[Array[Long]],
      bits: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val tables = planes.length / bits
    val out = new Array[Long](tables)
    if (q == null)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    val dim = planes(0).length
    val n = math.min(q.numElements(), dim)
    var j = 0
    while (j < n) {
      // a null element nulls every projection → every bucket 0 (the
      // composed form's when-otherwise contract)
      if (q.isNullAt(j))
        return new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
      j += 1
    }
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val plane = planes(t * bits + b)
        var s = 0L
        var i = 0
        while (i < n) { s += q.getLong(i) * plane(i); i += 1 }
        if (s >= 0L) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object VectorExpressions {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API for the fused dot product over quantized (long) vectors. */
  def quantizedDot(a: Column, b: Column): Column =
    Bridge.column(
      QuantizedDotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Column API for the fused every-table LSH bucket array: planes is the
    * (tables × bits)-row plane matrix, row t·bits + b = table t's bit-b
    * hyperplane. */
  def lshTableBuckets(q: Column, planes: Array[Array[Long]], bits: Int): Column =
    Bridge.column(LshTableBuckets(Bridge.expression(q), planes, bits))

  /** Column API for the row-local fixed-quantizer cell assignment. */
  def nearestCentroid(q: Column, nrm: Column, cids: Array[Long],
      cqs: Array[Array[Long]], cns: Array[Double]): Column =
    Bridge.column(NearestCentroid(
      Bridge.expression(q), Bridge.expression(nrm), cids, cqs, cns))

  /** Column API for the SECOND-nearest cell under the same total order —
    * the row-local boundary probe of an nProbe = 2 flow (vs14). */
  def secondNearestCentroid(q: Column, nrm: Column, cids: Array[Long],
      cqs: Array[Array[Long]], cns: Array[Double]): Column =
    Bridge.column(NearestCentroid(
      Bridge.expression(q), Bridge.expression(nrm), cids, cqs, cns, rank = 2))

  /** Column API for the ranked top-p cid array — the probe list of an
    * nProbe = p flow (graft.queries.VectorOps.knnGraphP). */
  def rankedCentroids(q: Column, nrm: Column, cids: Array[Long],
      cqs: Array[Array[Long]], cns: Array[Double], p: Int): Column =
    Bridge.column(RankedCentroids(
      Bridge.expression(q), Bridge.expression(nrm), cids, cqs, cns, p))
}
