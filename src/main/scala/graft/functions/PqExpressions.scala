package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expressions for the QUANTIZE / PQ-encode / SQ kernels —
  * the r18 optimization round's guide-§4 promotion (built-in > custom
  * Expression > UDF) applied to the remaining higher-order-function hot
  * paths. Spark's array higher-order functions (`transform`, `zip_with`,
  * `aggregate`) are CodegenFallback expressions: inside a codegen'd stage
  * each call drops to interpreted eval with a per-element lambda dispatch
  * and a per-call intermediate array. The PQ encode composed from them
  * costs m × nCodes zip_with+aggregate evaluations PER ROW (8 × 64 = 512
  * interpreted 8-element folds for the catalog configuration) — measured
  * as the dominant term of every PQ-family gate. Each expression here is
  * the same arithmetic as the composed form, bit for bit, in one fused
  * whole-stage-codegen loop.
  *
  * Null contracts mirror the composed forms they replace, and the
  * element-null branches are compiled out for containsNull=false inputs
  * (the `ev.isNull`-assignment Janino trap — see [[QuantizedDotProduct]]).
  */

/** array<float|double> → array<long>: ⌊x · 10000⌋ per element — the
  * engine-wide embedding quantization ([[graft.operators.Ann.quantize]]),
  * previously `transform(c, x => floor(x.cast("double") * 10000).cast("long"))`.
  * Float elements widen exactly ((double) f == CAST(f AS DOUBLE)); floor
  * then truncating cast is (long) Math.floor(v · 10000) for every finite
  * in-range value (embeddings are bounded reals — quantized magnitudes
  * ≲ 10⁵, nowhere near Long range). Null array → null; null element →
  * null ELEMENT (transform's semantics — not whole-array null). */
final case class QuantizeVector(child: Expression) extends UnaryExpression {

  private def elemType: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case _ => DoubleType
  }
  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> input, got " +
        child.dataType.simpleString)
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = elementsNullable)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quantize_vec"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (elementsNullable) {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i)) {
          val v = if (elemType == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
          out(i) = math.floor(v * 10000.0).toLong
        }
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        val v = if (elemType == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
        out(i) = math.floor(v * 10000.0).toLong
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val get = if (elemType == FloatType) s"(double) $a.getFloat($i)"
        else s"$a.getDouble($i)"
      if (elementsNullable) {
        s"""
           |final int $n = $a.numElements();
           |Object[] $out = new Object[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$a.isNullAt($i)) {
           |    $out[$i] = (long) java.lang.Math.floor(($get) * 10000.0);
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      } else {
        s"""
           |final int $n = $a.numElements();
           |long[] $out = new long[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = (long) java.lang.Math.floor(($get) * 10000.0);
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      }
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeVector =
    copy(child = newChild)
}

/** Row-local PQ ENCODE against a FIXED codebook set: for each of the m
  * subspaces, the POSITION (0-based, long) of the first-minimum exact
  * integer L2² codeword — `array_position(dists, array_min(dists)) − 1`
  * of the composed form ([[graft.queries.VectorOps.Pq.codes]]), with the
  * books a code-external reference object so generated-code size is
  * CONSTANT in nCodes (the NearestCentroid/Janino lesson). Ties break to
  * the lowest code position via strict `<` (first minimum in book order —
  * exactly array_position-of-min semantics). Null array → null; a null
  * ELEMENT → null (unreachable from catalog callers: `normed` drops rows
  * whose quantized self-dot — and with it any null element — nulls the
  * norm). Vectors shorter than (sp+1)·subDims score the available prefix
  * (QuantizedDotProduct's min-length convention; catalog vectors are
  * fixed-width so this is never exercised). */
final case class PqEncodeVector(child: Expression,
    books: Array[Array[Array[Long]]], subDims: Int) extends UnaryExpression {
  require(books.nonEmpty && books.forall(_.nonEmpty), "PqEncodeVector: empty books")
  require(subDims > 0, s"PqEncodeVector: subDims must be positive, got $subDims")

  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got " + child.dataType.simpleString)
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable || elementsNullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(a: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val qn = q.numElements()
    if (elementsNullable) {
      var i = 0
      while (i < qn) { if (q.isNullAt(i)) return null; i += 1 }
    }
    val m = books.length
    val out = new Array[Long](m)
    var sp = 0
    while (sp < m) {
      val bk = books(sp)
      val off = sp * subDims
      var bestD = Long.MaxValue
      var bestC = 0
      var c = 0
      while (c < bk.length) {
        val cw = bk(c)
        val n = math.min(math.max(qn - off, 0), math.min(subDims, cw.length))
        var s = 0L
        var i = 0
        while (i < n) { val d = q.getLong(off + i) - cw(i); s += d * d; i += 1 }
        if (s < bestD) { bestD = s; bestC = c }
        c += 1
      }
      out(sp) = bestC.toLong
      sp += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, q => {
      val bkRef = ctx.addReferenceObj("pqBooks", books, "long[][][]")
      val qn = ctx.freshName("qn")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val sp = ctx.freshName("sp")
      val bk = ctx.freshName("bk")
      val off = ctx.freshName("off")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val c = ctx.freshName("c")
      val cw = ctx.freshName("cw")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val body =
        s"""
           |final int $m = $bkRef.length;
           |long[] $out = new long[$m];
           |for (int $sp = 0; $sp < $m; $sp++) {
           |  final long[][] $bk = $bkRef[$sp];
           |  final int $off = $sp * $subDims;
           |  long $bestD = java.lang.Long.MAX_VALUE;
           |  int $bestC = 0;
           |  for (int $c = 0; $c < $bk.length; $c++) {
           |    final long[] $cw = $bk[$c];
           |    final int $n = java.lang.Math.min(
           |      java.lang.Math.max($qn - $off, 0),
           |      java.lang.Math.min($subDims, $cw.length));
           |    long $s = 0L;
           |    for (int $i = 0; $i < $n; $i++) {
           |      final long $d = $q.getLong($off + $i) - $cw[$i];
           |      $s += $d * $d;
           |    }
           |    if ($s < $bestD) { $bestD = $s; $bestC = $c; }
           |  }
           |  $out[$sp] = (long) $bestC;
           |}
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

  override protected def withNewChildInternal(newChild: Expression): PqEncodeVector =
    copy(child = newChild)
}

/** Row-local SQ8 ENCODE against fixed per-dimension bounds: per element,
  * 0 when vdiff_d = 0, else clamp(0, 255, ⌊(x − vmin_d)·255 / vdiff_d⌋) —
  * [[graft.queries.VectorOps.sqCodes]]'s arithmetic (its `idivNonneg` is
  * floor division: (a − pmod(a,b))/b ≡ Math.floorDiv for b > 0) in one
  * fused loop. The clamp keeps out-of-bounds late arrivals on the grid
  * edge (the maintained-deployment contract). Null array → null; null
  * element → null ELEMENT (transform semantics). Elements past
  * vmin.length cannot occur (bounds are trained on the same width);
  * indexing faults loudly rather than silently mis-encoding. */
final case class SqEncodeVector(child: Expression,
    vmin: Array[Long], vdiff: Array[Long]) extends UnaryExpression {
  require(vmin.length == vdiff.length, "SqEncodeVector: ragged bounds")

  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got " + child.dataType.simpleString)
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = elementsNullable)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq_encode"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (elementsNullable) {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i)) {
          val df = vdiff(i)
          out(i) = if (df == 0L) 0L
            else math.max(0L, math.min(255L,
              math.floorDiv((x.getLong(i) - vmin(i)) * 255L, df)))
        }
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        val df = vdiff(i)
        out(i) = if (df == 0L) 0L
          else math.max(0L, math.min(255L,
            math.floorDiv((x.getLong(i) - vmin(i)) * 255L, df)))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mnRef = ctx.addReferenceObj("sqVmin", vmin, "long[]")
      val dfRef = ctx.addReferenceObj("sqVdiff", vdiff, "long[]")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val df = ctx.freshName("df")
      val enc = (slot: String) =>
        s"""
           |final long $df = $dfRef[$i];
           |$slot = ($df == 0L) ? 0L
           |  : java.lang.Math.max(0L, java.lang.Math.min(255L,
           |      java.lang.Math.floorDiv(($a.getLong($i) - $mnRef[$i]) * 255L, $df)));
         """.stripMargin
      if (elementsNullable) {
        s"""
           |final int $n = $a.numElements();
           |Object[] $out = new Object[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$a.isNullAt($i)) {
           |    long ${out}_v;
           |    ${enc(s"${out}_v")}
           |    $out[$i] = ${out}_v;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      } else {
        s"""
           |final int $n = $a.numElements();
           |long[] $out = new long[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  ${enc(s"$out[$i]")}
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      }
    })

  override protected def withNewChildInternal(newChild: Expression): SqEncodeVector =
    copy(child = newChild)
}

/** SQ asymmetric distance: Σ_d (q_d − recon_d)² with recon_d = vmin_d +
  * ⌊code_d · vdiff_d / 255⌋ — the fused form of
  * `aggregate(zip_with(qq, sqRecon(codes)), 0, +)` that vs15/pp20's
  * scorer previously evaluated INTERPRETED per (query, candidate) pair
  * row (the highest-row-count HOF site in the catalog: |queries| × N).
  * code_d·vdiff_d ≥ 0 so ⌊·/255⌋ is plain integer division. Children are
  * (query vector, codes); bounds are constructor state like the PQ
  * books. Null input / null element → null (the composed form's
  * zip_with-null-propagation contract). Length mismatch scores the
  * common prefix (never exercised: both sides are trained-width). */
final case class SqAdistance(left: Expression, right: Expression,
    vmin: Array[Long], vdiff: Array[Long]) extends BinaryExpression {
  require(vmin.length == vdiff.length, "SqAdistance: ragged bounds")

  private def elementsNullable: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, ln), ArrayType(_, rn)) => ln || rn
    case _ => true
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean =
    left.nullable || right.nullable || elementsNullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq_adist"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val cd = b.asInstanceOf[ArrayData]
    val n = math.min(math.min(q.numElements(), cd.numElements()), vmin.length)
    var s = 0L
    var i = 0
    while (i < n) {
      if (q.isNullAt(i) || cd.isNullAt(i)) return null
      val df = vdiff(i)
      val recon = vmin(i) + (if (df == 0L) 0L else cd.getLong(i) * df / 255L)
      val d = q.getLong(i) - recon
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val mnRef = ctx.addReferenceObj("sqVmin", vmin, "long[]")
      val dfRef = ctx.addReferenceObj("sqVdiff", vdiff, "long[]")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val df = ctx.freshName("df")
      val rec = ctx.freshName("rec")
      val d = ctx.freshName("d")
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = java.lang.Math.min(
         |  java.lang.Math.min($a.numElements(), $b.numElements()), $mnRef.length);
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  final long $df = $dfRef[$i];
         |  final long $rec = $mnRef[$i] + (($df == 0L) ? 0L : $b.getLong($i) * $df / 255L);
         |  final long $d = $a.getLong($i) - $rec;
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqAdistance =
    copy(left = newLeft, right = newRight)
}

object PqExpressions {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API for the fused embedding quantization. */
  def quantizeVec(c: Column): Column =
    Bridge.column(QuantizeVector(Bridge.expression(c)))

  /** Column API for the fused PQ encode (books[m][nCodes][subDims]). */
  def pqEncode(vec: Column, books: Array[Array[Array[Long]]],
      subDims: Int): Column =
    Bridge.column(PqEncodeVector(Bridge.expression(vec), books, subDims))

  /** Column API for the fused SQ8 encode. */
  def sqEncode(vec: Column, vmin: Array[Long], vdiff: Array[Long]): Column =
    Bridge.column(SqEncodeVector(Bridge.expression(vec), vmin, vdiff))

  /** Column API for the fused SQ asymmetric distance. */
  def sqAdist(qq: Column, codes: Column, vmin: Array[Long],
      vdiff: Array[Long]): Column =
    Bridge.column(SqAdistance(
      Bridge.expression(qq), Bridge.expression(codes), vmin, vdiff))
}
