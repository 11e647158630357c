package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** Row-local 64-bit PERCEPTUAL signature over a binary payload, emitted as
  * 4 × 16-bit band integers — the first pass of multimodal near-dup dedup
  * (mm04): re-encoded/resized copies of the same content land at small
  * Hamming distance, so a Hamming-banded candidate join (dd04's simhash
  * multi-index trick) finds them without an all-pairs comparison.
  *
  * The signature is a block-mean hash over the payload's byte-BIGRAM
  * histogram: bucket v ∈ [0, 64) counts bigrams with
  * `(b[j]·31 + b[j+1]) mod 64 = v`, and bit v is set where bucket v's
  * share exceeds the uniform 1/64 (`hist[v]·64 > n−1`, strict). Two
  * deliberate properties:
  *
  *  - FREQUENCY domain, not byte position: like pHash's low-frequency DCT
  *    coefficients, a histogram is an aggregate that small local edits
  *    barely move — an insertion shifts every downstream byte, which
  *    destroys position-blocked means (measured: true near-dups landed at
  *    Hamming 9–15 under position blocks vs 0–2 here) but changes only a
  *    handful of bigram counts.
  *  - INTEGER-exact: counts and the strict integer cross-multiply compare
  *    are engine-universal, so the DuckDB oracle replays every bit and the
  *    gate hash-matches. (Real image pipelines drop a DCT pHash behind the
  *    same column shape via the [[graft.operators.Multimodal.Codec]] seam;
  *    the banding/verify machinery downstream is signature-agnostic.)
  *
  * Bands pack MSB-first: band b = Σ_{j=0..15} bit(16b+j) << (15−j), each
  * in [0, 2¹⁶) — 4 INTs rather than one 64-bit value so neither engine
  * ever exercises BIGINT overflow semantics on bit 63, and the band ints
  * ARE the multi-index join keys. Payloads under 2 bytes have no bigram
  * and sign as all-zero (the explicit n < 2 guard keeps the SQL replay
  * from the `0 > −1` trap at n = 0). Null payload → null.
  *
  * This is a builder-prompt LLM-pipeline operator (no reference
  * counterpart): mm03 covers exact binary dedup; this is its near-dup
  * first pass, the standard image-dedup opening move.
  */
final case class PerceptualBands(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "perceptual_bands"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(PerceptualBands.bands(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.PerceptualBands.bands($c))")

  override protected def withNewChildInternal(newChild: Expression): PerceptualBands =
    copy(child = newChild)
}

object PerceptualBands {
  val N_BANDS = 4
  val BAND_BITS = 16

  /** The 4 band values of the 64-bit bigram-histogram block-mean hash.
    * Called from generated code; one pass over the payload, one 64-int
    * scratch histogram per call (same allocation class as Md5Fold32's
    * per-call digest). */
  def bands(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](N_BANDS)
    val n = bytes.length
    if (n < 2) return out // no bigram: all-zero signature by definition
    val hist = new Array[Int](64)
    var j = 0
    while (j < n - 1) {
      hist(((bytes(j) & 0xff) * 31 + (bytes(j + 1) & 0xff)) % 64) += 1
      j += 1
    }
    val m = (n - 1).toLong
    var v = 0
    while (v < 64) {
      if (hist(v).toLong * 64L > m)
        out(v / BAND_BITS) |= 1 << (BAND_BITS - 1 - v % BAND_BITS)
      v += 1
    }
    out
  }
}

object PerceptualExpressions {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API for the fused perceptual band signature. */
  def perceptualBands(c: Column): Column =
    Bridge.column(PerceptualBands(Bridge.expression(c)))
}
