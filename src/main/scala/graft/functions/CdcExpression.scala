package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local CONTENT-DEFINED chunk boundaries over a binary payload — the
  * storage-dedup first pass (LBFS/rsync/Rabin lineage) that mm03/mm04 lack:
  * exact dedup collapses identical payloads and the perceptual pass finds
  * re-encoded copies, but neither finds payloads that SHARE REGIONS
  * (the same video with a new intro, the same tarball with one file
  * changed). Fixed-size chunking breaks under a single inserted byte
  * (every later chunk shifts); content-defined boundaries are chosen by a
  * rolling hash of the LOCAL window, so after any edit the boundary
  * sequence re-synchronizes within ~one chunk and every untouched region
  * hashes identically again — that re-alignment is the entire point, and
  * CdcChunkSpec pins it as a property.
  *
  * Boundary rule: position p (1-based, p ∈ [W, n−1]) ends a chunk when the
  * polynomial hash of the last W bytes — Horner in ints, mod 2¹⁶ —
  * satisfies `H(p) mod D = 0`; position n always ends the final chunk.
  * Expected chunk length ≈ D bytes. All arithmetic is integer-exact and
  * the byte window is explicit, so the DuckDB oracle replays every
  * boundary from the nibble-parsed byte list (mm04's byte-extraction
  * pattern). Production knobs deliberately left out of the gate: min/max
  * chunk clamps (FastCDC's normalization) change WHICH boundaries are
  * kept, not how they are found, and would bury the replayable core.
  *
  * Returns the chunk END positions as array<int> (ascending, last = n).
  * Empty payload → empty array (no chunks); null → null. This is a
  * builder-prompt LLM-pipeline operator (no reference counterpart).
  */
final case class CdcBoundaries(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_boundaries"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(CdcBoundaries.ends(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.CdcBoundaries.ends($c))")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {
  /** Rolling window width in bytes. */
  val W = 8
  /** Boundary divisor: expected chunk length ≈ D bytes. */
  val D = 32
  /** Hash modulus (2¹⁶ — wide enough that `mod D` is near-uniform,
    * small enough that the oracle's integer replay can never overflow:
    * max partial value < 2¹⁶ · 31 + 255 ≪ 2³¹). */
  val M = 1 << 16

  /** Chunk end positions, 1-based inclusive, ascending; always ends with
    * n for a non-empty payload. One pass, O(W) per position via Horner
    * recompute (W is 8; a true O(1) rolling update is an in-kernel
    * optimization that cannot change the emitted boundaries). */
  def ends(bytes: Array[Byte]): Array[Int] = {
    val n = bytes.length
    if (n == 0) return Array.empty
    val out = new scala.collection.mutable.ArrayBuffer[Int](n / D + 2)
    var p = W
    while (p <= n - 1) {
      var h = 0
      var k = p - W
      while (k < p) { h = (h * 31 + (bytes(k) & 0xff)) % M; k += 1 }
      if (h % D == 0) out += p
      p += 1
    }
    out += n
    out.toArray
  }
}

/** The full CDC chunk-row kernel FUSED (r19, guide §4): boundaries,
  * per-chunk offsets/lengths, and per-chunk md5 digests in ONE pass over
  * the payload bytes. Replaces the composed
  * `transform(cdc_boundaries(blob), (e, i) -> named_struct(..., md5(
  * substring(blob, start, len))))` shape, which had two compounding
  * defects (the r18 text-family pathology at chunk granularity): the
  * higher-order function is CodegenFallback — interpreted eval with a
  * per-element lambda dispatch — and Catalyst performs no subexpression
  * elimination inside lambda bodies or across the Generate's
  * condition/projection, so `cdc_boundaries(encode(text))` was inlined
  * into every `element_at` AND the whole transform was evaluated three
  * times per row (twice in the Generate condition, once in its
  * projection) — O(chunks · full-boundary-scan) per payload. Same
  * values, bit for bit: start/clen replay the prev-end recurrence
  * (start₀ = 1, startᵢ = endᵢ₋₁ + 1, clenᵢ = endᵢ − startᵢ + 1) and the
  * digest is md5 over exactly blob[start−1, start−1+clen) in lowercase
  * hex — Spark's md5(substring(...)) byte for byte. Null payload → null
  * (the composed form's transform-of-null); empty payload → empty array
  * (no chunks). Interpreted eval and generated code call the ONE static
  * kernel (the Md5Fold32 pattern), so the paths cannot drift. */
final case class CdcChunkRows(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(CdcChunkRows.chunkSchema, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_chunk_rows"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunkRows.chunks(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcChunkRows.chunks($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunkRows =
    copy(child = newChild)
}

object CdcChunkRows {
  /** (chunk_idx, start, clen, digest) — start 1-based inclusive, digest
    * lowercase-hex md5 of the chunk bytes. */
  val chunkSchema: StructType = StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("clen", IntegerType, nullable = false),
    StructField("digest", StringType, nullable = false)))

  private val HexChars = "0123456789abcdef".getBytes("US-ASCII")

  /** One pass: boundary scan ([[CdcBoundaries.ends]] — the identical
    * kernel, so the chunking can never disagree with the standalone
    * boundary expression) + per-chunk md5 straight off the payload
    * buffer (no substring copies, no per-element dispatch). */
  def chunks(bytes: Array[Byte]): GenericArrayData = {
    val ends = CdcBoundaries.ends(bytes)
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](ends.length)
    var prev = 0 // 0-based exclusive end of the previous chunk
    var i = 0
    while (i < ends.length) {
      val e = ends(i)
      val clen = e - prev
      md.reset()
      md.update(bytes, prev, clen)
      val dig = md.digest()
      val hex = new Array[Byte](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = HexChars((dig(j) >> 4) & 0xf)
        hex(2 * j + 1) = HexChars(dig(j) & 0xf)
        j += 1
      }
      out(i) = new GenericInternalRow(Array[Any](
        i, prev + 1, clen, UTF8String.fromBytes(hex)))
      prev = e
      i += 1
    }
    new GenericArrayData(out)
  }
}

object CdcExpressions {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API for the content-defined boundary list. */
  def cdcBoundaries(c: Column): Column =
    Bridge.column(CdcBoundaries(Bridge.expression(c)))

  /** Column API for the fused chunk-row kernel. */
  def cdcChunkRows(c: Column): Column =
    Bridge.column(CdcChunkRows(Bridge.expression(c)))
}
