package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.CdcBoundaries

/** Content-defined chunking: the boundary kernel against an independent
  * reimplementation, the partition invariant, the shift-resistance
  * property that justifies CDC over fixed-size chunking, and the
  * incremental advance == full recompute contract. */
class CdcChunkSpec extends AnyFunSuite with SparkSpec {

  /** Independent boundary reference: same contract, written from the
    * definition (positions p in [W, n-1] where the window hash divides,
    * plus n) rather than the kernel's loop. */
  private def refEnds(bytes: Array[Byte]): Seq[Int] = {
    val n = bytes.length
    if (n == 0) return Seq.empty
    val hits = (CdcBoundaries.W to n - 1).filter { p =>
      val h = (p - CdcBoundaries.W until p).foldLeft(0) { (acc, k) =>
        (acc * 31 + (bytes(k) & 0xff)) % CdcBoundaries.M
      }
      h % CdcBoundaries.D == 0
    }
    hits :+ n
  }

  /** Deterministic pseudo-random payload (no RNG — reproducible). */
  private def payload(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => (((i * 31 + seed) * 131 + 7) % 251).toByte)

  test("boundary kernel matches the independent reference on varied payloads") {
    for ((n, seed) <- Seq((0, 1), (1, 2), (7, 3), (8, 4), (9, 5), (64, 6),
        (500, 7), (1000, 8))) {
      val b = payload(n, seed)
      assert(CdcBoundaries.ends(b).toSeq == refEnds(b), s"n=$n seed=$seed")
    }
  }

  test("chunk rows partition the payload exactly: contiguous, covering, digest of the slice") {
    import spark.implicits._
    val text = ("the quick brown fox " * 30).trim
    val rows = Multimodal.cdcChunks(
        Seq((1L, text)).toDF("id", "t").withColumn("blob", encode($"t", "UTF-8")),
        "id", "blob")
      .orderBy($"chunk_idx")
      .collect()
    assert(rows.nonEmpty)
    var expectStart = 1
    rows.foreach { r =>
      assert(r.getInt(2) == expectStart, "chunks must be contiguous from byte 1")
      assert(r.getInt(3) >= 1, "no empty chunk")
      expectStart += r.getInt(3)
    }
    assert(expectStart - 1 == text.length, "chunks must cover the payload")
    // digests are of the actual slices
    rows.foreach { r =>
      val slice = text.substring(r.getInt(2) - 1, r.getInt(2) - 1 + r.getInt(3))
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(slice.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getString(4) == md, s"digest mismatch at chunk ${r.getInt(1)}")
    }
  }

  test("shift resistance: a one-byte insertion re-aligns — the shared suffix re-chunks identically (fixed-size chunking loses every post-edit chunk)") {
    val base = payload(800, 42)
    val edited = base.take(10) ++ Array(0x55.toByte) ++ base.drop(10)
    def digests(b: Array[Byte]): Seq[String] = {
      val ends = CdcBoundaries.ends(b)
      val starts = 1 +: ends.dropRight(1).map(_ + 1)
      starts.zip(ends).map { case (s0, e) =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(b.slice(s0 - 1, e)).map("%02x".format(_)).mkString
      }
    }
    val d1 = digests(base).toSet
    val d2 = digests(edited).toSet
    val shared = d1.intersect(d2).size
    // all chunks strictly after the edit's window re-align; only the
    // chunk(s) containing/adjacent to the edit may differ
    assert(shared >= d1.size - 3,
      s"CDC failed to re-align after a 1-byte insertion: ${d1.size} chunks, only $shared shared")
    // and the same content chunked from a different container offset
    // (the prepend case) still shares its tail
    val prefixed = Array.fill(37)(0x21.toByte) ++ base
    val d3 = digests(prefixed).toSet
    assert(d1.intersect(d3).size >= d1.size - 3,
      "CDC failed to re-align under a 37-byte prepend")
  }

  test("fused cdc_chunk_rows == the composed transform form, null/empty legs included") {
    import spark.implicits._
    // adversarial payloads: null, empty, shorter than the window, exactly
    // the window, multi-chunk deterministic bytes, real text
    val texts: Seq[(Long, Option[String])] = Seq(
      1L -> None,
      2L -> Some(""),
      3L -> Some("abc"),
      4L -> Some("12345678"),
      5L -> Some(new String(payload(700, 9).map(b => (33 + ((b & 0x7f) % 90)).toChar))),
      6L -> Some(("the quick brown fox " * 25).trim))
    val df = texts.toDF("id", "t")
      .withColumn("blob", when($"t".isNotNull, encode($"t", "UTF-8")))
    val native = df.select($"id",
      graft.functions.CdcExpressions.cdcChunkRows($"blob").as("chunks"))
    val composed = df
      .withColumn("ends", graft.functions.CdcExpressions.cdcBoundaries($"blob"))
      .withColumn("__blob", $"blob")
      .select($"id", expr(
        """transform(ends, (e, i) -> named_struct(
          |  'chunk_idx', i,
          |  'start', IF(i = 0, 1, element_at(ends, i) + 1),
          |  'clen', e - IF(i = 0, 1, element_at(ends, i) + 1) + 1,
          |  'digest', md5(substring(__blob,
          |     IF(i = 0, 1, element_at(ends, i) + 1),
          |     e - IF(i = 0, 1, element_at(ends, i) + 1) + 1))))""".stripMargin)
        .as("chunks"))
    def rows(d: org.apache.spark.sql.DataFrame) = d
      .select($"id", explode_outer($"chunks").as("ch"))
      .select($"id", $"ch.chunk_idx", $"ch.start", $"ch.clen", $"ch.digest")
      .collect().map(_.toSeq).toSet
    assert(rows(native) == rows(composed),
      "fused chunk rows drifted from the composed form")
    // null payload → null array (NOT empty): both forms must agree
    val nativeNull = native.filter($"id" === 1L).select($"chunks".isNull)
      .collect().head.getBoolean(0)
    assert(nativeNull, "null payload must yield a null chunk array")
  }

  test("chunkDupAdvance: standing report + advance == full-corpus report over any batch split") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("blob", encode($"text", "UTF-8"))
    val chunksAll = Multimodal.cdcChunks(docs, "doc_id", "blob")
    val full = Multimodal.chunkDupReport(chunksAll, "doc_id")
    for (mod <- Seq(3, 5)) {
      val isNew = pmod(col("doc_id"), lit(mod)) === 0
      val standChunks = Multimodal.cdcChunks(docs.filter(!isNew), "doc_id", "blob")
      val standReport = Multimodal.chunkDupReport(standChunks, "doc_id")
      val batchChunks = Multimodal.cdcChunks(docs.filter(isNew), "doc_id", "blob")
      val adv = Multimodal.chunkDupAdvance(standChunks, standReport, batchChunks, "doc_id")
      assert(adv.exceptAll(full).isEmpty && full.exceptAll(adv).isEmpty,
        s"advance != full recompute at split mod=$mod")
    }
  }
}
