package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.PlanInspect

/** The incremental flow's scale contract, pinned on PERSISTED standing
  * tables (the production shape): a batch's probe reads only the standing
  * tables at their own layout — the candidate stage scans the band index,
  * the verify stage scans the shingle store — and the document store is
  * never opened. If any stage re-derived shingles or signatures from the
  * corpus text, a scan of the doc table (or the source documents parquet)
  * would appear here. */
class IncrementalIndexAppendSpec extends AnyFunSuite with SparkSpec {

  test("probe scans = index (candidates) + shingle store (verify); doc store never read") {
    import spark.implicits._
    val root = Files.createTempDirectory("inc-plan").toString
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    TextOps.bandIndex(docs).write.parquet(s"$root/index")
    TextOps.shingleStore(docs).write.parquet(s"$root/shingles")
    docs.write.parquet(s"$root/docs") // exists, but the probe must not open it
    val idx = spark.read.parquet(s"$root/index")
    val store = spark.read.parquet(s"$root/shingles")

    // the increment: two docs whose text duplicates corpus docs, so the
    // probe genuinely produces candidates and verified pairs
    val seed = docs.orderBy($"doc_id").limit(2).collect()
    val batch = seed.toSeq.zipWithIndex
      .map { case (r, i) => (900000L + i, r.getString(1)) }
      .toDF("doc_id", "text")

    val captured = scala.collection.mutable.Buffer[org.apache.spark.sql.DataFrame]()
    val hook: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = { f =>
      captured += f; f.localCheckpoint(true)
    }
    val pairs = TextOps.incrementalPairs(idx,
      TextOps.bandIndex(batch), TextOps.shingleStore(batch), store, hook)
    assert(pairs.collect().nonEmpty, "exact-dup increment must verify as pairs")

    // candidate stage: the only file-backed input is the band index
    assert(captured.size == 1)
    val candRoots = PlanInspect.scanRoots(captured.head).toSet
    assert(candRoots.nonEmpty && candRoots.forall(_.endsWith("/index")),
      s"candidate stage scanned beyond the band index: $candRoots")

    // verify stage: the only file-backed input is the shingle store —
    // no doc-store scan, no source-documents scan, hence no re-shingling
    // of anything but the in-memory increment
    val verifyRoots = PlanInspect.scanRoots(pairs).toSet
    assert(verifyRoots.nonEmpty && verifyRoots.forall(_.endsWith("/shingles")),
      s"verify stage scanned beyond the shingle store: $verifyRoots")

    // and the store scan reads only the 24-byte (doc_id, sz, h) schema
    val readCols = PlanInspect.fileScans(pairs).flatMap(_.requiredSchema.fieldNames).toSet
    assert(readCols.subsetOf(Set("doc_id", "sz", "h")), s"store scan read $readCols")
  }
}
