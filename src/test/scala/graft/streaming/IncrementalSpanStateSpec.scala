package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.queries.TextOps

/** pp06's continuous loop: however the corpus is split into batches, the
  * per-doc report snapshot after each advance must equal batch spanDedup
  * over the docs seen so far — including the unique→shared crossing,
  * where a LATER batch's copy turns an EARLIER doc's spans duplicated —
  * with all four standing tables append-only, redelivery a no-op, the
  * additive counts/report deltas surviving a partial-crash replay via the
  * batch_key guards, and compaction leaving the snapshot unchanged. */
class IncrementalSpanStateSpec extends AnyFunSuite with SparkSpec {

  private def dataFiles(dir: String) = graft.SparkSpec.dataFiles(dir)

  test("batch splits reproduce batch spanDedup at every step; crossing, append-only, redelivery, crash-replay, compaction") {
    import spark.implicits._
    val root = Files.createTempDirectory("inc-span").toString
    val (gramsT, countsT, reportT, docT) =
      (s"$root/grams", s"$root/counts", s"$root/report", s"$root/docs")

    val base = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val baseRows = base.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // copies of batch-1 docs landing in batch 3: their originals' spans
    // cross unique→shared only when the copy arrives — the advance path
    // a whole-corpus recompute gets for free and the incremental one must
    // derive from the standing state
    val copies = baseRows.take(5).map { case (id, t) => (id + 900000L, t) }
    val all = baseRows ++ copies
    val docs = all.toSeq.toDF("doc_id", "text")
    val batches = Seq(baseRows.take(50), baseRows.drop(50), copies)

    def snapshot() = Streams.spanSnapshot(spark, reportT)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    def direct(ids: Set[Long]) =
      TextOps.spanDedup(docs.filter($"doc_id".isInCollection(ids)))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq

    var seen = Set.empty[Long]
    var afterPrev = Map.empty[String, (Long, Long)]
    for (b <- batches) {
      // an at-least-once upstream can repeat a doc WITHIN one micro-batch;
      // the advance must not double its span counts (freshAgainst dedups)
      val delivered = b ++ b.take(1)
      Streams.maintainSpanState(delivered.toSeq.toDF("doc_id", "text"),
        gramsT, countsT, reportT, docT)
      seen ++= b.map(_._1)
      assert(snapshot() == direct(seen))
      // append-only: every standing table's earlier files stay in place
      val now = Seq(gramsT, countsT, reportT, docT).flatMap(t =>
        dataFiles(t).map { case (k, v) => (s"$t/$k", v) }).toMap
      afterPrev.foreach { case (f, sig) =>
        assert(now.get(f).contains(sig),
          s"advance rewrote or dropped an earlier batch's file: $f")
      }
      afterPrev = now
    }
    // the copies batch must have flagged its batch-1 originals (crossing)
    val finalSnap = snapshot()
    assert(copies.map(_._1).toSet.subsetOf(finalSnap.map(_._1).toSet))
    assert(copies.map { case (id, _) => id - 900000L }
      .toSet.subsetOf(finalSnap.map(_._1).toSet),
      "originals from batch 1 must be flagged once their copies arrive")

    // redelivery of an ingested batch: nothing changes (doc-store guard)
    Streams.maintainSpanState(batches(2).toSeq.toDF("doc_id", "text"),
      gramsT, countsT, reportT, docT)
    assert(snapshot() == finalSnap)
    assert(spark.read.parquet(docT).count() == all.length)

    // compaction folds both delta tables without moving the snapshot, and
    // a post-compaction advance stays exact
    Streams.compactSpanCounts(spark, countsT, docT)
    Streams.compactSpanReport(spark, reportT, docT)
    assert(snapshot() == finalSnap)

    // partial-crash replay on a fresh root: counts + report + grams
    // landed, the doc store didn't — the whole batch replays. Without
    // the batch_key exclusion on the counts view the replay would see
    // its own crashed counts as standing state (old_nd inflated: spans
    // mis-read as already-shared, crossings missed and batch rows
    // wrong); without the store guard its own grams would double the
    // crossing deltas. With both, delta rows are byte-identical and the
    // snapshot dedup collapses them.
    val root2 = Files.createTempDirectory("inc-span-crash").toString
    val (gramsT2, countsT2, reportT2, docT2) =
      (s"$root2/grams", s"$root2/counts", s"$root2/report", s"$root2/docs")
    Streams.maintainSpanState(batches(0).toSeq.toDF("doc_id", "text"),
      gramsT2, countsT2, reportT2, docT2)
    val b2 = batches(2).toSeq.toDF("doc_id", "text") // the copies: real dups
    // simulate the crashed attempt by running the FULL advance except the
    // doc-store append — via the SAME delta builders the advance uses, so
    // the simulated crash state can't drift from what the product writes
    val key2 = batches(2).map(_._1).min
    val oldCounts2 = spark.read.parquet(countsT2)
      .groupBy($"h").agg(org.apache.spark.sql.functions.sum($"nd").as("nd"))
    val oldGrams2 = spark.read.parquet(gramsT2)
    val adv2 = TextOps.spanAdvance(oldGrams2, oldCounts2, TextOps.spanStore(b2))
    Streams.spanCountsDelta(adv2, key2).write.mode("append").parquet(countsT2)
    Streams.spanReportDelta(adv2, key2).write.mode("append").parquet(reportT2)
    adv2.grams.write.mode("append").parquet(gramsT2)
    // a maintenance compaction while the crashed batch is pending must
    // leave its uncommitted rows under their own key: folded into the
    // reserved key they would escape the replay's own-key exclusion —
    // the batch's own bnd would read as standing counts, crossings would
    // be missed, and the report would diverge permanently
    Streams.compactSpanCounts(spark, countsT2, docT2)
    Streams.compactSpanReport(spark, reportT2, docT2)
    assert(spark.read.parquet(countsT2).filter($"batch_key" === key2).count() > 0,
      "compaction folded a pending batch's count rows")
    // the replay
    Streams.maintainSpanState(b2, gramsT2, countsT2, reportT2, docT2)
    val seen02 = (batches(0) ++ batches(2)).map(_._1).toSet
    assert(Streams.spanSnapshot(spark, reportT2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      == direct(seen02))
    // and the grams store holds exactly one row set per doc
    assert(spark.read.parquet(gramsT2).count() ==
      TextOps.spanStore(docs.filter($"doc_id".isInCollection(seen02))).count())
  }
}
