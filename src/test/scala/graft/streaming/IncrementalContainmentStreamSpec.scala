package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.queries.TextOps

/** dd13's continuous loop: however the corpus is split into
  * micro-batches, the distinct pair log maintained by
  * [[Streams.maintainContainmentIndex]] must equal batch
  * `containmentIndex` over everything arrived after EVERY batch — each
  * pair emitted exactly once, in the batch that completed it (a pair's
  * exact containment is immutable once both docs exist). Redelivery is a
  * guarded no-op; a partial-crash replay (pairs + store + probes
  * appended, doc store never advanced) re-appends byte-identical pairs
  * that the documented distinct() read removes, because the standing
  * store and probe reads exclude the batch's own ids. */
class IncrementalContainmentStreamSpec extends AnyFunSuite with SparkSpec {

  private def dataFiles(dir: String) = graft.SparkSpec.dataFiles(dir)

  test("batch splits reproduce batch containmentIndex at every step; append-only; redelivery no-op; crash-replay byte-identical") {
    import spark.implicits._
    val root = Files.createTempDirectory("inc-cont").toString
    val (storeT, probeT, pairsT, docT) =
      (s"$root/store", s"$root/probes", s"$root/pairs", s"$root/docs")

    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val all = docs.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // uneven arrival-order split, unrelated to pp12's hash split
    val batches = Seq(all.take(60), all.slice(60, 290), all.drop(290))

    def arrived(ids: Set[Long]) = docs.filter($"doc_id".isInCollection(ids))
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    def snapshot() = pairs(Streams.containmentPairsSnapshot(spark, pairsT))
    def direct(ids: Set[Long]) = pairs(TextOps.containmentIndex(
      arrived(ids), probeK = 8, maxDf = None, minHits = 2))

    var seen = Set.empty[Long]
    var afterPrev = Map.empty[String, (Long, Long)]
    for (b <- batches) {
      Streams.maintainContainmentIndex(b.toSeq.toDF("doc_id", "text"),
        storeT, probeT, pairsT, docT)
      seen ++= b.map(_._1)
      assert(snapshot() == direct(seen))
      // append-only: every data file present after the previous batch is
      // still there, same bytes — the batch wrote only its own files
      val now = Seq(storeT, probeT, pairsT, docT).flatMap(t =>
        dataFiles(t).map { case (k, v) => (s"$t/$k", v) }).toMap
      afterPrev.foreach { case (f, sig) =>
        assert(now.get(f).contains(sig),
          s"advance rewrote or dropped an earlier batch's file: $f")
      }
      afterPrev = now
    }
    assert(snapshot().nonEmpty)
    // exactly-once in the clean run: the raw log holds no duplicates
    assert(spark.read.parquet(pairsT).count() == snapshot().size)
    // the maintained store and probe tables are exactly the corpus's
    val store = spark.read.parquet(storeT).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(store == TextOps.containmentStore(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
    val probes = spark.read.parquet(probeT).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probes == TextOps.bottomKProbes(
        TextOps.containmentStore(docs).select($"doc_id", $"h").distinct(), 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)

    // at-least-once: redeliver a whole earlier batch — guarded no-op
    val before = snapshot()
    Streams.maintainContainmentIndex(batches(1).toSeq.toDF("doc_id", "text"),
      storeT, probeT, pairsT, docT)
    assert(snapshot() == before)
    assert(spark.read.parquet(storeT).count() == store.size)
    assert(spark.read.parquet(probeT).count() == probes.size)

    // partial crash on a fresh root: pairs + store + probes appended
    // (the advance order) but the doc store never advanced — the replay
    // must re-append byte-identical pairs (standing reads exclude the
    // batch's own ids, so inter/hit counts are not doubled) and the
    // per-table guards keep store/probes duplicate-free
    val root2 = Files.createTempDirectory("inc-cont-crash").toString
    val (storeT2, probeT2, pairsT2, docT2) =
      (s"$root2/store", s"$root2/probes", s"$root2/pairs", s"$root2/docs")
    val b1 = batches(0).toSeq.toDF("doc_id", "text")
    Streams.maintainContainmentIndex(b1, storeT2, probeT2, pairsT2, docT2)
    val cleanAfter1 = pairs(Streams.containmentPairsSnapshot(spark, pairsT2))
    val b2 = batches(1).toSeq.toDF("doc_id", "text").localCheckpoint(true)
    val standingStore = spark.read.parquet(storeT2).localCheckpoint(true)
    val standingProbes = spark.read.parquet(probeT2).localCheckpoint(true)
    val adv = TextOps.containmentIndexAdvance(
      standingStore, standingProbes, b2, probeK = 8, minHits = 2)
    adv.pairs.write.mode("append").parquet(pairsT2)
    adv.store.write.mode("append").parquet(storeT2)
    adv.probes.write.mode("append").parquet(probeT2)
    // the replay (redelivered batch) completes the advance
    Streams.maintainContainmentIndex(b2, storeT2, probeT2, pairsT2, docT2)
    val seen12 = (batches(0) ++ batches(1)).map(_._1).toSet
    assert(pairs(Streams.containmentPairsSnapshot(spark, pairsT2)) ==
      direct(seen12))
    assert(cleanAfter1.toSet.subsetOf(
      pairs(Streams.containmentPairsSnapshot(spark, pairsT2)).toSet))
    assert(spark.read.parquet(storeT2).count() ==
      TextOps.containmentStore(arrived(seen12)).count())
    assert(spark.read.parquet(probeT2).count() ==
      spark.read.parquet(probeT2).dropDuplicates("doc_id", "h").count())
  }
}
