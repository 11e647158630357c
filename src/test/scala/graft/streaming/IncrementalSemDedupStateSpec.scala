package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.queries.VectorOps

/** pp10's continuous loop: the drop table maintained by
  * [[Streams.maintainIvfState]]'s optional SemDedup leg must equal a
  * from-scratch dd10 computation over everything arrived, after EVERY
  * batch split — with redelivery a no-op, an in-batch repeated row
  * harmless, and a partial-crash replay (drops upserted, postings/sums
  * never advanced) converging to the same state because the upsert is a
  * keyed full-row overwrite of rows recomputed identically from the
  * unchanged guard. */
class IncrementalSemDedupStateSpec extends AnyFunSuite with SparkSpec {

  test("batch splits reproduce batch SemDedup at every step; redelivery + in-batch dup + crash-replay safe") {
    import spark.implicits._
    val root = Files.createTempDirectory("inc-sem").toString
    val (postT, sumsT, dropT) = (s"$root/postings", s"$root/sums", s"$root/drops")

    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding")
    val cents = VectorOps.ivfCentroids(VectorOps.normed(e)).localCheckpoint(true)
    val all = e.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    // batch 2 redelivers its own first row (at-least-once inside a batch)
    val batches = Seq(all.take(40), all.slice(40, 300) ++ all.slice(40, 41),
      all.drop(300))

    def arrived(ids: Set[Long]) = e.filter($"vec_id".isInCollection(ids))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    def snapshot() = rows(Streams.semDedupSnapshot(spark, dropT))
    def direct(ids: Set[Long]) = rows(VectorOps.semanticDrops(
      VectorOps.assignCells(VectorOps.normed(arrived(ids)), cents), tau = 0.30))

    var seen = Set.empty[Long]
    for (b <- batches) {
      Streams.maintainIvfState(b.toSeq.toDF("vec_id", "embedding"), cents,
        postT, sumsT, Some(dropT))
      seen ++= b.map(_._1)
      assert(snapshot() == direct(seen))
    }
    assert(snapshot().nonEmpty)

    // redelivery of a whole ingested batch: the postings guard empties
    // the fresh set before the SemDedup leg — nothing changes
    val before = snapshot()
    Streams.maintainIvfState(batches(1).toSeq.toDF("vec_id", "embedding"),
      cents, postT, sumsT, Some(dropT))
    assert(snapshot() == before)

    // partial crash on a fresh root: batch 2's drops were upserted (same
    // advance + write the product performs) but postings/sums never
    // advanced — the guard is unchanged, so the replayed batch recomputes
    // byte-identical changed rows and the keyed overwrite converges
    val root2 = Files.createTempDirectory("inc-sem-crash").toString
    val (postT2, sumsT2, dropT2) = (s"$root2/postings", s"$root2/sums", s"$root2/drops")
    val b1 = batches(0).toSeq.toDF("vec_id", "embedding")
    Streams.maintainIvfState(b1, cents, postT2, sumsT2, Some(dropT2))
    val b2 = batches(1).toSeq.toDF("vec_id", "embedding")
    val standing = spark.read.parquet(postT2)
    val assigned2 = VectorOps.assignCells(
      VectorOps.normed(b2.dropDuplicates("vec_id")), cents)
    Streams.semDedupUpsert(spark, dropT2,
      VectorOps.semDedupAdvance(standing, assigned2, tau = 0.30))
    // the replay (redelivered batch) completes the advance
    Streams.maintainIvfState(b2, cents, postT2, sumsT2, Some(dropT2))
    val seen12 = (batches(0) ++ batches(1)).map(_._1).toSet
    assert(rows(Streams.semDedupSnapshot(spark, dropT2)) == direct(seen12))
  }
}
