package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.queries.TextOps

/** pp04's continuous loop: however the corpus is split into batches, the
  * remap-resolved snapshot after each advance must equal batch dupClusters
  * over the docs seen so far — with label/bucket/doc tables APPEND-ONLY
  * (earlier files byte-identical in place) and only the merge-bounded
  * remap table rewritten. */
class IncrementalClusterStateSpec extends AnyFunSuite with SparkSpec {

  private def dataFiles(dir: String) = graft.SparkSpec.dataFiles(dir)

  test("arbitrary batch splits reproduce batch dupClusters at every step; append-only advance; redelivery is a no-op") {
    import spark.implicits._
    val root = Files.createTempDirectory("inc-cluster").toString
    val (labelsT, bucketT, remapT, docT) =
      (s"$root/labels", s"$root/buckets", s"$root/remap", s"$root/docs")

    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val all = docs.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val batches = Seq(all.take(50), all.slice(50, 280), all.drop(280))

    def snapshot() = Streams.clusterSnapshot(spark, labelsT, remapT)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    def direct(upTo: Set[Long]) =
      TextOps.dupClusters(docs.filter($"doc_id".isInCollection(upTo)))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    var seen = Set.empty[Long]
    var afterPrev = Map.empty[String, (Long, Long)]
    for (b <- batches) {
      Streams.maintainClusterState(b.toSeq.toDF("doc_id", "text"),
        labelsT, bucketT, remapT, docT)
      seen ++= b.map(_._1)
      // the maintained snapshot equals a from-scratch clustering of
      // everything seen so far — merges, joins, singletons included
      assert(snapshot() == direct(seen))
      // append-only: labels/buckets/docs files from earlier batches are
      // byte-identical in place (the remap table alone may rewrite; it is
      // bounded by merged components, not by the corpus)
      val now = Seq(labelsT, bucketT, docT).flatMap(t =>
        dataFiles(t).map { case (k, v) => (s"$t/$k", v) }).toMap
      afterPrev.foreach { case (f, sig) =>
        assert(now.get(f).contains(sig),
          s"advance rewrote or dropped an earlier batch's file: $f")
      }
      afterPrev = now
    }

    // the remap table holds only merged-away component ids — strictly
    // fewer rows than components, and resolution is one hop (no __newc is
    // itself remapped)
    val remap = spark.read.parquet(remapT)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val targets = remap.map(_._2).toSet
    val sources = remap.map(_._1).toSet
    assert((targets intersect sources).isEmpty, "remap closure is not one-hop")

    // redelivery: an already-ingested batch must change nothing
    val before = snapshot()
    Streams.maintainClusterState(batches(1).toSeq.toDF("doc_id", "text"),
      labelsT, bucketT, remapT, docT)
    assert(snapshot() == before)
    assert(spark.read.parquet(docT).count() == all.length)
  }
}
