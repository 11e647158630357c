package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.queries.TextOps

/** The unified maintenance loop: one advance per batch must leave BOTH
  * standing views — duplicate pairs and cluster labels — exactly where
  * the separate batch pipelines would, for any split of the corpus, with
  * one signature pass and one doc-store guard. */
class DedupStateStreamSpec extends AnyFunSuite with SparkSpec {

  test("combined loop == lshDedup pairs AND dupClusters labels for an arbitrary split") {
    import spark.implicits._
    val root = Files.createTempDirectory("dedup-state").toString
    def t(n: String) = s"$root/$n"

    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val all = docs.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val batches = Seq(all.take(120), all.slice(120, 300), all.drop(300))
    for (b <- batches)
      Streams.maintainDedupState(b.toSeq.toDF("doc_id", "text"),
        t("index"), t("pairs"), t("shingles"), t("labels"), t("buckets"),
        t("remap"), t("docs"))

    val pairs = spark.read.parquet(t("pairs")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batchPairs = TextOps.lshDedup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs == batchPairs)

    val snapshot = Streams.clusterSnapshot(spark, t("labels"), t("remap"))
      .collect().map(_.toSeq).toSeq
    val direct = TextOps.dupClusters(docs).collect().map(_.toSeq).toSeq
    assert(snapshot == direct)

    // one doc-store row per doc — the single shared guard
    assert(spark.read.parquet(t("docs")).count() == all.length)
  }
}
