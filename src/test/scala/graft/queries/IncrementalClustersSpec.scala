package graft.queries

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** pp04's contract: advancing standing labels with a batch must land on
  * exactly the full-corpus dd06 clustering — and the kernel must handle
  * the three structural events an increment can cause: joining an
  * existing component, MERGING two existing components, and forming
  * new-doc-only components (plus singletons). */
class IncrementalClustersSpec extends AnyFunSuite with SparkSpec {

  test("pp04 gate == dd06 full-corpus clustering at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val inc = Catalog.byName("pp04_incremental_clusters").fn(spark, sf).collect().toSeq
    val full = Catalog.byName("dd06_dup_clusters").fn(spark, sf).collect().toSeq
    assert(inc.nonEmpty && inc == full)
  }

  test("kernel: join, two-component merge, new-new pair, singleton — labels and sizes exact") {
    import spark.implicits._
    // standing state: component 1 = {1, 2} (buckets X1, X2), component 3 =
    // {3, 4} (bucket Y), doc 5 isolated
    val oldLabels = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L), (5L, 5L))
      .toDF("doc_id", "component")
    val bucketComp = Seq(("X1", 1L), ("X2", 1L), ("Y", 3L))
      .toDF("bucket", "component")
    // the batch: doc 6 bridges X2 and Y (merges components 1 and 3), docs
    // 7+8 share a brand-new bucket Z (new-new pair), doc 9 has no buckets
    val newIds = Seq(6L, 7L, 8L, 9L).toDF("doc_id")
    val newMembers = Seq((6L, "X2"), (6L, "Y"), (7L, "Z"), (8L, "Z"))
      .toDF("doc_id", "bucket")
    val got = TextOps.incrementalClusterKernel(
        oldLabels, bucketComp, newIds, newMembers)
      .collect().toSeq
    assert(got == Seq(
      Row(1L, 1L, 5L), Row(2L, 1L, 5L), Row(3L, 1L, 5L), Row(4L, 1L, 5L),
      Row(5L, 5L, 1L), Row(6L, 1L, 5L), Row(7L, 7L, 2L), Row(8L, 7L, 2L),
      Row(9L, 9L, 1L)))
  }

  test("pp15 gate == dd14 full-corpus canonicalization; the split exercises BOTH the recompute and the carry branch") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val inc = Catalog.byName("pp15_incremental_canonical").fn(spark, sf).collect().toSeq
    val full = Catalog.byName("dd14_canonical_keep").fn(spark, sf).collect().toSeq
    assert(inc.nonEmpty && inc == full)
    // the equality above is vacuous for the carry path if every standing
    // component happened to be touched (then pp15 is just dd14 rerun) —
    // recompute the touched set independently from the gate's own split
    // salt and pin that both branches are populated on this corpus
    val docs = graft.Tables.documents(spark, sf)
    val isNew = graft.queries.QueryUtils.hex8(
      concat(lit("inc:"), $"doc_id".cast("string"))) % 5 === 0
    def members(d: org.apache.spark.sql.DataFrame) =
      TextOps.bandIndex(d).select($"doc_id",
        concat_ws(":", $"band", $"bkey").as("bucket"))
    val oldMembers = members(docs.filter(!isNew))
    val batchBuckets = members(docs.filter(isNew)).select($"bucket").distinct()
    val touchedOld = oldMembers.join(batchBuckets, Seq("bucket"), "left_semi")
      .select($"doc_id").distinct().count()
    val untouchedOld = docs.filter(!isNew).count() - touchedOld
    assert(touchedOld > 0, "no standing doc touched — recompute branch unexercised")
    assert(untouchedOld > 0, "every standing doc touched — carry branch unexercised")
  }

  test("kernel: a batch touching nothing leaves every standing label unchanged") {
    import spark.implicits._
    val oldLabels = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("doc_id", "component")
    val bucketComp = Seq(("X", 1L)).toDF("bucket", "component")
    val newIds = Seq(10L).toDF("doc_id")
    val newMembers = Seq((10L, "W")).toDF("doc_id", "bucket")
    val got = TextOps.incrementalClusterKernel(
        oldLabels, bucketComp, newIds, newMembers)
      .collect().toSeq
    assert(got == Seq(
      Row(1L, 1L, 2L), Row(2L, 1L, 2L), Row(3L, 3L, 1L), Row(10L, 10L, 1L)))
  }
}
