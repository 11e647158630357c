package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.queries.TextOps

/** pp02's streaming loop end to end: however the corpus is split into
  * micro-batches, the union of per-batch emitted pairs must equal batch
  * lshDedup over the whole corpus — each pair surfacing exactly once, in
  * the batch where its later member arrived. */
class IncrementalIndexStreamSpec extends AnyFunSuite with SparkSpec {

  test("arbitrary batch splits reproduce batch lshDedup; redelivery emits nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("inc-idx").toString
    val (indexT, docT, pairsT) = (s"$root/index", s"$root/docs", s"$root/pairs")

    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val all = docs.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // uneven split on arrival order, unrelated to pp02's hash split
    val batches = Seq(all.take(50), all.slice(50, 280), all.drop(280))

    val mem = MemoryStream[(Long, String)]
    val q = Streams.incrementalIndexStream(
      mem.toDF().toDF("doc_id", "text"), indexT, docT, pairsT)
    try {
      for (b <- batches) { mem.addData(b: _*); q.processAllAvailable() }

      def pairSet() = spark.read.parquet(pairsT).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val streamed = pairSet()
      val batchPairs = TextOps.lshDedup(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed == batchPairs)
      assert(spark.read.parquet(pairsT).count() == batchPairs.size,
        "each pair must be emitted exactly once across all batches")

      // the maintained index is exactly the corpus's band index
      val idx = spark.read.parquet(indexT)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      val direct = TextOps.bandIndex(docs)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(idx == direct)

      // at-least-once safety: redeliver a whole earlier batch
      mem.addData(batches(1): _*); q.processAllAvailable()
      assert(pairSet() == streamed)
      assert(spark.read.parquet(indexT).count() == idx.size)
      assert(spark.read.parquet(docT).count() == all.length)
    } finally q.stop()
  }
}
