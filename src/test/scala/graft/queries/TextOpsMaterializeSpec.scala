package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The dedup/export pipelines' checkpoint strategy is caller-pluggable:
  * the default eager localCheckpoint is fast but not recoverable on
  * executor loss; a cluster with an unreliable-executor profile passes
  * reliable `_.checkpoint(true)` instead. Results must be identical —
  * the hook changes storage, never the algorithm. */
class TextOpsMaterializeSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, sf)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("reliable checkpoint() yields identical results for every hooked pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val reliable: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      _.checkpoint(true)
    assert(rows(TextOps.lshDedup(docs, reliable)) == rows(TextOps.lshDedup(docs)))
    assert(rows(TextOps.dupClusters(docs, reliable)) == rows(TextOps.dupClusters(docs)))
    assert(rows(TextOps.contamination(docs, reliable)) == rows(TextOps.contamination(docs)))
    assert(rows(TextOps.exportPipeline(docs, reliable)) == rows(TextOps.exportPipeline(docs)))
  }
}
