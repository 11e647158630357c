package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The COMPOSITE maintenance loop (pp33's continuous twin): ONE
  * MemoryStream of documents drives all five standing-state families —
  * exact dedup, perplexity scores, tf/BM25, CMS, HLL — through the same
  * foreachBatch body: shared batches, shared delivery order, one guard
  * table per family. Then one CRASH REPLAY hits every family at once
  * (each family's last-batch delta re-appended raw, as a crash between
  * the delta append and the guard append would leave it) and one whole
  * batch is REDELIVERED through the composite loop. At every step, every
  * family's snapshot must equal its batch gate's from-scratch output —
  * the per-family lifecycles are each spec-pinned in isolation
  * (Dedup/Score/Tf/Cms/HllStateSpec); this spec proves they COMPOSE with
  * no cross-family interference. */
class MultiFamilyPipelineSpec extends AnyFunSuite with SparkSpec {

  test("one stream drives five families; snapshots == gates through crash replay and redelivery") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val root = Files.createTempDirectory("multi-family").toString
    def t(n: String) = s"$root/$n"
    val sfDir = "/root/testdata/sf0.001"

    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"lang", $"text").localCheckpoint(true)
    val rows = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)

    // the once-offline frozen reference, exactly ta17's derivation
    Streams.buildRefState(docs, t("ref"))
    val ref = spark.read.parquet(t("ref")).localCheckpoint(true)

    def ingest(b: DataFrame): Unit = {
      Streams.maintainDedupState(b.select($"doc_id", $"text"),
        t("xstats"), t("xdocs"))
      Streams.maintainScoreState(b, t("ref"), t("scores"), t("sdocs"))
      Streams.maintainTfState(b.select($"doc_id", $"text"),
        t("tf"), t("tdocs"))
      Streams.maintainCmsState(b.select($"doc_id", $"text"),
        t("cells"), t("vocab"), t("cdocs"))
      Streams.maintainHllState(b, t("regs"), t("hdocs"))
    }

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String)]
    val q = mem.toDF().toDF("doc_id", "source", "lang", "text")
      .writeStream.foreachBatch((b: DataFrame, _: Long) => ingest(b)).start()
    val batches = Seq(rows.take(170), rows.slice(170, 340), rows.drop(340))
    try {
      batches.foreach { g => mem.addData(g.toSeq); q.processAllAvailable() }
    } finally q.stop()

    def rowsOf(df: DataFrame) =
      df.collect().map(_.toSeq.toList).toList.sortBy(_.toString)
    def gate(name: String) = rowsOf(
      graft.queries.Catalog.byName(name).fn(spark, sfDir))
    def snapshots() = Seq(
      "dedup" -> rowsOf(Streams.dedupSnapshot(spark, t("xstats"))),
      "scores" -> rowsOf(Streams.scoreSnapshot(spark, t("scores"))),
      "bm25" -> rowsOf(Streams.bm25Snapshot(spark, t("tf"))),
      "cms" -> rowsOf(Streams.cmsSnapshot(spark, t("cells"), t("vocab"))),
      "hll" -> rowsOf(Streams.hllSnapshot(spark, t("regs"))))
    val want = Map(
      "dedup" -> gate("dd15_norm_dedup"),
      "scores" -> gate("ta17_ref_perplexity"),
      "bm25" -> gate("ta18_bm25_topk"),
      "cms" -> gate("ta20_cms_counts"),
      "hll" -> gate("ta23_hll_distinct"))
    def checkAll(when: String): Unit =
      for ((f, got) <- snapshots()) {
        assert(got.nonEmpty, s"$f snapshot empty ($when) — vacuous")
        assert(got == want(f), s"$f snapshot != its gate ($when)")
      }
    checkAll("after the stream drained")

    // ONE crash replay across ALL families: the last batch's delta rows
    // land a second time, raw (no guard) — exactly what a crash between
    // each family's delta append and its doc-store append leaves behind.
    // Partitioned tables replay THROUGH the partitioned write (a raw
    // root-level append is ignored by partition discovery — vacuous).
    val last = batches.last.toSeq.toDF("doc_id", "source", "lang", "text")
      .localCheckpoint(true)
    val bk = batches.last.map(_._1).min
    Streams.dedupDelta(last.select($"doc_id", $"text"), bk)
      .write.mode("append").parquet(t("xstats"))
    Streams.scoreDelta(last, ref, bk)
      .withColumn("pt", pmod($"doc_id", lit(Streams.TF_PARTITIONS.toLong)))
      .write.mode("append").partitionBy("pt").parquet(t("scores"))
    graft.queries.TextOps.tfRollup(last.select($"doc_id", $"text"))
      .withColumn("pt", pmod($"doc_id", lit(Streams.TF_PARTITIONS.toLong)))
      .write.mode("append").partitionBy("pt").parquet(t("tf"))
    Streams.cmsDelta(last.select($"doc_id", $"text"), bk)
      .write.mode("append").parquet(t("cells"))
    Streams.vocabDelta(last.select($"doc_id", $"text"), bk)
      .write.mode("append").parquet(t("vocab"))
    Streams.hllDelta(last).write.mode("append").parquet(t("regs"))
    checkAll("after the five-family crash replay")

    // whole-batch redelivery through the COMPOSITE loop: every family's
    // guard blocks it in the same pass
    ingest(batches.head.toSeq.toDF("doc_id", "source", "lang", "text"))
    checkAll("after whole-batch redelivery")

    // one guard row per doc per family — the shared batches really did
    // reach every family exactly once
    for (g <- Seq("xdocs", "sdocs", "tdocs", "cdocs", "hdocs"))
      assert(spark.read.parquet(t(g)).select($"doc_id").distinct().count()
        == rows.length, s"guard $g does not cover the corpus exactly")
  }
}
