package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Many-batch probe for the continuous maintainers — the empirical leg
  * under the O(batch)-per-advance claim that the one-batch gates
  * (pp05/pp10) and the 10× [[ScaleProbe]] cannot ground: per-advance
  * cost must stay FLAT as the standing state grows from empty to the
  * full corpus underneath the flow (COVERAGE.md records the table).
  *
  * Drives [[graft.streaming.Streams.maintainIvfState]] — postings, sums
  * AND the SemDedup drop-delta leg — over `nBatches` disjoint batches of
  * the [[ScaleProbe]] 10× embeddings corpus under the production sizing
  * rule (nlist ∝ N), running the documented maintenance cadence
  * ([[graft.streaming.Streams.compactIvfSums]],
  * [[graft.streaming.Streams.compactSemDedupDrops]],
  * [[graft.streaming.Streams.compactAppends]]) between advances every
  * `compactEvery` batches, timed separately — compaction is O(standing)
  * by design (that is its job: fold O(batches)-sized listings back to
  * O(live keys)); the claim under test is that the ADVANCE is not.
  *
  * Usage: `runMain graft.MaintainerProbe [srcDir] [nBatches]` (defaults
  * /tmp/graft-sf1 — generate with `runMain graft.ScaleProbe` first —
  * and 20 batches).
  */
object MaintainerProbe {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/graft-sf1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(20)
    val compactEvery = 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("maintainer-probe").toString
    val (postT, sumsT, dropT) = (s"$work/postings", s"$work/sums", s"$work/drops")
    val codesT = s"$work/codes"
    val e = spark.read.parquet(s"$src/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    // production sizing rule: constant target cell size — nlist ∝ N
    // (ScaleProbe's companion-row rule; 8 cells at sf0.1 → 80 at 10×).
    // Centroid ids select base-replica rows only, like the probe's gates.
    val nlist = math.max(8, (n / 250).toInt)
    // NOT localCheckpointed: the per-batch block cleanup below must stay
    // a blanket sweep (each advance's own checkpoints), and a
    // checkpointed frame reused across batches would be destroyed by it;
    // assignCells collects the centroid rows per call anyway
    val cents = graft.queries.VectorOps.ivfCentroids(
      graft.queries.VectorOps.normed(e), nlist)
    // disjoint, same-sized, replica-interleaved batches (vec_id mod k):
    // every batch touches every cell, the worst case for the drop leg's
    // touched-cell restriction
    def batch(k: Int) = e.filter(pmod(col("vec_id"), lit(nBatches)) === k)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // one throwaway advance on a scratch root so codegen/JIT land outside
    // the measured loop (its tables are then abandoned)
    // the PQ codes maintainer (pp14's twin) rides the same batch stream
    // against its own standing table — fixed codebook, like production
    val book = graft.queries.VectorOps.pqBookRows(
      graft.queries.VectorOps.normed(e))
    val warm = java.nio.file.Files.createTempDirectory("maintainer-warm").toString
    graft.streaming.Streams.maintainIvfState(batch(0), cents,
      s"$warm/postings", s"$warm/sums", Some(s"$warm/drops"))
    graft.streaming.Streams.maintainPqCodes(batch(0), cents, book,
      s"$warm/codes")

    println("| batch | rows | standing rows | advance s | pq-codes s | compact s |")
    println("|---|---|---|---|---|---|")
    var standing = 0L
    for (k <- 0 until nBatches) {
      val b = batch(k)
      val rows = b.count()
      val dt = time {
        graft.streaming.Streams.maintainIvfState(b, cents, postT, sumsT,
          Some(dropT))
      }
      val pt = time {
        graft.streaming.Streams.maintainPqCodes(b, cents, book, codesT)
      }
      val ct =
        if ((k + 1) % compactEvery == 0) time {
          graft.streaming.Streams.compactIvfSums(spark, sumsT, postT)
          graft.streaming.Streams.compactSemDedupDrops(spark, dropT, postT)
          graft.streaming.Streams.compactAppends(spark, postT, cpus.toInt)
          graft.streaming.Streams.compactAppends(spark, codesT, cpus.toInt)
        } else -1.0
      standing += rows
      val cs = if (ct < 0) "" else f"$ct%.2f"
      println(f"| ${k + 1} | $rows | $standing | $dt%.2f | $pt%.2f | $cs |")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // ---- document-side leg: the counts-family maintainers (pp16 mix,
    // pp17 dedup) over disjoint batches of the 10× documents corpus.
    // Both advances are one batch-sized pass + appends; the only
    // standing-sized touch is the id-guard anti-join (a single-column
    // scan every text flow shares) — the claim under test is that
    // per-advance cost stays flat as the guard grows to the corpus.
    val docs = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    def docBatch(k: Int) = docs.filter(pmod(col("doc_id"), lit(nBatches)) === k)
    val (mixT, mixDocT) = (s"$work/mix_counts", s"$work/mix_docs")
    val (dedT, dedDocT) = (s"$work/dedup_stats", s"$work/dedup_docs")
    graft.streaming.Streams.maintainMixState(docBatch(0), s"$warm/mix",
      s"$warm/mix_docs")
    graft.streaming.Streams.maintainDedupState(docBatch(0), s"$warm/ded",
      s"$warm/ded_docs")
    println()
    println("| batch | rows | standing docs | mix s | dedup s | compact s |")
    println("|---|---|---|---|---|---|")
    var docStanding = 0L
    for (k <- 0 until nBatches) {
      val b = docBatch(k)
      val rows = b.count()
      val mt = time {
        graft.streaming.Streams.maintainMixState(b, mixT, mixDocT)
      }
      val ddt = time {
        graft.streaming.Streams.maintainDedupState(b, dedT, dedDocT)
      }
      val ct =
        if ((k + 1) % compactEvery == 0) time {
          graft.streaming.Streams.compactMix(spark, mixT, mixDocT)
          graft.streaming.Streams.compactDedup(spark, dedT, dedDocT)
        } else -1.0
      docStanding += rows
      val cs = if (ct < 0) "" else f"$ct%.2f"
      println(f"| ${k + 1} | $rows | $docStanding | $mt%.2f | $ddt%.2f | $cs |")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
