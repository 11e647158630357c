package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical leg under ta21/ta22's scale claim — "the exact rollup's
  * exchange carries the n-gram vocabulary; the pruned rollups carry the
  * heavy mass" — measured where it actually bites: a corpus whose
  * DISTINCT-BIGRAM count grows linearly with size (the testdata corpus
  * has a fixed ~900-bigram vocabulary, so the claim is invisible
  * there). Each synthetic doc carries one of 64 heavy phrases (support
  * far above the 1/1024 threshold) plus `filler` id-salted unique
  * tokens, so distinct bigrams ≈ nDocs·filler while the heavy result
  * stays ~128 rows.
  *
  * Three plans produce the IDENTICAL result (asserted): EXACT (plain
  * rollup + HAVING — partial agg emits one row per distinct bigram per
  * map partition, the vocabulary IS the exchange), CMS (ta21's two-pass
  * sketch prune), MG (ta22's one-pass Misra-Gries prune). For each:
  * wall time (min of `runs`) and SHUFFLE RECORDS WRITTEN (listener sum
  * over the job's stages — the direct measurement of what crossed the
  * wire). COVERAGE.md records the table.
  *
  * Usage: `runMain graft.HeavyProbe [nDocs] [filler] [runs]`
  * (defaults 200000, 30, 3). */
object HeavyProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(200000)
    val filler = args.lift(1).map(_.toInt).getOrElse(30)
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
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
    import spark.implicits._

    val shuffled = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffled.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
    })

    // heavy phrase h<g>A h<g>B ×4 + unique filler u<id>_1 … u<id>_m:
    // heavy bigram support ≈ 7/(64·(8+filler)) per phrase, >> 1/1024
    val work = java.nio.file.Files.createTempDirectory("heavy-probe").toString
    spark.range(nDocs.toLong)
      .select($"id".as("doc_id"), concat_ws(" ",
        concat_ws(" ", array_repeat(
          concat(lit("h"), pmod($"id", lit(64L)), lit("A h"),
            pmod($"id", lit(64L)), lit("B")), 4)),
        concat_ws(" ", transform(sequence(lit(1), lit(filler)),
          j => concat(lit("u"), $"id", lit("_"), j)))).as("text"))
      .write.parquet(s"$work/documents")
    val docs = spark.read.parquet(s"$work/documents")

    def occOf() = graft.queries.TextOps.bigramOcc(docs)
    println(s"PROF corpus nDocs=$nDocs filler=$filler " +
      s"occurrences=${occOf().count()} distinct=${occOf().distinct().count()}")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // listener events are async: poll the counter until it is stable
    // across two reads — a fixed sleep can undercount on a loaded host
    def drained(): Long = {
      var prev = -1L
      var cur = shuffled.get()
      while (cur != prev) { Thread.sleep(100); prev = cur; cur = shuffled.get() }
      cur
    }
    def measure(label: String)(f: => DataFrame): Array[(String, Long)] = {
      noop(f) // JIT/codegen warm pass
      val measured = (1 to runs).map { _ =>
        drained(); shuffled.set(0L)
        val t0 = System.nanoTime
        noop(f)
        val dt = (System.nanoTime - t0) / 1e9
        (dt, drained())
      }
      val (ts, rs) = (measured.map(_._1), measured.map(_._2))
      // the plans are deterministic, so per-run record counts must
      // agree — a mismatch means dropped/leaked listener events and
      // the measurement is not trustworthy
      if (rs.distinct.size != 1)
        println(s"PROF WARNING $label shuffle_records varied across " +
          s"runs: ${rs.mkString(",")} — treat the count as unreliable")
      println(f"PROF $label min=${ts.min}%.2f shuffle_records=${rs.max} " +
        s"runs=[${ts.map(t => f"$t%.2f").mkString(",")}]")
      f.collect().map(r => (r.getString(0), r.getLong(1)))
    }

    def exact(): DataFrame = {
      val occ = occOf()
      val total = occ.count()
      occ.groupBy($"tok").agg(count(lit(1)).as("n"))
        .filter($"n" * 1024L > total)
        .select($"tok".as("bigram"), $"n")
        .orderBy($"n".desc, $"bigram")
    }
    // both materialization strategies of the library operators: rescan
    // (the default — recompute occ from the pushed-down scan per pass;
    // no corpus-sized local-disk spill, the 100 TB-safe choice) vs
    // localCheckpoint (one tokenize, ~2x-corpus executor-disk copy)
    val mat = graft.queries.TextOps.localMaterialize
    def cms(m: DataFrame => DataFrame): DataFrame =
      graft.queries.TextOps.cmsHeavyHitters(occOf(), m)
    def mg(m: DataFrame => DataFrame): DataFrame =
      graft.queries.TextOps.mgHeavyHitters(occOf(), m)

    val e = measure("exact_rollup")(exact())
    val cr = measure("cms_rescan")(cms(identity))
    val cc = measure("cms_checkpoint")(cms(mat))
    val mr = measure("mg_rescan")(mg(identity))
    val mc = measure("mg_checkpoint")(mg(mat))
    for ((got, label) <- Seq(cr -> "cms_rescan", cc -> "cms_checkpoint",
        mr -> "mg_rescan", mc -> "mg_checkpoint"))
      require(e.toSeq == got.toSeq,
        s"plans disagree: exact=${e.length} $label=${got.length} rows")
    println(s"PROF agreement all_five_plans_identical rows=${e.length}")
    spark.stop()
  }
}
