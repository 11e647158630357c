package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Empirical leg under ta24's scale claim — "the exact window sort
  * ships every value row to its group's reducer; the bottom-k sketch
  * ships k pairs per (group, map) regardless of domain or row count" —
  * measured where it bites: values uniform over the full 2³² fold
  * domain (every value effectively distinct, the regime where q47's
  * per-distinct-value histogram degenerates to the corpus and only the
  * sketch's exchange stays flat). Three quantities per plan: wall time
  * (min of `runs`), SHUFFLE RECORDS WRITTEN (listener sum), and — for
  * the sketch — the realized rank error of each estimate against the
  * exact order statistic, which the sampling bound says is
  * O(n/√k) with high probability. COVERAGE.md records the table.
  *
  * Usage: `runMain graft.QuantileProbe [nRows] [runs]`
  * (defaults 2000000, 3). */
object QuantileProbe {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toInt).getOrElse(2000000)
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
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

    // (g, h, v): 3 groups, v uniform over [0, 2^32) — effectively all
    // distinct, the wide-domain regime
    val work = java.nio.file.Files.createTempDirectory("q-probe").toString
    spark.range(nRows.toLong)
      .select(pmod($"id", lit(3L)).cast("string").as("g"),
        graft.queries.QueryUtils.hex8(
          concat(lit("qh:"), $"id".cast("string"))).as("h"),
        graft.queries.QueryUtils.hex8(
          concat(lit("qv:"), $"id".cast("string"))).as("v"))
      .write.parquet(s"$work/rows")
    val rows = spark.read.parquet(s"$work/rows")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def drained(): Long = {
      var prev = -1L
      var cur = shuffled.get()
      while (cur != prev) { Thread.sleep(100); prev = cur; cur = shuffled.get() }
      cur
    }
    def measure(label: String)(f: => DataFrame): DataFrame = {
      noop(f)
      val measured = (1 to runs).map { _ =>
        drained(); shuffled.set(0L)
        val t0 = System.nanoTime
        noop(f)
        ((System.nanoTime - t0) / 1e9, drained())
      }
      val (ts, rs) = (measured.map(_._1), measured.map(_._2))
      println(f"PROF $label min=${ts.min}%.2f shuffle_records=${rs.max} " +
        s"runs=[${ts.map(t => f"$t%.2f").mkString(",")}]")
      f
    }

    val ps = Seq(("p50", 50), ("p90", 90), ("p99", 99))
    // EXACT nearest-lower-rank percentiles via the q41-class window sort:
    // every row ranked per group — the disqualified-at-scale baseline
    def exact(): DataFrame = {
      val counts = rows.groupBy($"g").agg(count(lit(1)).as("n"))
      val ranked = rows
        .withColumn("idx",
          row_number().over(Window.partitionBy($"g").orderBy($"v", $"h"))
            .cast("long") - 1L)
        .join(broadcast(counts), Seq("g"))
      val aggs = ps.map { case (name, p) =>
        max(when($"idx" === ((($"n" - 1L) * p) - pmod(($"n" - 1L) * p, lit(100L))) / 100L,
          $"v")).as(name)
      }
      ranked.groupBy($"g").agg(aggs.head, aggs.tail: _*).orderBy($"g")
    }
    // the ta24 sketch: k pairs per (group, map) on the wire
    def sketch(): DataFrame =
      graft.operators.QuantileSketch.quantiles(
        graft.operators.QuantileSketch.sketch(rows, "g", $"h", $"v", 256),
        256, ps.map { case (n, p) => (n, p, 100) }).orderBy($"g")

    val e = measure("exact_window")(exact()).collect()
      .map(r => r.getString(0) -> r).toMap
    val s = measure("bottomk_sketch")(sketch()).collect()
    // realized accuracy: rank error of each estimate vs the exact order
    // statistic, in units of n (rank fraction)
    val sorted = rows.select($"g", $"v").collect()
      .groupBy(_.getString(0)).map { case (g, rs) =>
        g -> rs.map(_.getLong(1)).sorted }
    for (r <- s; (name, p) <- ps) {
      val g = r.getString(0)
      val vs = sorted(g)
      val est = r.getAs[Long](name)
      val wantRank = (vs.length - 1L) * p / 100L
      val gotRank = vs.indexWhere(_ >= est).toLong
      val fracErr = math.abs(gotRank - wantRank).toDouble / vs.length
      println(f"PROF accuracy g=$g $name rank_frac_err=$fracErr%.5f " +
        f"(bound ~ 1/sqrt(k) = ${1.0 / math.sqrt(256)}%.4f)")
      require(fracErr <= 3.0 / math.sqrt(256),
        s"sketch estimate outside the 3/sqrt(k) band: g=$g $name")
      val _ = e // exact frame retained for eyeballing in the log
    }
    println("PROF done")
    spark.stop()
  }
}
