package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every catalog query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Results are fully materialized through a noop
  * sink (a bare .count() would let Catalyst answer trivial scans from
  * parquet footers and under-report the work). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    // Steady-state timing: two runs per query, report the min. The first
    // run of each distinct plan shape pays one-time whole-stage-codegen
    // compilation + JIT (measured 2-5x inflation on sub-second queries);
    // that cost is amortized away on any real workload.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      }
      // a failed query must not score its (near-zero) failure duration as
      // a time — mark it -1 so the consumer can't mistake it for fast
      name -> times.minOption.getOrElse(-1.0)
    }
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val failed = results.filter(_._2 < 0).map(r => "\"" + r._1 + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir","runs_per_query":$runs,"agg":"min"}"""
    println(json)
    // stdout from an sbt runMain is interleaved with [info]/log noise, which
    // broke the driver's parse in round 1 — also land the line in a file the
    // driver (or anyone) can read back verbatim
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    java.nio.file.Files.writeString(java.nio.file.Path.of(out), json + "\n")
    spark.stop()
  }
}
