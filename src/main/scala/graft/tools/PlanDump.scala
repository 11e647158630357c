package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for named catalog queries to files —
  * the r18 optimization round's before/after plan evidence
  * (`plans/r18/<name>_<suffix>.txt`).
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>
  *
  * The session mirrors Bench's (same master/shuffle-partition config via
  * SPARK_GRAFT_CPUS) so the dumped plans are the plans the bench times.
  * Queries whose body runs driver-side training loops (vs16/vs21) execute
  * those during construction; the dumped plan is the final output plan,
  * which still contains the corpus-side encode/rollup subtrees.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>")
    val Array(sfDir, outDir, suffix, namesArg) = args
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
    java.nio.file.Files.createDirectories(java.nio.file.Path.of(outDir))
    val names = namesArg.split(",").toSeq
    for (name <- names) {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(outDir, s"${name}_$suffix.txt"), txt)
      println(s"[plandump] wrote $name ($suffix)")
    }
    spark.stop()
  }
}
