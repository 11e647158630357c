package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-budget probe for the heaviest catalog gates — answers "WHERE
  * does the gate's wall time go?" by timing each plan component in
  * isolation (min of 3, noop-sink materialized, Bench's discipline), so
  * a round's optimization effort lands on the dominant stage instead of
  * guessing. COVERAGE.md records each probe's result table; currently
  * implemented: ta17 (reference-LM perplexity bucketing — the corpus
  * bigram rollup vs the reference derivation vs the scoring join vs the
  * distributed rank), plus the FUSED single-explode alternative the
  * round-11 judge suggested (is_ref carried on the rollup, reference
  * derived from the checkpointed rollup instead of a second pushed-
  * filter scan) so its cost can be compared instead of argued.
  *
  * Usage: `runMain graft.StageProbe [sfDir]` (default /root/testdata/sf0.1). */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    import graft.functions.Text

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      // JIT/codegen warm pass, then 3 measured runs, min + all printed
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
      }
      println(f"PROF $label min=${ts.min}%.2f runs=[${ts.map(t => f"$t%.2f").mkString(",")}]")
    }

    val docs = Tables.documents(spark, d)
    def mRoll = docs
      .select($"doc_id", $"source",
        explode(Text.wordNGrams(Text.tokens($"text"), 2)).as("bigram"))
      .groupBy($"doc_id", $"source", $"bigram").agg(count(lit(1)).as("m"))

    // S0: the full gate (rollup + ref + scoring + distributed rank)
    time("S0_full_ta17") {
      noop(graft.queries.Catalog.byName("ta17_ref_perplexity").fn(spark, d))
    }
    // S1: the corpus per-(doc, source, bigram) rollup alone
    time("S1_m_rollup") { noop(mRoll) }
    // S2: the reference derivation alone (pushed-filter slice re-explode)
    time("S2_ref_counts") { noop(graft.queries.TextOps.refLmCounts(docs)) }
    // S3: the scored frame, current shape (S1 + S2 + join + per-doc agg)
    time("S3_scored_current") {
      noop(graft.queries.TextOps.refSurprise(
        docs, graft.queries.TextOps.refLmCounts(docs)))
    }
    // S4: the FUSED alternative — ONE explode, is_ref carried, reference
    // derived from the checkpointed rollup (corpus-sized checkpoint: the
    // cost that rules it out at 100 TB unless it wins big here)
    time("S4_scored_fused") {
      val m = docs.select($"doc_id", $"source",
          ($"lang" === "en" && $"doc_id" < 100L).as("is_ref"),
          explode(Text.wordNGrams(Text.tokens($"text"), 2)).as("bigram"))
        .groupBy($"doc_id", $"source", $"is_ref", $"bigram")
        .agg(count(lit(1)).as("m"))
        .localCheckpoint(true)
      val ref = m.filter($"is_ref").groupBy($"bigram").agg(sum($"m").as("n"))
      val t = ref.agg(sum($"n").as("t"))
      noop(m.join(ref, Seq("bigram"), "left").crossJoin(broadcast(t))
        .groupBy($"doc_id", $"source")
        .agg(sum($"m" * expr("(10000 * t) div (coalesce(n, 0L) + 1)"))
          .as("score")))
    }
    spark.stop()
  }
}
