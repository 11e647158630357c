package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** sa05's rate computation, pinned independently of the oracle: the
  * per-source basis points must be the integer natural/uniform
  * interpolation of the measured counts, with the smallest source kept
  * whole — the property that makes it a FLATTENING (bigger sources are
  * never sampled at a higher rate than smaller ones). */
class SampleOpsSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("sa05: emitted bps == integer interpolation of measured counts; smallest source kept whole; rates anti-monotone in count") {
    val counts = graft.Tables.documents(spark, sfDir)
      .groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = counts.values.min
    def expectedBps(n: Long): Long =
      (50L * 10000L + 50L * ((10000L * nMin) / n)) / 100L
    val out = Catalog.byName("sa05_temperature_resample").fn(spark, sfDir)
      .select(col("source"), col("bps")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out.keySet == counts.keySet,
      "a source vanished from the sample entirely (rate floor is 50%)")
    out.foreach { case (src, b) =>
      assert(b == expectedBps(counts(src)), s"bps off for $src")
    }
    // smallest source(s) kept whole; rates never increase with count
    counts.filter(_._2 == nMin).keys.foreach(src => assert(out(src) == 10000L))
    val byCount = counts.toSeq.sortBy(_._2).map { case (s, _) => out(s) }
    assert(byCount == byCount.sorted.reverse, "rates not anti-monotone in count")
  }
}
