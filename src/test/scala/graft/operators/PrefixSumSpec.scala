package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class PrefixSumSpec extends AnyFunSuite with SparkSpec {

  private def naive(rows: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    var acc = 0L
    rows.sortBy(_._1).map { case (k, v) => acc += v; (k, acc) }
  }

  private def distributed(rows: Seq[(Long, Long)], parts: Int): Seq[(Long, Long)] = {
    import spark.implicits._
    PrefixSum.runningTotal(rows.toDF("k", "v").repartition(parts), "k", "v", "run")
      .select($"k", $"run").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.sortBy(_._1)
  }

  test("matches the single-partition window on unordered multi-partition input") {
    val rows = Seq((5L, 10L), (1L, 1L), (9L, 100L), (3L, 7L), (7L, 0L), (2L, 2L))
    for (p <- Seq(1, 3, 8))
      assert(distributed(rows, p) == naive(rows), s"parts=$p")
  }

  test("identical totals whatever the input partitioning, at width beyond task count") {
    val rows = (1L to 500L).map(i => (i, i % 17))
    val expect = naive(rows)
    assert(distributed(rows, 1) == expect)
    assert(distributed(rows, 13) == expect)
  }

  test("sparse/negative values and empty input") {
    val rows = Seq((10L, -5L), (20L, 3L), (30L, -1L))
    assert(distributed(rows, 2) == naive(rows))
    assert(distributed(Seq.empty, 2) == Seq.empty)
  }

  test("no full-data single-partition exchange: only per-partition totals funnel") {
    import spark.implicits._
    val df = PrefixSum.runningTotal(
      (1L to 2000L).map(i => (i, 1L)).toDF("k", "v").repartition(8), "k", "v", "run")
    df.collect()
    // the detail-side window partitions by __pid — a partition-less window
    // over the DATA would plan a SinglePartition shuffle of every row. The
    // only single-partition funnel allowed is the offsets branch, whose
    // input is the one-row-per-partition aggregate.
    val singleParts = PlanInspect.shuffles(df).filter(_.outputPartitioning.numPartitions == 1)
    singleParts.foreach { s =>
      val payload = s.child.output.map(_.name).toSet
      assert(payload.contains("__psum") || payload.contains("__pid"),
        s"full-data single-partition exchange: $payload")
      assert(!payload.contains("v") && !payload.contains("k"),
        s"detail rows funneled to one partition: $payload")
    }
  }
}
