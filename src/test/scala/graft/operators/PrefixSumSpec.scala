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

  private def naiveBy(rows: Seq[(String, Long, Long)]): Seq[(String, Long, Long)] =
    rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      var acc = 0L
      rs.sortBy(_._2).map { case (_, k, v) => acc += v; (g, k, acc) }
    }.sortBy(t => (t._1, t._2))

  private def distributedBy(rows: Seq[(String, Long, Long)], parts: Int): Seq[(String, Long, Long)] = {
    import spark.implicits._
    PrefixSum.runningTotalBy(rows.toDF("g", "k", "v").repartition(parts),
        "g", Seq("k"), "v", "run")
      .select($"g", $"k", $"run")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(t => (t._1, t._2))
  }

  test("grouped: matches the per-group window whatever the partitioning; groups independent") {
    val rows = Seq(("a", 5L, 10L), ("b", 1L, 1L), ("a", 9L, 100L), ("c", 3L, 7L),
      ("b", 7L, 0L), ("a", 2L, 2L), ("c", 1L, -4L))
    for (p <- Seq(1, 3, 8))
      assert(distributedBy(rows, p) == naiveBy(rows), s"parts=$p")
    // one skewed group spanning every partition plus singletons
    val skew = (1L to 400L).map(i => ("big", i, i % 7)) ++
      Seq(("s1", 1L, 5L), ("s2", 1L, 6L))
    assert(distributedBy(skew, 8) == naiveBy(skew))
    assert(distributedBy(Seq.empty, 2) == Seq.empty)
  }

  test("grouped: NULL group values are one group and keep their running totals") {
    import spark.implicits._
    // a plain equi-join on the group column would silently DROP every
    // null-group row (null keys never match); the null-safe join keeps
    // them, running-totaled as one group like groupBy/window treat them
    val rows = Seq((Some("a"), 1L, 10L), (None, 1L, 1L), (None, 3L, 2L),
      (Some("a"), 2L, 5L), (None, 2L, 4L))
    val out = PrefixSum.runningTotalBy(
        rows.toDF("g", "k", "v").repartition(3), "g", Seq("k"), "v", "run")
      .select($"g", $"k", $"run")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(t => (t._1.getOrElse(""), t._2))
    assert(out == Seq(
      (None, 1L, 1L), (None, 2L, 5L), (None, 3L, 7L),
      (Some("a"), 1L, 10L), (Some("a"), 2L, 15L)))
  }

  test("grouped: a big group spans partitions instead of sorting in one task") {
    import spark.implicits._
    // 2000 rows, ONE group: the naive PARTITION BY g window would put all
    // detail rows in a single task; the two-level scan must keep the
    // detail stage range-partitioned with only (pid, group) summaries in
    // any single-partition funnel.
    val df = PrefixSum.runningTotalBy(
      (1L to 2000L).map(i => ("g", i, 1L)).toDF("g", "k", "v").repartition(8),
      "g", Seq("k"), "v", "run")
    df.collect()
    val singleParts = PlanInspect.shuffles(df).filter(_.outputPartitioning.numPartitions == 1)
    singleParts.foreach { s =>
      val payload = s.child.output.map(_.name).toSet
      assert(!payload.contains("v") && !payload.contains("k"),
        s"detail rows funneled to one partition: $payload")
    }
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
