package graft.operators

import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TopKSpec extends AnyFunSuite with SparkSpec {

  private def windowTopK(rows: Seq[(Long, Double, Long)], k: Int): Set[(Long, Int, Double, Long)] = {
    import spark.implicits._
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    rows.toDF("g", "v", "id")
      .withColumn("rank", row_number().over(w)).filter($"rank" <= k)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getDouble(1), r.getLong(2))).toSet
  }

  private def aggTopK(rows: Seq[(Long, Double, Long)], k: Int, parts: Int = 4): Set[(Long, Int, Double, Long)] = {
    import spark.implicits._
    GroupedTopK.topK(rows.toDF("g", "v", "id").repartition(parts), "g", "v", "id", k)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
  }

  test("matches the window form: ties, short groups, k=1") {
    // group 1: ties on v (ranked by id), more rows than k
    // group 2: fewer rows than k
    // group 3: single row
    val rows = Seq(
      (1L, 5.0, 10L), (1L, 5.0, 9L), (1L, 7.0, 11L), (1L, 1.0, 1L),
      (2L, 3.0, 20L), (2L, 4.0, 21L),
      (3L, 2.0, 30L))
    for (k <- Seq(1, 2, 3, 5))
      assert(aggTopK(rows, k) == windowTopK(rows, k), s"k=$k")
  }

  test("merge path: many partitions, every partition holding a full buffer") {
    // 64 rows in one group across 8 partitions: each map-side partial
    // buffer fills to k, the reduce-side merge must interleave correctly
    val rows = (1L to 64L).map(i => (1L, (i % 16).toDouble, i))
    assert(aggTopK(rows, 5, parts = 8) == windowTopK(rows, 5))
  }

  test("plan: partial ObjectHashAggregate, no window, no full-table sort") {
    import spark.implicits._
    val df = GroupedTopK.topK(
      (1L to 1000L).map(i => (i % 50, i.toDouble, i)).toDF("g", "v", "id")
        .repartition(4),
      "g", "v", "id", 3)
    df.collect() // finalize AQE before inspecting
    val nodes = PlanInspect.nodes(df)
    val aggs = nodes.collect { case a: ObjectHashAggregateExec => a }
    // one partial (map-side, combining to <= k per group pre-shuffle) and
    // one final aggregate — the contract that keeps the exchange bounded
    assert(aggs.size >= 2, s"expected partial+final ObjectHashAggregate, got ${aggs.size}")
    assert(!nodes.exists(_.isInstanceOf[WindowExec]),
      "grouped top-k must not fall back to a window")
  }

  test("NaN scores: buffer order survives, NaN ranks first like the window's desc sort") {
    // a NaN mid-stream must not corrupt the sorted-buffer invariant (raw
    // double comparisons are all-false for NaN); Double.compare puts NaN
    // largest, matching row_number().over(v.desc)
    val rows = Seq(
      (1L, Double.NaN, 2L), (1L, 5.0, 10L), (1L, 9.0, 11L), (1L, 3.0, 12L),
      (1L, 7.0, 13L))
    // NaN != NaN under tuple equality — compare on (g, rank, id) and
    // check the score slot NaN-safely
    def keyed(s: Set[(Long, Int, Double, Long)]) = s.map(t => (t._1, t._2, t._4))
    val got = aggTopK(rows, 3)
    assert(keyed(got) == keyed(windowTopK(rows, 3)))
    val ranked = got.toSeq.sortBy(_._2)
    assert(ranked.head._4 == 2L && ranked.head._3.isNaN)
    assert(ranked.map(_._4) == Seq(2L, 11L, 13L))
  }

  test("topKCarry: payload rides with its row, ordering unaffected") {
    import spark.implicits._
    val rows = Seq((1L, 5.0, 10L, 100L), (1L, 7.0, 11L, 111L), (1L, 6.0, 12L, 122L))
      .toDF("g", "v", "id", "p").repartition(3)
    val got = GroupedTopK.topKCarry(rows, "g", "v", "id", "p", 2)
      .collect().map(r => (r.getInt(1), r.getLong(3), r.getLong(4))).toSet
    assert(got == Set((1, 11L, 111L), (2, 12L, 122L)))
  }

  test("rejects non-positive k") {
    import spark.implicits._
    val df = Seq((1L, 1.0, 1L)).toDF("g", "v", "id")
    intercept[IllegalArgumentException](GroupedTopK.topK(df, "g", "v", "id", 0))
  }

  test("topKStr: matches the window form with lexicographic tie-break; merge path; no window in the plan") {
    import spark.implicits._
    // ties on v resolved by STRING order (bb < z lexicographically even
    // though z is shorter) — the property a hash surrogate would break
    val rows = Seq(
      (1L, 5.0, "z"), (1L, 5.0, "bb"), (1L, 7.0, "mid"), (1L, 1.0, "a"),
      (2L, 3.0, "only"), (2L, 4.0, "two"),
      (3L, 2.0, "one"))
    def windowForm(k: Int) = {
      val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
      rows.toDF("g", "v", "id")
        .withColumn("rank", row_number().over(w)).filter($"rank" <= k)
        .collect().map(r => (r.getLong(0), r.getInt(3), r.getDouble(1), r.getString(2))).toSet
    }
    def aggForm(k: Int, parts: Int = 4) =
      GroupedTopK.topKStr(rows.toDF("g", "v", "id").repartition(parts), "g", "v", "id", k)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3))).toSet
    for (k <- Seq(1, 2, 3, 5)) assert(aggForm(k) == windowForm(k), s"k=$k")
    // merge path: full buffers on every partition
    val many = (1L to 64L).map(i => (1L, (i % 16).toDouble, f"t$i%03d"))
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    val expect = many.toDF("g", "v", "id")
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
      .collect().map(r => (r.getInt(3), r.getString(2))).toSet
    val got = GroupedTopK.topKStr(many.toDF("g", "v", "id").repartition(8), "g", "v", "id", 5)
    assert(got.collect().map(r => (r.getInt(1), r.getString(3))).toSet == expect)
    assert(!PlanInspect.nodes(got).exists(_.isInstanceOf[WindowExec]),
      "string top-k must not fall back to a window")
  }
}
