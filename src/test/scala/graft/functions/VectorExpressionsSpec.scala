package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class VectorExpressionsSpec extends AnyFunSuite with SparkSpec {

  test("quantizedDot equals the composed built-in form") {
    import spark.implicits._
    val df = Seq(
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),
      (Array(-7L, 0L, 9L), Array(2L, 11L, -3L)),
      (Array.empty[Long], Array.empty[Long])
    ).toDF("a", "b")
    val out = df.select(
      VectorExpressions.quantizedDot($"a", $"b").as("fused"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L), (s, x) => s + x).as("composed"))
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(out(0).getLong(0) == 32L)
  }

  test("null input yields null (null-intolerant)") {
    import spark.implicits._
    val df = Seq((Some(Array(1L, 2L)), Option.empty[Array[Long]])).toDF("a", "b")
    val r = df.select(VectorExpressions.quantizedDot($"a", $"b")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("participates in whole-stage codegen") {
    import spark.implicits._
    // range → project keeps the whole plan in one codegen stage; a
    // LocalTableScan would never codegen regardless of the expression
    val df = spark.range(100)
      .select(array($"id", $"id" * 2).as("a"), array($"id" + 1, $"id").as("b"))
      .select(VectorExpressions.quantizedDot($"a", $"b").as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [quantized_dot"))
    assert(df.agg(sum($"d")).collect()(0).getLong(0) ==
      (0L until 100L).map(i => i * (i + 1) + 2 * i * i).sum)
  }

  test("mismatched lengths use the shorter prefix") {
    import spark.implicits._
    val df = Seq((Array(1L, 2L, 3L), Array(10L))).toDF("a", "b")
    assert(df.select(VectorExpressions.quantizedDot($"a", $"b"))
      .collect()(0).getLong(0) == 10L)
  }

  test("null element nulls the product, matching aggregate-zip_with") {
    import spark.implicits._
    val df = Seq((Seq(Some(1L), None, Some(3L)), Seq(Some(4L), Some(5L), Some(6L))))
      .toDF("a", "b")
    val out = df.select(
      VectorExpressions.quantizedDot($"a", $"b").as("fused"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L), (s, x) => s + x).as("composed"))
      .collect()(0)
    assert(out.isNullAt(0) && out.isNullAt(1))
  }
}
