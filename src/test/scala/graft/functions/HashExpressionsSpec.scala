package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class HashExpressionsSpec extends AnyFunSuite with SparkSpec {

  test("md5Fold32 equals the composed conv(substring(md5)) form") {
    import spark.implicits._
    val df = (Seq("", "a", "0:the fast key", "3:smörgåsbord", "x" * 500) ++
      (0 until 100).map(i => s"doc-$i")).toDF("s")
    val out = df.select(
      HashExpressions.md5Fold32($"s").as("fused"),
      conv(substring(md5($"s"), 1, 8), 16, 10).cast("long").as("composed"))
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("null input yields null; range is [0, 2^32)") {
    import spark.implicits._
    val r = Seq(Option.empty[String]).toDF("s")
      .select(HashExpressions.md5Fold32($"s")).collect()(0)
    assert(r.isNullAt(0))
    val vals = (0 until 1000).map(i => s"k$i").toDF("s")
      .select(HashExpressions.md5Fold32($"s")).collect().map(_.getLong(0))
    assert(vals.forall(v => v >= 0L && v < (1L << 32)))
  }

  test("participates in whole-stage codegen and in SQL via extensions") {
    import spark.implicits._
    val df = spark.range(100).select(concat(lit("k"), $"id").as("s"))
      .select(HashExpressions.md5Fold32($"s").as("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)

    graft.GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT md5_fold32('0:the fast key') AS h").collect()(0).getLong(0)
    val viaCol = Seq("0:the fast key").toDF("s")
      .select(HashExpressions.md5Fold32($"s")).collect()(0).getLong(0)
    assert(viaSql == viaCol)
  }
}
