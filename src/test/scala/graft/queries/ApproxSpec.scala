package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Approximate aggregates (§2.4 "free" family): sketch algorithms differ
  * across engines so there is no hash oracle — the contract here is
  * bounded relative error against the exact answer. */
class ApproxSpec extends AnyFunSuite with SparkSpec {

  private lazy val events = graft.Tables.events(spark, "/root/testdata/sf0.01")

  test("approx_count_distinct within 5% of exact") {
    val exact = events.select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    val approx = events.select(approx_count_distinct(col("user_id"), 0.02))
      .collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx brackets the exact median") {
    val exact = events.select(expr("percentile(value, 0.5)")).collect()(0).getDouble(0)
    val approx = events.select(expr("percentile_approx(value, 0.5, 1000)"))
      .collect()(0).getDouble(0)
    val p40 = events.select(expr("percentile(value, 0.4)")).collect()(0).getDouble(0)
    val p60 = events.select(expr("percentile(value, 0.6)")).collect()(0).getDouble(0)
    assert(approx >= p40 && approx <= p60, s"approx=$approx exact=$exact")
  }
}
