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

  test("shard write: one dir+file per shard, in-file ord order, deterministic under input reshuffle, no global sort") {
    val assign = graft.queries.Catalog.byName("pp08_shard_shuffle")
      .fn(spark, "/root/testdata/sf0.001")
    val base = Files.createTempDirectory("layout").toString
    Layout.writeShards(assign, s"$base/a", "shard", Seq("ord", "doc_id"))
    // same rows arriving in a different physical layout must produce
    // byte-identical shard contents — the whole point of an RNG-free
    // deterministic shuffle
    Layout.writeShards(assign.repartition(7), s"$base/b", "shard", Seq("ord", "doc_id"))
    val back = spark.read.parquet(s"$base/a")
    assert(back.count() == assign.count())
    assert(back.select("shard").distinct().count() == 8)
    def fileOf(p: String, k: Int): String = {
      val fs = new java.io.File(s"$p/shard=$k").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      // all of a shard's rows hash to ONE task, so each dir holds the
      // one file that task wrote
      assert(fs.length == 1, s"expected one file for shard $k, got ${fs.length}")
      fs.head.getPath
    }
    for (k <- 0 until 8) {
      val a = spark.read.parquet(fileOf(s"$base/a", k)).select("ord", "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val b = spark.read.parquet(fileOf(s"$base/b", k)).select("ord", "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(a.nonEmpty && a == b, s"shard $k differs across input layouts")
      assert(a == a.sorted, s"shard $k rows not in (ord, doc_id) order")
    }
    // plan shape: the writer's input is one shard-keyed hash exchange +
    // per-partition sorts — no global (range-exchange) sort anywhere
    val planned = assign.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"), col("doc_id"))
    val sorts = PlanInspect.nodes(planned)
      .collect { case s: org.apache.spark.sql.execution.SortExec => s }
    assert(sorts.nonEmpty && sorts.forall(!_.global), "found a global sort")
  }
}
