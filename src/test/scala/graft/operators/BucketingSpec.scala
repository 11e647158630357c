package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Proves the 100 TB join story at the plan level: co-bucketed tables
  * join with zero shuffle Exchange; the same join over plain parquet
  * shuffles both sides. */
class BucketingSpec extends AnyFunSuite with SparkSpec {

  test("co-bucketed join plans without any shuffle exchange") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    // DROP only clears the per-JVM in-memory catalog; the warehouse dirs
    // survive across test JVMs and would fail LOCATION_ALREADY_EXISTS
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    for (t <- Seq("b_orders", "b_lineitem")) {
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    Bucketing.writeBucketed(orders.withColumnRenamed("o_orderkey", "k"),
      "b_orders", 8, Seq("k"))
    Bucketing.writeBucketed(lineitem.withColumnRenamed("l_orderkey", "k"),
      "b_lineitem", 8, Seq("k"))

    val bucketed = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"))
    // the join itself must be exchange-free (the final groupBy on the same
    // key also reuses the bucket partitioning - zero shuffles end to end)
    assert(!Bucketing.hasShuffle(bucketed), bucketed.queryExecution.executedPlan.toString)

    val plain = orders.join(lineitem,
      orders("o_orderkey") === lineitem("l_orderkey"))
    assert(Bucketing.hasShuffle(plain) ||
      plain.queryExecution.executedPlan.toString.contains("Broadcast"))

    // and it computes the right thing
    val expect = lineitem.groupBy("l_orderkey").count().count()
    assert(bucketed.count() == expect)
  }
}
