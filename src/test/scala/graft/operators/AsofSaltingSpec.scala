package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class AsofSaltingSpec extends AnyFunSuite with SparkSpec {

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("asof picks the latest right row at-or-before each left time") {
    import spark.implicits._
    val trades = Seq((1L, ts(10), "t1"), (1L, ts(25), "t2"), (2L, ts(5), "t3"))
      .toDF("k", "ts", "trade")
    val quotes = Seq((1L, ts(8), 100.0), (1L, ts(10), 101.0), (1L, ts(20), 102.0),
      (2L, ts(9), 50.0)).toDF("k", "ts", "px")
    val out = AsofJoin.asof(trades, quotes, Seq("k"), "ts")
      .select($"trade", $"px_asof").collect()
      .map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(out("t1").contains(101.0)) // equal-time quote matches
    assert(out("t2").contains(102.0))
    assert(out("t3").isEmpty) // quote at ts(9) is after trade at ts(5)
  }

  test("asof has one shuffle: single window exchange, no join") {
    import spark.implicits._
    val l = Seq((1L, ts(1), "a")).toDF("k", "ts", "v")
    val r = Seq((1L, ts(0), 1.0)).toDF("k", "ts", "p")
    val plan = AsofJoin.asof(l, r, Seq("k"), "ts").queryExecution.executedPlan.toString
    assert(!plan.contains("Join"))
    assert(plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1)
  }

  test("saltedAgg equals plain aggregation") {
    import spark.implicits._
    val df = spark.range(10000)
      .select(($"id" % 3).as("k"), $"id".as("v"))
    val plain = df.groupBy("k").agg(sum($"v").as("s"), count(lit(1)).as("n"))
      .orderBy("k").collect().map(_.toSeq)
    val salted = Salting.saltedAgg(df, Seq("k"), salts = 8,
      partialAggs = Seq(sum($"v").as("ps"), count(lit(1)).as("pn")),
      mergeAggs = Seq(sum($"ps").as("s"), sum($"pn").as("n")))
      .orderBy("k").collect().map(_.toSeq)
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedJoin equals plain join on skewed data") {
    import spark.implicits._
    // 90% of big rows share one hot key
    val big = spark.range(5000)
      .select(when($"id" % 10 === 0, $"id" % 5).otherwise(lit(99L)).as("k"), $"id".as("v"))
    val small = Seq((99L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"))
      .toDF("k", "name")
    val plain = big.join(small, Seq("k")).groupBy("name").count()
      .orderBy("name").collect().map(_.toSeq)
    val salted = Salting.saltedJoin(big, small, "k", salts = 8)
      .groupBy("name").count().orderBy("name").collect().map(_.toSeq)
    assert(salted.toSeq == plain.toSeq)
  }

  test("asof never stitches fields from different right rows (null payload)") {
    import spark.implicits._
    val left = Seq((1L, ts(30), "L")).toDF("k", "ts", "l")
    val right = Seq(
      (1L, ts(1), Some(1.0), Some(2.0)),
      (1L, ts(2), Option.empty[Double], Some(3.0))
    ).toDF("k", "ts", "a", "b")
    val r = AsofJoin.asof(left, right, Seq("k"), "ts").collect()(0)
    // the latest right row is (null, 3.0): the null must survive, not be
    // backfilled from the older row
    assert(r.isNullAt(r.fieldIndex("a_asof")))
    assert(r.getDouble(r.fieldIndex("b_asof")) == 3.0)
  }

  test("saltedJoin rejects join types it cannot compute correctly") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Salting.saltedJoin(a, a, "k", 4, joinType = "full")
    }
  }
}
