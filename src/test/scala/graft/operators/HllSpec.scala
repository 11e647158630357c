package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** HyperLogLog sketch: exact register derivation (rho at the bit
  * boundaries a double log would break on), partitioning invariance,
  * idempotent overlap-safe merge, the standard error bound at scale,
  * the linear-counting path for tiny sets, and the plan contract (one
  * combinable hash aggregate, registers — never values — on the wire). */
class HllSpec extends AnyFunSuite with SparkSpec {

  test("rho and register index are exact at the bit boundaries") {
    import spark.implicits._
    // (hash, expected j, expected rho): j = top 6 bits, rho = leading
    // zeros of the 26-bit remainder + 1; all-zero remainder -> 27
    val cases = Seq(
      (0L, 0L, 27), // zero remainder
      (1L, 0L, 26), // lowest bit set -> 25 leading zeros
      ((1L << 25), 0L, 1), // highest remainder bit -> no leading zeros
      ((1L << 25) - 1, 0L, 2), // 25 bits set -> one leading zero
      ((1L << 26) | 4L, 1L, 24), // j=1, remainder 100b -> bitlen 3
      ((63L << 26) | (1L << 13), 63L, 13),
      ((7L << 26), 7L, 27)) // j=7, zero remainder
    val got = cases.map(_._1).toDF("h")
      .select(HllSketch.regIndex($"h").as("j"), HllSketch.rho($"h").as("rho"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq == cases.map(c => (c._2, c._3)),
      "register index / rho drifted from the bit definition")
  }

  private def regMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap

  test("registers are partitioning-invariant and merge idempotently (overlap-safe)") {
    import spark.implicits._
    val vals = (1 to 5000).map(i => s"val$i")
    def regs(xs: Seq[String], parts: Int) = HllSketch.registers(
      xs.toDF("x").repartition(parts).withColumn("g", lit("g1")),
      "g", graft.queries.QueryUtils.hex8($"x"))
    val one = regMap(regs(vals, 1))
    assert(regMap(regs(scala.util.Random.shuffle(vals), 13)) == one,
      "registers changed under repartitioning")
    // overlapping halves: merge == registers of the union
    val (a, b) = (vals.take(3500), vals.drop(1500))
    assert(regMap(HllSketch.merged("g", regs(a, 3), regs(b, 5))) == one,
      "overlap-merge != registers of the union (max must be idempotent)")
    // self-merge is a no-op
    assert(regMap(HllSketch.merged("g", regs(vals, 2), regs(vals, 2))) == one,
      "self-merge changed the registers")
  }

  test("estimate error is within the HLL band at scale; linear counting handles tiny sets") {
    import spark.implicits._
    def est(n: Int, salt: String): Long = HllSketch.estimated(
      HllSketch.registers(
        (1 to n).map(i => s"$salt$i").toDF("x").withColumn("g", lit("g")),
        "g", graft.queries.QueryUtils.hex8($"x")),
      "g").collect()(0).getAs[Long]("est_distinct")
    // standard error 1.04/sqrt(64) = 13%; assert 3 sigma
    for ((n, salt) <- Seq((2000, "a"), (20000, "b"), (100000, "c"))) {
      val e = est(n, salt)
      assert(math.abs(e - n) <= 0.39 * n,
        s"estimate $e for $n distinct outside the 3-sigma band")
    }
    // tiny sets ride the linear-counting lookup: near-exact
    for (n <- Seq(1, 5, 40)) {
      val e = est(n, s"tiny$n-")
      assert(math.abs(e - n) <= math.max(2L, n / 10L),
        s"linear-counting estimate $e for $n distinct not near-exact")
    }
    // duplicates never move the estimate (registers are max-folds)
    val dup = HllSketch.estimated(
      HllSketch.registers(
        ((1 to 2000) ++ (1 to 2000)).map(i => s"a$i").toDF("x")
          .withColumn("g", lit("g")),
        "g", graft.queries.QueryUtils.hex8($"x")),
      "g").collect()(0).getAs[Long]("est_distinct")
    assert(dup == est(2000, "a"), "duplicate values moved the estimate")
  }

  test("plan: one combinable hash aggregate; values never cross the shuffle") {
    import spark.implicits._
    // repartition BEFORE deriving the value column, so the only exchange
    // that could carry values is the aggregate's own
    val df = HllSketch.registers(
      (1 to 5000).toDF("i").repartition(8)
        .select(lit("g").as("g"), concat(lit("v"), $"i").as("x")),
      "g", graft.queries.QueryUtils.hex8($"x"))
    df.collect()
    val ns = PlanInspect.nodes(df)
    assert(ns.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.aggregate.HashAggregateExec]),
      "register fold is not a hash aggregate")
    assert(!ns.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]))
    PlanInspect.shuffles(df).map(_.child.output.map(_.name).toSet).foreach(p =>
      assert(!p.contains("x"),
        s"value stream crossed the shuffle: $p (partial max must combine map-side)"))
  }

  test("ta23 gate estimates track the exact per-source distinct counts") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val got = graft.queries.Catalog.byName("ta23_hll_distinct")
      .fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("est_distinct")).toMap
    val exact = graft.Tables.documents(spark, sfDir)
      .select($"source", explode(graft.functions.Text.tokens($"text")).as("tok"))
      .groupBy($"source").agg(countDistinct($"tok").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == exact.keySet, "source sets differ")
    assert(got.nonEmpty, "no sources — vacuous")
    exact.foreach { case (src, n) =>
      assert(math.abs(got(src) - n) <= math.max(3L, (0.39 * n).toLong),
        s"source $src: estimate ${got(src)} vs exact $n outside 3 sigma")
    }
  }
}
