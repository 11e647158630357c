package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The HLL standing-state family (ta23/pp31's continuous twin): the
  * register table advanced by idempotent max — replays and overlaps
  * absorbed with NO dedup machinery — and forgotten by an O(survivors)
  * register rebuild (max does not invert; the honest non-additive
  * trade). Snapshot must equal ta23 over exactly the
  * arrived-and-not-forgotten docs at every step. */
class HllStateSpec extends AnyFunSuite with SparkSpec {

  test("hll maintainer: snapshot == ta23 over arrivals; replay absorbed; redelivery no-op; forget rebuilds over survivors; compaction; re-ingest blocked; idempotent") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val all = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"source", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    def df(b: Seq[(Long, String, String)]) =
      b.toDF("doc_id", "source", "text")
    def want(b: Seq[(Long, String, String)]) =
      graft.operators.HllSketch.estimated(
        graft.operators.HllSketch.registers(
          df(b).select($"source",
            explode(graft.functions.Text.tokens($"text")).as("tok")),
          "source", graft.queries.QueryUtils.hex8($"tok")),
        "source").orderBy($"source")
        .collect().map(_.toSeq.toList).toList

    val root = Files.createTempDirectory("hll-state").toString
    val (rT, docT) = (s"$root/regs", s"$root/docs")
    for (b <- Seq(all.take(150), all.drop(150)))
      Streams.maintainHllState(df(b), rT, docT)
    def got() = Streams.hllSnapshot(spark, rT).orderBy(col("source"))
      .collect().map(_.toSeq.toList).toList
    assert(got() == want(all), "maintained snapshot != ta23 over the arrivals")
    assert(got().nonEmpty, "no results — vacuous")

    // crash replay: the register rows land again; the max fold absorbs
    // them with no batch key and no dedup (idempotence IS the dedup)
    Streams.hllDelta(df(all.drop(150))).write.mode("append").parquet(rT)
    assert(got() == want(all), "replayed register rows moved the estimate")

    // redelivery of a whole already-seen batch is a no-op
    Streams.maintainHllState(df(all.take(150)), rT, docT)
    assert(got() == want(all), "redelivered batch moved the estimate")

    // compaction folds to <= 64 rows per source, snapshot-invariant
    Streams.compactHll(spark, rT)
    assert(got() == want(all), "compaction drifted")
    val perSource = spark.read.parquet(rT)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(perSource.forall(_ <= 64), "a source exceeds 64 register rows")

    // forget: registers rebuilt from the surviving stored texts
    val forgot = all.map(_._1).filter(_ % 6 == 0).toSet
    val fDf = forgot.toSeq.toDF("doc_id")
    Streams.forgetHllState(spark, fDf, rT, docT)
    val remaining = all.filterNot(t => forgot(t._1))
    assert(got() == want(remaining), "forget != ta23 over the survivors")

    // re-ingest of forgotten docs is a no-op (tombstoned ids block)
    Streams.maintainHllState(
      df(all.filter(t => forgot(t._1)).take(10)), rT, docT)
    assert(got() == want(remaining), "a forgotten doc re-entered the registers")

    // idempotent forget re-run (tombstoned text => same survivor set)
    Streams.forgetHllState(spark, fDf, rT, docT)
    assert(got() == want(remaining), "forget re-run diverged")

    // a never-seen forgotten id forward-blocks its future ingest
    val ghost = all.map(_._1).max + 1000
    Streams.forgetHllState(spark, Seq(ghost).toDF("doc_id"), rT, docT)
    Streams.maintainHllState(
      df(Seq((ghost, "src", "ghost text never counted"))), rT, docT)
    assert(got() == want(remaining), "a pre-forgotten id was ingested")
  }
}
