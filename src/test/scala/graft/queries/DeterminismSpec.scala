package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Every catalog query must return value-identical, order-identical
  * results regardless of physical parallelism — shuffle-partition count
  * is the knob most likely to expose a nondeterministic ordering or an
  * FP-accumulation-order dependency, and either would silently fail the
  * driver's hash compare. */
class DeterminismSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("all catalog queries are stable across shuffle-partition counts") {
    val diffs = Catalog.all.flatMap { q =>
      def runWith(parts: String): Seq[String] = {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try q.fn(spark, sf).collect().map(_.toString).toSeq
        finally spark.conf.set("spark.sql.shuffle.partitions", "4")
      }
      val a = runWith("4")
      val b = runWith("7")
      if (a == b) None
      else Some(s"${q.name}: ${a.size} vs ${b.size} rows, first diff at " +
        a.zip(b).indexWhere { case (x, y) => x != y })
    }
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }
}
