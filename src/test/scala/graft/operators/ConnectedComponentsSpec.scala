package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ConnectedComponentsSpec extends AnyFunSuite with SparkSpec {

  private def labelsOf(vs: Seq[Long], es: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val v = vs.toDF("id")
    val e = es.toDF("src", "dst")
    ConnectedComponents.labelPropagate(v, e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain + pair + isolated vertex resolve to min-id components") {
    // 1-2-3 chain, 4-5 pair, 6 isolated
    val m = labelsOf(1L to 6L, Seq((1L, 2L), (2L, 3L), (4L, 5L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("min floods a long chain to the far end (worst-case diameter)") {
    // 9-hop chain exercises multiple double-hop rounds
    val m = labelsOf(1L to 10L, (1L to 9L).map(i => (i, i + 1)))
    assert(m.values.toSet == Set(1L))
  }

  test("edge direction does not matter") {
    val a = labelsOf(1L to 4L, Seq((4L, 3L), (2L, 1L), (3L, 2L)))
    assert(a.values.toSet == Set(1L))
  }

  test("no edges: every vertex is its own component") {
    val m = labelsOf(1L to 4L, Seq.empty)
    assert(m == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }
}
