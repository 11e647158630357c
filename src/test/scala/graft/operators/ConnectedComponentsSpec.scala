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

  // ---- bipartite (item–bucket membership) variant

  private def bipartiteOf(ms: Seq[(Long, String)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.bipartite(ms.toDF("id", "bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("bipartite: shared bucket connects; multi-bucket chains flood the min") {
    // buckets: a={1,2}, b={2,3}, c={4,5}; 6 only in its own bucket d
    val m = bipartiteOf(Seq(1L -> "a", 2L -> "a", 2L -> "b", 3L -> "b",
      4L -> "c", 5L -> "c", 6L -> "d"))
    // 6 is in a single-member bucket — pruned from the iteration, absent
    // from the result (callers stitch isolates back with component = id)
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("bipartite: long bucket chain (worst-case diameter) floods to min") {
    // buckets b0..b9 chain items 1..11: pair-graph diameter 10
    val ms = (0 until 10).flatMap(i =>
      Seq((i + 1).toLong -> s"b$i", (i + 2).toLong -> s"b$i"))
    val m = bipartiteOf(ms)
    assert(m.keySet == (1L to 11L).toSet && m.values.toSet == Set(1L))
  }

  test("bipartite: duplicate memberships don't change the result") {
    val m = bipartiteOf(Seq(1L -> "a", 1L -> "a", 2L -> "a", 2L -> "a"))
    assert(m == Map(1L -> 1L, 2L -> 1L))
  }

  test("bipartite matches labelPropagate on the equivalent pair graph") {
    import spark.implicits._
    // pseudo-random membership table: 40 items, 12 buckets
    val ms = (0 until 80).map(i =>
      ((i * 7919 % 40).toLong, s"b${i * 104729 % 12}"))
    val items = ms.map(_._1).distinct
    val pairs = for {
      (a, ba) <- ms; (b, bb) <- ms
      if ba == bb && a < b
    } yield (a, b)
    val viaPairs = ConnectedComponents.labelPropagate(
        items.toDF("id"), pairs.distinct.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaBuckets = bipartiteOf(ms)
    // bipartite omits pruned isolates; every item it does label must agree
    assert(viaBuckets.nonEmpty)
    viaBuckets.foreach { case (id, comp) => assert(viaPairs(id) == comp) }
    // and items it omits must be isolated in the pair graph
    (items.toSet -- viaBuckets.keySet).foreach { id =>
      assert(viaPairs(id) == id)
    }
  }
}
