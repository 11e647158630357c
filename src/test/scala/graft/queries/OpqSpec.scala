package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** vs21/vs22's OPQ dimension reallocation, pinned independently of the
  * oracle: the learned permutation must be a bijection that BALANCES
  * variance round-robin (subspace s receives exactly the dimensions of
  * variance ranks {s, s+8, ..., s+56} — one per octile), the permute
  * must be a pure row-local projection (no exchange in its plan), and
  * the permuted training must actually CHANGE the trained books on the
  * fixture corpus (non-vacuity — an identity permutation would make the
  * gates restatements of vs16/vs17). */
class OpqSpec extends AnyFunSuite with SparkSpec {
  import org.apache.spark.sql.functions._

  private val sfDir = "/root/testdata/sf0.001"

  private def normedQ() = {
    import spark.implicits._
    graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", graft.operators.Ann.quantize($"embedding").as("q"))
      .withColumn("nrm", sqrt(graft.operators.Ann.dotQ($"q", $"q").cast("double")))
      .filter($"nrm" > 0.0)
      .select($"vec_id", $"q")
      .localCheckpoint(true)
  }

  test("perm is a bijection; each subspace gets one dimension per variance octile; placement matches the rank rule") {
    val e = normedQ()
    val perm = VectorOps.opqPerm(e)
    assert(perm.length == 64)
    assert(perm.sorted == (0 until 64), "not a bijection over dims")

    // recompute the variance ranking independently (exact integer math
    // on driver-collected vectors) and check the round-robin placement
    val vecs = e.collect().map(_.getSeq[Long](1))
    val n = BigInt(vecs.length)
    val varkey = (0 until 64).map { d =>
      val s1 = vecs.map(v => BigInt(v(d))).sum
      val s2 = vecs.map(v => BigInt(v(d)) * BigInt(v(d))).sum
      d -> (n * s2 - s1 * s1)
    }
    val rankOf = varkey.sortBy { case (d, vk) => (-vk, BigInt(d)) }
      .zipWithIndex.map { case ((d, _), r) => d -> r }.toMap
    (0 until 64).foreach { p =>
      val r = rankOf(perm(p))
      assert((r % 8) * 8 + r / 8 == p,
        s"dim ${perm(p)} (rank $r) placed at $p, want ${(r % 8) * 8 + r / 8}")
    }
    // balanced: subspace s holds ranks {s, s+8, ..., s+56}
    (0 until 8).foreach { sp =>
      val ranks = (0 until 8).map(slot => rankOf(perm(sp * 8 + slot))).sorted
      assert(ranks == (0 until 8).map(_ * 8 + sp),
        s"subspace $sp ranks $ranks not one-per-octile")
    }
  }

  test("permute is row-local (no exchange) and a pure reindex: q'[p] == q[perm(p)]") {
    val e = normedQ()
    val perm = VectorOps.opqPerm(e)
    val pe = VectorOps.opqPermute(e, perm)
    val plan = pe.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"permute shuffled:\n$plan")
    val byId = e.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    pe.collect().foreach { r =>
      val got = r.getSeq[Long](1)
      val src = byId(r.getLong(0))
      (0 until 64).foreach { p =>
        assert(got(p) == src(perm(p)), s"vec ${r.getLong(0)} pos $p") }
    }
  }

  test("non-vacuity: the permuted gates differ from their raw-layout twins on the fixture corpus") {
    def rows(name: String) = Catalog.byName(name).fn(spark, sfDir)
      .collect().map(_.toSeq.toList).toList
    assert(rows("vs21_opq_train") != rows("vs16_pq_train"),
      "vs21 == vs16 — the permutation is vacuous on this corpus")
    assert(rows("vs22_opq_search") != rows("vs17_pq_trained_search"),
      "vs22 == vs17 — the permutation changed nothing a query can see")
  }
}
