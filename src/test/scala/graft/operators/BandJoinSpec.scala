package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BandJoinSpec extends AnyFunSuite with SparkSpec {

  private def pairs(rows: Seq[(String, Long, Long)], band: Long): Set[(Long, Long)] = {
    import spark.implicits._
    val df = rows.toDF("k", "id", "v")
    BandJoin.selfBand(df, "k", "v", "id", band)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
  }

  test("bucket-adjacent pairs match regardless of id order") {
    // v=99 and v=101 sit in different buckets (band 10: 9 vs 10); the
    // higher value deliberately has the SMALLER id — the case a
    // probe-by-id formulation silently drops
    val got = pairs(Seq(("u", 2L, 99L), ("u", 1L, 101L)), 10L)
    assert(got == Set((2L, 1L))) // id1 is the band-earlier row
  }

  test("matches exactly the |v1-v2| <= band pairs, once each") {
    val rows = Seq(("u", 1L, 0L), ("u", 2L, 5L), ("u", 3L, 10L), ("u", 4L, 21L))
    // band 10: (1,2) d5, (1,3) d10, (2,3) d5, (3,4) d11 out, (2,4) d16 out
    assert(pairs(rows, 10L) == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("equal values pair once with id tiebreak; keys do not mix") {
    val rows = Seq(("a", 1L, 7L), ("a", 2L, 7L), ("b", 3L, 7L))
    assert(pairs(rows, 3L) == Set((1L, 2L)))
  }

  test("brute-force equivalence on a dense cluster spanning many buckets") {
    val rows = (1L to 40L).map(i => ("u", i, i * 3L))
    val expected = (for {
      i <- 1L to 40L; j <- (i + 1) to 40L
      if (j - i) * 3L <= 7L
    } yield (i, j)).toSet
    assert(pairs(rows, 7L) == expected)
  }

  test("buckets stay exact at 2^60 scale (nanosecond epochs) and for negatives") {
    // double division's ulp at 2^60 is 256 — a float bucket would misplace
    // rows near boundaries and silently drop pairs
    val base = 1L << 60
    val rows = (1L to 30L).map(i => ("u", i, base + i * 3L))
    val expected = (for {
      i <- 1L to 30L; j <- (i + 1) to 30L
      if (j - i) * 3L <= 7L
    } yield (i, j)).toSet
    assert(pairs(rows, 7L) == expected)
    // negative values floor (not truncate) into buckets
    assert(pairs(Seq(("u", 1L, -1500L), ("u", 2L, -800L)), 1000L) == Set((1L, 2L)))
    assert(pairs(Seq(("u", 1L, -2500L), ("u", 2L, -800L)), 1000L) == Set.empty)
  }

  test("salted selfBand: adversarial hot bucket — identical results, salt in the shuffle key") {
    import spark.implicits._
    // one user bursting 300 events inside a single band bucket (plus a few
    // spread rows and a second key): the exact distribution where the
    // unsalted join serializes Σ|bucket|² on one reducer
    val rows = (1L to 300L).map(i => ("hot", i, 10L + (i % 7))) ++
      Seq(("hot", 400L, 1013L), ("hot", 401L, 1028L), ("cold", 500L, 12L), ("cold", 501L, 19L))
    val df = rows.toDF("k", "id", "v")
    def run(salts: Int): Set[(Long, Long)] =
      BandJoin.selfBand(df, "k", "v", "id", 15L, salts)
        .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
    val unsalted = run(1)
    // sanity: the hot bucket really is quadratic (all 300 in-band pairs)
    assert(unsalted.count { case (a, b) => a <= 300 && b <= 300 } == 300 * 299 / 2)
    assert(run(8) == unsalted)
    assert(run(3) == unsalted) // salts not dividing the bucket size evenly
    // the salt must reach the join KEYS (typed probe, not plan-string
    // matching), spreading the (key, bucket) hash space
    val salted = BandJoin.selfBand(df, "k", "v", "id", 15L, salts = 8)
    val joinKeys = PlanInspect.equiJoinKeys(salted)
    assert(joinKeys.nonEmpty && joinKeys.forall(_.contains("__salt")))
  }
}
