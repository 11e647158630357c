package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q46's gap-fill semantics, recomputed from first principles — and a
  * guard that the gate's grid actually CONTAINS gaps at the oracle
  * scale (an all-full grid would leave the LOCF path green but
  * unexercised). */
class GapfillSpec extends AnyFunSuite with SparkSpec {

  test("q46: full dense grid; gaps exist; empty bins carry the last observed sum; leading gaps stay null") {
    val out = Catalog.byName("q46_gapfill_locf").fn(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    // dense: every type has exactly the 2880-bin grid
    val byType = out.groupBy(_._1)
    byType.foreach { case (t, rows) =>
      assert(rows.length == 2880, s"$t grid not dense: ${rows.length}")
      assert(rows.map(_._2).distinct.length == 2880, s"$t duplicate bins")
    }
    val gaps = out.count(_._3 == 0L)
    assert(gaps > 0, "no empty bins at sf0.001 — the LOCF path is unexercised")
    // LOCF recomputed: walking each type's bins in order, filled_sum is
    // the last non-null bin_sum; null before the first observation
    byType.foreach { case (t, rows) =>
      var carry: Option[Double] = None
      rows.sortBy(_._2).foreach { case (_, bin, n, bs, fs) =>
        if (n > 0L) {
          assert(bs.nonEmpty, s"$t bin $bin has events but null sum")
          carry = bs
        } else assert(bs.isEmpty, s"$t bin $bin empty but has a sum")
        assert(fs == carry, s"$t bin $bin filled_sum $fs != carry $carry")
      }
    }
  }
}
