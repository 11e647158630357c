package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries frequent-items summary (Misra & Gries 1982; merge rule
  * from Agarwal et al., "Mergeable summaries", PODS 2012) — the
  * ONE-PASS bounded-memory counterpart of the CMS two-pass heavy-hitter
  * prune: k counters, deterministic guarantee, no second corpus scan to
  * build the candidate set.
  *
  * The summary: at most k (item, count) counters. Seeing item x: if
  * counted, increment; else if a counter is free, start one at 1; else
  * decrement EVERY counter by 1 (dropping zeros) — x itself is absorbed
  * by the decrement. Each decrement event removes k+1 total count mass
  * and mass added is n, so decrements cost amortized O(1)/row, and
  * every surviving count undercounts its item by at most n/(k+1):
  *
  *   true − n/(k+1)  ≤  mg_count  ≤  true
  *
  * so ANY item with true frequency > n/(k+1) is still in the summary —
  * the superset guarantee a candidate prune needs. The merge (add
  * matching counters; if over k, subtract the (k+1)-th largest count
  * from all and drop non-positive) PRESERVES that bound under arbitrary
  * merge trees, which is what makes the summary safe under Spark's
  * partial-aggregate combine: the map side reduces each partition to
  * ≤ k counters before the exchange, so the shuffle carries
  * O(maps × k) counters — never the item vocabulary — exactly
  * [[KmvSketch]]'s scale contract, for frequency instead of
  * cardinality.
  *
  * The counts themselves are partitioning-DEPENDENT (how much each
  * survivor was decremented depends on arrival order and merge shape) —
  * only the bound is invariant. That is why [[graft.queries]]' ta22
  * gate never outputs mg counts: the summary is the PRUNER, and the
  * result is the exact rollup over its candidates, deterministic and
  * oracle-equal to the plain rollup by the superset guarantee.
  */
object MisraGries {

  /** ≤ k live counters; counts are POSITIVE. */
  final case class MgBuf(m: Map[String, Long])

  final class MgAgg(k: Int) extends Aggregator[String, MgBuf, MgBuf] {
    override def zero: MgBuf = MgBuf(Map.empty)

    override def reduce(b: MgBuf, x: String): MgBuf = b.m.get(x) match {
      case Some(c) => MgBuf(b.m.updated(x, c + 1L))
      case None if b.m.size < k => MgBuf(b.m.updated(x, 1L))
      // full + unseen: decrement all (x absorbed) — amortized O(1),
      // each event burns k+1 of the n total mass
      case None => MgBuf(b.m.collect { case (y, c) if c > 1L => (y, c - 1L) })
    }

    override def merge(b1: MgBuf, b2: MgBuf): MgBuf = {
      val added = b2.m.foldLeft(b1.m) { case (acc, (x, c)) =>
        acc.updated(x, acc.getOrElse(x, 0L) + c)
      }
      if (added.size <= k) MgBuf(added)
      else {
        // subtract the (k+1)-th largest count from every counter: at
        // most k survive, and no count drops by more than the mass a
        // sequential MG over the concatenated streams could have shed
        val kth = added.valuesIterator.toArray.sortBy(-_).apply(k)
        MgBuf(added.collect { case (x, c) if c > kth => (x, c - kth) })
      }
    }

    override def finish(b: MgBuf): MgBuf = b
    override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    override def outputEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  }

  /** The whole-frame summary of `item` (must be non-null): ≤ k rows of
    * (item, mg_count), mg_count ∈ [true − n/(k+1), true]. One job, one
    * ObjectHashAggregate, shuffle = O(maps × k) counters. */
  def summary(df: DataFrame, item: Column, k: Int): DataFrame = {
    require(k > 1, s"Misra-Gries needs k > 1, got $k")
    val fn = udaf(new MgAgg(k), Encoders.STRING)
    df.agg(fn(item).as("mg"))
      .select(explode(col("mg.m")).as(Seq("item", "mg_count")))
  }

  /** [[summary]] UNEXPLODED, plus the exact stream length computed in
    * the SAME aggregation — one row of (total, mg map). The support
    * threshold of a heavy-hitter prune needs the exact total, and
    * riding it on the summary's ObjectHashAggregate means the rescan
    * path ([[graft.queries.TextOps.mgHeavyHitters]]) never pays a
    * separate corpus pass for it. */
  def summaryWithTotal(df: DataFrame, item: Column, k: Int): DataFrame = {
    require(k > 1, s"Misra-Gries needs k > 1, got $k")
    val fn = udaf(new MgAgg(k), Encoders.STRING)
    df.agg(count(lit(1)).as("total"), fn(item).as("mg"))
  }
}
