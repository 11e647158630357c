package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values / bottom-k) distinct-count sketch — the
  * MERGEABLE cardinality estimator that is also integer-exact, so unlike
  * HLL it oracle-verifies bit for bit (the registers of Spark's
  * `approx_count_distinct` HLL++ are not replayable cross-engine; a
  * bottom-k set of md5 folds is).
  *
  * The estimator (Beyer et al., "On synopses for distinct value
  * estimation"; the theta-sketch family): hash every value uniformly
  * into [0, 2³²), keep the k SMALLEST DISTINCT hashes per group. If
  * fewer than k distinct hashes exist the sketch is unsaturated and IS
  * the exact count; otherwise the k-th minimum m estimates density and
  * D̂ = (k−1)·2³² / m, all in BIGINT arithmetic (standard error ≈ 1/√k).
  *
  * The scale contract mirrors [[GroupedTopK]]: `COUNT(DISTINCT x)`
  * shuffles every distinct value to its group's reducer — at 100 TB the
  * exchange is the distinct table itself. This aggregator keeps a
  * bounded sorted-set buffer (≤ k longs, duplicates dropped ON INSERT),
  * so the map side combines each partition to ≤ k values per group
  * before the exchange: the shuffle carries O(groups × k × maps)
  * bounded buffers, never the value stream — and sketches of disjoint
  * corpora MERGE (union, keep k smallest), which is what makes the
  * summary maintainable incrementally and aggregable across shards.
  */
object KmvSketch {

  /** Sorted ascending, distinct, length ≤ k. */
  final case class BufK(hs: Array[Long])

  final class MinKDistinctAgg(k: Int) extends Aggregator[Long, BufK, BufK] {
    override def zero: BufK = BufK(Array.empty)

    private def insert(b: BufK, h: Long): BufK = {
      val n = b.hs.length
      if (n == k && h >= b.hs(n - 1)) return b
      var pos = 0
      while (pos < n && b.hs(pos) < h) pos += 1
      if (pos < n && b.hs(pos) == h) return b // distinct: duplicates no-op
      val m = math.min(n + 1, k)
      val hs = new Array[Long](m)
      java.lang.System.arraycopy(b.hs, 0, hs, 0, pos)
      hs(pos) = h
      java.lang.System.arraycopy(b.hs, pos, hs, pos + 1, m - pos - 1)
      BufK(hs)
    }

    override def reduce(b: BufK, h: Long): BufK = insert(b, h)
    override def merge(b1: BufK, b2: BufK): BufK = {
      var acc = b1
      var i = 0
      while (i < b2.hs.length) { acc = insert(acc, b2.hs(i)); i += 1 }
      acc
    }
    override def finish(b: BufK): BufK = b
    override def bufferEncoder: Encoder[BufK] = Encoders.product[BufK]
    override def outputEncoder: Encoder[BufK] = Encoders.product[BufK]
  }

  /** Per-`group` bottom-k sketch of `hash` (a BIGINT uniform hash, e.g.
    * [[graft.functions.HashExpressions.md5Fold32]]). Output: (group,
    * hs: array<long> sorted ascending, ≤ k distinct, __kmv_k) — the
    * build-time k rides WITH the sketch (under a collision-proof name a
    * caller's own `k` column can't shadow) so [[estimated]] can reject a
    * mismatched k instead of silently mis-estimating (a larger k would
    * mark saturated sketches unsaturated and return the buffer size as
    * an exact count). */
  def sketch(df: DataFrame, group: String, hash: Column, k: Int): DataFrame = {
    require(k > 1, s"KMV needs k > 1, got $k")
    val fn = udaf(new MinKDistinctAgg(k), Encoders.scalaLong)
    df.groupBy(col(group)).agg(fn(hash.cast("long")).as("kmv"))
      .select(col(group), col("kmv.hs").as("hs"), lit(k).as("__kmv_k"))
  }

  /** Merge two sketch columns (sorted ascending, ≤ k): union, dedup,
    * keep the k smallest — EXACTLY the aggregator's merge, as a
    * row-local array expression. Sound under OVERLAPPING inputs (the
    * union dedups by hash), which is what makes per-shard /
    * per-batch sketches composable without coordination. Callers
    * coalesce a missing side to `array()` (full-outer merge). */
  def merged(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** The estimate columns over a [[sketch]] result: n_kept (buffer
    * fill), kth_min (the k-th minimum; the largest kept hash), and
    * est_distinct — exact when unsaturated, (k−1)·2³² / kth otherwise,
    * BIGINT end to end.
    *
    * k is VALIDATED, not trusted, with two SEPARATE failure modes so the
    * raise names the actual defect: (1) the frame carries [[sketch]]'s
    * `__kmv_k` column and it differs from the parameter — the message
    * prints the sketch's build k (the failure mode being a too-large k
    * reading a saturated buffer as an exact count); (2) size(hs) > k —
    * an overflowed buffer, reachable on [[merged]] frames (which carry
    * no build k) estimated with a too-small k, or on a corrupted
    * k-matching frame — the message prints the buffer size. */
  def estimated(sketched: DataFrame, k: Int): DataFrame = {
    val overflow = when(size(col("hs")) <= k, size(col("hs")).cast("long"))
      .otherwise(raise_error(concat(
        lit("KmvSketch.estimated: sketch buffer holds "),
        size(col("hs")).cast("string"),
        lit(s" hashes > k=$k — built or merged with a larger k"))))
    val guarded =
      if (sketched.columns.contains("__kmv_k"))
        when(col("__kmv_k") =!= lit(k), raise_error(concat(
          lit(s"KmvSketch.estimated: k=$k does not match the sketch's build k ("),
          col("__kmv_k").cast("string"), lit(")"))).cast("long"))
          .otherwise(overflow)
      else overflow
    sketched
      .withColumn("n_kept", guarded)
      .drop("__kmv_k")
      .withColumn("kth_min",
        when(col("n_kept") > 0, element_at(col("hs"), size(col("hs"))))
          .otherwise(lit(0L)))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept"))
          // integer `div`, not `/`: double division + cast could round
          // across the integer boundary the oracle's `//` floors to
          .otherwise(expr(s"${(k - 1L) * 4294967296L}L div greatest(kth_min, 1L)")))
      .drop("hs")
  }
}
