package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Grouped top-k as a PARTIAL-AGGREGATING typed Aggregator — the scale
  * replacement for the `row_number().over(Window.partitionBy(g))` idiom.
  *
  * The window form shuffles EVERY detail row to its group's reducer and
  * sorts whole partitions before discarding all but k rows per group; at
  * 100 TB that is a full-table shuffle + sort to keep a sliver. This
  * aggregator keeps a bounded (k-element, sorted) buffer per group, so the
  * map side combines each partition down to ≤ k rows per group BEFORE the
  * exchange: the shuffle carries O(groups × k × maps) buffer rows, never
  * the detail table, and nothing is ever globally sorted. TopKSpec pins
  * both halves of that contract (ObjectHashAggregate with a partial pass,
  * no WindowExec) and exact parity with the window form.
  *
  * Results are fully deterministic: ordering is (value DESC, id ASC), so
  * ties break on the id just like the `ROW_NUMBER() OVER (ORDER BY v
  * DESC, id)` oracle.
  */
object GroupedTopK {

  /** One scored row entering the aggregate; `p` is an opaque payload that
    * rides along with its row (e.g. the neighbor's IVF cell in vs06) and
    * never participates in the ordering. */
  final case class In(v: Double, id: Long, p: Long)

  /** Sorted parallel arrays (v DESC, id ASC), length ≤ k — a flat,
    * Encoder-friendly buffer (primitive arrays serialize natively; a
    * kryo'd collection buffer would defeat ObjectHashAggregate's cheap
    * buffer spill). */
  final case class Buf(vs: Array[Double], ids: Array[Long], ps: Array[Long])

  final class TopKAgg(k: Int) extends Aggregator[In, Buf, Buf] {
    override def zero: Buf = Buf(Array.empty, Array.empty, Array.empty)

    // before(i, x): does buffer slot i rank strictly ahead of x?
    // java.lang.Double.compare, not raw >: raw comparisons are all-false
    // for NaN, which would corrupt the sorted-buffer invariant the O(k)
    // insert relies on. compare() is a total order with NaN largest —
    // matching Spark's own DESC sort order for NaN — so a NaN score ranks
    // first, exactly as the replaced row_number().over(desc) did. (Null
    // scores cannot reach here: the typed input encoder is primitive —
    // filter nulls upstream, as every catalog caller's nrm > 0 does.
    // Known deviation: compare() also orders +0.0 ahead of -0.0 where the
    // window form tie-breaks them by id — no catalog score can produce
    // -0.0, accepted for NaN totality.)
    private def before(b: Buf, i: Int, v: Double, id: Long): Boolean = {
      val c = java.lang.Double.compare(b.vs(i), v)
      c > 0 || (c == 0 && b.ids(i) < id)
    }

    // O(k) insert keeping the arrays sorted and bounded — k is small by
    // contract (a top-k over millions of groups, not a sort key)
    private def insert(b: Buf, v: Double, id: Long, p: Long): Buf = {
      val n = b.vs.length
      if (n == k && before(b, n - 1, v, id)) return b
      var pos = 0
      while (pos < n && before(b, pos, v, id)) pos += 1
      val m = math.min(n + 1, k)
      val vs = new Array[Double](m)
      val ids = new Array[Long](m)
      val ps = new Array[Long](m)
      java.lang.System.arraycopy(b.vs, 0, vs, 0, pos)
      java.lang.System.arraycopy(b.ids, 0, ids, 0, pos)
      java.lang.System.arraycopy(b.ps, 0, ps, 0, pos)
      vs(pos) = v; ids(pos) = id; ps(pos) = p
      java.lang.System.arraycopy(b.vs, pos, vs, pos + 1, m - pos - 1)
      java.lang.System.arraycopy(b.ids, pos, ids, pos + 1, m - pos - 1)
      java.lang.System.arraycopy(b.ps, pos, ps, pos + 1, m - pos - 1)
      Buf(vs, ids, ps)
    }

    override def reduce(b: Buf, a: In): Buf = insert(b, a.v, a.id, a.p)

    override def merge(b1: Buf, b2: Buf): Buf = {
      var acc = b1
      var i = 0
      while (i < b2.vs.length) { acc = insert(acc, b2.vs(i), b2.ids(i), b2.ps(i)); i += 1 }
      acc
    }

    override def finish(b: Buf): Buf = b
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  private def agg(df: DataFrame, group: String, value: String, id: String,
      payload: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val fn = udaf(new TopKAgg(k), Encoders.product[In])
    df.groupBy(col(group))
      .agg(fn(col(value).cast("double"), col(id).cast("long"),
        payload.cast("long")).as("top"))
  }

  /** Top `k` rows per `group`, ranked by (`value` DESC, `id` ASC).
    * Output: (group, rank starting at 1, v, id) — one row per kept
    * detail row, ≤ k per group. */
  def topK(df: DataFrame, group: String, value: String, id: String, k: Int): DataFrame =
    agg(df, group, value, id, lit(0L), k)
      // named struct through zip_with: arrays_zip field names depend on the
      // input expression shape, these don't
      .select(col(group), posexplode(zip_with(col("top.vs"), col("top.ids"),
        (v, i) => struct(v.as("v"), i.as("id")))))
      .select(col(group), (col("pos") + 1).cast("int").as("rank"),
        col("col.v").as("v"), col("col.id").as("id"))

  /** One scored row with a STRING id — the [[In]] variant for detail
    * rows keyed by text (tokens, terms), where the deterministic
    * tie-break must be the string itself (a hash surrogate would need
    * the oracle to replay the hash; binary string order both engines
    * already share). */
  final case class InS(v: Double, id: String)

  /** Sorted parallel arrays (v DESC, id ASC lexicographic), length ≤ k. */
  final case class BufS(vs: Array[Double], ids: Array[String])

  final class TopKStrAgg(k: Int) extends Aggregator[InS, BufS, BufS] {
    override def zero: BufS = BufS(Array.empty, Array.empty)

    // same total order as TopKAgg (NaN ranks first via Double.compare),
    // with the id leg lexicographic on the raw string
    private def before(b: BufS, i: Int, v: Double, id: String): Boolean = {
      val c = java.lang.Double.compare(b.vs(i), v)
      c > 0 || (c == 0 && b.ids(i).compareTo(id) < 0)
    }

    private def insert(b: BufS, v: Double, id: String): BufS = {
      val n = b.vs.length
      if (n == k && before(b, n - 1, v, id)) return b
      var pos = 0
      while (pos < n && before(b, pos, v, id)) pos += 1
      val m = math.min(n + 1, k)
      val vs = new Array[Double](m)
      val ids = new Array[String](m)
      java.lang.System.arraycopy(b.vs, 0, vs, 0, pos)
      java.lang.System.arraycopy(b.ids, 0, ids, 0, pos)
      vs(pos) = v; ids(pos) = id
      java.lang.System.arraycopy(b.vs, pos, vs, pos + 1, m - pos - 1)
      java.lang.System.arraycopy(b.ids, pos, ids, pos + 1, m - pos - 1)
      BufS(vs, ids)
    }

    override def reduce(b: BufS, a: InS): BufS = insert(b, a.v, a.id)

    override def merge(b1: BufS, b2: BufS): BufS = {
      var acc = b1
      var i = 0
      while (i < b2.vs.length) { acc = insert(acc, b2.vs(i), b2.ids(i)); i += 1 }
      acc
    }

    override def finish(b: BufS): BufS = b
    override def bufferEncoder: Encoder[BufS] = Encoders.product[BufS]
    override def outputEncoder: Encoder[BufS] = Encoders.product[BufS]
  }

  /** [[topK]] for STRING-keyed detail rows: top `k` per `group` by
    * (`value` DESC, `id` ASC lexicographic). Same bounded-buffer partial
    * aggregation contract (map-side combine to ≤ k rows per group, no
    * WindowExec). Output: (group, rank, v, id). */
  def topKStr(df: DataFrame, group: String, value: String, id: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val fn = udaf(new TopKStrAgg(k), Encoders.product[InS])
    df.groupBy(col(group))
      .agg(fn(col(value).cast("double"), col(id).cast("string")).as("top"))
      .select(col(group), posexplode(zip_with(col("top.vs"), col("top.ids"),
        (v, i) => struct(v.as("v"), i.as("id")))))
      .select(col(group), (col("pos") + 1).cast("int").as("rank"),
        col("col.v").as("v"), col("col.id").as("id"))
  }

  /** [[topK]] with an extra BIGINT `carry` column that rides along with
    * each kept row (not part of the ordering) — so a top-k whose output
    * needs a third attribute of the winning row (vs06 carries the
    * neighbor's IVF cell) stays one aggregation instead of a join back to
    * the detail table. Output: (group, rank, v, id, carry). */
  def topKCarry(df: DataFrame, group: String, value: String, id: String,
      carry: String, k: Int): DataFrame =
    agg(df, group, value, id, col(carry), k)
      .select(col(group), posexplode(zip_with(col("top.vs"),
        zip_with(col("top.ids"), col("top.ps"), (i, p) => struct(i.as("id"), p.as("p"))),
        (v, ip) => struct(v.as("v"), ip.getField("id").as("id"), ip.getField("p").as("p")))))
      .select(col(group), (col("pos") + 1).cast("int").as("rank"),
        col("col.v").as("v"), col("col.id").as("id"), col("col.p").as("carry"))
}
