package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Band (interval / range) self-join: pairs of rows with the same key
  * whose ordering values lie within `band` of each other — "events of the
  * same user within 5 minutes", the nearby-event-correlation primitive.
  *
  * A naive θ-join on `abs(l - r) <= band` has no equi key for the value
  * part, so engines either cross-join per key or sort-merge the whole key
  * group. This operator uses the bucket trick — the scale path:
  * each row lands in bucket `floor(v / band)`; in a qualifying pair the
  * LOWER value's bucket is either the higher's bucket or the one before
  * it, so exploding the lower side into (bucket, bucket+1) probes covers
  * every candidate with equi-shuffles on (key, bucket), then the exact
  * band predicate filters. Work is Σ|bucket|² per key instead of
  * Σ|key-group|², the shuffle key is (key, bucket) — never a pair — and
  * the value-ordered pairing means each pair matches exactly once (no
  * distinct pass).
  */
object BandJoin {

  /** df(keyCol, ordCol (numeric/castable to long), idCol unique): returns
    * (key, id1, v1, id2, v2) where row1 is the band-earlier row — v1 < v2,
    * or v1 == v2 and id1 < id2 — and v2 - v1 <= band.
    *
    * `salts` > 1 is the skew guard: a hot (key, bucket) — one user's event
    * burst inside a single band window — otherwise lands its whole |bucket|²
    * pair space on ONE reducer. The build side is sliced by a deterministic
    * salt (hash of the row id, stable across task retries), the probe side
    * is replicated into every slice, and the salt joins as a third equi
    * key: the hot bucket spreads over `salts` reducers and each (id1, id2)
    * pair still meets exactly once (id2 lives in exactly one slice).
    * Results are identical for any `salts` (BandJoinSpec pins it); the
    * cost is a `salts`× replication of the probe side, so reserve it for
    * genuinely skewed keys. */
  def selfBand(df: DataFrame, keyCol: String, ordCol: String, idCol: String,
      band: Long, salts: Int = 1): DataFrame = {
    require(band > 0, s"band must be positive, got $band")
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val v: Column = col(ordCol).cast("long")
    // pure integer floor division — `floor(v / band)` (and Column `/`)
    // route through double division, whose ulp near 2^63-scale longs
    // (nanosecond epochs) exceeds 1, putting a row one bucket off and
    // silently dropping qualifying pairs at bucket boundaries.
    // v - pmod(v, band) is the exact floor multiple, so integral `div`
    // of it is floor division for negatives too.
    val base = df.select(col(keyCol).as("key"), col(idCol).as("id"), v.as("v"))
      .withColumn("bucket", expr(s"(v - pmod(v, ${band}L)) div ${band}L"))
    val probes = base
      .withColumn("probe", explode(array(col("bucket"), col("bucket") + 1)))
      .select(col("key"), col("id").as("id1"), col("v").as("v1"), col("probe"))
    val build = base.select(col("key"), col("id").as("id2"),
      col("v").as("v2"), col("bucket").as("probe"))
    val (p, b, keys) =
      if (salts == 1) (probes, build, Seq("key", "probe"))
      else (
        probes.withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L)))),
        build.withColumn("__salt", pmod(xxhash64(col("id2")), lit(salts)).cast("long")),
        Seq("key", "probe", "__salt"))
    p.join(b, keys)
      .filter(
        (col("v1") < col("v2") || (col("v1") === col("v2") && col("id1") < col("id2"))) &&
          col("v2") - col("v1") <= band)
      .select(col("key"), col("id1"), col("v1"), col("id2"), col("v2"))
  }
}
