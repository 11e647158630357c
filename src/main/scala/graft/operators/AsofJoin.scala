package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single latest right row with
  * right.time <= left.time within the same key — the temporal lookup every
  * event pipeline needs (price as of trade time, last click before
  * purchase) and one Spark has no built-in for.
  *
  * Implemented as union + ordered window carry-forward (preference ladder
  * (a): composed built-ins): tag both sides, union, one window partitioned
  * by key ordered by (time, side) with right rows sorting first at equal
  * times, carry the last non-null right payload forward, keep left rows.
  * ONE shuffle on the key — strictly better at scale than the range-join
  * formulation (join + filter + row_number = shuffle + O(matches) blowup).
  */
object AsofJoin {

  /** left ⟕asof right. Right columns (other than keys/time) come back
    * suffixed with `rightSuffix`; unmatched left rows keep them null. */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, rightSuffix: String = "_asof"): DataFrame = {
    val rightPayload = right.columns.filterNot(c => keys.contains(c) || c == timeCol)
    // the whole right payload travels as ONE struct so the carry-forward
    // picks one entire right row — per-column carry would resurrect older
    // values under a null field and stitch together a row that never
    // existed (the struct itself is never null on right rows, so a
    // latest-row null field stays null)
    val lTagged = left
      .withColumn("__side", lit(1))
      .withColumn("__payload",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          rightPayload.map(c => right.schema(c).copy(name = c)))))
    val rTagged = right
      .withColumn("__side", lit(0))
      .withColumn("__payload", struct(rightPayload.map(col): _*))
      .drop(rightPayload: _*)
    // left-only columns null-padded on the right side by unionByName
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__carried",
      last(col("__payload"), ignoreNulls = true).over(w))
    rightPayload.foldLeft(carried.filter(col("__side") === 1)) { (df, c) =>
      df.withColumn(s"$c$rightSuffix", col(s"__carried.$c"))
    }.drop("__side", "__payload", "__carried")
  }
}

/** Skew mitigation by key salting (SURVEY §4 scale notes: "skewed keys →
  * salting or AQE skew-join"). AQE handles sort-merge-join skew
  * automatically; salting is the explicit tool for skewed AGGREGATIONS
  * and for joins AQE can't split (e.g. a hot key against a non-splittable
  * build side). */
object Salting {

  /** Two-phase salted aggregation: groupBy (key, salt) partial-aggregate,
    * then groupBy key to merge — a hot key spreads over `salts` reducers.
    * Caller supplies mergeable partial aggs (sum/count/min/max-shaped). */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
      partialAggs: Seq[Column], mergeAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /** Salted broadcast-side replication for a skewed equi-join: the big
    * (skewed) side gets a random salt in [0, salts); the small side is
    * exploded `salts`× so every (key, salt) bucket finds its match. Only
    * worth it when the small side fits memory after replication. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    // replicating the small side is only sound when unmatched small rows
    // can't surface: right/full/anti would emit one row per salt replica
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"saltedJoin supports inner/left joins only, got $joinType")
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val smallExploded = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    bigSalted.join(smallExploded, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
