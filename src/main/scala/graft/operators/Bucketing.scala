package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table management — the engine's 100 TB join strategy.
  *
  * Every keyed join in this engine (merge by pdf_name, well_info by
  * (well_name, api), lineitem⋈orders by orderkey) shuffles both sides on
  * the key. At 77 rows that is noise; at 100 TB the shuffle IS the query
  * cost. Writing both sides bucketed+sorted by the join key lets Spark
  * plan a SortMergeJoin with ZERO Exchange: each task zips bucket i of A
  * with bucket i of B straight off storage.
  *
  * Bucket counts should be sized so one bucket of the big table ≈ one
  * task's worth (128-512 MB); co-partitioned tables must share the count.
  */
object Bucketing {

  /** Write df as a bucketed, sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String], mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Join two co-bucketed tables on their bucket keys — shuffle-free when
    * both were written via [[writeBucketed]] with the same bucket count. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), keys, joinType)

  /** True if the physical plan of df contains any shuffle Exchange
    * (typed-tree probe, see [[PlanInspect.hasShuffle]]). */
  def hasShuffle(df: DataFrame): Boolean = PlanInspect.hasShuffle(df)
}
