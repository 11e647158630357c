package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout for scan-time pruning — the other half of the
  * 100 TB story next to [[Bucketing]]: partition directories prune whole
  * subtrees at planning time (PartitionFilters), and range-sorted files
  * prune row groups via parquet min/max at execution time.
  */
object Layout {

  /** Hive-style partitioned write: one directory per distinct value of
    * partCols. Predicates on partCols never read non-matching subtrees. */
  def writePartitioned(df: DataFrame, path: String, partCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)

  /** Range-clustered write: rows range-partitioned and sorted by sortCols
    * so every parquet row group covers a narrow min/max band — range
    * predicates skip most row groups on read. */
  def writeRangeClustered(df: DataFrame, path: String, sortCols: Seq[Column],
      partitions: Int): Unit =
    df.repartitionByRange(partitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .write.mode("overwrite").parquet(path)

  /** Deterministic training-shard write — the physical half of the pp08
    * gate: one directory per shard (readers address shards by partition
    * pruning), rows inside each shard's files sorted by the order-hash
    * column. `repartition(shardCol)` is ONE hash exchange keyed on the
    * shard and `sortWithinPartitions` sorts each shard locally in
    * parallel — there is no global sort anywhere (a naive
    * `orderBy(shard, ord).write` would range-exchange and totally order
    * 100 TB to produce the same files). `ordCols` should end in a unique
    * key (the doc id) so the within-shard order is total — a hash-only
    * sort leaves collision ties physical-layout-dependent. LayoutSpec
    * pins the plan shape and that re-running over a reshuffled input
    * produces byte-identical shard contents. */
  def writeShards(df: DataFrame, path: String, shardCol: String,
      ordCols: Seq[String]): Unit =
    df.repartition(col(shardCol))
      .sortWithinPartitions((shardCol +: ordCols).map(col): _*)
      .write.mode("overwrite").partitionBy(shardCol).parquet(path)

  /** The scan's partition-pruning evidence: every FileSourceScan's
    * partition filters rendered to one string (empty if none) — derived
    * from the typed scan nodes, not the plan's printed form. */
  def partitionFilters(df: DataFrame): String =
    PlanInspect.partitionFilters(df).mkString("; ")
}
