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

  /** The scan's partition-pruning evidence: every FileSourceScan's
    * partition filters rendered to one string (empty if none) — derived
    * from the typed scan nodes, not the plan's printed form. */
  def partitionFilters(df: DataFrame): String =
    PlanInspect.partitionFilters(df).mkString("; ")
}
