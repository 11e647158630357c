package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact prefix sum — the scale path for every "running
  * offset over the whole corpus" computation (sequence packing, byte
  * offsets in a concatenated export, cumulative quota accounting).
  *
  * The naive form, `sum(v) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)`,
  * has no partition key: Spark (and every engine) must move ALL rows into
  * ONE partition and sort there — the definitional single-node
  * bottleneck. This is the textbook two-level scan instead:
  *
  *   1. range-partition by the order key, sort within partitions;
  *   2. per-partition totals (one row per partition) → each partition's
  *      exclusive global offset via a window over just those N_part rows;
  *   3. within-partition running sum (parallel, partition-local) plus the
  *      broadcast offset.
  *
  * Every full-data stage is partition-parallel; the only single-partition
  * step handles one row per partition. The result is independent of the
  * partitioning (sums are associative), so determinism does not rest on
  * the sampled range bounds.
  */
object PrefixSum {

  /** Adds `outCol` = inclusive running total of `valueCol` in global
    * `orderCol` order. `orderCol` values must be globally unique (they are
    * the total order). `valueCol` is summed as BIGINT.
    *
    * `materialize` pins the range-partitioned frame: the offsets branch
    * and the detail branch must see the SAME partition ids, and two
    * independent executions of a range exchange may sample different
    * bounds. The default eager localCheckpoint is the fast path; pass
    * `_.checkpoint(true)` for recoverable lineage on a lossy cluster. */
  def runningTotal(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true)): DataFrame = {
    val parted = materialize(
      df.repartitionByRange(col(orderCol))
        .sortWithinPartitions(col(orderCol))
        .withColumn("__pid", spark_partition_id()))
    // one row per partition; the single-partition window here is the
    // point — it moves N_partitions rows to one task, not the data. The
    // constant-valued partition key (__pid * 0: attribute-referencing, so
    // constant folding keeps it, unlike a literal) is semantically the
    // empty partitionSpec but skips WindowExec's (here unfounded)
    // all-data-to-one-partition WARN on every run.
    val offsets = parted.groupBy(col("__pid"))
      .agg(sum(col(valueCol).cast("long")).as("__psum"))
      .withColumn("__offset", coalesce(
        sum(col("__psum")).over(
          Window.partitionBy(col("__pid") * 0).orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__offset"))
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
    parted
      .withColumn("__local", sum(col(valueCol).cast("long")).over(w))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol, col("__local") + col("__offset"))
      .drop("__pid", "__local", "__offset")
  }

  /** Per-GROUP running totals: `outCol` = inclusive running total of
    * `valueCol` within each `groupCol` value, ordered by `orderCols`
    * (which must be unique WITHIN a group — they are the group's total
    * order). The naive form, `sum(v) OVER (PARTITION BY g ORDER BY …)`,
    * sorts each group in ONE task — at 100 TB a popular group (one web
    * domain holding a third of the corpus) is a straggler that a bigger
    * cluster cannot absorb. Same two-level scan as [[runningTotal]],
    * group-aware: range-partition by (group, order) so a big group SPANS
    * partitions; per-(partition, group) totals (≤ partitions × groups
    * rows, usually ≈ partitions + groups); each fragment's exclusive
    * offset via a window PARTITIONED BY GROUP over those summary rows
    * (group-parallel, fragment-count-sized); partition-local running sum
    * plus the broadcast offset. */
  def runningTotalBy(df: DataFrame, groupCol: String, orderCols: Seq[String],
      valueCol: String, outCol: String,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true)): DataFrame = {
    val order = orderCols.map(col)
    val parted = materialize(
      df.repartitionByRange((col(groupCol) +: order): _*)
        .sortWithinPartitions((col(groupCol) +: order): _*)
        .withColumn("__pid", spark_partition_id()))
    val offsets = parted.groupBy(col("__pid"), col(groupCol))
      .agg(sum(col(valueCol).cast("long")).as("__psum"))
      .withColumn("__offset", coalesce(
        sum(col("__psum")).over(
          Window.partitionBy(col(groupCol)).orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col(groupCol), col("__offset"))
    val w = Window.partitionBy(col("__pid"), col(groupCol)).orderBy(order: _*)
    // no broadcast hint, unlike [[runningTotal]]: its offsets frame is
    // partitions-sized (always tiny), this one is fragment-count-sized —
    // ≈ groups at high group cardinality, where forcing a broadcast of
    // millions of offset rows would be the bottleneck. AQE broadcasts
    // when it measures small (the common case) and shuffle-joins
    // otherwise; the running totals are already computed per fragment,
    // so the join's partitioning is free to differ.
    //
    // NULL-SAFE (<=>) on the group column: groupBy and the windows treat
    // NULL as one group, so a plain equi-join here would silently DROP
    // every null-group row (null keys never match) — the offsets side is
    // renamed so the join condition can say <=> without ambiguity.
    val offs = offsets
      .withColumnRenamed("__pid", "__opid")
      .withColumnRenamed(groupCol, "__ogrp")
    parted
      .withColumn("__local", sum(col(valueCol).cast("long")).over(w))
      .join(offs, col("__pid") === col("__opid") && col(groupCol) <=> col("__ogrp"))
      .withColumn(outCol, col("__local") + col("__offset"))
      .drop("__pid", "__opid", "__ogrp", "__local", "__offset")
  }
}
