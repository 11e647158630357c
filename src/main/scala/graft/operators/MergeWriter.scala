package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed last-writer-wins merge — the Spark re-expression of the reference's
  * row-at-a-time `INSERT … ON DUPLICATE KEY UPDATE` loop
  * (pdf_to_db.py:202-244, loop at :347-350; SURVEY.md §2.8).
  *
  * Net reference semantics: per key, the last row in source order wins;
  * existing rows for other keys survive. Here that is a single window dedup
  * plus an anti-join union — two shuffles on the key, both of which disappear
  * at scale if the target table is bucketed by the key.
  */
object MergeWriter {

  /** Keep exactly one row per key: the one with the greatest (orderCols) —
    * e.g. source position or event time. Deterministic only if orderCols is
    * a total order within each key (callers append a unique id). */
  def lastWriterWins(df: DataFrame, keys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Merge an incoming batch into an existing snapshot: incoming rows replace
    * existing rows with the same key (full-column overwrite), keys absent
    * from incoming survive unchanged. `incoming` is deduped last-wins first. */
  def upsert(existing: DataFrame, incoming: DataFrame,
      keys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val deduped = lastWriterWins(incoming, keys, orderCols)
    existing.join(deduped, keys, "left_anti").unionByName(deduped)
  }

  /** Atomic snapshot overwrite: write to a temp dir, then swap directories.
    * Parquet-on-filesystem stand-in for a transactional table format (the
    * offline environment has no Delta/Iceberg); the swap is the analog of
    * the reference's single-transaction commit (pdf_to_db.py:351). */
  def overwriteAtomic(df: DataFrame, path: String): Unit = {
    val tmp = path + ".staging"
    df.write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + ".old")
    // FileSystem.rename/delete signal failure by RETURN VALUE, not by
    // throwing — ignoring it would report success with a stale table and
    // the new snapshot stranded in .staging
    def must(ok: Boolean, what: String): Unit =
      if (!ok) throw new java.io.IOException(s"overwriteAtomic: $what failed for $path")
    if (fs.exists(bak)) must(fs.delete(bak, true), "delete old backup")
    if (fs.exists(dst)) must(fs.rename(dst, bak), "backup current snapshot")
    must(fs.rename(new org.apache.hadoop.fs.Path(tmp), dst), "publish staging")
    if (fs.exists(bak)) must(fs.delete(bak, true), "drop backup")
  }
}
