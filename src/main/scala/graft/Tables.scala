package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Readers for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Every query in the catalog receives `(spark, sfDir)` and loads the
  * parquet tables through these helpers so the scan carries pushed
  * filters / pruned columns (verify with `.explain("formatted")` —
  * `PushedFilters` / `ReadSchema` must reflect the query).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** events.parquet's ts column has shipped under TWO physical types
    * across driver testdata generations: TIMESTAMP(NANOS) (rounds 1–8),
    * which Spark's parquet reader rejects by default, and plain
    * TIMESTAMP(MICROS) since the round-9 refresh. Handle both by
    * dispatching on the READ schema: under the nanosAsLong flag a nanos
    * column arrives as LongType (convert — lossless, driver data is
    * µs-aligned, identical to DuckDB's TIMESTAMP_NS → µs view), while a
    * µs column arrives as a timestamp already (cast NTZ → session-UTC
    * timestamp so downstream output types match the nanos path
    * bit-for-bit).
    *
    * The nanosAsLong flag is deliberately left set for the whole session:
    * it is consulted again on the EXECUTOR side when each scan task builds
    * its parquet reader (captured from the session conf at action time), so
    * a save-and-restore around this lazy read would silently break any
    * events query executed later. It only affects nanos columns, so the
    * µs generation reads identically with or without it. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _ =>
        raw.withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
