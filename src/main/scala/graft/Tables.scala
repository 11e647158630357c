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
  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects by default. Read nanos as long and convert to a µs
    * timestamp — lossless here (driver data is µs-aligned) and identical to
    * DuckDB's TIMESTAMP_NS → µs view of the same file.
    *
    * The nanosAsLong flag is deliberately left set for the whole session:
    * it is consulted again on the EXECUTOR side when each scan task builds
    * its parquet reader (captured from the session conf at action time), so
    * a save-and-restore around this lazy read would silently break any
    * events query executed later. Session-wide effect: a raw
    * `spark.read.parquet` of some OTHER nanos-timestamp file in the same
    * session will also see long, not an error — acceptable for this engine,
    * where all nanos inputs go through this helper. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
