package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One catalog entry: a Spark-side query over the sf-dir parquet tables and
  * (when SQL-expressible) the equivalent DuckDB oracle SQL. The driver runs
  * both at sf0.01 and hash-compares sorted columns/rows (CORRECTNESS gate).
  *
  * Determinism rules every entry obeys:
  *  - double aggregates go through DECIMAL (exact, order-independent) and are
  *    cast back to double only at the end — FP sums in shuffle order would
  *    never hash-match the oracle;
  *  - every result is fully ordered by a unique key with explicit NULLS FIRST
  *    (Spark's default) mirrored in the oracle SQL;
  *  - timestamps are emitted as formatted strings (Spark µs parquet vs DuckDB
  *    naive timestamps would otherwise differ in type representation);
  *  - column names are aliased identically on both sides.
  */
final case class Q(
    name: String,
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryUtils {
  /** Exact order-independent sum of a double column: per-row round to
    * DECIMAL(18,4) (deterministic), exact decimal addition, cast back. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Oracle-side twin of [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,4))) AS DOUBLE)"

  /** First 8 md5 hex chars of a string column as a BIGINT in [0, 2³²) —
    * the engine-universal uniform hash used for minhash signatures and
    * deterministic sampling. A long fold (unlike the raw hex string) keeps
    * min/sum aggregates hash-aggregatable: no SortAggregate, no sort of
    * the exploded stream. Backed by the fused native expression
    * (graft.functions.Md5Fold32) — one digest, no hex-string round trip. */
  def hex8(c: Column): Column = graft.functions.HashExpressions.md5Fold32(c)

  /** Oracle-side twin of [[hex8]]: nibble-wise parse (no hex-cast
    * dependence in DuckDB), cast to BIGINT so downstream aggregates don't
    * widen to HUGEINT (which pandas renders as float64 and breaks the
    * driver's hash compare). `e` is a VARCHAR expression. */
  def hex8Sql(e: String): String =
    s"CAST(list_sum([(strpos('0123456789abcdef', substr(md5($e), j, 1)) - 1) " +
      s"* CAST(power(16, 8 - j) AS BIGINT) for j in range(1, 9)]) AS BIGINT)"

  /** Once-per-(session, corpus) standing-state directory — the pp04
    * treatment (COVERAGE round-8 amendment 1), shared by every
    * incremental gate whose production shape holds corpus-derived state
    * as persisted TABLES: `build` writes the tables under a fresh temp
    * dir exactly once; later calls re-read the parquet. Correctness is
    * unaffected by the caching — the derivation is deterministic and the
    * corpus dirs are immutable for a session's lifetime — but the gate's
    * measured time becomes the ADVANCE alone, which is the quantity a
    * round-over-round bench delta should compare. */
  private val standingDirs = new scala.collection.concurrent.TrieMap[String, String]()
  def standingDir(s: org.apache.spark.sql.SparkSession, gate: String, d: String)(
      build: String => Unit): String =
    standingDirs.getOrElseUpdate(s"$gate:${System.identityHashCode(s)}:$d", {
      val dir = java.nio.file.Files.createTempDirectory(s"$gate-standing").toString
      build(dir)
      dir
    })
}

object Catalog {
  val all: Seq[Q] =
    Relational.queries ++ TextOps.queries ++ VectorOps.queries ++ SampleOps.queries

  def byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
