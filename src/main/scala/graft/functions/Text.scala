package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the dedup / text-analysis
  * operators. All pure Catalyst built-ins (whole-stage-codegen'd, no UDFs),
  * so they stay inside WholeStageCodegen spans in the hot path.
  */
object Text {

  /** Whitespace tokens, empties dropped. */
  def tokens(c: Column): Column =
    filter(split(c, " "), t => t =!= "")

  /** Word n-grams (space-joined) over a token array; < n tokens → empty. */
  def wordNGrams(toks: Column, n: Int): Column = {
    val grams = transform(sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))
    when(size(toks) >= n, grams).otherwise(array().cast("array<string>"))
  }

  private def shingleArr(t: String, n: Int): Array[String] = {
    if (t == null) return Array.empty
    val toks = t.split(" ").filter(_.nonEmpty)
    if (toks.length < n) Array.empty
    else (0 to toks.length - n).iterator
      .map(i => toks.slice(i, i + n).mkString(" ")).distinct.toArray
  }

  private val shingleUdfs: Map[Int, org.apache.spark.sql.expressions.UserDefinedFunction] =
    (1 to 5).map(n => n -> udf((t: String) => shingleArr(t, n))).toMap

  /** Distinct word n-gram shingle set of a text column.
    *
    * Implemented as a Scala UDF, deliberately: the pure-Catalyst form
    * (`array_distinct(transform(sequence…, element_at(tokens…)))`) defeats
    * subexpression elimination inside the lambda, re-running split+filter
    * per gram — O(tokens²) per document, measured 14× slower at sf0.1.
    * The UDF is one linear pass. Output set is identical. */
  def shingles(text: Column, n: Int = 3): Column = {
    require(n >= 1 && n <= 5,
      s"shingles: n must be in 1..5 (pre-built UDF table), got $n")
    shingleUdfs(n)(text)
  }

  /** Stopword ratio for the language-ID heuristic. */
  def stopwordRatio(toks: Column, stops: Seq[String]): Column = {
    val stopArr = array(stops.map(lit): _*)
    size(filter(toks, t => array_contains(stopArr, t))).cast("double") / size(toks)
  }

  /** Order-insensitive content fingerprint: md5 of the sorted distinct
    * token set (near-identical docs with shuffled wording collide). */
  def fingerprint(toks: Column): Column =
    md5(array_join(array_sort(array_distinct(toks)), " "))
}
