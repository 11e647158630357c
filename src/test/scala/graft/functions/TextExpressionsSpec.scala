package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins the r18 native text kernels (WsTokens / WordNGrams)
  * element-for-element against the exact composed higher-order-function
  * forms they replaced in [[Text.tokens]] / [[Text.wordNGrams]] — the
  * optimization changed operator INTERNALS (guide §4 codegen promotion),
  * so the old forms are kept here as the executable reference. */
class TextExpressionsSpec extends AnyFunSuite with SparkSpec {

  /** The pre-r18 composed forms, verbatim. */
  private def composedTokens(c: org.apache.spark.sql.Column) =
    filter(split(c, " "), t => t =!= "")
  private def composedNGrams(toks: org.apache.spark.sql.Column, n: Int) = {
    val grams = transform(sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))
    when(size(toks) >= n, grams).otherwise(array().cast("array<string>"))
  }

  // deliberately nasty fixtures: multi-space runs, leading/trailing
  // spaces, single token, empty, all-spaces, tabs/newlines (NOT token
  // separators — only 0x20 is), unicode (multibyte chars around and
  // inside tokens), null
  private val fixtures: Seq[Option[String]] = Seq(
    Some("the quick brown fox"),
    Some("  leading and   multi  spaced   "),
    Some("single"),
    Some(""),
    Some("   "),
    Some("tab\tseparated stays\ttogether"),
    Some("line\nbreaks too"),
    Some("héllo wörld ünïcode"),
    Some("日本語 テスト 混ざり text"),
    Some("a b c d e f g h i j"),
    Some(" x "),
    None)

  test("wsTokens equals the composed filter∘split form on every fixture") {
    import spark.implicits._
    val df = fixtures.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val rows = df.select($"id",
        Text.tokens($"text").as("fused"),
        composedTokens($"text").as("composed"))
      .orderBy($"id").collect()
    rows.foreach { r =>
      if (r.isNullAt(1) || r.isNullAt(2))
        assert(r.isNullAt(1) && r.isNullAt(2), s"null drift on id=${r.getLong(0)}")
      else
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"token drift on id=${r.getLong(0)}")
    }
  }

  test("wordNGrams equals the composed transform form for n=1,2,3 (incl. null → empty)") {
    import spark.implicits._
    val df = fixtures.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (n <- 1 to 3) {
      val rows = df.select($"id",
          Text.wordNGrams(Text.tokens($"text"), n).as("fused"),
          composedNGrams(composedTokens($"text"), n).as("composed"))
        .orderBy($"id").collect()
      rows.foreach { r =>
        assert(!r.isNullAt(1) && !r.isNullAt(2),
          s"wordNGrams must never be null (n=$n, id=${r.getLong(0)})")
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n-gram drift (n=$n) on id=${r.getLong(0)}")
      }
    }
  }

  test("wordNGrams skips null elements inside a gram (concat_ws contract)") {
    import spark.implicits._
    // hand-built token arrays WITH nulls — unreachable from Text.tokens
    // (containsNull=false) but part of the public helper's contract
    val df = Seq(
      (1L, Seq(Some("a"), None, Some("b"))),
      (2L, Seq(None, None)),
      (3L, Seq(Some("x")))
    ).toDF("id", "toks")
    val rows = df.select($"id",
        Text.wordNGrams($"toks", 2).as("fused"),
        composedNGrams($"toks", 2).as("composed"))
      .orderBy($"id").collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"null-element drift on id=${r.getLong(0)}")
    }
    // and the concrete expectation, not just parity with the old form
    assert(rows(0).getSeq[String](1) == Seq("a", "b"))
  }

  test("interpreted eval matches codegen (one kernel, no path drift)") {
    import spark.implicits._
    val df = fixtures.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val expr = Text.wordNGrams(Text.tokens($"text"), 2)
    val viaCodegen = df.select($"id", expr.as("g")).orderBy($"id").collect()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val viaEval = df.select($"id", expr.as("g")).orderBy($"id").collect()
      viaCodegen.zip(viaEval).foreach { case (a, b) =>
        assert(a.getSeq[String](1) == b.getSeq[String](1))
      }
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("both participate in whole-stage codegen (no fallback)") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // no exchange: AQE leaves the plan unwrapped, so the pre-execution
      // executedPlan shows the WholeStageCodegen spans directly
      val df = spark.range(100)
        .select(concat_ws(" ", ($"id" % 7).cast("string"),
          ($"id" % 5).cast("string"), ($"id" % 3).cast("string")).as("text"))
        .select(explode(Text.wordNGrams(Text.tokens($"text"), 2)).as("bigram"))
        .where(length($"bigram") > 0)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*(1)"), s"expected whole-stage codegen:\n$plan")
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
