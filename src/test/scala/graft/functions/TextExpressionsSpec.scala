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

  test("tokenRowStats equals the composed five-stat battery, null/empty/null-element legs included") {
    import spark.implicits._
    // the pre-r19 composed form, verbatim (ta16's old battery)
    def composedStats(t: org.apache.spark.sql.Column) = struct(
      size(t).as("n"),
      aggregate(t, lit(0L), (acc, x) => acc + length(x)).as("sl"),
      size(array_distinct(t)).as("nd"),
      array_max(transform(array_distinct(t), x =>
        size(filter(t, y => y === x)))).as("ntop"),
      size(filter(t, x => x === "the" || x === "a")).as("nstop"))
    val textDf = fixtures.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select($"id", Text.tokens($"text").as("toks"))
    // plus hand-built arrays the tokenizer can't produce: null elements,
    // all-null, repeated tokens with stopwords
    val arrDf = Seq(
      (100L, Some(Seq(Some("a"), None, Some("a"), Some("the")))),
      (101L, Some(Seq[Option[String]](None, None))),
      (102L, Some(Seq(Some("x"), Some("x"), Some("x"), Some("y")))),
      (103L, Some(Seq.empty[Option[String]])),
      (104L, None)
    ).toDF("id", "toks")
    // compare EXTRACTED FIELDS (what ruleVerdicts consumes): a null token
    // array yields a null fused struct but a composed struct of null
    // fields — field extraction gives identical null columns either way
    val stats = Seq("n", "sl", "nd", "ntop", "nstop")
    for (df <- Seq(textDf, arrDf)) {
      val rows = df
        .withColumn("f", graft.functions.TextExpressions.tokenRowStats($"toks"))
        .withColumn("c", composedStats($"toks"))
        .select($"id" +: stats.flatMap(s0 =>
          Seq(col(s"f.$s0").as(s"f_$s0"), col(s"c.$s0").as(s"c_$s0"))): _*)
        .orderBy($"id").collect()
      rows.foreach { r =>
        for (k <- stats.indices) {
          val (fi, ci) = (1 + 2 * k, 2 + 2 * k)
          assert((r.isNullAt(fi) && r.isNullAt(ci)) ||
            (!r.isNullAt(fi) && !r.isNullAt(ci) && r.get(fi) == r.get(ci)),
            s"stat ${stats(k)} drift on id=${r.getLong(0)}: $r")
        }
      }
    }
    // interpreted == codegen for the new kernel
    val expr = graft.functions.TextExpressions.tokenRowStats($"toks")
    val viaCodegen = arrDf.select($"id", expr.as("s")).orderBy($"id").collect()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val viaEval = arrDf.select($"id", expr.as("s")).orderBy($"id").collect()
      viaCodegen.zip(viaEval).foreach { case (a, b) =>
        assert(a.toString == b.toString, "interpreted/codegen drift")
      }
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
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
