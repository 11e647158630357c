package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Goldens for the production NFKC canonicalizer (dd15/pp17's
  * `unicode = true` seam) — hand-built Unicode fixtures in the F1–F25
  * golden style, because DuckDB cannot replay NFKC so this path is
  * deliberately outside the oracle gates. Every non-ASCII code point is
  * written as an escape so the fixture bytes cannot be mangled by any
  * editor/terminal transcoding. */
class UnicodeCanonSpec extends AnyFunSuite with SparkSpec {

  // U+FF28 Ｈ fullwidth H … U+FF13 ３ fullwidth 3
  private val fullwidthHello = "\uFF28\uFF45\uFF4C\uFF4C\uFF4F \uFF11\uFF12\uFF13"
  private val ligFi = "\uFB01"       // LATIN SMALL LIGATURE FI
  private val circled2 = "\u2461"    // CIRCLED DIGIT TWO
  private val eAcutePre = "\u00E9"   // precomposed e-acute
  private val eAcuteComb = "e\u0301" // e + COMBINING ACUTE ACCENT

  private def nfkcOf(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(NfkcNormalize(col("t")).as("n"))
      .collect()(0).getString(0)
  }

  private def canonOf(s: String, unicode: Boolean): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(Text.canonical(col("t"), unicode).as("c"))
      .collect()(0).getString(0)
  }

  test("NFKC folds fullwidth forms to ASCII") {
    assert(nfkcOf(fullwidthHello) == "Hello 123")
  }

  test("NFKC decomposes compatibility ligatures and circled digits") {
    assert(nfkcOf(s"${ligFi}le $circled2") == "file 2")
    assert(nfkcOf("\u2460\u2462") == "13")
  }

  test("NFKC composes combining sequences to precomposed forms") {
    assert(nfkcOf(s"caf$eAcuteComb") == s"caf$eAcutePre")
    // already-composed input passes through unchanged
    assert(nfkcOf(s"caf$eAcutePre") == s"caf$eAcutePre")
  }

  test("null and ASCII inputs pass through") {
    import spark.implicits._
    val r = Seq(Option.empty[String], Some("plain ascii"))
      .toDF("t").select(NfkcNormalize(col("t")).as("n")).collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getString(0) == "plain ascii")
  }

  test("participates in whole-stage codegen with fallback disabled") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.range(50)
        .select(concat(lit("\uFF41"), $"id".cast("string")).as("t")) // fullwidth a
        .select(NfkcNormalize($"t").as("n"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*(1) Project [nfkc_normalize"))
      assert(df.filter($"n" === "a7").count() == 1)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("unicode canonical merges what NFKC considers equivalent") {
    // fullwidth letters + combining é vs ASCII letters + precomposed é:
    // one canon text either way (fullwidth Caf = U+FF23 U+FF41 U+FF46)
    val a = canonOf(s"\uFF23\uFF41\uFF46$eAcuteComb!!", unicode = true)
    val b = canonOf(s"Caf$eAcutePre  ", unicode = true)
    assert(a == s"caf$eAcutePre" && b == s"caf$eAcutePre")
    // Unicode letters survive the fold as letters (é is \p{L}) and
    // punctuation runs collapse to single spaces
    assert(canonOf(s"d${eAcutePre}j\u00E0---vu", unicode = true) ==
      s"d${eAcutePre}j\u00E0 vu")
    // circled digits are digits after NFKC
    assert(canonOf(s"item $circled2: ok", unicode = true) == "item 2 ok")
  }

  test("ascii canonical is unchanged by the seam (gate byte-stability)") {
    // the dd15 gate's fold: non-[a-z0-9] runs (including ALL non-ASCII
    // bytes) become spaces — exactly the pre-seam expression
    assert(canonOf(s"Caf$eAcutePre!! X", unicode = false) == "caf x")
    assert(canonOf("  A--b__9  ", unicode = false) == "a b 9")
  }

  test("canonRawStats groups across NFKC variants only in unicode mode") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"\uFF23\uFF41\uFF46$eAcutePre"), // fullwidth Cafe + precomposed accent
      (2L, s"Caf$eAcuteComb"),               // ASCII + combining mark
      (3L, "unrelated text")
    ).toDF("doc_id", "text")
    val uni = graft.queries.TextOps.canonRawStats(docs, unicode = true)
      .groupBy("canon_hash").count().collect().map(_.getLong(1)).sorted
    assert(uni.toSeq == Seq(1L, 2L)) // the two Cafe variants share one canon group
    val ascii = graft.queries.TextOps.canonRawStats(docs)
      .groupBy("canon_hash").count().collect()
    assert(ascii.length == 3) // ASCII fold keeps them distinct
  }
}
