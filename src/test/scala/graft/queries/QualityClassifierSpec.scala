package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** ta15's learned linear quality filter: every feature, the fixed-point
  * score, and the keep verdict recomputed INDEPENDENTLY driver-side from
  * the raw text — scalar Scala over collected strings, no Spark
  * expressions shared with the gate — so an error in either side's
  * integer arithmetic cannot cancel out. */
class QualityClassifierSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("features, score and verdict match a scalar recompute from raw text; both directions exercised") {
    val texts = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap

    // corpus LM from first principles: bigram -> total occurrences
    def tokens(t: String): Seq[String] = t.split(" ").filter(_.nonEmpty).toSeq
    def bigrams(t: String): Seq[(String, String)] = {
      val ts = tokens(t); ts.zip(ts.drop(1))
    }
    val lm = texts.values.toSeq.flatMap(bigrams)
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }

    val expect = texts.flatMap { case (id, t) =>
      val ts = tokens(t)
      val bs = bigrams(t)
      if (bs.isEmpty) None // < 2 tokens: absent by the ta12 convention
      else {
        val counts = ts.groupBy(identity).map(_._2.size.toLong)
        val nTok = ts.size.toLong
        val mRows = bs.groupBy(identity).map(_._2.size.toLong)
        val nBi = bs.size.toLong
        val nDup2 = nBi - mRows.size
        val nRare = bs.count(b => lm(b) <= 2L).toLong
        val f = Seq(
          1000L * counts.size / nTok,    // diversity_pm
          1000L * counts.max / nTok,     // top_share_pm
          1000L * nDup2 / nBi,           // dup2_pm
          1000L * nRare / nBi,           // rare_pm
          math.min(nTok, 500L))          // len_cap
        val score = f.zip(TextOps.TA15_WEIGHTS.map(_._2)).map { case (x, w) => x * w }.sum
        Some(id -> (f, score, score >= TextOps.TA15_THRESHOLD))
      }
    }

    val got = Catalog.byName("ta15_quality_classifier").fn(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((1 to 5).map(r.getLong).toSeq,
        r.getAs[Long]("score"), r.getAs[Boolean]("keep"))).toMap

    assert(got.keySet == expect.keySet, "doc universe differs")
    expect.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id: got ${got(id)}, expect $e")
    }
    assert(got.values.exists(_._3) && got.values.exists(!_._3),
      "threshold must split the corpus (both verdict directions)")
  }

  test("degenerate docs: 0/1-token documents are absent; repetitive text scores below diverse text") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // drive the gate's plan over a controlled corpus via the same
    // feature expressions by writing a scratch documents table
    val dir = java.nio.file.Files.createTempDirectory("ta15-deg").toString
    Seq(
      (1L, ""), (2L, "one"), (3L, "   "),
      (4L, "spam spam spam spam spam spam spam spam spam spam"),
      (5L, "a genuinely varied sentence with many distinct meaningful tokens present")
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = Catalog.byName("ta15_quality_classifier").fn(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("score"), r.getAs[Boolean]("keep"))).toMap
    assert(out.keySet == Set(4L, 5L), s"degenerate docs leaked: ${out.keySet}")
    assert(out(5L)._1 > out(4L)._1,
      s"repetitive text out-scored diverse text: $out")
    // the all-repetition doc: top_share = 1000, diversity = 100, 8 of 9
    // bigrams duplicated — the signs drive it far negative and it is
    // rejected. (No keep=true assertion here: in a 2-doc scratch corpus
    // EVERY transition is LM-rare, so even the varied doc sits below the
    // production-calibrated threshold — the absolute verdict is
    // exercised on the real corpus in the test above.)
    assert(!out(4L)._2 && out(4L)._1 < 0, s"spam doc kept: ${out(4L)}")
  }
}
