package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The library form of BM25 retrieval: any (query_id, qtext) workload,
  * any k — scalar-replayed against a hand-computable corpus so the
  * Okapi algebra (k1 = 6/5, b = 3/4, rational idf, floor-average doc
  * length) is pinned independently of the gate's oracle. */
class Bm25Spec extends AnyFunSuite with SparkSpec {
  import org.apache.spark.sql.functions._

  test("bm25TopK(tf, queries, k): scalar-replayed scores, OOV terms inert, k honored, ties break on doc_id") {
    import spark.implicits._
    val docs = Seq(
      1L -> "apple banana apple",   // tf(apple)=2, dl=3
      2L -> "apple cherry",         // tf(apple)=1, dl=2
      3L -> "banana banana cherry", // dl=3
      4L -> "date")                 // dl=1
      .toDF("doc_id", "text")
    val tf = TextOps.tfRollup(docs).localCheckpoint(true)
    val queries = Seq(10L -> "apple zzz-oov", 20L -> "banana").toDF("query_id", "qtext")
    val got = TextOps.bm25TopK(tf, queries, k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))

    // scalar replay: N=4, L=9, adl = max(9 div 4, 1) = 2
    // term(tf, dl, df) = ((10000*4) div df) * ((44*tf*2*10000) div (20*tf*2 + 6*2 + 18*dl)) div 10000
    def term(tfv: Long, dl: Long, df: Long): Long =
      ((10000L * 4 / df) * ((44 * tfv * 2 * 10000L) / (20 * tfv * 2 + 6 * 2 + 18 * dl))) / 10000L
    // query 10 ("apple" df=2; "zzz-oov" has no tf rows and must be inert)
    val q10 = Seq(1L -> term(2, 3, 2), 2L -> term(1, 2, 2))
      .sortBy { case (id, s) => (-s, id) }
    // query 20 ("banana" df=2)
    val q20 = Seq(1L -> term(1, 3, 2), 3L -> term(2, 3, 2))
      .sortBy { case (id, s) => (-s, id) }
    val want =
      q10.zipWithIndex.map { case ((id, s), i) => (10L, i + 1, id, s) } ++
      q20.zipWithIndex.map { case ((id, s), i) => (20L, i + 1, id, s) }
    assert(got.toSeq == want, s"got ${got.toSeq} want $want")

    // k truncates: k=1 keeps only each query's top row
    assert(TextOps.bm25TopK(tf, queries, k = 1).count() == 2)

    // a duplicated workload row must not inflate scores: same results
    // as the deduped workload, bit for bit
    val dupQueries = queries.unionByName(
      Seq(10L -> "apple zzz-oov").toDF("query_id", "qtext"))
    assert(TextOps.bm25TopK(tf, dupQueries, k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
      == got.toSeq, "duplicate workload rows multiplied the scoring join")

    // equal-scoring docs tie-break by ascending doc_id: two identical
    // docs score identically for their shared term
    val tie = TextOps.tfRollup(
      Seq(5L -> "kiwi", 6L -> "kiwi").toDF("doc_id", "text"))
    val ranked = TextOps.bm25TopK(tie,
      Seq(1L -> "kiwi").toDF("query_id", "qtext"), k = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(ranked.toSeq == Seq((1, 5L), (2, 6L)), s"tie-break broke: ${ranked.toSeq}")
  }

  test("spark.graft.bm25.checkUniqueInput: duplicate (doc_id, tok) rows fail loudly; unique input passes") {
    import spark.implicits._
    val queries = Seq(1L -> "apple").toDF("query_id", "qtext")
    val unique = TextOps.tfRollup(
      Seq(1L -> "apple banana", 2L -> "apple").toDF("doc_id", "text"))
    // a redelivery-shaped duplicate: byte-identical (doc, tok, tf) row
    val dup = unique.unionByName(unique.limit(1))
    spark.conf.set("spark.graft.bm25.checkUniqueInput", "true")
    try {
      // clean input is unaffected by the guard
      assert(TextOps.bm25TopK(unique, queries, k = 2).count() == 2)
      val e = intercept[IllegalArgumentException] {
        TextOps.bm25TopK(dup, queries, k = 2).count()
      }
      assert(e.getMessage.contains("unique (doc_id, tok)"), e.getMessage)
      // a NULL-bearing row is a DIFFERENT defect and must be named as
      // one — count_distinct over bare columns would skip the row and
      // misreport it as a duplicate-pair violation
      val withNull = unique.unionByName(
        Seq((3L, Option.empty[String], 1L)).toDF("doc_id", "tok", "tf"))
      val n = intercept[IllegalArgumentException] {
        TextOps.bm25TopK(withNull, queries, k = 2).count()
      }
      assert(n.getMessage.contains("NULL doc_id/tok"), n.getMessage)
    } finally spark.conf.unset("spark.graft.bm25.checkUniqueInput")
    // guard off (default): the contract stays documentation-only — the
    // call goes through (and would double-count; that is the caller's
    // stated responsibility on this overload)
    assert(TextOps.bm25TopK(dup, queries, k = 2).count() == 2)
  }
}
