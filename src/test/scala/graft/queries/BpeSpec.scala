package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** ta14's BPE trainer kernel, pinned on hand-computed fixtures: the
  * greedy left-to-right non-overlapping merge semantics (the reference
  * BPE word-encoder behavior) and the (n desc, sym, nxt) argmax
  * tie-break. */
class BpeSpec extends SparkSpec {

  private def seg(vocab: Seq[(String, Long)], k: Int): Map[String, Seq[String]] = {
    import spark.implicits._
    TextOps.bpeSegmentation(vocab.toDF("tok", "wf"), k)
      .orderBy($"tok", $"pos").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.sortBy(_.getInt(2)).map(_.getString(3)).toSeq).toMap
  }

  test("one merge: run of identical pairs merges every second (greedy non-overlap)") {
    // pair counts: aa = 3 (aaaa) + 2 (aab) = 5, ab = 2, ba = 1 → merge aa
    val m = seg(Seq("aaaa" -> 1L, "aab" -> 2L, "ba" -> 1L), 1)
    assert(m("aaaa") == Seq("aa", "aa"))   // NOT (aa, a, a): both disjoint pairs merge
    assert(m("aab") == Seq("aa", "b"))
    assert(m("ba") == Seq("b", "a"))
  }

  test("odd run leaves the trailing symbol unmerged") {
    val m = seg(Seq("aaaaa" -> 1L), 1)     // pairs: aa×4 → merge aa
    assert(m("aaaaa") == Seq("aa", "aa", "a"))
  }

  test("merges compose across iterations on the learned symbols") {
    // iter1: aa (count 2 from 'aaab'×2... ) — fixture: 'aaab' wf2, 'ab' wf1
    // iter1 pairs: aa=2·2=4? no: 'aaab' has aa at pos1,2 → 2 positions × wf2 = 4; ab: 'aaab' 1×2 + 'ab' 1 = 3 → merge aa
    // after iter1: aaab → [aa, a, b]; iter2 pairs: (aa,a)=2, (a,b)=2+1=3 → merge ab
    val m = seg(Seq("aaab" -> 2L, "ab" -> 1L), 2)
    assert(m("aaab") == Seq("aa", "a", "b") || m("aaab") == Seq("aa", "ab"))
    // disambiguate: iter2 best is (a,b) with n=3 vs (aa,a) n=2 → ab merges
    assert(m("aaab") == Seq("aa", "ab"))
    assert(m("ab") == Seq("ab"))
  }

  test("argmax ties break on (sym, nxt) lexicographically") {
    // 'xy' wf1 and 'ab' wf1: pairs xy=1, ab=1 tie → 'ab' wins (a < x)
    val m = seg(Seq("xy" -> 1L, "ab" -> 1L), 1)
    assert(m("ab") == Seq("ab"))
    assert(m("xy") == Seq("x", "y"))
  }

  test("single-char and unmergeable words survive every iteration intact") {
    val m = seg(Seq("a" -> 5L, "bc" -> 3L, "bb" -> 4L), 3)
    assert(m("a") == Seq("a"))
    assert(m.contains("bc") && m.contains("bb"))
  }
}
