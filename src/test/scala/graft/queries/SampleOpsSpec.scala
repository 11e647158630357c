package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** sa05's rate computation, pinned independently of the oracle: the
  * per-source basis points must be the integer natural/uniform
  * interpolation of the measured counts, with the smallest source kept
  * whole — the property that makes it a FLATTENING (bigger sources are
  * never sampled at a higher rate than smaller ones). */
class SampleOpsSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("sa11: no near-dup pair straddles splits; labels are dd06's; singletons split exactly like sa04") {
    val split = Catalog.byName("sa11_leakage_safe_split").fn(spark, sfDir).collect()
    val byDoc = split.map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // full coverage over the corpus, three-way partition
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(byDoc.keySet == docs.toSet, "split does not cover the corpus")
    assert(byDoc.values.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    // the leak-free contract: every verified LSH near-dup pair (a SUBSET
    // of the bucket connectivity the cluster labels close over) shares
    // one split — the failure mode sa04's doc-id hash permits
    val pairs = Catalog.byName("dd05_lsh_dedup").fn(spark, sfDir)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "corpus lost its planted near-dups")
    pairs.foreach { case (a, b) =>
      assert(byDoc(a)._1 == byDoc(b)._1, s"near-dup pair ($a,$b) split across clusters")
      assert(byDoc(a)._2 == byDoc(b)._2, s"near-dup pair ($a,$b) straddles splits")
    }
    // the labels ARE dd06's (one clustering, two consumers)
    val clusters = Catalog.byName("dd06_dup_clusters").fn(spark, sfDir)
      .select(col("doc_id"), col("cluster_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.view.mapValues(_._1).toMap == clusters)
    // a singleton's label is its own id, so the un-duplicated bulk of the
    // corpus splits exactly as sa04 would under the same salt
    val sizes = clusters.groupBy(_._2).view.mapValues(_.size).toMap
    val singles = clusters.collect { case (d, c) if sizes(c) == 1 => d }
    assert(singles.nonEmpty)
    val sa04 = Catalog.byName("sa04_split").fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    singles.foreach(d =>
      assert(byDoc(d)._2 == sa04(d), s"singleton $d diverged from sa04"))
  }

  test("sa05: emitted bps == integer interpolation of measured counts; smallest source kept whole; rates anti-monotone in count") {
    val counts = graft.Tables.documents(spark, sfDir)
      .groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = counts.values.min
    def expectedBps(n: Long): Long =
      (50L * 10000L + 50L * ((10000L * nMin) / n)) / 100L
    val out = Catalog.byName("sa05_temperature_resample").fn(spark, sfDir)
      .select(col("source"), col("bps")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out.keySet == counts.keySet,
      "a source vanished from the sample entirely (rate floor is 50%)")
    out.foreach { case (src, b) =>
      assert(b == expectedBps(counts(src)), s"bps off for $src")
    }
    // smallest source(s) kept whole; rates never increase with count
    counts.filter(_._2 == nMin).keys.foreach(src => assert(out(src) == 10000L))
    val byCount = counts.toSeq.sortBy(_._2).map { case (s, _) => out(s) }
    assert(byCount == byCount.sorted.reverse, "rates not anti-monotone in count")
  }

  test("sa08: quotas are the exact Hamilton apportionment of measured strata; total is exactly K; each stratum's draw is its quota smallest folds") {
    import spark.implicits._
    val k = 100L
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(col("lang").isNotNull)
    val out = Catalog.byName("sa08_stratified_exact").fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))
    // replicate the apportionment from the measured counts
    val counts = docs.groupBy(col("lang")).count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val total = counts.map(_._2).sum
    val base = counts.map { case (l, n) => (l, k * n / total, k * n % total) }
    val extra = (k - base.map(_._2).sum).toInt
    val bumped = base.sortBy { case (l, _, rem) => (-rem, l) }.take(extra).map(_._1).toSet
    val quota = base.map { case (l, fl, _) => l -> (fl + (if (bumped(l)) 1 else 0)) }.toMap
    assert(quota.values.sum == k, "apportionment must hit the budget exactly")
    val got = out.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    quota.filter(_._2 > 0).foreach { case (l, q) =>
      assert(got.getOrElse(l, 0L) == math.min(q, counts.toMap.apply(l)),
        s"stratum $l drew ${got.getOrElse(l, 0L)} != quota $q") }
    assert(out.length.toLong == k, "total draw must be exactly K at this corpus size")
    out.foreach { case (l, _, _, _, q) => assert(q == quota(l), s"emitted quota drifts for $l") }
    // the draw itself: per stratum, exactly the quota smallest (fold, doc_id)
    val folds = docs.select(col("lang"), col("doc_id"),
        graft.functions.HashExpressions.md5Fold32(
          concat(lit("strat:"), col("doc_id").cast("string"))).as("fold"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    folds.groupBy(_._1).foreach { case (l, rows) =>
      val want = rows.sortBy(r => (r._3, r._2)).take(quota(l).toInt)
        .map(r => (r._2, r._3)).toSeq
      val gotL = out.filter(_._1 == l).sortBy(_._3).map(r => (r._2, r._4)).toSeq
      assert(gotL == want, s"stratum $l drew the wrong members")
    }
  }

  test("epochMix: repeat counts bracket the recipe's epochs; epochs are dense ordinals; fractional share is the salted fold; deterministic") {
    import spark.implicits._
    val docs = (0L until 400L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
    val bps = Map("s0" -> 32500, "s1" -> 10000, "s2" -> 5000)
    val out = SampleOps.epochMix(docs, bps, defaultBps = 0, salt = "e")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val reps = out.groupBy(_._1).map { case (id, rs) =>
      // epochs must be exactly 1..n — an ordinal, not n identical copies
      assert(rs.map(_._4).sorted.toSeq == (1L to rs.length).toSeq, s"epochs not dense for $id")
      id -> rs.length
    }
    val bySrc = out.groupBy(_._2).view.mapValues(_.map(_._1).distinct.length)
    // s0 at 3.25 epochs: every doc 3 or 4 times; s1 exactly once each;
    // s2 fractional-only (0 or 1); s3 under defaultBps=0 absent entirely
    docs.filter($"source" === "s0").collect().foreach { r =>
      assert(Set(3, 4).contains(reps(r.getLong(0))), "s0 repeat outside 3..4") }
    assert(bySrc("s1") == 100 && out.count(_._2 == "s1") == 100)
    assert(bySrc("s2") > 0 && bySrc("s2") < 100, "s2 fractional regime empty or full")
    assert(!bySrc.contains("s3"), "defaultBps=0 source leaked into the output")
    // the fractional 4th epoch of s0 falls on exactly the docs whose salted
    // fold is under the remainder — membership is the fold, not arbitrary
    val expect4 = docs.filter($"source" === "s0")
      .filter(QueryUtils.hex8(concat_ws(":", lit("e"), $"doc_id".cast("string"))) % 10000 < 2500)
      .collect().map(_.getLong(0)).toSet
    assert(reps.filter(_._2 == 4).keySet == expect4)
    // byte-determinism across a second evaluation
    val again = SampleOps.epochMix(docs, bps, defaultBps = 0, salt = "e")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet == again.toSet)
  }

  test("sa09: draw == exact top-K of max-of-w tickets recomputed over the full corpus; weights follow the length rule; key is genuinely the max ticket") {
    import spark.implicits._
    // sf0.01: the draw must be SELECTIVE (corpus > K) for the tilt check
    val d09 = "/root/testdata/sf0.01"
    val docs = graft.Tables.documents(spark, d09)
    // recompute every doc's (w, key) from first principles with the same
    // engine-universal fold the gate uses, then take the top-100
    val all = docs.select($"doc_id",
        expr("1L + least(coalesce(length(text), 0L) div 100L, 7L)").as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def ticket(id: Long, tk: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"wt:$id:$tk".getBytes("UTF-8"))
      md.take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    }
    val keys = all.map { case (id, w) => (id, w, (1L to w).map(ticket(id, _)).max) }
    val expect = keys.sortBy { case (id, _, k) => (-k, id) }.take(100).toSeq
    val got = Catalog.byName("sa09_weighted_sample").fn(spark, d09)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, "gate draw differs from the first-principles A-ES draw")
    // the length rule held everywhere (not only inside the sample)
    val lens = docs.select($"doc_id", coalesce(length($"text"), lit(0)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    all.foreach { case (id, w) =>
      assert(w == 1L + math.min(lens(id) / 100L, 7L), s"weight rule drifts for doc $id") }
    // A-ES sanity: the realized sample overselects heavy docs relative to
    // their population share (the point of weighting) — only meaningful
    // when the draw is actually selective at this corpus size
    if (all.length > 150) {
      val popHeavy = all.count(_._2 >= 4).toDouble / all.length
      val sampleHeavy = got.count(_._2 >= 4).toDouble / got.size
      assert(sampleHeavy > popHeavy,
        f"weighted draw did not tilt toward heavy docs: pop $popHeavy%.3f sample $sampleHeavy%.3f")
    }
  }

  test("budgetAdvance: cut-marker semantics forced — late arrivals drop even when kept∪batch has room; early arrivals evict; untouched sources carried; sequential advances == full recompute") {
    import spark.implicits._
    val B = 600L
    def frame(rows: (Long, String, Long, Long)*) =
      rows.toDF("doc_id", "source", "n_tokens", "key")
    def kept(f: org.apache.spark.sql.DataFrame) = SampleOps.budgetKept(f, B)
    def cut(f: org.apache.spark.sql.DataFrame) = SampleOps.budgetCut(f, B)
    def keptSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "source", "n_tokens", "running")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

    // old corpus, source s: d1(key 10, 300) kept; d2(key 20, 400) crosses
    // (cut marker); d3(key 30, 10) dropped in its wake. Source u untouched.
    val old = frame((1, "s", 300, 10), (2, "s", 400, 20), (3, "s", 10, 30),
      (9, "u", 100, 5))
    val (k0, c0) = (kept(old).localCheckpoint(true), cut(old).localCheckpoint(true))
    assert(keptSet(k0) == Set((1L, "s", 300L, 300L), (9L, "u", 100L, 100L)))
    assert(c0.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      == Set(("s", 20L, 2L)))

    // THE marker case: d4 sorts past the cut. kept ∪ batch alone has
    // room (300 + 50 <= 600) — the dropped d2/d3 contributions are what
    // the marker stands in for; d4 must drop and the state not move.
    val (k1, c1) = SampleOps.budgetAdvance(k0, c0, frame((4, "s", 50, 40)), B)
    assert(keptSet(k1) == keptSet(k0), "late arrival wrongly admitted past the cut")
    assert(c1.collect().toSet == c0.collect().toSet)
    val full1 = old.unionByName(frame((4, "s", 50, 40)))
    assert(keptSet(k1) == keptSet(kept(full1)), "advance != full recompute (late case)")

    // eviction: d5 sorts FIRST (key 5, 550 tokens) — it enters, d1 now
    // crosses and becomes the new cut marker; u untouched throughout
    val (k2, c2) = SampleOps.budgetAdvance(k0, c0, frame((5, "s", 550, 5)), B)
    val full2 = old.unionByName(frame((5, "s", 550, 5)))
    assert(keptSet(k2) == keptSet(kept(full2)), "advance != full recompute (evict case)")
    assert(keptSet(k2) == Set((5L, "s", 550L, 550L), (9L, "u", 100L, 100L)))
    assert(c2.filter($"source" === "s").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((10L, 1L)),
      "cut marker did not advance to the newly-crossing doc")

    // fresh source in the batch starts its own budget
    val (k3, _) = SampleOps.budgetAdvance(k0, c0, frame((6, "t", 200, 1)), B)
    assert(keptSet(k3) == keptSet(k0) + ((6L, "t", 200L, 200L)))

    // sequential advances from EMPTY state over a real corpus == sa10's
    // full recompute, for an arbitrary 3-way split
    val corpus = graft.Tables.documents(spark, sfDir)
    val f = SampleOps.budgetFrame(corpus).localCheckpoint(true)
    val empty = f.filter(lit(false))
    var state = (kept(empty).localCheckpoint(true), cut(empty).localCheckpoint(true))
    for (m <- 0 until 3) {
      val b = f.filter($"doc_id" % 3 === m)
      state = SampleOps.budgetAdvance(state._1, state._2, b, B)
      state = (state._1.localCheckpoint(true), state._2.localCheckpoint(true))
    }
    assert(keptSet(state._1) == keptSet(kept(f)),
      "three-batch advance drifted from the full recompute")
  }

  test("sa10: per-source totals within budget; greedy-maximal (next doc in hash order would cross); running == recomputed per-group prefix sum") {
    import spark.implicits._
    val budget = 600L
    val got = Catalog.byName("sa10_token_budget_mix").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty, "budget mix kept nothing at sf0.001")

    // first-principles replay: per source, hash order, cumulative prefix
    val all = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source",
        size(graft.functions.Text.tokens($"text")).cast("long").as("n"),
        graft.queries.QueryUtils.hex8(
          concat(lit("budget:"), $"doc_id".cast("string"))).as("key"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val bySource = all.groupBy(_._2)
    val expect = bySource.toSeq.flatMap { case (src, rs) =>
      var acc = 0L
      rs.sortBy(t => (t._4, t._1)).flatMap { case (id, _, n, _) =>
        acc += n
        if (acc <= budget) Some((id, src, n, acc)) else None
      }
    }.toSet
    // greedy prefix: everything after the first crossing doc is dropped
    // on the Spark side too, because `running` is monotone in the order —
    // so set equality against the per-source PREFIX (not the filter over
    // all rows) is the stronger check
    val expectPrefix = bySource.toSeq.flatMap { case (src, rs) =>
      val ordered = rs.sortBy(t => (t._4, t._1))
      val cum = ordered.scanLeft(0L)(_ + _._3).tail
      ordered.zip(cum).takeWhile(_._2 <= budget)
        .map { case ((id, _, n, _), run) => (id, src, n, run) }
    }.toSet
    assert(got.toSet == expectPrefix, "gate != greedy per-source prefix replay")
    // NOTE: filter-form and prefix-form agree exactly because running is
    // strictly monotone within a source (token counts are >= 0 and a
    // 0-token doc cannot cross the budget once it is exceeded) — pinned:
    assert(expect == expectPrefix)

    // budget respected and maximal per source
    got.groupBy(_._2).foreach { case (src, rs) =>
      val total = rs.map(_._3).sum
      assert(total <= budget, s"$src over budget: $total")
      val kept = rs.map(_._1).toSet
      val next = bySource(src).filter(t => !kept.contains(t._1))
        .sortBy(t => (t._4, t._1)).headOption
      next.foreach { case (_, _, n, _) =>
        assert(total + n > budget,
          s"$src not maximal: next doc ($n tokens) still fits under $budget") }
    }
  }
}
