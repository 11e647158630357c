package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** KMV distinct sketch: exactness when unsaturated, accuracy when
  * saturated, multiset invariance, partitioning invariance (merge is a
  * set union), and the bounded-buffer plan contract. */
class SketchSpec extends AnyFunSuite with SparkSpec {

  private def hashed(ids: Seq[(String, Long)], parts: Int) = {
    import spark.implicits._
    ids.toDF("g", "v").repartition(parts)
      .select($"g", graft.functions.HashExpressions.md5Fold32(
        concat(lit("kmv:"), $"v".cast("string"))).as("h"))
  }

  private def run(ids: Seq[(String, Long)], k: Int, parts: Int) =
    KmvSketch.estimated(KmvSketch.sketch(hashed(ids, parts), "g", col("h"), k), k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)

  test("unsaturated sketch IS the exact distinct count; duplicates are no-ops; partitioning-invariant") {
    val base = (1L to 100L).map(i => ("a", i)) ++ (1L to 7L).map(i => ("b", i))
    val dups = base ++ base ++ base.map { case (g, v) => (g, v) }
    val out = run(dups, k = 256, parts = 5)
    assert(out == Seq(("a", 100L, out(0)._3, 100L), ("b", 7L, out(1)._3, 7L)))
    for (p <- Seq(1, 3, 13)) assert(run(dups, 256, p) == out, s"parts=$p")
    assert(run(base, 256, 4) == out, "multiset multiplicity leaked into the sketch")
  }

  test("saturated estimate lands within the k=256 error band on 20000 distinct values") {
    val n = 20000L
    val out = run((1L to n).map(("g", _)), k = 256, parts = 8)
    val (_, nKept, kth, est) = out.head
    assert(nKept == 256L && kth > 0L)
    // standard error 1/sqrt(256) ~ 6.25%; 4 sigma = 25% — a deterministic
    // draw (md5 is fixed), so this pins the realized accuracy forever
    val rel = math.abs(est - n).toDouble / n
    info(f"KMV k=256 on $n distinct: est $est (rel err $rel%.4f)")
    assert(rel < 0.25, s"estimate $est off exact $n by ${rel * 100}%%")
  }

  test("empty group set and single-value groups") {
    assert(run(Seq.empty, 16, 2).isEmpty)
    val out = run(Seq(("x", 42L)), 16, 2)
    assert(out == Seq(("x", 1L, out.head._3, 1L)))
  }

  test("merged: row-local sketch merge == the whole-corpus sketch, even under OVERLAPPING splits") {
    import spark.implicits._
    val ids = (1L to 3000L).map(("g", _))
    val k = 64
    // overlapping halves: 1..2000 and 1500..3000 — the merge must dedup
    val h1 = KmvSketch.sketch(hashed(ids.filter(_._2 <= 2000), 3), "g", col("h"), k)
    val h2 = KmvSketch.sketch(hashed(ids.filter(_._2 >= 1500), 3), "g", col("h"), k)
    val empty = array().cast("array<bigint>")
    val merged = h1.select($"g", $"hs".as("a"))
      .join(h2.select($"g", $"hs".as("b")), Seq("g"), "full_outer")
      .select($"g", KmvSketch.merged(coalesce($"a", empty), coalesce($"b", empty), k).as("hs"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1))).toMap
    val whole = KmvSketch.sketch(hashed(ids, 5), "g", col("h"), k)
      .collect().map(r => (r.getString(0), r.getSeq[Long](1))).toMap
    assert(merged == whole, "merge of overlapping shard sketches drifted from the whole-corpus sketch")
  }

  test("estimated rejects a k that differs from the sketch's build k instead of mis-estimating") {
    // k=64 over a k=16 sketch would read every saturated buffer (16 kept)
    // as an unsaturated exact count of 16 — the carried k makes it raise
    val sk = KmvSketch.sketch(hashed((1L to 500L).map(("g", _)), 4), "g", col("h"), 16)
    val ex = intercept[Throwable] {
      KmvSketch.estimated(sk, 64).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("does not match the sketch's build k")),
      s"expected the k-mismatch raise, got: ${messages(ex).mkString(" | ")}")
    // matching k still estimates
    assert(KmvSketch.estimated(sk, 16).collect().nonEmpty)
  }

  test("estimated raises the OVERFLOW message (buffer size) on a merged frame estimated with a too-small k") {
    import spark.implicits._
    // merged frames carry no build k — the size guard is the only net,
    // and its message must name the buffer size, not claim a build k
    val big = KmvSketch.sketch(hashed((1L to 500L).map(("g", _)), 4), "g", col("h"), 64)
      .select($"g", $"hs") // what a merge pipeline carries
    val ex = intercept[Throwable] { KmvSketch.estimated(big, 16).collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(m =>
      m.contains("sketch buffer holds") && m.contains("64") && m.contains("k=16")),
      s"expected the overflow raise naming the buffer size, got: ${messages(ex).mkString(" | ")}")
  }

  test("plan: bounded buffers combine map-side — no window, no distinct-value shuffle") {
    val df = KmvSketch.estimated(
      KmvSketch.sketch(hashed((1L to 5000L).map(("g", _)), 8), "g", col("h"), 64), 64)
    df.collect()
    val ns = PlanInspect.nodes(df)
    assert(ns.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec]))
    assert(!ns.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]))
    PlanInspect.shuffles(df).map(_.child.output.map(_.name).toSet).foreach(p =>
      assert(!p.contains("h"), s"distinct-value stream crossed the shuffle: $p"))
  }

  test("ta20 count-min sketch: estimates one-sided, rows conserve the occurrence total, shard sketches ADD") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    // the gate output: est >= true count for every probed token
    val out = graft.queries.Catalog.byName("ta20_cms_counts").fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 20, "probe set wrong size")
    out.foreach { case (tok, cf, est) =>
      assert(est >= cf, s"CMS UNDER-estimated '$tok': $est < $cf") }

    // the cells under the gate's own bucketing formula: every hash row
    // must conserve the occurrence total, and the sketch over two
    // disjoint shards must be the cell-wise SUM of the full corpus's
    def cellsOf(docs: org.apache.spark.sql.DataFrame) = docs
      .select(explode(graft.functions.Text.tokens($"text")).as("tok"))
      .select($"tok", explode(array((0 until 4).map(lit): _*)).as("j"))
      .select($"j", pmod(graft.queries.QueryUtils.hex8(
        concat(lit("cms"), $"j".cast("string"), lit(":"), $"tok")),
        lit(1024L)).as("b"))
      .groupBy($"j", $"b").agg(count(lit(1)).as("n"))
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").localCheckpoint(true)
    val total = docs.select(explode(graft.functions.Text.tokens($"text")))
      .count()
    val full = cellsOf(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    (0 until 4).foreach { j =>
      assert(full.collect { case ((`j`, _), n) => n }.sum == total,
        s"hash row $j does not conserve the occurrence total") }
    val a = cellsOf(docs.filter($"doc_id" % 2 === 0)).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = cellsOf(docs.filter($"doc_id" % 2 =!= 0)).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == full, "shard sketches do not add to the full sketch")
  }

  test("ta21 CMS-pruned heavy hitters: == exact rollup on the corpus; on a skewed fixture the prune drops >90% of occurrences yet every true heavy hitter survives") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    // gate == the plain exact rollup (the one-sided guarantee, end to end)
    val got = graft.queries.Catalog.byName("ta21_cms_heavy_hitters")
      .fn(spark, sfDir).collect().map(r => (r.getString(0), r.getLong(1)))
    val occ = graft.queries.TextOps.bigramOcc(
      graft.Tables.documents(spark, sfDir)).localCheckpoint(true)
    val total = occ.count()
    val exact = occ.groupBy($"tok").agg(count(lit(1)).as("n"))
      .filter($"n" * 1024L > total)
      .orderBy($"n".desc, $"tok")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.nonEmpty, "no heavy hitters — vacuous")
    assert(got.toSeq == exact.toSeq, "pruned result != exact rollup")

    // skewed fixture: 1 heavy bigram (10k occurrences) + 6000 distinct
    // singletons — the prune must drop >90% of the COLD occurrences
    // (the scale claim: the exact shuffle carries the heavy mass, not
    // the vocabulary) while the heavy hitter always survives
    val fix = (Seq.fill(10000)("hot pair") ++
      (0 until 6000).map(i => s"cold$i x$i")).toDF("tok")
      .localCheckpoint(true)
    val fTotal = fix.agg(count(lit(1)).as("total"))
    val cand = graft.queries.TextOps.cmsHeavyCandidates(fix, fTotal)
      .localCheckpoint(true)
    val coldSurvivors = cand.filter($"tok" =!= "hot pair").count()
    assert(coldSurvivors < 600L,
      s"prune ineffective: $coldSurvivors of 6000 cold occurrences survived")
    assert(cand.filter($"tok" === "hot pair").count() == 10000L,
      "the heavy hitter's occurrences must ALL survive the prune (one-sidedness)")
    val fGot = graft.queries.TextOps.cmsHeavyFinal(cand, fTotal)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(fGot.toSeq == Seq(("hot pair", 10000L)),
      "fixture heavy hitter lost or a false positive survived the exact HAVING")
  }
}
