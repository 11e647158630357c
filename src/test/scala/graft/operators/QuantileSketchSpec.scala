package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Quantile sketch: exactness below saturation, MERGE INVARIANCE (the
  * property KLL cannot give — the sketch is a set function, identical
  * under every partitioning and era split, overlapping deliveries
  * included), the sample-vs-exact error at saturation, the row-local
  * merged() == aggregator merge, the bounded-buffer plan contract, and
  * the ta24 gate against a first-principles replay. */
class QuantileSketchSpec extends AnyFunSuite with SparkSpec {

  private val K = 32
  private val PS = Seq(("p50", 50, 100), ("p90", 90, 100))

  // deterministic (h, v) rows: h = md5 fold of the unique id
  private def rows(ids: Seq[Long], group: String = "g1"): DataFrame = {
    import spark.implicits._
    ids.map(i => (group, i)).toDF("g", "id")
      .select($"g", graft.queries.QueryUtils.hex8(
        concat(lit("t:"), $"id".cast("string"))).as("h"),
        ($"id" * 7 % 1000).as("v"))
  }

  private def sk(df: DataFrame, parts: Int): Seq[(Long, Long)] = {
    val s = QuantileSketch.sketch(df.repartition(parts), "g", col("h"), col("v"), K)
      .collect()
    assert(s.length == 1)
    val r = s.head
    r.getSeq[Long](r.fieldIndex("hs")).zip(r.getSeq[Long](r.fieldIndex("vs"))).toSeq
  }

  test("unsaturated sketch IS the group; estimates are exact type-1 percentiles") {
    import spark.implicits._
    val df = rows(1L to 20L)
    val got = QuantileSketch.quantiles(
      QuantileSketch.sketch(df, "g", $"h", $"v", K), K, PS).collect().head
    val vals = df.select($"v").collect().map(_.getLong(0)).sorted
    assert(got.getAs[Long]("n_kept") == 20L, "unsaturated sample must hold the group")
    assert(got.getAs[Long]("p50") == vals((19 * 50) / 100), "exact p50 drifted")
    assert(got.getAs[Long]("p90") == vals((19 * 90) / 100), "exact p90 drifted")
  }

  test("merge invariance: identical sketch under 1/3/13 partitions and any era split") {
    val df = rows(1L to 500L)
    val base = sk(df, 1)
    assert(base.length == K, "expected a saturated sketch")
    for (p <- Seq(3, 13))
      assert(sk(df, p) == base, s"sketch drifted under $p partitions")
    // era split: sketch-of-union-of-samples == sketch-of-union (pp32's
    // advance identity), including an OVERLAPPING split (ids 200-300 in
    // both eras — the pair dedup must absorb them)
    for ((a, b) <- Seq((1L to 300L, 301L to 500L), (1L to 300L, 200L to 500L))) {
      val sa = QuantileSketch.sketch(rows(a), "g", col("h"), col("v"), K)
        .select(col("g"), explode(arrays_zip(col("hs"), col("vs"))).as("p"))
        .select(col("g"), col("p.hs").as("h"), col("p.vs").as("v"))
      val sb = QuantileSketch.sketch(rows(b), "g", col("h"), col("v"), K)
        .select(col("g"), explode(arrays_zip(col("hs"), col("vs"))).as("p"))
        .select(col("g"), col("p.hs").as("h"), col("p.vs").as("v"))
      val merged = sk(sa.unionByName(sb), 4)
      assert(merged == base,
        s"bottom-k of unioned samples != bottom-k of the union (split $a/$b)")
    }
  }

  test("row-local merged() equals the aggregator's merge") {
    import spark.implicits._
    val a = QuantileSketch.sketch(rows(1L to 300L), "g", $"h", $"v", K)
    val b = QuantileSketch.sketch(rows(200L to 500L), "g", $"h", $"v", K)
    val m = a.select($"g", $"hs".as("ha"), $"vs".as("va"))
      .join(b.select($"g", $"hs".as("hb"), $"vs".as("vb")), Seq("g"))
      .select(QuantileSketch.merged($"ha", $"va", $"hb", $"vb", K).as("m"))
      .select($"m.hs", $"m.vs").collect().head
    val got = m.getSeq[Long](0).zip(m.getSeq[Long](1)).toSeq
    assert(got == sk(rows(1L to 500L), 1), "merged() drifted from the aggregator")
  }

  test("saturated estimates stay within the sample rank-error band of exact") {
    import spark.implicits._
    val n = 2000L
    val df = rows(1L to n)
    val got = QuantileSketch.quantiles(
      QuantileSketch.sketch(df, "g", $"h", $"v", K), K, PS).collect().head
    val vals = df.select($"v").collect().map(_.getLong(0)).sorted
    // rank error of a k-sample ~ O(n/sqrt(k)); assert a loose 3x band so
    // the test pins "sampling, not garbage" without flaking on the tail
    def rankOf(v: Long) = vals.indexWhere(_ >= v).toLong
    for ((name, num, den) <- PS) {
      val est = got.getAs[Long](name)
      val wantRank = (n - 1) * num / den
      assert(math.abs(rankOf(est) - wantRank) <= 3 * n / math.sqrt(K).toLong,
        s"$name rank error beyond the sampling band: est=$est")
    }
  }

  test("plan: bounded buffers combine map-side; no window, no value-stream shuffle") {
    import spark.implicits._
    // repartition BEFORE deriving (h, v), so the only exchange that could
    // carry them is the aggregate's own
    val src = (1L to 5000L).toDF("id").repartition(8)
      .select(lit("g1").as("g"), graft.queries.QueryUtils.hex8(
        concat(lit("t:"), $"id".cast("string"))).as("h"),
        ($"id" * 7 % 1000).as("v"))
    val df = QuantileSketch.sketch(src, "g", $"h", $"v", K)
    df.collect()
    val ns = PlanInspect.nodes(df)
    assert(ns.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec]),
      "expected an ObjectHashAggregate with partial combine")
    assert(!ns.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "a window sneaked into the sketch plan")
    PlanInspect.shuffles(df).map(_.child.output.map(_.name).toSet).foreach(p =>
      assert(!p.contains("v") && !p.contains("h"),
        s"the value stream crossed the shuffle: $p"))
  }

  test("k mismatch raises with the defect named, not a silent mis-estimate") {
    import spark.implicits._
    val sketched = QuantileSketch.sketch(rows(1L to 100L), "g", $"h", $"v", K)
    val e = intercept[Exception] {
      QuantileSketch.quantiles(sketched, K * 2, PS).collect()
    }
    assert(e.getMessage.contains("k mismatch"),
      s"wrong failure: ${e.getMessage}")
  }

  test("raw-bits transform: order-preserving involution, specials included") {
    import graft.functions.DoubleSortable
    import spark.implicits._
    val specials = Seq(0.0, -0.0, Double.MinPositiveValue,
      -Double.MinPositiveValue, 1.5, -1.5, math.Pi, -math.Pi,
      Double.MaxValue, Double.MinValue, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.NaN, 1e308, -1e308, 1e-310, -1e-310)
    def bits(d: Double) = java.lang.Double.doubleToLongBits(d)
    // involution: exact round trip for every special (NaN-safe via bits)
    for (d <- specials)
      assert(bits(DoubleSortable.toDouble(DoubleSortable.toSortable(d)))
        == bits(d), s"round trip drifted for $d")
    // total order: sorting by the transformed long == Double.compare
    // order (-0.0 < +0.0, NaN above +Inf)
    val byBits = specials.sortBy(DoubleSortable.toSortable).map(bits)
    val byCmp = specials.sortWith(java.lang.Double.compare(_, _) < 0).map(bits)
    assert(byBits == byCmp, "transformed order diverged from Double.compare")
    // the codegen'd Column pair round-trips bit-exactly too
    val got = specials.toDF("v").repartition(3)
      .select(DoubleSortable.fromSortableLong(
        DoubleSortable.toSortableLong($"v")).as("rt"))
      .collect().map(r => bits(r.getDouble(0))).sorted
    assert(got.toSeq == specials.map(bits).sorted, "Column round trip drifted")
  }

  // deterministic DOUBLE rows: v = id/7 — a genuine fractional double
  // (IEEE division, exact cross-engine), h = md5 fold of the unique id
  private def drows(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.map(i => ("g1", i)).toDF("g", "id")
      .select($"g", graft.queries.QueryUtils.hex8(
        concat(lit("d:"), $"id".cast("string"))).as("h"),
        ($"id".cast("double") / lit(7.0d)).as("v"))
  }

  private def skD(df: DataFrame, parts: Int): Seq[(Long, Long)] = {
    val s = QuantileSketch
      .sketchDouble(df.repartition(parts), "g", col("h"), col("v"), K)
      .collect()
    assert(s.length == 1)
    val r = s.head
    r.getSeq[Long](r.fieldIndex("hs")).zip(r.getSeq[Long](r.fieldIndex("vs"))).toSeq
  }

  test("sketchDouble: merge invariance under partitionings and overlapping era splits") {
    val df = drows(1L to 500L)
    val base = skD(df, 1)
    assert(base.length == K, "expected a saturated sketch")
    for (p <- Seq(3, 13))
      assert(skD(df, p) == base, s"double sketch drifted under $p partitions")
    // era split incl. overlap: exploded sample rows re-sketch to the same
    // sketch (the pp32 advance identity holds in the double domain —
    // the standing layout never looks at the value, only its order)
    for ((a, b) <- Seq((1L to 300L, 301L to 500L), (1L to 300L, 200L to 500L))) {
      def sample(ids: Seq[Long]) = QuantileSketch
        .sketchDouble(drows(ids), "g", col("h"), col("v"), K)
        .select(col("g"), explode(arrays_zip(col("hs"), col("vs"))).as("p"))
        .select(col("g"), col("p.hs").as("h"), col("p.vs").as("v"))
      // the union of exploded samples carries TRANSFORMED longs; re-sketch
      // through the long path and tag-match against the full double sketch
      val merged = QuantileSketch.sketch(
        sample(a).unionByName(sample(b)), "g", col("h"), col("v"), K)
        .collect().head
      val got = merged.getSeq[Long](merged.fieldIndex("hs"))
        .zip(merged.getSeq[Long](merged.fieldIndex("vs"))).toSeq
      assert(got == base,
        s"double bottom-k of unioned samples != bottom-k of the union ($a/$b)")
    }
  }

  test("quantilesDouble: exact selected-value estimates below saturation; domain tags guard both crossings") {
    import spark.implicits._
    val df = drows(1L to 20L)
    val got = QuantileSketch.quantilesDouble(
      QuantileSketch.sketchDouble(df, "g", $"h", $"v", K), K, PS)
      .collect().head
    val vals = df.select($"v").collect().map(_.getDouble(0)).sorted
    assert(got.getAs[Long]("n_kept") == 20L)
    assert(got.getAs[Double]("p50") == vals((19 * 50) / 100),
      "p50 must be the exact type-1 percentile (a selected sample value)")
    assert(got.getAs[Double]("p90") == vals((19 * 90) / 100))
    // crossing the domains fails loudly in both directions
    val dSketch = QuantileSketch.sketchDouble(df, "g", $"h", $"v", K)
    val lSketch = QuantileSketch.sketch(rows(1L to 20L), "g", $"h", $"v", K)
    for ((label, bad) <- Seq(
        "quantiles on a double sketch" ->
          (() => QuantileSketch.quantiles(dSketch, K, PS).collect()),
        "quantilesDouble on a bigint sketch" ->
          (() => QuantileSketch.quantilesDouble(lSketch, K, PS).collect()))) {
      val e = intercept[Exception](bad())
      assert(e.getMessage.contains("crossed domains"), s"$label: ${e.getMessage}")
    }
  }

  test("ta25 gate == first-principles double bottom-k replay on the corpus") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"source", $"n_chars",
        size(graft.functions.Text.tokens($"text")).as("nt"))
      .where($"n_chars".isNotNull && $"nt" > 0)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2).toDouble / r.getInt(3).toDouble))
    def fold(s: String): Long =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    import graft.functions.DoubleSortable.toSortable
    val want = docs.groupBy(_._2).toSeq.map { case (src, ds) =>
      val pairs = ds.map { case (id, _, v) => (fold(s"qsd:$id"), toSortable(v)) }
        .distinct.sorted.take(256)
      val vs = pairs.map(_._2).sorted.map(graft.functions.DoubleSortable.toDouble)
      def q(num: Int) = vs(((vs.length - 1) * num) / 100)
      (src, vs.length.toLong, q(50), q(90), q(99))
    }.sortBy(_._1)
    val got = graft.queries.Catalog.byName("ta25_quantile_sketch_double")
      .fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_kept"),
        r.getAs[Double]("p50"), r.getAs[Double]("p90"), r.getAs[Double]("p99")))
      .toSeq
    assert(got.nonEmpty, "no sources — vacuous")
    assert(got == want, "ta25 drifted from the first-principles replay")
  }

  test("ta24 gate == first-principles bottom-k replay on the corpus") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"source", $"n_chars")
      .where($"n_chars".isNotNull)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def fold(s: String): Long =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    val want = docs.groupBy(_._2).toSeq.map { case (src, ds) =>
      val pairs = ds.map { case (id, _, v) =>
        (fold(s"qs:$id"), v)
      }.distinct.sorted.take(256)
      val vs = pairs.map(_._2).sorted
      def q(num: Int) = vs(((vs.length - 1) * num) / 100)
      (src, vs.length.toLong, q(50), q(90), q(99))
    }.sortBy(_._1)
    val got = graft.queries.Catalog.byName("ta24_quantile_sketch")
      .fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_kept"), r.getAs[Long]("p50"),
        r.getAs[Long]("p90"), r.getAs[Long]("p99"))).toSeq
    assert(got.nonEmpty, "no sources — vacuous")
    assert(got == want, "ta24 drifted from the first-principles replay")
  }
}
