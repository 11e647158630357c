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
    assert(e.getMessage.contains("does not match the sketch's build k"),
      s"wrong failure: ${e.getMessage}")
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
