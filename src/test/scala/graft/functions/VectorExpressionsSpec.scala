package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class VectorExpressionsSpec extends AnyFunSuite with SparkSpec {

  test("quantizedDot equals the composed built-in form") {
    import spark.implicits._
    val df = Seq(
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),
      (Array(-7L, 0L, 9L), Array(2L, 11L, -3L)),
      (Array.empty[Long], Array.empty[Long])
    ).toDF("a", "b")
    val out = df.select(
      VectorExpressions.quantizedDot($"a", $"b").as("fused"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L), (s, x) => s + x).as("composed"))
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(out(0).getLong(0) == 32L)
  }

  test("lshTableBuckets equals the composed per-(table, bit) form, null/empty/short legs included") {
    import spark.implicits._
    val bits = 4
    val tables = 3
    val dim = 8
    // any deterministic planes work for the equivalence pin — use small
    // signed values exercising both branch signs
    val planes = Array.tabulate(tables * bits)(j =>
      Array.tabulate(dim)(i => ((j * 31 + i * 17) % 13 - 6).toLong))
    val df = Seq(
      (1L, Some(Seq(Some(3L), Some(-2L), Some(5L), Some(1L), Some(-9L), Some(4L), Some(0L), Some(7L)))),
      (2L, Some(Seq(Some(0L), Some(0L)))),                        // shorter than dim
      (3L, Some(Seq.empty[Option[Long]])),                        // empty
      (4L, Some(Seq(Some(1L), None, Some(2L)))),                  // null element
      (5L, Option.empty[Seq[Option[Long]]])                       // null array
    ).toDF("id", "q")
    // the pre-r19 composed form, verbatim (Ann.bucketOf + struct explode)
    val composedTb = (0 until tables).map { t =>
      val bitCols = (0 until bits).map { b =>
        val proj = VectorExpressions.quantizedDot($"q", lit(planes(t * bits + b)))
        when(proj >= 0L, lit(1L << b)).otherwise(lit(0L))
      }
      struct(lit(t).as("table"), bitCols.reduce(_ + _).as("bucket"))
    }
    val composed = df.withColumn("__tb", explode(array(composedTb: _*)))
      .select($"id", $"__tb.table".as("table"), $"__tb.bucket".as("bucket"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val fused = df.select($"id",
        posexplode(VectorExpressions.lshTableBuckets($"q", planes, bits))
          .as(Seq("table", "bucket")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(fused == composed, "fused LSH buckets drifted from the composed form")
    // interpreted == codegen
    val expr = VectorExpressions.lshTableBuckets($"q", planes, bits)
    val viaCodegen = df.select($"id", expr.as("b")).orderBy($"id").collect()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val viaEval = df.select($"id", expr.as("b")).orderBy($"id").collect()
      viaCodegen.zip(viaEval).foreach { case (a, b) =>
        assert(a.getSeq[Long](1) == b.getSeq[Long](1), "interpreted/codegen drift")
      }
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("null input yields null (null-intolerant)") {
    import spark.implicits._
    val df = Seq((Some(Array(1L, 2L)), Option.empty[Array[Long]])).toDF("a", "b")
    val r = df.select(VectorExpressions.quantizedDot($"a", $"b")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("participates in whole-stage codegen") {
    import spark.implicits._
    // range → project keeps the whole plan in one codegen stage; a
    // LocalTableScan would never codegen regardless of the expression
    val df = spark.range(100)
      .select(array($"id", $"id" * 2).as("a"), array($"id" + 1, $"id").as("b"))
      .select(VectorExpressions.quantizedDot($"a", $"b").as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [quantized_dot"))
    assert(df.agg(sum($"d")).collect()(0).getLong(0) ==
      (0L until 100L).map(i => i * (i + 1) + 2 * i * i).sum)
  }

  test("mismatched lengths use the shorter prefix") {
    import spark.implicits._
    val df = Seq((Array(1L, 2L, 3L), Array(10L))).toDF("a", "b")
    assert(df.select(VectorExpressions.quantizedDot($"a", $"b"))
      .collect()(0).getLong(0) == 10L)
  }

  test("non-nullable arrays: BHJ-condition shape compiles with fallback disabled") {
    import org.apache.spark.sql.types.ArrayType
    // Round-7 regression: with containsNull=false inputs the expression is
    // non-nullable, nullSafeCodeGen binds ev.isNull to the literal `false`,
    // and an unconditional `${ev.isNull} = true;` in the loop fails Janino
    // ("not an rvalue") — Spark then silently runs the whole
    // BroadcastHashJoin stage interpreted. fallback=false turns that silent
    // fallback into a test failure; the plan-string assertions alone cannot
    // see a runtime compile failure.
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // Only +/* arithmetic in the elements: Remainder/Pmod are nullable
      // (x % 0 → null) and would flip containsNull to true, dodging the
      // regime under test. shiftright keeps cid non-nullable too.
      val cells = spark.range(40).select(
        shiftright(col("id"), 3).as("cid"), col("id").as("vec_id"),
        array(col("id") + 1, col("id") * 2 + 2, lit(3L)).as("q"))
        .withColumn("nrm",
          sqrt(VectorExpressions.quantizedDot(col("q"), col("q")).cast("double")))
      val qField = cells.schema("q")
      assert(!qField.dataType.asInstanceOf[ArrayType].containsNull && !qField.nullable,
        "test must exercise the containsNull=false regime")
      val drops = graft.queries.VectorOps.semanticDropsOver(cells, cells, 0.5)
      assert(drops.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "shape must push quantized_dot into a BroadcastHashJoin condition")
      assert(drops.count() > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("nullable derives from element nullability, not just child nullability") {
    import spark.implicits._
    // containsNull=false + non-null children → non-nullable (codegen emits
    // the branch-free loop); containsNull=true → nullable even with
    // non-null array columns (a null ELEMENT nulls the product, so
    // advertising non-nullable would license IsNull mis-folding).
    val tight = spark.range(1)
      .select(array($"id", $"id").as("a"), array($"id" + 1, $"id").as("b"))
      .select(VectorExpressions.quantizedDot($"a", $"b").as("d"))
    assert(!tight.schema("d").nullable)
    val loose = Seq((Seq(Option(1L)), Seq(Option(2L)))).toDF("a", "b")
      .select(VectorExpressions.quantizedDot($"a", $"b").as("d"))
    assert(loose.schema("d").nullable)
  }

  test("null element nulls the product, matching aggregate-zip_with") {
    import spark.implicits._
    val df = Seq((Seq(Some(1L), None, Some(3L)), Seq(Some(4L), Some(5L), Some(6L))))
      .toDF("a", "b")
    val out = df.select(
      VectorExpressions.quantizedDot($"a", $"b").as("fused"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L), (s, x) => s + x).as("composed"))
      .collect()(0)
    assert(out.isNullAt(0) && out.isNullAt(1))
  }

  test("nearestCentroid matches the brute-force argmax, ties to lowest cid") {
    import spark.implicits._
    // 3 centroids; vec 2 ties centroids 5 and 9 exactly (identical
    // direction) — the lower cid must win
    val cids = Array(9L, 5L, 3L)
    val cqs = Array(Array(10L, 0L), Array(10L, 0L), Array(0L, 7L))
    val cns = Array(10.0, 10.0, 7.0)
    val vecs = Seq(
      (1L, Array(3L, 1L)),   // nearest: x-axis (tie 9/5 -> 5)
      (2L, Array(5L, 0L)),   // exact tie between 9 and 5 -> 5
      (3L, Array(1L, 50L))). // nearest: y-axis -> 3
      toDF("vec_id", "q")
      .withColumn("nrm", sqrt(VectorExpressions.quantizedDot($"q", $"q").cast("double")))
    val out = vecs.select($"vec_id",
        VectorExpressions.nearestCentroid($"q", $"nrm", cids, cqs, cns).as("cid"))
      .orderBy($"vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 5L), (2L, 5L), (3L, 3L)))
  }

  test("nearestCentroid: 80-centroid assignment compiles with fallback disabled") {
    // The regression this expression exists for: the greatest-of-structs
    // composition generated code linear in nlist and blew Janino's budget
    // at nlist = 80 (measured: whole stage silently interpreted, 10x the
    // grouped-argmax cost it was meant to beat). The native loop's code
    // size is constant in nlist — pin that an 80-cell assignment still
    // whole-stage-compiles.
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val cids = (0L until 80L).toArray
      val cqs = cids.map(c => Array.tabulate(64)(i => (c * 31 + i) % 97 + 1L))
      val cns = cqs.map(q => math.sqrt(q.map(x => (x * x).toDouble).sum))
      val vecs = spark.range(500).select(col("id").as("vec_id"),
        org.apache.spark.sql.functions.array(
          (0 until 64).map(i => col("id") * (i + 1) % 101 + 1): _*).as("q"))
        .withColumn("nrm",
          sqrt(VectorExpressions.quantizedDot(col("q"), col("q")).cast("double")))
      val out = vecs.select(
        VectorExpressions.nearestCentroid(col("q"), col("nrm"), cids, cqs, cns).as("cid"))
      assert(out.groupBy("cid").count().count() > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("secondNearestCentroid: rank-2 matches scalar recompute, codegen == interpreted") {
    // The rank-2 branch has its own codegen (the demote + runner-up
    // tracking compile in only at rank = 2) — pin generated code against
    // a scalar-side full sort of the (cos DESC, cid ASC) order, under
    // fallback=false so a Janino failure fails the test instead of
    // silently interpreting. Includes an exact tie (vecs aligned with
    // two identical-direction centroids) where rank-1 takes the lower
    // cid and rank-2 must take the HIGHER of the tied pair.
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      import spark.implicits._
      val cids = Array(9L, 5L, 3L, 7L)
      val cqs = Array(Array(10L, 0L), Array(10L, 0L), Array(0L, 7L), Array(6L, 6L))
      val cns = Array(10.0, 10.0, 7.0, math.sqrt(72.0))
      val vecs = (1L to 40L).map(i => (i, Array(i * 17 % 23 - 11, i * 31 % 19 - 9))).toDF("vec_id", "q")
        .unionByName(Seq((100L, Array(5L, 0L))).toDF("vec_id", "q")) // exact 9/5 tie
        .withColumn("nrm", sqrt(VectorExpressions.quantizedDot($"q", $"q").cast("double")))
        .filter($"nrm" > 0.0)
      val out = vecs.select($"vec_id", $"q", $"nrm",
          VectorExpressions.nearestCentroid($"q", $"nrm", cids, cqs, cns).as("c1"),
          VectorExpressions.secondNearestCentroid($"q", $"nrm", cids, cqs, cns).as("c2"))
        .collect()
      assert(out.nonEmpty)
      out.foreach { r =>
        val q = r.getSeq[Long](1); val nrm = r.getDouble(2)
        val ranked = cids.indices.map { c =>
          val cos = q.zip(cqs(c)).map { case (a, b) => a * b }.sum.toDouble / (nrm * cns(c))
          (cos, cids(c))
        }.sortBy { case (cos, cid) => (-cos, cid) }
        assert(r.getLong(3) == ranked(0)._2, s"rank-1 for vec ${r.getLong(0)}")
        assert(r.getLong(4) == ranked(1)._2, s"rank-2 for vec ${r.getLong(0)}")
      }
      val tie = out.find(_.getLong(0) == 100L).get
      assert(tie.getLong(3) == 5L && tie.getLong(4) == 9L)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("rankedCentroids: top-p matches scalar full-sort prefix, codegen == interpreted") {
    // The generalized probe list (nProbe = p): pin the generated
    // insertion-buffer loop against a scalar-side full sort of the
    // (cos DESC, cid ASC) order at several p, under fallback=false so a
    // Janino failure fails the test. p > nlist must clamp to every cell.
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      import spark.implicits._
      val cids = Array(9L, 5L, 3L, 7L)
      val cqs = Array(Array(10L, 0L), Array(10L, 0L), Array(0L, 7L), Array(6L, 6L))
      val cns = Array(10.0, 10.0, 7.0, math.sqrt(72.0))
      val vecs = (1L to 40L).map(i => (i, Array(i * 17 % 23 - 11, i * 31 % 19 - 9))).toDF("vec_id", "q")
        .unionByName(Seq((100L, Array(5L, 0L))).toDF("vec_id", "q")) // exact 9/5 tie
        .withColumn("nrm", sqrt(VectorExpressions.quantizedDot($"q", $"q").cast("double")))
        .filter($"nrm" > 0.0)
      for (p <- Seq(1, 2, 4, 9)) {
        val out = vecs.select($"vec_id", $"q", $"nrm",
            VectorExpressions.rankedCentroids($"q", $"nrm", cids, cqs, cns, p).as("r"))
          .collect()
        assert(out.nonEmpty)
        out.foreach { r =>
          val q = r.getSeq[Long](1); val nrm = r.getDouble(2)
          val ranked = cids.indices.map { c =>
            val cos = q.zip(cqs(c)).map { case (a, b) => a * b }.sum.toDouble / (nrm * cns(c))
            (cos, cids(c))
          }.sortBy { case (cos, cid) => (-cos, cid) }.map(_._2)
          assert(r.getSeq[Long](3) == ranked.take(p),
            s"top-$p for vec ${r.getLong(0)}")
        }
      }
      // agreement with the rank-1/rank-2 single-result expressions
      val both = vecs.select(
          VectorExpressions.nearestCentroid($"q", $"nrm", cids, cqs, cns).as("c1"),
          VectorExpressions.secondNearestCentroid($"q", $"nrm", cids, cqs, cns).as("c2"),
          VectorExpressions.rankedCentroids($"q", $"nrm", cids, cqs, cns, 2).as("r"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[Long](2) == Seq(r.getLong(0), r.getLong(1)))
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("rankedCentroids null contract: null array/nrm and null element all yield null") {
    import spark.implicits._
    val cids = Array(1L, 2L)
    val cqs = Array(Array(1L, 1L), Array(1L, 0L))
    val cns = Array(math.sqrt(2.0), 1.0)
    val df = Seq(
      (1L, Some(Seq(Some(1L), Some(2L))), Some(2.0)),
      (2L, None, Some(2.0)),
      (3L, Some(Seq(Some(1L), None)), Some(2.0)),
      (4L, Some(Seq(Some(1L), Some(2L))), None)
    ).toDF("vec_id", "q", "nrm")
    val out = df.select($"vec_id",
        VectorExpressions.rankedCentroids($"q", $"nrm", cids, cqs, cns, 2).as("r"))
      .orderBy($"vec_id").collect()
    assert(out(0).getSeq[Long](1) == Seq(1L, 2L))
    assert(out(1).isNullAt(1) && out(2).isNullAt(1) && out(3).isNullAt(1))
  }

  test("nearestCentroid null contract: null array/nrm and null element all yield null") {
    import spark.implicits._
    val cids = Array(1L); val cqs = Array(Array(1L, 1L)); val cns = Array(math.sqrt(2.0))
    val df = Seq(
      (1L, Some(Seq(Some(1L), Some(2L))), Some(2.0)),
      (2L, None, Some(2.0)),
      (3L, Some(Seq(Some(1L), None)), Some(2.0)),
      (4L, Some(Seq(Some(1L), Some(2L))), None)
    ).toDF("vec_id", "q", "nrm")
    val out = df.select($"vec_id",
        VectorExpressions.nearestCentroid($"q", $"nrm", cids, cqs, cns).as("cid"))
      .orderBy($"vec_id").collect()
    assert(out(0).getLong(1) == 1L)
    assert(out(1).isNullAt(1) && out(2).isNullAt(1) && out(3).isNullAt(1))
  }
}
