package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins the r18 native kernels (QuantizeVector / PqEncodeVector /
  * SqEncodeVector / SqAdistance) element-for-element against the exact
  * composed higher-order-function forms they replaced — the optimization
  * changed operator INTERNALS (guide §4 codegen promotion), so the old
  * form is kept here as the executable reference. */
class PqExpressionsSpec extends AnyFunSuite with SparkSpec {

  // deterministic pseudo-random vectors: values in [-1.2, 1.2] with sign
  // structure, including exact-boundary values that stress floor()
  private def vecs(n: Int, dim: Int): Seq[Seq[Float]] =
    (0 until n).map { r =>
      (0 until dim).map { d =>
        val h = graft.functions.Md5Fold32.fold(
          s"pqx:$r:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        ((h % 24001L) - 12000L).toFloat / 10000.0f
      }
    }

  test("quantizeVec equals the composed transform form") {
    import spark.implicits._
    val df = vecs(200, 16).map(v => Tuple1(v)).toDF("e")
    val out = df.select(
      PqExpressions.quantizeVec($"e").as("fused"),
      transform($"e", x => floor(x.cast("double") * 10000.0).cast("long"))
        .as("composed")).collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
    // negative values floor AWAY from zero — the case a truncating cast
    // would get wrong
    val neg = Seq(Tuple1(Seq(-0.00015f, 0.00015f, -1.0f))).toDF("e")
      .select(PqExpressions.quantizeVec($"e")).collect()(0).getSeq[Long](0)
    assert(neg == Seq(-2L, 1L, -10000L))
  }

  test("quantizeVec null contract: null array → null; null element → null element") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(Some(0.5), None, Some(-0.5)))),
      (2L, None)
    ).toDF("id", "e")
    val rows = df.select($"id", PqExpressions.quantizeVec($"e").as("q"))
      .orderBy($"id").collect()
    val a = rows(0).getSeq[Any](1)
    assert(a == Seq(5000L, null, -5000L))
    assert(rows(1).isNullAt(1))
  }

  test("pqEncode equals the composed array_position(array_min) form") {
    import spark.implicits._
    val dim = 16; val subDims = 4; val m = dim / subDims; val nCodes = 7
    val data = vecs(300, dim).map(v => v.map(x => math.floor(x * 10000.0).toLong))
    // books cut from the first nCodes rows — vs08's fixed-book convention
    val books: IndexedSeq[Seq[Seq[Long]]] = (0 until m).map { sp =>
      data.take(nCodes).map(_.slice(sp * subDims, sp * subDims + subDims))
    }
    val df = data.map(v => Tuple1(v)).toDF("q")
    def dists(sp: Int) =
      transform(typedLit(books(sp)), w =>
        aggregate(zip_with(slice($"q", sp * subDims + 1, subDims), w,
          (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x))
    val composed = array((0 until m).map(sp =>
      array_position(dists(sp), array_min(dists(sp))) - 1L): _*)
    val out = df.select(
      PqExpressions.pqEncode($"q",
        books.map(_.map(_.toArray).toArray).toArray, subDims).as("fused"),
      composed.as("composed")).collect()
    out.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    // ties must break to the FIRST minimum in book order: a book with a
    // duplicated codeword must never emit the second copy's position
    val dupBooks = Array(Array(Array(5L, 5L), Array(1L, 1L), Array(1L, 1L)))
    val tie = Seq(Tuple1(Seq(1L, 1L))).toDF("q")
      .select(PqExpressions.pqEncode($"q", dupBooks, 2)).collect()(0).getSeq[Long](0)
    assert(tie == Seq(1L))
  }

  test("sqEncode equals the composed transform form (clamp + vdiff=0 legs)") {
    import spark.implicits._
    val vmin = Array(-10000L, 0L, 5L, -3L)
    val vdiff = Array(20000L, 0L, 10L, 7L)
    // includes out-of-bounds values on both sides (the clamp legs)
    val data = Seq(
      Seq(-10000L, 4L, 5L, -3L),
      Seq(10000L, 0L, 15L, 4L),
      Seq(-20000L, -7L, 99L, -9L),
      Seq(0L, 1L, 7L, 0L))
    val df = data.map(v => Tuple1(v)).toDF("q")
    def idivNonneg(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ((a - pmod(a, b)) / b).cast("long")
    val composed = transform($"q", (x, i) => {
      val mn = element_at(typedLit(vmin), (i + 1).cast("int"))
      val df0 = element_at(typedLit(vdiff), (i + 1).cast("int"))
      when(df0 === 0L, 0L).otherwise(
        greatest(lit(0L), least(lit(255L), idivNonneg((x - mn) * 255L, df0))))
    })
    val out = df.select(
      PqExpressions.sqEncode($"q", vmin, vdiff).as("fused"),
      composed.as("composed")).collect()
    out.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("sqAdist equals the composed aggregate∘zip_with∘sqRecon form") {
    import spark.implicits._
    val dim = 8
    val vmin = Array.tabulate(dim)(i => -9000L + 13L * i)
    val vdiff = Array.tabulate(dim)(i => if (i == 3) 0L else 17000L + 7L * i)
    val qs = vecs(50, dim).map(v => v.map(x => math.floor(x * 10000.0).toLong))
    val codes = (0 until 50).map(r =>
      Array.tabulate(dim)(d => (graft.functions.Md5Fold32.fold(
        s"c:$r:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8)) % 256L + 256L) % 256L).toSeq)
    val df = qs.zip(codes).map { case (q, c) => (q, c) }.toDF("qq", "codes")
    val composed = aggregate(zip_with($"qq",
      graft.queries.VectorOps.sqRecon($"codes", vmin, vdiff),
      (a, b) => (a - b) * (a - b)), lit(0L), (acc, y) => acc + y)
    val out = df.select(
      PqExpressions.sqAdist($"qq", $"codes", vmin, vdiff).as("fused"),
      composed.as("composed")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("all four participate in whole-stage codegen (no fallback)") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val books = Array(Array(Array(1L, 2L), Array(3L, 4L)))
      val vmin = Array(0L, 0L); val vdiff = Array(10L, 10L)
      val df = spark.range(50)
        .select(array(($"id" % 7).cast("double") / lit(3.0),
          ($"id" % 5).cast("double") / lit(2.0)).as("e"))
        .select(PqExpressions.quantizeVec($"e").as("q"))
        .select($"q", PqExpressions.pqEncode($"q", books, 2).as("pc"),
          PqExpressions.sqEncode($"q", vmin, vdiff).as("sc"))
        .select(PqExpressions.sqAdist($"q", $"sc", vmin, vdiff).as("ad"),
          element_at($"pc", 1).as("c0"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*(1)"), s"expected whole-stage codegen:\n$plan")
      assert(df.agg(sum($"ad"), sum($"c0")).collect()(0).getLong(0) >= 0L)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
