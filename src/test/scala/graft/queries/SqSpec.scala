package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The SQ8 scalar-quantization kernel (vs15), pinned independently of the
  * oracle: train/encode/decode must agree with a direct Scala model of the
  * integer arithmetic, the code range must be exactly [0, 255] with both
  * extremes REACHED at the trained bounds, and the reconstruction error
  * must respect the affine-grid bound. */
class SqSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** The Scala model: one integer floor-division pipeline per dimension. */
  private def model(x: Long, mn: Long, df: Long): (Long, Long) = {
    val code = if (df == 0L) 0L else ((x - mn) * 255L) / df
    (code, mn + (if (df == 0L) 0L else (code * df) / 255L))
  }

  test("sq: codes/recon equal the Scala integer model on the real corpus; codes span [0,255]; extremes hit at the bounds") {
    val e = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), graft.operators.Ann.quantize(col("embedding")).as("q"))
      .withColumn("nrm", sqrt(graft.operators.Ann.dotQ(col("q"), col("q")).cast("double")))
      .filter(col("nrm") > 0.0)
    val (vmin, vdiff) = VectorOps.sqTrain(e)
    assert(vmin.nonEmpty)
    val rows = e.select(col("vec_id"), col("q"),
        VectorOps.sqCodes(col("q"), vmin, vdiff).as("codes"),
        VectorOps.sqRecon(VectorOps.sqCodes(col("q"), vmin, vdiff), vmin, vdiff).as("recon"))
      .collect()
    assert(rows.nonEmpty)
    var hit0 = false; var hit255 = false
    rows.foreach { r =>
      val q = r.getSeq[Long](1); val c = r.getSeq[Long](2); val rec = r.getSeq[Long](3)
      q.indices.foreach { i =>
        val (mc, mr) = model(q(i), vmin(i), vdiff(i))
        assert(c(i) == mc, s"code drift at vec ${r.getLong(0)} dim $i")
        assert(rec(i) == mr, s"recon drift at vec ${r.getLong(0)} dim $i")
        assert(c(i) >= 0L && c(i) <= 255L, s"code out of byte range: ${c(i)}")
        if (c(i) == 0L) hit0 = true
        if (c(i) == 255L) hit255 = true
        // affine-grid error bound: recon never overshoots x, and
        // undershoots by less than one cell width (+1 for the two floors)
        val err = q(i) - rec(i)
        assert(err >= 0L && err <= vdiff(i) / 255L + 1L,
          s"recon error $err out of bound at dim $i (vdiff ${vdiff(i)})")
      }
    }
    // per-dim min encodes 0 and per-dim max encodes 255 by construction —
    // both extremes must appear somewhere in the corpus
    assert(hit0 && hit255, "trained bounds not reached by any code")
  }

  test("sq: constant dimension encodes 0 and reconstructs exactly") {
    import spark.implicits._
    val df = Seq((1L, Seq(7L, 0L)), (2L, Seq(7L, 3L)), (3L, Seq(7L, 9L)))
      .toDF("vec_id", "q")
    val (vmin, vdiff) = VectorOps.sqTrain(df)
    assert(vmin.toSeq == Seq(7L, 0L) && vdiff.toSeq == Seq(0L, 9L))
    val out = df.select(col("vec_id"),
        VectorOps.sqCodes(col("q"), vmin, vdiff).as("c"),
        VectorOps.sqRecon(VectorOps.sqCodes(col("q"), vmin, vdiff), vmin, vdiff).as("r"))
      .orderBy(col("vec_id")).collect()
    out.foreach { r =>
      assert(r.getSeq[Long](1).head == 0L)
      assert(r.getSeq[Long](2).head == 7L, "constant dim must reconstruct exactly")
    }
    // the varying dim: 0 → code 0, 9 → code 255
    assert(out(0).getSeq[Long](1)(1) == 0L)
    assert(out(2).getSeq[Long](1)(1) == 255L)
  }
}
