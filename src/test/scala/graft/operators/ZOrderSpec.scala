package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Z-order layout: exact interleave arithmetic at the bit level,
  * quantizer edge behavior, and the file-skipping contract measured on
  * real parquet footers — a z-ordered write must give every file a
  * small bounding rectangle in BOTH dimensions, where a single-column
  * sort leaves the other dimension's per-file range at full width
  * (nothing to skip). */
class ZOrderSpec extends AnyFunSuite with SparkSpec {

  test("zValue interleaves bits exactly; quantizer hits its edges and clamps strays") {
    import spark.implicits._
    // (x, y, expected z) for 8-bit dims: x bit i -> z bit 2i, y -> 2i+1
    val cases = Seq(
      (0L, 0L, 0L),
      (3L, 0L, 5L), // 0b11 -> 0b0101
      (0L, 3L, 10L), // 0b11 -> 0b1010
      (255L, 255L, 65535L),
      (1L, 2L, 9L), // x bit0 -> z0, y bit1 -> z3: 0b1001
      (128L, 0L, 16384L)) // x bit7 -> z14
    val got = cases.map(c => (c._1, c._2)).toDF("x", "y")
      .select(ZOrder.zValue(Seq($"x", $"y"), 8).as("z"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == cases.map(_._3), "interleave drifted from the bit definition")

    val q = Seq(10L, 1009L, 509L, 5L, 2000L).toDF("v")
      .select(ZOrder.quantized($"v", 10L, 1009L, 8).as("q"))
      .collect().map(_.getLong(0))
    assert(q(0) == 0L && q(1) == 255L, "domain edges missed the corner cells")
    assert(q(2) == (499L * 256L) / 1000L, "interior quantization drifted")
    assert(q(3) == 0L && q(4) == 255L, "out-of-domain values did not clamp")

    // single-value domain (a one-supplier tenant slice): every in-domain
    // row lands in cell 0, strays still clamp — must quantize, not throw
    val q1 = Seq(7L, 3L, 99L).toDF("v")
      .select(ZOrder.quantized($"v", 7L, 7L, 8).as("q"))
      .collect().map(_.getLong(0))
    assert(q1.toSeq == Seq(0L, 0L, 255L),
      "single-value domain did not map to cell 0 with edge clamping")
  }

  test("q48 gate survives a constant-key corpus and an empty corpus") {
    import spark.implicits._
    val root = Files.createTempDirectory("q48degen").toString
    val gate = graft.queries.Catalog.byName("q48_zorder_cells").fn
    // constant (l_partkey, l_suppkey): both quantized domains are
    // single-valued -> every row in z cell 0
    graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .withColumn("l_partkey", lit(1).cast("int"))
      .withColumn("l_suppkey", lit(1).cast("int"))
      .write.parquet(s"$root/one/lineitem.parquet")
    val one = gate(spark, s"$root/one").collect()
    assert(one.length == 1 && one.head.getAs[Long]("cell") == 0L
      && one.head.getAs[Long]("min_z") == 0L && one.head.getAs[Long]("max_z") == 0L,
      s"constant-key corpus did not collapse to z cell 0: ${one.toSeq}")
    // empty corpus -> empty frame with the gate's schema, no NULL bounds crash
    graft.Tables.lineitem(spark, "/root/testdata/sf0.001").limit(0)
      .write.parquet(s"$root/empty/lineitem.parquet")
    val empty = gate(spark, s"$root/empty")
    assert(empty.columns.toSeq == Seq("cell", "n", "min_z", "max_z", "sum_qty")
      && empty.count() == 0, "empty corpus did not yield an empty q48 frame")
  }

  test("q48 gate: cells partition the corpus; z extents stay inside their cell") {
    val rows = graft.queries.Catalog.byName("q48_zorder_cells")
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty, "no cells — vacuous")
    val total = rows.map(_.getAs[Long]("n")).sum
    val corpus = graft.Tables.lineitem(spark, "/root/testdata/sf0.001").count()
    assert(total == corpus, "cell counts do not partition the corpus")
    rows.foreach { r =>
      val (cell, lo, hi) = (r.getAs[Long]("cell"),
        r.getAs[Long]("min_z"), r.getAs[Long]("max_z"))
      assert(lo >= cell * 1024 && hi < (cell + 1) * 1024 && lo <= hi,
        s"cell $cell extents [$lo,$hi] escape the cell")
    }
  }

  test("file-skipping: z-ordered footers prune both dimensions; a one-column sort prunes only its own") {
    import spark.implicits._
    val n = 40000
    val dom = 4096L
    // deterministic pseudo-uniform grid points via the engine hash
    val df = (1 to n).toDF("i")
      .select($"i".cast("long").as("i"),
        (graft.queries.QueryUtils.hex8(concat(lit("zx:"), $"i")) % dom).as("x"),
        (graft.queries.QueryUtils.hex8(concat(lit("zy:"), $"i")) % dom).as("y"))
      .localCheckpoint(true)
    val root = Files.createTempDirectory("zorder").toString
    val (linDir, zDir) = (s"$root/linear", s"$root/zordered")
    val files = 64
    df.repartitionByRange(files, $"x").sortWithinPartitions($"x")
      .write.parquet(linDir)
    ZOrder.writeZOrdered(df, zDir,
      Seq("x" -> (0L, dom - 1), "y" -> (0L, dom - 1)), bits = 12, files = files)

    def bboxes(dir: String): Seq[(Long, Long, Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min($"x"), max($"x"), min($"y"), max($"y"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq
    val (lin, zo) = (bboxes(linDir), bboxes(zDir))
    assert(lin.size == files && zo.size == files,
      s"expected $files files per layout, got ${lin.size}/${zo.size}")
    // rows survive the reshuffle bit-for-bit
    assert(spark.read.parquet(zDir).orderBy($"i").collect().toSeq ==
      df.orderBy($"i").collect().toSeq, "z-ordered write lost/changed rows")

    def touches(bs: Seq[(Long, Long, Long, Long)],
        xr: Option[(Long, Long)], yr: Option[(Long, Long)]): Int =
      bs.count { case (xlo, xhi, ylo, yhi) =>
        xr.forall { case (a, b) => xhi >= a && xlo <= b } &&
          yr.forall { case (a, b) => yhi >= a && ylo <= b }
      }
    // y-only eighth-of-domain predicate: the x-sorted layout cannot
    // skip ANY file; the z layout must skip more than half (the curve
    // is not axis-perfect — boundary-straddling files keep wide boxes,
    // so the bound is conservative vs the 1/8 ideal)
    val yq = touches(_: Seq[(Long, Long, Long, Long)], None, Some((1024L, 1535L)))
    assert(yq(lin) == files, "x-sorted files unexpectedly pruned a y predicate")
    assert(yq(zo) <= files * 3 / 8, s"z layout pruned too little on y: ${yq(zo)}/$files files")
    // rectangle, half of x times an eighth of y: the x-sort prunes only
    // its own dimension (half the files); z prunes both
    val rect = touches(_: Seq[(Long, Long, Long, Long)],
      Some((0L, 2047L)), Some((0L, 511L)))
    assert(rect(lin) >= files / 2 - 1,
      s"linear rectangle baseline unexpectedly small: ${rect(lin)}/$files")
    assert(rect(zo) * 2 <= rect(lin),
      s"z layout (${rect(zo)}) not 2x tighter than linear (${rect(lin)}) on a rectangle")
  }
}
