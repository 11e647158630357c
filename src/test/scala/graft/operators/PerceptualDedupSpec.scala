package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.{PerceptualBands, PerceptualExpressions}

/** mm04's machinery: the native perceptual signature, the Hamming-banded
  * candidate join, the ≤ tau completeness guarantee, and the hot-bucket
  * cap. */
class PerceptualDedupSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def scalaBands(bytes: Array[Byte]): Seq[Int] =
    PerceptualBands.bands(bytes).toSeq

  test("signature matches an independent per-bit recompute; codegen == interpreted") {
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      import spark.implicits._
      val payloads = Seq(
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
        "spark scan table hash batch vector key customer merge",
        "x" * 1000 + "y" * 7)
      val df = payloads.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t").withColumn("blob", encode($"t", "UTF-8"))
      val got = df.select($"id",
          PerceptualExpressions.perceptualBands($"blob").as("pb"))
        .orderBy($"id").collect().map(_.getSeq[Int](1))
      payloads.zipWithIndex.foreach { case (t, i) =>
        val bytes = t.getBytes("UTF-8")
        val n = bytes.length
        // independent recompute straight from the definition
        val hist = new Array[Int](64)
        bytes.sliding(2).foreach { p =>
          if (p.length == 2) hist(((p(0) & 0xff) * 31 + (p(1) & 0xff)) % 64) += 1
        }
        val expect = Array.fill(4)(0)
        for (v <- 0 until 64)
          if (n >= 2 && hist(v).toLong * 64 > (n - 1))
            expect(v / 16) |= 1 << (15 - v % 16)
        assert(got(i) == expect.toSeq, s"payload $i")
        assert(got(i) == scalaBands(bytes), s"eval helper parity, payload $i")
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("degenerate payloads: empty and 1-byte sign all-zero, null signs null") {
    import spark.implicits._
    assert(scalaBands(Array.empty) == Seq(0, 0, 0, 0))
    assert(scalaBands(Array(42.toByte)) == Seq(0, 0, 0, 0))
    val df = Seq((1L, Some(Array.empty[Byte])), (2L, Some(Array(7.toByte))),
        (3L, Option.empty[Array[Byte]]))
      .toDF("id", "blob")
    val out = df.select($"id",
        PerceptualExpressions.perceptualBands($"blob").as("pb"))
      .orderBy($"id").collect()
    assert(out(0).getSeq[Int](1) == Seq(0, 0, 0, 0))
    assert(out(1).getSeq[Int](1) == Seq(0, 0, 0, 0))
    assert(out(2).isNullAt(1))
  }

  test("frequency domain is insertion-robust where position blocks are not") {
    // the design-driving property: inserting a word near the front shifts
    // every downstream byte but changes only a handful of bigram counts,
    // so the signature moves a few bits at most
    val base = ("spark scan table hash batch vector key customer merge " * 6).trim
    val edited = "dup " + base + " extra"
    val h = scalaBands(base.getBytes("UTF-8")).zip(scalaBands(edited.getBytes("UTF-8")))
      .map { case (a, b) => Integer.bitCount(a ^ b) }.sum
    assert(h <= 3, s"near-identical payloads landed at Hamming $h")
    // and an unrelated payload of the same length is far away
    val other = ("window group filter sort join order row value data small " * 6).trim
    val h2 = scalaBands(base.getBytes("UTF-8")).zip(scalaBands(other.getBytes("UTF-8")))
      .map { case (a, b) => Integer.bitCount(a ^ b) }.sum
    assert(h2 > 3, s"unrelated payloads landed at Hamming $h2")
  }

  test("banded candidates are COMPLETE for hamming <= 3: pigeonhole pin on the real corpus") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
      .withColumn("blob", encode($"text", "UTF-8"))
    val sigs = Multimodal.perceptualSigs(docs, "doc_id", "blob")
      .localCheckpoint(true)
    val report = Multimodal.perceptualPairs(sigs, "doc_id", tau = 3)
      .collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")) ->
        (r.getAs[Int]("hamming"), r.getAs[Boolean]("is_dup"))).toMap
    // all-pairs truth computed driver-side from the collected signatures
    val s = sigs.collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getInt)).sortBy(_._1)
    var withinTau = 0
    for (i <- s.indices; j <- (i + 1) until s.length) {
      val h = s(i)._2.zip(s(j)._2).map { case (a, b) => Integer.bitCount(a ^ b) }.sum
      val key = (s(i)._1, s(j)._1)
      if (h <= 3) {
        withinTau += 1
        assert(report.contains(key) && report(key) == ((h, true)),
          s"pair $key at hamming $h missing or mis-verdicted")
      } else if (report.contains(key)) {
        // candidates beyond tau are allowed (audit stream) but must carry
        // the exact hamming and a false verdict
        assert(report(key) == ((h, false)), s"pair $key audit row wrong")
      }
    }
    assert(withinTau > 0, "corpus has no within-tau pair; pin is vacuous")
  }

  test("hot-bucket cap: capped pairs are a subset; a loose cap changes nothing") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
      .withColumn("blob", encode($"text", "UTF-8"))
    val sigs = Multimodal.perceptualSigs(docs, "doc_id", "blob")
      .localCheckpoint(true)
    def pairs(mb: Option[Int]) =
      Multimodal.perceptualPairs(sigs, "doc_id", tau = 3, maxBucket = mb)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = pairs(None)
    val capped = pairs(Some(3))
    assert(capped.subsetOf(all) && capped.size < all.size,
      s"tight cap must prune candidacy (${capped.size} vs ${all.size})")
    val loose = pairs(Some(1000000))
    assert(loose == all, "a cap above every bucket size must be a no-op")
  }

  test("advance hot-bucket cap: capped advance is a subset of the uncapped advance; a loose cap is a no-op") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
      .withColumn("blob", encode($"text", "UTF-8"))
    val isNew = pmod($"doc_id", lit(4)) === 0
    val standing = Multimodal.perceptualSigs(docs.filter(!isNew), "doc_id", "blob")
      .localCheckpoint(true)
    val batch = Multimodal.perceptualSigs(docs.filter(isNew), "doc_id", "blob")
      .localCheckpoint(true)
    def adv(mb: Option[Int]) =
      Multimodal.perceptualPairsAdvance(standing, batch, "doc_id", tau = 3,
          maxBucket = mb)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = adv(None)
    val capped = adv(Some(3))
    assert(capped.subsetOf(all) && capped.size < all.size,
      s"tight cap must prune advance candidacy (${capped.size} vs ${all.size})")
    assert(adv(Some(1000000)) == all,
      "a cap above every merged bucket size must be a no-op")
  }
}
