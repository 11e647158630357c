package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class AnnMultimodalSpec extends AnyFunSuite with SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("bruteTopK returns k ranked neighbors with cosine in [-1,1]") {
    val q = emb.filter(col("vec_id") < 5)
    val out = Ann.bruteTopK(q, emb, "vec_id", "embedding", 3).collect()
    assert(out.length == 15)
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2, 3))
      val cos = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b }) // descending
      assert(cos.forall(c => c >= -1.0001 && c <= 1.0001))
    }
  }

  test("lshTopK recall vs brute force is reasonable on real embeddings") {
    val q = emb.filter(col("vec_id") < 20)
    val truth = Ann.bruteTopK(q, emb, "vec_id", "embedding", 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Ann.lshTopK(q, emb, "vec_id", "embedding", 5, bits = 4, tables = 8)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (truth intersect approx).size.toDouble / truth.size
    assert(recall >= 0.5, s"recall $recall too low")
    // approx results are a subset of the same scoring space: every hit has
    // the same exact cosine the brute path would compute
  }

  test("lshTopK is deterministic across runs") {
    val q = emb.filter(col("vec_id") < 5)
    val a = Ann.lshTopK(q, emb, "vec_id", "embedding", 3).collect().toSet
    val b = Ann.lshTopK(q, emb, "vec_id", "embedding", 3).collect().toSet
    assert(a == b)
  }

  test("lshTopK maxBucket: a non-binding cap is a no-op; a tight cap stays deterministic and in-space") {
    val q = emb.filter(col("vec_id") < 10)
    // cap above every bucket size: identical results to the uncapped gate
    // configuration (the vs04 oracle pin carries over)
    val uncapped = Ann.lshTopK(q, emb, "vec_id", "embedding", 5,
      bits = 4, tables = 8).collect().toSet
    val loose = Ann.lshTopK(q, emb, "vec_id", "embedding", 5,
      bits = 4, tables = 8, maxBucket = Some(1 << 20)).collect().toSet
    assert(loose == uncapped, "a non-binding cap changed results")
    // a binding cap: results are deterministic across runs, every kept
    // pair is drawn from the same scoring space (the uncapped candidate
    // set — sampling can only REMOVE candidates, never invent them), and
    // multi-table probing keeps the queries answered
    val capped1 = Ann.lshTopK(q, emb, "vec_id", "embedding", 5,
      bits = 4, tables = 8, maxBucket = Some(8)).collect()
    val capped2 = Ann.lshTopK(q, emb, "vec_id", "embedding", 5,
      bits = 4, tables = 8, maxBucket = Some(8)).collect().toSet
    assert(capped1.toSet == capped2, "capped sample not deterministic")
    val uncappedPairs = uncapped.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos")))
    // scores of surviving pairs are the exact cosines the uncapped path
    // computed for the same (query, neighbor)
    val uncappedScores = uncappedPairs.map { case (a1, b1, c) => ((a1, b1), c) }.toMap
    capped1.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      uncappedScores.get(key).foreach(c => assert(c == r.getAs[Double]("cos")))
    }
    assert(capped1.map(_.getAs[Long]("query_id")).distinct.length > 0)
    intercept[IllegalArgumentException] {
      Ann.lshTopK(q, emb, "vec_id", "embedding", 5, maxBucket = Some(0)).collect()
    }
  }

  test("maxBucket sample priorities are table-independent (ADVICE r16: a global per-id fold evicts the same tail ids from every table)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // replicate lshTopK's capped-sample priority for two tables over the
    // same id population: the per-table salt must draw DIFFERENT top-cap
    // samples, or the documented (1 - cap/|bucket|)^tables recall model
    // collapses to a single draw. Fixed hash => deterministic assertion.
    val ids = (0L until 100L).toDF("neighbor_id")
    def topCap(table: Int, cap: Int): Set[Long] = {
      val pri = graft.functions.HashExpressions.md5Fold32(
        concat(lit("lshcap:"), lit(table.toString), lit(":"),
          col("neighbor_id").cast("string")))
      ids.withColumn("__p", pri).orderBy(col("__p"), col("neighbor_id"))
        .limit(cap).collect().map(_.getLong(0)).toSet
    }
    val (t0, t1) = (topCap(0, 10), topCap(1, 10))
    assert(t0 != t1, "per-table samples identical — the salt is not table-dependent")
    // and the union across tables strictly grows the reachable set: the
    // mechanism by which raising `tables` buys recall back under a cap
    assert((t0 ++ t1).size > t0.size)
  }

  test("autoBits: integer-exact width rule — expected bucket held at targetBucket, clamps enforced") {
    import graft.operators.Ann.autoBits
    // smallest b with 2^b >= ceil(n/target); floor at 1, ceiling at maxBits
    assert(autoBits(500L, 16L) == 5)     // ceil(500/16)=32 -> 5 (exact power)
    assert(autoBits(2000L, 16L) == 7)    // 125 -> 7
    assert(autoBits(20000L, 16L) == 11)  // 1250 -> 11
    assert(autoBits(0L, 16L) == 1)       // empty corpus: floor clamp
    assert(autoBits(1L, 4096L) == 1)
    assert(autoBits(Long.MaxValue, 1L) == 24, "maxBits clamp")
    assert(autoBits(Long.MaxValue, 1L, maxBits = 30) == 30)
    // doubling the corpus adds at most one bit: the expected bucket
    // n / 2^bits stays in [target/2, target] — the flat-probe-cost claim
    for (n <- Seq(100L, 1000L, 10000L, 100000L); t <- Seq(16L, 256L)) {
      val b = autoBits(n, t)
      if (b > 1 && b < 24) {
        val expected = n.toDouble / (1L << b)
        assert(expected <= t, s"n=$n t=$t bits=$b bucket $expected > target")
        assert(expected > t / 2.0 || n <= t,
          s"n=$n t=$t bits=$b bucket $expected — a bit too wide")
      }
    }
    intercept[IllegalArgumentException](autoBits(10L, 0L))
  }

  test("multimodal decode attaches typed metadata and features, isolates bad rows") {
    import spark.implicits._
    val df = Seq(
      (1L, "hello multimodal world".getBytes("UTF-8")),
      (2L, Array.empty[Byte]),
      (3L, "another blob of bytes here".getBytes("UTF-8"))
    ).toDF("id", "blob")
    val out = Multimodal.decodeColumn(df, "blob").orderBy("id").collect()
    assert(out.map(_.getAs[Boolean]("decode_ok")).toSeq == Seq(true, false, true))
    val meta1 = out(0).getAs[org.apache.spark.sql.Row]("meta")
    assert(meta1.getAs[String]("mime").contains("/"))
    assert(meta1.getAs[Int]("width") >= 64)
    def feats(r: org.apache.spark.sql.Row) =
      r.getSeq[Float](r.fieldIndex("features")).toList
    assert(feats(out(0)).length == 8)
    // deterministic: same bytes → same features
    val again = Multimodal.decodeColumn(df, "blob").orderBy("id").collect()
    assert(feats(again(0)) == feats(out(0)))
  }

  test("sampleFrames explodes stride-sampled work units") {
    import spark.implicits._
    val df = Seq((1L, "0123456789".getBytes("UTF-8"))).toDF("id", "blob")
    val dec = Multimodal.decodeColumn(df, "blob") // n_frames = 1 + 10 % 30 = 11
    val frames = Multimodal.sampleFrames(dec, stride = 5)
      .select("frame_idx").collect().map(_.getInt(0)).toSeq
    assert(frames == Seq(0, 5, 10))
  }

  test("repartitionByBytes sizes partitions from data volume") {
    import spark.implicits._
    val df = Seq.tabulate(20)(i => (i.toLong, Array.fill(1000)(i.toByte)))
      .toDF("id", "blob")
    val out = Multimodal.repartitionByBytes(df, "blob", targetBytesPerPartition = 4000)
    assert(out.rdd.getNumPartitions == 6) // 20k bytes / 4k + 1
    assert(out.count() == 20)
  }

  test("decodeBatched: batch dispatch sees fixed-size batches, results align") {
    import spark.implicits._
    // closure is serialized to the executor - a plain driver-side queue
    // would stay empty; an accumulator flows batch sizes back
    val counts = spark.sparkContext.collectionAccumulator[Int]("batchSizes")
    val codec = new Multimodal.BatchCodec {
      def decodeBatch(batch: Seq[Array[Byte]]): Seq[Multimodal.Decoded] = {
        counts.add(batch.size)
        batch.map(Multimodal.FakeCodec.decode)
      }
    }
    val rows = (1L to 10L).map(i =>
      Multimodal.BlobRow(i, s"blob number $i with payload".getBytes("UTF-8")))
    val ds = spark.createDataset(rows).repartition(1)
    val out = Multimodal.decodeBatched(ds, codec, batchSize = 4)
      .collect().sortBy(_.id)
    assert(out.length == 10)
    assert(out.forall(_.decode_ok))
    assert(out.map(_.id).toSeq == (1L to 10L))
    // per-row parity with the scalar path
    val scalar = rows.map(r => Multimodal.FakeCodec.decode(r.blob))
    out.zip(scalar).foreach { case (b, s0) =>
      assert(b.mime == s0.meta.mime && b.features.toSeq == s0.features.toSeq)
    }
    import scala.jdk.CollectionConverters._
    assert(counts.value.asScala.toSeq.map(_.toInt).sorted == Seq(2, 4, 4)) // 10 rows in batches of 4
  }

  test("streamDocuments ingests new files incrementally") {
    val dir = java.nio.file.Files.createTempDirectory("stream-docs")
    java.nio.file.Files.writeString(dir.resolve("A1.pdf"), "page one\fpage two")
    java.nio.file.Files.writeString(dir.resolve("A2.pdf"), "solo page")
    val q = graft.streaming.Streams.runToMemory(
      graft.streaming.Streams.streamDocuments(spark, dir.toString), "docs")
    q.awaitTermination(60000)
    val got = spark.table("docs").collect()
      .map(r => r.getAs[String]("pdf_name") -> r.getSeq[String](r.fieldIndex("pages")).length)
      .toMap
    assert(got == Map("A1.pdf" -> 2, "A2.pdf" -> 1))
  }

  test("shingle UDF equals the pure-Catalyst n-gram formulation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val viaUdf = docs.select($"doc_id", graft.functions.Text.shingles($"text", 3).as("s"))
    val viaExpr = docs.select($"doc_id", array_distinct(
      graft.functions.Text.wordNGrams(graft.functions.Text.tokens($"text"), 3)).as("s"))
    val a = viaUdf.collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val b = viaExpr.collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(a == b)
  }
}
