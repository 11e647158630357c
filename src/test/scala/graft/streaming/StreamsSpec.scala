package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Streaming twins verified against their batch equivalents — the
  * batch/stream parity contract (§2.7): same input, same result. */
class StreamsSpec extends AnyFunSuite with SparkSpec {

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("hourlyByType stream equals the batch aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (ts(0), "click", 1.0), (ts(10), "click", 2.0), (ts(30), "view", 3.0),
      (ts(65), "click", 4.0), (ts(70), "view", 5.0), (ts(190), "click", 6.0))

    val mem = MemoryStream[(Timestamp, String, Double)]
    val stream = Streams.hourlyByType(
      mem.toDF().toDF("ts", "event_type", "value"))
    val q = stream.writeStream.format("memory").queryName("hourly")
      .outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    // a far-future event advances the watermark past every real window;
    // the no-data micro-batch then flushes them all in append mode
    mem.addData((ts(600), "späte", 0.0))
    q.processAllAvailable()
    q.stop()

    // batch twin over the identical frame (without the watermark-driver row)
    val batch = Streams.hourlyByType(rows.toDF("ts", "event_type", "value"))
      .orderBy("hour", "event_type").collect().map(_.toSeq)
    val streamed = spark.table("hourly").orderBy("hour", "event_type")
      .collect().map(_.toSeq)
    // exact batch/stream parity: every closed window matches; only the
    // watermark-driver's own still-open window is absent from both
    assert(streamed.toSeq == batch.toSeq)
  }

  test("sessionize closes sessions on gap and matches batch q29 shape") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.SessionEvent]
    // user 1: two events 10 min apart (one session), then 40-min gap, one more
    mem.addData(
      Streams.SessionEvent(1L, ts(0), 1.0),
      Streams.SessionEvent(1L, ts(10), 2.0),
      Streams.SessionEvent(1L, ts(50), 4.0),
      Streams.SessionEvent(2L, ts(5), 8.0),
      // advance watermark far enough to time out everything open
      Streams.SessionEvent(99L, ts(600), 0.0))

    val out = Streams.sessionize(mem.toDS())
    val q = Streams.runToMemory(out.toDF(), "sessions")
    q.awaitTermination(60000)
    val got = spark.table("sessions")
      .select("user_id", "n_events", "session_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // user 1 session A: 2 events value 3.0 (closed by the in-batch gap);
    // session B and user 2's session close via event-time timeout
    assert(got.contains((1L, 2L, 3.0)))
    assert(got.contains((1L, 1L, 4.0)))
    assert(got.contains((2L, 1L, 8.0)))
  }

  test("stream-stream interval join equals the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // purchases at t=40,90; clicks at t=15,35,70 — click 15 is outside
    // purchase 40's 30-min window start? no: 40-30=10 <= 15, so it joins;
    // click 70 joins only purchase 90; click 35 joins only purchase 40
    val pRows = Seq((1L, 100L, ts(40)), (1L, 101L, ts(90)))
    val cRows = Seq((1L, 200L, ts(15)), (1L, 201L, ts(35)), (1L, 202L, ts(70)),
      (2L, 203L, ts(41))) // other user: never joins
    val pMem = MemoryStream[(Long, Long, Timestamp)]
    val cMem = MemoryStream[(Long, Long, Timestamp)]
    val joined = Streams.purchaseClickJoin(
      pMem.toDF().toDF("user_id", "event_id", "ts"),
      cMem.toDF().toDF("user_id", "event_id", "ts"))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    pMem.addData(pRows: _*)
    cMem.addData(cRows: _*)
    q.processAllAvailable()
    // watermark drivers on both sides flush the inner-join output
    // (distinct users so the drivers don't join each other)
    pMem.addData((98L, 999L, ts(600)))
    cMem.addData((99L, 998L, ts(600)))
    q.processAllAvailable()
    q.stop()

    val batch = Streams.purchaseClickJoin(
        pRows.toDF("user_id", "event_id", "ts"),
        cRows.toDF("user_id", "event_id", "ts"))
      .orderBy("purchase_id", "click_id").collect().map(_.toSeq)
    val streamed = spark.table("ssjoin")
      .orderBy("purchase_id", "click_id").collect().map(_.toSeq)
    assert(streamed.toSeq == batch.toSeq)
    // the pairs are exactly the interval-compatible ones
    val pairs = spark.table("ssjoin")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((100L, 200L), (100L, 201L), (101L, 202L)))
  }

  test("dedupStream keeps one row per content hash with bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = Streams.dedupStream(mem.toDF().toDF("doc_id", "ts", "text"))
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    mem.addData((1L, ts(0), "alpha"), (2L, ts(1), "alpha"), (3L, ts(2), "beta"))
    q.processAllAvailable()
    // same content arriving within the watermark window stays deduped
    mem.addData((4L, ts(3), "alpha"), (5L, ts(4), "gamma"))
    q.processAllAvailable()
    q.stop()
    val texts = spark.table("dedup").select("text").collect().map(_.getString(0))
    assert(texts.sorted.toSeq == Seq("alpha", "beta", "gamma"))
  }

  test("streaming LSH candidates + batch verify == batch lshDedup (parity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // real corpus: the sf0.001 documents table (30 verified near-dup pairs)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), ts(0)))

    val mem = MemoryStream[(Long, String, Timestamp)]
    val cand = Streams.lshCandidateStream(
      mem.toDF().toDF("doc_id", "text", "ts"))
    val q = cand.toDF().writeStream.format("memory").queryName("lshcand")
      .outputMode("append").start()
    mem.addData(rows.toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()

    // stream candidates → batch exact verification against the doc store;
    // must equal the all-batch pipeline row for row (same buckets ⇒ same
    // candidate set ⇒ same verified pairs + jaccard)
    val streamed = graft.queries.TextOps
      .verifyPairs(docs, spark.table("lshcand"))
      .collect().map(_.toSeq).toSeq
    val batch = graft.queries.TextOps.lshDedup(docs)
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("lshCandidateStream expires buckets: a doc behind the watermark no longer pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val near1 = "the quick brown fox jumps over the lazy dog again and again ok"
    val near2 = "the quick brown fox jumps over the lazy dog again and again yes"
    val mem = MemoryStream[(Long, String, Timestamp)]
    val cand = Streams.lshCandidateStream(
      mem.toDF().toDF("doc_id", "text", "ts"), watermarkDelayMinutes = 60)
    val q = cand.toDF().writeStream.format("memory").queryName("lshexp")
      .outputMode("append").start()
    mem.addData((1L, near1, ts(0)))
    q.processAllAvailable()
    // advance the watermark far past doc 1 (+60 min delay), expiring its
    // buckets; the sentinel shares no shingles so it pairs with nothing
    mem.addData((9L, "zzz yyy xxx www vvv uuu ttt sss", ts(600)))
    q.processAllAvailable()
    // near-identical doc arrives, but doc 1 is gone from state (its ts is
    // behind the watermark) — no pair may surface
    mem.addData((2L, near2, ts(601)))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("lshexp").isEmpty)

    // control: the same two docs within one watermark window DO pair
    val mem2 = MemoryStream[(Long, String, Timestamp)]
    val cand2 = Streams.lshCandidateStream(
      mem2.toDF().toDF("doc_id", "text", "ts"), watermarkDelayMinutes = 60)
    val q2 = cand2.toDF().writeStream.format("memory").queryName("lshexp2")
      .outputMode("append").start()
    mem2.addData((1L, near1, ts(0)), (2L, near2, ts(1)))
    q2.processAllAvailable()
    q2.stop()
    val got = spark.table("lshexp2").select("d1", "d2").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("lshCandidateStream caps a hot bucket: bounded emission, oldest evicted first") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 60 identical docs within one watermark horizon — every one lands in
    // the same 4 band buckets, the adversarial distribution the batch
    // side's salting (BandJoinSpec) guards against
    val text = "same words in every single document of this one hot bucket here now"
    val mem = MemoryStream[(Long, String, Timestamp)]
    val cand = Streams.lshCandidateStream(
      mem.toDF().toDF("doc_id", "text", "ts"), watermarkDelayMinutes = 120,
      maxBucketDocs = 8)
    val q = cand.toDF().writeStream.format("memory").queryName("lshhot")
      .outputMode("append").start()
    mem.addData((1L to 60L).map(i => (i, text, ts(i.toInt))): _*)
    q.processAllAvailable()
    q.stop()
    // raw emission is arrivals × ≤cap per bucket — never the |bucket|²
    // quadratic (uncapped this batch would emit 60·59/2 = 1770 per bucket)
    val raw = spark.table("lshhot").count()
    assert(raw > 0 && raw <= 60L * 8 * 4, s"emission not bounded by the cap: $raw")
    // deterministic pair loss: each arrival pairs with exactly the 8
    // most-recent members (oldest evicted first), so the distinct pair set
    // is {(j, i) : 1 ≤ i − j ≤ 8}
    val pairs = spark.table("lshhot").select("d1", "d2").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected =
      (for (i <- 1L to 60L; j <- math.max(1L, i - 8) until i) yield (j, i)).toSet
    assert(pairs == expected)
  }

  test("contaminationStream scores a doc stream identically to batch dd07") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    // batch dd07 contract: docs 0-19 are the benchmark, the rest stream in
    val bench = docs.filter($"doc_id" < 20)
      .select(explode(graft.functions.Text.shingles($"text", 3)).as("sh"))
      .distinct().collect().map(_.getString(0)).toSet
    val rows = docs.filter($"doc_id" >= 20).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), ts(0)))

    val mem = MemoryStream[(Long, String, Timestamp)]
    val out = Streams.contaminationStream(
      mem.toDF().toDF("doc_id", "text", "ts"), bench)
    val q = out.writeStream.format("memory").queryName("contam")
      .outputMode("append").start()
    mem.addData(rows.toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("contam")
      .select("doc_id", "n_overlap", "contamination")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.queries.TextOps.contamination(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("late within-watermark event does not split the open session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.SessionEvent]
    val out = Streams.sessionize(mem.toDS())
    val q = out.toDF().writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    // batch 1: event at t=10min
    mem.addData(Streams.SessionEvent(7L, ts(10), 1.0))
    q.processAllAvailable()
    // batch 2: late event at t=0 (inside watermark) then t=35min: the
    // session interval is [0,35] with all gaps <= 30min - ONE session
    mem.addData(Streams.SessionEvent(7L, ts(0), 2.0), Streams.SessionEvent(7L, ts(35), 4.0))
    q.processAllAvailable()
    // close everything via watermark driver
    mem.addData(Streams.SessionEvent(99L, ts(600), 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("late_sessions").filter($"user_id" === 7L)
      .select("n_events", "session_value").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((3L, 7.0)), s"got $got")
  }
}
