package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming twins of the batch analytics (SURVEY.md §2.7).
  *
  * The reference is batch-only; its closest incremental shapes are the
  * per-item scrape loop and the updated_at bookkeeping column. These
  * operators give the same queries a streaming execution: the batch
  * catalog's q15 (tumbling hourly agg) and q29 (gap sessionization) run
  * here over an event stream with watermarked state cleanup, and new-file
  * ingest mirrors the reference's "new PDFs arrive, re-run extract" flow.
  *
  * All transforms are expressed on unbounded DataFrames: the same code
  * runs under `spark.readStream` (tests drive it with MemoryStream) and
  * on a batch frame for backfill.
  */
object Streams {

  /** q15's streaming twin: tumbling 1-hour window per event_type with a
    * watermark bounding state. Late events beyond 2h are dropped —
    * deterministic completeness contract instead of the batch job's
    * "whatever is in the table". Sum is decimal-exact like the batch twin. */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("total_value"))

  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, value: Double)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
      n_events: Long, session_value: Double)

  /** q29's streaming twin: 30-minute-gap sessions via
    * flatMapGroupsWithState (custom state machine, the engine's §2.7
    * "mapGroupsWithState" surface). Emits a session when the gap timeout
    * fires; state is one small struct per live user — O(active users), not
    * O(events). */
  def sessionize(events: Dataset[SessionEvent],
      gapSeconds: Long = 1800): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, new Timestamp(s.start), s.n, s.value))
          } else {
            val evs = it.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            val gapMs = gapSeconds * 1000
            for (e <- evs) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t > s.last + gapMs =>
                  closed += SessionOut(user, new Timestamp(s.start), s.n, s.value)
                  cur = Some(SessionState(t, t, 1, e.value))
                case Some(s) if t < s.start - gapMs =>
                  // straggler older than the open session minus the gap:
                  // its own (approximate) singleton session — it must NOT
                  // move `last` backwards and split the live session
                  closed += SessionOut(user, new Timestamp(t), 1, e.value)
                case Some(s) =>
                  // in-order or late-but-adjacent: extend the interval in
                  // both directions so batch/stream parity holds for any
                  // within-watermark arrival order
                  cur = Some(SessionState(math.min(s.start, t),
                    math.max(s.last, t), s.n + 1, s.value + e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Stream-stream interval join (§2.7's two-stream surface): each
    * purchase pairs with the same user's clicks from the preceding
    * `windowSeconds`. Both sides carry watermarks, and the join condition
    * bounds event-time distance in BOTH directions, so Spark can expire
    * buffered state: without the interval bound a stream-stream join
    * buffers forever. The same function runs on batch frames (watermarks
    * are a no-op there) — the parity test's oracle. */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame,
      windowSeconds: Long = 1800): DataFrame = {
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    p.join(c,
        col("user_id") === col("c_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"))
  }

  /** dd01's streaming twin: exact dedup on a document stream by content
    * digest. dropDuplicatesWithinWatermark keeps one row per key and —
    * unlike a bare dropDuplicates, whose state grows forever — expires a
    * key's state once the watermark passes it, so state is bounded by the
    * dedup window instead of the stream's lifetime. The digest is
    * computed first so state stores 32-byte keys, never document bodies
    * (the same never-ship-the-body rule as the batch dedup shuffles). */
  def dedupStream(docs: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** dd05's streaming twin, candidate half: per-document MinHash band keys
    * computed ROW-LOCALLY via the one-pass `Text.minhashSigs` UDF and the
    * shared `Text.bandKeys` formula — byte-identical buckets to the batch
    * pipelines (the parity contract), with no shuffle preceding the
    * stateful stage. Docs with fewer than 3 tokens have no shingles and
    * emit no bands, matching the batch explode. Output: (doc_id, ts,
    * bucket) with bucket = "band:bkey", 4 rows per doc. */
  def docBands(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("ts"),
        graft.functions.Text.minhashSigs(col("text")).as("sigs"))
      .filter(col("sigs").isNotNull)
      .select(col("doc_id"), col("ts"),
        posexplode(graft.functions.Text.bandKeys(col("sigs"))))
      .select(col("doc_id"), col("ts"),
        concat_ws(":", col("pos"), col("col")).as("bucket"))

  final case class BandHit(bucket: String, doc_id: Long, ts: Timestamp)
  final case class BucketState(docs: List[(Long, Long)])
  final case class CandPair(d1: Long, d2: Long, ts: Timestamp)

  /** dd05's streaming twin: near-dup CANDIDATE pairs from a document
    * stream. Each arriving doc lands in its 4 LSH band buckets; the bucket
    * is the state key and its value is the (doc_id, event-time) list of
    * docs seen within the watermark — band keys and ids only, NEVER text
    * (state per doc is 4 buckets × 16 bytes, bounded by the watermark
    * horizon regardless of stream length). A new doc pairs with every
    * retained same-bucket doc; pairs are emitted immediately (append mode,
    * no flush-on-watermark latency). The same pair can surface from two
    * bands — downstream exact verification ([[graft.queries.TextOps
    * .verifyPairs]], which de-duplicates) absorbs that, exactly as the
    * batch `lshCandidates.distinct()` does.
    *
    * Expiry contract: a doc stops pairing once the watermark passes its
    * event time — the streaming analogue of batch dd05's "corpus = the
    * window you ran it over". On event-time timeout the whole bucket's
    * retained list is already behind the watermark (the timeout is its max
    * ts), so the state is simply removed.
    *
    * Hot-bucket bound: a bucket retains at most `maxBucketDocs` docs — on
    * overflow the OLDEST retained (event time, then doc id) is evicted, so
    * state per bucket and pairs emitted per arriving doc are both capped
    * at `maxBucketDocs` instead of degrading to the |bucket|² quadratic
    * the batch side's salting guards against. Documented pair loss: in a
    * bucket holding more than the cap within one watermark horizon, a new
    * doc pairs only with the cap most-recent members — an evicted doc
    * stops pairing early, exactly as if the watermark had already passed
    * it. Buckets that never exceed the cap (every bucket of the parity
    * corpus at the default) emit identically to an unbounded bucket —
    * StreamsSpec pins both halves. */
  def lshCandidateStream(docs: DataFrame,
      watermarkDelayMinutes: Int = 120,
      maxBucketDocs: Int = 256): Dataset[CandPair] = {
    // validated here, not at first arrival: cap 0 would evict the sole
    // entry and crash the timeout computation inside the running stream
    require(maxBucketDocs >= 1, s"maxBucketDocs must be >= 1, got $maxBucketDocs")
    val spark = docs.sparkSession
    import spark.implicits._
    docBands(docs)
      .withWatermark("ts", s"$watermarkDelayMinutes minutes")
      .as[BandHit]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, CandPair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, it: Iterator[BandHit], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // watermark > max retained ts ⇒ every entry is expired
            state.remove()
            Iterator.empty
          } else {
            val wm = state.getCurrentWatermarkMs()
            val retained = state.getOption.map(_.docs).getOrElse(Nil)
              .filter(_._2 >= wm)
            val fresh = it.map(h => (h.doc_id, h.ts.getTime)).toList
              .sortBy(identity)
            // new×retained + new×new pairs, always (min, max) id order so
            // the batch d1 < d2 convention holds
            val out = List.newBuilder[CandPair]
            var seen = retained
            for ((id, t) <- fresh) {
              for ((oid, ot) <- seen if oid != id)
                out += CandPair(math.min(id, oid), math.max(id, oid),
                  new Timestamp(math.max(t, ot)))
              seen = (id, t) :: seen
              // hot-bucket cap: evict the oldest (event time, then id) so
              // the NEXT arrival pairs with ≤ maxBucketDocs members.
              // patch (not filterNot): removes exactly ONE occurrence even
              // if a redelivered (id, ts) duplicates the oldest entry
              if (seen.size > maxBucketDocs) {
                val oldest = seen.minBy { case (d, ts0) => (ts0, d) }
                seen = seen.patch(seen.indexOf(oldest), Nil, 1)
              }
            }
            val next = BucketState(seen)
            state.update(next)
            // +1 ms: the API rejects a timeout ≤ the current watermark, and
            // a batch's max event time can coincide with it exactly
            state.setTimeoutTimestamp(next.docs.map(_._2).max + 1)
            out.result().iterator
          }
      }
  }

  /** dd07's streaming twin: benchmark-contamination scoring of a document
    * stream. Entirely STATELESS — each doc's score needs only its own
    * shingle set against the fixed benchmark set, so the bench shingles
    * ride along as a broadcast (the same shape as batch `contamination`'s
    * `broadcast(bench)` probe; benchmark suites are small by nature) and
    * every row is scored in place: no watermark, no state store, no
    * shuffle before the sink. Emits (doc_id, n_overlap, contamination,
    * ts) for contaminated docs only — identical scores to the batch
    * operator for the same corpus (StreamsSpec pins it). */
  def contaminationStream(docs: DataFrame, benchShingles: Set[String]): DataFrame = {
    val bench = docs.sparkSession.sparkContext.broadcast(benchShingles)
    // ONE combined UDF (shingle + probe + size) marked nondeterministic:
    // split across deterministic UDFs the optimizer substitutes them into
    // the pushed-down filters and recomputes them in the projections above
    // (verified in the 4.1.2 optimized plan) — the dominant per-row work
    // would run twice. Nulls (no shingles) drop via the n_overlap filter.
    val score = udf { (t: String) =>
      val sh = graft.functions.Text.shingleSet(t)
      if (sh.isEmpty) null
      else {
        var n = 0
        var j = 0
        while (j < sh.length) {
          if (bench.value.contains(sh(j))) n += 1
          j += 1
        }
        (n.toLong, sh.length)
      }
    }.asNondeterministic()
    docs
      .select(col("doc_id"), col("ts"), score(col("text")).as("s"))
      .filter(col("s._1") > 0)
      .select(col("doc_id"), col("s._1").as("n_overlap"),
        (col("s._1").cast("double") / col("s._2")).as("contamination"),
        col("ts"))
  }

  /** pp02's streaming twin: CONTINUOUS LSH index maintenance. One
    * micro-batch of documents lands; the batch is probed against the
    * standing band index + shingle store
    * ([[graft.queries.TextOps.incrementalPairs]]), the duplicate pairs it
    * introduces are appended to `pairsTable`, and all three standing
    * tables advance by APPENDING the batch's own rows. Invariants:
    *
    *  - every duplicate pair of the eventual corpus is emitted EXACTLY
    *    once — in the micro-batch where its later member arrives (both
    *    members in one batch: that batch) — so the union of all batches'
    *    pairs equals batch `lshDedup` over the full corpus regardless of
    *    how the stream was split (IncrementalIndexStreamSpec pins this);
    *  - redelivery is safe: a doc_id already in the store is dropped
    *    before probing, and the index/shingle appends are additionally
    *    anti-joined against their OWN table's doc ids — a crash between
    *    those appends and the doc-store advance redelivers the batch,
    *    and without the per-table guard the re-appended rows would
    *    permanently double-count `inter` in every later verification.
    *    The standing shingle store is likewise read MINUS the batch's own
    *    ids when verifying (a crash in that window leaves the batch's
    *    shingles in the store; unioned with the recomputed increment rows
    *    they would inflate `inter` and append pairs that differ from the
    *    already-landed originals). Only ID columns are read for the
    *    guards — never bodies;
    *  - pairs are written BEFORE any table advances — their plan reads
    *    the pre-batch file listings;
    *  - per-batch work and write volume are O(batch + candidates), not
    *    O(corpus): the increment alone is (re)signatured and shingled,
    *    the index and shingle store are read at their own layout (the
    *    store additionally pruned to candidate ids before the pair join),
    *    and every write is an append of batch-derived rows —
    *    IncrementalIndexAppendSpec pins that a later batch leaves every
    *    earlier data file byte-identical in place.
    *
    * Advance order is pairs → index → shingles → docs: the doc store is
    * the redelivery guard, so a crash mid-advance makes the whole batch
    * redeliverable. A redelivered batch whose pairs already landed would
    * then append them twice — the at-least-once seam a transactional
    * table format (Delta/Iceberg, absent offline) would close with a
    * single multi-table commit; downstream consumers get exactly-once by
    * reading pairs through a distinct(). */
  def maintainBandIndex(batch: DataFrame, indexTable: String, docTable: String,
      pairsTable: String, shingleTable: String): Unit = {
    val fresh = freshAgainst(batch, docTable)
    advanceBandIndex(fresh,
      graft.queries.TextOps.bandIndex(fresh).localCheckpoint(true),
      indexTable, pairsTable, shingleTable)
    fresh.write.mode("append").parquet(docTable)
  }

  /** The batch minus already-stored doc ids, materialized once — the
    * shared redelivery guard + fan-in point of every maintenance loop
    * (the increment feeds several derivations; a lazily persisted frame
    * racing parallel consumers can compute twice). Also dedups WITHIN the
    * batch: an at-least-once upstream can deliver the same doc twice in
    * one micro-batch, and duplicated rows would double every per-doc
    * derivation downstream (span counts, band rows, report totals) —
    * the doc-table guard only sees across batches. The in-batch pick is
    * DETERMINISTIC (max text per doc_id), so even an upstream that
    * redelivers the same id with divergent payloads — outside the
    * at-least-once contract, whose replays are byte-identical — yields
    * the same fresh set on every replay, keeping the batch_key delta
    * trick's byte-identical-recompute premise intact. */
  /** Prune a standing id-guard read to the batch's id RANGE before the
    * anti-join. Semantically a no-op: guard rows with ids outside
    * [min, max] of the batch's ids cannot match any batch row, so
    * dropping them changes nothing — but the between() reaches the
    * guard's parquet scan as a pushed predicate, so row-group min/max
    * statistics skip whole files whenever ingest ids are clustered (a
    * monotonic id stream — the common production shape — leaves each
    * advance's guard read O(overlapping files) instead of O(standing);
    * the worst case, fully interleaved ids, degenerates to exactly the
    * full scan this replaces, which is what the MaintainerProbe's
    * replica-interleaved batches time). Costs one batch-sized min/max
    * agg — in family with the batchKey agg every advance already runs.
    * An empty batch returns an empty guard without touching it. */
  private def pruneToBatchRange(guard: DataFrame, batch: DataFrame,
      idCol: String): DataFrame = {
    val b = batch.agg(min(col(idCol)), max(col(idCol))).head()
    if (b.isNullAt(0)) guard.limit(0)
    else guard.filter(col(idCol).between(b.get(0), b.get(1)))
  }

  private def freshAgainst(batch: DataFrame, docTable: String,
      cols: Seq[String] = Seq("text")): DataFrame = {
    // in-batch duplicates collapse deterministically to ONE of the
    // arriving rows: lexicographic max over the struct of all payload
    // columns, then re-expanded — never a per-column max, which with
    // multiple columns could synthesize a (source, text) combination
    // existing in neither input row; single-column callers get exactly
    // the old max(col) (struct ordering degenerates to the field's, and
    // a null field sorts below every value like max's null-skipping)
    val arrived = batch.select((col("doc_id") +: cols.map(col)): _*)
      .groupBy(col("doc_id"))
      .agg(max(struct(cols.map(col): _*)).as("__row"))
      .select((col("doc_id") +: cols.map(c => col(s"__row.$c").as(c))): _*)
    tryRead(batch.sparkSession, docTable)
      .map(e => arrived.join(
        pruneToBatchRange(e.select("doc_id"), batch, "doc_id"),
        Seq("doc_id"), "left_anti"))
      .getOrElse(arrived)
      .localCheckpoint(true)
  }

  /** The band-index half of an advance: pairs append first, then the
    * guarded index/shingle appends. `freshBands` is passed in (not
    * derived) so a combined loop signatures the batch exactly once. */
  private def advanceBandIndex(fresh: DataFrame, freshBands: DataFrame,
      indexTable: String, pairsTable: String, shingleTable: String): Unit = {
    val spark = fresh.sparkSession
    val freshShingles = graft.queries.TextOps.shingleStore(fresh).localCheckpoint(true)
    val idx = tryRead(spark, indexTable).getOrElse(emptyBandIndex(spark))
    // redelivery guard on the VERIFY side: after a crash between the
    // index/shingle appends below and the doc-store advance, the standing
    // store already holds the batch's rows, and incrementalPairs unions
    // store ∪ newShingles — without this exclusion a redelivered batch
    // doc's shingles count twice, inflating `inter` 2× (new–old pairs) /
    // 4× (new–new) while sz1/sz2 stay right, appending pairs that DIFFER
    // from the originals (corruption distinct() can't repair). Excluded,
    // the replay recomputes byte-identical pairs and the documented
    // distinct() recovery holds. The band index needs no twin guard:
    // duplicate index rows only duplicate candidate pairs, which collapse
    // in incrementalPairs' distinct() before any counting.
    val store = tryRead(spark, shingleTable).getOrElse(emptyShingleStore(spark))
      .join(broadcast(fresh.select(col("doc_id"))), Seq("doc_id"), "left_anti")
    graft.queries.TextOps.incrementalPairs(idx, freshBands, freshShingles, store)
      .write.mode("append").parquet(pairsTable)
    // per-table redelivery guard: a crash after these appends but before
    // the doc-store advance redelivers the batch, and appending the same
    // rows twice would permanently corrupt every later verification (the
    // docTable guard alone can't see it). Anti-join against each target
    // table's own doc ids — a column-pruned id scan, like the fresh guard
    appendNewBy(freshBands, indexTable, "doc_id")
    appendNewBy(freshShingles, shingleTable, "doc_id")
  }

  /** Append `rows` minus those whose `idCol` the target table already
    * holds — the per-table redelivery guard of every append-only advance
    * (a column-pruned id scan of the target, never bodies). NOT
    * range-pruned like the batch-side guards: `rows` is often a derived
    * frame (the span advance's grams), and the bounds agg
    * [[pruneToBatchRange]] needs would recompute its whole subtree. */
  private def appendNewBy(rows: DataFrame, table: String, idCol: String): Unit =
    tryRead(rows.sparkSession, table)
      .map(t => rows.join(t.select(idCol), Seq(idCol), "left_anti"))
      .getOrElse(rows)
      .write.mode("append").parquet(table)

  private def emptyDf(spark: SparkSession,
      fields: (String, org.apache.spark.sql.types.DataType)*): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(fields.map { case (n, t) =>
        org.apache.spark.sql.types.StructField(n, t) }))

  private def emptyBandIndex(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    emptyDf(spark, "doc_id" -> LongType, "band" -> IntegerType, "bkey" -> StringType)
  }

  private def emptyShingleStore(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    emptyDf(spark, "doc_id" -> LongType, "sz" -> IntegerType, "h" -> LongType)
  }

  /** dd13's continuous twin: CONTINUOUS containment-index maintenance.
    * Standing tables, all append-only: `storeTable` (doc_id, sz, h — the
    * md5-fold containment store), `probeTable` (doc_id, h — each doc's
    * bottom-k sketch; a doc's probes never change once written),
    * `pairsTable` (the scored pair log: a pair's exact containment is
    * immutable once both docs exist, and every pair is emitted by
    * exactly the batch that completes it — [[containmentPairsSnapshot]]
    * == the batch dd13 over everything arrived), `docTable` (the shared
    * redelivery guard, advanced LAST). Crash anywhere → the replay
    * recomputes byte-identical pairs: the advance is a pure function of
    * (standing tables, fresh), the standing reads are guarded against
    * the batch's own partial writes (store and probe reads minus fresh
    * ids — the [[advanceBandIndex]] exclusion: un-excluded, a
    * redelivered doc's store rows would double `inter`, and its probe
    * rows would double hit counts past the minHits threshold), and the
    * store/probe appends carry their own per-table id guard. Consumers
    * read pairs through distinct(), the documented recovery of every
    * pair log here. Per-batch work: batch shingling, k probe rows per
    * batch doc, the broadcast-pruned standing-probe slice, and
    * candidate-pair verification — O(batch + hits), nothing
    * corpus-shaped. */
  def maintainContainmentIndex(batch: DataFrame, storeTable: String,
      probeTable: String, pairsTable: String, docTable: String,
      probeK: Int = 8, minHits: Int = 2): Unit = {
    val spark = batch.sparkSession
    val fresh = freshAgainst(batch, docTable)
    val freshIds = fresh.select(col("doc_id"))
    val store = tryRead(spark, storeTable).getOrElse(emptyShingleStore(spark))
      .join(broadcast(freshIds), Seq("doc_id"), "left_anti")
    val probes = tryRead(spark, probeTable).getOrElse(emptyProbes(spark))
      .join(broadcast(freshIds), Seq("doc_id"), "left_anti")
    val adv = graft.queries.TextOps.containmentIndexAdvance(
      store, probes, fresh, probeK, minHits)
    adv.pairs.write.mode("append").parquet(pairsTable)
    appendNewBy(adv.store, storeTable, "doc_id")
    appendNewBy(adv.probes, probeTable, "doc_id")
    fresh.write.mode("append").parquet(docTable)
  }

  private def emptyProbes(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    emptyDf(spark, "doc_id" -> LongType, "h" -> LongType)
  }

  /** The current containment pair list under the maintained log —
    * dd13's shape over every doc arrived (pairs are immutable facts;
    * distinct() is the at-least-once recovery). */
  def containmentPairsSnapshot(spark: SparkSession,
      pairsTable: String): DataFrame = {
    import org.apache.spark.sql.types._
    tryRead(spark, pairsTable).getOrElse(emptyDf(spark,
        "d1" -> LongType, "d2" -> LongType, "containment" -> DoubleType))
      .distinct().orderBy(col("d1"), col("d2"))
  }

  /** pp04's continuous twin: CLUSTER state maintained per micro-batch.
    * Standing tables: `labelsTable` (doc_id, component — labels as
    * assigned when each doc arrived), `bucketTable` (bucket, component —
    * as assigned when the bucket first appeared), `remapTable`
    * (__oldc, __newc — the CURRENT id of every component id that was ever
    * merged away), plus the doc store as the redelivery guard. The read
    * view is always one remap hop: current label of a doc =
    * remap(written label), because the remap is COMPOSED (folded to a
    * one-hop closure) on every advance — the pointer-compaction a
    * transactional table format would run as a maintenance job.
    *
    * Per batch, work and write volume are O(batch + touched components):
    * the batch's members run [[graft.queries.TextOps.clusterAdvance]]
    * against the remap-resolved bucket index (broadcast probe, index read
    * at its own layout), label/bucket/doc rows APPEND, and only the
    * (merge-bounded, broadcast-sized) remap table is atomically
    * rewritten. Merged standing components are never relabeled in place —
    * their rows stay as written and resolve through the remap.
    *
    * Redelivery: a doc_id already stored is dropped before the advance
    * (docs append LAST, so a crash mid-advance redelivers the whole
    * batch; the same at-least-once seam as [[maintainBandIndex]] — the
    * read view drops duplicate label rows, and a transactional format
    * would close it with one multi-table commit). */
  def maintainClusterState(batch: DataFrame, labelsTable: String,
      bucketTable: String, remapTable: String, docTable: String): Unit = {
    val fresh = freshAgainst(batch, docTable)
    advanceClusterState(fresh,
      graft.queries.TextOps.bandIndex(fresh).localCheckpoint(true),
      labelsTable, bucketTable, remapTable)
    fresh.write.mode("append").parquet(docTable)
  }

  /** The cluster half of an advance — labels/buckets append, remap folds.
    * `freshBands` passed in for the same single-signature-pass reason as
    * [[advanceBandIndex]]. */
  private def advanceClusterState(fresh: DataFrame, freshBands: DataFrame,
      labelsTable: String, bucketTable: String, remapTable: String): Unit = {
    val spark = fresh.sparkSession
    val newMembers = freshBands
      .select(col("doc_id"), concat_ws(":", col("band"), col("bkey")).as("bucket"))
    val standingRemap = tryRead(spark, remapTable).getOrElse(emptyRemap(spark))
    val rawBuckets = tryRead(spark, bucketTable).getOrElse(emptyBucketComp(spark))
    // resolve the bucket index through the one-hop remap at read time
    val bucketComp = rawBuckets.join(broadcast(standingRemap),
        rawBuckets("component") === standingRemap("__oldc"), "left")
      .select(col("bucket"), coalesce(col("__newc"), col("component")).as("component"))
    val adv = graft.queries.TextOps.clusterAdvance(
      bucketComp, fresh.select(col("doc_id")), newMembers)
    // two consumers each (append + a join below) — land once
    val newLabels = adv.newLabels.localCheckpoint(true)
    val merges = adv.remap.filter(col("__oldc") =!= col("__newc")).localCheckpoint(true)
    // fold the standing remap through this batch's merges so reads stay
    // one-hop: historical → current → (maybe) merged-now
    val mr = merges.select(col("__oldc").as("__mOld"), col("__newc").as("__mNew"))
    val composed = standingRemap
      .join(mr, standingRemap("__newc") === mr("__mOld"), "left")
      .select(standingRemap("__oldc"),
        coalesce(col("__mNew"), standingRemap("__newc")).as("__newc"))
    val foldedRemap = composed
      .unionByName(merges.select(col("__oldc"), col("__newc")))
      .filter(col("__oldc") =!= col("__newc")).distinct()
    newLabels.write.mode("append").parquet(labelsTable)
    // only buckets NEW to the index append (existing buckets' rows stay
    // as written and resolve through the remap). The existing-bucket set
    // is pruned to the batch's buckets FIRST (broadcast semi-probe —
    // map-only scan of the index, no corpus-wide distinct/shuffle), so
    // the anti-join's build side is batch-bounded like everything else
    val existingTouched = rawBuckets
      .join(broadcast(adv.members.select(col("bucket")).distinct()),
        Seq("bucket"), "left_semi")
      .select(col("bucket"))
    adv.members
      .join(broadcast(existingTouched), Seq("bucket"), "left_anti")
      .join(newLabels, Seq("doc_id"))
      .select(col("bucket"), col("component")).distinct()
      .write.mode("append").parquet(bucketTable)
    graft.operators.MergeWriter.overwriteAtomic(foldedRemap, remapTable)
  }

  /** The full dedup-state loop a deployment actually runs: ONE advance
    * per micro-batch maintaining every standing table — duplicate PAIRS
    * (pp02's flow: band index + shingle store) and cluster LABELS (pp04's
    * flow: labels + bucket index + remap) — off a single redelivery guard
    * and a single signature pass over the batch. Write order: pairs →
    * index/shingles (guarded) → labels/buckets/remap → docs last (the
    * guard commits the batch for BOTH flows atomically-enough: a crash
    * anywhere earlier redelivers the whole batch, and every append is
    * either per-table-guarded, duplicate-tolerated at read, or an
    * idempotent re-fold). */
  def maintainDedupState(batch: DataFrame, indexTable: String,
      pairsTable: String, shingleTable: String, labelsTable: String,
      bucketTable: String, remapTable: String, docTable: String): Unit = {
    val fresh = freshAgainst(batch, docTable)
    // a fully-guarded redelivery must be a true no-op — without this an
    // at-least-once upstream litters every standing table with empty
    // part files on each replay
    if (fresh.isEmpty) return
    val freshBands = graft.queries.TextOps.bandIndex(fresh).localCheckpoint(true)
    advanceBandIndex(fresh, freshBands, indexTable, pairsTable, shingleTable)
    advanceClusterState(fresh, freshBands, labelsTable, bucketTable, remapTable)
    fresh.write.mode("append").parquet(docTable)
  }

  /** Shared launcher for every maintainer's foreachBatch wrapper: with
    * `checkpoint` set, the query's progress survives a kill — on
    * restart, Structured Streaming redelivers the uncommitted batch and
    * the maintainers' doc-store guards / dedup-at-read seams absorb the
    * replay (MaintainerRestartSpec drives the full kill->restart e2e).
    * Without it, Spark uses a temp checkpoint (single-run semantics —
    * the spec-suite default). */
  private def startMaintainer(src: DataFrame, checkpoint: Option[String])(
      body: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = src.writeStream.foreachBatch(body)
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** [[maintainDedupState]] as a foreachBatch sink over a (doc_id, text)
    * document stream. */
  def dedupStateStream(docs: DataFrame, indexTable: String,
      pairsTable: String, shingleTable: String, labelsTable: String,
      bucketTable: String, remapTable: String, docTable: String,
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(docs, checkpoint)((b: DataFrame, _: Long) =>
        maintainDedupState(b, indexTable, pairsTable, shingleTable,
          labelsTable, bucketTable, remapTable, docTable))

  /** Delete every row of `table` whose `on` column(s) match an id,
    * preserving the table's column order (a USING join floats its key). */
  /** The doc-store tombstone swap every forget member ends with: keep
    * the survivors' rows unchanged, NULL `nulledCol` for the forgotten
    * ids (id kept — redelivery and future re-ingest stay blocked,
    * never-seen ids forward-block with every payload column null). The
    * store's FULL column set is preserved — survivors keep all columns
    * byte-identical, and a forgotten row keeps its other columns; a
    * store whose forget contract destroys MORE than one content column
    * must call once per column (each swap is idempotent and
    * order-free). Always LAST in a forget job: the swap is the
    * compaction commit witness, and it destroys the content decrements
    * recompute from. */
  private[graft] def tombstoneSwap(store: Option[DataFrame], idsC: DataFrame,
      docTable: String, nulledCol: String): Unit = {
    val out = store match {
      case Some(s) =>
        val order = s.columns.toIndexedSeq
        require(order.contains("doc_id") && order.contains(nulledCol),
          s"tombstoneSwap: store at $docTable lacks doc_id/$nulledCol " +
            s"(has ${order.mkString(",")})")
        val kept = s.join(idsC, Seq("doc_id"), "left_anti")
        val tombed = s.join(idsC, Seq("doc_id"), "left_semi")
          .withColumn(nulledCol,
            lit(null).cast(s.schema(nulledCol).dataType))
        val unseen = order.filterNot(_ == "doc_id").foldLeft(
            idsC.join(s.select("doc_id"), Seq("doc_id"), "left_anti")) {
          (acc, c) => acc.withColumn(c, lit(null).cast(s.schema(c).dataType))
        }
        kept.select(order.map(col): _*)
          .unionByName(tombed.select(order.map(col): _*))
          .unionByName(unseen.select(order.map(col): _*))
      case None =>
        idsC.select(col("doc_id"), lit(null).cast("string").as(nulledCol))
    }
    graft.operators.MergeWriter.overwriteAtomic(out, docTable)
  }

  private def deleteByIds(spark: SparkSession, table: String,
      idsC: DataFrame, on: Seq[String]): Unit =
    tryRead(spark, table).foreach { t0 =>
      val t = t0.localCheckpoint(true)
      val kept = on.foldLeft(t)((acc, c) =>
        acc.join(idsC.withColumnRenamed("doc_id", c), Seq(c), "left_anti"))
      graft.operators.MergeWriter.overwriteAtomic(
        kept.select(t0.columns.map(col).toIndexedSeq: _*), table)
    }

  /** DELETION PROPAGATION for the text-dedup family —
    * [[forgetVectorState]]'s document-side sibling: given doc ids,
    * remove every trace of their CONTENT from the maintained state
    * while keeping the ids guarded. The pair-flow state (band index,
    * shingle store, duplicate pairs) deletes EXACTLY — it is
    * id-granular and pairwise, so removing a doc's rows leaves
    * precisely the state a from-scratch ingest of the remaining corpus
    * builds. The doc store is rewritten with the forgotten ids'
    * text NULLED (the content IS the thing a deletion request is
    * about) — the id stays, so redelivery and future re-ingest of a
    * forgotten doc are both no-ops, and never-seen ids forward-block.
    *
    * Cluster-flow semantics, stated honestly: the forgotten docs'
    * LABEL rows delete (they vanish from every snapshot), and GHOST
    * BUCKETS — band keys whose only members were forgotten — delete
    * too (computed before the index shrinks), so a forgotten doc's
    * bands can never again merge strangers. What deletion does NOT do
    * is SPLIT a component the forgotten doc once bridged: the
    * remaining members keep their historical merge (conservative
    * over-grouping — the compliance obligation is removing the
    * subject's data, not re-deriving everyone else's grouping; the
    * exact split-repair is [[repairClusterSplits]] — the run-rarely
    * component-local rebuild, called BEFORE this job when the
    * deployment wants exact post-forget clustering).
    * Crash contract: every step is a pure idempotent function
    * of (its table's current content, ids) — re-run to repair; the doc
    * store, whose rewrite nulls the recoverable content, goes last. */
  /** The RUN-RARELY exact split repair [[forgetDedupState]] defers: a
    * deletion can DISCONNECT a component the forgotten docs once
    * bridged, and the default forget keeps the survivors' historical
    * merge (the documented conservative over-grouping). This job closes
    * that gap exactly and COMPONENT-LOCALLY: connected components re-run
    * over only the touched components' SURVIVING membership rows (their
    * band-index rows minus the forgotten ids) — work bounded by the
    * touched components' size, never the corpus. Call BEFORE
    * [[forgetDedupState]] (the repair reads the forgotten ids' label
    * rows to find the touched components — the forget then deletes
    * them); after repair + forget, [[clusterSnapshot]] equals a
    * from-scratch ingest of the surviving corpus, splits included.
    *
    * Crash-convergence (a write-ahead INTENT plus write order): the new
    * labels are NOT self-describing — a re-run after the labels swap
    * finds no forgotten label rows, and a new sub-component label L that
    * was once a merged-away component id still has a remap entry L → C
    * into the touched component, silently reverting the split for every
    * reader. So the TOUCHED SET lands first as a journal
    * (`remapTable + "_repair"` — one component id per row, bounded by
    * the forgotten ids' components): (0) the journal swaps in; a re-run
    * at ANY later point unions it with the freshly-derived touched set,
    * so the affected components are re-derivable even after step (2)
    * consumed the forgotten ids' label rows. (1) the BUCKET table swaps:
    * touched components' rows re-derive under the new CC labels (a
    * bucket whose only members were forgotten simply does not
    * regenerate); the union with the untouched rows is dedup'd, because
    * after a crash here a rebuilt row whose new label has no remap entry
    * resolves to itself — not touched — and would otherwise survive in
    * `kept` AND re-arrive via `rebuilt`. (2) the LABELS table swaps:
    * surviving members get their new labels written LITERALLY, forgotten
    * rows drop. (3) remap entries pointing INTO the touched components
    * delete — this is the step that makes the literal new labels
    * resolve as themselves. (4) the journal clears LAST; a stale journal
    * from a completed repair re-derives nothing — the re-run detects the
    * completed state (empty affected set, no fresh forgotten labels, no
    * remap entries into the journaled components) and short-circuits to
    * the journal clear — so every window re-runs to the same end state
    * (pinned step-by-step in ForgetStateSpec via the fault-injection
    * hook). */
  def repairClusterSplits(spark: SparkSession, ids: DataFrame,
      indexTable: String, labelsTable: String, bucketTable: String,
      remapTable: String): Unit =
    repairClusterSplitsImpl(spark, ids, indexTable, labelsTable,
      bucketTable, remapTable, Int.MaxValue)

  /** Test seam: `failAfterStep` throws after journal write (0), bucket
    * swap (1), labels swap (2), or remap cleanup (3) — ForgetStateSpec
    * crashes each window and pins that a plain re-run converges. */
  private[graft] def repairClusterSplitsImpl(spark: SparkSession,
      ids: DataFrame, indexTable: String, labelsTable: String,
      bucketTable: String, remapTable: String, failAfterStep: Int): Unit = {
    val journalTable = remapTable + "_repair"
    def crashPoint(n: Int): Unit =
      if (failAfterStep == n) throw new IllegalStateException(
        s"repairClusterSplits: injected crash after step $n")
    val idsC = ids.select(col("doc_id")).distinct().localCheckpoint(true)
    (tryRead(spark, labelsTable), tryRead(spark, indexTable)) match {
      case (Some(lblRaw), Some(idxRaw)) =>
        val lbl = lblRaw.localCheckpoint(true)
        val remap = tryRead(spark, remapTable).getOrElse(emptyRemap(spark))
          .localCheckpoint(true)
        val resolved = lbl.dropDuplicates("doc_id")
          .join(broadcast(remap), lbl("component") === remap("__oldc"), "left")
          .select(col("doc_id"),
            coalesce(col("__newc"), col("component")).as("component"))
          .localCheckpoint(true)
        // fresh touched ∪ a crashed run's journaled intent (see Scaladoc);
        // the fresh set stays separate so the short-circuit below can tell
        // a stale journal from a live repair
        val freshTouched = resolved.join(idsC, Seq("doc_id"), "left_semi")
          .select(col("component")).distinct().localCheckpoint(true)
        val touched = tryRead(spark, journalTable)
          .foldLeft(freshTouched)(
            (t, j) => t.unionByName(j.select(col("component"))))
          .distinct().localCheckpoint(true)
        if (touched.isEmpty) return
        val tc = touched.withColumnRenamed("component", "__tc")
        // surviving members of the touched components, and their new
        // clustering over index rows that exclude every forgotten id
        val affected = resolved.join(broadcast(touched), Seq("component"), "left_semi")
          .join(idsC, Seq("doc_id"), "left_anti")
          .select(col("doc_id")).localCheckpoint(true)
        // a stale journal from a COMPLETED repair resolves to an empty
        // affected set with no freshly-forgotten label rows and no remap
        // entries into the touched components (step 3 deleted them) —
        // re-running steps 1-3 would be two O(table) identity rewrites
        // just to clear the journal; skip straight to the clear. All
        // three guards matter: a component whose EVERY member is
        // forgotten also has an empty affected set but a nonempty fresh
        // set (its bucket/label/remap cleanup is real pending work), and
        // a crash between steps 2 and 3 leaves fresh empty but dangling
        // remap entries that a future merge's new label could resolve
        // through — both keep the full path.
        if (affected.isEmpty && freshTouched.isEmpty &&
            remap.join(broadcast(tc), remap("__newc") === tc("__tc"),
              "left_semi").isEmpty) {
          deleteTableDir(spark, journalTable)
          return
        }
        // (0) intent journal: the touched set must survive step (2),
        // which deletes the label rows it was derived from
        graft.operators.MergeWriter.overwriteAtomic(touched, journalTable)
        crashPoint(0)
        val members = idxRaw.localCheckpoint(true)
          .select(col("doc_id"),
            concat_ws(":", col("band"), col("bkey")).as("bucket"))
          .join(affected, Seq("doc_id"), "left_semi")
          .localCheckpoint(true)
        val comp = graft.operators.ConnectedComponents.bipartite(
          members, idCol = "doc_id", bucketCol = "bucket")
        val newLabels = affected.join(comp, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("component"))
          .localCheckpoint(true)
        // (1) bucket rows: untouched carry as written (their resolution
        // never passes through a touched component — see Scaladoc),
        // touched re-derive under the new labels
        tryRead(spark, bucketTable).foreach { b0 =>
          val b = b0.localCheckpoint(true)
          val bCur = b.join(broadcast(remap), b("component") === remap("__oldc"), "left")
            .select(col("bucket"), b("component"),
              coalesce(col("__newc"), b("component")).as("__cur"))
          val kept = bCur.join(broadcast(tc), bCur("__cur") === tc("__tc"), "left_anti")
            .select(col("bucket"), col("component"))
          val rebuilt = members.join(newLabels, Seq("doc_id"))
            .select(col("bucket"), col("component")).distinct()
          // distinct: after a crash here, a rebuilt row whose new label
          // has no remap entry survives in `kept` on the re-run too
          graft.operators.MergeWriter.overwriteAtomic(
            kept.unionByName(rebuilt).distinct(), bucketTable)
        }
        crashPoint(1)
        // (2) labels: rows of touched components (forgotten ids included)
        // replaced by the survivors' literal new labels
        val touchedDocs = resolved.join(broadcast(touched), Seq("component"), "left_semi")
          .select(col("doc_id"))
        graft.operators.MergeWriter.overwriteAtomic(
          lbl.join(touchedDocs, Seq("doc_id"), "left_anti")
            .select(col("doc_id"), col("component"))
            .unionByName(newLabels), labelsTable)
        crashPoint(2)
        // (3) remap entries into the touched components delete — the
        // step that makes the literal new labels resolve as themselves
        graft.operators.MergeWriter.overwriteAtomic(
          remap.join(broadcast(tc), remap("__newc") === tc("__tc"), "left_anti")
            .select(col("__oldc"), col("__newc")), remapTable)
        crashPoint(3)
        // (4) the intent is spent — clear it (a stale journal is safe,
        // see Scaladoc, but re-deriving completed components is waste)
        deleteTableDir(spark, journalTable)
      case _ =>
    }
  }

  // named deleteTableDir, NOT dropTable: several maintainer signatures in
  // this object take a `dropTable: Option[String]` PARAMETER (the SemDedup
  // drop-list table), and a helper of the same name would be shadowed
  // inside those scopes — any future call there would hit the Option and
  // fail confusingly
  private def deleteTableDir(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && !fs.delete(p, true))
      throw new java.io.IOException(s"deleteTableDir: delete failed for $path")
  }

  def forgetDedupState(spark: SparkSession, ids: DataFrame,
      indexTable: String, pairsTable: String, shingleTable: String,
      labelsTable: String, bucketTable: String, docTable: String): Unit = {
    val idsC = ids.select(col("doc_id")).distinct().localCheckpoint(true)
    // ghost buckets: bkeys held ONLY by forgotten docs — derived from
    // the index BEFORE it shrinks
    val ghosts = tryRead(spark, indexTable).map { idx0 =>
      // the bucket table's key is the advance's composite band:key string
      val idx = idx0.localCheckpoint(true)
        .select(col("doc_id"),
          concat_ws(":", col("band"), col("bkey")).as("bucket"))
      idx.join(idsC, Seq("doc_id"), "left_semi").select(col("bucket"))
        .join(idx.join(idsC, Seq("doc_id"), "left_anti").select(col("bucket")),
          Seq("bucket"), "left_anti")
        .distinct().localCheckpoint(true)
    }
    // bucket rows delete BEFORE the index shrinks: the ghost set is
    // derived from the forgotten docs' index rows, so a crash after the
    // index deletion would make a re-run compute an empty ghost set and
    // strand the ghost buckets forever — this order keeps every step
    // re-runnable from its own inputs
    ghosts.foreach { g =>
      tryRead(spark, bucketTable).foreach { b0 =>
        val b = b0.localCheckpoint(true)
        graft.operators.MergeWriter.overwriteAtomic(
          b.join(g, Seq("bucket"), "left_anti")
            .select(b0.columns.map(col).toIndexedSeq: _*), bucketTable)
      }
    }
    deleteByIds(spark, indexTable, idsC, Seq("doc_id"))
    deleteByIds(spark, shingleTable, idsC, Seq("doc_id"))
    deleteByIds(spark, pairsTable, idsC, Seq("d1", "d2"))
    deleteByIds(spark, labelsTable, idsC, Seq("doc_id"))
    tombstoneSwap(tryRead(spark, docTable).map(_.localCheckpoint(true)),
      idsC, docTable, "text")
  }

  /** DELETION PROPAGATION for the COUNTS-shaped family (vocabulary /
    * bigram LM) — and the cheapest member of the forget family, because
    * additive state is DECREMENTABLE: a forgotten doc's exact
    * contribution is recomputed from its stored text and appended as
    * NEGATIVE delta rows, so the count tables are repaired by an
    * O(deleted)-sized append instead of the O(corpus) rewrite the
    * vector/dedup families pay. After the job, [[vocabSnapshot]] /
    * [[lmSnapshot]] equal a from-scratch build over the surviving
    * corpus (net-zero keys are filtered at read and dropped at
    * compaction), the ids are tombstoned in the doc store (text NULLED,
    * id kept — redelivery and future re-ingest of a forgotten doc are
    * no-ops, never-seen ids forward-block), and the decrement itself is
    * redelivery-safe by the SAME mechanism as every advance: the rows
    * ride a deterministic negative batch_key, −(min forgotten-and-
    * still-present doc_id) − 1 — unique against every positive ingest
    * key, unique across COMPLETED forget jobs (their still-present sets
    * are disjoint, so their mins differ), and a crash-replay appends
    * byte-identical rows under the same key, which the snapshots'
    * (batch_key, key) dedup collapses.
    *
    * Crash contract (write order is the argument): the decrements are a
    * pure function of (CURRENT doc store, ids); the doc-store swap —
    * which nulls the text the decrements are recomputed from — goes
    * LAST. Crash before the swap: re-run recomputes the same gone set,
    * appends the same rows under the same key, dedup collapses. Crash
    * after: gone is empty, the appends no-op, the swap is idempotent.
    * [[compactVocab]]/[[compactLm]] treat a negative key as COMMITTED
    * only once its doc's text is null in the store (the swap is the
    * commit witness), so folding can never destroy the dedup evidence a
    * pending replay still needs. Single-maintenance-loop contract: call
    * BETWEEN advances, like every forget/compact job here.
    *
    * CRASHED-then-OVERLAPPING requests need one more step: a job that
    * crashed before its swap leaves PENDING decrement rows whose witness
    * doc is still live. A later, DIFFERENT request containing that
    * witness would (a) possibly derive the SAME key (same min over a
    * different gone set — the snapshots' (batch_key, key) dedup would
    * then mix the two row sets nondeterministically) and (b) tombstone
    * the witness with its OWN swap, which would commit the crashed job's
    * decrements for docs this request never tombstoned — counts would
    * drift below a from-scratch build. So before appending, the job
    * ROLLS BACK every pending negative key whose witness is in this
    * request's gone set: the crashed job's swap never ran (the swap is
    * atomic), so its appended rows are its ONLY effect, and deleting
    * them is a clean rollback; a committed key's witness has null text,
    * is never in `gone`, and is never touched. Re-running the crashed
    * request afterward recomputes its gone set against the new store
    * (minus this job's tombstones) and re-forgets what remains. The
    * rollback is an O(table) rewrite, paid only when a conflicting
    * pending key actually exists (the probe is O(batches) keys). */
  def forgetCountState(spark: SparkSession, ids: DataFrame, docTable: String,
      vocabTable: Option[String] = None, lmTable: Option[String] = None,
      cmsTable: Option[String] = None): Unit = {
    val idsC = ids.select(col("doc_id")).distinct().localCheckpoint(true)
    val store = tryRead(spark, docTable).map(_.localCheckpoint(true))
    // contributions still recoverable: forgotten ids whose text has not
    // been nulled yet (a re-run or an overlapping second request skips
    // already-forgotten docs — the double-decrement guard)
    val gone = store
      .map(_.filter(col("text").isNotNull).join(idsC, Seq("doc_id"), "left_semi"))
      .map(_.localCheckpoint(true))
      .filter(!_.isEmpty)
    gone.foreach { g =>
      val forgetKey = -g.agg(min(col("doc_id"))).head().getLong(0) - 1L
      rollbackPendingForgets(spark,
        Seq(vocabTable, lmTable, cmsTable).flatten, g)
      vocabTable.foreach { vt =>
        vocabDelta(g, forgetKey)
          .select(col("batch_key"), col("tok"),
            (-col("df")).as("df"), (-col("cf")).as("cf"))
          .write.mode("append").parquet(vt)
      }
      lmTable.foreach { lt =>
        lmDelta(g, forgetKey)
          .select(col("batch_key"), col("bigram"), (-col("n")).as("n"))
          .write.mode("append").parquet(lt)
      }
      cmsTable.foreach { ct =>
        cmsDelta(g, forgetKey)
          .select(col("batch_key"), col("j"), col("b"), (-col("n")).as("n"))
          .write.mode("append").parquet(ct)
      }
    }
    tombstoneSwap(store, idsC, docTable, "text")
  }

  /** Rollback of conflicting PENDING forget decrements (the
    * crashed-then-overlapping contract in [[forgetCountState]]'s
    * Scaladoc, shared with [[forgetMixState]]): delete, from each delta
    * table, every negative batch key whose witness doc (−key−1) is in
    * this request's still-present gone set — such a key belongs to a
    * forget job that crashed before its swap (a COMMITTED key's witness
    * is tombstoned and can never be in `gone`), its appended rows are
    * its only effect, and leaving them would let this request's key
    * collide with them or its swap falsely commit them. Long.MinValue
    * is the compactor's reserved fold key, never a witness key. The
    * O(table) rewrite is paid only when a conflicting pending key
    * actually exists. */
  private def rollbackPendingForgets(spark: SparkSession,
      tables: Seq[String], gone: DataFrame): Unit = {
    val witnessKeys = gone
      .select((-col("doc_id") - 1L).as("batch_key"))
      .filter(col("batch_key") =!= Long.MinValue)
      .localCheckpoint(true)
    tables.foreach { tb =>
      tryRead(spark, tb).foreach { t0 =>
        // cheap probe first — a column-pruned O(batches)-keys scan; the
        // table is materialized and rewritten ONLY when a conflicting
        // pending key actually exists (the rare crash-overlap path)
        val conflicted = t0.select(col("batch_key")).distinct()
          .join(witnessKeys, Seq("batch_key"), "left_semi")
          .localCheckpoint(true)
        if (!conflicted.isEmpty) {
          val t = t0.localCheckpoint(true)
          graft.operators.MergeWriter.overwriteAtomic(
            t.join(broadcast(conflicted), Seq("batch_key"), "left_anti"), tb)
        }
      }
    }
  }

  /** DELETION PROPAGATION for the domain-mix family — the additive-state
    * forget ([[forgetCountState]]'s mechanism verbatim, counts keyed by
    * source instead of token): a forgotten doc's per-source contribution
    * is exactly one count, recomputed from its stored (doc_id, source)
    * row and appended as a NEGATIVE delta under the deterministic
    * forget key −(min forgotten-and-still-present doc_id) − 1. After the
    * job, [[mixCountsSnapshot]]/[[mixRatesSnapshot]] equal a
    * from-scratch build over the survivors (net-zero sources filter at
    * read and drop at compaction), the ids are tombstoned in the doc
    * store (source NULLED, id kept — redelivery and re-ingest blocked,
    * never-seen ids forward-block), and the crashed-then-overlapping
    * contract is covered by [[rollbackPendingForgets]]. Write order and
    * crash/replay semantics are [[forgetCountState]]'s verbatim: the
    * decrements are a pure function of (current doc store, ids), the
    * store swap goes LAST and is [[compactMix]]'s commit witness. */
  def forgetMixState(spark: SparkSession, ids: DataFrame, docTable: String,
      countsTable: String): Unit = {
    val idsC = ids.select(col("doc_id")).distinct().localCheckpoint(true)
    val store = tryRead(spark, docTable).map(_.localCheckpoint(true))
    val gone = store
      .map(_.filter(col("source").isNotNull).join(idsC, Seq("doc_id"), "left_semi"))
      .map(_.localCheckpoint(true))
      .filter(!_.isEmpty)
    gone.foreach { g =>
      val forgetKey = -g.agg(min(col("doc_id"))).head().getLong(0) - 1L
      rollbackPendingForgets(spark, Seq(countsTable), g)
      mixDelta(g, forgetKey)
        .select(col("batch_key"), col("source"), (-col("n")).as("n"))
        .write.mode("append").parquet(countsTable)
    }
    tombstoneSwap(store, idsC, docTable, "source")
  }

  /** The current clustering under the maintained tables — (doc_id,
    * cluster_id, cluster_size), dd06's exact shape: one remap hop over
    * the written labels (duplicate label rows from redelivered batches
    * collapse here). */
  def clusterSnapshot(spark: SparkSession, labelsTable: String,
      remapTable: String): DataFrame = {
    val written = tryRead(spark, labelsTable).getOrElse(
      emptyRemap(spark).select(col("__oldc").as("doc_id"), col("__newc").as("component")))
    val remap = tryRead(spark, remapTable).getOrElse(emptyRemap(spark))
    val labels = written.dropDuplicates("doc_id")
      .join(broadcast(remap), written("component") === remap("__oldc"), "left")
      .select(col("doc_id"), coalesce(col("__newc"), col("component")).as("component"))
    val sizes = labels.groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "component")
      .select(col("doc_id"), col("component").as("cluster_id"), col("cluster_size"))
      .orderBy(col("doc_id"))
  }

  /** The CONTINUOUS leakage-safe split (sa11/pp37's serving member):
    * [[clusterSnapshot]]'s labels through the shared
    * [[graft.queries.TextOps.splitOf]] fold — the split is a pure
    * row-local function of the maintained label, so the continuous
    * member is a READ VIEW: no third standing table, nothing to forget
    * beyond the cluster state itself (deletion propagates through
    * [[forgetDedupState]]/[[repairClusterSplits]], and a repair that
    * splits a component migrates its docs' splits at the next read —
    * the same merge-migration semantics pp37 documents). */
  def splitSnapshot(spark: SparkSession, labelsTable: String,
      remapTable: String): DataFrame =
    graft.queries.TextOps.splitOf(
      clusterSnapshot(spark, labelsTable, remapTable)
        .select(col("doc_id"), col("cluster_id")))

  /** [[maintainClusterState]] as a foreachBatch sink over a (doc_id,
    * text) document stream. */
  def clusterStateStream(docs: DataFrame, labelsTable: String,
      bucketTable: String, remapTable: String, docTable: String,
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(docs, checkpoint)((b: DataFrame, _: Long) =>
        maintainClusterState(b, labelsTable, bucketTable, remapTable, docTable))

  /** Standing-table read that treats "not created yet" as None — shared
    * by every maintenance loop so a future behavior change (e.g. also
    * tolerating a FileNotFound race, or a catalog lookup) lands once. */
  private def tryRead(spark: SparkSession, path: String): Option[DataFrame] =
    try Some(spark.read.parquet(path))
    catch { case _: org.apache.spark.sql.AnalysisException => None }

  private def emptyRemap(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    emptyDf(spark, "__oldc" -> LongType, "__newc" -> LongType)
  }

  private def emptyBucketComp(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    emptyDf(spark, "bucket" -> StringType, "component" -> LongType)
  }

  /** [[maintainBandIndex]] as a foreachBatch sink over a (doc_id, text)
    * document stream. */
  def incrementalIndexStream(docs: DataFrame, indexTable: String,
      docTable: String, pairsTable: String, shingleTable: String,
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(docs, checkpoint)((b: DataFrame, _: Long) =>
        maintainBandIndex(b, indexTable, docTable, pairsTable, shingleTable))

  /** pp05's continuous twin: CONTINUOUS IVF maintenance. The coarse
    * quantizer `cents` is FIXED (trained once; re-training is a rebuild —
    * vs07 — not maintenance); per micro-batch of (vec_id, embedding) rows
    * the standing state advances by:
    *
    *  - `postingsTable` (cid, vec_id, q, nrm) — the inverted lists:
    *    the batch is normalized + assigned with the same kernels as vs06
    *    (|batch| × |cents| fused dot products, broadcast argmax — no
    *    corpus re-assignment, assignment is a pure per-row function of
    *    the fixed centroids) and APPENDED. Appended LAST: the postings
    *    table is also the redelivery guard (arrivals already in it are
    *    dropped before assigning). Zero-norm arrivals append under the
    *    sentinel cid −1 so their redelivery is a no-op like every other
    *    row's; consumers key on real cell ids and never see them.
    *  - `sumsTable` (batch_key, cid, dim, n_vectors, sum_q) — per-cell
    *    centroid-sum DELTAS, the additive state that decides when a cell
    *    has drifted enough to warrant a rebuild. Additive state is NOT
    *    idempotent under at-least-once redelivery, so each batch's rows
    *    carry a `batch_key` (the batch's min vec_id — deterministic, and
    *    unique across batches because the postings guard keeps fresh
    *    sets disjoint): a crash between the sums append and the postings
    *    append replays the batch, the replay recomputes BYTE-IDENTICAL
    *    delta rows under the same key, and [[ivfSumsSnapshot]] drops the
    *    duplicates by (batch_key, cid, dim) before summing. The same
    *    trick a transactional format's idempotent-writer option uses.
    *  - `dropTable` (optional — pp10's continuous twin, one standing
    *    postings table serving both the IVF search and SemDedup): the
    *    batch's CHANGED drop rows
    *    ([[graft.queries.VectorOps.semDedupAdvance]] against the
    *    pre-advance postings — batch vectors gaining a witness, standing
    *    vectors gaining a batch witness, each re-aggregated over its
    *    full witness set in the touched cells only) are APPENDED under
    *    the batch's `batch_key`. These rows are non-additive
    *    REPLACEMENTS, so the append relies on an ordering invariant
    *    instead of a sum: a vec_id re-enters the changed set only when
    *    it GAINS a witness (witnesses only accumulate, rows are never
    *    retracted), so per vec_id `n_witnesses` strictly increases
    *    across batches and [[semDedupSnapshot]] resolves latest-wins by
    *    max (n_witnesses, batch_key). Replay idempotence is the usual
    *    batch_key trick: the guard hasn't moved, so a crash replay
    *    appends byte-identical rows under the same key, invisible to a
    *    max. Earlier batches' files are never rewritten — per-batch
    *    write volume is O(changed rows), where the previous keyed-upsert
    *    design rewrote the whole drop table every batch.
    *    [[compactSemDedupDrops]] is the matching latest-wins compactor.
    *
    * Per-batch work and write volume are O(batch) for postings and sums
    * (nothing reads the corpus — the guard probe is a column-pruned id
    * scan of the postings at their own layout) plus, when the drop table
    * is maintained: one standing-postings scan (shared with the guard's
    * read; the touched-cell restriction prunes the JOIN work — pair
    * space — per the pp10 analysis, and becomes a physical scan prune
    * only under a cid-partitioned postings layout,
    * [[graft.operators.Layout.writePartitioned]]), the touched cells'
    * pair re-aggregation, and an O(changed rows) drop-delta append.
    * Compaction of the sums delta table is [[compactIvfSums]]; of the
    * drop delta table, [[compactSemDedupDrops]]. */
  def maintainIvfState(batch: DataFrame, cents: DataFrame,
      postingsTable: String, sumsTable: String,
      dropTable: Option[String] = None, tau: Double = 0.30): Unit =
    maintainIvfStateImpl(batch, cents, postingsTable, sumsTable, dropTable,
      tau, Int.MaxValue)

  /** Test seam (round-18 verdict item 5): `failAfterStep` throws after
    * the drop-delta append (0) or the sums append (1) — the two
    * MID-ADVANCE windows where some of the advance's tables have
    * advanced and others have not, which the redelivery/guard argument
    * covers but no spec crashed until now. MidAdvanceFaultSpec crashes
    * each window and pins that a plain re-run (the checkpoint's
    * redelivery of the same batch) converges every snapshot to the
    * no-crash state: the guard hasn't moved (the postings append is
    * last), so the replay recomputes byte-identical drop/sums rows under
    * the same batch_key and the snapshots' dedup collapses them. */
  private[graft] def maintainIvfStateImpl(batch: DataFrame, cents: DataFrame,
      postingsTable: String, sumsTable: String,
      dropTable: Option[String], tau: Double, failAfterStep: Int): Unit = {
    def crashPoint(n: Int): Unit =
      if (failAfterStep == n) throw new IllegalStateException(
        s"maintainIvfState: injected crash after step $n")
    val spark = batch.sparkSession
    // ONE logical read of the standing postings serves both the id guard
    // (column-pruned projection) and, below, the SemDedup standing frame
    val postings = tryRead(spark, postingsTable)
    // guard FIRST, on raw ids: normalizing already-stored arrivals would
    // spend the O(dim) per-row quantize/dot/sqrt work just to drop them
    // at the anti-join (the text flows' freshAgainst order, same reason).
    // In-batch dedup picks deterministically (max embedding per id — the
    // freshAgainst contract), so replays recompute identical fresh sets
    // even under divergent-payload duplicates.
    val freshRaw = postings
      .map(p => batch.join(
        pruneToBatchRange(p.select("vec_id"), batch, "vec_id"),
        Seq("vec_id"), "left_anti"))
      .getOrElse(batch)
      .groupBy(col("vec_id")).agg(max(col("embedding")).as("embedding"))
    val fresh = graft.queries.VectorOps.normed(freshRaw).localCheckpoint(true)
    // zero-norm arrivals are unindexable (normed drops them) but must
    // still be marked processed, or an at-least-once source redelivering
    // them re-pays the normalization forever and an all-degenerate batch
    // is never acknowledged: they enter the postings under the sentinel
    // cid −1 (empty q, zero nrm). Every postings consumer keys on REAL
    // cell ids — probe joins, pair joins and cell sums all match cid ≥ 0
    // — so sentinel rows are dead weight to every query and live only
    // for the guard's id probe.
    // pinned so the isEmpty probe and the write/union share ONE
    // evaluation of the guard-anti-join plan (batch-bounded rows)
    val rejects = freshRaw
      .join(fresh.select(col("vec_id")), Seq("vec_id"), "left_anti")
      .select(lit(-1L).as("cid"), col("vec_id"),
        lit(Array.empty[Long]).as("q"), lit(0.0).as("nrm"))
      .localCheckpoint(true)
    if (fresh.isEmpty) {
      if (!rejects.isEmpty) rejects.write.mode("append").parquet(postingsTable)
      return
    }
    val batchKey = fresh.agg(min(col("vec_id"))).head().getLong(0)
    val assigned = graft.queries.VectorOps.assignCells(fresh, cents)
      .localCheckpoint(true)
    // Continuous SemDedup (pp10's loop), maintained FIRST, against the
    // PRE-advance postings: semDedupAdvance is a pure function of
    // (standing, fresh batch), and the guard doesn't move until the
    // postings append below, so a crash anywhere in this advance replays
    // the same fresh set and appends byte-identical changed rows under
    // the same batch_key — duplicates a latest-wins max cannot see.
    // Witnesses only accumulate, so a changed row's aggregates over its
    // full witness set stay correct batch over batch; rows are never
    // retracted, and n_witnesses strictly increasing per vec_id is what
    // makes the snapshot's (n_witnesses, batch_key) max well-ordered.
    dropTable.foreach { dt =>
      val standing = postings.getOrElse(assigned.limit(0))
      semDedupDeltaAppend(dt,
        graft.queries.VectorOps.semDedupAdvance(standing, assigned, tau),
        batchKey)
    }
    crashPoint(0)
    ivfSumsDelta(assigned, batchKey).write.mode("append").parquet(sumsTable)
    crashPoint(1)
    assigned.unionByName(rejects).write.mode("append").parquet(postingsTable)
  }

  /** The per-cell centroid-sum delta rows of one assigned batch — the
    * exact rows [[maintainIvfState]] appends, shared with the
    * crash-simulation spec so a simulated partial write can never drift
    * from what the real advance writes. */
  private[graft] def ivfSumsDelta(assigned: DataFrame, batchKey: Long): DataFrame =
    graft.queries.VectorOps.cellDimSums(assigned)
      .select(lit(batchKey).as("batch_key"), col("cid"), col("dim"),
        col("n_vectors"), col("sum_q"))

  /** [[maintainIvfState]] as a foreachBatch sink over a (vec_id,
    * embedding) stream; pass `dropTable` to get the continuous SemDedup
    * leg through the same wrapper. */
  def ivfStateStream(vecs: DataFrame, cents: DataFrame,
      postingsTable: String, sumsTable: String,
      dropTable: Option[String] = None, tau: Double = 0.30,
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(vecs, checkpoint)((b: DataFrame, _: Long) =>
        maintainIvfState(b, cents, postingsTable, sumsTable, dropTable, tau))

  /** The current per-(cell, dim) exact centroid sums under the maintained
    * delta table — vs07's output shape over every vector that has
    * arrived. Duplicate delta rows from redelivered batches collapse on
    * (batch_key, cid, dim) before the sum. */
  def ivfSumsSnapshot(spark: SparkSession, sumsTable: String): DataFrame = {
    import org.apache.spark.sql.types._
    tryRead(spark, sumsTable).getOrElse(emptyDf(spark,
        "batch_key" -> LongType, "cid" -> LongType, "dim" -> LongType,
        "n_vectors" -> LongType, "sum_q" -> LongType))
      .dropDuplicates("batch_key", "cid", "dim")
      .groupBy(col("cid"), col("dim"))
      .agg(sum(col("n_vectors")).as("n_vectors"), sum(col("sum_q")).as("sum_q"))
      .orderBy(col("cid"), col("dim"))
  }

  /** IVF search over the maintained postings — vs06's query side against
    * the standing table ([[graft.queries.VectorOps.ivfSearch]], same
    * kernel as the batch gate). */
  def ivfSearchSnapshot(spark: SparkSession, postingsTable: String,
      queries: DataFrame, cents: DataFrame, nProbe: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val postings = tryRead(spark, postingsTable).getOrElse(emptyDf(spark,
      "cid" -> LongType, "vec_id" -> LongType,
      "q" -> ArrayType(LongType), "nrm" -> DoubleType))
    graft.queries.VectorOps.ivfSearch(postings, queries, cents, nProbe, k)
  }

  /** Continuous PQ-codes maintenance — pp14's loop, the codes-table
    * sibling of [[maintainIvfState]]: ONE standing table `codesTable`
    * (cid, vec_id, codes) holding every arrived vector's cell and PQ
    * codes against the FIXED (centroids, codebook) parameters. The
    * contract is the family's weakest, deliberately: assignment and
    * encode are pure per-row functions of fixed parameters, and the
    * only write is the guard-moving append itself — no additive state,
    * no delta table, no partial-crash window (a crashed append commits
    * nothing, the replay recomputes byte-identical rows from the
    * unchanged guard). Guard on raw vec_ids BEFORE normalization (the
    * maintainIvfState order, same O(dim)-work reason); in-batch
    * duplicates collapse deterministically (max embedding); zero-norm
    * arrivals enter under sentinel cid −1 with empty codes so
    * redelivering degenerate rows is a no-op — every search consumer
    * keys on real cell ids, so sentinel rows are invisible to queries.
    * Per-batch work and write volume O(batch). */
  def maintainPqCodes(batch: DataFrame, cents: DataFrame,
      book: Seq[org.apache.spark.sql.Row], codesTable: String): Unit = {
    require(book.nonEmpty, "empty PQ codebook")
    maintainPqCodesTrained(batch, cents,
      graft.queries.VectorOps.pqOf(book), codesTable)
  }

  /** [[maintainPqCodes]] under an already-materialized [[graft.queries
    * .VectorOps.Pq]] — the post-[[rebuildPqState]] era's advance, where
    * the books are TRAINED values rather than rows cut from a frame.
    * Same guard/redelivery/sentinel contract. */
  def maintainPqCodesTrained(batch: DataFrame, cents: DataFrame,
      pq: graft.queries.VectorOps.Pq, codesTable: String): Unit =
    advanceCodes(batch, codesTable)(fresh =>
      graft.queries.VectorOps.pqCodesPostings(fresh, cents, pq))

  /** [[maintainPqCodesTrained]] under an OPQ (permutation, books)
    * artifact pair — the post-[[rebuildOpqState]] era's advance. The
    * permutation changes ONLY the encode column (cell assignment stays
    * raw-space); guard/redelivery/sentinel contract identical. */
  def maintainOpqCodes(batch: DataFrame, cents: DataFrame,
      perm: IndexedSeq[Int], pq: graft.queries.VectorOps.Pq,
      codesTable: String): Unit =
    advanceCodes(batch, codesTable)(fresh =>
      graft.queries.VectorOps.opqCodesPostings(fresh, cents, pq, perm))

  /** The guard/normalize/reject/append skeleton every codes-table
    * advance shares — the encoder is the only per-family difference. */
  private def advanceCodes(batch: DataFrame, codesTable: String)(
      encode: DataFrame => DataFrame): Unit = {
    val spark = batch.sparkSession
    val freshRaw = tryRead(spark, codesTable)
      .map(p => batch.join(
        pruneToBatchRange(p.select("vec_id"), batch, "vec_id"),
        Seq("vec_id"), "left_anti"))
      .getOrElse(batch)
      .groupBy(col("vec_id")).agg(max(col("embedding")).as("embedding"))
    val fresh = graft.queries.VectorOps.normed(freshRaw).localCheckpoint(true)
    val rejects = freshRaw
      .join(fresh.select(col("vec_id")), Seq("vec_id"), "left_anti")
      .select(lit(-1L).as("cid"), col("vec_id"),
        lit(Array.empty[Long]).as("codes"))
    // pinned: the emptiness probe would otherwise re-run the encode plan
    // a second time for the write
    val out = encode(fresh)
      .unionByName(rejects)
      .localCheckpoint(true)
    if (!out.isEmpty) out.write.mode("append").parquet(codesTable)
  }

  /** pp20's continuous loop — [[maintainPqCodes]] with the SCALAR
    * quantizer (vs15's kernel): the standing (vec_id, codes) table
    * advanced by one row-local encode + append per batch under the
    * era's fixed per-dimension bounds. Same crash/redelivery contract
    * as the PQ twin (pure per-row encode, guard-moving append is the
    * only write); in-batch duplicates collapse deterministically (max
    * embedding); zero-norm arrivals enter with EMPTY codes so
    * redelivery is a no-op — [[graft.queries.VectorOps.sqScore]]
    * filters empty codes, so sentinel rows are invisible to queries.
    * A late arrival outside the trained bounds clamps to the grid edge
    * (sqCodes's contract) instead of corrupting the byte range — the
    * drift signal for scheduling a bounds re-train, not an error.
    * Per-batch work and write volume O(batch). */
  def maintainSqCodes(batch: DataFrame, vmin: Array[Long],
      vdiff: Array[Long], codesTable: String): Unit = {
    require(vmin.nonEmpty, "empty SQ bounds")
    val spark = batch.sparkSession
    val freshRaw = tryRead(spark, codesTable)
      .map(p => batch.join(
        pruneToBatchRange(p.select("vec_id"), batch, "vec_id"),
        Seq("vec_id"), "left_anti"))
      .getOrElse(batch)
      .groupBy(col("vec_id")).agg(max(col("embedding")).as("embedding"))
    val fresh = graft.queries.VectorOps.normed(freshRaw).localCheckpoint(true)
    val rejects = freshRaw
      .join(fresh.select(col("vec_id")), Seq("vec_id"), "left_anti")
      .select(col("vec_id"), lit(Array.empty[Long]).as("codes"))
    val out = fresh.select(col("vec_id"),
        graft.queries.VectorOps.sqCodes(col("q"), vmin, vdiff).as("codes"))
      .unionByName(rejects)
      .localCheckpoint(true)
    if (!out.isEmpty) out.write.mode("append").parquet(codesTable)
  }

  /** [[maintainSqCodes]] as a foreachBatch sink over a (vec_id,
    * embedding) stream. */
  def sqCodesStream(vecs: DataFrame, vmin: Array[Long], vdiff: Array[Long],
      codesTable: String,
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(vecs, checkpoint)((b: DataFrame, _: Long) =>
        maintainSqCodes(b, vmin, vdiff, codesTable))

  /** The SQ bounds REBUILD→SWAP — [[rebuildIvfState]]'s sibling for the
    * scalar quantizer, closing the third lifecycle (IVF, BPE, now SQ):
    * the bounds are fixed between rebuilds (vs15's contract), pp20's
    * advance clamps out-of-bounds late arrivals to the grid edge, and
    * clamping IS the drift signal — when it fires often enough, this
    * pass retrains. Retrains (vmin, vdiff) from the standing POSTINGS
    * table's vectors (codes tables are codes-only by design;
    * precondition: one ingest stream feeds both tables — the
    * rebuildIvfState contract verbatim) with the SAME one dim-bounded
    * aggregate the batch gate runs, re-encodes every standing row
    * row-locally against the new literal bounds, atomically swaps the
    * codes table, and returns the new bounds for subsequent
    * [[maintainSqCodes]] calls. Zero-norm sentinels carry through with
    * empty codes (invisible to sqScore). Crash contract: the pass is a
    * pure id-stable function of (postings content) — re-run to repair.
    * Single-maintenance-loop contract: call BETWEEN advances. Returns
    * None when no postings table exists yet. */
  def rebuildSqState(spark: SparkSession, postingsTable: String,
      sqCodesTable: String): Option[(Array[Long], Array[Long])] =
    tryRead(spark, postingsTable).map { p0 =>
      val p = p0.localCheckpoint(true)
      val real = p.filter(col("cid") >= 0).select(col("vec_id"), col("q"))
      val (vmin, vdiff) = graft.queries.VectorOps.sqTrain(real)
      val codes = real.select(col("vec_id"),
        graft.queries.VectorOps.sqCodes(col("q"), vmin, vdiff).as("codes"))
      val sentinels = p.filter(col("cid") < 0)
        .select(col("vec_id"), lit(Array.empty[Long]).as("codes"))
      graft.operators.MergeWriter.overwriteAtomic(
        codes.unionByName(sentinels), sqCodesTable)
      (vmin, vdiff)
    }

  /** pp24's continuous loop: CONTINUOUS kNN-graph maintenance — the
    * standing artifact vs19's graph search reads, kept current as
    * vectors arrive. Standing tables: `postingsTable` (the flow's
    * vector store AND id guard — [[maintainIvfState]]'s shape, sentinel
    * cid −1 for zero-norm arrivals) and `graphTable`, a parquet table
    * PARTITIONED BY cid holding vs13's edge rows. An advance scores the
    * batch against its own cells only ([[graft.queries.VectorOps
    * .knnGraphAdvanceTouched]] — stored edges stand in for every
    * standing-standing pair) and rewrites JUST the touched cid
    * partitions ([[graft.operators.MergeWriter.overwritePartitionsAtomic]]
    * — per-partition stage-then-publish, no delete-then-rename commit
    * window): per-batch write volume is O(touched cells' graph rows) =
    * O(affected), never the graph.
    * Write order: graph partitions first, then the guard-moving
    * postings append. Crash between the two: the batch is unguarded, a
    * replay recomputes the SAME touched partitions — the advance is
    * idempotent because stored edges referencing batch ids are dropped
    * and re-derived inside the kernel — and the second overwrite is
    * byte-equivalent. A crash INSIDE the publish rolls forward at the
    * next advance's entry repair, before any standing read. A touched
    * cell's edge set never shrinks to empty (members are never
    * removed), so the advance's intent never deletes a partition.
    * Per-batch compute Σ_touched
    * |cell∩standing|·|cell∩batch| — the incremental cost the pp24 gate
    * states, vs vs13's Σ|cell|² rescan. */
  def maintainKnnGraphState(batch: DataFrame, cents: DataFrame,
      postingsTable: String, graphTable: String, k: Int = 3): Unit = {
    val spark = batch.sparkSession
    // heal any crashed partition publish BEFORE the snapshot read below —
    // a pending committed stage reads as a missing partition otherwise
    graft.operators.MergeWriter.repairPartitionedTable(spark, graphTable, "cid")
    val postings = tryRead(spark, postingsTable)
    val freshRaw = postings
      .map(p => batch.join(
        pruneToBatchRange(p.select("vec_id"), batch, "vec_id"),
        Seq("vec_id"), "left_anti"))
      .getOrElse(batch)
      .groupBy(col("vec_id")).agg(max(col("embedding")).as("embedding"))
    // r18/r19 (guide §1.2 step 1 — don't pay a pass twice): ONE checkpoint
    // of the quantized+normed+ASSIGNED batch — assignment is a pure
    // row-local projection (NearestCentroid), so folding it into the same
    // checkpoint removes the second per-advance checkpoint job the r18
    // shape still paid; fresh and the zero-norm/null rejects are both
    // FILTERS over it. fresh/rejects are a TRUE PARTITION of graded
    // (p and !p): a row is classified exactly once regardless of exotic
    // norm values. A reject's row-local cid is discarded (overridden to
    // the −1 sentinel), so assigning it first costs nothing but the fused
    // projection's arithmetic. An EMPTY quantizer assigns cid null and
    // the null filter below drops those rows from `assigned` — exactly
    // assignCells' empty-quantizer contract (assign nothing), with the
    // rejects leg unaffected.
    val cs = cents.select(col("cid"), col("cq"), col("cn")).collect()
    val graded = freshRaw
      .select(col("vec_id"),
        graft.operators.Ann.quantize(col("embedding")).as("q"))
      .withColumn("nrm", sqrt(graft.operators.Ann.dotQ(col("q"), col("q"))
        .cast("double")))
      .withColumn("cid",
        if (cs.isEmpty) lit(null).cast("long")
        else graft.functions.VectorExpressions.nearestCentroid(
          col("q"), col("nrm"),
          cs.map(_.getLong(0)),
          cs.map(_.getSeq[Long](1).toArray),
          cs.map(_.getDouble(2))))
      .localCheckpoint(true)
    val assigned = graded.filter(col("nrm") > 0.0 && col("cid").isNotNull)
      .select(col("cid"), col("vec_id"), col("q"), col("nrm"))
    val rejects = graded.filter(!coalesce(col("nrm") > 0.0, lit(false)))
      .select(lit(-1L).as("cid"), col("vec_id"),
        lit(Array.empty[Long]).as("q"), lit(0.0).as("nrm"))
    val standPost = postings.map(_.filter(col("cid") >= 0))
      .getOrElse(assigned.limit(0))
    // touched cells derive from the checkpointed ASSIGNMENT (every cid
    // the advance can emit rows for is a batch-assigned cid, and the
    // collect is codebook-sized by construction) — the collect doubles as
    // the fresh-emptiness probe, so the advance pays no separate isEmpty
    // job. A batch-only singleton cell can stage ZERO rows for its cid;
    // the manifest's "empty" leg publishes that as partition deletion,
    // which is the correct graph for a one-member cell (no edges) and a
    // no-op when the partition never existed.
    val touchedCids = assigned.select(col("cid").cast("long"))
      .distinct().collect().map(_.getLong(0)).toIndexedSeq
    if (touchedCids.isEmpty) {
      if (!rejects.isEmpty) rejects.write.mode("append").parquet(postingsTable)
      return
    }
    val touchedRows = graft.queries.VectorOps.knnGraphAdvanceTouched(
      standPost, knnGraphSnapshot(spark, graphTable), assigned, k)
    graft.operators.MergeWriter.overwritePartitionsAtomic(
      touchedRows, graphTable, "cid", touchedCids)
    assigned.unionByName(rejects).write.mode("append").parquet(postingsTable)
  }

  /** The current graph under the maintained cid-partitioned table —
    * vs13's output shape (the partition column rides back as a normal
    * column, cast to long: partition-value inference would narrow it). */
  def knnGraphSnapshot(spark: SparkSession, graphTable: String): DataFrame = {
    import org.apache.spark.sql.types._
    tryRead(spark, graphTable)
      .map(_.withColumn("cid", col("cid").cast("long"))
        .select(col("query_id"), col("cid"), col("neighbor_id"), col("rank"),
          col("cos")))
      .getOrElse(emptyDf(spark, "query_id" -> LongType, "cid" -> LongType,
        "neighbor_id" -> LongType, "rank" -> IntegerType, "cos" -> DoubleType))
  }

  /** [[maintainKnnGraphState]] as a foreachBatch sink over a (vec_id,
    * embedding) stream. */
  def knnGraphStream(vecs: DataFrame, cents: DataFrame,
      postingsTable: String, graphTable: String, k: Int = 3,
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(vecs, checkpoint)((b: DataFrame, _: Long) =>
        maintainKnnGraphState(b, cents, postingsTable, graphTable, k))

  /** The PRODUCTION CELL-ROUTER for maintained-graph ingest. Round-17's
    * probe measured that CELL-ROUTED arrival is the only arrival shape
    * that prunes the kNN-graph advance's partition rewrite (~2.8× per
    * advance at 100k standing): the advance rewrites exactly the cid=
    * partitions the batch touches, so a batch spanning every cell
    * rewrites the whole graph no matter how its IDS cluster —
    * id-clustered (monotonic) ingest measured no better than
    * interleaved. Real arrivals are decorrelated from cells, so the
    * router STAGES them: the arriving micro-batch is assigned under the
    * standing quantizer (one |batch| × nlist broadcast argmax) and
    * appended to `stageTable` partitioned by CELL GROUP
    * kb = cid mod `groups`. The routing assignment is for GROUPING
    * only — the downstream advance re-derives assignment under the
    * CURRENT quantizer, on purpose: a row staged before a
    * [[rebuildIvfState]]-style era swap still lands in the right cell
    * when it finally flushes (its group is then merely approximate,
    * which costs prune quality for that one advance, never
    * correctness). The extra argmax pass is the price of regrouping —
    * measured round-18: ~2.3–2.8 s per 20k-row arrival, write
    * included, against a 10 s/advance saving;
    * zero-norm arrivals carry no cell and ride group 0 so they still
    * arrive exactly once. A later [[flushCellGroups]] turns each ready
    * group into a cell-clustered micro-batch touching ~1/groups of the
    * cells — the arrival shape the round-17 `cellwise` measurement
    * simulated by hand.
    *
    * At-least-once end to end: duplicate routed rows (a redelivered
    * source batch) re-route to the SAME kb (assignment is a pure row
    * function of the fixed quantizer) and collapse at the downstream
    * maintainer's id guard; `seq` is the arrival's batch id, the age
    * clock for the flush trigger. Single-maintenance-loop contract: one
    * router per staging table. */
  def routeByCell(batch: DataFrame, cents: DataFrame, stageTable: String,
      groups: Int, seq: Long): Unit = {
    require(groups > 0, s"routeByCell: groups must be positive, got $groups")
    val assigned = graft.queries.VectorOps.assignCells(
        graft.queries.VectorOps.normed(batch), cents)
      .select(col("vec_id"), col("cid"))
    batch.join(assigned, Seq("vec_id"), "left")
      .select(col("vec_id"), col("embedding"), lit(seq).as("seq"),
        coalesce(pmod(col("cid"), lit(groups.toLong)), lit(0L)).as("kb"))
      .write.mode("append").partitionBy("kb").parquet(stageTable)
  }

  /** Flush the READY cell groups of a [[routeByCell]] staging table: a
    * group is ready when it holds ≥ `minRows` staged rows (size trigger)
    * or its oldest row's arrival seq is ≤ curSeq − `maxLag` (age trigger
    * — no row waits unboundedly under a cold cell; `maxLag` counts
    * arrival batches, the router's `seq`). For each ready group,
    * `consume` receives (kb, rows) — a cell-clustered micro-batch,
    * materialized BEFORE its staged partition deletes; the delete (an
    * empty [[graft.operators.MergeWriter.overwritePartitionsAtomic]]
    * publish — the same atomic partition mechanics as every partitioned
    * rewrite here) runs only after `consume` returns, so a crash between
    * the two redelivers the WHOLE group, which the maintainers' id
    * guards collapse — the engine's standard at-least-once seam. The
    * readiness probe is one bounded aggregate (≤ `groups` rows
    * collected). Returns the flushed group ids; drain at decommission
    * with minRows = 1.
    *
    * SIZE `minRows` TO A FULL ADVANCE BATCH, not to the smallest group
    * the trigger math tolerates (measured, round-18 probe at 100k
    * standing): every flushed group pays the advance's per-batch
    * standing reads (the id-guard probe, the graph-snapshot listing),
    * so 2-arrivals'-worth groups (~8k rows) re-paid them 2-3× per
    * arrival and erased most of the routing win (13-15 s vs ~16.5
    * unrouted), while batch-sized groups (~20k rows) read 6.4-7.4 s —
    * the hand-grouped cellwise band. The latency bill of a bigger
    * `minRows` is bounded by `maxLag`, which is the knob that caps how
    * long a cold cell's rows wait. */
  def flushCellGroups(spark: SparkSession, stageTable: String,
      minRows: Long, maxLag: Long, curSeq: Long)(
      consume: (Long, DataFrame) => Unit): Seq[Long] = {
    // heal a crashed flush's pending partition publish before reading
    // the stage to derive this flush's own deletes (the documented
    // read-your-own-table contract of the partitioned writer)
    graft.operators.MergeWriter.repairPartitionedTable(spark, stageTable, "kb")
    tryRead(spark, stageTable).map { st =>
      val ready = st.groupBy(col("kb").cast("long").as("kb"))
        .agg(count(lit(1)).as("n"), min(col("seq")).as("oldest"))
        .filter(col("n") >= minRows || col("oldest") <= lit(curSeq - maxLag))
        .select(col("kb")).collect().map(_.getLong(0)).toIndexedSeq.sorted
      ready.foreach { kb =>
        val rows = st.filter(col("kb") === kb)
          .select(col("vec_id"), col("embedding")).localCheckpoint(true)
        consume(kb, rows)
        // the group is consumed — publish its empty partition (atomic
        // directory removal; crash before this point redelivers)
        graft.operators.MergeWriter.overwritePartitionsAtomic(
          rows.limit(0).select(col("vec_id"), col("embedding"),
            lit(0L).as("seq"), lit(kb).as("kb")),
          stageTable, "kb", Seq(kb))
      }
      ready
    }.getOrElse(Seq.empty)
  }

  /** [[flushCellGroups]] with the WAVE as the flush unit (r19, guide
    * §1.2 step 1 — batch the per-group driver jobs across the flush
    * set): every ready group's rows are materialized in ONE pass and
    * handed to `consume` as a single cell-clustered micro-batch, and
    * the flushed partitions delete in ONE atomic publish after it
    * returns. The downstream advance is invariant-correct over any
    * union of groups (after an advance, every touched cell's partition
    * equals the full build over standing ∪ batch — cells are computed
    * independently), so merging a wave changes WHICH advances run,
    * never the maintained graph; what it saves is the per-group fixed
    * costs the round-18 measurement priced (the stage-table repair,
    * the id-guard probe, the graph-snapshot listing, the postings
    * append — previously re-paid once PER READY GROUP per wave). The
    * crash seam coarsens from group to wave: a crash between `consume`
    * and the publish redelivers the WHOLE wave, which the maintainers'
    * id guards collapse — the same at-least-once contract. At steady
    * state waves usually hold ONE ready group (triggers stagger), so
    * the cell-clustering the router buys is intact; a multi-group wave
    * touches exactly the union of its groups' cells either way. */
  def flushCellGroupsBatched(spark: SparkSession, stageTable: String,
      minRows: Long, maxLag: Long, curSeq: Long)(
      consume: DataFrame => Unit): Seq[Long] = {
    graft.operators.MergeWriter.repairPartitionedTable(spark, stageTable, "kb")
    tryRead(spark, stageTable).map { st =>
      val ready = st.groupBy(col("kb").cast("long").as("kb"))
        .agg(count(lit(1)).as("n"), min(col("seq")).as("oldest"))
        .filter(col("n") >= minRows || col("oldest") <= lit(curSeq - maxLag))
        .select(col("kb")).collect().map(_.getLong(0)).toIndexedSeq.sorted
      if (ready.nonEmpty) {
        val rows = st.filter(col("kb").cast("long").isin(ready: _*))
          .select(col("vec_id"), col("embedding")).localCheckpoint(true)
        consume(rows)
        // all flushed partitions are consumed — publish their empty
        // partitions in one manifest (atomic; crash before this point
        // redelivers the wave)
        graft.operators.MergeWriter.overwritePartitionsAtomic(
          rows.limit(0).select(col("vec_id"), col("embedding"),
            lit(0L).as("seq"), lit(0L).as("kb")),
          stageTable, "kb", ready)
      }
      ready
    }.getOrElse(Seq.empty)
  }

  /** [[routeByCell]] + [[flushCellGroupsBatched]] +
    * [[maintainKnnGraphState]] as ONE foreachBatch sink — the
    * deployable loop that gives real decorrelated ingest the
    * cell-routed advance cost the round-17 measurement showed: each
    * arriving micro-batch stages under the router, then the ready cell
    * groups advance the graph as one cell-clustered micro-batch per
    * wave (usually a single group — triggers stagger at steady state).
    * Restart redelivers at both seams (source → stage, stage →
    * advance); the postings id guard closes both. Drain the stage with
    * a minRows = 1 flush at decommission, or rely on the age trigger.
    * Size `minRows` to a FULL advance batch for your arrival rate (see
    * [[flushCellGroups]] — the round-18 measurement: batch-sized
    * cell-pure flushes hit the hand-grouped cellwise band, small groups
    * re-pay the standing reads per flush); the default here is a floor,
    * not a recommendation. */
  def routedKnnGraphStream(vecs: DataFrame, cents: DataFrame,
      stageTable: String, postingsTable: String, graphTable: String,
      k: Int = 3, groups: Int = 8, minRows: Long = 1000L, maxLag: Long = 4L,
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(vecs, checkpoint)((b: DataFrame, seq: Long) => {
      routeByCell(b, cents, stageTable, groups, seq)
      flushCellGroupsBatched(b.sparkSession, stageTable, minRows, maxLag, seq)(
        rows =>
          maintainKnnGraphState(rows, cents, postingsTable, graphTable, k))
      ()
    })

  /** pp38's continuous loop: CONTINUOUS LSH-index maintenance — the
    * serving index behind vs04, kept current as vectors arrive
    * ([[maintainIvfState]]'s sibling with the hash-bucket geometry in
    * place of the coarse quantizer). One standing table: `idxTable`,
    * [[graft.operators.Ann.lshIndexRows]]' shape (table, bucket,
    * neighbor_id, cq, cn, dim), which doubles as the ID GUARD — an
    * arriving vec_id that already has index rows is dropped; the guard
    * is per-ID, so a crashed partial append heals id-by-id on replay
    * (the same at-least-once seam as every appending maintainer),
    * closed at read by [[graft.operators.Ann.probeLshIndex]]'s pair
    * dedup: a duplicated index row scores to a byte-identical
    * (query, neighbor, cos) row, which the probe's distinct()
    * collapses. The geometry (bits, tables) is FIXED like the IVF
    * quantizer — [[graft.operators.Ann.autoBits]] sizes the width at
    * build time; re-sizing as the corpus grows is a REBUILD (re-hash
    * the standing vectors under the new width, swap atomically), not
    * an advance — and the advance REQUIRES the batch's embedding width
    * to match the standing rows' (the plane matrix is a pure function
    * of (table, bit, dim-index); a disagreeing width would silently
    * bucket under a different matrix). Zero-norm arrivals never index
    * (unsearchable under cosine, vs04's contract): they stay "fresh"
    * to every advance and are re-dropped — wasted batch rows, never
    * corruption. Advance cost: O(batch × tables) hashing + the guard
    * anti-join; no standing read beyond the guard. */
  def maintainLshState(batch: DataFrame, bits: Int, tables: Int,
      idxTable: String): Unit = {
    val spark = batch.sparkSession
    val standing = tryRead(spark, idxTable)
    val fresh = standing match {
      case Some(st) => batch.join(
        st.select(col("neighbor_id").as("vec_id")).distinct(),
        Seq("vec_id"), "left_anti")
      case None => batch
    }
    val rows = graft.operators.Ann.lshIndexRows(fresh, "vec_id", "embedding",
      bits, tables).localCheckpoint(true)
    if (rows.isEmpty) return
    standing.foreach { st =>
      val sd = st.select(col("dim"), col("bits"), col("tabs")).head(1)
      val bd = rows.select(col("dim")).head(1)
      if (sd.nonEmpty) {
        // the geometry stamp travels in the rows (written by lshIndexRows,
        // re-stamped atomically by rebuildLshState's swap): an advance
        // called with a stale (bits, tables) after a rebuild would hash
        // the batch under a DIFFERENT plane matrix — appended rows become
        // unreachable (or spuriously bucket-collide) with no error,
        // silently breaking the snapshot == kernel contract
        require(sd(0).getInt(1) == bits && sd(0).getInt(2) == tables,
          s"maintainLshState: standing geometry (bits=${sd(0).getInt(1)}, " +
            s"tables=${sd(0).getInt(2)}) != advance args (bits=$bits, " +
            s"tables=$tables) at $idxTable — a width change is a rebuild, " +
            "not an advance")
        if (bd.nonEmpty)
          require(sd(0).getInt(0) == bd(0).getInt(0),
            s"maintainLshState: batch dim ${bd(0).getInt(0)} != standing dim " +
              s"${sd(0).getInt(0)} at $idxTable — a width change is a rebuild, not an advance")
      }
    }
    rows.write.mode("append").parquet(idxTable)
  }

  /** [[maintainLshState]] as a foreachBatch sink over a (vec_id,
    * embedding) stream. */
  def lshStateStream(vecs: DataFrame, bits: Int, tables: Int,
      idxTable: String, checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(vecs, checkpoint)((b: DataFrame, _: Long) =>
        maintainLshState(b, bits, tables, idxTable))

  /** vs04 over the maintained index: the current top-k for `queries`
    * under everything arrived — equals [[graft.operators.Ann.lshTopK]]
    * over the same corpus (LshStateSpec pins it batch-for-batch);
    * redelivery duplicates collapse in the probe's pair dedup. */
  def lshSearchSnapshot(spark: SparkSession, queries: DataFrame,
      idxTable: String, k: Int, bits: Int, tables: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val idx = tryRead(spark, idxTable).getOrElse(emptyDf(spark,
      "table" -> IntegerType, "bucket" -> LongType, "neighbor_id" -> LongType,
      "cq" -> ArrayType(LongType), "cn" -> DoubleType, "dim" -> IntegerType,
      "bits" -> IntegerType, "tabs" -> IntegerType))
    graft.operators.Ann.probeLshIndex(queries, idx, "vec_id", "embedding",
      k, bits, tables)
  }

  /** The LSH-index REBUILD — [[rebuildIvfState]]'s sibling for the hash
    * geometry: re-hash every standing vector under a NEW width (the
    * [[graft.operators.Ann.autoBits]] the grown corpus calls for) and
    * swap atomically. The standing rows carry (cq, cn) — the quantized
    * vectors themselves — so the rebuild needs no second source: one
    * distinct over the index's members, one hashing pass, one swap.
    * The swap also re-stamps the rows' (bits, tabs) geometry columns —
    * atomically with the re-hash, so a post-rebuild advance or probe
    * still carrying the OLD width is refused loudly by the stamp guards
    * in [[maintainLshState]] / [[graft.operators.Ann.probeLshIndex]]
    * instead of silently hashing under the wrong plane matrix. Between
    * rebuilds the geometry is fixed, exactly like the IVF quantizer
    * between [[rebuildIvfState]] eras. */
  def rebuildLshState(spark: SparkSession, newBits: Int, tables: Int,
      idxTable: String): Unit =
    tryRead(spark, idxTable).foreach { st0 =>
      val members = st0.select(col("neighbor_id"), col("cq"), col("cn"),
          col("dim")).dropDuplicates("neighbor_id")
        .localCheckpoint(true)
      val dim = members.select(col("dim")).head(1)
      if (dim.nonEmpty) {
        // cq is already quantized: re-hash through the same plane
        // expressions the ingest used (bucketOf over cq), width newBits
        val rehashed = graft.operators.Ann.rehashIndexRows(
          members.select(col("neighbor_id"), col("cq"), col("cn")),
          newBits, tables, dim(0).getInt(0))
        graft.operators.MergeWriter.overwriteAtomic(rehashed, idxTable)
      }
    }

  /** DELETION PROPAGATION for the LSH index — exact and id-granular:
    * hashing is row-local, so deleting a forgotten id's rows leaves
    * precisely the index a from-scratch build over the survivors
    * produces (nothing cross-row to repair — the cheapest member of
    * the vector forget family). The index doubles as the id guard, so
    * deletion also releases it: redelivery of a forgotten vector
    * re-indexes it; a deployment that must forward-block pairs the
    * index with a tombstoning doc store (the dedup family's
    * [[forgetDedupState]] pattern). */
  def forgetLshState(spark: SparkSession, ids: DataFrame,
      idxTable: String): Unit =
    tryRead(spark, idxTable).foreach { t0 =>
      val t = t0.localCheckpoint(true)
      val idsC = ids.select(col("vec_id").as("neighbor_id")).distinct()
      graft.operators.MergeWriter.overwriteAtomic(
        t.join(idsC, Seq("neighbor_id"), "left_anti")
          .select(t0.columns.map(col).toIndexedSeq: _*), idxTable)
    }

  /** DELETION PROPAGATION — the right-to-be-forgotten job every
    * production training-data pipeline needs and most engines bolt on
    * late: given a set of vector ids, leave the whole maintained vector
    * state (postings, PQ codes, cell sums, kNN graph) EXACTLY as if
    * those vectors had never arrived — while keeping the ids GUARDED so
    * an at-least-once upstream redelivering a forgotten row cannot
    * resurrect it (ids are rewritten as TOMBSTONES, sentinel cid −2
    * with empty payload: behind the guard's id probe like the −1
    * zero-norm sentinel, invisible to every cid ≥ 0 consumer; ids never
    * seen also tombstone, which forward-blocks in-flight arrivals of a
    * forgotten user). Deliberately run-rarely and O(corpus) — deletion
    * requests batch up against compliance deadlines, and this is the
    * same cost class as the rebuild jobs — EXCEPT the graph repair,
    * which recomputes only the cells the deleted vectors occupied
    * ([[graft.operators.MergeWriter.overwritePartitionsAtomic]]; a cell
    * whose edge set empties stages no rows, so the atomic publish
    * removes its partition directory).
    *
    * Crash contract (write order is the argument): the three REPAIRS
    * (graph, codes, sums) are pure functions of (CURRENT postings
    * content, ids) — the postings swap, which destroys the
    * which-cells-did-the-deleted-rows-occupy recovery information, goes
    * LAST. A crash anywhere before it: re-run, every repair recomputes
    * byte-identically. A crash after it: the job had already completed
    * every repair. Single-maintenance-loop contract: call BETWEEN
    * advances. */
  def forgetVectorState(spark: SparkSession, ids: DataFrame,
      postingsTable: String, codesTable: Option[String] = None,
      sumsTable: Option[String] = None, graphTable: Option[String] = None,
      graphK: Int = 3): Unit =
    tryRead(spark, postingsTable).foreach { p0 =>
      val p = p0.localCheckpoint(true)
      val idsC = ids.select(col("vec_id")).distinct().localCheckpoint(true)
      forgetRepairs(spark, p, idsC, codesTable, sumsTable, graphTable, graphK)
      val tombstones = idsC.select(lit(-2L).as("cid"), col("vec_id"),
        lit(Array.empty[Long]).as("q"), lit(0.0).as("nrm"))
      // the USING join floats the key column to the front; re-project to
      // the canonical (cid, vec_id, q, nrm) order the maintainers write
      graft.operators.MergeWriter.overwriteAtomic(
        p.join(idsC, Seq("vec_id"), "left_anti")
          .select(col("cid"), col("vec_id"), col("q"), col("nrm"))
          .unionByName(tombstones),
        postingsTable)
    }

  /** The repair half of [[forgetVectorState]] — exposed for the
    * crash-simulation spec (a repair landed, the postings swap did not;
    * the re-run must converge). */
  private[graft] def forgetRepairs(spark: SparkSession, p: DataFrame,
      idsC: DataFrame, codesTable: Option[String], sumsTable: Option[String],
      graphTable: Option[String], graphK: Int): Unit = {
    val keptReal = p.filter(col("cid") >= 0)
      .join(idsC, Seq("vec_id"), "left_anti").localCheckpoint(true)
    graphTable.foreach { gt =>
      val touched = p.filter(col("cid") >= 0)
        .join(idsC, Seq("vec_id"), "left_semi")
        .select(col("cid")).distinct().localCheckpoint(true)
      if (!touched.isEmpty) {
        val repaired = graft.queries.VectorOps.knnGraph(
          keptReal.join(touched, Seq("cid"), "left_semi"), graphK)
        // every touched cell is in the intent: a cell whose edge set
        // emptied (0 or 1 members left) stages no rows, so the atomic
        // publish DELETES its partition — the case dynamic overwrite
        // could not express and the old path FS-deleted separately
        graft.operators.MergeWriter.overwritePartitionsAtomic(
          repaired, gt, "cid",
          touched.collect().map(_.getLong(0)).toIndexedSeq)
      }
    }
    codesTable.foreach { ct =>
      tryRead(spark, ct).foreach { c0 =>
        val c = c0.localCheckpoint(true)
        val tomb = idsC.select(lit(-2L).as("cid"), col("vec_id"),
          lit(Array.empty[Long]).as("codes"))
        graft.operators.MergeWriter.overwriteAtomic(
          c.join(idsC, Seq("vec_id"), "left_anti")
            .select(col("cid"), col("vec_id"), col("codes"))
            .unionByName(tomb), ct)
      }
    }
    sumsTable.foreach { st =>
      graft.operators.MergeWriter.overwriteAtomic(
        ivfSumsDelta(keptReal, Long.MinValue), st)
    }
  }

  /** The PQ codebook REBUILD→SWAP — the FOURTH quantizer lifecycle
    * closed (IVF centroids, BPE merges, SQ bounds, now PQ books): pp14's
    * advance encodes against FIXED books between rebuilds; when
    * reconstruction error has drifted (new data no longer looks like the
    * data the books were trained on), this pass retrains. Trains the
    * per-subspace books from the standing POSTINGS table's vectors
    * (codes tables are codes-only by design; precondition: one ingest
    * stream feeds both tables — the rebuildIvfState contract verbatim)
    * with the vs16 Lloyd kernel ([[graft.queries.VectorOps
    * .trainPqBooks]]; init = the 64 lowest-vec_id standing rows, the
    * driver-sized [[graft.queries.VectorOps.pqOf]] convention),
    * re-encodes every standing row ROW-LOCALLY against the new literal
    * books, atomically swaps pp14's codes table, and returns the trained
    * [[graft.queries.VectorOps.Pq]] for subsequent
    * [[maintainPqCodesTrained]] advances. Sentinel rows (cid −1) carry
    * through with empty codes — invisible to the cid-keyed search, but
    * their ids stay behind the guard. Deliberately corpus-sized (iters
    * row-local encode passes + codebook-sized rollups, then one encode
    * + swap) — the run-rarely rebuild the O(batch) advances amortize.
    * Crash contract: a pure id-stable function of (postings content,
    * iters) — re-run to repair. Single-maintenance-loop contract: call
    * BETWEEN advances. None when no postings table or no real rows
    * exist yet. */
  def rebuildPqState(spark: SparkSession, postingsTable: String,
      pqCodesTable: String, iters: Int = 1)
      : Option[graft.queries.VectorOps.Pq] =
    tryRead(spark, postingsTable).flatMap { p0 =>
      val p = p0.localCheckpoint(true)
      val real = p.filter(col("cid") >= 0)
        .select(col("cid"), col("vec_id"), col("q"))
      val initRows = real.select(col("vec_id"), col("q"))
        .orderBy(col("vec_id")).limit(64).collect().toIndexedSeq
      if (initRows.isEmpty) None
      else {
        val pq0 = graft.queries.VectorOps.pqOf(initRows)
        val books = graft.queries.VectorOps.trainPqBooks(
          real.select(col("vec_id"), col("q")), pq0.books, pq0.subDims,
          pq0.nCodes, iters)
        val pq = graft.queries.VectorOps.Pq(pq0.subDims, pq0.nCodes, books)
        val codes = real.select(col("cid"), col("vec_id"),
          pq.codes(col("q")).as("codes"))
        val sentinels = p.filter(col("cid") < 0).select(col("cid"),
          col("vec_id"), lit(Array.empty[Long]).as("codes"))
        graft.operators.MergeWriter.overwriteAtomic(
          codes.unionByName(sentinels), pqCodesTable)
        Some(pq)
      }
    }

  /** The OPQ REBUILD→SWAP — [[rebuildPqState]] with the dimension
    * reallocation trained alongside the books ([[graft.queries.VectorOps
    * .opqPerm]]'s variance-balancing round-robin over the STANDING
    * postings): derive the permutation from the corpus, train the books
    * on the permuted layout (init = first-64 permuted subvectors, the
    * vs21 convention), re-encode every standing vector, swap the codes
    * table, and persist the permutation as a (pos, src_dim) table —
    * the second half of the artifact pair a restarted deployment reads
    * back through [[opqPermSnapshot]]. Sentinels carry (guard must not
    * move). Crash contract = rebuildPqState's: two swaps, no cross-table
    * transaction, but the whole pass is a pure id-stable function of
    * (postings content, iters) — re-running repairs any crash between
    * them byte-identically. Write order: codes FIRST, perm table last —
    * search consumers take (perm, books) from the RETURN value or the
    * perm table only after both landed; a crash between leaves the old
    * perm table with new codes, and the re-run converges. One
    * corpus-sized pass, the run-rarely cost the O(batch)
    * [[maintainOpqCodes]] advances amortize. */
  def rebuildOpqState(spark: SparkSession, postingsTable: String,
      pqCodesTable: String, permTable: String, iters: Int = 1)
      : Option[(IndexedSeq[Int], graft.queries.VectorOps.Pq)] =
    tryRead(spark, postingsTable).flatMap { p0 =>
      val p = p0.localCheckpoint(true)
      val real = p.filter(col("cid") >= 0)
        .select(col("cid"), col("vec_id"), col("q"))
      if (real.isEmpty) None
      else {
        val perm = graft.queries.VectorOps.opqPerm(
          real.select(col("vec_id"), col("q")))
        val permuted = graft.queries.VectorOps.opqPermute(
          real.select(col("vec_id"), col("q")), perm)
        val initRows = permuted.orderBy(col("vec_id")).limit(64)
          .collect().toIndexedSeq
        val pq0 = graft.queries.VectorOps.pqOf(initRows)
        val books = graft.queries.VectorOps.trainPqBooks(
          permuted, pq0.books, pq0.subDims, pq0.nCodes, iters)
        val pq = graft.queries.VectorOps.Pq(pq0.subDims, pq0.nCodes, books)
        val codes = real.select(col("cid"), col("vec_id"),
          pq.codes(graft.queries.VectorOps.opqCol(perm)).as("codes"))
        val sentinels = p.filter(col("cid") < 0).select(col("cid"),
          col("vec_id"), lit(Array.empty[Long]).as("codes"))
        graft.operators.MergeWriter.overwriteAtomic(
          codes.unionByName(sentinels), pqCodesTable)
        graft.operators.MergeWriter.overwriteAtomic(
          spark.createDataFrame(perm.zipWithIndex.map { case (d, pos) =>
            (pos.toLong, d.toLong) }).toDF("pos", "src_dim"),
          permTable)
        Some((perm, pq))
      }
    }

  /** The persisted permutation half of the OPQ artifact pair —
    * driver-sized by construction (one row per dimension). */
  def opqPermSnapshot(spark: SparkSession, permTable: String)
      : Option[IndexedSeq[Int]] =
    tryRead(spark, permTable).map(_.orderBy(col("pos")).collect()
      .map(_.getLong(1).toInt).toIndexedSeq)

  /** [[pqSearchSnapshotTrained]] under the OPQ layout: the query's ADC
    * table is built over its permuted vector, probing stays raw-space,
    * the candidates' stored codes are already permuted — vs22's read
    * path over the maintained table. */
  def opqSearchSnapshot(spark: SparkSession, codesTable: String,
      queriesNormed: DataFrame, cents: DataFrame, perm: IndexedSeq[Int],
      pq: graft.queries.VectorOps.Pq, k: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val postings = tryRead(spark, codesTable).getOrElse(emptyDf(spark,
      "cid" -> LongType, "vec_id" -> LongType, "codes" -> ArrayType(LongType)))
    graft.queries.VectorOps.ivfPqScore(postings,
      graft.queries.VectorOps.opqQueries(queriesNormed, pq, perm),
      cents, pq, k)
  }

  /** The SQ asymmetric search (vs15's scorer) over the maintained codes
    * table — pp20's read path. */
  def sqSearchSnapshot(spark: SparkSession, codesTable: String,
      queriesNormed: DataFrame, vmin: Array[Long], vdiff: Array[Long],
      k: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val enc = tryRead(spark, codesTable).getOrElse(emptyDf(spark,
      "vec_id" -> LongType, "codes" -> ArrayType(LongType)))
    graft.queries.VectorOps.sqScore(enc,
      graft.queries.VectorOps.sqQueries(queriesNormed), vmin, vdiff, k)
  }

  /** The REBUILD→SWAP that closes the index lifecycle: the maintainers
    * grow the standing state O(batch) between rebuilds; when the sums
    * deltas say the quantizer has drifted, a retrain (vs11's integer
    * Lloyd loop) produces NEW centroids and this pass redeploys them.
    * ONE corpus-sized pass — re-assign the standing postings' vectors
    * row-locally against the new literal centroids (the same kernel as
    * every assignment) and atomically swap the table; then swap the
    * codes table (pp14's) re-encoded against the new `book` when
    * supplied; then REWRITE the sums delta table as the new drift
    * baseline under the reserved key (drift is measured against the
    * rebuild's own assignment from now on). Sentinel rows (cid −1)
    * carry through unchanged — their ids must stay behind the guard or
    * redelivered degenerate rows re-enter the flow. The codes rebuild
    * re-derives from the POSTINGS table's vectors (codes tables are
    * codes-only by design); precondition: one ingest stream feeds both
    * tables, the MaintainerProbe deployment.
    * Crash contract: three swaps, no cross-table transaction — but the
    * whole pass is a pure, id-stable function of (postings content, new
    * parameters), so a crash between swaps is repaired by RE-RUNNING the
    * rebuild (each completed swap is re-produced byte-identically, each
    * missing one lands); search correctness never depends on the sums
    * table. Deliberately corpus-sized: this is the run-rarely rebuild
    * the O(batch) maintainers amortize — one full scan + swap, the same
    * cost class as any reindex. Single-maintenance-loop contract: call
    * BETWEEN advances (read-then-swap drops a concurrent append). */
  def rebuildIvfState(spark: SparkSession, newCents: DataFrame,
      postingsTable: String, sumsTable: String,
      codesRebuild: Option[(String, Seq[org.apache.spark.sql.Row])] = None)
      : Unit =
    tryRead(spark, postingsTable).foreach { p0 =>
      val p = p0.localCheckpoint(true)
      val real = p.filter(col("cid") >= 0)
        .select(col("vec_id"), col("q"), col("nrm"))
      val sentinels = p.filter(col("cid") < 0)
      val reassigned = graft.queries.VectorOps.assignCells(real, newCents)
        .localCheckpoint(true)
      graft.operators.MergeWriter.overwriteAtomic(
        reassigned.unionByName(sentinels), postingsTable)
      codesRebuild.foreach { case (codesTable, book) =>
        val pq = graft.queries.VectorOps.pqOf(book)
        val codes = reassigned
          .select(col("cid"), col("vec_id"), pq.codes(col("q")).as("codes"))
        val codeSentinels = sentinels.select(col("cid"), col("vec_id"),
          lit(Array.empty[Long]).as("codes"))
        graft.operators.MergeWriter.overwriteAtomic(
          codes.unionByName(codeSentinels), codesTable)
      }
      graft.operators.MergeWriter.overwriteAtomic(
        ivfSumsDelta(reassigned, Long.MinValue), sumsTable)
    }

  /** [[maintainPqCodes]] as a foreachBatch sink over a (vec_id,
    * embedding) stream. */
  def pqCodesStream(vecs: DataFrame, cents: DataFrame,
      book: Seq[org.apache.spark.sql.Row], codesTable: String,
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(vecs, checkpoint)((b: DataFrame, _: Long) =>
        maintainPqCodes(b, cents, book, codesTable))

  /** The IVF-PQ search (vs09's scorer) over the maintained codes table —
    * pp14's read path. `queriesNormed` is a normed (vec_id, q, nrm)
    * frame; the catalog's fixed query window applies. */
  def pqSearchSnapshot(spark: SparkSession, codesTable: String,
      queriesNormed: DataFrame, cents: DataFrame,
      book: Seq[org.apache.spark.sql.Row], k: Int): DataFrame =
    pqSearchSnapshotTrained(spark, codesTable, queriesNormed, cents,
      graft.queries.VectorOps.pqOf(book), k)

  /** [[pqSearchSnapshot]] under an already-materialized Pq — the read
    * path of a post-[[rebuildPqState]] era. */
  def pqSearchSnapshotTrained(spark: SparkSession, codesTable: String,
      queriesNormed: DataFrame, cents: DataFrame,
      pq: graft.queries.VectorOps.Pq, k: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val postings = tryRead(spark, codesTable).getOrElse(emptyDf(spark,
      "cid" -> LongType, "vec_id" -> LongType, "codes" -> ArrayType(LongType)))
    graft.queries.VectorOps.ivfPqScore(postings,
      graft.queries.VectorOps.pqQueries(queriesNormed, pq), cents, pq, k)
  }

  /** Append a batch's changed drop rows to the standing drop-delta table
    * under its `batch_key` — the exact write [[maintainIvfState]]
    * performs (shared with the crash-simulation spec so a simulated
    * partial advance can't drift from the product's). Append-only:
    * earlier batches' files are never touched, and the write volume is
    * O(changed rows) — the old keyed-upsert design rewrote the whole
    * table per batch, the one per-batch cost here that was O(standing)
    * rather than O(batch). */
  private[graft] def semDedupDeltaAppend(dropTable: String,
      changed: DataFrame, batchKey: Long): Unit =
    changed.select(lit(batchKey).as("batch_key"), col("vec_id"), col("cid"),
        col("witness_id"), col("n_witnesses"), col("max_cos"))
      .write.mode("append").parquet(dropTable)

  /** The current SemDedup drop list under the maintained delta table —
    * dd10's output shape over every vector that has arrived. Resolution
    * is latest-wins per vec_id by max (n_witnesses, batch_key): a vec_id
    * re-enters the changed set only when it gains a witness, so
    * n_witnesses strictly increases across its delta rows and the max is
    * the newest full-row replacement; the batch_key tiebreak only ever
    * separates byte-identical replay duplicates (and ranks the
    * compactor's reserved-key fold below any live row with equal
    * count — which cannot occur between distinct real batches). */
  def semDedupSnapshot(spark: SparkSession, dropTable: String): DataFrame = {
    import org.apache.spark.sql.types._
    val payload = Seq("cid", "witness_id", "n_witnesses", "max_cos")
    tryRead(spark, dropTable).getOrElse(emptyDf(spark,
        "batch_key" -> LongType, "vec_id" -> LongType, "cid" -> LongType,
        "witness_id" -> LongType, "n_witnesses" -> LongType,
        "max_cos" -> DoubleType))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(payload.map(col): _*),
        struct(col("n_witnesses"), col("batch_key"))).as("__r"))
      .select(col("vec_id") +: payload.map(p => col(s"__r.$p").as(p)): _*)
      .orderBy(col("vec_id"))
  }

  /** Fold a `batch_key`-tagged delta table to one row per key group under
    * the reserved key — the pointer-compaction maintenance job for
    * additive state (bounds table growth at O(live keys) instead of
    * O(batches × keys)).
    *
    * Only COMMITTED batches fold: a batch's delta rows are committed once
    * its key id reached the guard table (the guard append is the LAST
    * step of every advance), so a batch that crashed mid-advance — delta
    * rows in the table, guard never advanced — keeps its rows under its
    * own key. Folding them would break the replay twice over: the
    * redelivered batch re-appends under its key while the folded copy
    * hides under the reserved key (double count the snapshot dedup can't
    * see), and the span flow's own-key exclusion would no longer exclude
    * them (standing counts inflated by the batch's own bnd → crossings
    * missed). The reserved key itself is committed by construction (it
    * only ever holds previously-folded committed rows).
    *
    * Concurrency contract: call BETWEEN advances from the same
    * single-threaded maintenance loop (the remap-fold precedent) — the
    * fold is a read-then-overwrite, so delta rows appended between its
    * snapshot and the directory swap would be dropped. The snapshot is
    * pinned once (localCheckpoint) so the committed/pending split and the
    * fold read one consistent listing. */
  /** Rewrite an APPEND-ONLY standing table (postings, doc store, band
    * index, shingle store, pairs) into `partitions` files — the
    * small-files maintenance job: every advance appends one file set per
    * micro-batch, so a long-running flow accretes O(batches) files and
    * scan planning degrades long before the data does. Rows are pure
    * facts in these tables, so the rewrite is content-preserving by
    * construction (read → repartition → atomic swap; nothing folds,
    * nothing dedups — [[compactDeltas]] is the different job for
    * batch_key ADDITIVE tables). Same single-maintenance-loop
    * concurrency contract as every compactor here: call BETWEEN advances
    * — the read-then-overwrite would drop rows appended concurrently.
    * The snapshot is pinned (localCheckpoint) before the directory swap
    * so the rewrite never reads its own output. */
  def compactAppends(spark: SparkSession, table: String,
      partitions: Int): Unit =
    tryRead(spark, table).foreach { t =>
      graft.operators.MergeWriter.overwriteAtomic(
        t.localCheckpoint(true).repartition(partitions), table)
    }

  private def compactDeltas(spark: SparkSession, table: String,
      keys: Seq[String], sums: Seq[String],
      guardTable: String, guardIdCol: String,
      mins: Seq[String] = Nil,
      tombstoneIds: Option[DataFrame] = None,
      dropZeroKeys: Boolean = false): Unit =
    tryRead(spark, table).foreach { t0 =>
      val t = t0.localCheckpoint(true)
      val guard = tryRead(spark, guardTable)
        .map(_.select(col(guardIdCol).as("__gid")))
        .getOrElse(emptyDf(spark, "__gid" -> org.apache.spark.sql.types.LongType))
      // distinct keys in the table are O(batches) — probe the guard with
      // them (one pruned id scan), never the other way around
      val tKeys = t.select(col("batch_key")).distinct().localCheckpoint(true)
      val posCommitted = tKeys
        .join(guard, tKeys("batch_key") === col("__gid"), "left_semi")
      // a NEGATIVE key is a forgetCountState decrement, committed only
      // once its witness doc (id −key−1) has null text in the doc store
      // (`tombstoneIds`, passed by the text-flow compactors) — folding an
      // UNCOMMITTED forget would destroy the (batch_key, key) dedup
      // evidence a crash-replay of the forget job still needs, exactly
      // the reason positive keys wait for the guard
      val negCommitted = tombstoneIds match {
        case Some(tids) => tKeys.join(
          tids.select((-col(tids.columns.head) - 1L).as("batch_key")),
          Seq("batch_key"), "left_semi")
        case None => tKeys.limit(0)
      }
      val committedKeys = posCommitted.unionByName(negCommitted)
        .localCheckpoint(true)
      val reserved = col("batch_key") === Long.MinValue
      val committed = t.filter(reserved).unionByName(
        t.join(broadcast(committedKeys), Seq("batch_key"), "left_semi"))
      val pending = t.filter(!reserved)
        .join(broadcast(committedKeys), Seq("batch_key"), "left_anti")
      // sums fold additively; mins (keeper-style columns) min-combine —
      // both are associative+commutative, which is all batch_key-tagged
      // delta folding requires
      val aggs = sums.map(c => sum(col(c)).as(c)) ++ mins.map(c => min(col(c)).as(c))
      val folded0 = committed.dropDuplicates("batch_key" +: keys)
        .groupBy(keys.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
        .select(lit(Long.MinValue).as("batch_key") +: (keys ++ sums ++ mins).map(col): _*)
      // a key whose committed decrements netted every sum to zero is a
      // from-scratch absence — drop it so the table stays O(live keys)
      // (only for pure-sum flows; keeper-carrying tables keep their rows)
      val folded =
        if (dropZeroKeys && mins.isEmpty)
          folded0.filter(sums.map(c => col(c) =!= 0L).reduce(_ || _))
        else folded0
      graft.operators.MergeWriter.overwriteAtomic(
        folded.unionByName(pending), table)
    }

  /** Compact the IVF centroid-sum deltas to one row per (cid, dim);
    * `postingsTable` is the flow's guard. */
  def compactIvfSums(spark: SparkSession, sumsTable: String,
      postingsTable: String): Unit =
    compactDeltas(spark, sumsTable, Seq("cid", "dim"), Seq("n_vectors", "sum_q"),
      postingsTable, "vec_id")

  /** [[compactDeltas]]'s NON-ADDITIVE sibling: fold a batch_key-tagged
    * delta table of full-row REPLACEMENTS to one row per key under the
    * reserved key, resolving latest-wins by max (`ord`, batch_key) —
    * the same resolution the table's snapshot applies, so compaction is
    * snapshot-invariant by construction. Shares the additive fold's
    * committed/pending split (only batches whose key reached the guard
    * fold; a crashed batch keeps its rows under its own key so its
    * replay stays a byte-identical no-op) and its single-maintenance-
    * loop concurrency contract (read-then-overwrite — rows appended
    * between snapshot and swap would be dropped). The reserved-key row
    * can never shadow a live one: `ord` strictly increases across a
    * key's real delta rows, and the fold's batch_key (Long.MinValue)
    * loses every tie. */
  private def compactLatestDeltas(spark: SparkSession, table: String,
      key: String, ord: String, payload: Seq[String],
      guardTable: String, guardIdCol: String): Unit =
    tryRead(spark, table).foreach { t0 =>
      val t = t0.localCheckpoint(true)
      val guard = tryRead(spark, guardTable)
        .map(_.select(col(guardIdCol).as("__gid")))
        .getOrElse(emptyDf(spark, "__gid" -> org.apache.spark.sql.types.LongType))
      val tKeys = t.select(col("batch_key")).distinct()
      val committedKeys = tKeys
        .join(guard, tKeys("batch_key") === col("__gid"), "left_semi")
        .localCheckpoint(true)
      val reserved = col("batch_key") === Long.MinValue
      val committed = t.filter(reserved).unionByName(
        t.join(broadcast(committedKeys), Seq("batch_key"), "left_semi"))
      val pending = t.filter(!reserved)
        .join(broadcast(committedKeys), Seq("batch_key"), "left_anti")
      val folded = committed
        .groupBy(col(key))
        .agg(max_by(struct(payload.map(col): _*),
          struct(col(ord), col("batch_key"))).as("__r"))
        .select(lit(Long.MinValue).as("batch_key") +: col(key) +:
          payload.map(p => col(s"__r.$p").as(p)): _*)
      graft.operators.MergeWriter.overwriteAtomic(
        folded.unionByName(pending), table)
    }

  /** Compact the SemDedup drop deltas to one (latest) row per vec_id;
    * `postingsTable` is the flow's guard ([[maintainIvfState]] appends
    * postings LAST, so a batch's key in the postings id column marks its
    * whole advance committed). */
  def compactSemDedupDrops(spark: SparkSession, dropTable: String,
      postingsTable: String): Unit =
    compactLatestDeltas(spark, dropTable, "vec_id", "n_witnesses",
      Seq("cid", "witness_id", "n_witnesses", "max_cos"),
      postingsTable, "vec_id")

  /** pp06's continuous twin: CONTINUOUS span-dedup maintenance. Standing
    * tables: `gramsTable` (doc_id, h — the span store, append-only),
    * `countsTable` (batch_key, h, nd — per-span doc-count DELTAS),
    * `reportTable` (batch_key, doc_id, n_spans, n_dup_spans — per-doc
    * report DELTAS: a batch row carries the doc's full totals, an
    * old-doc crossing row carries (0, +delta)), plus the doc store as
    * the redelivery guard (appended LAST — a crash anywhere earlier
    * redelivers the whole batch).
    *
    * Per batch the advance is [[graft.queries.TextOps.spanAdvance]] —
    * O(batch + affected docs), with both corpus-sized reads at their own
    * layout and pruned by broadcast batch-bounded sets (counts to the
    * batch's span hashes, the store to the crossing hashes). Additive
    * tables use the same `batch_key` idempotence trick as
    * [[maintainIvfState]], and BOTH reads are guarded against the
    * batch's own partial writes from a crashed attempt: the counts view
    * excludes rows under this batch's key (they would inflate standing
    * counts and mis-detect crossings), and the store is read minus the
    * fresh doc ids (the same guard [[maintainBandIndex]] applies to the
    * shingle store) — so a replay recomputes byte-identical delta rows
    * and the snapshot dedup removes them. */
  def maintainSpanState(batch: DataFrame, gramsTable: String,
      countsTable: String, reportTable: String, docTable: String): Unit = {
    import org.apache.spark.sql.types._
    val spark = batch.sparkSession
    val fresh = freshAgainst(batch, docTable)
    if (fresh.isEmpty) return
    val batchKey = fresh.agg(min(col("doc_id"))).head().getLong(0)
    val oldCounts = tryRead(spark, countsTable).getOrElse(emptyDf(spark,
        "batch_key" -> LongType, "h" -> LongType, "nd" -> LongType))
      .filter(col("batch_key") =!= batchKey)
      .dropDuplicates("batch_key", "h")
      .groupBy(col("h")).agg(sum(col("nd")).as("nd"))
    val oldGrams = tryRead(spark, gramsTable)
      .getOrElse(emptyDf(spark, "doc_id" -> LongType, "h" -> LongType))
      .join(broadcast(fresh.select(col("doc_id"))), Seq("doc_id"), "left_anti")
    val adv = graft.queries.TextOps.spanAdvance(oldGrams, oldCounts,
      graft.queries.TextOps.spanStore(fresh))
    spanCountsDelta(adv, batchKey).write.mode("append").parquet(countsTable)
    spanReportDelta(adv, batchKey).write.mode("append").parquet(reportTable)
    appendNewBy(adv.grams, gramsTable, "doc_id")
    fresh.write.mode("append").parquet(docTable)
  }

  /** The count / report delta rows of one span advance — the exact rows
    * [[maintainSpanState]] appends, shared with the crash-simulation
    * spec (same drift-pinning reason as [[ivfSumsDelta]]). */
  private[graft] def spanCountsDelta(adv: graft.queries.TextOps.SpanAdvance,
      batchKey: Long): DataFrame =
    adv.counts.select(lit(batchKey).as("batch_key"), col("h"), col("bnd").as("nd"))

  private[graft] def spanReportDelta(adv: graft.queries.TextOps.SpanAdvance,
      batchKey: Long): DataFrame =
    adv.oldDelta.select(lit(batchKey).as("batch_key"), col("doc_id"),
        lit(0L).as("n_spans"), col("delta").as("n_dup_spans"))
      .unionByName(adv.newRows.select(lit(batchKey).as("batch_key"),
        col("doc_id"), col("n_spans"), col("n_dup_spans")))

  /** [[maintainSpanState]] as a foreachBatch sink over a (doc_id, text)
    * document stream. */
  def spanStateStream(docs: DataFrame, gramsTable: String,
      countsTable: String, reportTable: String, docTable: String,
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(docs, checkpoint)((b: DataFrame, _: Long) =>
        maintainSpanState(b, gramsTable, countsTable, reportTable, docTable))

  /** The current span-dedup report under the maintained delta table —
    * dd09's exact shape over every doc that has arrived: per-doc sums of
    * the delta rows (a doc's arrival row carries its totals, later
    * crossing rows add dup counts), zero-dup docs filtered at read.
    * Duplicate delta rows from redelivered batches collapse on
    * (batch_key, doc_id) before the sum. */
  def spanSnapshot(spark: SparkSession, reportTable: String): DataFrame = {
    import org.apache.spark.sql.types._
    tryRead(spark, reportTable).getOrElse(emptyDf(spark,
        "batch_key" -> LongType, "doc_id" -> LongType,
        "n_spans" -> LongType, "n_dup_spans" -> LongType))
      .dropDuplicates("batch_key", "doc_id")
      .groupBy(col("doc_id"))
      .agg(sum(col("n_spans")).as("n_spans"),
        sum(col("n_dup_spans")).as("n_dup_spans"))
      .filter(col("n_dup_spans") > 0)
      .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
        (col("n_dup_spans").cast("double") / col("n_spans")).as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  /** Compact the span count deltas to one row per span hash; `docTable`
    * is the flow's guard, and its null-text tombstones are the commit
    * witness for [[forgetSpanState]] decrement keys (net-zero spans drop
    * at the fold). */
  def compactSpanCounts(spark: SparkSession, countsTable: String,
      docTable: String): Unit =
    compactDeltas(spark, countsTable, Seq("h"), Seq("nd"), docTable, "doc_id",
      tombstoneIds = tryRead(spark, docTable)
        .map(_.filter(col("text").isNull).select(col("doc_id"))),
      dropZeroKeys = true)

  /** Compact the span report deltas to one row per doc; `docTable` is
    * the flow's guard. */
  /** `docTable`'s null-text tombstones are the commit witness for
    * [[forgetSpanState]] repair keys; a row whose sums BOTH net to zero
    * is a fully-cancelled crossing delta and drops at the fold (a real
    * doc row always carries n_spans > 0). */
  def compactSpanReport(spark: SparkSession, reportTable: String,
      docTable: String): Unit =
    compactDeltas(spark, reportTable, Seq("doc_id"), Seq("n_spans", "n_dup_spans"),
      docTable, "doc_id",
      tombstoneIds = tryRead(spark, docTable)
        .map(_.filter(col("text").isNull).select(col("doc_id"))),
      dropZeroKeys = true)

  /** DELETION PROPAGATION for the span-dedup family — the first forget
    * with a CROSS-DOC repair: removing a document can flip a span it
    * shared from shared back to UNIQUE, which changes the REMAINING
    * holder's report (its n_dup_spans counted that span). The job is
    * O(deleted + affected), never a corpus re-scan:
    *
    *  - counts decrement exactly like [[forgetCountState]]: the
    *    forgotten docs' span hashes are RE-DERIVED FROM THEIR STORED
    *    TEXT (never from the grams table — the grams rows are deleted
    *    by this very job, and a crash between that deletion and the
    *    doc-store swap must leave a re-run able to recompute identical
    *    decrements; the text survives until the swap, which goes LAST),
    *    negated, and appended under the forget key;
    *  - the shared→unique crossings are the spans whose folded nd minus
    *    the gone count is EXACTLY 1 (nd ≥ 2 follows); each crossing
    *    span's one remaining holder gets a (0, −1) report delta per
    *    crossing span — the inverse of [[maintainSpanState]]'s
    *    unique→shared crossing rows, batch-bounded broadcasts on the
    *    same two standing layouts;
    *  - the forgotten docs' own grams and report rows delete exactly
    *    (id-granular); [[spanSnapshot]]'s n_dup_spans > 0 filter drops
    *    remaining docs whose last dup span just went unique — matching
    *    spanDedup's dup-docs-only shape over the survivors.
    *
    * Crash/replay: [[rollbackPendingForgets]] clears this key's (or an
    * overlapping crashed job's) partial appends, the crossing fold is
    * COMMITTED-ONLY (it excludes the forget key AND every pending
    * negative key whose witness is still live — a foreign crashed
    * forget's decrements must not fake a crossing, because crossing
    * repairs, unlike count decrements, are not additively
    * self-correcting under that job's re-run), every delete is
    * idempotent, and the tombstone swap (the compaction commit witness)
    * goes last — forgetCountState's contract plus the committed-only
    * fold. */
  def forgetSpanState(spark: SparkSession, ids: DataFrame,
      gramsTable: String, countsTable: String, reportTable: String,
      docTable: String): Unit = {
    import org.apache.spark.sql.types._
    val idsC = ids.select(col("doc_id")).distinct().localCheckpoint(true)
    val store = tryRead(spark, docTable).map(_.localCheckpoint(true))
    val gone = store
      .map(_.filter(col("text").isNotNull).join(idsC, Seq("doc_id"), "left_semi"))
      .map(_.localCheckpoint(true))
      .filter(!_.isEmpty)
    gone.foreach { g =>
      val forgetKey = -g.agg(min(col("doc_id"))).head().getLong(0) - 1L
      rollbackPendingForgets(spark, Seq(countsTable, reportTable), g)
      val goneIds = g.select(col("doc_id")).localCheckpoint(true)
      // gone span hashes from TEXT (see Scaladoc), per-doc-distinct
      val goneCnt = graft.queries.TextOps.spanStore(g)
        .groupBy(col("h")).agg(count(lit(1)).as("gone_nd"))
        .localCheckpoint(true)
      val counts0 = tryRead(spark, countsTable).getOrElse(emptyDf(spark,
        "batch_key" -> LongType, "h" -> LongType, "nd" -> LongType))
      // the crossing decision folds COMMITTED state only: a negative key
      // whose witness doc (−key−1) still has live text is a crashed
      // forget's PENDING decrement (possibly rolled back or re-derived
      // by its re-run) — summing it would let a foreign pending forget
      // fake a shared→unique crossing whose repair rows then COMMIT when
      // either job's swap tombstones a witness, permanently
      // over-decrementing a survivor (counts decrements are additively
      // self-correcting; crossing repairs are not). Same committed-only
      // discipline compactDeltas applies via tombstoneIds; the probe is
      // O(batches) keys against an id-pruned store read.
      val pendingNeg = counts0.select(col("batch_key"))
        .filter(col("batch_key") < 0 && col("batch_key") =!= Long.MinValue)
        .distinct()
        .withColumn("__wid", -col("batch_key") - 1L)
        .join(store.get.filter(col("text").isNotNull)
          .select(col("doc_id").as("__wid")), Seq("__wid"), "left_semi")
        .select(col("batch_key")).localCheckpoint(true)
      // folded standing counts for the touched spans only, BEFORE this
      // key's decrement lands (rollback above cleared any partial run)
      val folded = counts0
        .filter(col("batch_key") =!= forgetKey)
        .join(broadcast(pendingNeg), Seq("batch_key"), "left_anti")
        .join(broadcast(goneCnt.select(col("h"))), Seq("h"), "left_semi")
        .dropDuplicates("batch_key", "h")
        .groupBy(col("h")).agg(sum(col("nd")).as("nd"))
      val crossing = goneCnt.join(folded, Seq("h"))
        .filter(col("nd") - col("gone_nd") === 1L)
        .select(col("h")).localCheckpoint(true)
      goneCnt
        .select(lit(forgetKey).as("batch_key"), col("h"),
          (-col("gone_nd")).as("nd"))
        .write.mode("append").parquet(countsTable)
      tryRead(spark, gramsTable).foreach { grams =>
        grams.join(goneIds, Seq("doc_id"), "left_anti")
          .join(broadcast(crossing), Seq("h"), "left_semi")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("__k"))
          .select(lit(forgetKey).as("batch_key"), col("doc_id"),
            lit(0L).as("n_spans"), (-col("__k")).as("n_dup_spans"))
          .write.mode("append").parquet(reportTable)
      }
      deleteByIds(spark, gramsTable, idsC, Seq("doc_id"))
      deleteByIds(spark, reportTable, idsC, Seq("doc_id"))
    }
    tombstoneSwap(store, idsC, docTable, "text")
  }

  /** pp07's continuous twin: CONTINUOUS vocabulary maintenance — the
    * counts-shaped member of the standing-state family, and the simplest
    * advance in it: per-token (df, cf) are PURELY ADDITIVE across
    * doc-disjoint batches ([[graft.queries.TextOps.vocabCounts]] — df a
    * doc count, cf an occurrence sum, no count-distinct anywhere), so a
    * batch advances the state with ONE batch-sized counting pass appended
    * as a delta. No standing read at all — not even a pruned probe; the
    * only corpus-sized object anywhere is the delta table itself, which
    * [[compactVocab]] folds to O(vocab) rows as a maintenance job.
    *
    * At-least-once safety is the [[maintainIvfState]] contract verbatim:
    * the doc store is the guard (appended LAST), delta rows carry the
    * batch's deterministic `batch_key` (min doc_id — unique across
    * batches because the guard keeps fresh sets disjoint), a crash-replay
    * recomputes byte-identical rows under the same key, and
    * [[vocabSnapshot]] drops duplicates by (batch_key, tok) before
    * summing. */
  def maintainVocabState(batch: DataFrame, vocabTable: String,
      docTable: String): Unit = {
    val fresh = freshAgainst(batch, docTable)
    if (fresh.isEmpty) return
    val batchKey = fresh.agg(min(col("doc_id"))).head().getLong(0)
    vocabDelta(fresh, batchKey).write.mode("append").parquet(vocabTable)
    fresh.write.mode("append").parquet(docTable)
  }

  /** The per-token delta rows of one batch — the exact rows
    * [[maintainVocabState]] appends, shared with the crash-simulation
    * spec (same drift-pinning reason as [[ivfSumsDelta]]). */
  private[graft] def vocabDelta(fresh: DataFrame, batchKey: Long): DataFrame =
    graft.queries.TextOps.vocabCounts(fresh)
      .select(lit(batchKey).as("batch_key"), col("tok"), col("df"), col("cf"))

  /** The per-cell CMS delta rows of one batch — [[maintainCmsState]]'s
    * append, the sketch member of the additive counts family (ta20's
    * cell kernel verbatim). */
  private[graft] def cmsDelta(fresh: DataFrame, batchKey: Long): DataFrame =
    graft.queries.TextOps.cmsCellsFromTokens(
      fresh.select(explode(graft.functions.Text.tokens(col("text"))).as("tok")))
      .select(lit(batchKey).as("batch_key"), col("j"), col("b"), col("n"))

  /** pp29's continuous twin: CONTINUOUS count-min-sketch maintenance —
    * the SKETCH member of the additive counts family. TWO standing
    * delta tables advance from ONE batch tokenize: the (batch_key, j,
    * b, n) cells (the sketch — at most d·w live cells after compaction,
    * regardless of vocabulary) and the (batch_key, tok, df, cf)
    * vocabulary (the exact-cf probe side, [[maintainVocabState]]'s rows
    * verbatim — a deployment that probes with its OWN candidate keys
    * can skip it and maintain the cells alone). At-least-once contract
    * = the vocab family's: guard appended LAST, deterministic batch
    * key, byte-identical replay rows the snapshot's (batch_key, …)
    * dedups collapse. Forget = [[forgetCountState]] with `cmsTable`
    * (negative cell deltas recomputed from the stored text — O(deleted)
    * like every counts member); compaction = [[compactCms]] +
    * [[compactVocab]]. */
  def maintainCmsState(batch: DataFrame, cellsTable: String,
      vocabTable: String, docTable: String): Unit = {
    val fresh = freshAgainst(batch, docTable)
    if (fresh.isEmpty) return
    val batchKey = fresh.agg(min(col("doc_id"))).head().getLong(0)
    cmsDelta(fresh, batchKey).write.mode("append").parquet(cellsTable)
    vocabDelta(fresh, batchKey).write.mode("append").parquet(vocabTable)
    fresh.write.mode("append").parquet(docTable)
  }

  /** [[maintainCmsState]] as a foreachBatch sink over a (doc_id, text)
    * document stream. */
  def cmsStateStream(docs: DataFrame, cellsTable: String,
      vocabTable: String, docTable: String,
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(docs, checkpoint)((b: DataFrame, _: Long) =>
        maintainCmsState(b, cellsTable, vocabTable, docTable))

  /** The current ta20 view under the maintained deltas — top-`topN`
    * exact tokens probed against the summed cells, over every doc that
    * has arrived AND NOT been forgotten. Net-zero cells and tokens
    * (forget decrements) are filtered — a from-scratch build over the
    * survivors has no row for them. */
  def cmsSnapshot(spark: SparkSession, cellsTable: String,
      vocabTable: String, topN: Int = 20): DataFrame = {
    import org.apache.spark.sql.types._
    val cells = tryRead(spark, cellsTable).getOrElse(emptyDf(spark,
        "batch_key" -> LongType, "j" -> IntegerType, "b" -> LongType,
        "n" -> LongType))
      .dropDuplicates("batch_key", "j", "b")
      .groupBy(col("j"), col("b")).agg(sum(col("n")).as("n"))
      .filter(col("n") > 0)
    val top = tryRead(spark, vocabTable).getOrElse(emptyDf(spark,
        "batch_key" -> LongType, "tok" -> StringType,
        "df" -> LongType, "cf" -> LongType))
      .dropDuplicates("batch_key", "tok")
      .groupBy(col("tok")).agg(sum(col("cf")).as("cf"))
      .filter(col("cf") > 0)
      .orderBy(col("cf").desc, col("tok")).limit(topN)
      .select(col("tok"), col("cf"))
    graft.queries.TextOps.cmsProbe(cells, top)
  }

  /** Compact the CMS cell deltas to one row per (j, b) — at most d·w
    * rows; `docTable` is the flow's guard, its null-text tombstones the
    * commit witness for forget decrement keys (net-zero cells drop at
    * the fold). */
  def compactCms(spark: SparkSession, cellsTable: String,
      docTable: String): Unit =
    compactDeltas(spark, cellsTable, Seq("j", "b"), Seq("n"),
      docTable, "doc_id",
      tombstoneIds = tryRead(spark, docTable)
        .map(_.filter(col("text").isNull).select(col("doc_id"))),
      dropZeroKeys = true)

  /** pp31's continuous twin: CONTINUOUS HyperLogLog maintenance — the
    * distinct-count member of the sketch family, and the one standing
    * state in the file whose merge is IDEMPOTENT (register-wise max).
    * That idempotence simplifies the whole contract: the appended rows
    * need NO batch key and the snapshot needs NO replay dedup — a
    * redelivered batch re-appends byte-identical register rows that the
    * max fold absorbs; out-of-order and overlapping deliveries are
    * equally absorbed. The standing table is ≤ 64 rows per source per
    * append (compaction folds it to ≤ 64 per source total), the
    * smallest standing state of any family here. The guard still
    * appends LAST (at-least-once: a crash between appends re-runs the
    * batch, and the max absorbs the duplicate), and the doc store still
    * keeps (doc_id, source, text) — the text is what [[forgetHllState]]
    * rebuilds from, because max does NOT invert: HLL has no O(deleted)
    * decrement path, so deletion propagation for this family is an
    * O(survivors) register rebuild + atomic swap (the honest trade the
    * pp31 Scaladoc states; every additive family keeps its cheaper
    * negative-delta path). */
  def maintainHllState(batch: DataFrame, regTable: String,
      docTable: String): Unit = {
    val fresh = freshAgainst(batch, docTable, Seq("source", "text"))
    if (fresh.isEmpty) return
    hllDelta(fresh).write.mode("append").parquet(regTable)
    fresh.write.mode("append").parquet(docTable)
  }

  /** The register rows of one batch — [[maintainHllState]]'s append,
    * shared with the crash-simulation spec. */
  private[graft] def hllDelta(fresh: DataFrame): DataFrame =
    graft.operators.HllSketch.registers(
      fresh.select(col("source"),
        explode(graft.functions.Text.tokens(col("text"))).as("tok")),
      "source", graft.queries.QueryUtils.hex8(col("tok")))

  /** [[maintainHllState]] as a foreachBatch sink over a (doc_id, source,
    * text) document stream. */
  def hllStateStream(docs: DataFrame, regTable: String,
      docTable: String,
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(docs, checkpoint)((b: DataFrame, _: Long) =>
        maintainHllState(b, regTable, docTable))

  /** The current ta23 view under the maintained registers: fold the
    * appended register rows by max and estimate. No dedup column —
    * idempotence IS the dedup (see [[maintainHllState]]). */
  def hllSnapshot(spark: SparkSession, regTable: String): DataFrame = {
    import org.apache.spark.sql.types._
    graft.operators.HllSketch.estimated(
      tryRead(spark, regTable).getOrElse(emptyDf(spark,
          "source" -> StringType, "j" -> LongType, "m" -> IntegerType))
        .groupBy(col("source"), col("j"))
        .agg(max(col("m")).as("m")),
      "source")
  }

  /** Compact the appended register rows to ≤ 64 per source — the max
    * fold materialized, atomically swapped. */
  def compactHll(spark: SparkSession, regTable: String): Unit =
    tryRead(spark, regTable).foreach { t =>
      graft.operators.MergeWriter.overwriteAtomic(
        t.localCheckpoint(true)
          .groupBy(col("source"), col("j")).agg(max(col("m")).as("m"))
          .select(col("source"), col("j"), col("m")),
        regTable)
    }

  /** DELETION PROPAGATION for HLL state: max does not invert, so the
    * registers are REBUILT from the surviving doc texts (one pass over
    * survivors — the O(corpus-rewrite) forget class the vector families
    * share, stated rather than hidden) and atomically swapped; the
    * doc-store text tombstone goes LAST as the commit witness (it
    * destroys the text a retry would rebuild from ONLY after the
    * rebuilt registers are live; a crash between the two re-runs to
    * convergence because the rebuild reads survivors only). Ids append
    * to the store for never-seen forgotten ids (forward block), which
    * [[tombstoneSwap]] handles. */
  def forgetHllState(spark: SparkSession, ids: DataFrame,
      regTable: String, docTable: String): Unit = {
    val idsC = ids.select(col("doc_id")).distinct().localCheckpoint(true)
    val store = tryRead(spark, docTable)
    val survivors = store.map(_.filter(col("text").isNotNull)
        .join(idsC, Seq("doc_id"), "left_anti")
        .select(col("source"), col("text")))
      .getOrElse(emptyDf(spark,
        "source" -> org.apache.spark.sql.types.StringType,
        "text" -> org.apache.spark.sql.types.StringType))
      .localCheckpoint(true)
    graft.operators.MergeWriter.overwriteAtomic(
      hllDelta(survivors), regTable)
    tombstoneSwap(store, idsC, docTable, "text")
  }

  /** pp32's continuous twin: CONTINUOUS quantile-sketch maintenance —
    * the percentile member of the sketch family
    * ([[graft.operators.QuantileSketch]]). The standing state is the
    * exploded bottom-k sample itself ((source, h, v) pair rows — ≤ k
    * per source per append, ≤ k per source total after
    * [[compactQuantile]]), advanced by one batch-sized hash+sketch
    * pass. Like HLL, the merge is effectively IDEMPOTENT: the snapshot
    * re-sketches the appended pair rows and the bottom-k fold dedups by
    * (h, v), so a redelivered batch re-appends byte-identical pair rows
    * the fold absorbs — no batch key, no replay dedup. The guard
    * appends LAST (at-least-once), and the doc store keeps
    * (doc_id, source, v) because the honest trade is HLL's: a SATURATED
    * sample cannot recover the pairs it discarded, so deletion
    * propagation is an O(survivors) rebuild + atomic swap
    * ([[forgetQuantileState]]), never a decrement. `batch` is
    * (doc_id, source, v) rows — v the measured BIGINT (the catalog
    * family measures n_chars). DOUBLE measurements ride this maintainer
    * UNCHANGED: pass v = [[graft.functions.DoubleSortable
    * .toSortableLong]] of the double at ingest (the standing layout
    * never looks at a value, only its order) and snapshot through
    * [[quantileDoubleSnapshot]] instead of [[quantileSnapshot]] — which
    * snapshot applies is the table's path contract (the sketch-level
    * domain tag cannot ride exploded rows), pinned by
    * QuantileStateSpec's double leg. */
  def maintainQuantileState(batch: DataFrame, qsTable: String,
      docTable: String): Unit = {
    val fresh = freshAgainst(batch, docTable, Seq("source", "v"))
    if (fresh.isEmpty) return
    quantileDelta(fresh).write.mode("append").parquet(qsTable)
    fresh.write.mode("append").parquet(docTable)
  }

  /** The batch's per-source bottom-k sample rows —
    * [[maintainQuantileState]]'s append, shared with the
    * crash-simulation spec and [[forgetQuantileState]]'s rebuild. */
  private[graft] def quantileDelta(fresh: DataFrame): DataFrame =
    graft.queries.TextOps.qsSampleRows(
      graft.queries.TextOps.qsPairs(fresh))

  /** [[maintainQuantileState]] as a foreachBatch sink over a
    * (doc_id, source, v) stream. */
  def quantileStateStream(docs: DataFrame, qsTable: String,
      docTable: String,
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(docs, checkpoint)((b: DataFrame, _: Long) =>
        maintainQuantileState(b, qsTable, docTable))

  /** The current ta24 view under the maintained pair rows: one bottom-k
    * fold over ≤ appends·k rows per source (never the corpus), then the
    * nearest-lower-rank estimates. */
  def quantileSnapshot(spark: SparkSession, qsTable: String): DataFrame = {
    import org.apache.spark.sql.types._
    val k = graft.queries.TextOps.TA24_K
    graft.operators.QuantileSketch.quantiles(
      graft.operators.QuantileSketch.sketch(
        tryRead(spark, qsTable).getOrElse(emptyDf(spark,
          "source" -> StringType, "h" -> LongType, "v" -> LongType)),
        "source", col("h"), col("v"), k),
      k, graft.queries.TextOps.TA24_PS)
  }

  /** The ta25-class view of a DOUBLE-domain maintained sample (a table
    * whose ingest stored [[graft.functions.DoubleSortable]] transformed
    * longs): the same ≤ appends·k-row bottom-k fold as
    * [[quantileSnapshot]] — order-preserving transform, so the fold IS
    * the double fold — then the `-k` re-tag and the inverse transform
    * on the way out ([[graft.operators.QuantileSketch.resketchDouble]]
    * + quantilesDouble). Applying this to a BIGINT-domain table (or
    * [[quantileSnapshot]] to a double one) returns reinterpreted bits —
    * the domain is the table's path contract; see
    * [[maintainQuantileState]]. */
  def quantileDoubleSnapshot(spark: SparkSession, qsTable: String)
      : DataFrame = {
    import org.apache.spark.sql.types._
    val k = graft.queries.TextOps.TA24_K
    graft.operators.QuantileSketch.quantilesDouble(
      graft.operators.QuantileSketch.resketchDouble(
        tryRead(spark, qsTable).getOrElse(emptyDf(spark,
          "source" -> StringType, "h" -> LongType, "v" -> LongType)),
        "source", col("h"), col("v"), k),
      k, graft.queries.TextOps.TA24_PS)
  }

  /** Compact the appended sample rows to ≤ k per source — the bottom-k
    * fold materialized, atomically swapped; snapshot-invariant by the
    * mergeability identity. */
  def compactQuantile(spark: SparkSession, qsTable: String): Unit =
    tryRead(spark, qsTable).foreach { t =>
      graft.operators.MergeWriter.overwriteAtomic(
        graft.queries.TextOps.qsSampleRows(t.localCheckpoint(true)),
        qsTable)
    }

  /** DELETION PROPAGATION for quantile state: a saturated bottom-k
    * sample does not invert (the (k+1)-th pair was discarded, so
    * deleting a sampled row leaves a sample SMALLER than the survivors
    * support), so the sample is REBUILT from the surviving stored
    * (doc_id, source, v) rows and atomically swapped; the doc-store
    * value tombstone goes LAST as the commit witness. Never-seen
    * forgotten ids forward-block via [[tombstoneSwap]]. */
  def forgetQuantileState(spark: SparkSession, ids: DataFrame,
      qsTable: String, docTable: String): Unit = {
    import org.apache.spark.sql.types._
    val idsC = ids.select(col("doc_id")).distinct().localCheckpoint(true)
    val store = tryRead(spark, docTable)
    val survivors = store.map(_.filter(col("v").isNotNull)
        .join(idsC, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("source"), col("v")))
      .getOrElse(emptyDf(spark, "doc_id" -> LongType,
        "source" -> StringType, "v" -> LongType))
      .localCheckpoint(true)
    graft.operators.MergeWriter.overwriteAtomic(
      quantileDelta(survivors), qsTable)
    tombstoneSwap(store, idsC, docTable, "v")
  }

  /** [[maintainVocabState]] as a foreachBatch sink over a (doc_id, text)
    * document stream. */
  def vocabStateStream(docs: DataFrame, vocabTable: String,
      docTable: String,
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(docs, checkpoint)((b: DataFrame, _: Long) =>
        maintainVocabState(b, vocabTable, docTable))

  /** The current top-100 vocabulary under the maintained delta table —
    * ta07's exact shape over every doc that has arrived AND NOT been
    * forgotten. Duplicate delta rows from redelivered batches collapse
    * on (batch_key, tok) before the sum; tokens whose net count
    * [[forgetCountState]]'s decrements drove to zero are filtered (a
    * from-scratch build over the survivors has no row for them). */
  def vocabSnapshot(spark: SparkSession, vocabTable: String,
      topN: Int = 100): DataFrame = {
    import org.apache.spark.sql.types._
    graft.queries.TextOps.vocabTop(
      tryRead(spark, vocabTable).getOrElse(emptyDf(spark,
          "batch_key" -> LongType, "tok" -> StringType,
          "df" -> LongType, "cf" -> LongType))
        .dropDuplicates("batch_key", "tok")
        .groupBy(col("tok"))
        .agg(sum(col("df")).as("df"), sum(col("cf")).as("cf"))
        .filter(col("cf") > 0),
      topN)
  }

  /** Compact the vocabulary deltas to one row per token; `docTable` is
    * the flow's guard, and its null-text tombstones are the commit
    * witness for [[forgetCountState]] decrement keys (net-zero tokens
    * drop at the fold). */
  def compactVocab(spark: SparkSession, vocabTable: String,
      docTable: String): Unit =
    compactDeltas(spark, vocabTable, Seq("tok"), Seq("df", "cf"),
      docTable, "doc_id",
      tombstoneIds = tryRead(spark, docTable)
        .map(_.filter(col("text").isNull).select(col("doc_id"))),
      dropZeroKeys = true)

  /** The TOKENIZER-lifecycle rebuild, text-side twin of
    * [[rebuildIvfState]]: retrain the BPE segmentation from the
    * MAINTAINED vocabulary and atomically swap the per-word
    * segmentation table. The trainer is ta14's
    * ([[graft.queries.TextOps.bpeSegmentation]] — k driver-bounded
    * iterations over the VOCAB, corpus scale enters only through the
    * standing counts the O(batch) vocab maintainer already keeps
    * current), so this job never rescans a document; the swapped table
    * is the cached word→pieces dimension ta14's encode join consumes.
    * Crash-safe the same way as the IVF rebuild: the pass is a pure
    * function of the vocab fold, so a re-run after a crash mid-swap
    * recomputes the identical table (idempotence spec-pinned). */
  def rebuildBpeState(spark: SparkSession, vocabTable: String,
      segTable: String, merges: Int = 5): Unit = {
    import org.apache.spark.sql.types._
    val vocab = tryRead(spark, vocabTable).getOrElse(emptyDf(spark,
        "batch_key" -> LongType, "tok" -> StringType,
        "df" -> LongType, "cf" -> LongType))
      .dropDuplicates("batch_key", "tok")
      .groupBy(col("tok")).agg(sum(col("cf")).as("wf"))
    val seg = graft.queries.TextOps.bpeSegmentation(vocab, merges)
      .groupBy(col("tok")).agg(count(lit(1)).as("n_pieces"))
    graft.operators.MergeWriter.overwriteAtomic(seg, segTable)
  }

  /** The CLASSIFIER-lifecycle rebuild — the train-then-deploy twin of
    * [[rebuildBpeState]]/[[rebuildIvfState]] for the quality-filter
    * family: refit ta19's fixed-point batch perceptron
    * ([[graft.queries.TextOps.perceptronIterates]] — k driver-bounded
    * combinable rollups over the feature table, corpus scale enters only
    * through the features a pipeline already computes) and atomically
    * swap the deployable weight table: (feature, weight) rows — the
    * literal-table shape ta15's inference consumes, closing the
    * train → deploy loop. `featsTable` rows carry the five
    * [[graft.queries.TextOps.qualityFeatures]] columns plus
    * y ∈ {+1, −1} (e.g. ta16 rule verdicts as weak supervision).
    * Crash-safe like every rebuild here: the pass is a pure function of
    * the feature table, so a re-run after a crash mid-swap recomputes
    * the identical weights (idempotence spec-pinned). */
  def rebuildClassifierState(spark: SparkSession, featsTable: String,
      weightsTable: String,
      // defaulting to the SHARED constant, not a literal: a tuned
      // TA19_ITERS must retune every deployment refit with it, or the
      // deployed weights silently stop being the oracle-replayed final
      // iterate
      iters: Int = graft.queries.TextOps.TA19_ITERS): Unit =
    tryRead(spark, featsTable).foreach { d =>
      import spark.implicits._
      val last = graft.queries.TextOps.perceptronIterates(d, iters).last
      graft.operators.MergeWriter.overwriteAtomic(
        graft.queries.TextOps.TA19_FEATURES.zip(last._2)
          .toDF("feature", "weight"), weightsTable)
    }

  /** pp16's continuous twin: CONTINUOUS domain-mix maintenance — the
    * sampling-side member of the additive-counts family (vocab, LM,
    * sums). Standing tables: `countsTable` (batch_key, source, n — per-
    * source count DELTAS, purely additive across doc-disjoint batches)
    * and `docTable` (the id guard). The advance is ONE batch-sized count
    * pass appended under the batch's key — no standing read at all, the
    * vocab flow's shape — and the rates a sampler consumes are derived
    * at snapshot time from the folded counts through the SAME
    * [[graft.queries.SampleOps.mixRates]] kernel the batch gate uses.
    * The batch carries (doc_id, source); in-batch duplicates collapse
    * deterministically (max source per id), and the usual batch_key
    * contract covers crash replay: the delta lands, the guard append
    * crashes, the replay recomputes byte-identical rows under the same
    * key, and the snapshot's (batch_key, source) dedup collapses them. */
  def maintainMixState(batch: DataFrame, countsTable: String,
      docTable: String): Unit = {
    val arrived = batch.select(col("doc_id"), col("source"))
      .groupBy(col("doc_id")).agg(max(col("source")).as("source"))
    val fresh = tryRead(batch.sparkSession, docTable)
      .map(e => arrived.join(
        pruneToBatchRange(e.select("doc_id"), batch, "doc_id"),
        Seq("doc_id"), "left_anti"))
      .getOrElse(arrived)
      .localCheckpoint(true)
    if (fresh.isEmpty) return
    val batchKey = fresh.agg(min(col("doc_id"))).head().getLong(0)
    mixDelta(fresh, batchKey).write.mode("append").parquet(countsTable)
    fresh.write.mode("append").parquet(docTable)
  }

  /** The per-source delta rows of one batch — the exact rows
    * [[maintainMixState]] appends, shared with the crash-simulation spec
    * (same drift-pinning reason as [[vocabDelta]]). */
  private[graft] def mixDelta(fresh: DataFrame, batchKey: Long): DataFrame =
    fresh.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .select(lit(batchKey).as("batch_key"), col("source"), col("n"))

  /** [[maintainMixState]] as a foreachBatch sink over a (doc_id, source)
    * stream. */
  def mixStateStream(docs: DataFrame, countsTable: String,
      docTable: String,
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(docs, checkpoint)((b: DataFrame, _: Long) =>
        maintainMixState(b, countsTable, docTable))

  /** The current folded per-source counts under the maintained delta
    * table. Duplicate delta rows from redelivered batches collapse on
    * (batch_key, source) before the sum; sources whose net count
    * [[forgetMixState]]'s decrements drove to zero are filtered (a
    * from-scratch build over the survivors has no row for them). */
  def mixCountsSnapshot(spark: SparkSession, countsTable: String): DataFrame = {
    import org.apache.spark.sql.types._
    tryRead(spark, countsTable).getOrElse(emptyDf(spark,
        "batch_key" -> LongType, "source" -> StringType, "n" -> LongType))
      .dropDuplicates("batch_key", "source")
      .groupBy(col("source")).agg(sum(col("n")).as("n"))
      .filter(col("n") > 0)
  }

  /** The current sampling rates under the maintained counts — the exact
    * rate kernel the sa05/pp16 gates use, over the snapshot counts. */
  def mixRatesSnapshot(spark: SparkSession, countsTable: String): DataFrame =
    graft.queries.SampleOps.mixRates(mixCountsSnapshot(spark, countsTable))

  /** Compact the mix deltas to one row per source; `docTable` is the
    * flow's guard, and its null-source tombstones are the commit witness
    * for [[forgetMixState]] decrement keys (net-zero sources drop at the
    * fold). */
  def compactMix(spark: SparkSession, countsTable: String,
      docTable: String): Unit =
    compactDeltas(spark, countsTable, Seq("source"), Seq("n"),
      docTable, "doc_id",
      tombstoneIds = tryRead(spark, docTable)
        .map(_.filter(col("source").isNull).select(col("doc_id"))),
      dropZeroKeys = true)

  /** pp17's continuous twin: CONTINUOUS exact-dedup maintenance — the
    * (canon_hash, raw_hash)-granular stats table advanced additively per
    * batch (counts sum, keepers min-combine; the canon-level report's
    * distinct-count is derived at snapshot time, never maintained —
    * pp17's Scaladoc explains why the state is one level finer than the
    * report). Standing tables: `statsTable` (batch_key, canon_hash,
    * raw_hash, n, keeper_id — pure deltas, the vocab flow's
    * no-standing-read shape) and `docTable` (the id guard). The usual
    * batch_key contract covers crash replay: the delta lands, the guard
    * append crashes, the replay recomputes byte-identical rows under the
    * same key, and the snapshot's (batch_key, canon, raw) dedup
    * collapses them. `unicode` selects the production NFKC canonicalizer
    * ([[graft.functions.Text.canonical]]) — a per-deployment constant:
    * the two modes produce different canon_hash spaces, so a flow must
    * pick one at table creation and keep it (mixing modes in one stats
    * table would split groups, not corrupt state). */
  def maintainDedupState(batch: DataFrame, statsTable: String,
      docTable: String, unicode: Boolean = false): Unit = {
    val fresh = freshAgainst(batch, docTable)
    if (fresh.isEmpty) return
    val batchKey = fresh.agg(min(col("doc_id"))).head().getLong(0)
    dedupDelta(fresh, batchKey, unicode).write.mode("append").parquet(statsTable)
    fresh.write.mode("append").parquet(docTable)
  }

  /** The per-(canon, raw) delta rows of one batch — the exact rows
    * [[maintainDedupState]] appends, shared with the crash-simulation
    * spec (same drift-pinning reason as [[vocabDelta]]). */
  private[graft] def dedupDelta(fresh: DataFrame, batchKey: Long,
      unicode: Boolean = false): DataFrame =
    graft.queries.TextOps.canonRawStats(fresh, unicode)
      .select(lit(batchKey).as("batch_key"), col("canon_hash"),
        col("raw_hash"), col("n"), col("keeper_id"))

  /** [[maintainDedupState]] as a foreachBatch sink over a (doc_id, text)
    * document stream. */
  def dedupStateStream(docs: DataFrame, statsTable: String,
      docTable: String,
      // no default: Scala forbids defaults on two overloads (the 8-arg
      // pair-flow sink carries it)
      checkpoint: Option[String]): org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(docs, checkpoint)((b: DataFrame, _: Long) =>
        maintainDedupState(b, statsTable, docTable))

  def dedupStateStream(docs: DataFrame, statsTable: String,
      docTable: String): org.apache.spark.sql.streaming.StreamingQuery =
    dedupStateStream(docs, statsTable, docTable, None: Option[String])

  /** The current canon-level dedup report under the maintained stats —
    * dd15's exact shape over every doc that has arrived. Duplicate delta
    * rows from redelivered batches collapse on (batch_key, canon, raw)
    * before the (sum, min) fold. */
  def dedupSnapshot(spark: SparkSession, statsTable: String): DataFrame = {
    import org.apache.spark.sql.types._
    graft.queries.TextOps.canonGroups(
      tryRead(spark, statsTable).getOrElse(emptyDf(spark,
          "batch_key" -> LongType, "canon_hash" -> StringType,
          "raw_hash" -> StringType, "n" -> LongType, "keeper_id" -> LongType))
        .dropDuplicates("batch_key", "canon_hash", "raw_hash")
        .groupBy(col("canon_hash"), col("raw_hash"))
        .agg(sum(col("n")).as("n"), min(col("keeper_id")).as("keeper_id"))
        // (canon, raw) cells [[forgetExactDedupState]]'s decrements drove
        // to zero must not count as raw variants — a from-scratch build
        // over the survivors has no row for them
        .filter(col("n") > 0))
  }

  /** Compact the dedup deltas to one row per (canon, raw); `docTable` is
    * the flow's guard, and its null-text tombstones are the commit
    * witness for [[forgetExactDedupState]] decrement keys. (Keeper-
    * carrying tables keep netted-zero rows at the fold — the snapshot's
    * n > 0 filter hides them.) */
  def compactDedup(spark: SparkSession, statsTable: String,
      docTable: String): Unit =
    compactDeltas(spark, statsTable, Seq("canon_hash", "raw_hash"), Seq("n"),
      docTable, "doc_id", mins = Seq("keeper_id"),
      tombstoneIds = tryRead(spark, docTable)
        .map(_.filter(col("text").isNull).select(col("doc_id"))))

  /** DELETION PROPAGATION for the exact-dedup stats family —
    * [[forgetChunkState]]'s pattern on (canon, raw) cells: per-cell n
    * decrements recomputed from the forgotten docs' stored text
    * (negative deltas, min-neutral keeper), and cells whose current
    * keeper is forgotten get their keeper recomputed over the surviving
    * members — every member of a (canon, raw) cell is a byte-identical
    * document, so the new keeper is the min surviving id with that raw
    * hash, named by ONE O(corpus) hash pass over the surviving store
    * (run-rarely class) pruned to the affected cells, then patched in
    * place. `unicode` must match the flow's per-deployment constant
    * (the two canonicalizers hash different cell spaces). Crash/order
    * contract identical to [[forgetChunkState]]: rollback, affected on
    * the pre-decrement fold, patch from the pre-append checkpoint,
    * decrement append, tombstone swap LAST as the compaction commit
    * witness. */
  def forgetExactDedupState(spark: SparkSession, ids: DataFrame,
      statsTable: String, docTable: String,
      unicode: Boolean = false): Unit = {
    val idsC = ids.select(col("doc_id")).distinct().localCheckpoint(true)
    val store = tryRead(spark, docTable).map(_.localCheckpoint(true))
    val gone = store
      .map(_.filter(col("text").isNotNull).join(idsC, Seq("doc_id"), "left_semi"))
      .map(_.localCheckpoint(true))
      .filter(!_.isEmpty)
    gone.foreach { g =>
      val forgetKey = -g.agg(min(col("doc_id"))).head().getLong(0) - 1L
      rollbackPendingForgets(spark, Seq(statsTable), g)
      val goneIds = g.select(col("doc_id")).localCheckpoint(true)
      val dec = dedupDelta(g, forgetKey, unicode).localCheckpoint(true)
      val stats = tryRead(spark, statsTable).map(_.localCheckpoint(true))
      val affected = stats.map { t =>
        t.filter(col("batch_key") =!= forgetKey)
          .join(broadcast(dec.select(col("canon_hash"), col("raw_hash"))),
            Seq("canon_hash", "raw_hash"), "left_semi")
          .dropDuplicates("batch_key", "canon_hash", "raw_hash")
          .groupBy(col("canon_hash"), col("raw_hash"))
          .agg(min(col("keeper_id")).as("k"))
          .join(goneIds.withColumnRenamed("doc_id", "k"), Seq("k"), "left_semi")
          .select(col("canon_hash"), col("raw_hash")).localCheckpoint(true)
      }.getOrElse(emptyDf(spark,
        "canon_hash" -> org.apache.spark.sql.types.StringType,
        "raw_hash" -> org.apache.spark.sql.types.StringType))
      if (!affected.isEmpty) {
        val survivors = store.get.filter(col("text").isNotNull)
          .join(idsC, Seq("doc_id"), "left_anti")
        val newKeep = graft.queries.TextOps.canonRawStats(survivors, unicode)
          .join(broadcast(affected), Seq("canon_hash", "raw_hash"), "left_semi")
          .select(col("canon_hash"), col("raw_hash"),
            col("keeper_id").as("__nk"))
        stats.foreach { t =>
          val patched = t
            .join(broadcast(affected.withColumn("__aff", lit(true))),
              Seq("canon_hash", "raw_hash"), "left")
            .join(broadcast(newKeep), Seq("canon_hash", "raw_hash"), "left")
            .withColumn("keeper_id",
              when(col("__aff").isNotNull,
                coalesce(col("__nk"), lit(Long.MaxValue)))
                .otherwise(col("keeper_id")))
            .select(t.columns.map(col).toIndexedSeq: _*)
          graft.operators.MergeWriter.overwriteAtomic(patched, statsTable)
        }
      }
      dec.select(col("batch_key"), col("canon_hash"), col("raw_hash"),
          (-col("n")).as("n"), lit(Long.MaxValue).as("keeper_id"))
        .write.mode("append").parquet(statsTable)
    }
    tombstoneSwap(store, idsC, docTable, "text")
  }

  /** mm04's continuous twin: CONTINUOUS perceptual-dedup maintenance,
    * and the mm family's first standing-state member. Standing tables,
    * all append-only: `sigTable` (doc_id, b0..b3 — the 16-byte signature
    * store; a signature is a pure immutable function of the payload, so
    * a doc's row never changes), `pairsTable` (the scored pair log: a
    * pair's matched_bands/hamming/verdict is immutable once both docs
    * exist and is emitted by exactly the batch that completes it — the
    * containment pair-log argument verbatim), `docTable` (the shared
    * redelivery guard, advanced LAST so a crash anywhere makes the batch
    * redeliverable). Per batch: the payload is signed ONCE at the scan
    * (it never reaches the standing state or any exchange), the batch's
    * band rows broadcast-probe the band index derived from the standing
    * store at its own layout, and every write appends O(batch +
    * candidates) rows. The standing sig read excludes the batch's own
    * ids (the [[advanceBandIndex]] exclusion): after a crash between the
    * sig append and the doc advance, a redelivered batch would otherwise
    * meet its own landed signatures and emit pair rows that differ from
    * the originals (d1 = d2 filtered, but duplicates under reversed
    * roles); excluded, the replay recomputes byte-identical pairs and
    * distinct() — the documented pair-log recovery — collapses them. */
  def maintainPerceptualState(batch: DataFrame, sigTable: String,
      pairsTable: String, docTable: String,
      tau: Int = graft.operators.Multimodal.completeTau,
      maxBucket: Option[Int] = None): Unit = {
    val spark = batch.sparkSession
    val fresh = freshAgainst(batch, docTable)
    if (fresh.isEmpty) return
    val freshSigs = graft.operators.Multimodal.perceptualSigs(
        fresh.withColumn("blob", encode(col("text"), "UTF-8")),
        "doc_id", "blob")
      .localCheckpoint(true) // feeds the probe, the verify, and the append
    val standing = tryRead(spark, sigTable).getOrElse(emptySigStore(spark))
      .join(broadcast(fresh.select(col("doc_id"))), Seq("doc_id"), "left_anti")
    graft.operators.Multimodal
      .perceptualPairsAdvance(standing, freshSigs, "doc_id", tau, maxBucket)
      .write.mode("append").parquet(pairsTable)
    appendNewBy(freshSigs, sigTable, "doc_id")
    fresh.write.mode("append").parquet(docTable)
  }

  /** [[maintainPerceptualState]] as a foreachBatch sink over a
    * (doc_id, text) document stream. */
  def perceptualStateStream(docs: DataFrame, sigTable: String,
      pairsTable: String,
      docTable: String,
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(docs, checkpoint)((b: DataFrame, _: Long) =>
        maintainPerceptualState(b, sigTable, pairsTable, docTable))

  /** The current perceptual pair report under the maintained state —
    * mm04's exact shape over every doc arrived. distinct() is the pair
    * log's documented redelivery recovery. */
  def perceptualPairsSnapshot(spark: SparkSession,
      pairsTable: String): DataFrame =
    tryRead(spark, pairsTable).getOrElse(emptyPerceptualPairs(spark))
      .distinct()

  /** DELETION PROPAGATION for the perceptual family — exact like the
    * score/tf forgets, because every standing row is id-granular: the
    * forgotten docs' signature rows and every pair row either side of
    * which they are delete, leaving precisely the state a from-scratch
    * ingest of the survivors builds (a pair of two survivors was scored
    * from their signatures alone — the forgotten doc contributed
    * nothing to it). The doc store is rewritten with the ids' text
    * NULLED last (redelivery and re-ingest blocked, never-seen ids
    * forward-block); every step is an idempotent pure function of
    * (current table, ids), so a crash anywhere re-runs to
    * convergence. */
  def forgetPerceptualState(spark: SparkSession, ids: DataFrame,
      sigTable: String, pairsTable: String, docTable: String): Unit = {
    val idsC = ids.select(col("doc_id")).distinct().localCheckpoint(true)
    deleteByIds(spark, sigTable, idsC, Seq("doc_id"))
    deleteByIds(spark, pairsTable, idsC, Seq("d1", "d2"))
    val store = tryRead(spark, docTable).map(_.localCheckpoint(true))
    tombstoneSwap(store, idsC, docTable, "text")
  }

  /** DELETION PROPAGATION for the containment-index family — the same
    * exact id-granular class as [[forgetPerceptualState]]: shingle-store
    * rows, probe rows, and pair rows involving the forgotten ids delete;
    * surviving pairs were computed from surviving stores only. Text
    * nulled last, same crash contract. */
  def forgetContainmentState(spark: SparkSession, ids: DataFrame,
      storeTable: String, probeTable: String, pairsTable: String,
      docTable: String): Unit = {
    val idsC = ids.select(col("doc_id")).distinct().localCheckpoint(true)
    deleteByIds(spark, storeTable, idsC, Seq("doc_id"))
    deleteByIds(spark, probeTable, idsC, Seq("doc_id"))
    deleteByIds(spark, pairsTable, idsC, Seq("d1", "d2"))
    val store = tryRead(spark, docTable).map(_.localCheckpoint(true))
    tombstoneSwap(store, idsC, docTable, "text")
  }

  private def emptySigStore(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    emptyDf(spark, "doc_id" -> LongType, "b0" -> IntegerType,
      "b1" -> IntegerType, "b2" -> IntegerType, "b3" -> IntegerType)
  }

  private def emptyPerceptualPairs(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    emptyDf(spark, "d1" -> LongType, "d2" -> LongType,
      "matched_bands" -> IntegerType, "hamming" -> IntegerType,
      "is_dup" -> BooleanType)
  }

  /** mm05's continuous twin: CONTINUOUS chunk-dedup maintenance — a
    * counts-shaped member of the standing-state family (the vocab/LM
    * no-standing-read shape, NOT pp21's semi-join recompute: the gate
    * must emit the report inline, so it probes the standing store; the
    * continuous flow defers folding to snapshot time and its advance
    * never reads standing state at all). A payload's chunk rows are a
    * pure immutable function of its bytes, and the id guard puts each
    * doc in exactly one committed batch — so per-digest occurrence
    * counts and DISTINCT-DOC counts are both purely additive across
    * batches (the distinct docs of digest g in the corpus partition
    * exactly into its distinct docs per batch), keepers/lengths
    * min-combine, and one batch-sized chunk+rollup pass appended as a
    * delta is the whole advance. At-least-once safety: doc store as
    * guard (appended LAST), deterministic batch_key (min doc_id),
    * byte-identical replay rows, snapshot dedup on (batch_key, digest);
    * [[compactChunks]] folds the delta table to O(distinct digests) on
    * the maintenance cadence. */
  def maintainChunkState(batch: DataFrame, statsTable: String,
      docTable: String): Unit = {
    val fresh = freshAgainst(batch, docTable)
    if (fresh.isEmpty) return
    val batchKey = fresh.agg(min(col("doc_id"))).head().getLong(0)
    chunkDelta(fresh, batchKey).write.mode("append").parquet(statsTable)
    fresh.write.mode("append").parquet(docTable)
  }

  /** The per-digest delta rows of one batch — the exact rows
    * [[maintainChunkState]] appends, shared with the crash-simulation
    * spec (the vocabDelta drift-pinning convention). */
  private[graft] def chunkDelta(fresh: DataFrame, batchKey: Long): DataFrame =
    graft.operators.Multimodal.cdcChunks(
        fresh.withColumn("blob", encode(col("text"), "UTF-8")),
        "doc_id", "blob")
      .groupBy(col("digest"))
      .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("n_docs"),
        min(col("clen")).as("clen"), min(col("doc_id")).as("keeper_id"))
      .select(lit(batchKey).as("batch_key"), col("digest"), col("n_occ"),
        col("n_docs"), col("clen"), col("keeper_id"))

  /** [[maintainChunkState]] as a foreachBatch sink over a (doc_id, text)
    * document stream. */
  def chunkStateStream(docs: DataFrame, statsTable: String,
      docTable: String,
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(docs, checkpoint)((b: DataFrame, _: Long) =>
        maintainChunkState(b, statsTable, docTable))

  /** The current shared-chunk report under the maintained stats — mm05's
    * exact shape over every doc arrived. Redelivered-batch duplicates
    * collapse on (batch_key, digest) before the additive fold. */
  def chunkReportSnapshot(spark: SparkSession, statsTable: String): DataFrame =
    tryRead(spark, statsTable).getOrElse(emptyChunkStats(spark))
      .dropDuplicates("batch_key", "digest")
      .groupBy(col("digest"))
      .agg(min(col("clen")).as("clen"), sum(col("n_occ")).as("n_occ"),
        sum(col("n_docs")).as("n_docs"), min(col("keeper_id")).as("keeper_id"))
      .filter(col("n_docs") >= 2)
      .select(col("digest"), col("clen"), col("n_occ"), col("n_docs"),
        col("keeper_id"))

  /** Compact the chunk deltas to one row per digest; `docTable` is the
    * flow's guard, and its null-text tombstones are the commit witness
    * for [[forgetChunkState]] decrement keys. (Keeper-carrying tables
    * keep their netted-zero rows at the fold — the snapshot's
    * n_docs ≥ 2 filter hides them.) */
  def compactChunks(spark: SparkSession, statsTable: String,
      docTable: String): Unit =
    compactDeltas(spark, statsTable, Seq("digest"), Seq("n_occ", "n_docs"),
      docTable, "doc_id", mins = Seq("clen", "keeper_id"),
      tombstoneIds = tryRead(spark, docTable)
        .map(_.filter(col("text").isNull).select(col("doc_id"))))

  /** DELETION PROPAGATION for the chunk-dedup family — additive counts
    * plus the family's first MIN-REPAIR: per-digest (n_occ, n_docs)
    * decrement exactly like [[forgetCountState]] (recomputed from the
    * forgotten docs' stored text, appended as negative deltas whose
    * keeper column is the min-neutral Long.MaxValue; clen carries its
    * true value — chunks with one digest are byte-identical, so every
    * row agrees), but keeper_id is a MIN and a min cannot be RAISED by
    * appends: digests whose current keeper is a forgotten doc need
    * their keeper recomputed over the surviving holders, which only a
    * re-chunk of the surviving store can name — ONE O(corpus) pass
    * (the run-rarely class the vector-family forgets already pay),
    * pruned to the affected digests after chunking, followed by an
    * in-place patch of the stats rows (sums untouched, committed/
    * pending keys preserved). Digests with no surviving holder patch
    * to Long.MaxValue and net to zero counts — invisible behind the
    * snapshot's n_docs ≥ 2 filter. Crash contract: decrements derive
    * from text (nulled only by the final swap), the affected set is
    * computed on the PRE-decrement fold after [[rollbackPendingForgets]]
    * (a completed patch makes the re-run's affected set empty), and
    * every step is idempotent — forgetCountState's contract plus one
    * rewrite. Single-maintenance-loop contract as everywhere: no
    * concurrent advance. */
  def forgetChunkState(spark: SparkSession, ids: DataFrame,
      statsTable: String, docTable: String): Unit = {
    val idsC = ids.select(col("doc_id")).distinct().localCheckpoint(true)
    val store = tryRead(spark, docTable).map(_.localCheckpoint(true))
    val gone = store
      .map(_.filter(col("text").isNotNull).join(idsC, Seq("doc_id"), "left_semi"))
      .map(_.localCheckpoint(true))
      .filter(!_.isEmpty)
    gone.foreach { g =>
      val forgetKey = -g.agg(min(col("doc_id"))).head().getLong(0) - 1L
      rollbackPendingForgets(spark, Seq(statsTable), g)
      val goneIds = g.select(col("doc_id")).localCheckpoint(true)
      val dec = chunkDelta(g, forgetKey).localCheckpoint(true)
      val stats = tryRead(spark, statsTable).map(_.localCheckpoint(true))
      // digests whose CURRENT keeper is forgotten, on the pre-decrement
      // fold (rollback above cleared any partial run of this key)
      val affected = stats.map { t =>
        t.filter(col("batch_key") =!= forgetKey)
          .join(broadcast(dec.select(col("digest"))), Seq("digest"), "left_semi")
          .dropDuplicates("batch_key", "digest")
          .groupBy(col("digest")).agg(min(col("keeper_id")).as("k"))
          .join(goneIds.withColumnRenamed("doc_id", "k"), Seq("k"), "left_semi")
          .select(col("digest")).localCheckpoint(true)
      }.getOrElse(emptyDf(spark,
        "digest" -> org.apache.spark.sql.types.StringType))
      // patch BEFORE the decrement append: the patch rewrites the table
      // from the pre-append checkpoint, so appending first would lose
      // the decrement rows; a crash between patch and append re-runs
      // with an empty affected set (keepers already patched) and just
      // re-appends
      if (!affected.isEmpty) {
        // the run-rarely pass: re-chunk the SURVIVING store, name each
        // affected digest's new min holder, patch rows in place
        val survivors = store.get.filter(col("text").isNotNull)
          .join(idsC, Seq("doc_id"), "left_anti")
        val newKeep = graft.operators.Multimodal.cdcChunks(
            survivors.withColumn("blob", encode(col("text"), "UTF-8")),
            "doc_id", "blob")
          .join(broadcast(affected), Seq("digest"), "left_semi")
          .groupBy(col("digest")).agg(min(col("doc_id")).as("__nk"))
        stats.foreach { t =>
          val patched = t
            .join(broadcast(affected.withColumn("__aff", lit(true))),
              Seq("digest"), "left")
            .join(broadcast(newKeep), Seq("digest"), "left")
            .withColumn("keeper_id",
              when(col("__aff").isNotNull,
                coalesce(col("__nk"), lit(Long.MaxValue)))
                .otherwise(col("keeper_id")))
            .select(t.columns.map(col).toIndexedSeq: _*)
          graft.operators.MergeWriter.overwriteAtomic(patched, statsTable)
        }
      }
      dec.select(col("batch_key"), col("digest"), (-col("n_occ")).as("n_occ"),
          (-col("n_docs")).as("n_docs"), col("clen"),
          lit(Long.MaxValue).as("keeper_id"))
        .write.mode("append").parquet(statsTable)
    }
    tombstoneSwap(store, idsC, docTable, "text")
  }

  private def emptyChunkStats(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    emptyDf(spark, "batch_key" -> LongType, "digest" -> StringType,
      "n_occ" -> LongType, "n_docs" -> LongType, "clen" -> IntegerType,
      "keeper_id" -> LongType)
  }

  /** pp22's continuous loop: CONTINUOUS token-budget mix maintenance.
    * The standing state is an append-only JOURNAL of every arrived doc
    * that was ELIGIBLE when it arrived — i.e. sorted before the
    * source's current cut marker (the first doc the budget ever
    * dropped; eligibility only ever shrinks). The journal provably
    * contains EVERY arrived doc before the current cut: when such a doc
    * arrived, the cut sat at or past where it sits now, so the doc was
    * eligible then. The kept set and cut marker are therefore exact
    * snapshots DERIVED from the journal ([[budgetKeptSnapshot]] /
    * [[budgetCutSnapshot]] — the sa10 kernel over the journal), and an
    * advance is: derive the batch frame (row-local token count + fold),
    * drop docs at/past the current cut outright, append the remainder
    * under the batch_key. Docs past the cut never enter the journal, so
    * its size is kept + eviction history — [[compactBudget]] folds rows
    * strictly past the current cut away (keeping the crossing witness)
    * on the usual cadence. Crash contract: journal append, then guard
    * append; a replay recomputes a byte-identical (possibly smaller —
    * the cut may have advanced) row set under the same batch_key, and
    * the snapshot's doc_id dedup collapses it. In-batch duplicates
    * collapse deterministically (max text). Per-batch work and write
    * volume O(batch). */
  def maintainBudgetState(batch: DataFrame, eligTable: String,
      docTable: String, budget: Long): Unit = {
    val spark = batch.sparkSession
    val arrived = batch.select(col("doc_id"), col("source"), col("text"))
      .groupBy(col("doc_id"))
      .agg(max(col("source")).as("source"), max(col("text")).as("text"))
    val fresh0 = tryRead(spark, docTable)
      .map(e => arrived.join(
        pruneToBatchRange(e.select("doc_id"), batch, "doc_id"),
        Seq("doc_id"), "left_anti"))
      .getOrElse(arrived)
    val fresh = graft.queries.SampleOps.budgetFrame(fresh0).localCheckpoint(true)
    if (fresh.isEmpty) return
    // pinned: the emptiness probe would otherwise re-run the cut-join
    // delta plan a second time for the write
    val eligible = budgetDelta(fresh, eligTable, budget).localCheckpoint(true)
    if (!eligible.isEmpty) eligible.write.mode("append").parquet(eligTable)
    fresh.select(col("doc_id")).write.mode("append").parquet(docTable)
  }

  /** The batch-keyed journal rows of one fresh frame — the exact rows
    * [[maintainBudgetState]] appends, shared with the crash-simulation
    * spec (the mixDelta/vocabDelta drift-pinning convention). */
  private[graft] def budgetDelta(fresh: DataFrame, eligTable: String,
      budget: Long): DataFrame = {
    val spark = fresh.sparkSession
    val batchKey = fresh.agg(min(col("doc_id"))).head().getLong(0)
    val cut = budgetCutSnapshot(spark, eligTable, budget)
    fresh.join(cut, Seq("source"), "left")
      .filter(col("cut_key").isNull ||
        col("key") < col("cut_key") ||
        (col("key") === col("cut_key") && col("doc_id") < col("cut_doc")))
      .select(lit(batchKey).as("batch_key"), col("doc_id"), col("source"),
        col("n_tokens"), col("key"))
  }

  /** [[maintainBudgetState]] as a foreachBatch sink over a (doc_id,
    * source, text) stream. */
  def budgetStateStream(docs: DataFrame, eligTable: String,
      docTable: String, budget: Long,
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(docs, checkpoint)((b: DataFrame, _: Long) =>
        maintainBudgetState(b, eligTable, docTable, budget))

  /** The deduped journal rows (doc_id, source, n_tokens, key). */
  private def budgetJournal(spark: SparkSession, eligTable: String): DataFrame = {
    import org.apache.spark.sql.types._
    tryRead(spark, eligTable).getOrElse(emptyDf(spark,
        "batch_key" -> LongType, "doc_id" -> LongType,
        "source" -> StringType, "n_tokens" -> LongType, "key" -> LongType))
      .dropDuplicates("doc_id")
      .select(col("doc_id"), col("source"), col("n_tokens"), col("key"))
  }

  /** The current kept prefix under the maintained journal — sa10's
    * exact output shape over every doc arrived. */
  def budgetKeptSnapshot(spark: SparkSession, eligTable: String,
      budget: Long): DataFrame =
    graft.queries.SampleOps.budgetKept(budgetJournal(spark, eligTable), budget)

  /** The current cut markers under the maintained journal. */
  def budgetCutSnapshot(spark: SparkSession, eligTable: String,
      budget: Long): DataFrame =
    graft.queries.SampleOps.budgetCut(budgetJournal(spark, eligTable), budget)

  /** Compact the journal to the live rows: everything at or before the
    * current cut (inclusive — the crossing doc is the marker's witness),
    * folded under the reserved key; pending (crashed-batch) rows keep
    * their key so a replay still collapses against them. */
  def compactBudget(spark: SparkSession, eligTable: String,
      docTable: String, budget: Long): Unit =
    tryRead(spark, eligTable).foreach { t0 =>
      val t = t0.localCheckpoint(true)
      val guard = tryRead(spark, docTable)
        .map(_.select(col("doc_id").as("__gid")))
        .getOrElse(emptyDf(spark, "__gid" -> org.apache.spark.sql.types.LongType))
      val tKeys = t.select(col("batch_key")).distinct()
      val committedKeys = tKeys
        .join(guard, tKeys("batch_key") === col("__gid"), "left_semi")
        .localCheckpoint(true)
      val reserved = col("batch_key") === Long.MinValue
      val committed = t.filter(reserved).unionByName(
        t.join(broadcast(committedKeys), Seq("batch_key"), "left_semi"))
        .dropDuplicates("doc_id")
        .select(col("doc_id"), col("source"), col("n_tokens"), col("key"))
      val pending = t.filter(!reserved)
        .join(broadcast(committedKeys), Seq("batch_key"), "left_anti")
      val cut = graft.queries.SampleOps.budgetCut(committed, budget)
      val live = committed.join(cut, Seq("source"), "left")
        .filter(col("cut_key").isNull ||
          col("key") < col("cut_key") ||
          (col("key") === col("cut_key") && col("doc_id") <= col("cut_doc")))
        .select(lit(Long.MinValue).as("batch_key"), col("doc_id"),
          col("source"), col("n_tokens"), col("key"))
      graft.operators.MergeWriter.overwriteAtomic(
        live.unionByName(pending), eligTable)
    }

  /** DELETION PROPAGATION for the token-budget family: the forgotten
    * docs' journal rows delete (id-granular, exact) and the ids append
    * to the guard (re-ingest blocked, never-seen ids forward-block; the
    * guard is ids-only — nothing in this flow is recomputed from text).
    * The kept prefix and cut markers are DERIVED snapshots, so they
    * self-repair at the next read: freeing a kept doc's tokens refills
    * the budget from the journal's next rows — including journaled docs
    * past the old cut that a compaction has not yet folded away.
    *
    * Stated honestly (the family's only-shrinks eligibility trade,
    * cf. [[forgetDedupState]]'s cluster-split honesty): docs that were
    * dropped AT ARRIVAL (past the then-current cut, never journaled) or
    * already folded away by [[compactBudget]] are NOT resurrected — the
    * post-forget snapshot equals sa10 over the surviving JOURNALED
    * docs, which under-fills the budget relative to a from-scratch run
    * over the survivors exactly when an eviction has discarded a doc
    * the freed budget would now admit. A deployment that needs exact
    * refill keeps the journal uncompacted (the journal then holds every
    * arrival and the equality is exact); the compliance obligation —
    * the subject's rows gone, the ids blocked — holds either way. */
  def forgetBudgetState(spark: SparkSession, ids: DataFrame,
      eligTable: String, docTable: String): Unit = {
    val idsC = ids.select(col("doc_id")).distinct().localCheckpoint(true)
    deleteByIds(spark, eligTable, idsC, Seq("doc_id"))
    appendNewBy(idsC, docTable, "doc_id")
  }

  /** pp13's continuous twin: CONTINUOUS bigram-LM maintenance — the
    * second counts-shaped member of the standing-state family, with
    * [[maintainVocabState]]'s contract verbatim: per-bigram occurrence
    * counts are PURELY ADDITIVE across doc-disjoint batches
    * ([[graft.queries.TextOps.bigramCounts]] — a sum, no count-distinct),
    * so a batch advances the state with ONE batch-sized counting pass
    * appended as a delta, no standing read at all. The KN continuation
    * count is deliberately NOT maintained (it is a window over the
    * already-aggregated vocab²-bounded table — [[lmSnapshot]] recomputes
    * it from the merged counts; see pp13's Scaladoc). At-least-once
    * safety: doc store as guard (appended LAST), deterministic batch_key
    * (min doc_id), byte-identical replay rows, snapshot dedup on
    * (batch_key, bigram); [[compactLm]] folds the delta table to O(vocab²)
    * rows on the maintenance cadence. */
  def maintainLmState(batch: DataFrame, lmTable: String,
      docTable: String): Unit = {
    val fresh = freshAgainst(batch, docTable)
    if (fresh.isEmpty) return
    val batchKey = fresh.agg(min(col("doc_id"))).head().getLong(0)
    lmDelta(fresh, batchKey).write.mode("append").parquet(lmTable)
    fresh.write.mode("append").parquet(docTable)
  }

  /** The per-bigram delta rows of one batch — the exact rows
    * [[maintainLmState]] appends, shared with the crash-simulation spec
    * (same drift-pinning reason as [[vocabDelta]]). */
  private[graft] def lmDelta(fresh: DataFrame, batchKey: Long): DataFrame =
    graft.queries.TextOps.bigramCounts(fresh)
      .select(lit(batchKey).as("batch_key"), col("bigram"), col("n"))

  /** [[maintainLmState]] as a foreachBatch sink over a (doc_id, text)
    * document stream. */
  def lmStateStream(docs: DataFrame, lmTable: String,
      docTable: String,
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(docs, checkpoint)((b: DataFrame, _: Long) =>
        maintainLmState(b, lmTable, docTable))

  /** The current top-100 bigram LM (with KN continuation counts) under
    * the maintained delta table — ta09's exact shape over every doc that
    * has arrived AND NOT been forgotten. Duplicate delta rows from
    * redelivered batches collapse on (batch_key, bigram) before the sum;
    * net-zero bigrams from [[forgetCountState]]'s decrements are
    * filtered BEFORE the KN continuation window — a zero-count bigram
    * left in place would still inflate its right word's
    * distinct-left-context count. */
  def lmSnapshot(spark: SparkSession, lmTable: String,
      topN: Int = 100): DataFrame = {
    import org.apache.spark.sql.types._
    graft.queries.TextOps.lmTop(
      tryRead(spark, lmTable).getOrElse(emptyDf(spark,
          "batch_key" -> LongType, "bigram" -> StringType, "n" -> LongType))
        .dropDuplicates("batch_key", "bigram")
        .groupBy(col("bigram")).agg(sum(col("n")).as("n"))
        .filter(col("n") > 0),
      topN)
  }

  /** Compact the LM deltas to one row per bigram; `docTable` is the
    * flow's guard, and its null-text tombstones are the commit witness
    * for [[forgetCountState]] decrement keys (net-zero bigrams drop at
    * the fold). */
  def compactLm(spark: SparkSession, lmTable: String,
      docTable: String): Unit =
    compactDeltas(spark, lmTable, Seq("bigram"), Seq("n"),
      docTable, "doc_id",
      tombstoneIds = tryRead(spark, docTable)
        .map(_.filter(col("text").isNull).select(col("doc_id"))),
      dropZeroKeys = true)

  /** The once-offline REFERENCE-LM build for the perplexity score family
    * (pp25/ta17's frozen model): derive the reference bigram counts from
    * the curated slice of `docs` and atomically swap the table every
    * [[maintainScoreState]] advance scores against. Run BEFORE the
    * stream starts (the whole family's soundness rests on the reference
    * being frozen — [[graft.queries.TextOps]] ta17 Scaladoc); re-running
    * it on the same corpus recomputes the identical table. */
  def buildRefState(docs: DataFrame, refTable: String): Unit =
    graft.operators.MergeWriter.overwriteAtomic(
      graft.queries.TextOps.refLmCounts(docs), refTable)

  /** pp25's continuous twin: CONTINUOUS perplexity-score maintenance —
    * the CHEAPEST maintainer in the standing-state family, because the
    * frozen reference makes a document's score IMMUTABLE once computed:
    * the standing state IS the scored table, advanced by scoring ONLY
    * the batch against the reference ([[graft.queries.TextOps
    * .refSurprise]] — batch-sized rollup + bigram-keyed ref join) and
    * appending. Nothing is ever updated, rewritten, or recomputed from
    * text after the advance, so the doc-store guard is IDS-ONLY (unlike
    * the counts family, whose forget decrements need the stored text).
    * Bucket assignment is deliberately NOT maintained — a new arrival
    * shifts its source's tercile cuts for everyone (inherent to quantile
    * buckets), so [[scoreSnapshot]] re-ranks at read over (doc_id,
    * source, score) rows, never the text (pp25's rank-only argument).
    *
    * At-least-once safety is the [[maintainVocabState]] contract: guard
    * appended LAST, scored rows ride the batch's deterministic
    * `batch_key` (min doc_id), a crash-replay appends byte-identical
    * rows (the reference is frozen — same inputs, same scores), and the
    * snapshot's (batch_key, doc_id) dedup collapses them. Docs with
    * < 2 tokens score no row but still enter the guard (ta17's
    * absent-doc convention, and redelivery stays blocked). The table
    * is [[TF_PARTITIONS]]-bucketed on doc_id from its first write, so
    * [[forgetScoreState]] rewrites only touched partitions. */
  def maintainScoreState(batch: DataFrame, refTable: String,
      scoresTable: String, docTable: String): Unit = {
    val spark = batch.sparkSession
    // heal any crashed partition publish before appending (a pending
    // committed stage would otherwise overwrite this append's files
    // when a later op rolls it forward — the tf-family entry contract),
    // then migrate a pre-layout flat table before the first
    // partitioned append can strand its rows
    graft.operators.MergeWriter.repairPartitionedTable(
      spark, scoresTable, "pt")
    migrateDocBucketed(spark, scoresTable)
    val fresh = freshAgainst(batch, docTable, Seq("source", "text"))
    if (fresh.isEmpty) return
    val batchKey = fresh.agg(min(col("doc_id"))).head().getLong(0)
    scoreDelta(fresh, spark.read.parquet(refTable), batchKey)
      .withColumn("pt", pmod(col("doc_id"), lit(TF_PARTITIONS.toLong)))
      .write.mode("append").partitionBy("pt").parquet(scoresTable)
    fresh.select(col("doc_id")).write.mode("append").parquet(docTable)
  }

  /** The scored rows of one batch — the exact rows [[maintainScoreState]]
    * appends, shared with the crash-simulation spec (same drift-pinning
    * reason as [[vocabDelta]]). */
  private[graft] def scoreDelta(fresh: DataFrame, ref: DataFrame,
      batchKey: Long): DataFrame =
    graft.queries.TextOps.refSurprise(fresh, ref)
      .select(lit(batchKey).as("batch_key"), col("doc_id"),
        col("source"), col("score"))

  /** [[maintainScoreState]] as a foreachBatch sink over a (doc_id,
    * source, text) document stream. */
  def scoreStateStream(docs: DataFrame, refTable: String,
      scoresTable: String, docTable: String,
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(docs, checkpoint)((b: DataFrame, _: Long) =>
        maintainScoreState(b, refTable, scoresTable, docTable))

  /** The current head/middle/tail bucketing under the maintained scores
    * — ta17's exact shape over every doc that has arrived AND NOT been
    * forgotten: duplicate scored rows from redelivered batches collapse
    * on (batch_key, doc_id), then the rank-only bucket assembly
    * ([[graft.queries.TextOps.refBuckets]] — distributed rank, no
    * per-source window sort) runs over the id/source/score rows. */
  def scoreSnapshot(spark: SparkSession, scoresTable: String): DataFrame = {
    import org.apache.spark.sql.types._
    graft.queries.TextOps.refBuckets(
      tryRead(spark, scoresTable).getOrElse(emptyDf(spark,
          "batch_key" -> LongType, "doc_id" -> LongType,
          "source" -> StringType, "score" -> LongType))
        .dropDuplicates("batch_key", "doc_id")
        .select(col("doc_id"), col("source"), col("score")))
  }

  /** DELETION PROPAGATION for the score family — the SIMPLEST forget
    * member: scores are per-doc and immutable (nothing aggregates them,
    * nothing derives from them), so forgetting is exact row deletion
    * plus the id guard. The table is [[TF_PARTITIONS]]-bucketed on
    * doc_id (like the tf family), so the deletion rewrites ONLY the
    * partitions holding forgotten ids — partition-pruned scan, atomic
    * per-partition publish, rewrite volume min(|ids|, buckets)/buckets
    * of the table. Scores delete FIRST (snapshots are correct
    * immediately), then the ids append to the guard (blocks future
    * ingest of never-seen forgotten ids; already-seen ids are guarded
    * since their advance). A crash between the two re-runs to
    * convergence. Re-bucketing needs no repair at all: [[scoreSnapshot]]
    * re-ranks at read, so the survivors' head/middle/tail simply re-cut
    * (pp25's rank-only argument). */
  def forgetScoreState(spark: SparkSession, ids: DataFrame,
      scoresTable: String, docTable: String): Unit = {
    val idsC = ids.select(col("doc_id")).distinct().localCheckpoint(true)
    deleteDocPartitioned(spark, idsC, forgottenPts(idsC), scoresTable,
      Seq("batch_key", "source", "score"))
    appendNewBy(idsC, docTable, "doc_id")
  }

  /** Compact the scored rows: collapse redelivery duplicates (the rows
    * are byte-identical by the frozen-reference argument, so dropping
    * them never destroys replay-dedup evidence — a replay re-appends an
    * identical row and the snapshot dedup collapses it again) and
    * repack — per pt bucket, preserving the partitioned layout the
    * forget's pruning rests on. */
  def compactScores(spark: SparkSession, scoresTable: String): Unit =
    compactDocPartitioned(spark, scoresTable, Seq("batch_key", "doc_id"),
      Seq("batch_key", "doc_id", "source", "score"))

  /** Migrate a doc-bucketed standing table that predates the
    * [[TF_PARTITIONS]] layout: a FLAT table (no pt column) is rewritten
    * partitioned ONCE, in [[graft.operators.MergeWriter]]'s atomic
    * whole-table swap. Without this, the first partitioned append would
    * create pt= dirs beside the flat files, and partition discovery
    * would silently drop every pre-layout row from every read — the
    * exact failure mode the [[TF_PARTITIONS]] Scaladoc documents.
    * No-op on already-partitioned or absent tables; every partitioned
    * maintainer/forget/compaction entry point calls it. */
  private def migrateDocBucketed(spark: SparkSession, table: String): Unit =
    tryRead(spark, table).foreach { t =>
      if (!t.columns.contains("pt"))
        graft.operators.MergeWriter.overwriteAtomicPartitioned(
          t.localCheckpoint(true).withColumn("pt",
            pmod(col("doc_id"), lit(TF_PARTITIONS.toLong))),
          table, "pt")
    }

  /** The per-bucket compaction EVERY doc-bucketed standing table shares
    * (scores, the feature tables): heal a crashed publish, migrate a
    * pre-layout flat table, collapse redelivery duplicates on
    * `dedupKeys`, and republish each live bucket atomically —
    * the layout the partition-pruned forgets rest on is preserved.
    * `valueCols` is the table's full column set minus pt, in write
    * order. */
  private def compactDocPartitioned(spark: SparkSession, table: String,
      dedupKeys: Seq[String], valueCols: Seq[String]): Unit = {
    graft.operators.MergeWriter.repairPartitionedTable(spark, table, "pt")
    migrateDocBucketed(spark, table)
    tryRead(spark, table).foreach { t0 =>
      val t = t0.localCheckpoint(true)
      val pts = t.select(col("pt").cast("long")).distinct()
        .collect().map(_.getLong(0)).toIndexedSeq // ≤ TF_PARTITIONS
      graft.operators.MergeWriter.overwritePartitionsAtomic(
        t.select(valueCols.map(col) :+ col("pt").cast("long").as("pt"): _*)
          .dropDuplicates(dedupKeys)
          .repartition(col("pt")),
        table, "pt", pts)
    }
  }

  /** The doc-bucketed standing tables' partition count (tf/dl, the
    * score table, the three feature tables) — a table-creation constant
    * (like the dedup flow's canonicalizer mode: every writer and reader
    * of one table must agree). The table is PARTITIONED BY
    * pt = doc_id mod this, so [[forgetTfState]] rewrites only the
    * partitions holding forgotten ids: the forget's rewrite volume is
    * min(|ids|, TF_PARTITIONS)/TF_PARTITIONS of the table instead of
    * all of it — the kNN-graph family's touched-partition treatment
    * applied to the retrieval family. Size it so that bound bites at
    * the deployment's typical forget-request size (a 100-id GDPR batch
    * against 64 partitions still touches most of them; raise the
    * constant with corpus size — partitions should stay several files
    * each, not thousands).
    *
    * The LAYOUT is part of the contract from the table's first write —
    * once pt= dirs exist, Spark's partition discovery silently ignores
    * data files at the table root, so mixing layouts loses the flat
    * rows from every read with no error anywhere. Every partitioned
    * maintainer/forget/compaction entry point therefore runs
    * [[migrateDocBucketed]] (atomic flat→partitioned rewrite, no-op
    * once migrated) BEFORE its first partitioned write. */
  private[graft] val TF_PARTITIONS = 64

  /** pp26's continuous twin: CONTINUOUS retrieval-index maintenance —
    * the standing (doc_id, tok, tf) postings-source table ta18/pp26
    * search over, advanced by one batch-sized tokenize+rollup append
    * (per-bucket under the [[TF_PARTITIONS]] layout).
    * Per-doc rows never change (each is a pure function of its own
    * document), so there is no fold, no delta key, and no standing read:
    * redelivery duplicates are byte-identical rows [[tfSnapshot]]
    * collapses on (doc_id, tok). The doc store is the guard (appended
    * LAST, vocab-family contract) and keeps the text for audit; nothing
    * is ever recomputed from it. Query-time statistics (df, dl, N, L)
    * derive from the standing table inside [[bm25Snapshot]], so every
    * arrival is searchable immediately with corpus-consistent scores. */
  def maintainTfState(batch: DataFrame, tfTable: String,
      docTable: String): Unit = {
    // heal any crashed partition publish before appending: a pending
    // committed stage would otherwise overwrite this append's files
    // when a later op rolls it forward
    graft.operators.MergeWriter.repairPartitionedTable(
      batch.sparkSession, tfTable, "pt")
    migrateDocBucketed(batch.sparkSession, tfTable)
    val fresh = freshAgainst(batch, docTable)
    if (fresh.isEmpty) return
    graft.queries.TextOps.tfRollup(fresh)
      .withColumn("pt", pmod(col("doc_id"), lit(TF_PARTITIONS.toLong)))
      .write.mode("append").partitionBy("pt").parquet(tfTable)
    fresh.write.mode("append").parquet(docTable)
  }

  /** [[maintainTfState]] with the SERVING-PATH doc-length table
    * maintained alongside: dl = Σ tf per doc is a pure per-doc function
    * (the tf-family additivity), so it appends from the SAME batch
    * tokenize — each document is still scanned once ever — under the
    * same [[TF_PARTITIONS]] bucketing. A query then derives df from the
    * query-term-pruned postings and N/L from this compact 2-column
    * table ([[bm25ServeSnapshot]]), never re-rolling the corpus-sized
    * tf table per workload. Crash between the two appends: the guard
    * has not moved, the replay re-appends byte-identical rows to both,
    * and the snapshots' per-doc dedups collapse them. */
  def maintainTfState(batch: DataFrame, tfTable: String, dlTable: String,
      docTable: String): Unit = {
    val spark = batch.sparkSession
    graft.operators.MergeWriter.repairPartitionedTable(spark, tfTable, "pt")
    graft.operators.MergeWriter.repairPartitionedTable(spark, dlTable, "pt")
    Seq(tfTable, dlTable).foreach(migrateDocBucketed(spark, _))
    val fresh = freshAgainst(batch, docTable)
    if (fresh.isEmpty) return
    val rolled = graft.queries.TextOps.tfRollup(fresh).localCheckpoint(true)
    rolled
      .withColumn("pt", pmod(col("doc_id"), lit(TF_PARTITIONS.toLong)))
      .write.mode("append").partitionBy("pt").parquet(tfTable)
    rolled.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      .withColumn("pt", pmod(col("doc_id"), lit(TF_PARTITIONS.toLong)))
      .write.mode("append").partitionBy("pt").parquet(dlTable)
    fresh.write.mode("append").parquet(docTable)
  }

  /** [[maintainTfState]] with BOTH serving artifacts: the dl table AND
    * a TOKEN-BUCKETED projection of the tf rows (`tb` = hash(tok) mod
    * [[TOK_TF_BUCKETS]]) — the retrieval-engine layout, where a query's
    * term set selects a handful of `tb=` directories and the serve
    * scan SKIPS every other bucket at the PLANNER (a pushed partition
    * filter, not a streamed-and-dropped row filter). All three
    * projections derive from the SAME batch tokenize (each document
    * still scanned once ever); appends are O(batch) in both layouts
    * (a batch's rows scatter across tok buckets, but their VOLUME is
    * the batch's). The doc-bucketed tf table stays the SOURCE OF TRUTH
    * (deletion-friendly: forgets prune to the ids' pt buckets); the
    * tok-bucketed copy is a derived projection whose buckets cannot
    * prune by doc, but whose forget is still BUCKET-LOCAL: the
    * forgotten docs' tokens (read pt-pruned from the tf table) name the
    * `tb=` buckets that can hold a forgotten row — see the tok overload
    * of [[forgetTfState]]. */
  def maintainTfState(batch: DataFrame, tfTable: String, dlTable: String,
      tokTfTable: String, docTable: String): Unit = {
    val spark = batch.sparkSession
    graft.operators.MergeWriter.repairPartitionedTable(spark, tfTable, "pt")
    graft.operators.MergeWriter.repairPartitionedTable(spark, dlTable, "pt")
    graft.operators.MergeWriter.repairPartitionedTable(spark, tokTfTable, "tb")
    Seq(tfTable, dlTable).foreach(migrateDocBucketed(spark, _))
    val fresh = freshAgainst(batch, docTable)
    if (fresh.isEmpty) return
    val rolled = graft.queries.TextOps.tfRollup(fresh).localCheckpoint(true)
    rolled
      .withColumn("pt", pmod(col("doc_id"), lit(TF_PARTITIONS.toLong)))
      .write.mode("append").partitionBy("pt").parquet(tfTable)
    rolled.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      .withColumn("pt", pmod(col("doc_id"), lit(TF_PARTITIONS.toLong)))
      .write.mode("append").partitionBy("pt").parquet(dlTable)
    rolled
      .withColumn("tb", tokBucket(col("tok")))
      .write.mode("append").partitionBy("tb").parquet(tokTfTable)
    fresh.write.mode("append").parquet(docTable)
  }

  /** The tok-bucketed layout's bucket count and bucketing function —
    * table-creation constants like [[TF_PARTITIONS]] (every writer and
    * reader of one table must agree). The hash is the engine-universal
    * md5 fold (`QueryUtils.hex8`), so the bucket of a token is the same
    * expression on the ingest and the query side — the query-side
    * bucket derivation runs the SAME Column, never a re-implementation
    * that could drift. */
  private[graft] val TOK_TF_BUCKETS = 64
  private[graft] def tokBucket(tok: org.apache.spark.sql.Column) =
    pmod(graft.queries.QueryUtils.hex8(tok), lit(TOK_TF_BUCKETS.toLong))

  /** [[maintainTfState]] as a foreachBatch sink over a (doc_id, text)
    * document stream. */
  def tfStateStream(docs: DataFrame, tfTable: String,
      docTable: String,
      // no default: Scala forbids defaults on two overloads (the 4-arg
      // dl-maintaining sink below carries it)
      checkpoint: Option[String]): org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(docs, checkpoint)((b: DataFrame, _: Long) =>
        maintainTfState(b, tfTable, docTable))

  def tfStateStream(docs: DataFrame, tfTable: String,
      docTable: String): org.apache.spark.sql.streaming.StreamingQuery =
    tfStateStream(docs, tfTable, docTable, None: Option[String])

  /** The dl-maintaining [[maintainTfState]] overload as a foreachBatch
    * sink — the stream a [[bm25ServeSnapshot]] deployment MUST ingest
    * through: the 3-arg sink above never advances the dl table, and a
    * tf row without its dl row is an ingest-contract violation the
    * serve path fails loudly on (never silently drops). */
  def tfStateStream(docs: DataFrame, tfTable: String, dlTable: String,
      docTable: String,
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(docs, checkpoint)((b: DataFrame, _: Long) =>
        maintainTfState(b, tfTable, dlTable, docTable))

  /** The current (doc_id, tok, tf) table under the maintained appends —
    * redelivery duplicates (byte-identical by construction) collapse on
    * (doc_id, tok); the partition column stays internal. */
  def tfSnapshot(spark: SparkSession, tfTable: String): DataFrame = {
    import org.apache.spark.sql.types._
    tryRead(spark, tfTable).getOrElse(emptyDf(spark,
        "doc_id" -> LongType, "tok" -> StringType, "tf" -> LongType))
      .select(col("doc_id"), col("tok"), col("tf"))
      .dropDuplicates("doc_id", "tok")
  }

  /** BM25 retrieval over the maintained table — ta18's exact results
    * over every doc that has arrived AND NOT been forgotten (the scoring
    * suffix is [[graft.queries.TextOps.bm25TopK]], shared verbatim). */
  def bm25Snapshot(spark: SparkSession, tfTable: String): DataFrame =
    graft.queries.TextOps.bm25TopK(
      tfSnapshot(spark, tfTable).localCheckpoint(true))

  /** [[bm25Snapshot]] for an arbitrary (query_id, qtext) workload and
    * k — the library serving path over maintained state. */
  def bm25Snapshot(spark: SparkSession, tfTable: String,
      queries: DataFrame, k: Int): DataFrame =
    graft.queries.TextOps.bm25TopK(
      tfSnapshot(spark, tfTable).localCheckpoint(true), queries, k)

  /** The current (doc_id, dl) lengths under the maintained appends —
    * redelivery duplicates collapse per doc; the partition column stays
    * internal. */
  def dlSnapshot(spark: SparkSession, dlTable: String): DataFrame = {
    import org.apache.spark.sql.types._
    tryRead(spark, dlTable).getOrElse(emptyDf(spark,
        "doc_id" -> LongType, "dl" -> LongType))
      .select(col("doc_id"), col("dl"))
      .dropDuplicates("doc_id")
  }

  /** BM25 retrieval over maintained state through the SERVING path: the
    * raw tf table streams through ONE scan into the broadcast
    * query-term prune (redelivery duplicates collapse AFTER the prune —
    * they commute with the tok filter), df derives from the pruned
    * postings, and lengths/N/L come from the maintained dl table — so
    * per workload this pays one streaming scan + Σ_t df(t) posting rows
    * + one compact 2-column table, never the corpus-wide dedup and dl
    * ROLLUP SHUFFLES [[bm25Snapshot]] re-runs per call. Scores are
    * EXACTLY [[bm25Snapshot]]'s (shared scoring suffix; the dl table
    * equals the tf rollup by the maintainer's construction —
    * spec-pinned).
    *
    * `materialize` decides how the dl snapshot (one row per doc — the
    * only corpus-ROW-proportional frame this path scans twice: the N/L
    * scalars, then the scoring join) is reused between those two uses.
    * The default `identity` RECOMPUTES it from the pushed-down 2-column
    * scan each time — the 100 TB-safe choice, because the alternative
    * copies a per-doc table to executor LOCAL DISK per serve call,
    * which fails on capacity as the corpus grows while two extra scans
    * of a 2-column parquet projection never do. Pass
    * [[graft.queries.TextOps.localMaterialize]] to trade that copy for
    * the repeated scan+dedup when the corpus comfortably fits
    * (ServeProbe measures both strategies — COVERAGE.md). */
  def bm25ServeSnapshot(spark: SparkSession, tfTable: String,
      dlTable: String, queries: DataFrame, k: Int,
      materialize: DataFrame => DataFrame = identity): DataFrame = {
    import org.apache.spark.sql.types._
    val tfRaw = tryRead(spark, tfTable).getOrElse(emptyDf(spark,
        "doc_id" -> LongType, "tok" -> StringType, "tf" -> LongType))
      .select(col("doc_id"), col("tok"), col("tf"))
    graft.queries.TextOps.bm25TopKWith(tfRaw,
      materialize(dlSnapshot(spark, dlTable)), queries, k)
  }

  /** [[bm25ServeSnapshot]] over the TOKEN-BUCKETED projection — the
    * layout-pruned serve: the workload's term set (driver-bounded by
    * the ta18 contract) derives its bucket values through the SAME
    * [[tokBucket]] Column in one workload-sized job (never a
    * re-implemented hash that could drift), and the serve scan then
    * reads ONLY those `tb=` directories — a PLANNER-level partition
    * prune, so [[bm25ServeSnapshot]]'s residual corpus-sized streaming
    * scan drops to |matched buckets|/[[TOK_TF_BUCKETS]] of the table
    * (≤ |query terms| buckets). Scores are EXACTLY the other paths'
    * (shared suffix + the same dl guard; spec-pinned), because the
    * dropped buckets contain no query-term postings by construction.
    * `materialize` has [[bm25ServeSnapshot]]'s contract (default =
    * recompute the dl snapshot from its scan per use). */
  def bm25ServeTokSnapshot(spark: SparkSession, tokTfTable: String,
      dlTable: String, queries: DataFrame, k: Int,
      materialize: DataFrame => DataFrame = identity): DataFrame = {
    import org.apache.spark.sql.types._
    val buckets = queries
      .select(explode(array_distinct(
        graft.functions.Text.tokens(col("qtext")))).as("tok"))
      .select(tokBucket(col("tok")).as("tb")).distinct()
      .collect().map(_.getLong(0)).toIndexedSeq
    val pruned = tryRead(spark, tokTfTable)
      .map(_.filter(col("tb").isin(buckets: _*)))
      .getOrElse(emptyDf(spark,
        "doc_id" -> LongType, "tok" -> StringType, "tf" -> LongType))
    graft.queries.TextOps.bm25TopKWith(
      pruned.select(col("doc_id"), col("tok"), col("tf")),
      materialize(dlSnapshot(spark, dlTable)), queries, k)
  }

  /** DELETION PROPAGATION for the retrieval family — exact like the
    * score family's: tf rows are per-doc and never aggregated at rest
    * (df/dl/N/L are query-time derivations), so forgetting is row
    * deletion plus the doc-store tombstone (text NULLED — the rows AND
    * the recoverable content both go; id kept, so redelivery and
    * re-ingest stay blocked, never-seen ids forward-block). The table
    * is [[TF_PARTITIONS]]-bucketed on doc_id, so the deletion touches
    * ONLY the partitions holding forgotten ids: a partition-pruned
    * scan, then a per-partition ATOMIC stage-then-publish of the
    * survivors ([[graft.operators.MergeWriter.overwritePartitionsAtomic]]
    * — a partition the forget emptied stages no rows and is deleted by
    * the same publish). Deletion first (snapshots correct immediately),
    * tombstone swap last; both idempotent, a crash between re-runs to
    * convergence. Every derived statistic self-repairs at query time:
    * the survivors' df/dl/N/L are simply what [[bm25Snapshot]] computes
    * next.
    *
    * Crash contract: the old dynamic-overwrite delete-then-rename
    * commit window (a hard crash there could LOSE a touched partition's
    * surviving rows) is closed — survivors persist in the stage until
    * their rename lands, and a mid-publish crash rolls forward at this
    * job's (or any tf maintenance op's) entry repair. Between a crash
    * and that repair a reader can see a touched partition absent — the
    * same transient `overwriteAtomic` has mid-swap — never lost rows
    * after it. */
  /** The partition-pruned exact deletion EVERY doc-bucketed standing
    * table shares (tf, dl, scores, the feature tables): heal any
    * crashed publish FIRST (a pending committed stage reads as
    * a missing partition otherwise, and its rows would be dropped as
    * forgotten), then rewrite only the forgotten ids' pt buckets — a
    * partition with no survivors stages no rows and is DELETED by the
    * atomic publish; untouched partitions never move. */
  private def deleteDocPartitioned(spark: SparkSession, idsC: DataFrame,
      pts: IndexedSeq[Long], table: String, valueCols: Seq[String]): Unit = {
    graft.operators.MergeWriter.repairPartitionedTable(spark, table, "pt")
    migrateDocBucketed(spark, table)
    tryRead(spark, table).foreach { t0 =>
      val surviving = t0.filter(col("pt").isin(pts: _*))
        .join(idsC, Seq("doc_id"), "left_anti")
        .select((col("doc_id") +: valueCols.map(col))
          :+ col("pt").cast("long").as("pt"): _*)
      graft.operators.MergeWriter.overwritePartitionsAtomic(
        surviving, table, "pt", pts)
    }
  }

  private def forgottenPts(idsC: DataFrame): IndexedSeq[Long] = idsC
    .select(pmod(col("doc_id"), lit(TF_PARTITIONS.toLong)).as("pt"))
    .distinct().collect().map(_.getLong(0)).toIndexedSeq // ≤ TF_PARTITIONS

  def forgetTfState(spark: SparkSession, ids: DataFrame, tfTable: String,
      docTable: String): Unit = {
    val idsC = ids.select(col("doc_id")).distinct().localCheckpoint(true)
    deleteDocPartitioned(spark, idsC, forgottenPts(idsC), tfTable, Seq("tok", "tf"))
    val store = tryRead(spark, docTable).map(_.localCheckpoint(true))
    tombstoneSwap(store, idsC, docTable, "text")
  }

  /** [[forgetTfState]] with the serving-path dl table: dl rows are
    * per-doc and id-granular exactly like tf rows, so the same
    * partition-pruned exact deletion applies — dl first, then the tf
    * deletion and the tombstone swap (still LAST). A crash between
    * re-runs to convergence like every step here. */
  def forgetTfState(spark: SparkSession, ids: DataFrame, tfTable: String,
      dlTable: String, docTable: String): Unit = {
    val idsC = ids.select(col("doc_id")).distinct().localCheckpoint(true)
    val pts = forgottenPts(idsC)
    deleteDocPartitioned(spark, idsC, pts, dlTable, Seq("dl"))
    deleteDocPartitioned(spark, idsC, pts, tfTable, Seq("tok", "tf"))
    val store = tryRead(spark, docTable).map(_.localCheckpoint(true))
    tombstoneSwap(store, idsC, docTable, "text")
  }

  /** [[forgetTfState]] with the tok-bucketed serving projection: the
    * doc-bucketed tables prune to the ids' pt buckets as before; the
    * tok-bucketed copy cannot prune by DOC — but it can prune by the
    * forgotten docs' TOKENS: their tf rows (read pt-pruned from the
    * doc-bucketed source of truth, BEFORE it shrinks — the same
    * derive-from-the-table-that-still-has-it crash discipline as
    * [[forgetDedupState]]'s ghost buckets) name exactly the `tb=`
    * buckets that can hold a forgotten row, because both projections
    * append from the SAME batch tokenize, so the tf table's (doc, tok)
    * pairs always cover the projection's. Only those buckets are read
    * or rewritten — work bounded by the buckets the forgotten tokens
    * select, not the table (a doc whose tokens span all
    * [[TOK_TF_BUCKETS]] buckets degrades to the old full rewrite —
    * the honest worst case). Order: tok projection first (its tb set
    * derives from tf rows the tf deletion destroys), then the
    * doc-bucketed deletions, tombstone swap LAST; a crash anywhere
    * re-runs to convergence (each step is idempotent and its inputs
    * survive until the step after it). */
  def forgetTfState(spark: SparkSession, ids: DataFrame, tfTable: String,
      dlTable: String, tokTfTable: String, docTable: String): Unit = {
    val idsC = ids.select(col("doc_id")).distinct().localCheckpoint(true)
    val pts = forgottenPts(idsC)
    graft.operators.MergeWriter.repairPartitionedTable(spark, tfTable, "pt")
    graft.operators.MergeWriter.repairPartitionedTable(spark, tokTfTable, "tb")
    migrateDocBucketed(spark, tfTable) // a flat legacy table has no pt to prune
    val touchedTbs = tryRead(spark, tfTable) match {
      case Some(tf) =>
        tf.filter(col("pt").isin(pts: _*))
          .join(idsC, Seq("doc_id"), "left_semi")
          .select(tokBucket(col("tok")).cast("long").as("tb")).distinct()
          .collect().map(_.getLong(0)).toIndexedSeq // ≤ TOK_TF_BUCKETS
      case None =>
        // fail LOUDLY, never silently no-op the tok cleanup: the touched
        // tb set derives from the doc-bucketed tf rows, so an unreadable
        // tf table beside a live tok projection would leave the forgotten
        // docs' rows in the SERVING projection forever — unreachable when
        // the both-tables-from-one-tokenize pairing invariant holds, but
        // if it is ever broken this must be an error, not a skipped step
        // (the engine's fail-loud convention)
        require(tryRead(spark, tokTfTable).isEmpty,
          s"forgetTfState: tok projection $tokTfTable exists but the " +
            s"doc-bucketed tf table $tfTable is unreadable — the touched " +
            "tb buckets derive from the tf rows, so the tok cleanup " +
            "cannot run; restore the tf table before forgetting")
        IndexedSeq.empty
    }
    if (touchedTbs.nonEmpty) tryRead(spark, tokTfTable).foreach { t0 =>
      val t = t0.filter(col("tb").isin(touchedTbs: _*)).localCheckpoint(true)
      graft.operators.MergeWriter.overwritePartitionsAtomic(
        t.join(idsC, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("tok"), col("tf"),
            col("tb").cast("long").as("tb")),
        tokTfTable, "tb", touchedTbs)
    }
    deleteDocPartitioned(spark, idsC, pts, dlTable, Seq("dl"))
    deleteDocPartitioned(spark, idsC, pts, tfTable, Seq("tok", "tf"))
    val store = tryRead(spark, docTable).map(_.localCheckpoint(true))
    tombstoneSwap(store, idsC, docTable, "text")
  }

  /** [[compactTf]] over all three tf-family tables: the doc-bucketed
    * pair plus the tok-bucketed serving projection (dedup on
    * (doc_id, tok) under its own layout). */
  def compactTf(spark: SparkSession, tfTable: String, dlTable: String,
      tokTfTable: String): Unit = {
    compactTf(spark, tfTable, dlTable)
    graft.operators.MergeWriter.repairPartitionedTable(spark, tokTfTable, "tb")
    tryRead(spark, tokTfTable).foreach { t0 =>
      val t = t0.localCheckpoint(true)
      val tbs = t.select(col("tb").cast("long")).distinct()
        .collect().map(_.getLong(0)).toIndexedSeq
      graft.operators.MergeWriter.overwritePartitionsAtomic(
        t.select(col("doc_id"), col("tok"), col("tf"),
            col("tb").cast("long").as("tb"))
          .dropDuplicates("doc_id", "tok")
          .repartition(col("tb")),
        tokTfTable, "tb", tbs)
    }
  }

  /** [[compactTf]]'s dl-table sibling: collapse redelivery duplicates
    * per doc and repack, atomic per partition. */
  def compactTf(spark: SparkSession, tfTable: String,
      dlTable: String): Unit = {
    compactTf(spark, tfTable)
    graft.operators.MergeWriter.repairPartitionedTable(spark, dlTable, "pt")
    tryRead(spark, dlTable).foreach { d0 =>
      val d = d0.localCheckpoint(true)
      val pts = d.select(col("pt").cast("long")).distinct()
        .collect().map(_.getLong(0)).toIndexedSeq
      graft.operators.MergeWriter.overwritePartitionsAtomic(
        d.select(col("doc_id"), col("dl"), col("pt").cast("long").as("pt"))
          .dropDuplicates("doc_id")
          .repartition(col("pt")),
        dlTable, "pt", pts)
    }
  }

  /** Compact the tf appends: collapse redelivery duplicates
    * (byte-identical rows — dropping them never destroys replay
    * evidence) and repack each bucket to one file set, preserving the
    * [[TF_PARTITIONS]] layout. Content-preserving and atomic per
    * partition ([[graft.operators.MergeWriter.overwritePartitionsAtomic]]
    * — a mid-publish crash leaves a readable mix of compacted and
    * uncompacted partitions plus a staged remainder the entry repair
    * rolls forward; no row is ever lost). The `partitions` arg is
    * accepted for signature parity with the other compactors but the
    * bucket layout governs. */
  def compactTf(spark: SparkSession, tfTable: String,
      partitions: Int = 8): Unit = {
    graft.operators.MergeWriter.repairPartitionedTable(spark, tfTable, "pt")
    tryRead(spark, tfTable).foreach { t0 =>
      val t = t0.localCheckpoint(true)
      val pts = t.select(col("pt").cast("long")).distinct()
        .collect().map(_.getLong(0)).toIndexedSeq // ≤ TF_PARTITIONS values
      graft.operators.MergeWriter.overwritePartitionsAtomic(
        t.select(col("doc_id"), col("tok"), col("tf"),
            col("pt").cast("long").as("pt"))
          .dropDuplicates("doc_id", "tok")
          .repartition(col("pt")),
        tfTable, "pt", pts)
    }
  }

  /** pp27's continuous twin: CONTINUOUS training-data maintenance for
    * the quality-classifier family. Standing tables: `tstatTable`
    * (per-doc token stats), `mTable` (per-doc (doc, bigram, m) rollup),
    * `labelsTable` (per-doc weak-supervision verdicts) — every row a
    * pure function of its own document (the tf-family additivity:
    * no fold, no delta key, byte-identical redelivery rows the
    * snapshot collapses by doc id), advanced by ONE batch tokenize, so
    * each document's text is scanned once ever. The corpus-level LM
    * behind rare_pm derives AT READ in [[trainingSnapshot]] — stored
    * features would stale on every arrival. Doc store is the guard
    * (appended LAST, text kept for audit). All three tables are
    * [[TF_PARTITIONS]]-bucketed on doc_id from their first write, so
    * [[forgetFeatureState]] rewrites only touched partitions. */
  def maintainFeatureState(batch: DataFrame, tstatTable: String,
      mTable: String, labelsTable: String, docTable: String): Unit = {
    val spark = batch.sparkSession
    // heal any crashed partition publish on all three tables before
    // appending (the tf-family entry contract), then migrate any
    // pre-layout flat table
    Seq(tstatTable, mTable, labelsTable).foreach { t =>
      graft.operators.MergeWriter.repairPartitionedTable(spark, t, "pt")
      migrateDocBucketed(spark, t)
    }
    val fresh = freshAgainst(batch, docTable)
    if (fresh.isEmpty) return
    def bucketed(df: DataFrame) = df.withColumn("pt",
      pmod(col("doc_id"), lit(TF_PARTITIONS.toLong)))
    val (tstat, m) = graft.queries.TextOps.qualityDeltas(fresh)
    bucketed(tstat).write.mode("append").partitionBy("pt").parquet(tstatTable)
    bucketed(m).write.mode("append").partitionBy("pt").parquet(mTable)
    bucketed(graft.queries.TextOps.ruleLabels(fresh))
      .write.mode("append").partitionBy("pt").parquet(labelsTable)
    fresh.write.mode("append").parquet(docTable)
  }

  /** [[maintainFeatureState]] as a foreachBatch sink over a (doc_id,
    * text) document stream. */
  def featureStateStream(docs: DataFrame, tstatTable: String,
      mTable: String, labelsTable: String,
      docTable: String,
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    startMaintainer(docs, checkpoint)((b: DataFrame, _: Long) =>
        maintainFeatureState(b, tstatTable, mTable, labelsTable, docTable))

  /** The current (features, y) training frame under the maintained
    * tables — exactly what ta19's trainer (and
    * [[rebuildClassifierState]]'s refit) consumes: features assembled
    * at read through [[graft.queries.TextOps.qualityFeaturesFrom]]
    * (shared verbatim with the batch path), labels joined doc-keyed.
    * Redelivery duplicates collapse per doc / (doc, bigram). */
  def trainingSnapshot(spark: SparkSession, tstatTable: String,
      mTable: String, labelsTable: String): DataFrame = {
    import org.apache.spark.sql.types._
    val tstat = tryRead(spark, tstatTable).getOrElse(emptyDf(spark,
        "doc_id" -> LongType, "n_tokens" -> LongType,
        "n_distinct" -> LongType, "n_top" -> LongType))
      .drop("pt").dropDuplicates("doc_id")
    val m = tryRead(spark, mTable).getOrElse(emptyDf(spark,
        "doc_id" -> LongType, "bigram" -> StringType, "m" -> LongType))
      .drop("pt").dropDuplicates("doc_id", "bigram")
    val labels = tryRead(spark, labelsTable).getOrElse(emptyDf(spark,
        "doc_id" -> LongType, "y" -> LongType))
      .drop("pt").dropDuplicates("doc_id")
    graft.queries.TextOps.qualityFeaturesFrom(tstat, m)
      .join(labels, Seq("doc_id"))
  }

  /** DELETION PROPAGATION for the training-data family — exact
    * deletion like the tf family's (per-doc rows, never aggregated at
    * rest), with the notable property that the CORPUS-LEVEL effect is
    * still exact: deleting a doc's (doc, bigram) rows changes the LM
    * every OTHER doc's rare_pm is computed against, and because
    * features derive at read, every survivor's features self-repair at
    * the next [[trainingSnapshot]] — no cross-doc repair job at all.
    * All three tables are [[TF_PARTITIONS]]-bucketed on doc_id, so
    * each deletion rewrites ONLY the forgotten ids' partitions
    * (partition-pruned scan, atomic per-partition publish — the tf
    * family's discipline). Text nulled last, same crash contract as
    * [[forgetTfState]]. */
  def forgetFeatureState(spark: SparkSession, ids: DataFrame,
      tstatTable: String, mTable: String, labelsTable: String,
      docTable: String): Unit = {
    val idsC = ids.select(col("doc_id")).distinct().localCheckpoint(true)
    val pts = forgottenPts(idsC)
    deleteDocPartitioned(spark, idsC, pts, tstatTable,
      Seq("n_tokens", "n_distinct", "n_top"))
    deleteDocPartitioned(spark, idsC, pts, mTable, Seq("bigram", "m"))
    deleteDocPartitioned(spark, idsC, pts, labelsTable, Seq("y"))
    val store = tryRead(spark, docTable).map(_.localCheckpoint(true))
    tombstoneSwap(store, idsC, docTable, "text")
  }

  /** Compact the three feature tables: collapse redelivery duplicates
    * (byte-identical per-doc rows) per pt bucket, preserving the
    * partitioned layout [[forgetFeatureState]]'s pruning rests on. */
  def compactFeatures(spark: SparkSession, tstatTable: String,
      mTable: String, labelsTable: String): Unit = {
    compactDocPartitioned(spark, tstatTable, Seq("doc_id"),
      Seq("doc_id", "n_tokens", "n_distinct", "n_top"))
    compactDocPartitioned(spark, mTable, Seq("doc_id", "bigram"),
      Seq("doc_id", "bigram", "m"))
    compactDocPartitioned(spark, labelsTable, Seq("doc_id"),
      Seq("doc_id", "y"))
  }

  /** Incremental document ingest (S1's streaming shape): new files landing
    * in a directory become extraction rows continuously — the reference's
    * "drop new PDFs in the folder and re-run" loop without the re-run. */
  def streamDocuments(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.readStream
      .format("text")
      .option("wholetext", "true")
      .option("pathGlobFilter", "*.pdf")
      .load(dir)
      .withColumn("pdf_name", element_at(split(input_file_name(), "/"), -1))
    // limit -1 keeps trailing empty pages — identical page arrays to the
    // batch TextPassthroughExtractor for the same bytes
    raw.select(col("pdf_name"), split(col("value"), "\f", -1).as("pages"))
  }

  /** Run any of the above to a console/memory sink for N batches — the
    * minimal foreachBatch harness the enrichment stage plugs into
    * (EnrichmentClient inside foreachBatch = the streaming scrape). */
  def runToMemory(df: DataFrame, name: String, outputMode: String = "append")
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
