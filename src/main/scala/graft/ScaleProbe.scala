package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-order-of-magnitude scaling probe for the dedup/clustering and
  * vector gates — the empirical leg under the 100 TB plan-shape arguments
  * (COVERAGE.md records the result table).
  *
  * Generates a deterministic 10× `documents` corpus from sf0.1: ten
  * replicas with shifted doc_ids, replica k ≥ 1 suffixing every token
  * with `_k` — a BIJECTION on the token space, so each replica's shingle
  * sets (and hence within-replica Jaccard, dup pairs, cluster shapes) are
  * exactly sf0.1's while sharing zero shingles across replicas. Duplicate
  * density stays constant and the corpus gets 10× MORE LSH buckets of the
  * same size distribution (the realistic growth regime), not 10×-bigger
  * buckets (the skew regime, which BandJoinSpec covers separately — a
  * shared salt PREFIX was tried first and collapsed short docs into
  * per-replica mega-buckets). Then times the three corpus-shaped gates
  * (dd05 LSH dedup, dd06 dup clusters, pp02 incremental index) at sf0.1
  * and at the 10× corpus and prints the observed scaling factor per
  * gate.
  *
  * Usage: `runMain graft.ScaleProbe [workDir] [baseSfDir] [mode]`
  * (defaults /tmp/graft-sf1 and /root/testdata/sf0.1). Modes: full gate
  * sweep (no mode), `kernels`, `skew`, `repair`, `only=g1,g2`,
  * `recall` (width-rule recall@5 vs the exact kernel), `three` (the
  * 30x third scale point for the headline kernels; optional 4th arg =
  * the 30x work dir, default workDir + "-30x").
  */
object ScaleProbe {

  /** Generate the deterministic `replicas`× corpus (documents +
    * embeddings) under `work` from the sf0.1 tables at `sf01` — the
    * shared generator for this probe (replicas = 10) and
    * [[MaintainerProbe]]'s data-dominant regime (replicas sized so a
    * probe batch is ≥ 20k rows). Idempotent: existing tables are kept
    * (delete the work dir to regenerate at a different factor). */
  def generate(spark: SparkSession, work: String, sf01: String,
      replicas: Int): Unit = {
    val cpus = spark.sparkContext.defaultParallelism
    val docsPath = s"$work/documents.parquet"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(docsPath))) {
      val base = spark.read.parquet(s"$sf01/documents.parquet")
      // the replica id shift must clear the base id space, or replicas
      // collide and every bijection/constant-density invariant the probe's
      // claims rest on silently breaks
      val maxId = base.agg(max(col("doc_id"))).head().getLong(0)
      require(maxId < 10000000L,
        s"replica stride 10M does not clear base doc_id space (max=$maxId)")
      (0 until replicas).map { k =>
        // suffix FILTERED tokens (Text.tokens semantics): suffixing raw
        // split segments would turn empty segments from doubled spaces
        // into real "_k" tokens, breaking the bijection claim for such
        // docs; n_chars recomputed since the rewrite changes lengths
        val text =
          if (k == 0) col("text")
          else array_join(transform(
            filter(split(col("text"), " "), t => t =!= ""),
            t => concat(t, lit(s"_$k"))), " ")
        base.select(
          (col("doc_id") + lit(k.toLong * 10000000L)).as("doc_id"),
          text.as("text"),
          col("lang"), col("source"), length(text).cast("long").as("n_chars"))
      }.reduce(_ unionByName _)
        .repartition(cpus)
        .write.mode("overwrite").parquet(docsPath)
    }

    val embPath = s"$work/embeddings.parquet"
    if (!fs.exists(new org.apache.hadoop.fs.Path(embPath))) {
      val base = spark.read.parquet(s"$sf01/embeddings.parquet")
      val maxVid = base.agg(max(col("vec_id"))).head().getLong(0)
      require(maxVid < 10000000L,
        s"replica stride 10M does not clear base vec_id space (max=$maxVid)")
      // the rotation below slices on the MEASURED dimension: a hardcoded
      // one would silently clamp on a different-width table and the
      // truncated replicas would void the norm/cosine-preservation claim
      val dim = base.agg(max(size(col("embedding")))).head().getInt(0)
      require(base.agg(min(size(col("embedding")))).head().getInt(0) == dim,
        s"ragged embedding widths void the rotation's isometry claim")
      // a rotation by k ≥ dim would wrap and collide with an earlier
      // replica's permutation, voiding the decorrelation claim
      require(replicas <= dim,
        s"replica count $replicas exceeds embedding dim $dim")
      // replica k's vectors are the base CYCLICALLY ROTATED by k
      // dimensions: a common coordinate permutation preserves every norm
      // and every within-replica cosine exactly (each replica's internal
      // neighbor/near-dup structure IS sf0.1's) while decorrelating
      // replicas from each other and from the fixed centroids — constant
      // dup density for dd10, 10× longer inverted lists for the search
      // gates. The centroid (< 8) and query ([10, 20)) id ranges keep
      // selecting only base-replica rows, so the probe measures corpus
      // growth under a FIXED quantizer and query set — the production
      // regime.
      (0 until replicas).map { k =>
        val emb =
          if (k == 0) col("embedding")
          else concat(slice(col("embedding"), k + 1, dim - k),
            slice(col("embedding"), 1, k))
        base.select((col("vec_id") + lit(k.toLong * 10000000L)).as("vec_id"),
          emb.as("embedding"), col("label"))
      }.reduce(_ unionByName _)
        .repartition(cpus)
        .write.mode("overwrite").parquet(embPath)
    }

    // the TPC-H-shaped pair the skew/sketch gates read (q49/q50/pp23):
    // replica k shifts every key column by k·10M — (l_orderkey,
    // l_linenumber) stays unique, and part's p_partkey shifts in
    // lockstep with lineitem's l_partkey, so each replica's join
    // fan-out and per-key row counts are exactly sf0.1's (the same
    // constant-density regime as the documents bijection; the
    // value columns are untouched, so per-group sums scale by exactly
    // the replica count)
    val liPath = s"$work/lineitem.parquet"
    if (!fs.exists(new org.apache.hadoop.fs.Path(liPath))) {
      val base = spark.read.parquet(s"$sf01/lineitem.parquet")
      val maxKey = base.agg(greatest(max(col("l_orderkey")),
        max(col("l_partkey")), max(col("l_suppkey")))).head().getLong(0)
      require(maxKey < 10000000L,
        s"replica stride 10M does not clear lineitem key space (max=$maxKey)")
      (0 until replicas).map { k =>
        val shift = lit(k.toLong * 10000000L)
        base.withColumn("l_orderkey", col("l_orderkey") + shift)
          .withColumn("l_partkey", col("l_partkey") + shift)
          .withColumn("l_suppkey", col("l_suppkey") + shift)
      }.reduce(_ unionByName _)
        .repartition(cpus)
        .write.mode("overwrite").parquet(liPath)
    }
    val partPath = s"$work/part.parquet"
    if (!fs.exists(new org.apache.hadoop.fs.Path(partPath))) {
      val base = spark.read.parquet(s"$sf01/part.parquet")
      val maxKey = base.agg(max(col("p_partkey"))).head().getLong(0)
      require(maxKey < 10000000L,
        s"replica stride 10M does not clear part key space (max=$maxKey)")
      (0 until replicas).map { k =>
        base.withColumn("p_partkey", col("p_partkey") + lit(k.toLong * 10000000L))
      }.reduce(_ unionByName _)
        .repartition(cpus)
        .write.mode("overwrite").parquet(partPath)
    }
  }

  /** One split-repair measurement at `dir`'s corpus: build fresh
    * standing dedup state, time [[graft.streaming.Streams
    * .repairClusterSplits]] against a FIXED 500-doc base-replica forget
    * set (identical at every scale — the replicas share no shingles, so
    * the touched components are too), then time the two deployment
    * alternatives over the survivors: the bare dd06 recluster kernel
    * (min-of-3, no writes) and the TRUE from-scratch state ingest
    * (writes included — what ForgetStateSpec equates the repair
    * against). Repair is timed once per scale against fresh state (a
    * re-run is a no-op by design). Returns (repair s, recluster s,
    * ingest s). */
  private def repairRow(spark: SparkSession, dir: String): (Double, Double, Double) = {
    import graft.streaming.Streams
    val root = java.nio.file.Files.createTempDirectory("repair-probe").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    Streams.maintainDedupState(docs, s"$root/index", s"$root/pairs",
      s"$root/shingles", s"$root/labels", s"$root/buckets",
      s"$root/remap", s"$root/docs")
    val ids = docs
      .filter(pmod(col("doc_id"), lit(120L)) === 0L && col("doc_id") < 10000000L)
      .select(col("doc_id")).localCheckpoint(true)
    val t0 = System.nanoTime()
    Streams.repairClusterSplits(spark, ids, s"$root/index",
      s"$root/labels", s"$root/buckets", s"$root/remap")
    val rt = (System.nanoTime() - t0) / 1e9
    val survivors = docs.join(ids, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    def once(): Double = {
      val t = System.nanoTime()
      graft.queries.TextOps.dupClusters(survivors)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t) / 1e9
    }
    once() // warm
    val ft = (1 to 3).map(_ => once()).min
    // the TRUE deployment alternative: rebuild the standing state
    // from scratch over the survivors (what ForgetStateSpec equates
    // the repair against) — ingest into fresh tables, writes included
    val root2 = java.nio.file.Files.createTempDirectory("repair-ref").toString
    val t1 = System.nanoTime()
    Streams.maintainDedupState(survivors, s"$root2/index", s"$root2/pairs",
      s"$root2/shingles", s"$root2/labels", s"$root2/buckets",
      s"$root2/remap", s"$root2/docs")
    val it = (System.nanoTime() - t1) / 1e9
    // blanket block sweep only once the row's frames are all spent —
    // a mid-row sweep would destroy ids'/survivors' checkpoint blocks
    // while still referenced (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    (rt, ft, it)
  }

  /** vs04's Q=1000 kernel — the WIDTH rule's regime: LSH cost is hashing
    * (N × tables × bits) + probing (Q × tables × N / 2^bits); a
    * query-heavy workload (near-dup sweeps probe with every row) is
    * probe-dominated, where fixed bits leaves the probe term linear in
    * the corpus and autoBits holds it flat. One timed run, noop sink. */
  private def lshQ1000(spark: SparkSession, dir: String, auto: Boolean): Double = {
    import graft.operators.Ann
    val t0 = System.nanoTime()
    val e = graft.Tables.embeddings(spark, dir)
    val bits = if (auto) Ann.autoBits(e.count(), targetBucket = 16L) else 4
    Ann.lshTopK(e.filter(col("vec_id") < 1000), e, "vec_id", "embedding",
        k = 5, bits = bits, tables = 8)
      .write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    dt
  }

  /** q50's kernel under a DELIBERATELY skewed hot key — half the big
    * side's rows collapse onto ONE join key, broadcast disabled (the
    * regime the salt exists for: dimension too big to broadcast, AQE's
    * skew split unavailable). One timed run, noop sink; the conf knobs
    * are restored afterward. */
  private def saltedHotJoin(spark: SparkSession, dir: String, salted: Boolean,
      aqeSkew: Boolean): Double = {
    import graft.operators.Salting
    val kv = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> aqeSkew.toString)
    val prior = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val hot = graft.queries.QueryUtils.hex8(
        concat(lit("hot:"), col("l_orderkey").cast("string"), lit(":"),
          col("l_linenumber").cast("string"))) % 2 === 0
      val big = graft.Tables.lineitem(spark, dir).select(
        when(hot, lit(7L)).otherwise(col("l_partkey")).as("pk"),
        col("l_extendedprice"), col("l_discount"))
      val small = graft.Tables.part(spark, dir)
        .select(col("p_partkey").as("pk"), col("p_brand"))
      val t0 = System.nanoTime()
      val joined =
        if (salted) Salting.saltedJoin(big, small, "pk", salts = 8)
        else big.join(small, Seq("pk"))
      joined.groupBy(col("p_brand"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"), count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      dt
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/graft-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sf01 = args.lift(1).getOrElse("/root/testdata/sf0.1")
    // "kernels" re-measures only the companion rows (the nlist ∝ N /
    // minHits bounding measurements) without the full gate sweep;
    // "only=g1,g2" measures just the named gates (incremental table
    // refresh after a new gate ships) and skips the kernel rows
    val kernelsOnly = args.lift(2).contains("kernels")
    // "skew" runs ONLY the skewed-hot-key join rows at the end (they are
    // the newest and by far the cheapest kernel block — an iteration
    // mode, like only= for gates); "repair" runs ONLY the split-repair
    // rows (they build their own standing dedup state, which no other
    // block shares)
    val skewOnly = args.lift(2).contains("skew")
    val repairOnly = args.lift(2).contains("repair")
    // "recall": recall@5 vs the vs01 exact kernel for the LSH width rule
    // (r17 verdict item 3 — the width rule's recall got only prose);
    // "three": the THIRD scale point (30x) for the headline kernels —
    // every COVERAGE exponent was a two-point fit that cannot see a knee
    val recallOnly = args.lift(2).contains("recall")
    val threeOnly = args.lift(2).contains("three")
    val only: Option[Set[String]] = args.lift(2)
      .filter(_.startsWith("only="))
      .map(_.stripPrefix("only=").split(",").filter(_.nonEmpty).toSet)
    generate(spark, work, sf01, replicas = 10)

    // the documents-shaped gates, then the embeddings-shaped gates (both
    // tables are replicated above, so every listed gate sees real 10×
    // input in the work dir)
    // mm04/pp19 are deliberately NOT in this sweep: the replica
    // generator collides band values by construction (uncapped pair
    // volume is Σ|bucket|² — measured 28.5M pairs / 2.6 min at a 6×
    // corpus), so the 10× uncapped gate is minutes-per-run cost-model
    // noise; the capped kernel row below measures the production
    // configuration, and the MaintainerProbe's capped perc column
    // measures the incremental leg.
    val gates = Seq("dd05_lsh_dedup", "dd06_dup_clusters",
      "dd14_canonical_keep", "pp15_incremental_canonical", "mm03_binary_dedup",
      "mm05_chunk_dedup", "pp21_incremental_chunks",
      "dd15_norm_dedup", "pp17_incremental_dedup", "sa06_epoch_upsample",
      "sa09_weighted_sample", "ta15_quality_classifier", "ta16_rule_filter",
      "pp02_incremental_index", "pp04_incremental_clusters", "dd09_span_dedup",
      "pp06_incremental_spans", "pp07_incremental_vocab", "pp13_incremental_lm",
      "ta12_lm_quality_filter", "ta13_tfidf_terms", "ta14_bpe_encode",
      "sa05_temperature_resample",
      "pp16_incremental_mix",
      "pp09_incremental_containment", "dd11_containment",
      "dd13_containment_index", "pp12_incremental_containment_index",
      "vs04_ann_lsh", "vs26_ann_lsh_auto", "vs27_lsh_recall",
      "pp38_incremental_lsh",
      "vs06_ivf_search", "vs12_range_search", "vs13_knn_graph",
      "vs14_knn_graph_probe2",
      "vs07_kmeans_step",
      "vs11_kmeans_rebuild",
      "pp05_incremental_ivf", "dd10_semantic_dedup", "pp10_incremental_semdedup",
      "vs08_pq_search", "vs09_ivfpq_search", "vs10_ivf_rerank",
      "pp14_incremental_pq", "vs15_sq_search", "pp20_incremental_sq",
      "vs16_pq_train",
      // round-15 refresh: everything shipped since the round-9 sweep —
      // the retrieval/scoring pair, the classifier trainer, the whole
      // sketch family (incl. the RESCAN-DEFAULT heavy hitters — the r13
      // materialization trade measured at 10× for the first time), the
      // budget/knn/sketch maintainers, the composites, and the
      // vs17-vs22 quantization lifecycle
      "ta17_ref_perplexity", "ta18_bm25_topk", "ta19_classifier_train",
      "ta20_cms_counts", "ta21_cms_heavy_hitters", "ta22_mg_heavy_hitters",
      "ta23_hll_distinct", "ta24_quantile_sketch",
      "ta25_quantile_sketch_double", "sa10_token_budget_mix",
      "pp18_incremental_bpe", "pp22_incremental_budget",
      // the lineitem-shaped family (round 17: the replica generator now
      // produces lineitem+part, closing the one gate family that had no
      // at-scale evidence): the salted skew operators and the KMV
      // advance — the dedicated skewed-hot-key rows below measure what
      // the salt BUYS; these rows measure that the gates themselves
      // scale
      "q49_salted_agg", "q50_salted_join", "pp23_incremental_sketch",
      "pp24_incremental_knn_graph",
      // round-18: the cell-routed ingest path — the router regroups (one
      // assignment pass + bounded flush bookkeeping), so its growth
      // should track pp24's advance, not the full rescan
      "pp39_cell_routed_graph",
      "pp25_incremental_perplexity", "pp26_incremental_bm25",
      "pp27_incremental_classifier", "pp28_incremental_opq",
      "pp29_incremental_cms", "pp30_incremental_heavy",
      "pp31_incremental_hll", "pp32_incremental_quantile",
      "pp35_incremental_quantile_double",
      "pp33_incremental_pipeline", "pp34_incremental_multimodal",
      "vs17_pq_trained_search", "vs18_ivfpq_residual", "vs19_graph_search",
      "vs20_filtered_ann", "vs21_opq_train", "vs22_opq_search",
      // the auto-sized kNN graph: the gate whose quantizer GROWS with the
      // corpus (nlist = ceil(N/40)), so unlike vs13's fixed-8 row this
      // one should hold the companion kernels' sublinear band by default
      "vs23_knn_graph_auto",
      // round-16: the auto-sized compositions of the two rows that were
      // still superlinear under the fixed-nlist graph build (vs19 0.88,
      // pp24 0.75 in the r15 table) — vs19/pp24 stay in the sweep as the
      // fixed-quantizer contrast — plus SemDedup's auto-sized gate
      // beside dd10's fixed row
      "vs24_graph_search_auto", "pp36_incremental_knn_graph_auto",
      "dd16_semantic_dedup_auto", "vs25_knn_graph_probe2_auto",
      // the leakage-safe split: dd06's clustering + a row-local label
      // fold, so it should track dd06's row within overhead; its
      // incremental twin should likewise track pp04's
      "sa11_leakage_safe_split", "pp37_incremental_split")
    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      graft.queries.Catalog.byName(name).fn(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // drop the run's localCheckpoint blocks (same reason as Bench)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      dt
    }
    // repairClusterSplits' component-local cost bound, measured (the
    // run-rarely exact split repair): the SAME fixed 500-doc forget set
    // (base-replica ids — present at both scales, and the replicas share
    // no shingles, so the touched components are IDENTICAL at both
    // scales) against a standing dedup state built over sf0.1 and over
    // the 10× corpus. The claim under test: repair work is bounded by
    // the touched components' size, never the corpus — its row should
    // stay ~flat across the 10× while the from-scratch recluster of the
    // survivors (the O(corpus) alternative a deployment would otherwise
    // run) grows with the table. Repair is timed once per scale against
    // fresh state (a re-run is a no-op by design — nothing left to
    // repair); the recluster row is min-of-3 on the same survivors.
    if (repairOnly) {
      def row(dir: String) = repairRow(spark, dir)
      val (r1, f1, i1) = row(sf01) // sf0.1 first: its run is also the JIT warm
      val (r2, f2, i2) = row(work)
      println("| gate | sf0.1 s | 10x corpus s | ratio | exponent |")
      println("|---|---|---|---|---|")
      println(f"| split repair @ fixed 500-doc forget | $r1%.2f | $r2%.2f | ${r2 / r1}%.2f | ${math.log10(r2 / r1)}%.2f |")
      println(f"| dd06 recluster kernel over survivors (no writes) | $f1%.2f | $f2%.2f | ${f2 / f1}%.2f | ${math.log10(f2 / f1)}%.2f |")
      println(f"| from-scratch state ingest of survivors | $i1%.2f | $i2%.2f | ${i2 / i1}%.2f | ${math.log10(i2 / i1)}%.2f |")
      spark.stop(); return
    }

    // RECALL for the LSH width rule (r17 verdict item 3): autoBits holds
    // the expected bucket constant, but longer codes lower the per-table
    // probability that a TRUE neighbor shares all `bits` sign bits —
    // growing the width trades flat probe cost for recall, which only a
    // measurement can price. Reference = the vs01 exact kernel
    // (Ann.bruteTopK — same integer-quantized scoring, deterministic
    // ties), 100 queries, k = 5, tables = 8 (the vs04 gate geometry).
    if (recallOnly) {
      import graft.operators.Ann
      def recallAt(dir: String, bitsOf: Long => Int, mb: Option[Int],
          tables: Int): (Double, Double, Int) = {
        val e = graft.Tables.embeddings(spark, dir)
        val q = e.filter(col("vec_id") < 100)
        val bits = bitsOf(e.count())
        def topSets(d: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
          d.select(col("query_id"), col("neighbor_id")).collect()
            .map(r => (r.getLong(0), r.getLong(1)))
            .groupBy(_._1).map { case (qid, v) => qid -> v.map(_._2).toSet }
        val exact = topSets(Ann.bruteTopK(q, e, "vec_id", "embedding", k = 5))
        val t0 = System.nanoTime()
        val got = topSets(Ann.lshTopK(q, e, "vec_id", "embedding", k = 5,
          bits = bits, tables = tables, maxBucket = mb))
        val dt = (System.nanoTime() - t0) / 1e9
        val rec = exact.toSeq.map { case (qid, ex) =>
          got.getOrElse(qid, Set.empty).intersect(ex).size.toDouble / ex.size
        }
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        (rec.sum / rec.size, dt, bits)
      }
      // the trade under measurement: per-table, a true neighbor collides
      // with probability ~prod over bits of P(sign agrees), so RECALL
      // falls as bits grow and is bought back by tables (1-(1-p)^T). The
      // aggressive Q=1000-kernel width (target 16) prices the probe term
      // flat but should show the recall bill; the production DEFAULT
      // (target 4096) grows bits much more slowly; doubling tables at
      // the aggressive width measures the documented buy-back.
      val configs: Seq[(String, Long => Int, Option[Int], Int)] = Seq(
        ("fixed 4 bits, tables 8", _ => 4, None, 8),
        ("autoBits target 4096 (production default), tables 8",
          n => Ann.autoBits(n), None, 8),
        ("autoBits target 16, tables 8",
          n => Ann.autoBits(n, targetBucket = 16L), None, 8),
        ("autoBits target 16, tables 16",
          n => Ann.autoBits(n, targetBucket = 16L), None, 16),
        ("autoBits target 16 + maxBucket 256, tables 8",
          n => Ann.autoBits(n, targetBucket = 16L), Some(256), 8))
      // optional 4th arg: a third corpus dir (the `three` mode's 30x)
      // for a recall point beyond 10x — the width grows another step
      // there, so the decay gets its own third scale point
      val extra = args.lift(3)
      println("| config | sf0.1 bits | sf0.1 recall@5 | sf0.1 s | 10x bits | 10x recall@5 | 10x s |" +
        (if (extra.isDefined) " 30x bits | 30x recall@5 | 30x s |" else ""))
      println("|---|---|---|---|---|---|---|" + (if (extra.isDefined) "---|---|---|" else ""))
      for ((label, bo, mb, tb0) <- configs) {
        recallAt(sf01, bo, mb, tb0) // warm
        val (ra, ta, ba) = recallAt(sf01, bo, mb, tb0)
        val (rb, tb, bb) = recallAt(work, bo, mb, tb0)
        val tail = extra.map { d =>
          val (rc, tc, bc) = recallAt(d, bo, mb, tb0)
          f" $bc | $rc%.3f | $tc%.2f |"
        }.getOrElse("")
        println(f"| $label | $ba | $ra%.3f | $ta%.2f | $bb | $rb%.3f | $tb%.2f |" + tail)
      }
      spark.stop(); return
    }

    // THIRD SCALE POINT (r17 verdict item 2): a 30x corpus beside sf0.1
    // and 10x for the headline kernels, so each exponent is a LEAST-
    // SQUARES FIT over three points instead of a two-point interpolation
    // that cannot see a knee. 30x, not 100x: the embedding replica
    // rotation needs replicas <= dim (64), and generate() already
    // enforces it loudly.
    if (threeOnly) {
      val work30 = args.lift(3).getOrElse(s"$work-30x")
      generate(spark, work30, sf01, replicas = 30)
      def fit(pts: Seq[(Double, Double)]): Double = {
        val xs = pts.map(p => math.log10(p._1))
        val ys = pts.map(p => math.log10(p._2))
        val xm = xs.sum / xs.size; val ym = ys.sum / ys.size
        xs.zip(ys).map { case (x, y) => (x - xm) * (y - ym) }.sum /
          xs.map(x => (x - xm) * (x - xm)).sum
      }
      println("| kernel | sf0.1 s | 10x s | 30x s | r(10/1) | r(30/10) | LS exponent |")
      println("|---|---|---|---|---|---|---|")
      def report(label: String, f: String => Double,
          reps: Int = 2): Unit = {
        // warm at the smallest scale only — each 30x run is expensive and
        // the first sf0.1 run carries the codegen/JIT cost
        f(sf01)
        val t1 = (1 to reps).map(_ => f(sf01)).min
        val t2 = (1 to reps).map(_ => f(work)).min
        val t3 = (1 to reps).map(_ => f(work30)).min
        val e = fit(Seq((1.0, t1), (10.0, t2), (30.0, t3)))
        println(f"| $label | $t1%.2f | $t2%.2f | $t3%.2f | ${t2 / t1}%.2f | ${t3 / t2}%.2f | $e%.2f |")
      }
      report("vs04 kernel @ Q=1000, autoBits target 16",
        d => lshQ1000(spark, d, auto = true))
      report("q50 kernel @ hot key 50%, salted x8, no AQE skew",
        d => saltedHotJoin(spark, d, salted = true, aqeSkew = false))
      report("pp38_incremental_lsh gate", d => run("pp38_incremental_lsh", d))
      report("dd06_dup_clusters gate", d => run("dd06_dup_clusters", d))
      // the auto-sized pair-kernel family at its third point: these are
      // the rows whose 100-TB claim IS the sizing rule (Sigma|cell|^2
      // held ~N*target), so a knee here would matter most
      report("vs23_knn_graph_auto gate", d => run("vs23_knn_graph_auto", d))
      report("dd16_semantic_dedup_auto gate",
        d => run("dd16_semantic_dedup_auto", d))
      // the split repair is timed ONCE per scale against fresh standing
      // state (a re-run is a no-op by design — see repairRow); its
      // companion rows ride along for the same three points
      val (ra, fa, ia) = repairRow(spark, sf01)
      val (rb, fb, ib) = repairRow(spark, work)
      val (rc, fc, ic) = repairRow(spark, work30)
      def rrow(label: String, t1: Double, t2: Double, t3: Double): Unit =
        println(f"| $label | $t1%.2f | $t2%.2f | $t3%.2f | ${t2 / t1}%.2f | ${t3 / t2}%.2f | ${fit(Seq((1.0, t1), (10.0, t2), (30.0, t3)))}%.2f |")
      rrow("split repair @ fixed 500-doc forget", ra, rb, rc)
      rrow("dd06 recluster kernel over survivors (no writes)", fa, fb, fc)
      rrow("from-scratch state ingest of survivors", ia, ib, ic)
      spark.stop(); return
    }

    // warm both scales once so codegen/JIT lands outside the measurement
    if (!kernelsOnly && !skewOnly) {
      val sweep = only.map(o => gates.filter(o)).getOrElse(gates)
      // a misspelled name must fail loudly, not silently shrink the
      // refresh — the operator records the printed rows as "measured"
      only.foreach { o =>
        val missing = o -- gates.toSet
        require(missing.isEmpty,
          s"only= names not in the gate list: ${missing.mkString(", ")}")
      }
      require(sweep.nonEmpty, s"only= filter matched no gate: $only")
      sweep.foreach { g => run(g, sf01); run(g, work) }
      println("| gate | sf0.1 s | 10x corpus s | ratio | exponent |")
      println("|---|---|---|---|---|")
      for (g <- sweep) {
        val a = (1 to 3).map(_ => run(g, sf01)).min
        val b = (1 to 3).map(_ => run(g, work)).min
        val ratio = b / a
        val expn = math.log10(ratio) // growth 10× ⇒ exponent = log10(ratio)
        println(f"| $g | $a%.2f | $b%.2f | $ratio%.2f | $expn%.2f |")
      }
    } else {
      println("| gate | sf0.1 s | 10x corpus s | ratio | exponent |")
      println("|---|---|---|---|---|")
    }
    // (the skew block at the end runs in every non-only= mode)

    // an only= refresh wants just its named gate rows — the kernel
    // companions below are re-measured by full or "kernels" runs
    if (only.isDefined) { spark.stop(); return }

    // the kNN-graph kernels under the production sizing rule: the GATES
    // (vs13/vs14) pin fixed-quantizer semantics, under which Σ|cell|²
    // grows ~N²/nlist — super-linear BY THE COST MODEL at fixed nlist
    // (the same structural fact as dd10's round-7 cautionary row, on the
    // all-pairs composition where it is loudest: every vector is a
    // query). Production sizes nlist ∝ N (constant target cell size),
    // which bounds the nProbe=1 graph's pair volume at Σ|cell|² ∝ N and
    // the nProbe=2 graph's at ≤ 2× that — these rows measure exactly
    // that configuration (8 cells at sf0.1 → 80 at 10×).
    if (!skewOnly) {
      import graft.queries.VectorOps.{assignCells, knnGraph, knnGraph2, normed}
      def knnAt(dir: String, nlist: Int, probe2: Boolean): Double = {
        val t0 = System.nanoTime()
        val e = normed(graft.Tables.embeddings(spark, dir))
        val cents = e.filter(col("vec_id") < nlist)
          .select(col("vec_id").as("cid"), col("q").as("cq"), col("nrm").as("cn"))
        val g = if (probe2) knnGraph2(assignCells(e, cents), cents, k = 3)
                else knnGraph(assignCells(e, cents), k = 3)
        g.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        dt
      }
      for (probe2 <- Seq(false, true)) {
        knnAt(sf01, 8, probe2); knnAt(work, 80, probe2) // warm
        val a = (1 to 3).map(_ => knnAt(sf01, 8, probe2)).min
        val b = (1 to 3).map(_ => knnAt(work, 80, probe2)).min
        val label = if (probe2) "vs14 kernel" else "vs13 kernel"
        println(f"| $label @ nlist prop. N (8->80 cells) | $a%.2f | $b%.2f | ${b / a}%.2f | ${math.log10(b / a)}%.2f |")
      }
    }

    // dd10's kernel under the production sizing rule the fixed-quantizer
    // row motivates: constant target CELL SIZE (nlist ∝ N — 8 cells at
    // sf0.1 → 80 at 10×), which keeps Σ|cell|² = N²/nlist ∝ N. (The
    // search-side √N heuristic is not enough for the pairwise stage:
    // N²/√N = N^1.5.) A different nlist is a different — equally valid —
    // drop list, so this row times the kernel; the GATE pins
    // fixed-quantizer semantics.
    if (!skewOnly) {
      import graft.queries.VectorOps.{assignCells, normed, semanticDrops}
      def dd10At(dir: String, nlist: Int): Double = {
        val t0 = System.nanoTime()
        val e = normed(graft.Tables.embeddings(spark, dir))
        val cents = e.filter(col("vec_id") < nlist)
          .select(col("vec_id").as("cid"), col("q").as("cq"), col("nrm").as("cn"))
        semanticDrops(assignCells(e, cents), tau = 0.30)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        dt
      }
      dd10At(sf01, 8); dd10At(work, 80) // warm
      val a = (1 to 3).map(_ => dd10At(sf01, 8)).min
      val b = (1 to 3).map(_ => dd10At(work, 80)).min
      // ASCII only: the sbt console's default encoding mangles ∝/→
      println(f"| dd10 kernel @ nlist prop. N (8->80 cells) | $a%.2f | $b%.2f | ${b / a}%.2f | ${math.log10(b / a)}%.2f |")
    }

    // pp10's advance kernel under the same production rule: the GATE's
    // 4-5x ratio deliberately shares dd10's fixed-quantizer regime (8
    // cells, batch = 20% OF the corpus, every cell touched), so this row
    // isolates what the sizing rule buys the INCREMENTAL leg — same
    // 80/20 split, nlist prop. N. The remaining growth is the batch
    // itself growing with the corpus (a production batch is fixed-size).
    if (!skewOnly) {
      import graft.queries.VectorOps.{assignCells, normed, semDedupAdvance}
      def pp10At(dir: String, nlist: Int): Double = {
        val t0 = System.nanoTime()
        val e = normed(graft.Tables.embeddings(spark, dir))
        val cents = e.filter(col("vec_id") < nlist)
          .select(col("vec_id").as("cid"), col("q").as("cq"), col("nrm").as("cn"))
        val isNew = graft.queries.QueryUtils.hex8(
          concat(lit("sem:"), col("vec_id").cast("string"))) % 5 === 0
        val standing = assignCells(e.filter(!isNew), cents).localCheckpoint(true)
        val newCells = assignCells(e.filter(isNew), cents).localCheckpoint(true)
        semDedupAdvance(standing, newCells, tau = 0.30)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        dt
      }
      pp10At(sf01, 8); pp10At(work, 80) // warm
      val a = (1 to 3).map(_ => pp10At(sf01, 8)).min
      val b = (1 to 3).map(_ => pp10At(work, 80)).min
      println(f"| pp10 advance @ nlist prop. N (8->80 cells) | $a%.2f | $b%.2f | ${b / a}%.2f | ${math.log10(b / a)}%.2f |")
    }

    // dd13's kernel at minHits = 1 — the recall-MAXIMAL candidacy the
    // gate (minHits = 2) trades away: every pair sharing even one
    // bottom-k probe hash is verified. On this corpus — which has no
    // boilerplate skew for the df cap to bite on (max shingle df = 25)
    // — single-shared-shingle coincidences dominate that volume, which
    // is why the production gate requires two hits (recall for true
    // containment is identical: a contained doc's EVERY probe hash hits
    // its container).
    if (!skewOnly) {
      def dd13At(dir: String, m: Int): Double = {
        val t0 = System.nanoTime()
        graft.queries.TextOps.containmentIndex(
            graft.Tables.documents(spark, dir), probeK = 8, maxDf = None,
            minHits = m)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        dt
      }
      dd13At(sf01, 1); dd13At(work, 1) // warm
      val a = (1 to 3).map(_ => dd13At(sf01, 1)).min
      val b = (1 to 3).map(_ => dd13At(work, 1)).min
      println(f"| dd13 kernel @ minHits 1 (recall-maximal) | $a%.2f | $b%.2f | ${b / a}%.2f | ${math.log10(b / a)}%.2f |")
    }

    // mm04's kernel under the hot-bucket cap — the production knob the
    // GATE (uncapped, the completeness contract) deliberately omits.
    // This corpus is the cap's worst-case motivator: the replicas
    // collide on band values by construction, so uncapped candidate
    // volume grows ~Σ|bucket|² while the capped row bounds it at
    // corpus × cap.
    if (!skewOnly) {
      import graft.operators.Multimodal
      def mm04At(dir: String, mb: Option[Int]): Double = {
        val t0 = System.nanoTime()
        val sigs = Multimodal.perceptualSigs(
            graft.Tables.documents(spark, dir)
              .withColumn("blob", encode(col("text"), "UTF-8")),
            "doc_id", "blob").localCheckpoint(true)
        Multimodal.perceptualPairs(sigs, "doc_id",
            Multimodal.completeTau, maxBucket = mb)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        dt
      }
      mm04At(sf01, Some(256)); mm04At(work, Some(256)) // warm
      val a = (1 to 3).map(_ => mm04At(sf01, Some(256))).min
      val b = (1 to 3).map(_ => mm04At(work, Some(256))).min
      println(f"| mm04 kernel @ maxBucket 256 (hot-bucket cap) | $a%.2f | $b%.2f | ${b / a}%.2f | ${math.log10(b / a)}%.2f |")
    }

    // vs04's kernel under ITS hot-bucket cap — the same production knob
    // mm04's row measures, on the search side: the GATE (uncapped) pays
    // Σ_query Σ_table |its bucket|, which grows linearly with the corpus
    // at 4 bits (16 buckets per table — every bucket ~N/16); the capped
    // row bounds scored pairs at Q × tables × cap via the deterministic
    // per-bucket sample, so the remaining growth is the candidate-side
    // hashing scan itself. Recall trade documented at Ann.lshTopK.
    if (!skewOnly) {
      import graft.operators.Ann
      def vs04At(dir: String, mb: Option[Int]): Double = {
        val t0 = System.nanoTime()
        val e = graft.Tables.embeddings(spark, dir)
        Ann.lshTopK(e.filter(col("vec_id") < 10), e, "vec_id", "embedding",
            k = 5, bits = 4, tables = 8, maxBucket = mb)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        dt
      }
      vs04At(sf01, Some(256)); vs04At(work, Some(256)) // warm
      val a = (1 to 3).map(_ => vs04At(sf01, Some(256))).min
      val b = (1 to 3).map(_ => vs04At(work, Some(256))).min
      println(f"| vs04 kernel @ maxBucket 256 (hot-bucket cap) | $a%.2f | $b%.2f | ${b / a}%.2f | ${math.log10(b / a)}%.2f |")

      // the WIDTH rule (vs26's production shape) in the regime it exists
      // for: LSH cost is hashing (N × tables × bits) + probing
      // (Q × tables × N / 2^bits). The GATE's Q = 10 is hashing-dominated
      // — there the extra planes only cost (the vs26 gate row measures
      // that honestly) — but a production search workload is query-heavy
      // (near-dup sweeps probe with EVERY row), where the probe term is
      // the one that scales. At Q = 1000, fixed 4 bits leaves the probe
      // term ∝ Q·N/16 (linear in the corpus, quadratic when Q ∝ N);
      // autoBits holds the expected bucket at 16, so the probe term
      // stays ∝ Q·target flat and only the N·bits hashing grows.
      def vs04QAt(dir: String, auto: Boolean): Double = lshQ1000(spark, dir, auto)
      for (auto <- Seq(false, true)) {
        vs04QAt(sf01, auto); vs04QAt(work, auto) // warm
        val aa = (1 to 3).map(_ => vs04QAt(sf01, auto)).min
        val bb = (1 to 3).map(_ => vs04QAt(work, auto)).min
        val label = if (auto) "vs04 kernel @ Q=1000, autoBits target 16"
                    else "vs04 kernel @ Q=1000, fixed 4 bits"
        println(f"| $label | $aa%.2f | $bb%.2f | ${bb / aa}%.2f | ${math.log10(bb / aa)}%.2f |")
      }
    }

    // pp12's advance kernel in the PRODUCTION regime: fixed-size batch
    // (the base replica's 20% draw — identical rows at both scales)
    // against a standing store that carries everything else, at the
    // gate's production minHits = 2. The GATE's 80/20 split grows the
    // batch 10× with the corpus (its 0.74 exponent is mostly the batch),
    // so this row isolates what corpus growth costs a FIXED batch: the
    // only standing-sized reads are the probe-table semi-join (k rows
    // per doc, pruned to the batch's hash set) and the candidate pairs'
    // own shingle reads.
    if (!skewOnly) {
      import graft.queries.{QueryUtils, TextOps}
      def pp12At(dir: String): Double = {
        val docs = graft.Tables.documents(spark, dir)
        val isBatch = QueryUtils.hex8(
          concat(lit("inc:"), col("doc_id").cast("string"))) % 5 === 0 &&
          col("doc_id") < 10000000L
        // standing state derived OUTSIDE the timer (a deployment reads it
        // from parquet); eager checkpoints so the clock starts at real rows
        val standStore = TextOps.containmentStore(docs.filter(!isBatch))
          .localCheckpoint(true)
        val standProbes = TextOps.bottomKProbes(
            standStore.select(col("doc_id"), col("h")).distinct(), 8)
          .localCheckpoint(true)
        val t0 = System.nanoTime()
        TextOps.containmentIndexAdvance(standStore, standProbes,
            docs.filter(isBatch), probeK = 8, minHits = 2)
          .pairs.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        dt
      }
      pp12At(sf01); pp12At(work) // warm
      val a = (1 to 3).map(_ => pp12At(sf01)).min
      val b = (1 to 3).map(_ => pp12At(work)).min
      println(f"| pp12 advance @ fixed-size batch, minHits 2 | $a%.2f | $b%.2f | ${b / a}%.2f | ${math.log10(b / a)}%.2f |")
    }

    // q50's salt under a DELIBERATELY skewed hot key — the measurement
    // the gate cannot make (its oracle-pinned input is TPC-H-uniform):
    // half the big side's rows collapse onto ONE join key, in the
    // regime the salt exists for (dimension too big to broadcast, AQE's
    // skew split unavailable — a shuffled-hash build side, or any
    // engine without it). Unsalted, the hot key's entire probe side
    // lands on ONE reducer — a straggler carrying 50% of the corpus
    // single-threaded; salted, it spreads over 8. Three rows: the
    // unsalted straggler, the salted plan (the win the VERDICT asked to
    // see measured), and unsalted-with-AQE-skew-split as the honest
    // contrast — AQE covers this case for sort-merge joins, the salt is
    // the explicit tool for the plans AQE can't split.
    {
      def skewAt(dir: String, salted: Boolean, aqeSkew: Boolean): Double =
        saltedHotJoin(spark, dir, salted, aqeSkew)
      for ((label, salted, aqeSkew) <- Seq(
          ("q50 kernel @ hot key 50%, UNSALTED, no AQE skew", false, false),
          ("q50 kernel @ hot key 50%, salted x8, no AQE skew", true, false),
          ("q50 kernel @ hot key 50%, unsalted, AQE skew split", false, true))) {
        skewAt(sf01, salted, aqeSkew); skewAt(work, salted, aqeSkew) // warm
        val a = (1 to 3).map(_ => skewAt(sf01, salted, aqeSkew)).min
        val b = (1 to 3).map(_ => skewAt(work, salted, aqeSkew)).min
        println(f"| $label | $a%.2f | $b%.2f | ${b / a}%.2f | ${math.log10(b / a)}%.2f |")
      }
    }
    spark.stop()
  }
}
