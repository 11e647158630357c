package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Operator-inventory coverage map (SURVEY.md §2 → catalog entries; every
  * entry has DuckDB oracle SQL):
  *  - §2.2 projections/filters: q02, q16, q17 (P1/P4/P7/P8/P9)
  *  - §2.3 joins: q03 (J1 left/broadcast), q04 (J2 composite), q05 (star),
  *    q06 (anti = S9 FK check), q25 (semi/IN), q31 (scalar subquery),
  *    q33 (as-of join, graft.operators.AsofJoin)
  *  - §2.4 aggregations: q01, q26 (A1 quality counters), q28, q13/q14
  *    (rollup/cube), q30 (collect/listagg), q32 (pivot), q40 (unpivot), q34 (JSON extract)
  *  - §2.5 window/sort/limit/set ops: q07, q08, q09, q10, q11, q12,
  *    q38 (time-RANGE frame)
  *  - §2.6 scalar-function bank: q18 (F6/F10/F11), q19 (F1), q20 (F3),
  *    q21 (F4/F17), q22 (F5), q23 (F14), q24 (F20–F22)
  *  - §2.7 streaming/incremental: q15 (tumbling window), q29 (sessionize);
  *    live Structured-Streaming twins in graft.streaming (batch/stream
  *    parity tested with MemoryStream)
  *  - §2.8 upsert/merge: q07, q27 (graft.operators.MergeWriter)
  *  - Training-pipeline additions: dd01 exact dedup, dd02 n-gram Jaccard,
  *    dd03 MinHash+LSH signatures, dd04 SimHash, dd05 full LSH dedup
  *    (band bucket join + exact verify), dd06 dedup groups
  *    (graft.operators.ConnectedComponents over LSH pairs), dd07
  *    benchmark-contamination check, dd08 Bloom-pruned decontamination
  *    (the eval-suite-scale path, exact after verify), pp02 incremental
  *    LSH index maintenance (new-batch dup pairs only, verified against
  *    the standing shingle store), pp04 incremental cluster maintenance
  *    (standing labels + bucket index advanced per batch, merges via a
  *    component-collapsed batch-sized graph — dd06's oracle verbatim),
  *    pp05 incremental IVF maintenance (batch-assigned postings appended
  *    to standing lists under a fixed coarse quantizer — vs06's oracle
  *    verbatim), pp06 incremental span-dedup maintenance (standing
  *    store/counts/report advanced O(batch + affected) — dd09's oracle
  *    verbatim), pp07 incremental vocabulary maintenance (additive
  *    (df, cf) deltas — ta07's oracle verbatim), dd09 exact
  *    repeated-span detection, dd10 SemDedup (IVF-cell-partitioned
  *    cosine drop list) + dd16 its auto-sized variant (nlist ∝ N via
  *    semanticDropsAuto, oracle replays the ceil), dd11 containment
  *    near-dup (asymmetric
  *    inter/min scoring on dd05's candidates), pp09 incremental
  *    containment (dd11's scoring over pp02's maintained state), pp10
  *    incremental SemDedup (batch + affected rows over touched cells,
  *    dd10's oracle restricted), dd12 cross-modal dedup validation
  *    (text pairs × embedding cosine), dd13 containment-recall
  *    candidate index (bottom-k sketch probes vs the shingle store,
  *    minHits volume knob), pp12 its incremental twin (the pairs a
  *    batch adds over the standing store + probe tables), vs07 one exact
  *    k-means step (assign → per-cell sums); pp03 sequence packing
  *    (distributed prefix sum), pp08 deterministic shard shuffle
  *    (+ graft.operators.Layout.writeShards), pp11 export carried to
  *    training-ready delivery (pp01 + split + shard + order);
  *    pp13 incremental bigram-LM maintenance (additive counts, KN
  *    continuation recomputed vocab-bounded — ta09's oracle verbatim);
  *    ta01–ta12
  *    (lang-ID, quality, tokens, fingerprint, repetition metrics, PII
  *    redaction, corpus vocabulary, BPE pair counts, bigram LM +
  *    continuation counts, top-1k vocab coverage, sliding-window
  *    chunking, rare-bigram LM quality filter); sa01–sa04
  *    deterministic hash sampling + domain mix + train/val/test split
  *    (native md5_fold32 expression); q39 band join (graft.operators.BandJoin);
  *    q43 grouped top-k (graft.operators.GroupedTopK bounded-buffer
  *    aggregator — no window sort); mm01/mm02 +
  *    graft.operators.Multimodal (binary columns, batched codec seam,
  *    frame sampling); vs01 brute-force ANN, vs02 embedding near-dup,
  *    vs03 cluster stats, vs04 LSH ANN (graft.operators.Ann, native
  *    quantized_dot codegen expression, md5-derived integer hyperplanes)
  *    + vs26 its auto-WIDTH variant (bits = ceil-log2 of ceil(N/target)
  *    via Ann.autoBits — the expected bucket held constant as the corpus
  *    grows; oracle replays the integer bit count) + pp38 its
  *    incremental twin (maintained LSH serving index: standing rows
  *    advanced by hashing only the batch, id-guarded, width-pinned,
  *    rebuilt under autoBits, exactly forgettable — Streams
  *    .maintainLshState family; oracle is vs04's verbatim),
  *    vs05 IVF centroid sums, vs06 IVF ANN search (probe-2 centroids),
  *    vs08 product-quantization ANN (8×64 codebook encode +
  *    asymmetric-distance table lookups — the vector-compression scale
  *    path beside vs04/vs06's candidate pruning), vs09 IVF-PQ ANN (the
  *    100 TB composition: probe-pruned cells scored by ADC lookups over
  *    a codes-only postings table), vs10 two-stage retrieval (ADC
  *    shortlist re-ranked by exact cosine), vs11 quantizer rebuild
  *    (3 exact integer Lloyd iterations), vs12 range/threshold
  *    retrieval (shared ivfCandidates kernel, match-sized output),
  *    vs13 kNN graph (cid-keyed self-join, no probe window);
  *    dd14 cluster canonicalization + pp15 its incremental twin,
  *    dd15 fuzzy-exact dedup (ASCII canonicalization) + pp17 its
  *    incremental twin over (canon, raw)-granular additive stats,
  *    mm03 binary-payload exact dedup; sa05 temperature resampling
  *    (integer-exact rate interpolation) + pp16 incremental mix
  *    maintenance, sa06 epoch up-sampling (whole-epoch repeats +
  *    salted fractional remainder); pp14 incremental PQ-codes
  *    maintenance; ta13 per-doc tf-idf keywords (integer-exact
  *    surrogate, string-tie-break GroupedTopK.topKStr); q44 SCD2
  *    change-interval build from the event log; ta14 BPE merge
  *    TRAINING (k iterated pair-count argmaxes over the vocab) +
  *    corpus encode against the learned merges, pp18 its incremental
  *    twin over the maintained vocabulary (+ Streams.rebuildBpeState,
  *    the tokenizer-lifecycle swap job); vs14 kNN
  *    graph at nProbe=2 (assigned + second-nearest cell, both
  *    row-local via the rank-2 native assignment — measured recall
  *    uplift in ScalePathsSpec) + vs25 its auto-sized variant (the
  *    nProbe=2 graph at nlist = ceil(N/targetCellSize), completing the
  *    auto family beside vs23/vs24/pp36/dd16); dd15/pp17's production NFKC
  *    canonicalizer variant (native nfkc_normalize expression,
  *    UnicodeCanonSpec goldens — oracle-exempt, DuckDB has no NFKC);
  *    sa07 exact-k uniform sample (bounded top-k, no corpus sort),
  *    sa08 exact stratified sample (largest-remainder apportionment),
  *    sa09 weighted sample without replacement (integer
  *    Efraimidis–Spirakis), sa11 leakage-safe train/val/test split
  *    (sa04's hash split over dd06's near-dup cluster label — no LSH
  *    near-dup pair can straddle train/eval, the internal analog of
  *    dd07/dd08's benchmark decontamination) + pp37 its incremental
  *    twin over pp04's maintained cluster tables (one state, two
  *    consumers; a merge legitimately migrates the merged cluster's
  *    split), sa10 token-budget mix (per-source greedy
  *    hash-prefix under a token budget via the two-level grouped prefix
  *    sum graft.operators.PrefixSum.runningTotalBy — no per-source
  *    single-task sort) + pp22 its incremental twin (kept-prefix +
  *    cut-marker standing state advanced O(kept + batch);
  *    Streams.maintainBudgetState is the continuous journal loop);
  *    q45 KMV bottom-k distinct sketch (graft.operators.KmvSketch —
  *    mergeable bounded-buffer cardinality estimate, integer-exact and
  *    oracle-replayed, vs q28's exact distinct shuffle) + pp23 its
  *    incremental twin (standing sketch merged row-locally with the
  *    batch sketch — exact under overlap); pp24 incremental kNN-graph
  *    maintenance (stored edges stand in for standing-standing pairs,
  *    batch scores only its cells' members — graph == vs13;
  *    Streams.maintainKnnGraphState is the continuous loop over a
  *    cid-partitioned graph table, rewriting only touched partitions);
  *    q46 dense time-grid resampling with LOCF gap-fill (generated
  *    grid, grid-bounded carry-forward window — never a data-sized
  *    window); Streams.forgetVectorState + Streams.forgetDedupState,
  *    deletion propagation (right-to-be-forgotten) over the maintained
  *    vector and text-dedup state: postings / codes / sums / graph and
  *    band-index / shingles / pairs left as if the ids never arrived,
  *    ids tombstoned (cid −2 / null-text doc rows) so redelivery AND
  *    future ingest stay blocked, graph repaired per touched cell,
  *    ghost buckets (band keys only forgotten docs held) deleted;
  *    mm04 perceptual near-dup (banded 64-bit
  *    signature + exact Hamming verify) + pp19 its incremental twin,
  *    mm05 content-defined chunk dedup (rolling-hash boundaries) + pp21
  *    its incremental twin; ta15 learned quality-classifier inference
  *    (fixed-point linear scorer), ta16 Gopher/C4-style rule battery;
  *    vs15 SQ8 scalar-quantized search + pp20 incremental codes
  *    (+ Streams.rebuildSqState, the bounds retrain-and-swap), vs16 PQ
  *    codebook training (per-subspace integer Lloyd), vs17
  *    train-then-deploy PQ search, vs18 residual IVF-PQ (the FAISS
  *    IVFPQ encoding: codes over x − c(x) residuals, per-probed-cell
  *    query distance tables, ADC top-k) + Streams.rebuildPqState (book
  *    retrain-and-swap — the fourth quantizer lifecycle after
  *    IVF/BPE/SQ), vs19 graph-expansion ANN (two id-keyed hops over the
  *    standing vs13 kNN graph + exact-cosine rescore — candidate volume
  *    degree^h per query, cell-size independent) + vs24 the same search
  *    kernel over the AUTO-SIZED standing graph (vs23's nlist ∝ N
  *    build — the production composition; oracle derives nlist via the
  *    same integer ceil) + pp36 pp24's advance under the auto-sized
  *    quantizer era (graph == vs23, advance cost bounded per touched
  *    cell at ~targetCellSize standing members); ta17 CCNet-style
  *    reference-LM perplexity bucketing (integer surprise under a FROZEN
  *    reference bigram LM, per-source terciles by distributed rank — no
  *    per-source window sort) + pp25 its incremental twin (immutable
  *    standing scores, rank-only re-bucket) + Streams.buildRefState /
  *    maintainScoreState / scoreSnapshot / forgetScoreState (the score
  *    family's offline build, continuous advance, and forget members);
  *    vs20 metadata-filtered ANN (label predicate pushed to the postings
  *    scan — selectivity-proportional work, quantizer stays
  *    full-corpus-trained); Streams.forgetCountState (negative-delta
  *    O(deleted) forget for vocab/LM counts, doc-store tombstone as the
  *    compaction commit witness, crashed-then-overlapping requests
  *    rolled back) + Streams.forgetMixState (the same mechanism for the
  *    domain-mix counts, null-source tombstones); ta18 lexical BM25
  *    top-k retrieval (integer-exact Okapi scoring over the (doc, tok)
  *    tf rollup, broadcast query terms prune first, bounded-buffer
  *    per-query top-k); ta19 quality-classifier TRAINING (fixed-point
  *    batch perceptron over ta15's features, ta16 verdicts as weak
  *    supervision, full trajectory oracle-replayed) +
  *    Streams.rebuildClassifierState (the train→deploy weight-table
  *    swap ta15-style inference consumes); pp26 incremental retrieval
  *    index (standing per-doc (doc, tok, tf) rows, one batch-sized
  *    rollup per advance, query-time stats — results == ta18) +
  *    Streams.maintainTfState / bm25Snapshot / forgetTfState (the
  *    retrieval family's continuous and forget members); pp27
  *    incremental classifier training (per-doc feature halves + labels
  *    maintained, LM derived at read, retrain == ta19) +
  *    Streams.maintainFeatureState / trainingSnapshot /
  *    forgetFeatureState; round-12 forget-matrix completion:
  *    Streams.forgetSpanState (shared→unique crossing repair),
  *    forgetPerceptualState, forgetContainmentState, forgetChunkState +
  *    forgetExactDedupState (min-keeper repair over surviving holders),
  *    forgetBudgetState (journal deletion, budget refills at read);
  *    Streams.repairClusterSplits (r16): the run-rarely EXACT split
  *    repair forgetDedupState's conservative over-grouping documented
  *    as deferred — component-local CC rebuild over the touched
  *    components' surviving membership rows, crash-convergent write
  *    order, repair + forget == from-scratch ingest of the survivors
  *    (ForgetStateSpec pins a planted bridge splitting and the
  *    real-corpus equality);
  *    vs21 OPQ-permuted PQ training (variance-balancing dimension
  *    reallocation — rank round-robin under an exact integer
  *    comparator, the deterministic core of non-parametric OPQ — then
  *    vs16's Lloyd body verbatim on the permuted layout) + vs22 its
  *    train→deploy search (row-local query permute, vs08's encode/ADC
  *    kernel unchanged — the (permutation, books) artifact pair swaps
  *    in as data) + Streams.rebuildOpqState / maintainOpqCodes /
  *    opqSearchSnapshot (the fifth rebuild-and-swap lifecycle; the
  *    permutation persists as a table and round-trips) + pp28
  *    incremental OPQ (the era contract as a gate: artifacts trained
  *    on the standing slice and persisted, increment encoded under
  *    them row-locally — the oracle replays the era split, the first
  *    incremental gate whose artifacts depend on their training
  *    corpus); BM25 SERVING
  *    path: Streams.maintainTfState dl overload + bm25ServeSnapshot
  *    (maintained per-doc lengths; a query pays one streaming tf scan
  *    + query-term postings + the compact dl table — the per-workload
  *    corpus-sized dedup/dl shuffles are gone; scores == bm25Snapshot
  *    exactly, ServeProbe measures both paths) + the TOK-BUCKETED
  *    serving projection (maintainTfState tokTf overload +
  *    bm25ServeTokSnapshot: tb = hash(tok) mod 64 partition layout, the
  *    workload's buckets derived through the SAME Column, the serve
  *    scan partition-prunes to |query-term buckets|/64 of the table —
  *    the residual scan closed at the planner; doc-bucketed tf stays
  *    the deletion-friendly source of truth, the tok copy's forget is
  *    the documented O(table) layout trade); ta20 count-min sketch
  *    frequency estimation (4×1024 integer cells over md5-fold hash
  *    rows — the mergeable frequency counterpart of q45's KMV
  *    cardinality sketch: the shuffle carries cells, never the
  *    vocabulary, and shard sketches ADD; top-20 true tokens probed,
  *    one-sided estimates oracle- and spec-pinned) + pp29 incremental
  *    CMS (standing cells + vocab counts advanced from ONE batch
  *    tokenize — cell additivity IS the incremental contract; probe ==
  *    ta20) + Streams.maintainCmsState / cmsSnapshot / compactCms +
  *    forgetCountState cmsTable (negative cell deltas — the sketch
  *    member of the additive counts family, O(deleted) forget);
  *    ta21/ta22 exact heavy hitters without a vocabulary shuffle —
  *    ta21 two-pass (CMS hot-cell broadcast semi-join prune), ta22
  *    one-pass (operators.MisraGries bounded mergeable summary as the
  *    candidate set); both feed the shared exact tail, so the result
  *    equals the plain rollup and the oracle is exact; pp30 the
  *    incremental twin (maintained bigram cells replace the sketch
  *    pass; threshold from row-conservation, no extra corpus scan);
  *    q47 exact percentiles by histogram selection (domain-bounded
  *    exchanges, no corpus sort — q41's scale successor, same oracle);
  *    ta23 HyperLogLog distinct estimation (operators.HllSketch — 64
  *    integer registers per group from md5-fold bits, harmonic sum as
  *    an exact scaled BIGINT, α₆₄ the rational 709/1000, linear
  *    counting a shared 64-entry literal table: registers, sum AND
  *    estimate oracle-replayed; the idempotent-max counterpart of
  *    q45's KMV — the exchange carries ≤64 register rows per group per
  *    map, never values) + pp31 its incremental twin (standing
  *    register table advanced by register-wise max, replays absorbed
  *    by idempotence — no batch keys, no dedup; estimate == ta23) +
  *    Streams.maintainHllState / hllSnapshot / compactHll /
  *    forgetHllState (max does not invert: forget is a rebuild over
  *    the survivors' stored text + atomic swap — the documented
  *    non-additive trade)
  *  - Scale operators without query-gate shape: graft.operators.Bucketing
  *    (shuffle-free co-bucketed joins), Salting (skew), AsofJoin
  *  - Oil-wells domain pipeline itself (S1–S15, F-bank on real dirty data):
  *    graft.wells.* + CLI (graft.wells.Main), exercised by the ScalaTest
  *    golden suites against /root/reference's shipped CSVs (77 rows,
  *    stats 77/1/1/0/0, /wells = 76).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 5-table star join + exact-decimal revenue rollup (TPC-H Q5 shape). */
  def entry(spark: SparkSession): DataFrame =
    Catalog.byName("q05_join_star").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Catalog.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
