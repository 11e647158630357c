package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Physical-plan contracts: the optimizer behaviors the 100 TB design
  * depends on, pinned as assertions so a refactor that silently loses a
  * pushdown or broadcast fails here, not in production. */
class PlanSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    Catalog.byName(name).fn(spark, sf).queryExecution.executedPlan.toString

  test("q02: filters push into the parquet scan, columns prune") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("GreaterThan(l_shipdate") || p.contains("IsNotNull(l_shipdate"))
    // projection+filter columns only — the 16-column lineitem scan reads 5
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("l_orderkey") && read.contains("l_discount"))
    assert(!read.contains("l_comment") && !read.contains("l_partkey"))
  }

  test("q03: dimension join broadcasts") {
    assert(plan("q03_join_left_broadcast").contains("BroadcastHashJoin"))
  }

  test("q05: star join broadcasts every dimension") {
    val p = plan("q05_join_star")
    assert(p.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") >= 3)
  }

  test("q09: top-k plans as TakeOrderedAndProject, not global sort") {
    val p = plan("q09_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("\n+- Sort "))
  }

  test("q01: aggregation is partial+final (map-side combine)") {
    val p = plan("q01_agg_pricing")
    assert(p.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2)
  }

  test("q25: IN-subquery plans as a broadcast semi join") {
    val p = plan("q25_semi_join_subquery")
    assert(p.contains("LeftSemi"))
    assert(p.contains("Broadcast"))
  }

  // ---- dedup shuffle-key contracts: the 100 TB claims in TextOps, pinned.
  // A shuffle that keys on (or carries) raw document text would ship the
  // corpus around the cluster; these assert every exchange keys on a
  // digest / band / doc id instead.

  private def hashExchanges(p: String): Seq[String] =
    p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
  private def allExchanges(p: String): Seq[String] =
    p.linesIterator.filter(l => l.contains("Exchange ") || l.contains("BroadcastExchange")).toSeq
  // `sh#NNN` (the shingle string column) must NOT satisfy a match for the
  // shingle-hash column `h#NNN` — require a non-identifier char before `h#`
  private val shingleHashRef = raw"(?<![A-Za-z0-9_])h#\d".r
  private def shingleHashJoins(p: String): Seq[String] =
    p.linesIterator
      .filter(l => l.contains("Join [") && shingleHashRef.findFirstIn(l).isDefined)
      .toSeq

  test("dd01: shuffles key on the 16-byte digest, never the document body") {
    val p = plan("dd01_dedup_exact")
    val hx = hashExchanges(p)
    assert(hx.nonEmpty && hx.forall(_.contains("content_hash#")))
    assert(allExchanges(p).forall(l => !l.contains("text#")))
  }

  test("dd03: map-side partial min; shuffles key on doc_id, not shingle text") {
    val p = plan("dd03_minhash_lsh")
    assert(p.contains("partial_min")) // 8×32 B per doc cross the wire, not shingles
    val hx = hashExchanges(p)
    assert(hx.nonEmpty && hx.forall(_.contains("doc_id#")))
    assert(allExchanges(p).forall(l => !l.contains("text#") && !l.contains("(sh#") && !l.contains(" sh#")))
  }

  test("q39: band join stays an equi join on (key, bucket) — never theta") {
    val p = plan("q39_band_join")
    // the bucket trick's whole point: a |v1-v2|<=band predicate must not
    // plan as a per-key cross join
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    val joins = p.linesIterator.filter(_.contains("Join [")).toSeq
    assert(joins.nonEmpty && joins.forall(l => l.contains("key#") && l.contains("probe#")))
  }

  test("vs05: centroid sums partial-aggregate before the exchange") {
    val p = plan("vs05_centroid_sums")
    assert(p.contains("partial_sum") || p.contains("partial_count"))
    val hx = hashExchanges(p)
    assert(hx.nonEmpty && hx.forall(l => l.contains("label#") && l.contains("dim#")))
  }

  test("dd05: candidates-first verify — no all-pairs shingle join survives") {
    val p = plan("dd05_lsh_dedup")
    // old shape: unfiltered h==h self-join aggregate, then a LeftSemi filter
    assert(!p.contains("LeftSemi"))
    // every shingle-hash join is also keyed by a candidate doc id, so the
    // pair space is the LSH candidate set, never Σ|shingle-bucket|²
    val shingleJoins = shingleHashJoins(p)
    assert(shingleJoins.nonEmpty && shingleJoins.forall(_.contains("d2#")))
    assert(allExchanges(p).forall(l => !l.contains("text#")))
  }

  test("dd05: small band table → planner broadcasts the band self-join") {
    // lshCandidates gates its join shape on Catalyst's size estimate using
    // the planner's own broadcast criterion; below the threshold (every
    // test/bench SF — measured fastest at sf0.1: 1.27–1.49 s vs 1.38–1.59 s
    // shuffled) the join must plan as a broadcast, not a two-sided shuffle
    val p = plan("dd05_lsh_dedup")
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("band#") && l.contains("bkey#")))
  }

  test("dd05: large band table → shuffle_hash reusing ONE signature exchange") {
    // the cluster-scale branch: estimate above autoBroadcastJoinThreshold
    // (forced here with -1, which also stops the planner broadcasting).
    // shuffle_hash on both identical band branches beats sort-merge (no
    // sort), and they need the SAME (band, bkey) exchange — reuse is a
    // RUNTIME decision under AQE, the initial plan (isFinalPlan=false)
    // prints both exchanges separately, so execute first and assert on the
    // final adaptive plan.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val df = Catalog.byName("dd05_lsh_dedup").fn(spark, sf)
      df.collect()
      val exec = df.queryExecution.executedPlan.toString
      assert(exec.contains("ShuffledHashJoin"))
      assert(exec.contains("ReusedExchange"))
    } finally spark.conf.set(key, saved)
  }

  test("pp01: composed chain — broadcast bench probe, no all-pairs join") {
    val p = plan("pp01_export_pipeline")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // candidates-first near-dup verify inside the chain: every
    // shingle-hash join is keyed by a candidate doc id. (The intended
    // LeftSemi decontamination join keys on the shingle column `sh#` —
    // shingleHashJoins' boundary-safe matcher keeps it out of this pin.)
    val shingleJoins = shingleHashJoins(p)
    assert(shingleJoins.nonEmpty && shingleJoins.forall(_.contains("d2#")))
    // decontamination: the benchmark shingle set broadcasts into a semi join
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftSemi")))
    assert(allExchanges(p).forall(l => !l.contains("text#")))
  }

  test("dd07: bench set broadcasts; the corpus shingle pass runs once") {
    val p = plan("dd07_contamination")
    // the final plan reads the ONE materialized shingle pass (checkpoint
    // blocks) for both the bench set and the corpus probe — `documents`
    // itself was scanned exactly once, inside the materialize job, so no
    // parquet scan may survive here
    assert(!p.contains("Scan parquet"))
    assert(p.contains("Scan ExistingRDD"))
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftOuter")))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("dd06: final plan exchanges key on doc ids / components only") {
    val p = plan("dd06_dup_clusters")
    val hx = hashExchanges(p)
    assert(hx.nonEmpty &&
      hx.forall(l => l.contains("doc_id#") || l.contains("component#")))
    assert(allExchanges(p).forall(l =>
      !l.contains("text#") && !l.contains(" sh#") && !l.contains("(sh#")))
  }

  test("dd06: every clustering round exchanges on item/bucket ids only") {
    // the iteration's plans never reach the final query (each round is a
    // checkpoint job) — capture them through the materialize hook instead
    val captured = scala.collection.mutable.Buffer[String]()
    val hook: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = { df =>
      captured += df.queryExecution.executedPlan.toString
      df.localCheckpoint(true)
    }
    TextOps.dupClusters(graft.Tables.documents(spark, sf), hook).collect()
    // membership table + at least round 0 — at sf0.001 round 0's three
    // waves already reach the fixpoint, so exactly 2 captures is correct
    assert(captured.size >= 2)
    val allowed = Seq("doc_id#", "__i#", "__b#", "component#")
    captured.foreach { p =>
      hashExchanges(p).foreach { l =>
        assert(allowed.exists(l.contains),
          s"round exchange keyed off the id/bucket contract: $l")
      }
      assert(allExchanges(p).forall(l => !l.contains("text#")))
    }
  }
}
