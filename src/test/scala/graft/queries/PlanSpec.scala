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
}
