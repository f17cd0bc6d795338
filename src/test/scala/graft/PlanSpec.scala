package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the scale properties SCALE.md documents
  * must stay true as queries evolve.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("d8: predicate pushdown reaches the parquet scan") {
    val p = plan("d8_project_filter")
    assert(p.contains("PushedFilters: [IsNotNull(lang)"), p.take(800))
    assert(p.contains("EqualTo(lang,en)"))
  }

  test("q5: all three dimension joins are broadcast") {
    val p = plan("q5_broadcast_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size === 3, p.take(800))
    assert(!p.contains("SortMergeJoin"))
  }

  test("asof: single keyed window, no join blow-up") {
    val p = plan("asof_join_events_orders")
    assert(p.contains("Window"), p.take(400))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("near-dup: threshold predicate executes inside the join") {
    val p = plan("dedup_embedding_cosine")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("graft_cosine"), "native expression missing from plan")
  }

  test("q1: partial+final hash aggregation") {
    val p = plan("q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(600))
  }
}
