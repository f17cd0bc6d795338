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

  test("round-2 pipelines avoid cartesian shapes; model state broadcasts") {
    // cluster resolution: equi-joins only, never a cross product
    val comp = plan("dedup_pipeline_clusters")
    assert(!comp.contains("CartesianProduct") &&
      !comp.contains("BroadcastNestedLoopJoin"), comp.take(600))
    // iterative fits join O(dims) model state via broadcast
    val lloyd = plan("c2_kmeans_lloyd")
    assert(lloyd.contains("BroadcastHashJoin"), lloyd.take(600))
    val gd = plan("l4_logreg_gd")
    assert(gd.contains("BroadcastHashJoin"), gd.take(600))
    // gap fill: keyed window + generator, no cartesian
    val rs = plan("resample_gapfill_events")
    assert(rs.contains("Window") && !rs.contains("CartesianProduct"),
      rs.take(600))
  }

  test("round-5 pipelines: native minhash, TakeOrdered caps, no cartesian") {
    // minhash signatures ride the native one-eval-per-shingle expression
    val sig = plan("dedup_minhash_sig")
    assert(sig.contains("graft_md5_seed_hashes"),
      "native md5 family expression missing from plan: " + sig.take(600))
    // vocab cap is TakeOrdered (distributed top-k), not a global sort of
    // the whole vocabulary
    val caps = plan("f8_countvec_caps")
    assert(caps.contains("TakeOrderedAndProject"), caps.take(800))
    // all-sources provenance clusters: equi-joins + the one documented
    // BroadcastNestedLoopJoin (cosine threshold pairs) — never a
    // cartesian product
    val prov = plan("dedup_provenance_clusters")
    assert(!prov.contains("CartesianProduct"), prov.take(600))
  }

  test("DotProductRewrite: HOF aggregate(zip_with(*)) becomes native graft_dot") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.plans.GraftExpressions.register(spark)
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.5, 0.0, 2.0), Seq(1.0, 9.0, 0.25))
    ).toDF("a", "b")
    val hof = "aggregate(zip_with(a, b, (x, y) -> x * y), " +
      "cast(0 as double), (acc, v) -> acc + v)"
    val q = df.select(expr(hof).as("dot"))
    assert(q.queryExecution.optimizedPlan.expressions.exists(
      _.exists(_.isInstanceOf[graft.plans.DotProduct])), "rewrite did not fire")
    assert(q.as[Double].collect().toSeq === Seq(32.0, 1.0))
    // sum direction differs -> no rewrite (acc - v)
    val sub = df.select(expr("aggregate(zip_with(a, b, (x, y) -> x * y), " +
      "cast(0 as double), (acc, v) -> acc - v)").as("d"))
    assert(!sub.queryExecution.optimizedPlan.expressions.exists(
      _.exists(_.isInstanceOf[graft.plans.DotProduct])))
    // nullable elements -> no rewrite (HOF null semantics must be kept)
    val nullable = Seq((Seq[Option[Double]](Some(1.0), None),
      Seq[Option[Double]](Some(2.0), Some(3.0)))).toDF("a", "b")
    val nq = nullable.select(expr(hof).as("dot"))
    assert(!nq.queryExecution.optimizedPlan.expressions.exists(
      _.exists(_.isInstanceOf[graft.plans.DotProduct])))
    assert(nq.collect().head.isNullAt(0)) // HOF semantics preserved
  }

  test("graft_cosine/graft_dot: length mismatch throws, zero norm is null") {
    import spark.implicits._
    plans.GraftExpressions.register(spark)
    // interpreted path and codegen path both enforce equal lengths
    val mismatch = intercept[Exception] {
      Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
        .selectExpr("graft_cosine(a, b)").collect()
    }
    assert(mismatch.getMessage.contains("length mismatch") ||
      Option(mismatch.getCause).exists(_.getMessage.contains("length mismatch")))
    val dotMismatch = intercept[Exception] {
      Seq((Array(1.0, 2.0), Array(1.0))).toDF("a", "b")
        .selectExpr("graft_dot(a, b)").collect()
    }
    assert(dotMismatch.getMessage.contains("length mismatch") ||
      Option(dotMismatch.getCause).exists(_.getMessage.contains("length mismatch")))
    // zero-norm vector → SQL NULL, not NaN
    val zn = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .selectExpr("graft_cosine(a, b)").collect()
    assert(zn.head.isNullAt(0), zn.head.toString)
    // non-numeric-array input rejected at analysis time
    val bad = intercept[Exception] {
      Seq((Array("x"), Array("y"))).toDF("a", "b")
        .selectExpr("graft_cosine(a, b)").collect()
    }
    assert(bad.getMessage.toLowerCase.contains("array"), bad.getMessage)
  }
}
