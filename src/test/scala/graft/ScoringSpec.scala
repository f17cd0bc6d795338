package graft

import graft.mlops.Scoring
import org.scalatest.funsuite.AnyFunSuite

/** Scoring — the uniform `.score` surface (upstream base.py mixins):
  * one dispatch, three estimator-family reductions, each a single
  * aggregation over a predictions frame.
  */
class ScoringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("classifierScore: mean accuracy with n") {
    val preds = Seq(("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"))
      .toDF("actual", "pred")
    val r = Scoring.score(preds, "classify", "actual", "pred").head()
    assert(r.getString(0) == "accuracy")
    assert(r.getLong(1) == 4L)
    assert(r.getDouble(2) == 0.75)
  }

  test("regressorScore: R² exact on a known fixture, 1.0 when perfect") {
    // actual 1,2,3,4 / pred 1,2,3,5: SSres = 1, var_pop = 1.25, n = 4
    // ⇒ R² = 1 − 1/5 = 0.8
    val preds = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 5.0))
      .toDF("actual", "pred")
    val r = Scoring.score(preds, "regress", "actual", "pred").head()
    assert(r.getString(0) == "r2")
    assert(r.getLong(1) == 4L)
    assert(r.getDouble(2) == 0.8)
    val perfect = Seq((1.0, 1.0), (2.0, 2.0)).toDF("actual", "pred")
    assert(Scoring.regressorScore(perfect, "actual", "pred")
      .head().getDouble(2) == 1.0)
  }

  test("regressorScore: zero-variance target scores 0.0, not NaN") {
    val preds = Seq((2.0, 1.0), (2.0, 3.0)).toDF("actual", "pred")
    val r = Scoring.regressorScore(preds, "actual", "pred").head()
    assert(r.getDouble(2) == 0.0)
  }

  test("clustererScore: negative inertia sums squared distances") {
    val assign = Seq((1L, 0, 1.5), (2L, 0, 2.5), (3L, 1, 4.0))
      .toDF("id", "center", "dist2")
    val r = Scoring.score(assign, "cluster", "", "dist2").head()
    assert(r.getString(0) == "neg_inertia")
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(2) == -8.0)
  }

  test("scoreBy: per-segment scores, group key cast to string") {
    val preds = Seq(("x", 1.0, 1.0), ("x", 2.0, 2.0),
      ("y", 1.0, 1.0), ("y", 2.0, 4.0)).toDF("seg", "actual", "pred")
    val rows = Scoring.scoreBy(preds, "regress", "seg", "actual", "pred")
      .orderBy("group").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("x", "y"))
    assert(rows(0).getDouble(3) == 1.0) // exact fit in segment x
    // segment y: SSres = 4, var_pop = 0.25, n = 2 ⇒ 1 − 4/0.5 = −7.0
    assert(rows(1).getDouble(3) == -7.0)
    val assign = Seq((1L, 7, 1.5), (2L, 7, 2.5), (3L, 8, 4.0))
      .toDF("id", "center", "dist2")
    val c = Scoring.scoreBy(assign, "cluster", "center", "", "dist2")
      .orderBy("group").collect()
    assert(c.map(r => (r.getString(0), r.getDouble(3))).toSeq ==
      Seq(("7", -4.0), ("8", -4.0)))
    intercept[IllegalArgumentException] {
      Scoring.scoreBy(preds, "rank", "seg", "actual", "pred")
    }
  }

  test("score: unknown kind fails loudly") {
    val df = Seq((1, 1)).toDF("actual", "pred")
    val e = intercept[IllegalArgumentException] {
      Scoring.score(df, "rank", "actual", "pred")
    }
    assert(e.getMessage.contains("unknown estimator kind"))
  }
}
