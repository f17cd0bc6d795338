package graft

import graft.stats.Profile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Profiling & drift: hand-computed stats, null accounting, the
  * identical-snapshot zero point, and smoothing finiteness on
  * disjoint vocabularies.
  */
class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profileNumeric: counts, nulls, distincts, moments") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, null), (2.0, 30.0), (4.0, null))
      .toDF("x", "y")
    val p = Profile.profileNumeric(df, Seq("x", "y"))
      .orderBy("column").collect()
    val x = p(0)
    assert(x.getString(0) == "x" && x.getLong(1) == 4L &&
      x.getLong(2) == 0L && x.getLong(3) == 3L)
    assert(x.getDouble(4) == 1.0 && x.getDouble(5) == 4.0)
    assert(math.abs(x.getDouble(6) - 2.25) < 1e-9) // mean
    val y = p(1)
    assert(y.getLong(1) == 2L && y.getLong(2) == 2L && y.getLong(3) == 2L)
    assert(math.abs(y.getDouble(6) - 20.0) < 1e-9)
    // approx path: same schema, sane values on a tiny frame
    val a = Profile.profileNumeric(df, Seq("x"), exactDistinct = false)
      .head()
    assert(a.getLong(3) >= 2L && a.getLong(3) <= 4L)
  }

  test("numericDrift: identical zero, planted shift positive, clamping") {
    val a = Seq(1.0, 2.0, 3.0, 9.5).toDF("v")
    val same = Profile.numericDrift(a, a, "v", bins = 10, lo = 0, hi = 10)
      .head()
    assert(same.getAs[Double]("psi") == 0.0 &&
      same.getAs[Double]("js") == 0.0)
    // shifted snapshot drifts; out-of-range values clamp to edge bins
    val b = Seq(7.0, 8.0, 9.0, -5.0, 25.0).toDF("v")
    val d = Profile.numericDrift(a, b, "v", bins = 10, lo = 0, hi = 10)
      .head()
    assert(d.getAs[Double]("psi") > 0 && !d.getAs[Double]("psi").isNaN)
    assert(d.getAs[Long]("n_b") == 5L) // clamped rows still counted
  }

  test("tokenDrift: identical snapshots give zero; disjoint vocab stays finite") {
    val a = Seq("a b a", "c a").toDF("text")
    val same = Profile.tokenDrift(a, a, "text").head()
    assert(same.getAs[Double]("psi") == 0.0 &&
      same.getAs[Double]("kl_pq") == 0.0 &&
      same.getAs[Double]("js") == 0.0)
    assert(same.getAs[Long]("n_terms") == 3L &&
      same.getAs[Long]("n_a") == 5L)
    // disjoint vocabularies: smoothing keeps everything finite, psi > 0
    val b = Seq("x y z").toDF("text")
    val d = Profile.tokenDrift(a, b, "text").head()
    assert(!d.getAs[Double]("psi").isNaN && !d.getAs[Double]("psi").isInfinite)
    assert(d.getAs[Double]("psi") > 0 && d.getAs[Double]("js") > 0)
    // hand check one smoothed cell: union vocab v=6, na=5, nb=3;
    // term 'a': p=(3+1)/(5+6)=4/11, q=(0+1)/(3+6)=1/9
    val pa = 4.0 / 11; val qa = 1.0 / 9
    val contrib = (pa - qa) * math.log(pa / qa)
    assert(d.getAs[Double]("psi") > contrib - 1e-6)
  }
}
