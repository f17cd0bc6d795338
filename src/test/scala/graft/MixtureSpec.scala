package graft

import graft.operators.Mixture
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mixture assembly: the bucketed two-phase threshold must be
  * bit-identical to the naive per-component running-total window at
  * every bucket granularity, including the degenerate ones.
  */
class MixtureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 300 docs, 3 components, varied token sizes; budgets cut each
  // component mid-stream
  private def fixture = spark.range(300).select(
    col("id").as("doc_id"),
    concat(lit("c"), pmod(col("id"), lit(3))).as("comp"),
    (pmod(hash(col("id")), lit(50)) + 1).cast("long").as("tokens"))

  private def naive(budgets: org.apache.spark.sql.DataFrame) = {
    val d = fixture.withColumn("_h",
      graft.functions.GraftFunctions.md5Long(col("doc_id").cast("string"), 15))
    val w = Window.partitionBy(col("comp")).orderBy(col("_h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.join(budgets, "comp")
      .withColumn("_run", sum(col("tokens")).over(w))
      .where(col("_run") <= col("budget"))
      .select(col("doc_id"), col("comp"), col("tokens"))
      .orderBy("doc_id").collect().toSeq
  }

  test("bucketed threshold equals the naive window at every granularity") {
    val budgets = fixture.groupBy(col("comp"))
      .agg(floor(sum(col("tokens")) * lit(0.37)).cast("long").as("budget"))
    val expected = naive(budgets)
    // shift 58 → 4 buckets (every bucket multi-doc, boundary window hot);
    // shift 36 → 2^24 bucket ids, so at fixture scale one doc per
    //   bucket (pure phase-2 classification) — the floor of the allowed
    //   range (smaller shifts would make the rollup corpus-sized);
    // shift 46 → the production default
    Seq(58, 46, 36).foreach { shift =>
      val got = Mixture.mixToBudget(fixture, "doc_id", "comp", "tokens",
          budgets, bucketShift = shift)
        .orderBy("doc_id").collect().toSeq
      assert(got === expected, s"bucketShift=$shift diverged")
    }
  }

  test("budget edges: zero keeps nothing, total keeps all, absent drops") {
    val total = fixture.groupBy(col("comp"))
      .agg(sum(col("tokens")).as("budget"))
    assert(Mixture.mixToBudget(fixture, "doc_id", "comp", "tokens",
      total, bucketShift = 58).count() === 300L)
    val zero = total.select(col("comp"), lit(0L).as("budget"))
    assert(Mixture.mixToBudget(fixture, "doc_id", "comp", "tokens",
      zero, bucketShift = 58).count() === 0L)
    // a component missing from the budget table is dropped entirely
    val partial = total.where(col("comp") =!= "c1")
    val kept = Mixture.mixToBudget(fixture, "doc_id", "comp", "tokens",
      partial, bucketShift = 58)
    assert(kept.where(col("comp") === "c1").count() === 0L)
    assert(kept.count() === 200L)
  }

  test("mixReport: fill against budget, absent components zeroed") {
    val budgets = Seq(("c0", 100L), ("c1", 1000000L), ("c9", 50L))
      .toDF("comp", "budget")
    val kept = Mixture.mixToBudget(fixture, "doc_id", "comp", "tokens",
      budgets, bucketShift = 58)
    val rep = Mixture.mixReport(kept, "comp", budgets)
      .orderBy("comp").collect()
    // c0 fills to <= 100 tokens; c1's budget exceeds its mass (fill<1);
    // c9 has no docs at all -> zero row, not a dropped row
    val c0 = rep(0)
    assert(c0.getLong(3) <= 100L && c0.getLong(3) > 0L)
    val c9 = rep(2)
    assert(c9.getLong(2) === 0L && c9.getLong(3) === 0L &&
      c9.getDouble(4) === 0.0)
  }
}
