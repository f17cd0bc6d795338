package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §7 phase 8). AQE's skew-join splitting handles
  * most cases at runtime; these explicit forms cover the two places AQE
  * can't: pre-aggregation fan-in on a hot key, and joins where the skewed
  * side must meet a non-broadcastable right side.
  */
object Skew {

  /** Deterministic salt in [0, saltBuckets): hash of the ENTIRE row content.
    * Deliberately not `spark_partition_id()`/`monotonically_increasing_id()`
    * (SURVEY §7 hard-part 2): those change when a map stage is recomputed
    * after a fetch failure, re-salting rows into different buckets so the
    * two-phase aggregate/join can double-count or drop rows at cluster
    * scale. A content hash reproduces identical salts on task retry.
    * Identical duplicate rows share a bucket — acceptable: hot keys are
    * hot because of many *distinct* payloads, which still spread.
    */
  private def deterministicSalt(df: DataFrame, saltBuckets: Int): Column =
    pmod(hash(df.columns.map(col).toSeq: _*), lit(saltBuckets)).cast("long")

  /** Two-phase salted aggregation: phase 1 aggregates on (key, salt) —
    * spreading a hot key over `saltBuckets` reducers — phase 2 merges the
    * partials. Correct for any associative+commutative aggregate; callers
    * pass partial and final expressions explicitly (e.g. sum/sum,
    * count/sum).
    */
  def saltedAggregate(
      df: DataFrame,
      keyCols: Seq[String],
      saltBuckets: Int,
      partials: Seq[(String, Column)],     // alias -> partial agg expr
      finals: Seq[(String, Column)]        // alias -> final agg over partial
  ): DataFrame = {
    val salted = df.withColumn("_salt", deterministicSalt(df, saltBuckets))
    val phase1 = salted
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (a, e) => e.as(a) }: _*)
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(finals.head._2.as(finals.head._1),
        finals.tail.map { case (a, e) => e.as(a) }: _*)
  }

  /** Salted join for a skewed left side against a non-broadcastable right:
    * left rows get a deterministic content-hash salt in [0, n); right rows
    * are replicated n times. One shuffle each side, hot left keys spread
    * over n tasks, and retried tasks reproduce identical salts.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, joinKey: String,
                 saltBuckets: Int): DataFrame = {
    val l = left.withColumn("_salt", deterministicSalt(left, saltBuckets))
    val r = right
      .withColumn("_salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("_salt", col("_salt").cast("long"))
    l.join(r, Seq(joinKey, "_salt")).drop("_salt")
  }
}
