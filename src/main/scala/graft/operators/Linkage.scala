package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi–Sunter, JASA 1969): entity
  * resolution between two sources that share no reliable key — the
  * curation step that sits beside dedup when corpus metadata arrives
  * from multiple feeds.
  *
  * Scale shape: candidate generation is BLOCKED (equi-join on coarse
  * keys — never all-pairs; the same discipline as the dedup band
  * index), field comparison + log-likelihood scoring are map-side
  * column arithmetic on the candidate rows, and best-match selection
  * is a min-struct argmax aggregate — map-side combinable, no window,
  * no sort exchange. Everything is deterministic arithmetic, so the
  * whole chain carries a value-level SQL oracle.
  */
object Linkage {

  /** One field comparator: an agreement predicate over the joined
    * frame's columns plus its Fellegi–Sunter weights — log2(m/u) when
    * the fields agree, log2((1−m)/(1−u)) when they disagree (m = P
    * [agree | match], u = P[agree | non-match], both supplied by the
    * caller as published or estimated parameters).
    */
  final case class FieldRule(name: String, agree: Column,
                             wAgree: Double, wDisagree: Double)

  /** Blocked candidate pairs with their summed match weight. Both
    * inputs must already carry the block columns under the SAME names
    * and otherwise disjoint column names; every pair sharing a block
    * key is scored — block key choice bounds the quadratic term, so
    * keep blocks small and run several passes with different keys for
    * recall (standard multi-pass blocking).
    */
  def scorePairs(a: DataFrame, b: DataFrame, blockCols: Seq[String],
                 rules: Seq[FieldRule]): DataFrame = {
    require(rules.nonEmpty, "at least one field rule required")
    // an empty key list would silently turn the blocked join into a
    // full cartesian product — the exact failure mode blocking exists
    // to prevent
    require(blockCols.nonEmpty, "at least one block column required")
    val score = rules.map(r =>
      when(r.agree, lit(r.wAgree)).otherwise(lit(r.wDisagree))).reduce(_ + _)
    a.join(b, blockCols)
      .withColumn("fs_score", (round(score, 6) + lit(0.0)))
  }

  /** One best match per right-side id: highest score wins, ties to the
    * lowest left id, pairs under `threshold` dropped entirely. The
    * argmax is min(struct(−score, idA)) — an aggregate with map-side
    * partial combine, not a row_number window (no sort exchange; the
    * same plan shape as ClusterOps.assignToCenters' argmin).
    */
  def bestMatches(scored: DataFrame, idA: String, idB: String,
                  threshold: Double): DataFrame =
    scored.where(col("fs_score") >= threshold)
      .groupBy(col(idB))
      .agg(min(struct((-col("fs_score")).as("ns"), col(idA).as("ba"),
        col("fs_score").as("sc"))).as("_m"))
      .select(col(idB), col("_m.ba").as(s"best_$idA"),
        col("_m.sc").as("fs_score"))
}
