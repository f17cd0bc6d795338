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

  /** [[scorePairs]] with differential, per-block salting for skewed
    * block keys — the straggler killer when one block holds a large
    * share of both sides (a Zipfian block distribution puts the whole
    * hot block's quadratic pair set in ONE task under the plain
    * equi-join).
    *
    * Only blocks whose a-side row count exceeds `hotThreshold` are
    * salted, and each gets its OWN split factor sized to its rows:
    * with c = ⌈rows / hotThreshold⌉ the block splits c² ways (capped
    * at `maxSalt`), because splitting the a-side s ways leaves
    * rows²/s pairs per task — the factor must grow with the SQUARE of
    * the block to hold per-task pairs at ~hotThreshold². A-side hot
    * rows hash into their block's sub-blocks by `aId`; b-side hot
    * rows replicate across that block's sub-blocks, so every original
    * pair still meets exactly once and the scored pair set is
    * BIT-IDENTICAL to the plain scorer's (spec-pinned). Replication
    * cost amortizes: each replicated b-row meets ~hotThreshold a-rows.
    * Cold blocks pass through un-replicated with a constant sub-block.
    *
    * Sizing salt by the GLOBAL max/avg ratio instead (the key-skew
    * report's single salt_factor, with hot = 2× the mean) was built
    * and measured 2.7× SLOWER than the unsalted plan at 1M Zipf-keyed
    * records — a mean-relative threshold salts most of a Zipf mass
    * and a flat factor replicates the b-side everywhere (SCALE.md
    * round 12). The threshold is absolute — a per-task pair budget —
    * for that reason.
    */
  def scorePairsSalted(a: DataFrame, aId: String, b: DataFrame,
                       blockCols: Seq[String], rules: Seq[FieldRule],
                       maxSalt: Int = 64,
                       hotThreshold: Long = 4096L): DataFrame = {
    require(rules.nonEmpty, "at least one field rule required")
    require(blockCols.nonEmpty, "at least one block column required")
    require(maxSalt >= 2, s"maxSalt=$maxSalt: salting needs >= 2 sub-blocks")
    require(hotThreshold >= 1, s"hotThreshold=$hotThreshold must be positive")
    val keyCols = blockCols.map(col)
    val c = ceil(col("_bn").cast("double") / lit(hotThreshold))
    val hot = a.groupBy(keyCols: _*).agg(count(lit(1)).as("_bn"))
      .where(col("_bn") > hotThreshold)
      .select(keyCols :+ least(c * c, lit(maxSalt)).cast("int").as("_sn"): _*)
    val aS = a.join(broadcast(hot), blockCols, "left")
      .withColumn("_salt", when(col("_sn").isNotNull,
        pmod(xxhash64(col(aId)), col("_sn")).cast("int")).otherwise(lit(0)))
      .drop("_sn")
    val bS = b.join(broadcast(hot), blockCols, "left")
      .withColumn("_salt", explode(when(col("_sn").isNotNull,
        sequence(lit(0), col("_sn") - 1)).otherwise(array(lit(0)))))
      .drop("_sn")
    val score = rules.map(r =>
      when(r.agree, lit(r.wAgree)).otherwise(lit(r.wDisagree))).reduce(_ + _)
    aS.join(bS, blockCols :+ "_salt")
      .withColumn("fs_score", (round(score, 6) + lit(0.0)))
      .drop("_salt")
  }

  /** The linkage scorer to reach for when the block-key distribution
    * is unknown: [[scorePairsSalted]] at its defaults. The hot-block
    * count IS the skew profile — one groupBy over the a-side, cheaper
    * than a full [[Diagnostics.keySkewReport]] pass — and a key with
    * no block past the threshold degenerates to the plain plan plus
    * one empty broadcast, so there is no report-then-decide step to
    * pay for (the report remains the right tool for understanding a
    * key; this is the right default for executing on one).
    */
  def scorePairsSkewAware(a: DataFrame, aId: String, b: DataFrame,
                          blockCols: Seq[String], rules: Seq[FieldRule],
                          maxSalt: Int = 64): DataFrame =
    scorePairsSalted(a, aId, b, blockCols, rules, maxSalt)

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
