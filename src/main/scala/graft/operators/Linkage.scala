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

  /** [[scorePairs]] with differential salting for skewed block keys —
    * the straggler killer when one block holds a large share of both
    * sides (a Zipfian block distribution puts the whole hot block's
    * quadratic pair set in ONE task under the plain equi-join).
    *
    * Only blocks whose a-side row count exceeds `hotThreshold` are
    * salted: a-side hot rows split into `salt` sub-blocks by a hash of
    * `aId`; b-side hot rows replicate across all `salt` sub-blocks, so
    * every original pair still meets exactly once and the scored pair
    * set is BIT-IDENTICAL to the plain scorer's (spec-pinned). Cold
    * blocks pass through with a constant sub-block — no replication
    * cost outside the hot set. The hot-block key list is a
    * groupBy-count the size of the block-key space, broadcast to both
    * sides. Total pair work is unchanged (the quadratic term is a
    * property of the block key, not the plan); what changes is that
    * the hot block's pairs now land on `salt` tasks instead of one.
    */
  def scorePairsSalted(a: DataFrame, aId: String, b: DataFrame,
                       blockCols: Seq[String], rules: Seq[FieldRule],
                       salt: Int, hotThreshold: Long): DataFrame = {
    require(rules.nonEmpty, "at least one field rule required")
    require(blockCols.nonEmpty, "at least one block column required")
    require(salt >= 2, s"salt=$salt: a salted plan needs >= 2 sub-blocks")
    require(hotThreshold >= 1, s"hotThreshold=$hotThreshold must be positive")
    val keyCols = blockCols.map(col)
    val hot = a.groupBy(keyCols: _*).agg(count(lit(1)).as("_bn"))
      .where(col("_bn") > hotThreshold)
      .select(keyCols :+ lit(1).as("_hot"): _*)
    val aS = a.join(broadcast(hot), blockCols, "left")
      .withColumn("_salt", when(col("_hot").isNotNull,
        pmod(xxhash64(col(aId)), lit(salt)).cast("int")).otherwise(lit(0)))
      .drop("_hot")
    val bS = b.join(broadcast(hot), blockCols, "left")
      .withColumn("_salt", explode(when(col("_hot").isNotNull,
        sequence(lit(0), lit(salt - 1))).otherwise(array(lit(0)))))
      .drop("_hot")
    val score = rules.map(r =>
      when(r.agree, lit(r.wAgree)).otherwise(lit(r.wDisagree))).reduce(_ + _)
    aS.join(bS, blockCols :+ "_salt")
      .withColumn("fs_score", (round(score, 6) + lit(0.0)))
      .drop("_salt")
  }

  /** Self-tuning scorer: profiles the a-side block-key distribution
    * with [[Diagnostics.keySkewReport]] and follows its own advice —
    * plain equi-join when the report says `salt_factor` 1, otherwise
    * the differentially-salted plan with the recommended factor
    * (capped at `maxSalt`; past ~64-way the per-task pair count is no
    * longer the bottleneck) and hot = 2× the mean block size (the
    * report's own hot-key definition). The report is one metadata-
    * scale row — the only driver state this decision reads.
    */
  def scorePairsSkewAware(a: DataFrame, aId: String, b: DataFrame,
                          blockCols: Seq[String], rules: Seq[FieldRule],
                          maxSalt: Int = 64): DataFrame = {
    val rep = Diagnostics
      .keySkewReport(a, struct(blockCols.map(col): _*))
      .select(col("salt_factor"), col("avg_key_rows")).head()
    val saltF = math.min(rep.getLong(0), maxSalt.toLong).toInt
    if (saltF < 2) scorePairs(a, b, blockCols, rules)
    else scorePairsSalted(a, aId, b, blockCols, rules, saltF,
      hotThreshold = math.max(math.ceil(rep.getDouble(1) * 2).toLong, 1L))
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
