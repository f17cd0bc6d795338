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
    val score = rules.map(r =>
      when(r.agree, lit(r.wAgree)).otherwise(lit(r.wDisagree))).reduce(_ + _)
    SkewJoin.saltedInnerJoin(a, col(aId), b, blockCols, maxSalt,
        hotThreshold)
      .withColumn("fs_score", (round(score, 6) + lit(0.0)))
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

  /** Fellegi–Sunter parameter ESTIMATION: m/u/p by fixed-round EM over
    * blocked candidate pairs (Winkler 1988's unsupervised fit — the
    * step that turns [[FieldRule]]'s "published or estimated
    * parameters" from an assumption into an output). `pairs` carries
    * one boolean agreement column per field (built by the caller from
    * the same predicates the rules use); the latent match indicator
    * is integrated out the standard way: per pair
    * g = p·Π m^a(1−m)^(1−a) / (p·Π m^a(1−m)^(1−a) + (1−p)·Π u^a(1−u)^(1−a)),
    * then m ← Σg·a/Σg, u ← Σ(1−g)a/Σ(1−g), p ← Σg/N per field.
    *
    * Determinism contract (the pageRank/c4 pattern): FIXED round count
    * from fixed starts — every estimate is a pure arithmetic function
    * of the pair set, so an unrolled SQL oracle replays the fit round
    * for round. Each round is ONE aggregate over the pairs (2K+3
    * scalars — map-side combinable); the only driver state is that
    * one parameter row per round, metadata-scale by construction.
    *
    * Returns one row per field: (field, m, u, w_agree, w_disagree, p)
    * with the log2 match weights ready to feed [[FieldRule]].
    *
    * Degeneracy guards: a null agreement value would silently skew the
    * sums against count(*), so null rows are dropped before the fit
    * (an agreement predicate that can't decide a pair contributes no
    * evidence); and the E-step responsibilities are clamped into
    * (eps, n−eps) — on a pair set where every pair agrees on every
    * field (or none does), the raw update divides by zero and every
    * later round is NaN. The clamp keeps the fit finite and pins the
    * parameters at the boundary the data actually supports; m/u are
    * clamped the same way so the log2 weights stay finite.
    */
  def estimateMU(pairs: DataFrame, agreeCols: Seq[(String, Column)],
                 rounds: Int = 3, m0: Double = 0.9, u0: Double = 0.1,
                 p0: Double = 0.1): DataFrame = {
    require(agreeCols.nonEmpty, "at least one agreement field required")
    require(rounds >= 1, s"rounds=$rounds must be positive")
    val eps = 1e-9
    def clamp(x: Double, lo: Double, hi: Double): Double =
      math.min(math.max(x, lo), hi)
    val names = agreeCols.map(_._1)
    // candidate-pair-sized and re-read every EM round (the round loop
    // only updates driver scalars, so lineage does not grow) — DISK_ONLY
    // persist per the r9 durability criterion
    val a = pairs.select(agreeCols.map { case (n, c) =>
      c.cast("int").cast("double").as(s"_a_$n") }: _*)
      .na.drop()
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    var ms = names.map(_ => m0)
    var us = names.map(_ => u0)
    var p = p0
    for (_ <- 1 to rounds) {
      val wm = names.zip(ms).map { case (n, m) =>
        col(s"_a_$n") * lit(m) + (lit(1.0) - col(s"_a_$n")) * lit(1.0 - m) }
        .reduce(_ * _) * lit(p)
      val wu = names.zip(us).map { case (n, u) =>
        col(s"_a_$n") * lit(u) + (lit(1.0) - col(s"_a_$n")) * lit(1.0 - u) }
        .reduce(_ * _) * lit(1.0 - p)
      val g = (wm / (wm + wu)).as("_g")
      val aggs =
        Seq(sum(col("_g")).as("_sg"), count(lit(1)).cast("double").as("_n")) ++
          names.map(n => sum(col("_g") * col(s"_a_$n")).as(s"_sga_$n")) ++
          names.map(n => sum(col(s"_a_$n")).as(s"_sa_$n"))
      val row = a.withColumn("_g", g)
        .agg(aggs.head, aggs.tail: _*)
        .head() // one metadata-scale row per round (the BPE argmax shape)
      val n = row.getAs[Double]("_n")
      require(n > 0, "estimateMU: empty pair set after null-filtering")
      val sg = clamp(row.getAs[Double]("_sg"), eps, n - eps)
      ms = names.map(nm =>
        clamp(row.getAs[Double](s"_sga_$nm") / sg, eps, 1 - eps))
      us = names.map(nm =>
        clamp((row.getAs[Double](s"_sa_$nm") -
          row.getAs[Double](s"_sga_$nm")) / (n - sg), eps, 1 - eps))
      p = clamp(sg / n, eps, 1 - eps)
    }
    // the result below is built from DRIVER scalars — a served only the
    // (already-run) EM rounds, so it releases here instead of leaking
    // for the session (the Curation materialize-then-unpersist pattern)
    a.unpersist(blocking = false)
    val spark = pairs.sparkSession
    import spark.implicits._
    names.zip(ms.zip(us)).map { case (nm, (m, u)) =>
      (nm,
        BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(u).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(math.log(m / u) / math.log(2.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(math.log((1 - m) / (1 - u)) / math.log(2.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(p).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("field", "m", "u", "w_agree", "w_disagree", "p")
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
