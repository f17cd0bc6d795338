package graft.stats

import graft.plans.GraftExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005): fixed-size frequency
  * estimation over an unbounded term stream — the point-query sibling of
  * the HLL distinct-count sketch already in the relational surface.
  *
  * Shape for 100 TB: the sketch is `depth` × `width` counters REGARDLESS
  * of corpus size or term cardinality. The build is one explode(depth) +
  * one groupBy whose partial (map-side) aggregation caps every task's
  * shuffle contribution at depth×width rows — the full build shuffles at
  * most tasks × depth × width counter partials, never the token stream.
  * Estimation broadcasts the (tiny) sketch and probes it per query term:
  * no corpus shuffle at all. Hashing is the engine's native md5 seed
  * family ([[GraftExpressions.md5SeedHashes]], codegen'd), so every
  * counter — and therefore every estimate — is reproducible by an SQL
  * oracle, and estimates are deterministic across engines, retries, and
  * partitionings.
  *
  * CMS guarantee (one-sided): estimate >= true count always; with
  * probability 1−(1/e)^depth the overestimate is < e/width × total
  * tokens. Choose width ~ e/ε for ε-accurate heavy hitters.
  */
object Sketches {

  /** Build the sketch: one row per touched (row_i, cell), `counter` =
    * number of term instances hashing there. Untouched cells are zero
    * and simply absent (sparse form; the dense array is `depth`×`width`
    * if a consumer wants to export it).
    */
  def countMinSketch(terms: DataFrame, termCol: String,
                     depth: Int = 4, width: Int = 512): DataFrame = {
    require(depth >= 1 && width >= 1, s"depth=$depth, width=$width invalid")
    GraftExpressions.register(terms.sparkSession)
    terms
      .select(posexplode(GraftExpressions.md5SeedHashes(
        col(termCol), lit(depth))).as(Seq("i", "_h")))
      .groupBy(col("i"), pmod(col("_h"), lit(width.toLong)).as("cell"))
      .agg(count(lit(1)).as("counter"))
  }

  /** EXACT heavy hitters through an approximate gate — the two-pass
    * pattern that makes frequent-item queries scale: pass 1 builds the
    * fixed-size CMS and keeps only cells with counter >= threshold (a
    * depth×width bitmap, O(1) driver state like a fitted model); pass 2
    * re-streams the input, drops every instance whose term misses ANY
    * hot cell (an in-row check against the broadcast bitmap — no join,
    * no shuffle), and exact-counts only the survivors. CMS estimates
    * are one-sided (estimate >= true count), so a term with true count
    * >= threshold has ALL its cells hot — the gate passes a SUPERSET of
    * the real heavy hitters and the final exact filter makes the answer
    * EXACT, while the second pass's shuffle is bounded by candidate
    * instances rather than the full term cardinality.
    *
    * Sizing: the gate only prunes while width >~ e·N/threshold (below
    * that, average cell mass exceeds the threshold and every cell goes
    * hot — still exact, just unpruned). At 100 TB choose width per
    * stream mass; it costs depth×width longs wherever it goes.
    */
  def heavyHitters(terms: DataFrame, termCol: String, threshold: Long,
                   depth: Int = 4, width: Int = 4096): DataFrame = {
    require(threshold >= 1, s"threshold=$threshold must be positive")
    GraftExpressions.register(terms.sparkSession)
    val hot = new Array[Int](depth * width)
    countMinSketch(terms, termCol, depth, width)
      .where(col("counter") >= threshold)
      .collect()
      .foreach(r => hot(r.getInt(0) * width + r.getLong(1).toInt) = 1)
    val hotCol = typedlit(hot.toSeq)
    val gate = forall(
      transform(
        GraftExpressions.md5SeedHashes(col(termCol), lit(depth)),
        (hv, i) => element_at(hotCol,
          (i * width + pmod(hv, lit(width.toLong))).cast("int") + 1) === 1),
      b => b)
    terms
      .where(gate)
      .groupBy(col(termCol))
      .agg(count(lit(1)).as("n_occurrences"))
      .where(col("n_occurrences") >= threshold)
  }

  /** Throughput twin of [[countMinSketch]] (the `minhashSignaturesFast`
    * precedent): xxhash64 with the depth index folded in as a seed
    * column instead of the md5 seed family — roughly an order of
    * magnitude cheaper per instance (measured: 100M-term build 111.7s
    * md5 → 9.9s xxhash64, StressBench `count_min_sketch[_fast]`), same
    * one-sided guarantee. The md5 form remains the oracle-checked one
    * (SQL-mirrorable); use this one when nothing needs to replay the
    * counters outside the engine. The two produce DIFFERENT (both
    * valid) sketches — never probe one family's sketch with the other.
    */
  def countMinSketchFast(terms: DataFrame, termCol: String,
                         depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 1, s"depth=$depth, width=$width invalid")
    terms
      .select(posexplode(array((0 until depth).map(i =>
        xxhash64(lit(i), col(termCol)).bitwiseAND(lit(Long.MaxValue))): _*))
        .as(Seq("i", "_h")))
      .groupBy(col("i"), pmod(col("_h"), lit(width.toLong)).as("cell"))
      .agg(count(lit(1)).as("counter"))
  }

  /** Point-query probe for a [[countMinSketchFast]] sketch. */
  def cmsEstimateFast(sketch: DataFrame, queryTerms: DataFrame,
                      termCol: String, depth: Int = 4,
                      width: Int = 1024): DataFrame =
    queryTerms
      .select(col(termCol), posexplode(array((0 until depth).map(i =>
        xxhash64(lit(i), col(termCol)).bitwiseAND(lit(Long.MaxValue))): _*))
        .as(Seq("i", "_h")))
      .withColumn("cell", pmod(col("_h"), lit(width.toLong)))
      .join(broadcast(sketch), Seq("i", "cell"), "left")
      .groupBy(col(termCol))
      .agg(min(coalesce(col("counter"), lit(0L))).as("cms_count"))

  /** Point-query estimates for `queryTerms` (one row per distinct term):
    * min over the sketch's depth rows of the term's cell counter. The
    * sketch is broadcast (≤ depth×width rows); the probe never shuffles
    * the query side by anything but the final per-term min.
    */
  def cmsEstimate(sketch: DataFrame, queryTerms: DataFrame, termCol: String,
                  depth: Int = 4, width: Int = 512): DataFrame = {
    GraftExpressions.register(queryTerms.sparkSession)
    queryTerms
      .select(col(termCol), posexplode(GraftExpressions.md5SeedHashes(
        col(termCol), lit(depth))).as(Seq("i", "_h")))
      .withColumn("cell", pmod(col("_h"), lit(width.toLong)))
      .join(broadcast(sketch), Seq("i", "cell"), "left")
      .groupBy(col(termCol))
      .agg(min(coalesce(col("counter"), lit(0L))).as("cms_count"))
  }
}
