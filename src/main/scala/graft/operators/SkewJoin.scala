package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-block quadratic salting as a reusable equi-join — the design
  * that survived measurement in the linkage family (SCALE.md round 12:
  * per-key split factors sized to the key, absolute per-task pair
  * budget; the report-driven flat global salt was 2.7–9.8× WORSE than
  * not salting), lifted so every blocked-pair operator shares one
  * implementation instead of re-deriving the constants.
  */
object SkewJoin {

  /** Inner equi-join `a ⋈ b` on `keyCols`, bit-identical in output to
    * `a.join(b, keyCols)`, with differential per-key salting: keys
    * whose a-side row count exceeds `hotThreshold` split
    * c² ways (c = ⌈rows/hotThreshold⌉, capped at `maxSalt`) by hashing
    * `aSplitCol`; b-side rows of hot keys replicate across that key's
    * sub-blocks, so every matching pair still meets exactly once. The
    * factor grows with the SQUARE of the key because splitting the
    * a-side s ways leaves rows²/s pairs per task — c² holds per-task
    * pairs at ~hotThreshold² regardless of key size. Cold keys pass
    * through un-replicated; a key distribution with nothing hot
    * degenerates to the plain join plus one empty broadcast.
    *
    * Use when the join's OUTPUT is quadratic per key (both sides carry
    * many rows per key — candidate generation, self-joins on coarse
    * buckets). AQE's skew-join split cannot help there: it splits by
    * shuffle-partition BYTE size, and a hot key's pair blowup happens
    * after the exchange, invisible at split-decision time.
    */
  def saltedInnerJoin(a: DataFrame, aSplitCol: Column, b: DataFrame,
                      keyCols: Seq[String], maxSalt: Int = 64,
                      hotThreshold: Long = 4096L,
                      aKeyRowBound: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "at least one join key required")
    require(maxSalt >= 2, s"maxSalt=$maxSalt: salting needs >= 2 sub-blocks")
    require(hotThreshold >= 1, s"hotThreshold=$hotThreshold must be positive")
    // Proven-cold fast path (r22): when the caller KNOWS no a-side key
    // can exceed `hotThreshold` rows (e.g. an upstream degree cap
    // already bounds rows-per-key), the hot-key frame is empty by
    // construction and the machinery below — a full a-side aggregation,
    // a broadcast, and per-row salt columns on both sides — buys
    // nothing at ANY scale. Same output by the bit-identical contract
    // (salting with an empty hot set IS the plain join).
    if (aKeyRowBound.exists(_ <= hotThreshold))
      return a.join(b, keyCols)
    // the bit-identical-to-plain-join contract depends on the temp
    // columns being OURS: withColumn would silently overwrite a user
    // column of the same name and the final drop would remove it from
    // the output, where the plain join preserves it
    val reserved = Seq("_salt", "_sn", "_bn")
    for (df <- Seq(a, b); c <- reserved)
      require(!df.columns.contains(c),
        s"saltedInnerJoin input already carries reserved temp column '$c'" +
          " — rename it before the join")
    val keys = keyCols.map(col)
    val c = ceil(col("_bn").cast("double") / lit(hotThreshold))
    val hot = a.groupBy(keys: _*).agg(count(lit(1)).as("_bn"))
      .where(col("_bn") > hotThreshold)
      .select(keys :+ least(c * c, lit(maxSalt)).cast("int").as("_sn"): _*)
    val aS = a.join(broadcast(hot), keyCols, "left")
      .withColumn("_salt", when(col("_sn").isNotNull,
        pmod(xxhash64(aSplitCol), col("_sn")).cast("int")).otherwise(lit(0)))
      .drop("_sn")
    val bS = b.join(broadcast(hot), keyCols, "left")
      .withColumn("_salt", explode(when(col("_sn").isNotNull,
        sequence(lit(0), col("_sn") - 1)).otherwise(array(lit(0)))))
      .drop("_sn")
    aS.join(bS, keyCols :+ "_salt").drop("_salt")
  }
}
