package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators beyond the built-in `Dataset` surface.
  *
  * The reference has only positional zip (`DictRDD.__init__`,
  * `splearn/rdd.py:~L500`) and broadcast-state application; everything here
  * is the Spark-native superset (SURVEY §2.8) with 100 TB execution notes
  * per operator.
  */
object Relational {

  /** As-of join: for each left row, the single most recent right row with
    * `rightTime <= leftTime` (inclusive), per key.
    *
    * Scale design: implemented as union + single hash-partitioned window —
    * ONE shuffle on the key, no join blow-up, no per-row range probe. This
    * is the plan that survives 100 TB: a join-then-filter formulation
    * multiplies rows by matches-per-key before pruning; the union-window
    * formulation is linear in |left| + |right| and AQE handles key skew.
    *
    * Tie-break: among right rows sharing the max admissible time, the one
    * with the greatest `rightOrder` wins.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightOrder: String,
      payloadAlias: String): DataFrame = {
    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_payload", lit(null).cast(right.schema(rightOrder).dataType))
      .withColumn("_ord", lit(null).cast(right.schema(rightOrder).dataType))
    val r = right
      .select(
        col(rightKey).as("_k"),
        col(rightTime).as("_t"),
        lit(0).as("_side"),
        col(rightOrder).as("_payload"),
        col(rightOrder).as("_ord"))
    val lCols = left.columns.map(col)
    // right rows sort before left rows at equal time (inclusive as-of);
    // among equal right times the largest _ord is seen last.
    val w = Window
      .partitionBy("_k")
      .orderBy(col("_t").asc, col("_side").asc, col("_ord").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select((lCols :+ col("_k") :+ col("_t") :+ col("_side") :+
        col("_payload") :+ col("_ord")): _*)
      .unionByName(r.select(col("_k"), col("_t"), col("_side"),
        col("_payload"), col("_ord")), allowMissingColumns = true)
      .withColumn(payloadAlias, last(col("_payload"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(lCols :+ col(payloadAlias): _*)
  }

  /** Distributed top-k per group: per-partition rank prune would be the
    * manual route; `row_number` over a hash-partitioned window already
    * executes as partial top-k under AQE. Ties broken by `tieBreak`.
    */
  def topKPerGroup(
      df: DataFrame,
      partitionCols: Seq[Column],
      orderCols: Seq[Column],
      k: Int,
      rankAlias: String = "rnk"): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    df.withColumn(rankAlias, row_number().over(w))
      .where(col(rankAlias) <= k)
  }

  /** Positional zip of two DataFrames (reference `DictRDD` zip,
    * `splearn/rdd.py:~L500`): row i of `a` (ordered by `aOrder`) pairs with
    * row i of `b` (ordered by `bOrder`). Requires deterministic per-side
    * orderings — `monotonically_increasing_id` is NOT deterministic across
    * retries, so ids come from `row_number` (SURVEY §7 hard-part 2).
    */
  def zipWithPosition(
      a: DataFrame, aOrder: Seq[Column],
      b: DataFrame, bOrder: Seq[Column]): DataFrame = {
    val an = a.withColumn("pos", row_number().over(Window.orderBy(aOrder: _*)))
    val bn = b.withColumn("pos", row_number().over(Window.orderBy(bOrder: _*)))
    an.join(bn, "pos")
  }

  /** Sessionization on a static frame: contiguous events of one key with
    * gaps <= `gapMinutes` share a session. One shuffle (window by key);
    * the streaming twin is `session_window` in [[graft.streaming.EventStreams]].
    */
  def sessionize(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieBreak: String,
      gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieBreak))
    val prev = lag(col(tsCol), 1).over(w)
    df.withColumn("_new_session",
        when(prev.isNull ||
          col(tsCol) > prev + expr(s"INTERVAL $gapMinutes MINUTES"), 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("_new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new_session")
  }

  /** Bloom-filter pre-join pruning — the explicit, any-scale form of
    * Catalyst's `InjectRuntimeFilter` (which uses the SAME two catalyst
    * expressions but only fires past multi-GB application-side scan
    * thresholds): build a bloom filter over the dim side's join keys,
    * hold it as a literal (driver state = numBits/8 bytes, the
    * heavyHitters-bitmap pattern), and filter the fact side IN-ROW
    * before its join shuffle. False positives survive the filter and
    * die in the real join, so results are EXACTLY the plain join's —
    * what changes is shuffle volume: only rows that might match ship.
    * Worth it when the dim side is selective but too large (or too
    * late-materializing) to broadcast the join itself.
    */
  def bloomPreFilterJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                         dimKey: String,
                         expectedItems: Long = 100000L): DataFrame = {
    require(expectedItems > 0, s"expectedItems=$expectedItems must be positive")
    graft.plans.GraftExpressions.register(fact.sparkSession)
    val bf = dim
      .agg(graft.plans.GraftExpressions.bloomAgg(
        xxhash64(col(dimKey)), lit(expectedItems),
        lit(expectedItems * 8)).as("_bf"))
      .head.getAs[Array[Byte]](0)
    fact
      .where(graft.plans.GraftExpressions.bloomMightContain(
        lit(bf), xxhash64(col(factKey))))
      .join(dim, col(factKey) === col(dimKey))
  }
}
