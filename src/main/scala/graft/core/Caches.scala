package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}

/** Session-scoped registry of DataFrames an operator persisted
  * INTERNALLY and could not release itself.
  *
  * Why it exists: several operators return a LAZY result whose lineage
  * reads an internally-persisted intermediate more than once (the
  * multi-consumer-explode discipline — e.g. the LM family's
  * (doc, transition) multiplicity frame, or a phrase query's pruned
  * posting lists). The operator cannot unpersist before returning (the
  * caller has not materialized yet, so the persist would be wasted) and
  * the caller holds no reference to the intermediate — so without a
  * registry each call pins corpus-scale cache entries for the session
  * lifetime. Spark's `CacheManager` holds strong references to every
  * `persist()`ed plan, and — the r18 bench lesson — unpersisting the
  * underlying RDD blocks (`sparkContext.getPersistentRDDs`) does NOT
  * remove the `CachedData` plan entry: entries accumulate and every
  * later query's planning pays a canonicalized-plan comparison against
  * each of them.
  *
  * Contract: operators register internal persists with [[track]]; a
  * long-lived session (a query service, a bench/verify harness, a
  * notebook) calls [[release]] between independent jobs, AFTER
  * materializing the results it needs. Releasing is always safe for
  * correctness — persist is an optimization, a released frame
  * recomputes from lineage — it only forfeits reuse within a job that
  * is still running, so release at job boundaries.
  *
  * Frames that an operator CAN release itself (it runs an internal
  * action before returning, e.g. GD training or an eager index build)
  * follow the materialize-then-unpersist discipline at the call site
  * instead ([[graft.text.Curation]] scoredDisposition) and never land
  * here.
  */
object Caches {

  private val frames =
    scala.collection.mutable.Map.empty[
      SparkSession, scala.collection.mutable.ArrayBuffer[Dataset[_]]]

  /** Drop entries whose SparkContext has stopped — their blocks died
    * with the executors, so only the Map's strong references (session +
    * plan trees) remain, and a service that cycles sessions without
    * calling release() would otherwise pin every dead session's tracked
    * plans for the JVM lifetime. Callers never see this: it runs inside
    * every [[track]]/[[release]], so the registry is bounded by LIVE
    * sessions' tracked frames. Must be called while synchronized.
    */
  private def sweepStopped(): Unit =
    frames.keys.filter(_.sparkContext.isStopped).toSeq
      .foreach(frames.remove)

  /** Register an internally-persisted frame for later [[release]];
    * returns it unchanged so call sites stay expression-shaped.
    */
  def track[A](df: Dataset[A]): Dataset[A] = synchronized {
    sweepStopped()
    frames.getOrElseUpdate(df.sparkSession,
      scala.collection.mutable.ArrayBuffer.empty) += df
    df
  }

  /** Unpersist every frame tracked against `spark` (removing both the
    * storage blocks and the CacheManager plan entry — `df.unpersist`,
    * unlike RDD-level unpersist, drops the `CachedData` record).
    * Non-blocking: block removal overlaps the caller's next job.
    * Returns the number of frames released. Idempotent; a frame the
    * caller already unpersisted is a no-op.
    */
  def release(spark: SparkSession): Int = {
    val fs = synchronized { sweepStopped(); frames.remove(spark) }
      .getOrElse(scala.collection.mutable.ArrayBuffer.empty)
    fs.foreach { df =>
      try df.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
      // localCheckpointed frames (r22): their blocks live on the plan's
      // LogicalRDD leaf, not in the CacheManager — df.unpersist alone
      // would leak them across a long verify session. Extracted from
      // the tracked frame's OWN plan, so this can never free another
      // query's storage; unpersist is idempotent.
      try df.queryExecution.logical.collect {
        case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
      }.foreach(_.unpersist(false))
      catch { case scala.util.control.NonFatal(_) => () }
    }
    fs.size
  }

  /** Frames currently tracked for `spark` (diagnostics / specs). */
  def trackedCount(spark: SparkSession): Int = synchronized {
    frames.get(spark).map(_.size).getOrElse(0)
  }

  /** Sessions currently holding tracked frames (diagnostics / specs) —
    * bounded by LIVE sessions thanks to the stopped-session sweep.
    */
  def sessionCount: Int = synchronized { sweepStopped(); frames.size }
}
