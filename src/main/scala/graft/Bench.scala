package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). Each query is fully executed
  * (count() drives the whole plan); a warmup pass on the smallest table
  * absorbs JVM/codegen startup so per-query numbers reflect the plans.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: trigger codegen + parquet reader init outside timed region
    spark.read.parquet(s"$sfDir/region.parquet").count()

    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.benchNames
    // Per-query numbers swing ±0.3s run to run on local[32] (GC, JIT,
    // scheduler); each query runs `runs` times and reports the MEDIAN, so
    // round-over-round deltas reflect plan changes, not run variance.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // (name, seconds, succeeded). A failed query reports -1 in the JSON and
    // is EXCLUDED from the total so a fast failure can't flatter the
    // headline number the driver consumes.
    // Release persisted/localCheckpoint blocks a query execution left
    // behind: each execution materializes fresh ones, and across 31
    // queries x 4 executions the stale blocks accumulate into
    // storage-memory pressure that inflates every LATER query's number
    // (measured: full-suite total 2.3x the per-query isolated sum before
    // this hygiene). BLOCKING, and between every execution — async
    // unpersist lets block-removal work overlap the NEXT timed region
    // (the r8 driver artifact showed checkpoint-heavy queries inflating
    // their successors). Invariant this relies on: no DataFrame is
    // memoized across queries-fn invocations — every query rebuilds its
    // frames per call, so unpersisting everything between executions can
    // never invalidate state a later execution still needs.
    def releaseAllBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))

    val results = names.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        // One untimed warmup execution per query: JIT compilation, codegen
        // cache fill, and GC pressure from earlier queries otherwise leak
        // into the first timed run and inflate tail-of-run medians
        // (r6->r7 showed uniform ~2.5x drift on six unrelated cheap
        // queries that vanished under local re-runs). NonFatal only: an
        // OOM here must crash the run, not leave a silently degraded JVM
        // producing uncomparable numbers.
        try fn(spark, sfDir).count()
        catch { case scala.util.control.NonFatal(_) => () }
        releaseAllBlocks()
        val times = (1 to runs).flatMap { _ =>
          val t0 = System.nanoTime()
          val t = try { fn(spark, sfDir).count()
            Some((System.nanoTime() - t0) / 1e9) }
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            None }
          releaseAllBlocks() // outside the timed region, before the next run
          t
        }
        if (times.size < runs) (name, -1.0, false)
        else (name, times.sorted.apply(runs / 2), true)
      }
    }
    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) f"$v%.3f" else "-1") }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
