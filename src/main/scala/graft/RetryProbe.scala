package graft

import java.util.concurrent.atomic.AtomicBoolean

import graft.operators.Skew
import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Chaos probe: inject a one-shot task failure into the salted-aggregate
  * stage and assert the retried computation equals the plain aggregate.
  *
  * This is the runtime check behind the deterministic-salt rule
  * (SURVEY §7 hard-part 2): the salt is a content hash, so a retried
  * task re-salts every row into the SAME bucket and the two-phase
  * aggregate stays exact. With the old nondeterministic salt
  * (partition id + monotonically_increasing_id) a recomputation could
  * re-bucket rows mid-aggregate. Scope: this drives TASK retry; the
  * fetch-failure STAGE-recompute case follows from the same
  * determinism argument (the salt depends only on row content).
  *
  * A main, not a spec: it needs `local[4,4]` (task maxFailures = 4),
  * and the shared test session's context can't be reconfigured —
  * `runMain` forks a fresh JVM instead.
  */
object RetryProbe {
  private val injected = new AtomicBoolean(false)
  private val injectedDedup = new AtomicBoolean(false)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4,4]") // 4 threads, 4 task attempts
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val failOnce = udf { (x: Double) =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0 &&
          injected.compareAndSet(false, true)) {
        throw new RuntimeException("injected failure (retry probe)")
      }
      x
    }

    val base = spark.range(200000).select(
      when(pmod(col("id"), lit(10)) === 0, lit("hot"))
        .otherwise(concat(lit("k"), pmod(col("id"), lit(7)))).as("key"),
      (col("id") % 1000).cast("double").as("v"))

    val plain = base.groupBy("key")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap

    // the failing column is computed in the same stage as the salt +
    // partial aggregate, so the injected failure retries that stage's task
    val salted = Skew.saltedAggregate(
      base.withColumn("v", failOnce(col("v"))),
      keyCols = Seq("key"), saltBuckets = 8,
      partials = Seq("s" -> sum(col("v")), "n" -> count(lit(1))),
      finals = Seq("s" -> sum(col("s")), "n" -> sum(col("n"))))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap

    val ok = salted == plain && injected.get()
    println(s"""{"probe":"salted_agg_task_retry","injected":${injected.get()},"match":${salted == plain},"pass":$ok}""")

    // Probe 2: the dedup pipeline under task retry. Every keeper rule in
    // the suite (md5 hashing, min-label components, min-(doc,pos)
    // canonical occurrences) is content-deterministic, so a retried task
    // must reproduce identical clusters — this drives that claim, not
    // just asserts it. The failure is injected into the text column, so
    // it fires inside the shingle/signature map stage.
    val failTextOnce = udf { (t: String) =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0 &&
          injectedDedup.compareAndSet(false, true)) {
        throw new RuntimeException("injected failure (dedup retry probe)")
      }
      t
    }
    // 2000 docs over 1800 distinct texts: 200 exact-duplicate pairs plus
    // whatever the banding finds — enough cluster structure to catch a
    // re-bucketed retry
    def docsWith(textCol: org.apache.spark.sql.Column) =
      spark.range(2000).select(col("id").as("doc_id"),
        textCol.as("text")).repartition(8)
    val textExpr = expr("concat_ws(' ', transform(sequence(1, 20), " +
      "i -> concat('t', pmod(hash(pmod(id, 1800), i), 500))))")
    // The CANONICAL facade pipeline, not a re-implementation — if the
    // corpus-dedup edge construction ever changes shape, the probe tests
    // the new shape automatically.
    def clusters(docs: org.apache.spark.sql.DataFrame) =
      Graft.dedupCorpus(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2))))
        .toMap
    val cleanClusters = clusters(docsWith(textExpr))
    val chaosClusters = clusters(docsWith(failTextOnce(textExpr)))
    val ok2 = cleanClusters == chaosClusters && injectedDedup.get()
    println(s"""{"probe":"dedup_pipeline_task_retry","injected":${injectedDedup.get()},"match":${cleanClusters == chaosClusters},"clusters":${cleanClusters.size},"pass":$ok2}""")
    spark.stop()
    if (!ok || !ok2) sys.exit(1)
  }
}
