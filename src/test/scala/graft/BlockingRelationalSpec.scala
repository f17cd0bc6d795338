package graft

import graft.operators.{Blocking, Relational}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BlockingRelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("withBlockId assigns bsize rows per block in order") {
    val df = (1 to 25).toDF("x")
    val blocks = Blocking.withBlockId(df, bsize = 10, Seq(col("x")))
      .groupBy("block_id").count().orderBy("block_id")
      .as[(Long, Long)].collect()
    assert(blocks.toSeq === Seq((0L, 10L), (1L, 10L), (2L, 5L)))
  }

  test("blockRows/unblock round-trips") {
    val df = Blocking.withBlockId((1 to 7).toDF("x"), 3, Seq(col("x")))
    val back = Blocking.unblock(Blocking.blockRows(df, Seq("x")))
      .select("x").as[Int].collect().sorted
    assert(back.toSeq === (1 to 7))
  }

  test("partition-local block ids bound block sizes without shuffling") {
    val df = (1 to 1000).toDF("x").repartition(7)
    val blocks = Blocking.withPartitionLocalBlockId(df, bsize = 16)
      .groupBy("block_id").count()
    val maxPerBlock = blocks.agg(max("count")).head.getLong(0)
    assert(maxPerBlock <= 16)        // ids unique across partitions
    assert(blocks.count() >= 1000 / 16)
  }

  test("D11 lineage surface: repartition, persist/unpersist, localCheckpoint") {
    import org.apache.spark.storage.StorageLevel
    val df = (1 to 100).toDF("x")
    // repartition controls physical parallelism
    assert(df.repartition(9).rdd.getNumPartitions === 9)
    // persist marks the plan cacheable; unpersist releases it
    val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    assert(cached.storageLevel === StorageLevel.MEMORY_AND_DISK)
    cached.count()
    cached.unpersist(blocking = true)
    assert(cached.storageLevel === StorageLevel.NONE)
    // localCheckpoint truncates lineage: the checkpointed plan reads
    // materialized blocks (LogicalRDD), not the original expressions —
    // the property the iterative components/dedup paths rely on to keep
    // plan size O(1) across rounds
    val ck = df.withColumn("y", col("x") * 2).localCheckpoint()
    assert(ck.queryExecution.analyzed.isInstanceOf[
      org.apache.spark.sql.execution.LogicalRDD])
    assert(ck.agg(sum("y")).head.getLong(0) === 2L * (1 to 100).sum)
  }

  test("asofJoin picks most recent right row at or before left time") {
    val left = Seq((1, 10L), (1, 25L), (2, 5L)).toDF("k", "t")
    val right = Seq((1, 10L, 100L), (1, 20L, 200L), (2, 7L, 300L))
      .toDF("rk", "rt", "payload")
    val out = Relational.asofJoin(left, right, "k", "rk", "t", "rt",
      "payload", "got").orderBy("k", "t")
      .select("k", "t", "got").collect()
    assert(out(0).getLong(2) === 100L) // t=10 matches rt=10 inclusively
    assert(out(1).getLong(2) === 200L) // t=25 sees rt=20
    assert(out(2).isNullAt(2))         // t=5 precedes everything
  }

  test("asofJoin tie-break: equal right times pick the max rightOrder") {
    val left = Seq((1, 20L)).toDF("k", "t")
    val right = Seq((1, 20L, 5L), (1, 20L, 9L), (1, 20L, 2L))
      .toDF("rk", "rt", "payload")
    val got = Relational.asofJoin(left, right, "k", "rk", "t", "rt",
      "payload", "got").select("got").head.getLong(0)
    assert(got === 9L)
  }

  test("asofJoin with empty right side keeps left rows with null payload") {
    val left = Seq((1, 10L)).toDF("k", "t")
    val right = Seq.empty[(Int, Long, Long)].toDF("rk", "rt", "payload")
    val out = Relational.asofJoin(left, right, "k", "rk", "t", "rt",
      "payload", "got").collect()
    assert(out.length === 1 && out.head.isNullAt(out.head.fieldIndex("got")))
  }

  test("sessionize splits on gaps greater than the threshold") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 00:10:00"), 2L),
      (1L, ts("2024-01-01 01:00:00"), 3L), // 50 min gap -> new session
      (2L, ts("2024-01-01 00:00:00"), 4L)
    ).toDF("user_id", "ts", "event_id")
    val sessions = Relational.sessionize(df, "user_id", "ts", "event_id", 30)
      .groupBy("user_id", "session_id").count()
      .orderBy("user_id", "session_id")
      .as[(Long, Long, Long)].collect()
    assert(sessions.toSeq === Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("topKPerGroup returns at most k per group with rank") {
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9)).toDF("g", "v")
    val out = Relational.topKPerGroup(df, Seq(col("g")),
      Seq(col("v").desc), 2).orderBy("g", "rnk")
      .select("g", "v", "rnk").as[(String, Int, Int)].collect()
    assert(out.toSeq === Seq(("a", 3, 1), ("a", 2, 2), ("b", 9, 1)))
  }

  test("zipWithPosition pairs rows by order") {
    val a = Seq(10, 20, 30).toDF("x")
    val b = Seq("u", "v", "w").toDF("y")
    val z = Relational.zipWithPosition(a, Seq(col("x")), b, Seq(col("y")))
      .orderBy("pos").select("x", "y").as[(Int, String)].collect()
    assert(z.toSeq === Seq((10, "u"), (20, "v"), (30, "w")))
  }
}
