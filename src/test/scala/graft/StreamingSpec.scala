package graft

import java.nio.file.Files

import graft.streaming.{EventStreams, NbCountStore}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val ts = (s: String) => java.sql.Timestamp.valueOf(s)

  /** Write a small frame as parquet and re-read it as a file stream —
    * exercises the real streaming source path, not test doubles.
    */
  private def streamOf(df: org.apache.spark.sql.DataFrame) = {
    val dir = Files.createTempDirectory("graft_stream_").toString
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    spark.readStream.schema(df.schema).parquet(dir)
  }

  private def runToTable(stream: org.apache.spark.sql.DataFrame,
                         name: String, mode: String = "append") = {
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    spark.table(name)
  }

  private lazy val events = Seq(
    (1L, ts("2024-01-01 00:05:00"), "click", 1.0),
    (2L, ts("2024-01-01 00:25:00"), "click", 2.0),
    (3L, ts("2024-01-01 01:10:00"), "view", 3.0),
    (4L, ts("2024-01-01 01:20:00"), "click", 4.0)
  ).toDF("user_id", "ts", "event_type", "value")

  test("tumbling window aggregation over a file stream") {
    // complete mode: a single AvailableNow batch never advances the
    // watermark past the last window, so append would emit nothing
    val out = runToTable(EventStreams.tumblingCounts(streamOf(events)),
      "t_tumbling", mode = "complete")
    val got = out.select("window_start", "event_type", "n_events")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(got === Set(
      (ts("2024-01-01 00:00:00"), "click", 2L),
      (ts("2024-01-01 01:00:00"), "view", 1L),
      (ts("2024-01-01 01:00:00"), "click", 1L)))
  }

  test("session windows group events within the gap") {
    val df = Seq(
      (7L, ts("2024-01-01 00:00:00"), "click", 1.0),
      (7L, ts("2024-01-01 00:10:00"), "click", 1.0),
      (7L, ts("2024-01-01 03:00:00"), "click", 1.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val out = runToTable(EventStreams.sessionCounts(streamOf(df)), "t_session",
      mode = "complete")
    val sessions = out.select("n_events").as[Long].collect().sorted
    assert(sessions.toSeq === Seq(1L, 2L))
  }

  test("dropDuplicatesWithinWatermark removes in-horizon dups") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), "click", 5.0),
      (1L, ts("2024-01-01 00:01:00"), "click", 5.0), // dup within horizon
      (1L, ts("2024-01-01 00:02:00"), "view", 5.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val out = runToTable(EventStreams.dedupWithinWatermark(streamOf(df)), "t_dedup")
    assert(out.count() === 2)
  }

  test("id-keyed dedup drops a cross-batch replay of a seen event id") {
    // batch 1: two events; batch 2: an exact replay of event 10 (same id,
    // in-horizon event time) plus one genuinely new event — the replay
    // must hit live dedup state and vanish, the new id must emit.
    val dir = Files.createTempDirectory("graft_replay_").toString
    val mk = (rows: Seq[(Long, java.sql.Timestamp, String, Double)]) =>
      rows.toDF("event_id", "ts", "event_type", "value")
    mk(Seq(
      (10L, ts("2024-01-01 00:00:00"), "click", 1.0),
      (11L, ts("2024-01-01 00:10:00"), "view", 2.0)))
      .coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(1100) // file-source ordering is by modification time
    mk(Seq(
      (10L, ts("2024-01-01 00:00:00"), "click", 1.0), // replayed copy
      (12L, ts("2024-01-01 00:20:00"), "click", 3.0)))
      .coalesce(1).write.mode("append").parquet(dir)
    val stream = spark.readStream
      .schema(mk(Seq.empty).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val out = runToTable(EventStreams.dedupByIdWithinWatermark(stream),
      "t_replay_gate")
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(out === Seq(10L, 11L, 12L))
  }

  test("flatMapGroupsWithState keeps running per-user custom state") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), "click", 2.0),
      (1L, ts("2024-01-01 00:05:00"), "click", 3.0),
      (2L, ts("2024-01-01 00:06:00"), "view", 7.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val q = EventStreams.runningUserStats(streamOf(df))
      .writeStream.format("memory").queryName("t_state")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("t_state")
      .select("user_id", "n_events", "sum_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(got === Set((1L, 2L, 5.0), (2L, 1L, 7.0)))
  }

  test("incremental NB counts via foreachBatch accumulate across batches") {
    val store = new NbCountStore
    val docs = Seq(("en", "hello world"), ("fr", "bonjour monde"),
      ("en", "hello again")).toDF("lang", "text")
    val q = streamOf(docs).writeStream
      .foreachBatch(NbCountStore.merger(store))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(store.get("en", "hello") === 2L)
    assert(store.get("fr", "monde") === 1L)
  }

  test("distributed NB running counts accumulate in keyed state across batches") {
    val dir = Files.createTempDirectory("graft_nbstate_").toString
    val b1 = Seq(("en", "hello world")).toDF("lang", "text")
    b1.coalesce(1).write.mode("append").parquet(dir)
    Seq(("en", "hello again"), ("fr", "bonjour monde"))
      .toDF("lang", "text").coalesce(1).write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EventStreams.nbRunningCounts(stream)
      .writeStream.format("memory").queryName("t_nb_state")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // Counts are monotone, so max per key = the final running total;
    // "hello" must have accumulated across the two micro-batches.
    val finals = spark.table("t_nb_state")
      .groupBy("lang", "term").agg(max("count").as("c"))
      .as[(String, String, Long)].collect()
      .map { case (l, t, c) => (l, t) -> c }.toMap
    assert(finals(("en", "hello")) === 2L)
    assert(finals(("en", "world")) === 1L)
    assert(finals(("fr", "bonjour")) === 1L)
    // And the driver never saw per-term state: result arrived via the
    // sink, state lives in the store. (Structural assertion: two
    // emissions for the accumulated key — one per touching batch.)
    val helloEmissions = spark.table("t_nb_state")
      .where(col("lang") === "en" && col("term") === "hello").count()
    assert(helloEmissions === 2L)
  }

  test("streaming near-dup gate: stream-static band join flags dups only") {
    import graft.dedup.Dedup
    val corpus = Seq((0L, "a b c d e f"), (1L, "x y z w q r"))
      .toDF("doc_id", "text")
    val index = Dedup.bandSignatures(
        Dedup.minhashSignatures(Dedup.shingles(corpus, "doc_id", "text"),
          "doc_id"), "doc_id")
      .select("band", "band_sig").distinct()
    val incoming = Seq(
      (100L, "a b c d e f"),       // dup of corpus doc 0
      (101L, "m n o p q s t")      // novel
    ).toDF("doc_id", "text")
    val out = runToTable(
      Dedup.nearDupAgainstIndex(streamOf(incoming), index, "doc_id", "text"),
      "t_neardup_gate")
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(100L))
  }

  test("streaming tumbling counts equal the batch twin on REAL events") {
    // stream the actual events parquet (nanos ts -> µs like Tables.events)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = graft.core.Tables.normalizeTs(
      spark.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
    val out = runToTable(EventStreams.tumblingCounts(stream),
      "t_real_events", mode = "complete")
      .select(col("window_start"), col("event_type"), col("n_events"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet

    val batch = graft.core.Tables(spark, dir).events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(out === batch)
    assert(out.nonEmpty)
  }

  test("stream-stream join matches purchases to in-window clicks") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), "click", 0.0),
      (1L, ts("2024-01-01 00:30:00"), "purchase", 9.99), // within 1h of click
      (1L, ts("2024-01-01 05:00:00"), "purchase", 5.00), // no click in window
      (2L, ts("2024-01-01 00:10:00"), "purchase", 1.00)  // user 2 never clicked
    ).toDF("user_id", "ts", "event_type", "value")
      .withColumn("event_id", col("user_id") * 100 +
        (unix_timestamp(col("ts")) % 10000))
    val out = runToTable(EventStreams.purchasesAfterClicks(streamOf(df)),
      "t_ss_join")
    val got = out.select("user_id", "value").as[(Long, Double)].collect().toSet
    assert(got === Set((1L, 9.99)))
  }

  test("streaming parquet sink with checkpoint round-trips") {
    val out = Files.createTempDirectory("graft_sink_").toString
    val chk = Files.createTempDirectory("graft_chk_").toString
    val df = Seq((1L, ts("2024-01-01 00:00:00"), "click", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
    val q = streamOf(df).writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.read.parquet(out).count() === 1)
  }

  test("left-outer stream-stream join emits null-padded rows after eviction") {
    // two micro-batches: batch 1 holds the real events; batch 2 is a
    // far-future flush on BOTH sides (global watermark = min across
    // sides) that lets the join state evict and emit unmatched purchases
    val dir = Files.createTempDirectory("graft_ssl_").toString
    val mk = (rows: Seq[(Long, java.sql.Timestamp, String, Double)]) =>
      rows.toDF("user_id", "ts", "event_type", "value")
        .withColumn("event_id", col("user_id") * 1000 +
          (unix_timestamp(col("ts")) % 100000))
    val batch1 = mk(Seq(
      (1L, ts("2024-01-01 00:00:00"), "click", 0.0),
      (1L, ts("2024-01-01 00:30:00"), "purchase", 9.99), // matched
      (1L, ts("2024-01-01 05:00:00"), "purchase", 5.00), // no in-window click
      (2L, ts("2024-01-01 00:10:00"), "purchase", 1.00)  // user 2 never clicked
    ))
    val batch2 = mk(Seq(
      (9L, ts("2024-01-03 00:00:00"), "click", 0.0),
      (9L, ts("2024-01-03 00:00:01"), "purchase", 0.01)))
    batch1.coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(1100) // file-source ordering is by modification time
    batch2.coalesce(1).write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(batch1.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val out = runToTable(EventStreams.purchasesWithOptionalClicks(stream),
      "t_ss_left")
      .where(col("user_id") < 9)
      .select(col("user_id"), col("value"), col("click_id").isNull.as("unmatched"))
      .as[(Long, Double, Boolean)].collect().toSet
    assert(out === Set((1L, 9.99, false), (1L, 5.00, true), (2L, 1.00, true)))
  }

  test("idempotent foreachBatch: a retried batch id is not applied twice") {
    import graft.streaming.{EventStreams, NbCountStore}
    val store = new NbCountStore
    val sink = EventStreams.idempotentForeachBatch(NbCountStore.merger(store))
    val batch = Seq(("en", "hello hello"), ("de", "welt"))
      .toDF("lang", "text")
    sink(batch, 7L)   // first delivery
    sink(batch, 7L)   // simulated retry of the SAME epoch
    sink(batch, 8L)   // next epoch applies normally
    assert(store.get("en", "hello") === 4L) // 2 per applied batch, 2 batches
    assert(store.get("de", "welt") === 2L)
  }

  test("rate-source soak: continuous micro-batches stay healthy") {
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", 5000).load()
    val agg = rate.withWatermark("timestamp", "2 seconds")
      .groupBy(window(col("timestamp"), "1 second"))
      .agg(sum(col("value")).as("s"), count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("t_rate_soak")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      val deadline = System.currentTimeMillis() + 20000
      var processed = 0L
      while (processed < 10000 && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        processed = q.recentProgress.map(_.numInputRows).sum
      }
      assert(q.isActive, "query died during soak")
      assert(q.exception.isEmpty, s"streaming exception: ${q.exception}")
      assert(processed >= 10000, s"only $processed rows in 20s soak")
    } finally q.stop()
  }

  test("NbCountStore merge is order-insensitive (associative+commutative)") {
    val gen = Gen.listOfN(20,
      for {
        k <- Gen.oneOf("a", "b", "c"); t <- Gen.oneOf("x", "y")
        v <- Gen.choose(1L, 5L)
      } yield ((k, t), v))
    val prop = Prop.forAll(gen) { entries =>
      val s1 = new NbCountStore; val s2 = new NbCountStore
      entries.foreach(e => s1.merge(Seq(e)))           // one at a time
      scala.util.Random.shuffle(entries).grouped(7)    // shuffled batches
        .foreach(s2.merge(_))
      s1.snapshot == s2.snapshot
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop).passed)
  }

  /** Poll until `cond` holds (querying a live TTL stream: with
    * ProcessingTimeTimeout configured the engine keeps running
    * timer-check batches, so `noNewData` is never latched and
    * `processAllAvailable` cannot be used as a barrier — condition
    * polling is the correct wait primitive here).
    */
  private def eventually(what: String, timeoutMs: Long = 60000)
                        (cond: => Boolean): Unit = {
    val end = System.currentTimeMillis + timeoutMs
    while (!cond && System.currentTimeMillis < end) Thread.sleep(200)
    assert(cond, s"not reached within ${timeoutMs}ms: $what")
  }

  private def stateTotal(
      q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    Option(q.lastProgress)
      .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)

  test("selfNearDupFlags TTL: idle buckets evict, an expired bucket re-admits") {
    // One continuous query (processing-time timeouts fire between
    // micro-batches of the SAME query):
    //   batch 1: docs 0,1 share all 4 buckets -> doc 1 flags, state = 4
    //   idle past the 2s TTL -> all 4 buckets evict (state -> 0)
    //   then doc 10 repeats doc 0's text -> its buckets were evicted,
    //   so it RE-ADMITS (not flagged) and re-seeds state to 4
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().select(col("_1").as("doc_id"),
      col("_2").as("text"))
    val ttl = 2000L
    val ckpt = Files.createTempDirectory("graft_ttl_ckpt_").toString
    val q = EventStreams
      .selfNearDupFlags(docs, "doc_id", "text", ttlMs = ttl).toDF()
      .writeStream.format("memory").queryName("t_ttl_selfdedup")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      input.addData((0L, "a b c d e f"), (1L, "a b c d e f"))
      eventually("doc 1 flags against doc 0") {
        spark.table("t_ttl_selfdedup").as[(Long, Long)].collect()
          .toSet == Set((1L, 0L))
      }
      eventually("two same-text docs occupy one set of 4 buckets") {
        stateTotal(q) == 4L
      }
      // no further data: the engine's timer-check batches must evict
      // the idle buckets once the TTL passes
      eventually("idle buckets evict after the TTL") {
        stateTotal(q) == 0L
      }
      input.addData((10L, "a b c d e f"))
      eventually("doc 10 re-seeds the evicted buckets") {
        stateTotal(q) == 4L
      }
      assert(!spark.table("t_ttl_selfdedup").as[(Long, Long)].collect()
        .exists(_._1 == 10L),
        "doc 10's buckets expired — it re-admits as fresh, unflagged")
    } finally q.stop()
  }

  test("runningUserStats TTL: an idle user's accumulator evicts and restarts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Double, Long)]
    val events = input.toDF().select(col("_1").as("user_id"),
      col("_3").as("ts"), col("_2").as("value"))
    val ttl = 2000L
    val ckpt = Files.createTempDirectory("graft_ttl_usr_ckpt_").toString
    val q = EventStreams.runningUserStats(events, ttlMs = ttl).toDF()
      .writeStream.format("memory").queryName("t_ttl_users")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      input.addData((7L, 2.0, 100L), (7L, 3.0, 160L))
      eventually("user 7's accumulator reaches (2, 5.0)") {
        spark.table("t_ttl_users").as[(Long, Long, Double, Long)]
          .collect().toSet.contains((7L, 2L, 5.0, 160L))
      }
      eventually("idle user evicts after the TTL") { stateTotal(q) == 0L }
      // user 7 returns: the accumulator restarted from zero
      input.addData((7L, 10.0, 600L))
      eventually("post-eviction state restarts, not resumes") {
        spark.table("t_ttl_users").as[(Long, Long, Double, Long)]
          .collect().toSet.contains((7L, 1L, 10.0, 600L))
      }
      assert(!spark.table("t_ttl_users").as[(Long, Long, Double, Long)]
        .collect().toSet.contains((7L, 3L, 15.0, 600L)),
        "the pre-TTL accumulator must not survive eviction")
    } finally q.stop()
  }

  test("selfNearDupFlagsEventTime: horizon evicts by WATERMARK, not wall clock") {
    // deterministic end to end: eviction follows event timestamps
    // through the watermark — no sleeps, and a replay of the same
    // batches reproduces the same admit/flag decisions
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDF().select(col("_1").as("doc_id"),
      col("_2").as("text"), col("_3").as("ts"))
    val ckpt = Files.createTempDirectory("graft_ettl_ckpt_").toString
    val q = EventStreams.selfNearDupFlagsEventTime(docs, "doc_id", "text",
        "ts", watermarkDelay = "10 seconds", horizonMs = 60000L).toDF()
      .writeStream.format("memory").queryName("t_ettl_selfdedup")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    def flags() = spark.table("t_ettl_selfdedup")
      .as[(Long, Long)].collect().toSet
    try {
      // batch 1: same text at t=100/110 -> doc 1 flags; wm -> 100s
      input.addData((0L, "a b c d e f", t(100)), (1L, "a b c d e f", t(110)))
      q.processAllAvailable()
      assert(flags() === Set((1L, 0L)))
      // batch 2: unrelated doc far in the future; during THIS batch the
      // old watermark (100s) has not passed 110s+60s yet -> no evict;
      // after it, wm -> 290s
      input.addData((5L, "p q r s t u", t(300)))
      q.processAllAvailable()
      // batch 3: wm 290s now exceeds batch-1 buckets' 170s deadline ->
      // they evict during this batch (doc 5's deadline 360s survives)
      input.addData((6L, "g h i j k l", t(400)))
      q.processAllAvailable()
      // batch 4: doc 0's text returns AFTER the horizon -> re-admitted
      input.addData((10L, "a b c d e f", t(410)))
      q.processAllAvailable()
      assert(!flags().exists(_._1 == 10L),
        "a bucket expired by event time must re-admit")
      assert(flags() === Set((1L, 0L)))
      // live state: batch-1's buckets evicted in batch 3, and doc 5's
      // (deadline 360s) in batch 4 once the watermark reached 390s —
      // only docs 6 (460s) and 10 (470s) hold their 4 buckets
      assert(stateTotal(q) === 8L,
        "expired buckets must leave the store (16 without eviction)")
    } finally q.stop()
  }

  test("selfNearDupFlagsEventTime: a batch frame degrades to full history") {
    // batch planning eliminates the watermark node, so the state
    // function must not touch the watermark APIs (they throw with
    // watermarkPresent=false) — the deadline arm is skipped and the
    // result is the full-history batch contract, horizon ignored
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val docs = Seq(
      (0L, "a b c d e f", t(100)), (1L, "a b c d e f", t(110)),
      (5L, "p q r s t u", t(300)),
      (10L, "a b c d e f", t(100000)) // far past any horizon
    ).toDF("doc_id", "text", "ts")
    val flags = EventStreams.selfNearDupFlagsEventTime(docs, "doc_id",
        "text", "ts", watermarkDelay = "10 seconds", horizonMs = 60000L)
      .collect().toSet
    assert(flags === Set(graft.streaming.BandDup(1L, 0L),
      graft.streaming.BandDup(10L, 0L)),
      "batch mode keeps the whole history: doc 10 still flags vs doc 0")
  }

  test("selfNearDupFlags: index grows across micro-batches, min sharer wins") {
    // two parquet files with distinct mtimes -> two AvailableNow
    // batches in mtime order under maxFilesPerTrigger=1
    val root = Files.createTempDirectory("graft_selfdedup_").toString
    Seq((0L, "a b c d e f"), (1L, "a b c d e f"), (2L, "x y z w q r"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(root)
    Thread.sleep(1500)
    Seq((10L, "a b c d e f"), (11L, "p1 p2 p3 p4 p5 p6 p7"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(root)
    val schema = spark.read.parquet(root).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(root)
    // NOTE: ttlMs must stay 0 under AvailableNow — Spark 4.1.2 crashes
    // planning the extra timer batch (NPE in PythonSQLMetrics init)
    // when ProcessingTimeTimeout meets the AvailableNow source wrapper;
    // the TTL path is covered by the continuous-trigger tests above
    val out = runToTable(
        EventStreams.selfNearDupFlags(stream, "doc_id", "text").toDF(),
        "t_selfdedup", mode = "update")
      .groupBy(col("doc_id")).agg(min(col("dup_of_min")).as("dup_of"))
      .as[(Long, Long)].collect().toMap
    // doc 1 flags in batch 1 (same-batch smaller sharer 0); doc 10
    // flags in batch 2 against STATE carried from batch 1 — and the
    // provenance is the bucket MIN (0), not the latest sharer (1)
    assert(out === Map(1L -> 0L, 10L -> 0L))
  }
  test("curationGate: batch-frame verdicts equal Curation.disposition") {
    val docs = Seq(
      (1L, "https://ok.example.com/a",
        "<p>one two three four five six seven eight nine ten eleven</p>"),
      (2L, "not a url",
        "<p>one two three four five six seven eight nine ten eleven</p>"),
      (3L, "https://ok.example.com/c", "<p>tiny</p>"),
      (4L, "https://ok.example.com/d",
        "<p>one two three four five six seven eight nine ten eleven</p>")
    ).toDF("doc_id", "url", "html")
    val stream = EventStreams.curationGate(docs, "doc_id", "url", "html")
      .toDF().orderBy("doc_id").collect().map(_.toSeq).toSeq
    val batch = graft.text.Curation.disposition(docs, "doc_id", "url",
        "html").orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(stream === batch)
    // and the fixture exercises all verdicts: 1 keeps, 2 fails url,
    // 3 fails quality, 4 is the dup
    assert(stream.map(r => (r.head, r.last)) ===
      Seq((1L, true), (2L, false), (3L, false), (4L, false)))
  }

  test("scoredCurationGate: batch model + stream scoring equals " +
    "scoredDisposition") {
    val docs = Seq(
      (1L, "https://ok.example.com/a",
        "<p>the one two three four five six seven eight nine of</p>"),
      (2L, "not a url",
        "<p>the one two three four five six seven eight nine of</p>"),
      (3L, "https://ok.example.com/c", "<p>tiny</p>"),
      (4L, "https://ok.example.com/d",
        "<p>the one two three four five six seven eight nine of</p>"),
      (5L, "https://ok.example.com/e",
        "<p>the nine eight seven six five four three two one of</p>")
    ).toDF("doc_id", "url", "html")
    // train offline, export the model, score the same corpus "online"
    val (wRow, lmTable) = graft.text.Curation.scoredGateModel(docs,
      "doc_id", "url", "html")
    val w = wRow.head()
    val stream = EventStreams.scoredCurationGate(docs, "doc_id", "url",
        "html", Seq(w.getDouble(0), w.getDouble(1), w.getDouble(2),
          w.getDouble(3)), lmTable)
      .toDF().orderBy("doc_id").collect().map(_.toSeq).toSeq
    val batch = graft.text.Curation.scoredDisposition(docs, "doc_id",
        "url", "html").orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(stream === batch)
    // the fixture exercises every verdict: 1 survives scored, 2 fails
    // url (margin still computed — good page), 3 fails quality
    // (margin 0 ⇒ score_ok false), 4 dups 1, 5 unique word order (its
    // LM transitions differ from 1's)
    assert(stream.map(r => (r.head, r.last)) ===
      Seq((1L, true), (2L, false), (3L, false), (4L, false), (5L, true)))
  }

  test("scoredCurationGate: truncated LM degrades to known-transition " +
    "mean, never null") {
    val docs = Seq((1L, "https://ok.example.com/a",
      "<p>the one two three four five six seven eight nine of</p>"))
      .toDF("doc_id", "url", "html")
    val (wRow, lmTable) = graft.text.Curation.scoredGateModel(docs,
      "doc_id", "url", "html")
    val w = wRow.head()
    val ws = Seq(w.getDouble(0), w.getDouble(1), w.getDouble(2),
      w.getDouble(3))
    // ship only 3 of the transitions (a top-M cut): margin must still
    // be defined and score over the known subset
    val cut = lmTable.limit(3)
    val out = EventStreams.scoredCurationGate(docs, "doc_id", "url",
        "html", ws, cut)
      .toDF().select("quality_margin").head()
    assert(!out.isNullAt(0))
    // and an EMPTY model zeroes f4 rather than failing
    val none = EventStreams.scoredCurationGate(docs, "doc_id", "url",
        "html", ws, lmTable.limit(0))
      .toDF().select("quality_margin").head()
    assert(!none.isNullAt(0))
  }

  test("scoredGateModel lmTopM: exactly M max-mass transitions, " +
    "deterministic, subset of the full table") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://ok.example.com/a",
        "<p>the one two three four five six seven eight nine of</p>"),
      (2L, "https://ok.example.com/b",
        "<p>the one two the one two the one two three four five</p>")
    ).toDF("doc_id", "url", "html")
    val (_, full) = graft.text.Curation.scoredGateModel(docs, "doc_id",
      "url", "html")
    val fullRows = full.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    full.unpersist()
    val (_, top) = graft.text.Curation.scoredGateModel(docs, "doc_id",
      "url", "html", lmTopM = 3)
    val topRows = top.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    top.unpersist()
    assert(topRows.length === 3)
    // same (w1, w2, m) values as the unbounded table — the bound
    // selects rows, never changes scores
    assert(topRows.toSet.subsetOf(fullRows))
    // doc 2 repeats "the one two" 3x: those transitions dominate the
    // corpus mass and MUST survive any top-3 cut
    val kept = topRows.map(t => (t._1, t._2)).toSet
    assert(kept.contains(("the", "one")) && kept.contains(("one", "two")))
    // deterministic: a second invocation returns the identical rows
    val (_, again) = graft.text.Curation.scoredGateModel(docs, "doc_id",
      "url", "html", lmTopM = 3)
    val againRows = again.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    again.unpersist()
    assert(topRows.sortBy(t => (t._1, t._2)) ===
      againRows.sortBy(t => (t._1, t._2)))
  }

  test("curationGate: cross-batch keeper is first-epoch-wins") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val pages = input.toDF().select(col("_1").as("doc_id"),
      col("_2").as("url"), col("_3").as("html"))
    val ckpt = Files.createTempDirectory("graft_curgate_ckpt_").toString
    val q = EventStreams.curationGate(pages, "doc_id", "url", "html")
      .toDF()
      .writeStream.format("memory").queryName("t_curgate")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      val body = "<p>one two three four five six seven eight nine ten</p>"
      input.addData((7L, "https://x.example.com/a", body))
      q.processAllAvailable()
      // a SMALLER id arriving later still loses: the epoch-1 keeper holds
      input.addData((3L, "https://x.example.com/b", body))
      q.processAllAvailable()
      val out = spark.table("t_curgate")
        .select("doc_id", "is_exact_dup", "survivor")
        .as[(Long, Boolean, Boolean)].collect()
        .map { case (k, a, b) => k -> ((a, b)) }.toMap
      assert(out(7L) === ((false, true)))
      assert(out(3L) === ((true, false)))
    } finally q.stop()
  }


  test("positionalIndexSink: bootstrap then per-batch merge, a replayed " +
    "batchId is ignored, drained asset equals one batch build") {
    val docs = Seq(
      (0L, "a b c a b"), (1L, "b c a"), (2L, "a b a b"),
      (3L, "c c c"), (4L, "a c b"), (5L, "b b c a")).toDF("doc_id", "text")
    val path = Files.createTempDirectory("graft_idx_sink_spec").toString + "/idx"
    val sink = EventStreams.positionalIndexSink("doc_id", "text", path,
      buckets = 4)
    sink(docs.where(col("doc_id") < 2), 0L)            // bootstraps
    assert(graft.text.TextAnalysis.isPositionalIndex(spark, path))
    sink(docs.where(col("doc_id") >= 2 && col("doc_id") < 4), 1L)
    // at-least-once delivery: the SAME batchId arrives again — the
    // exactly-once gate must drop it or batch 1's postings double
    sink(docs.where(col("doc_id") >= 2 && col("doc_id") < 4), 1L)
    sink(docs.where(col("doc_id") >= 4), 2L)
    val full = Files.createTempDirectory("graft_idx_sink_full").toString
    graft.text.TextAnalysis.writePositionalIndex(docs, "doc_id", "text",
      full, buckets = 4)
    def rows(p: String) = spark.read.parquet(p)
      .select(col("doc_id"), col("pos"), col("term"),
        col("term_bucket").cast("long"))
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
    assert(rows(path) === rows(full)) // stream-merged == one batch build
    // row COUNT too: a doubled batch would keep the set equal but not
    // the multiset
    assert(spark.read.parquet(path).count()
      === spark.read.parquet(full).count())
    // and the query path agrees with the in-memory twin
    val got = graft.text.TextAnalysis.phraseMatchCountsIndexed(spark,
      path, "doc_id", Seq("a", "b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mem = graft.text.TextAnalysis.phraseMatchCounts(docs, "doc_id",
      "text", Seq("a", "b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === mem)
  }

  test("ivfIndexSink: bootstrap uses the given centroids, merges use the " +
    "asset's own sidecar, replayed batchId ignored") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val centers = graft.mlops.NaiveBayesOps
      .toLongForm(emb, Seq("label"), "embedding")
      .groupBy(col("label").as("cell"), col("dim"))
      .agg(avg(col("v")).as("c"))
    val path = Files.createTempDirectory("graft_ivf_sink_spec").toString +
      "/idx"
    val sink = graft.streaming.EventStreams.ivfIndexSink(
      "vec_id", "embedding", path, centers, "cell")
    sink(emb.where(col("vec_id") % 2 === 0), 0L)  // bootstraps
    assert(graft.similarity.Similarity
      .ivfIndexCentroids(spark, path).count() === centers.count())
    sink(emb.where(col("vec_id") % 2 =!= 0), 1L)
    sink(emb.where(col("vec_id") % 2 =!= 0), 1L)  // at-least-once replay
    val full = Files.createTempDirectory("graft_ivf_sink_full").toString
    graft.similarity.Similarity.writeIvfIndex(emb, "vec_id", "embedding",
      centers, "cell", full)
    def rows(p: String) = spark.read.parquet(p)
      .select(col("vec_id"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(path) === rows(full))
    assert(spark.read.parquet(path).count()
      === spark.read.parquet(full).count()) // replay would double this
  }
}
