package graft

import graft.operators.{Packing, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtendedRelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("deterministic sample: stable, subset, near target rate") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val s1 = Sampling.deterministicSample(docs, col("doc_id"), 20)
    val s2 = Sampling.deterministicSample(
      docs.repartition(7), col("doc_id"), 20) // other partitioning, same sample
    val ids1 = s1.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = s2.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 === ids2)
    val n = docs.count().toDouble
    assert(math.abs(ids1.size / n - 0.20) < 0.10, s"rate ${ids1.size / n}")
    // widening the gate keeps the narrower sample (nested samples)
    val wider = Sampling.deterministicSample(docs, col("doc_id"), 50)
      .select("doc_id").as[Long].collect().toSet
    assert(ids1.forall(wider.contains))
  }

  test("assignSplit: partition of the corpus, stable across partitionings") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val split = Sampling.assignSplit(docs, col("doc_id"), 800, 100)
    // every row lands in exactly one split; fractions near 80/10/10
    val byName = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(byName.keySet === Set("train", "val", "test"))
    val n = docs.count().toDouble
    assert(byName.values.sum === n.toLong)
    assert(math.abs(byName("train") / n - 0.8) < 0.1)
    // same assignment under a different partitioning (engine-portable)
    val again = Sampling.assignSplit(docs.repartition(7), col("doc_id"),
      800, 100)
    val a = split.select("doc_id", "split").as[(Long, String)]
      .collect().sorted.toSeq
    val b = again.select("doc_id", "split").as[(Long, String)]
      .collect().sorted.toSeq
    assert(a === b)
    // degenerate cuts reject
    intercept[IllegalArgumentException](
      Sampling.assignSplit(docs, col("doc_id"), 950, 100))
  }

  test("quantizeInt8: codes bounded, error bounded, zero vector is NULL") {
    import graft.similarity.Similarity
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = Similarity.quantizeInt8(emb, "vec_id", "embedding")
    // codes within [-127, 127]
    assert(q.where(expr(
      "exists(q, x -> x > 127 OR x < -127)")).count() === 0)
    // per-dim error <= scale/2  =>  L2 error <= sqrt(d) * scale / 2
    val bad = q.where(col("q_err_l2") >
      sqrt(size(col("q"))) * col("q_scale") / 2 + lit(1e-12)).count()
    assert(bad === 0)
    // zero vector has no scale: NULL, never a division blow-up
    val zero = Seq((1L, Seq(0f, 0f, 0f)), (2L, Seq(3f, 0f, -4f)))
      .toDF("vec_id", "embedding")
    val rows = Similarity.quantizeInt8(zero, "vec_id", "embedding")
      .orderBy("vec_id").select("q_scale").collect()
    assert(rows(0).isNullAt(0) && !rows(1).isNullAt(0))
  }

  test("ewma: first row is its own value, constant series stays constant, recency weighting") {
    import graft.operators.TimeSeries
    val df = Seq((1L, 1, 10.0), (1L, 2, 10.0), (1L, 3, 10.0),
      (2L, 1, 0.0), (2L, 2, 100.0))
      .toDF("k", "t", "v")
    val out = TimeSeries.ewma(df, col("k"), Seq(col("t")), col("v"),
        alpha = 0.5, lags = 10)
      .select("k", "t", "ewma").as[(Long, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 1)) === 10.0) // single-element frame = the value
    assert(out((1L, 3)) === 10.0) // constant in, constant out
    // (0 then 100) at alpha .5, adjust=True: (100 + .5*0)/(1+.5) = 66.666667
    assert(math.abs(out((2L, 2)) - 66.666667) < 1e-6)
    // recency: the latest value dominates
    assert(out((2L, 2)) > 50.0)
    intercept[IllegalArgumentException](
      TimeSeries.ewma(df, col("k"), Seq(col("t")), col("v"), alpha = 1.0))
  }

  test("robustScale: median-centered, IQR-scaled, constant column NULL") {
    import graft.stats.Moments
    val df = (1 to 101).map(_.toDouble).toDF("v")
    val out = Moments.robustScale(df, "v", "rs")
    // median 51, IQR = 76 - 26 = 50
    val got = out.where(col("v") === 51.0).select("rs").head.getDouble(0)
    assert(got === 0.0)
    val hi = out.where(col("v") === 101.0).select("rs").head.getDouble(0)
    assert(math.abs(hi - 1.0) < 1e-9)
    val const = Seq(5.0, 5.0, 5.0).toDF("v")
    assert(Moments.robustScale(const, "v", "rs")
      .select("rs").collect().forall(_.isNullAt(0)))
  }

  test("robustScaleApprox: within rank-error tolerance of the exact " +
    "twin, exact on small data, constant column NULL") {
    import graft.stats.Moments
    // odd n with p*(n-1) integral at 0.25/0.5/0.75: the exact twin's
    // linear interpolation degenerates to sample values, so at full
    // accuracy the sketch must agree EXACTLY here
    val df = (1 to 101).map(_.toDouble).toDF("v")
    val exact = Moments.robustScale(df, "v", "rs")
      .select("v", "rs").collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val approx = Moments.robustScaleApprox(df, "v", "rs", accuracy = 100000)
      .select("v", "rs").collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(approx === exact)
    // larger data, values quantized so neighboring ranks differ by ≤ 1:
    // rank-±1 sketch drift can move each quartile by at most one
    // neighboring sample step ⇒ |approx − exact| ≤ (3 steps)/IQR
    val big = (1 to 20000).map(i => (i % 997).toDouble).toDF("v")
    val a = Moments.robustScaleApprox(big, "v", "rs", accuracy = 100000)
      .select("v", "rs").dropDuplicates("v")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val e = Moments.robustScale(big, "v", "rs")
      .select("v", "rs").dropDuplicates("v")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val iqr = 997.0 / 2 // ~uniform over 0..996: IQR ≈ 498
    e.foreach { case (v, ev) =>
      assert(math.abs(a(v) - ev) <= 3.0 / iqr + 1e-9,
        s"v=$v approx=${a(v)} exact=$ev")
    }
    val const = Seq(5.0, 5.0, 5.0).toDF("v")
    assert(Moments.robustScaleApprox(const, "v", "rs")
      .select("rs").collect().forall(_.isNullAt(0)))
  }

  test("stratified sample: per-stratum rates, zero-rate stratum empty") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val strat = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
      Map("en" -> 100, "de" -> 0))
    val langs = strat.select("lang").distinct().as[String].collect().toSet
    assert(langs.contains("en") && !langs.contains("de"))
    val enTotal = docs.where(col("lang") === "en").count()
    assert(strat.where(col("lang") === "en").count() === enTotal)
  }

  test("sampleKPerGroup: exactly k per group, deterministic, small groups whole") {
    val df = (1L to 100L).map(i => (i, if (i <= 95) "big" else "small"))
      .toDF("id", "grp")
    val s1 = Sampling.sampleKPerGroup(df, col("grp"), col("id"), k = 7)
      .select("id", "grp").as[(Long, String)].collect().toSet
    val s2 = Sampling.sampleKPerGroup(df.repartition(13), col("grp"), col("id"), k = 7)
      .select("id", "grp").as[(Long, String)].collect().toSet
    assert(s1 === s2)                                  // partitioning-stable
    assert(s1.count(_._2 == "big") === 7)              // exact k
    assert(s1.count(_._2 == "small") === 5)            // whole sub-k group
  }

  test("mixRates: weighted targets, clamped keep rate, unweighted stratum zero") {
    val df = (1L to 100L).map(i =>
      (i, if (i <= 80) "a" else if (i <= 90) "b" else "c")).toDF("id", "src")
    val r = Sampling.mixRates(df, col("src"), Map("a" -> 1.0, "b" -> 3.0), 40L)
      .orderBy("stratum")
      .as[(String, Long, Double, Long, Double)].collect()
    // a: frac .25 -> target 10 of 80 -> rate .125 ; b: frac .75 -> target 30
    // of 10 -> clamped 1.0 ; c: unweighted -> 0
    assert(r(0) === ("a", 80L, 0.25, 10L, 0.125))
    assert(r(1) === ("b", 10L, 0.75, 30L, 1.0))
    assert(r(2) === ("c", 10L, 0.0, 0L, 0.0))
  }

  test("packContextWindows: boundary straddle and window spans, single shard") {
    val df = Seq((1L, "g", 100L), (2L, "g", 200L), (3L, "g", 700L),
      (4L, "g", 56L)).toDF("id", "grp0", "toks")
    val r = Packing.packContextWindows(df, col("grp0"), col("id"),
        col("toks"), budget = 256L, shards = 1)
      .orderBy("id")
      .select("id", "tok_start", "first_window", "last_window", "n_windows")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(r(0) === (1L, 0L, 0L, 0L, 1L))       // 0..99 in window 0
    assert(r(1) === (2L, 100L, 0L, 1L, 2L))     // 100..299 straddles 0/1
    assert(r(2) === (3L, 300L, 1L, 3L, 3L))     // 300..999 spans 1..3
    assert(r(3) === (4L, 1000L, 3L, 4L, 2L))    // 1000..1055 straddles 3/4
  }

  test("approx_percentile (the 100TB path) tracks exact percentiles within 1%") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val row = li.select(
      expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95))").as("exact"),
      expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95), 10000)")
        .as("approx"))
      .head()
    val exact = row.getSeq[Double](0)
    val approx = row.getSeq[Double](1)
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(a - e) / e < 0.01, s"approx $a vs exact $e")
    }
  }

  test("ml pipeline save/load round-trip preserves the transform") {
    import graft.feature.TextPipeline
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val model = TextPipeline.fitTfidf(docs, vocabSize = 1024)
    val dir = java.nio.file.Files.createTempDirectory("graft_model_").toString
    model.write.overwrite().save(dir)
    val loaded = org.apache.spark.ml.PipelineModel.load(dir)
    val toNorm = udf((v: org.apache.spark.ml.linalg.Vector) =>
      BigDecimal(math.sqrt(v.toArray.map(x => x * x).sum))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    def norms(m: org.apache.spark.ml.PipelineModel) =
      m.transform(docs).select(col("doc_id"), toNorm(col("tfidf")).as("n"))
        .as[(Long, Double)].collect().toMap
    assert(norms(loaded) === norms(model))
  }

  test("pivot/unpivot round-trip recovers the long form") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val long = orders.groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(round(sum(col("o_totalprice")), 2).as("total"))
    val wide = orders.groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(sum(col("o_totalprice")), 2))
    val back = wide.unpivot(
      Array(col("o_orderpriority")),
      Array(col("F"), col("O"), col("P")),
      "o_orderstatus", "total")
    assert(back.as[(String, String, Double)].collect().toSet ===
      long.as[(String, String, Double)].collect().toSet)
  }

  test("count-min sketch: one-sided estimates, exact on collision-free cells, mass conservation") {
    import graft.stats.Sketches
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val toks = docs.select(explode(split(col("text"), " ")).as("term"))
    val total = toks.count()
    val exact = toks.groupBy(col("term")).agg(count(lit(1)).as("exact"))
    // tight sketch (collisions certain) and wide sketch (few collisions)
    for (w <- Seq(8, 4096)) {
      val sk = Sketches.countMinSketch(toks, "term", depth = 4, width = w)
        .localCheckpoint()
      // mass conservation: every depth row tallies every token instance
      val rowMass = sk.groupBy(col("i")).agg(sum(col("counter")).as("m"))
        .as[(Int, Long)].collect().toMap
      assert(rowMass.size === 4)
      rowMass.values.foreach(m => assert(m === total))
      // one-sided error: estimate >= exact for EVERY term
      val joined = Sketches.cmsEstimate(sk, exact.select(col("term")), "term",
          depth = 4, width = w)
        .join(exact, "term")
        .as[(String, Long, Long)].collect()
      joined.foreach { case (t, est, ex) =>
        assert(est >= ex, s"term $t: cms $est < exact $ex (width $w)") }
      // a wide sketch over a 31-term vocabulary should be near-collision-
      // free: estimates collapse to exact counts
      if (w == 4096) joined.foreach { case (t, est, ex) =>
        assert(est === ex, s"term $t: width-$w sketch should be exact") }
    }
    // the xxhash64 throughput twin holds the same invariants (different
    // hash family, same algebra): mass conservation + one-sided error
    val skF = Sketches.countMinSketchFast(toks, "term", depth = 4, width = 8)
      .localCheckpoint()
    skF.groupBy(col("i")).agg(sum(col("counter")).as("m"))
      .as[(Int, Long)].collect().foreach { case (_, m) => assert(m === total) }
    Sketches.cmsEstimateFast(skF, exact.select(col("term")), "term",
        depth = 4, width = 8)
      .join(exact, "term")
      .as[(String, Long, Long)].collect()
      .foreach { case (t, est, ex) =>
        assert(est >= ex, s"fast term $t: cms $est < exact $ex") }
  }

  test("CMS-gated heavy hitters: exact answer, gate genuinely prunes the tail") {
    import graft.stats.Sketches
    // 5 hot terms x 200 instances over a 2000-term x 1 tail: the gate
    // must pass every hot term (one-sided CMS) and drop most of the tail
    val hot = (0 until 5).flatMap(i => Seq.fill(200)(s"hot$i"))
    val tail = (0 until 2000).map(i => s"tail$i")
    val terms = spark.createDataFrame(
      (hot ++ tail).map(Tuple1(_))).toDF("term")
    val got = Sketches.heavyHitters(terms, "term", threshold = 100L,
        depth = 4, width = 256)
      .as[(String, Long)].collect().toMap
    assert(got === (0 until 5).map(i => s"hot$i" -> 200L).toMap)
    // pruning capacity: with 3000 instances over 4x256 cells and a
    // threshold of 100, only cells carrying a hot term's mass go hot —
    // a handful per depth row, so a tail term survives the gate only by
    // colliding with hot mass in ALL 4 rows. The hot-cell count bounds
    // that directly.
    val hotCells = Sketches.countMinSketch(terms, "term",
        depth = 4, width = 256)
      .where(col("counter") >= 100).count()
    assert(hotCells <= 40L, s"gate should stay sparse, got $hotCells hot cells")
    assert(hotCells >= 5L) // every depth row holds the hot terms somewhere
  }

  test("temperature mix: alpha=1 is proportional, lower alpha upweights small strata") {
    import graft.operators.Sampling
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val prop = Sampling.mixRatesTemperature(docs, col("source"), 1.0, 1000L)
      .select("stratum", "n_actual", "target_frac")
      .as[(String, Long, Double)].collect()
    val n = prop.map(_._2).sum.toDouble
    prop.foreach { case (st, na, tf) =>
      assert(math.abs(tf - na / n) < 1e-5, s"alpha=1 not proportional for $st") }
    // alpha<1: the smallest stratum's share must EXCEED its natural
    // share, the largest must fall below (order preserved, gap squeezed)
    val sm = Sampling.mixRatesTemperature(docs, col("source"), 0.5, 1000L)
      .select("stratum", "n_actual", "target_frac")
      .as[(String, Long, Double)].collect()
    val smallest = sm.minBy(_._2); val largest = sm.maxBy(_._2)
    if (smallest._2 != largest._2) {
      assert(smallest._3 > smallest._2 / n)
      assert(largest._3 < largest._2 / n)
    }
  }

  test("weighted sample: partitioning-stable, weight-dominant, biased toward heavy rows") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val s1 = Sampling.weightedSample(docs, col("doc_id"), col("n_chars"), 20)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.weightedSample(docs.repartition(7), col("doc_id"),
        col("n_chars"), 20)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 === s2) // the draw is a pure function of the key
    // an overwhelming weight is (effectively) always selected
    val spiked = docs.withColumn("w",
      when(col("doc_id") === 7L, lit(1000000000)).otherwise(lit(1)))
    val top = Sampling.weightedSample(spiked, col("doc_id"), col("w"), 5)
      .select("doc_id").as[Long].collect().toSet
    assert(top.contains(7L))
    // weight bias: mean n_chars of the weighted sample exceeds corpus mean
    val corpusMean = docs.agg(avg("n_chars")).head.getDouble(0)
    val sampleMean = Sampling.weightedSample(docs, col("doc_id"),
        col("n_chars"), 20)
      .agg(avg("n_chars")).head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean <= corpus mean $corpusMean")
    // zero/negative weights are never sampled
    val zeroed = docs.withColumn("w",
      when(col("doc_id") < 100L, lit(0)).otherwise(lit(1)))
    val z = Sampling.weightedSample(zeroed, col("doc_id"), col("w"), 50)
      .select("doc_id").as[Long].collect()
    assert(z.forall(_ >= 100L))
  }

  test("z-order buckets bound BOTH dimensions; x-sort buckets bound only x") {
    import graft.operators.Layout
    // uniform 256x256 grid — every (x, y) combination once
    val grid = spark.range(256L * 256L).select(
      (col("id") / 256).cast("long").as("x"),
      pmod(col("id"), lit(256)).as("y"))
    // shift 12 of 16 z bits keeps the top 2 bits of EACH dimension:
    // every bucket is exactly a 64x64 tile
    val zs = Layout.zOrderStats(grid, col("x"), col("y"), bits = 8, shift = 12)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(zs.length === 16)
    zs.foreach { case (b, n, xmin, xmax, ymin, ymax) =>
      assert(n === 4096L, s"bucket $b size")
      assert(xmax - xmin === 63L, s"bucket $b x-range")
      assert(ymax - ymin === 63L, s"bucket $b y-range")
    }
    // the single-dimension sort at the same bucket count: x is perfectly
    // clustered but y spans the whole domain in every bucket
    val xs = grid.withColumn("bucket", shiftright(col("x"), 4))
      .groupBy("bucket")
      .agg(max(col("y")) - min(col("y")))
      .as[(Long, Long)].collect()
    xs.foreach { case (_, yrange) => assert(yrange === 255L) }
  }

  test("bloom pre-filter join: exact results, gate prunes most non-matching rows") {
    import graft.operators.Relational
    import graft.plans.GraftExpressions
    val fact = spark.range(100000).select(col("id").as("fk"),
      pmod(col("id"), lit(1000)).as("v"))
    // dim holds 1% of the fact keys
    val dim = spark.range(1000).select((col("id") * 100).as("dk"),
      concat(lit("d"), col("id")).as("attr"))
    val got = Relational.bloomPreFilterJoin(fact, dim, "fk", "dk",
        expectedItems = 2000L)
      .select("fk", "attr").as[(Long, String)].collect().toSet
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "attr").as[(Long, String)].collect().toSet
    assert(got === plain) // false positives die in the join: exact
    assert(got.size === 1000)
    // the gate alone: with 8 bits/item the false-positive rate is ~2%,
    // so of 99k non-matching rows only a small fraction survives
    GraftExpressions.register(spark)
    val bf = dim.agg(GraftExpressions.bloomAgg(xxhash64(col("dk")),
      lit(2000L), lit(16000L)).as("b")).head.getAs[Array[Byte]](0)
    val survivors = fact.where(GraftExpressions.bloomMightContain(
      lit(bf), xxhash64(col("fk")))).count()
    assert(survivors >= 1000L, "every true match must survive")
    assert(survivors < 12000L,
      s"gate should prune most of the 99k non-matches, kept $survivors")
  }

  test("compactionBins: contiguous bins, first file under target, order preserved") {
    val files = Seq(
      ("f0", 10L), ("f1", 10L), ("f2", 10L), ("f3", 25L),
      ("f4", 10L), ("f5", 1L), ("f6", 1L)).toDF("name", "bytes")
    val bins = graft.operators.Layout
      .compactionBins(files, Seq(col("name")), col("bytes"), targetBytes = 30L)
      .orderBy(col("name")).as[(String, Long, Long)].collect()
    // cum-before: 0,10,20,30,55,65,66 -> bins 0,0,0,1,1,2,2
    assert(bins.map(_._3).toSeq === Seq(0L, 0L, 0L, 1L, 1L, 2L, 2L))
    // bins are contiguous and monotone in file order
    assert(bins.map(_._3).sliding(2).forall(p => p(1) - p(0) <= 1 && p(1) >= p(0)))
  }

  test("keySkewReport: uniform keys ratio 1/salt 1; one hot key measured") {
    val uniform = (0 until 100).map(i => (i % 10, i)).toDF("k", "v")
    val u = graft.operators.Diagnostics.keySkewReport(uniform, col("k")).head()
    assert(u.getLong(0) === 100L && u.getLong(1) === 10L)
    assert(u.getDouble(4) === 1.0 && u.getLong(7) === 1L) // skew_ratio, salt
    assert(u.getLong(6) === 0L) // no hot keys
    // 91 rows on one key, 9 singleton keys: max=91, avg=10 -> salt 10
    val skewed = ((0 until 91).map(i => (0, i)) ++ (1 to 9).map(i => (i, i)))
      .toDF("k", "v")
    val s2 = graft.operators.Diagnostics.keySkewReport(skewed, col("k")).head()
    assert(s2.getLong(2) === 91L)
    assert(s2.getDouble(4) === 9.1 && s2.getLong(7) === 10L)
    assert(s2.getLong(6) === 1L)
    assert(math.abs(s2.getDouble(5) - 0.91) < 1e-9)
  }

  test("profileColumns: nulls, exact distincts, stringified min/max") {
    val df = Seq((Some(1), Some("a")), (Some(1), None), (Some(3), Some("b")),
      (None, Some("b"))).toDF("x", "s")
    val p = graft.operators.Diagnostics.profileColumns(df, Seq("x", "s"))
      .orderBy("column_name")
      .as[(String, Long, Long, Long, Long, String, String)].collect()
    assert(p(0) === (("s", 4L, 3L, 1L, 2L, "a", "b")))
    assert(p(1) === (("x", 4L, 3L, 1L, 2L, "1", "3")))
  }

  test("FS linkage: dual agreement required, argmax ties to lowest id, threshold filters") {
    import graft.operators.Linkage
    val a = Seq((1L, "x", 100.0), (2L, "x", 104.0), (3L, "y", 500.0))
      .toDF("id_a", "tag", "bal").withColumn("blk", lit(0))
    val b = Seq((10L, "x", 101.0), (11L, "y", 990.0))
      .toDF("id_b", "d_tag", "d_bal").withColumn("blk", lit(0))
    val scored = Linkage.scorePairs(a, b, Seq("blk"), Seq(
      Linkage.FieldRule("tag", col("tag") === col("d_tag"), 3.0, -3.0),
      Linkage.FieldRule("bal", abs(col("bal") - col("d_bal")) <= 5, 2.0, -2.0)))
    assert(scored.count() === 6) // full block cross
    val best = Linkage.bestMatches(scored, "id_a", "id_b", threshold = 4.0)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // b=10: a=1 and a=2 both dual-agree at 5.0 -> tie, lowest id_a wins
    assert(best(10L) === (1L, 5.0))
    // b=11: best is a=3 (tag only, 3.0-2.0=1.0) — under threshold, dropped
    assert(!best.contains(11L))
  }

  test("saltedInnerJoin: multiset-identical to the plain join, hot and cold") {
    import graft.operators.SkewJoin
    // hot key 0 (8 a-rows incl. a DUPLICATE row), cold keys 1, 2;
    // b-side duplicates too — output must match as a MULTISET
    val a = ((1L to 7L).map(i => (i, 0)) ++ Seq((1L, 0), (8L, 1), (9L, 2)))
      .toDF("ida", "k")
    val b = (Seq((20L, 0), (21L, 0), (21L, 0), (22L, 1), (23L, 3)))
      .toDF("idb", "k")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("ida"), col("idb"))
        .as[(Int, Long, Long)].collect().sorted.toSeq
    val plain = canon(a.join(b, Seq("k")))
    val salted = canon(SkewJoin.saltedInnerJoin(a, col("ida"), b, Seq("k"),
      maxSalt = 4, hotThreshold = 3))
    assert(salted === plain)
    assert(plain.size === 8 * 3 + 1) // hot 8x3 + cold (8,1)x(22,1); key 2/3 unmatched
    // nothing hot -> degenerates to the plain join
    val cold = canon(SkewJoin.saltedInnerJoin(a, col("ida"), b, Seq("k"),
      maxSalt = 4, hotThreshold = 100))
    assert(cold === plain)
    // r22 proven-cold fast path: a caller-supplied per-key row bound at
    // or below hotThreshold skips the salting machinery outright —
    // output must still be the plain join's multiset; a bound ABOVE the
    // threshold must leave the salted path (and its output) intact
    val bounded = canon(SkewJoin.saltedInnerJoin(a, col("ida"), b, Seq("k"),
      maxSalt = 4, hotThreshold = 8, aKeyRowBound = Some(8L)))
    assert(bounded === plain)
    val boundedHot = canon(SkewJoin.saltedInnerJoin(a, col("ida"), b,
      Seq("k"), maxSalt = 4, hotThreshold = 3, aKeyRowBound = Some(8L)))
    assert(boundedHot === plain)
  }

  test("saltedInnerJoin: reserved temp column names are rejected, not clobbered") {
    import graft.operators.SkewJoin
    val a = Seq((1L, 0), (2L, 0)).toDF("ida", "k")
    val bad = a.withColumn("_salt", lit(7))
    for (df <- Seq(bad, a.withColumn("_sn", lit(1)),
        a.withColumn("_bn", lit(1L)))) {
      val e = intercept[IllegalArgumentException] {
        SkewJoin.saltedInnerJoin(df, col("ida"), a, Seq("k"))
      }
      assert(e.getMessage.contains("reserved temp column"))
      val e2 = intercept[IllegalArgumentException] {
        SkewJoin.saltedInnerJoin(a, col("ida"), df, Seq("k"))
      }
      assert(e2.getMessage.contains("reserved temp column"))
    }
  }

  test("estimateMU: degenerate and null-bearing pair sets stay finite") {
    import graft.operators.Linkage
    // every pair agrees on every field: the raw E-step drives sg -> n
    // and the u update divides by zero — the clamp must keep all
    // parameters finite (pinned at the boundary the data supports)
    val allAgree = (1 to 40).map(i => (i, true, true)).toDF("id", "t1", "t2")
    val fitA = Linkage.estimateMU(allAgree,
        Seq(("f1", col("t1")), ("f2", col("t2"))), rounds = 3)
      .as[(String, Double, Double, Double, Double, Double)].collect()
    assert(fitA.length === 2)
    fitA.foreach { case (_, m, u, wa, wd, p) =>
      for (v <- Seq(m, u, wa, wd, p))
        assert(!v.isNaN && !v.isInfinite, s"non-finite parameter in $fitA")
      assert(m > 0.9, "all-agree data must fit a high m")
    }
    // no pair ever agrees: the symmetric degeneracy (sg -> 0)
    val noneAgree = (1 to 40).map(i => (i, false, false))
      .toDF("id", "t1", "t2")
    Linkage.estimateMU(noneAgree,
        Seq(("f1", col("t1")), ("f2", col("t2"))), rounds = 3)
      .as[(String, Double, Double, Double, Double, Double)].collect()
      .foreach { case (_, m, u, wa, wd, p) =>
        for (v <- Seq(m, u, wa, wd, p))
          assert(!v.isNaN && !v.isInfinite)
      }
    // null agreement rows drop instead of skewing the sums: the fit
    // over (planted + nulls) equals the fit over (planted alone)
    val planted = ((1 to 20).map(i => (i, Some(true), Some(true))) ++
      (1 to 180).map(i => (i, Some(i % 9 == 0), Some(i % 13 == 0))))
    val withNulls = planted ++
      (1 to 30).map(i => (1000 + i, None: Option[Boolean], Some(true)))
    def fit(rows: Seq[(Int, Option[Boolean], Option[Boolean])]) =
      Linkage.estimateMU(rows.toDF("id", "t1", "t2"),
          Seq(("f1", col("t1")), ("f2", col("t2"))), rounds = 3)
        .as[(String, Double, Double, Double, Double, Double)]
        .collect().toSet
    assert(fit(withNulls) === fit(planted))
  }

  test("estimateMU: EM separates match/non-match rates on planted pairs") {
    import graft.operators.Linkage
    // 20 planted matches (both fields agree) + 180 non-matches where
    // agreement is rare and uncorrelated
    val pairs = ((1 to 20).map(i => (i, true, true)) ++
      (1 to 180).map(i => (i, i % 9 == 0, i % 13 == 0)))
      .toDF("id", "t1", "t2")
    val fit = Linkage.estimateMU(pairs, Seq(
        ("f1", col("t1")), ("f2", col("t2"))), rounds = 3)
      .as[(String, Double, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    for (f <- Seq("f1", "f2")) {
      val (_, m, u, wa, wd, p) = fit(f)
      assert(m > 0.8 && u < 0.2, s"$f: m=$m u=$u")
      assert(wa > 0 && wd < 0)
      assert(p > 0.05 && p < 0.25, s"prevalence $p off the ~10% plant")
    }
    // fixed rounds + fixed starts: the fit is a pure function (rerun
    // bit-equal), and both fields report the SAME prevalence
    val fit2 = Linkage.estimateMU(pairs, Seq(
        ("f1", col("t1")), ("f2", col("t2"))), rounds = 3)
      .as[(String, Double, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(fit2 === fit)
    assert(fit("f1")._6 === fit("f2")._6)
  }

  test("salted FS linkage: scored pair set bit-identical to the plain plan") {
    import graft.operators.Linkage
    // block 0 is hot (6 a-rows vs 1-row cold blocks); salt=3 splits it
    val a = (1L to 6L).map(i => (i, s"t${i % 2}", i * 10.0, 0)) ++
      Seq((7L, "tx", 70.0, 1), (8L, "ty", 80.0, 2))
    val b = Seq((10L, "t1", 12.0, 0), (11L, "t0", 41.0, 0),
      (12L, "tx", 68.0, 1), (13L, "tz", 99.0, 2))
    val aDf = a.toDF("id_a", "tag", "bal", "blk")
    val bDf = b.toDF("id_b", "d_tag", "d_bal", "blk")
    val rules = Seq(
      Linkage.FieldRule("tag", col("tag") === col("d_tag"), 3.0, -3.0),
      Linkage.FieldRule("bal", abs(col("bal") - col("d_bal")) <= 5, 2.0, -2.0))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id_a"), col("id_b"), col("fs_score"))
        .as[(Long, Long, Double)].collect().sorted.toSeq
    val plain = canon(Linkage.scorePairs(aDf, bDf, Seq("blk"), rules))
    val salted = canon(Linkage.scorePairsSalted(aDf, "id_a", bDf,
      Seq("blk"), rules, maxSalt = 3, hotThreshold = 2))
    assert(salted === plain)
    // hot block contributes 6x2 pairs, cold blocks 1x1 each
    assert(plain.size === 14)
    // skew-aware wrapper: report-driven parameters, same result set
    val aware = canon(Linkage.scorePairsSkewAware(aDf, "id_a", bDf,
      Seq("blk"), rules))
    assert(aware === plain)
    // degenerate salting (nothing hot) must also match exactly
    val coldOnly = canon(Linkage.scorePairsSalted(aDf, "id_a", bDf,
      Seq("blk"), rules, maxSalt = 4, hotThreshold = 100))
    assert(coldOnly === plain)
  }
}
