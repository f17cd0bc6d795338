package graft.mlops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.mllib.clustering.{KMeans => OldKMeans, KMeansModel => OldKMeansModel}
import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Clustering + decomposition (SURVEY §2.6).
  *
  * The reference delegated k-means to mllib or ran local sklearn per block
  * (`splearn/cluster/k_means_.py:~L10-70`) and computed truncated SVD from
  * a tree-reduced Gramian (`splearn/decomposition/truncated_svd.py:~L10`).
  * Same decomposition structure here: the Gramian is a long-form
  * aggregation (SQL-checkable), the eigen/SVD step runs on `RowMatrix`
  * (ARPACK / local Breeze — O(d²) driver state, never O(n)).
  */
object ClusterOps {

  /** One Lloyd assignment step against fixed centers, in long form:
    * points (id, dim, v) × centers (center_id, dim, c) joined on dim,
    * Σ(v-c)² per (id, center), argmin per id. Shuffle cost is one
    * hash-partition of the (small) long-form frames; centers side is
    * broadcast. Fixed deterministic centers make this oracle-able
    * (SURVEY C1/C2).
    *
    * The argmin is `min(struct(dist2, center))` — lexicographic struct
    * ordering IS "lowest dist2, ties to the lowest center id", the same
    * verdict a row_number window would produce, but as an aggregate it
    * gets map-side partial combine (n·k rows shrink before the shuffle)
    * and skips the Sort + Window exchange chain entirely.
    */
  def assignToCenters(pointsLong: DataFrame, centersLong: DataFrame,
                      idCol: String, centerCol: String): DataFrame = {
    pointsLong
      .join(broadcast(centersLong), "dim")
      .groupBy(col(idCol), col(centerCol))
      .agg(sum(pow(col("v") - col("c"), 2)).as("dist2"))
      .groupBy(col(idCol))
      .agg(min(struct(col("dist2"), col(centerCol))).as("_m"))
      .select(col(idCol), col(s"_m.$centerCol").as(centerCol),
        col("_m.dist2").as("dist2"))
  }

  /** Multi-probe assignment: each point's `n` nearest centers (by the
    * same (dist2, center-id) ordering as [[assignToCenters]]). The
    * per-point candidate set is collected as an in-row array — bounded by
    * k, the number of centers, never by data size — sorted, and sliced,
    * so the whole top-n is one aggregation with map-side combine; no
    * window, no second shuffle. Output: one row per (point, probed cell),
    * `probe_rank` 1-based.
    */
  /** In-row multi-probe assignment: each point's `n` nearest cells (L2,
    * ties to the lower cell id) via the native `graft_nearest_cells`
    * top-N argmin over the packed broadcast centroid table — the top-N
    * generalization of the nProbe=1 `graft_nearest_cell` path.
    *
    * The long-form formulation this replaces joined point-dims against
    * every centroid's dims — |corpus|·|cells|·d rows through a hash
    * aggregate; at 500k×2048 cells×64d that is ~65 BILLION joined rows
    * (measured ~28 min and an 8 GB OOM in StressBench) while this
    * in-row form is one broadcast + a primitive cells×dims loop per
    * point. Output: (id, cell, probe_rank) with probe_rank 1-based in
    * (d2, cell) order — cell id semantics identical to the SQL twin
    * `row_number() OVER (PARTITION BY id ORDER BY dist2, cell) <= n`.
    */
  def assignToCentersTopN(emb: DataFrame, idCol: String, arrCol: String,
                          centersLong: DataFrame, centerCol: String,
                          n: Int): DataFrame = {
    require(n >= 1, s"nProbe=$n must be >= 1")
    graft.plans.GraftExpressions.register(emb.sparkSession)
    val packed = centersLong
      .groupBy(col(centerCol))
      .agg(expr(
        "transform(sort_array(collect_list(struct(dim, c))), x -> x.c)")
        .as("cv"))
      .agg(expr(
        s"sort_array(collect_list(struct(CAST($centerCol AS BIGINT)" +
          " AS cell, cv)))").as("_cells"))
    emb.crossJoin(broadcast(packed))
      .select(col(idCol), posexplode(expr(
        s"graft_nearest_cells(CAST($arrCol AS ARRAY<DOUBLE>), _cells, $n)"))
        .as(Seq("_i", "_cell")))
      .select(col(idCol), col("_cell").as(centerCol),
        (col("_i") + 1).as("probe_rank"))
  }

  /** spark.ml k-means‖ over an array column (the reference's
    * `init='k-means||'` path, now fully in-JVM).
    */
  /** Deterministic Lloyd's algorithm, `iters` fixed rounds: centers seeded
    * from the k lowest-id points (no RNG), each round re-assigns every
    * point to its nearest center (ties broken by center id) and recomputes
    * centers as coordinate means. Fixed iteration count + deterministic
    * seeding makes the whole fit SQL-mirrorable — the oracled counterpart
    * of the RNG-seeded `fitKMeans` (ml k-means‖). Empty clusters drop out
    * (inner join), matching the SQL twin. Each round is one broadcast
    * join + two aggregations — linear scans, no driver-side state.
    */
  def lloydIterations(pointsLong: DataFrame, idCol: String, k: Int,
                      iters: Int): DataFrame = {
    // Seed = the k lowest ids by RANK, not by value (`id < k` only works
    // for dense 0-based ids; sparse/offset ids would silently seed fewer
    // than k centers). orderBy+limit plans as TakeOrderedAndProject —
    // O(n) scan, O(k) result, no global sort. cid = rank-1, which equals
    // the id itself on dense 0-based ids (what the SQL oracle pins).
    val seedIds = pointsLong.select(col(idCol)).distinct()
      .orderBy(col(idCol)).limit(k)
      .withColumn("cid",
        (row_number().over(Window.orderBy(col(idCol))) - 1).cast("int"))
    var centers = pointsLong.join(broadcast(seedIds), idCol)
      .select(col("cid"), col("dim"), col("v").as("c"))
    (1 to iters).foreach { _ =>
      val assign = assignToCenters(pointsLong, centers, idCol, "cid")
        .select(col(idCol), col("cid"))
      centers = pointsLong.join(assign, idCol)
        .groupBy(col("cid"), col("dim"))
        .agg(avg(col("v")).as("c"))
    }
    centers
  }

  def fitKMeans(df: DataFrame, arrCol: String, k: Int, seed: Long = 42L): DataFrame = {
    val prepared = df.withColumn("features",
      array_to_vector(col(arrCol).cast("array<double>")))
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("features")
      .fit(prepared)
    model.transform(prepared)
  }

  /** mllib k-means with EXPLICIT initial centers and a fixed iteration
    * count — the reference's `init=` escape hatch
    * (`splearn/cluster/k_means_.py:~L10`) with the RNG removed entirely:
    * `setInitialModel` skips k-means‖ seeding, `epsilon=0` disables
    * early stop, so the distributed fit is `iters` exact Lloyd updates
    * from caller-supplied seeds and an SQL oracle can replay it update
    * for update. Seeds are O(k·d) driver state (`centersLong` is
    * (cid, dim, c) long form, cid dense 0-based). The returned
    * assignment uses exact squared distance with lowest-cid tie-breaks —
    * the same total order as the SQL `row_number` rule.
    */
  def fitKMeansPinned(df: DataFrame, idCol: String, arrCol: String,
                      centersLong: DataFrame, cidCol: String,
                      iters: Int): DataFrame = {
    val spark = df.sparkSession
    val seedRows = centersLong
      .select(col(cidCol).cast("int"), col("dim").cast("int"),
        col("c").cast("double"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    val k = seedRows.map(_._1).distinct.length
    val d = seedRows.map(_._2).max // dims are 1-based
    val mat = Array.fill(k, d)(0.0)
    seedRows.foreach { case (cid, dim, v) => mat(cid)(dim - 1) = v }
    val init = new OldKMeansModel(mat.map(OldVectors.dense))
    val rows = df.select(col(idCol).cast("long"), col(arrCol).cast("array<double>"))
      .rdd.map(r => (r.getLong(0), OldVectors.dense(r.getSeq[Double](1).toArray)))
    rows.persist()
    val model = try new OldKMeans().setK(k).setMaxIterations(iters)
        .setEpsilon(0.0).setInitialModel(init).run(rows.values)
      finally rows.unpersist(blocking = false)
    val bc = spark.sparkContext.broadcast(
      model.clusterCenters.map(_.toArray))
    val assigned = df
      .select(col(idCol).cast("long"), col(arrCol).cast("array<double>"))
      .rdd.map { r =>
        val v = r.getSeq[Double](1).toArray
        val cs = bc.value
        var best = 0; var bd = Double.MaxValue; var i = 0
        while (i < cs.length) {
          var s = 0.0; var j = 0
          while (j < v.length) {
            val diff = v(j) - cs(i)(j); s += diff * diff; j += 1
          }
          if (s < bd) { bd = s; best = i }
          i += 1
        }
        Row(r.getLong(0), best)
      }
    spark.createDataFrame(assigned, StructType(Seq(
      StructField(idCol, LongType), StructField("cid", IntegerType))))
  }

  /** Gramian entries XᵀX[i,j], upper triangle — the reference's
    * `treeReduce(Σ XᵀX)` faithfully: per-partition triangle
    * accumulation + treeReduce ([[gramianLongForm]]), not the long-form
    * self-join this used to be (which shuffled n·d rows by id and was
    * measured 30× slower at stress scale). `idCol` is accepted for
    * surface uniformity with the sibling operators; the sufficient
    * statistic needs only the vectors.
    */
  def gramian(df: DataFrame, idCol: String, arrCol: String, maxDim: Int): DataFrame =
    gramianLongForm(
      df.select(slice(col(arrCol).cast("array<double>"), 1, maxDim).as("_t")),
      "_t")
      .where(col("di") <= col("dj"))
      .select(col("di").as("dim_i"), col("dj").as("dim_j"),
        round(col("g"), 4).as("gram"))

  /** C4 (reference `svd_em`, `splearn/decomposition/truncated_svd.py:~L40`
    * — iterative SVD via EM updates) re-expressed Spark-first as a
    * deterministic POWER ITERATION on the Gramian: v ← G·v / ‖G·v‖ for a
    * FIXED number of rounds from the fixed start e₁. Fixed iterations +
    * fixed start + sign canonicalization (largest-|component| positive,
    * lowest dim on ties) make every output value an arithmetic function
    * of the input — reproducible by an unrolled SQL oracle, which the
    * ARPACK/Breeze path of [[fitSvd]] can never be.
    *
    * Shape: the corpus-proportional work is ONE Gramian pass
    * ([[gramianLongForm]] — per-partition triangle accumulation, no
    * shuffle of the points, ≤partitions×d² bytes merged); the iteration
    * then runs on the d-row vector against the checkpointed d²-row
    * Gramian — free at any corpus size. Returns (dim, v, sigma): the
    * top right singular vector and σ₁ = sqrt(‖G·v‖).
    */
  def powerIterationTop(df: DataFrame, idCol: String, arrCol: String,
                        iters: Int = 8): DataFrame =
    powerIterationComponents(df, idCol, arrCol, k = 1, iters).drop("comp")

  /** Top-k TRUNCATED SVD, fully deterministic: [[powerIterationTop]]'s
    * fixed-round loop per component, with Hotelling deflation between
    * components — G ← G − λ·v·vᵀ zeroes the found eigenpair, so the next
    * loop converges to the next one. Deflation is plain arithmetic on
    * the d²-row Gramian frame with the UNROUNDED vector, so the whole
    * k-component fit stays SQL-oracle-able (the c4_svd_power2 oracle
    * unrolls both loops and the deflation). Returns
    * (comp 1..k, dim, v, sigma), each component sign-canonicalized.
    */
  def powerIterationComponents(df: DataFrame, idCol: String, arrCol: String,
                               k: Int, iters: Int = 8): DataFrame = {
    require(k >= 1, s"k=$k must be positive")
    require(iters >= 1, s"iters=$iters must be positive")
    // d²-row frame (feature-dim squared, corpus-independent) — slim by
    // the r9 criterion; localCheckpoint across this file is fine
    var g = gramianLongForm(df, arrCol).localCheckpoint()
    // One fixed-round loop over the current Gramian: returns the
    // UNROUNDED unit vector and the 1-row λ = ‖G·v‖ frame.
    def powerLoop(gc: DataFrame): (DataFrame, DataFrame) = {
      def mul(vcur: DataFrame): DataFrame = gc
        .join(vcur.select(col("dim").as("dj"), col("v").as("pv")), "dj")
        .groupBy(col("di")).agg(sum(col("g") * col("pv")).as("w"))
      var v = gc.select(col("di").as("dim")).distinct()
        .withColumn("v", when(col("dim") === 1, lit(1.0)).otherwise(lit(0.0)))
      for (_ <- 1 to iters) {
        val w = mul(v)
        val n = w.agg(sqrt(sum(col("w") * col("w"))).as("n"))
        // d-row frame; checkpoint keeps the plan O(1) across iterations.
        // Zero-norm guard: past the corpus rank, deflation leaves G ≈ 0
        // and w/n would be 0/0 = NaN (or FP-noise nondeterminism); the
        // component degrades to the zero vector with sigma 0 instead —
        // deterministic, and the oracle applies the same rule.
        v = w.crossJoin(n)
          .select(col("di").as("dim"),
            when(col("n") > 0, col("w") / col("n")).otherwise(lit(0.0))
              .as("v"))
          .localCheckpoint()
      }
      (v, mul(v).agg(sqrt(sum(col("w") * col("w"))).as("l")))
    }
    val outs = (1 to k).map { c =>
      val (v, lam) = powerLoop(g)
      if (c < k) {
        g = g
          .join(v.select(col("dim").as("di"), col("v").as("_va")), "di")
          .join(v.select(col("dim").as("dj"), col("v").as("_vb")), "dj")
          .crossJoin(lam)
          .select(col("di"), col("dj"),
            (col("g") - col("l") * col("_va") * col("_vb")).as("g"))
          .localCheckpoint()
      }
      val sgn = v.orderBy(abs(col("v")).desc, col("dim")).limit(1)
        .select(when(col("v") < 0, -1.0).otherwise(1.0).as("s"))
      v.crossJoin(sgn).crossJoin(lam)
        .select(lit(c).as("comp"), col("dim"),
          (round(col("v") * col("s"), 6) + lit(0.0)).as("v"),
          (round(sqrt(col("l")), 4) + lit(0.0)).as("sigma"))
    }
    outs.reduce(_ unionByName _)
  }

  /** Top-k eigenvectors by ORTHOGONAL (subspace) iteration — the
    * QR-in-SQL alternative to [[powerIterationComponents]]'s sequential
    * deflation: all k vectors advance together each round (V ← orth(G·V))
    * and the orthogonalization is MODIFIED Gram-Schmidt in long form —
    * u_c subtracts its projection onto each previous q_j SEQUENTIALLY,
    * re-projecting the RUNNING residual (the numerically stable form:
    * CGS's error grows with κ², MGS's with κ); projection coefficients
    * and norms are d-row aggregates, so every round is plain joins +
    * groupBys over the (dim, comp) frame and the whole fit stays
    * SQL-oracle-able. (At k = 2 there is only one projection, so MGS ≡
    * CGS and the k=2 oracle is unchanged; c8_orth_iter3 pins the k=3
    * MGS unroll.) Deterministic contract matches the
    * deflation path exactly: fixed start V₀ = [e₁…e_k], fixed `iters`
    * rounds, zero-norm guard (a rank-deficient Gramian degrades trailing
    * components to the zero vector, never NaN), per-component sign
    * canonicalization, sigma_c = √‖G·q_c‖ — so the two algorithms'
    * outputs are directly comparable (OrthIterSpec pins agreement).
    *
    * Scale shape: the corpus is touched once (the imperative Gramian);
    * every subsequent frame is O(d·k) or O(d²) rows with O(1) lineage
    * (per-round localCheckpoint). Subspace iteration converges on
    * CLUSTERED spectra where one-at-a-time deflation stalls — the reason
    * production SVD solvers (and mllib's ARPACK mode) iterate blocks.
    */
  def orthogonalIteration(df: DataFrame, idCol: String, arrCol: String,
                          k: Int, iters: Int = 8): DataFrame = {
    require(k >= 1, s"k=$k must be positive")
    require(iters >= 1, s"iters=$iters must be positive")
    val spark = df.sparkSession
    // localCheckpoint truncates LINEAGE but deliberately carries the
    // parent plan's size ESTIMATE through the cut (so join strategy
    // decisions survive checkpointing). The Gram-Schmidt round below
    // joins two same-round frames, so that carried estimate is
    // multiplied by itself every round — after tens of rounds the
    // BigInt sizeInBytes reaches millions of bits and Catalyst's stats
    // visitor, not execution, becomes the bottleneck. pinFresh
    // re-wraps the checkpointed partitions in a fresh LogicalRDD with
    // default stats: O(d·k)-row frames, conversion cost negligible,
    // estimate growth reset to a constant per round. (The power-
    // iteration loop above doesn't need this: its only join is against
    // the FIXED Gramian, so its estimate grows additively.)
    def pinFresh(d: DataFrame): DataFrame = {
      val cp = d.localCheckpoint()
      spark.createDataFrame(cp.rdd, cp.schema)
    }
    val g = gramianLongForm(df, arrCol).localCheckpoint()
    // W = G·V for the whole k-column block: one join + one aggregation.
    def mul(v: DataFrame): DataFrame = g
      .join(v.select(col("dim").as("dj"), col("comp"), col("v").as("pv")), "dj")
      .groupBy(col("di").as("dim"), col("comp"))
      .agg(sum(col("g") * col("pv")).as("w"))
    val comps = spark.range(1, k + 1).selectExpr("CAST(id AS INT) AS comp")
    var v = g.select(col("di").as("dim")).distinct()
      .crossJoin(comps)
      .withColumn("v",
        when(col("dim") === col("comp"), lit(1.0)).otherwise(lit(0.0)))
    for (_ <- 1 to iters) {
      val w = pinFresh(mul(v))
      // Modified Gram-Schmidt, smallest comp first: u_c starts as w_c
      // and subtracts its projection onto each previous q_j IN ORDER,
      // each coefficient taken against the RUNNING residual
      // (r_cj = q_j·u, u ← u − r_cj·q_j) — the stable form for k ≥ 3;
      // identical arithmetic to CGS at k ≤ 2. Each coefficient is a
      // 1-row aggregate crossJoined back (broadcast); frames ≤ d rows.
      val qList = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      for (c <- 1 to k) {
        var uc = w.where(col("comp") === c).select(col("dim"), col("w"))
        for (j <- 0 until c - 1) {
          val qj = qList(j).select(col("dim"), col("v"))
          val r = qj.join(uc, "dim")
            .agg(sum(col("v") * col("w")).as("r"))
          uc = uc.join(qj, "dim").crossJoin(r)
            .select(col("dim"),
              (col("w") - col("r") * col("v")).as("w"))
        }
        val n = uc.agg(sqrt(sum(col("w") * col("w"))).as("n"))
        val qc = uc.crossJoin(n)
          .select(col("dim"), lit(c).as("comp"),
            when(col("n") > 0, col("w") / col("n")).otherwise(lit(0.0))
              .as("v"))
        qList += qc
      }
      v = pinFresh(qList.reduce(_ unionByName _))
    }
    val lam = mul(v).groupBy(col("comp"))
      .agg(sqrt(sum(col("w") * col("w"))).as("l"))
    val wSgn = Window.partitionBy(col("comp"))
      .orderBy(abs(col("v")).desc, col("dim"))
    val sgn = v.withColumn("_rn", row_number().over(wSgn))
      .where(col("_rn") === 1)
      .select(col("comp"), when(col("v") < 0, -1.0).otherwise(1.0).as("s"))
    v.join(sgn, "comp").join(lam, "comp")
      .select(col("comp"), col("dim"),
        (round(col("v") * col("s"), 6) + lit(0.0)).as("v"),
        (round(sqrt(col("l")), 4) + lit(0.0)).as("sigma"))
  }

  /** Full d×d Gramian Σxxᵀ in long form (di, dj, g), 1-based dims —
    * per-partition imperative accumulation into a d·(d+1)/2 upper-
    * triangle buffer, treeReduce-merged, mirrored on the driver (O(d²)
    * driver state, same as [[fitSvd]]). This is the one place the
    * declarative forms lose badly: a join or higher-order-function
    * formulation was measured 30× slower at 200k×64 (Spark interprets
    * array lambdas per element; the tight while-loop runs at memory
    * bandwidth). mllib's `RowMatrix.computeGramianMatrix` uses the same
    * shape.
    */
  private def gramianLongForm(df: DataFrame, arrCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // null arrays contribute nothing (matching the declarative long-form
    // path, where posexplode drops them); an empty input yields an empty
    // Gramian frame rather than a treeReduce crash
    val partials = df.select(col(arrCol).cast("array<double>"))
      .where(col(arrCol).isNotNull).rdd
      .mapPartitions { it =>
        var acc: Array[Double] = null
        var d = 0
        it.foreach { r =>
          val a = r.getSeq[Double](0).toArray
          if (acc == null) { d = a.length; acc = new Array[Double](d * (d + 1) / 2) }
          require(a.length == d,
            s"ragged vectors: ${a.length} vs $d — Gramian undefined")
          var i = 0; var k = 0
          while (i < d) {
            val ai = a(i); var j = i
            while (j < d) { acc(k) += ai * a(j); j += 1; k += 1 }
            i += 1
          }
        }
        if (acc == null) Iterator.empty else Iterator.single((d, acc))
      }
    if (partials.isEmpty())
      return Seq.empty[(Int, Int, Double)].toDF("di", "dj", "g")
    val (d, tri) = partials.treeReduce { case ((d1, a1), (d2, a2)) =>
      require(d1 == d2, s"ragged vectors across partitions: $d1 vs $d2")
      var i = 0
      while (i < a1.length) { a1(i) += a2(i); i += 1 }
      (d1, a1)
    }
    val rows = for {
      i <- 0 until d; j <- i until d
      v = tri(i * d - i * (i - 1) / 2 + (j - i))
      r <- if (i == j) Seq((i + 1, j + 1, v)) else Seq((i + 1, j + 1, v), (j + 1, i + 1, v))
    } yield r
    rows.toDF("di", "dj", "g")
  }

  /** Projection of every row onto the [[powerIterationTop]] component:
    * X·v₁ as one broadcast join + per-id aggregation (map-side GEMV —
    * no corpus shuffle beyond the id grouping). The deterministic twin
    * of [[svdProject]]'s first coordinate: same linear map, but the
    * vector comes from the fixed-round iteration, so the whole pipeline
    * (fit AND transform) is SQL-oracle-able. The vector is used at its
    * ROUNDED (6-dp) published precision so engine and oracle project
    * with identical coefficients.
    */
  def powerProjectTop(df: DataFrame, idCol: String, arrCol: String,
                      iters: Int = 8): DataFrame = {
    val v = powerIterationTop(df, idCol, arrCol, iters)
      .select(col("dim"), col("v").as("_pv"))
    val pts = NaiveBayesOps.toLongForm(df, Seq(idCol), arrCol)
    pts.join(broadcast(v), "dim")
      .groupBy(col(idCol))
      .agg(sum(col("v") * col("_pv")).as("pc1"))
  }

  /** Fitted truncated SVD: right singular vectors V (d×k, column-major)
    * and singular values — the engine's `components_` export (reference
    * `SparkTruncatedSVD.fit` stored exactly this,
    * `splearn/decomposition/truncated_svd.py:~L120`). Driver state is
    * O(d·k), never O(n).
    */
  final case class SvdModel(d: Int, k: Int, v: Array[Double], sigma: Array[Double]) {
    /** Column j of V. */
    def component(j: Int): Array[Double] = v.slice(j * d, (j + 1) * d)
  }

  /** Fit a truncated SVD on an array column via `RowMatrix.computeSVD`
    * (local Breeze eig on the Gramian for small d, distributed ARPACK for
    * large d — mllib picks). Each singular vector is SIGN-CANONICALIZED:
    * the component with the largest |value| (lowest index on ties) is made
    * positive. Eigenvector sign is arbitrary in every solver; pinning it
    * makes fits comparable across runs/engines — the rule an SQL oracle
    * can mirror.
    */
  def fitSvd(df: DataFrame, arrCol: String, k: Int): SvdModel = {
    val rows = df.select(col(arrCol).cast("array<double>"))
      .rdd.map(r => OldVectors.dense(r.getSeq[Double](0).toArray))
    // ARPACK mode iterates mat-vec products over this RDD; cache for the
    // duration of the (eager) fit only.
    rows.persist()
    val svd = try new RowMatrix(rows).computeSVD(k, computeU = false)
              finally rows.unpersist(blocking = false)
    val d = svd.V.numRows
    val v = svd.V.toArray // d*k col-major
    var j = 0
    while (j < k) {
      var best = 0; var i = 1
      while (i < d) {
        if (math.abs(v(j * d + i)) > math.abs(v(j * d + best))) best = i
        i += 1
      }
      if (v(j * d + best) < 0) {
        i = 0
        while (i < d) { v(j * d + i) = -v(j * d + i); i += 1 }
      }
      j += 1
    }
    SvdModel(d, k, v, svd.s.toArray)
  }

  /** Truncated SVD projection X·V_k per row id (reference
    * `SparkTruncatedSVD.transform`). V is broadcast; the projection is a
    * map-side GEMV — no shuffle, scan-linear at any corpus size.
    */
  def svdProject(df: DataFrame, idCol: String, arrCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    val model = fitSvd(df, arrCol, k)
    val vBcast = spark.sparkContext.broadcast(model.v)
    val d = model.d
    val projected = df
      .select(col(idCol).cast("long"), col(arrCol).cast("array<double>"))
      .rdd.map { r =>
        val arr = r.getSeq[Double](1).toArray
        val out = Array.tabulate(k) { j =>
          var s = 0.0; var i = 0
          while (i < d) { s += arr(i) * vBcast.value(j * d + i); i += 1 }
          s
        }
        Row(r.getLong(0), out.toSeq)
      }
    spark.createDataFrame(projected, StructType(Seq(
      StructField(idCol, LongType), StructField("proj", ArrayType(DoubleType)))))
  }
}
