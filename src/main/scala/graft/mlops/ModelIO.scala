package graft.mlops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet persistence for deployable model artifacts — the upstream
  * estimators were plain sklearn objects and pickled for free
  * (`splearn/base.py`); this engine's models are DataFrames (NB
  * sufficient stats, OLS coefficient rows, scored-gate weights + LM
  * table, PQ codebooks, minhash band indexes), so persistence is a
  * named BUNDLE of parquet tables plus a manifest, written through the
  * same FS layer as any other table (local, HDFS, S3 — no driver-side
  * file IO, no java serialization).
  *
  * Contract: `loadBundle(spark, path)` after `saveBundle(spark, path,
  * parts)` returns frames that are ROW-IDENTICAL to the saved ones —
  * parquet preserves doubles bit-exactly, so a model scored before and
  * after a round-trip produces identical predictions
  * (`ml_model_roundtrip` pins this through the driver hash; ModelIOSpec
  * pins it per family, including array-typed codebook rows). The
  * manifest records each part's schema DDL and load refuses on drift —
  * a silently re-typed column in yesterday's model is a corrupted
  * deploy, not a cast.
  */
object ModelIO {

  private val PartName = "^[A-Za-z0-9_\\-]{1,64}$".r

  /** Name + type DDL with nullability erased at every level —
    * parquet reads come back nullable, so NOT NULL inputs must still
    * round-trip cleanly (DataType.sql carries no null info).
    */
  private def typeDdl(df: DataFrame): String =
    df.schema.fields
      .map(f => s"${f.name} ${f.dataType.sql}").mkString(",")

  /** Order-free content fingerprint of a part: the sum of a 64-bit
    * row hash over every row. Parquet preserves values bit-exactly,
    * so the fingerprint computed on the frame handed to save equals
    * the one recomputed from disk at load — unless the part's CONTENT
    * drifted (the mixed-version hazard the versioned commit protects
    * against).
    */
  private def fingerprint(df: DataFrame): Long = {
    import org.apache.spark.sql.functions._
    // modular residues keep the ANSI-mode sum overflow-safe: each term
    // < 2^30, so overflow would need 2^33 rows — far beyond any
    // model-scale part
    df.agg(coalesce(
        sum(pmod(xxhash64(struct(df.columns.map(col): _*)),
          lit(1000000007L))), lit(0L)))
      .head().getLong(0)
  }

  /** Write a named bundle ATOMICALLY: each part under
    * `path/parts-<token>/<name>` (a fresh versioned directory per
    * save), then commit by overwriting the single `path/_manifest`
    * parquet of (part, schema_ddl, fingerprint, version) LAST. A crash
    * mid-save leaves the previous manifest pointing at the previous
    * version's intact parts — load never sees a mix of old and new
    * parts (the manifest names exactly one version, and fingerprints
    * are re-verified at load). Superseded version directories are
    * best-effort deleted after the commit.
    */
  def saveBundle(spark: SparkSession, path: String,
                 parts: Map[String, DataFrame]): Unit = {
    require(parts.nonEmpty, "empty model bundle")
    parts.keys.foreach { n =>
      require(PartName.matches(n),
        s"part name '$n' must match ${PartName.regex}")
    }
    val version = "parts-" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val rows = parts.toSeq.sortBy(_._1).map { case (n, df) =>
      df.write.mode("overwrite").parquet(s"$path/$version/$n")
      (n, typeDdl(df), fingerprint(df), version)
    }
    import spark.implicits._
    rows.toDF("part", "schema_ddl", "fingerprint", "version")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_manifest")
    // post-commit GC of superseded versions; failure here never
    // affects the committed bundle
    try {
      val hPath = new org.apache.hadoop.fs.Path(path)
      val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(hPath).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory && n.startsWith("parts-") && n != version)
          fs.delete(st.getPath, true)
      }
    } catch { case _: Exception => () }
  }

  /** Load a bundle saved by [[saveBundle]]: reads the manifest, loads
    * every part from the manifest's committed version directory, and
    * REQUIRES each part's on-disk schema DDL and content fingerprint
    * to match the manifest — refusing both type drift and mixed-save
    * content.
    */
  def loadBundle(spark: SparkSession, path: String)
      : Map[String, DataFrame] = {
    val manifest = spark.read.parquet(s"$path/_manifest")
      .select("part", "schema_ddl", "fingerprint", "version").collect()
    require(manifest.nonEmpty, s"empty model manifest at $path")
    manifest.map { r =>
      val n = r.getString(0)
      require(PartName.matches(n),
        s"manifest names invalid part '$n' — refusing to resolve a path")
      val version = r.getString(3)
      require(version.matches("^parts-[0-9a-f]{12}$"),
        s"manifest names invalid version '$version'")
      val df = spark.read.parquet(s"$path/$version/$n")
      require(typeDdl(df) == r.getString(1),
        s"schema drift for part '$n': saved <${r.getString(1)}> vs " +
          s"on-disk <${typeDdl(df)}>")
      val fp = fingerprint(df)
      require(fp == r.getLong(2),
        s"content drift for part '$n': manifest fingerprint " +
          s"${r.getLong(2)} vs on-disk $fp — refusing a mixed bundle")
      n -> df
    }.toMap
  }
}
