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

  /** Write a named bundle: each part under `path/parts/<name>`, plus a
    * `path/_manifest` parquet of (part, schema_ddl). Overwrites any
    * bundle already at `path`.
    */
  def saveBundle(spark: SparkSession, path: String,
                 parts: Map[String, DataFrame]): Unit = {
    require(parts.nonEmpty, "empty model bundle")
    parts.keys.foreach { n =>
      require(PartName.matches(n),
        s"part name '$n' must match ${PartName.regex}")
    }
    parts.foreach { case (n, df) =>
      df.write.mode("overwrite").parquet(s"$path/parts/$n")
    }
    import spark.implicits._
    parts.toSeq.map { case (n, df) => (n, typeDdl(df)) }
      .sortBy(_._1)
      .toDF("part", "schema_ddl")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_manifest")
  }

  /** Load a bundle saved by [[saveBundle]]: reads the manifest, loads
    * every part, and REQUIRES each part's on-disk schema to match the
    * manifest's recorded DDL.
    */
  def loadBundle(spark: SparkSession, path: String)
      : Map[String, DataFrame] = {
    val manifest = spark.read.parquet(s"$path/_manifest")
      .select("part", "schema_ddl").collect()
    require(manifest.nonEmpty, s"empty model manifest at $path")
    manifest.map { r =>
      val n = r.getString(0)
      require(PartName.matches(n),
        s"manifest names invalid part '$n' — refusing to resolve a path")
      val df = spark.read.parquet(s"$path/parts/$n")
      require(typeDdl(df) == r.getString(1),
        s"schema drift for part '$n': saved <${r.getString(1)}> vs " +
          s"on-disk <${typeDdl(df)}>")
      n -> df
    }.toMap
  }
}
