package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Maintenance for the durable partitioned index assets
  * ([[graft.text.TextAnalysis.writePositionalIndex]]'s term_bucket
  * layout, [[graft.similarity.Similarity.writeIvfIndex]]'s cell
  * layout): the append-only merge paths each add one parquet file per
  * touched partition per increment, so a daily-increment year
  * accumulates ~365 small files per partition — at 100 TB that kills
  * scan planning (file listing + footer reads scale with file COUNT)
  * and read throughput (row groups too small to amortize IO). Compaction
  * rewrites every partition's files into one file per partition value
  * (bounded by `maxRecordsPerFile` when set, so a skewed hot partition
  * still splits into full-size files) and atomically swaps the rewrite
  * in. The contract mirrors the merge ops': compaction changes FILES,
  * never rows — compact ≡ no-op row-for-row, pinned by running the
  * asset's own query oracle over the compacted asset
  * (`text_phrase_index_compact`, `sim_ivf_index_compact`).
  */
object AssetMaintenance {

  /** Parquet data files under `path` (recursive; underscore/dot-prefixed
    * metadata such as the `_graft_*` sidecars and `_SUCCESS` excluded) —
    * the small-file-count observable compaction exists to shrink.
    */
  def dataFileCount(spark: SparkSession, path: String): Long = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) n += 1
    }
    n
  }

  /** Rewrite a `partitionBy(partitionCol)` parquet asset so each
    * partition value holds one file (or ⌈rows/maxRecordsPerFile⌉ files
    * when that bound is set — the giant-partition guard). Top-level
    * `_`-prefixed sidecar FILES (the `_graft_buckets` / `_graft_centroids`
    * metadata) are carried into the rewrite, so the compacted asset is
    * a full drop-in.
    *
    * Shape: one shuffle hash-partitioned on the partition column (each
    * value lands in exactly one task, so the dynamic-partition write
    * emits exactly one file per value), then a directory swap — the
    * rewrite goes to a sibling tmp dir and replaces the asset with two
    * renames (metadata ops on HDFS-compatible stores). A reader caught
    * mid-swap sees the old asset or the new one, never a mix; a failed
    * rewrite leaves the live asset untouched (the tmp dir is orphaned,
    * not installed). Returns (dataFilesBefore, dataFilesAfter).
    */
  def compactPartitionedAsset(spark: SparkSession, path: String,
                              partitionCol: String,
                              maxRecordsPerFile: Long = 0L): (Long, Long) = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"no asset at $path")
    val before = dataFileCount(spark, path)
    val tmp = new Path(path + ".compact.tmp")
    fs.delete(tmp, true)
    val w = spark.read.parquet(path)
      .repartition(col(partitionCol))
      .write.partitionBy(partitionCol).mode("overwrite")
    (if (maxRecordsPerFile > 0)
      w.option("maxRecordsPerFile", maxRecordsPerFile)
    else w).parquet(tmp.toString)
    // sidecars AFTER the data commit (the writePositionalIndex ordering:
    // a failed rewrite never yields a tmp dir that looks like an asset)
    fs.listStatus(root).filter(s => s.isFile &&
      s.getPath.getName.startsWith("_graft_")).foreach { s =>
      org.apache.hadoop.fs.FileUtil.copy(
        fs, s.getPath, fs, new Path(tmp, s.getPath.getName),
        false, spark.sparkContext.hadoopConfiguration)
    }
    installAsset(spark, tmp.toString, path)
    (before, dataFileCount(spark, path))
  }

  /** Atomically replace the live asset at `path` with the fully-built
    * one at `tmpPath`: two renames (metadata ops on HDFS-compatible
    * stores) with restore-on-failure — a reader caught mid-swap sees
    * the old asset or the new one, never a mix or a hole. Shared by
    * the compaction and retrain-rebuild maintenance paths.
    */
  def installAsset(spark: SparkSession, tmpPath: String,
                   path: String): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(tmpPath)
    require(fs.exists(tmp), s"no rebuilt asset at $tmpPath")
    val old = new Path(path + ".swap.old")
    fs.delete(old, true)
    require(fs.rename(root, old), s"install: could not move $path aside")
    if (!fs.rename(tmp, root)) {
      // restore the live asset before failing — never leave a hole
      fs.rename(old, root)
      throw new IllegalStateException(s"install: could not install $tmpPath")
    }
    fs.delete(old, true): Unit
  }
}
