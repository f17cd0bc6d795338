package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque media record: bytes + typed metadata. The Spark-side contract
  * for multimodal columns — image/audio/video payloads travel as `binary`
  * with their metadata in plain columns, so Catalyst prunes/pushes around
  * them and only the decode stage touches the bytes.
  */
final case class MediaRecord(
    doc_id: Long,
    payload: Array[Byte],
    media_type: String)

/** Deterministic features a decoder would emit (dimensions, frame count,
  * content hash). Real decoders plug in at [[Multimodal.decodeStub]].
  */
final case class MediaFeatures(
    doc_id: Long,
    n_bytes: Long,
    content_hash: String,
    width: Int,
    height: Int,
    n_frames: Int)

/** Multimodal-column plumbing (north-star extension).
  *
  * The decode itself is a STUB — image/audio codecs are not available in
  * this environment — but everything Spark-side is real and tested: the
  * binary column schema, the partition-iterator decode stage (the Scala
  * analog of `mapInPandas`: one batch-iterator call per partition, zero
  * per-row overhead), and the deterministic feature contract that lets an
  * SQL oracle verify the plumbing end-to-end.
  *
  * 100 TB notes: payload bytes never pass through a shuffle here — decode
  * is map-side; downstream joins/aggs should select the feature columns
  * only (column pruning drops the bytes at the scan). For real media,
  * `spark.sql.files.maxPartitionBytes` bounds decode-batch memory.
  */
object Multimodal {

  /** Wrap a text corpus as opaque media records (utf-8 payload bytes). */
  def toMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").cast("long"),
      expr("cast(text as binary)").as("payload"),
      lit("text/plain").as("media_type"))
      .as[MediaRecord]
  }

  /** Frame sampling: one output row per sampled frame, binary frame
    * payload attached. The frame DECODE is the stub (frame bytes = an
    * equal slice of the payload; a real codec plugs in at the slice); the
    * Spark shape is the real thing — a generator over a frame-index
    * sequence, slice + hash computed per emitted row, payload untouched
    * for skipped frames. At scale this is the row-explosion stage you
    * size `spark.sql.shuffle.partitions` for: output rows = Σ
    * ceil(n_frames/stride), payload bytes never duplicated per frame
    * beyond the emitted slices.
    */
  def sampleFrames(media: DataFrame, nFramesCol: String,
                   stride: Int): DataFrame = {
    require(stride >= 1, s"stride=$stride must be >= 1")
    media
      .withColumn("frame_idx",
        explode(expr(s"sequence(0, $nFramesCol - 1, $stride)")))
      .withColumn("_n", length(col("payload")).cast("long"))
      .withColumn("_start",
        (col("frame_idx") * col("_n") / col(nFramesCol)).cast("long"))
      .withColumn("_end",
        ((col("frame_idx") + 1) * col("_n") / col(nFramesCol)).cast("long"))
      .withColumn("frame_bytes",
        expr("substring(payload, cast(_start + 1 as int), cast(_end - _start as int))"))
      .withColumn("frame_len", (col("_end") - col("_start")).cast("long"))
      .withColumn("frame_hash", md5(col("frame_bytes")))
      .drop("_n", "_start", "_end")
  }

  /** Aspect-preserving resize plan: exact integer math on the decoded
    * dimensions (the actual pixel resampling is the codec stub's job —
    * this is the metadata transform a real `mapInPandas` resize stage
    * would read its target geometry from).
    */
  def resizeFit(features: DataFrame, box: Int): DataFrame = {
    val longSide = greatest(col("width"), col("height"))
    features
      .withColumn("out_w",
        greatest(lit(1), (col("width") * box / longSide).cast("int")))
      .withColumn("out_h",
        greatest(lit(1), (col("height") * box / longSide).cast("int")))
  }

  /** Fixed-size payload chunking (the audio/blob shape): generator over
    * chunk indices, per-chunk slice + content hash. Chunk boundaries are
    * byte offsets — no decode required — so the stage is exact and
    * oracle-checkable while carrying real binary slices.
    */
  def chunkPayload(media: DataFrame, chunkBytes: Int): DataFrame = {
    require(chunkBytes >= 1, s"chunkBytes=$chunkBytes must be >= 1")
    media
      .withColumn("_n", length(col("payload")).cast("long"))
      .where(col("_n") > 0)
      .withColumn("chunk_idx",
        explode(expr(s"sequence(0, cast((_n - 1) div $chunkBytes as int))")))
      .withColumn("chunk",
        expr(s"substring(payload, chunk_idx * $chunkBytes + 1, $chunkBytes)"))
      .withColumn("chunk_len", length(col("chunk")).cast("long"))
      .withColumn("chunk_hash", md5(col("chunk")))
      .drop("_n")
  }

  /** Partition-wise "decode": real iterator plumbing, fake codec.
    *
    * STUB: a real implementation would decode the payload (JPEG dims,
    * audio sample counts, video frame extraction). Here every feature
    * derives deterministically from the byte content, keeping the stage
    * verifiable: n_bytes and content_hash are true functions of the bytes;
    * width/height/n_frames are the documented fake
    * (64 + n%512, 64 + 7n%512, 1 + n%8).
    */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // one digest instance per partition, not per row
      val digest = MessageDigest.getInstance("MD5")
      it.map { m =>
        val n = m.payload.length.toLong
        digest.reset()
        val hash = digest.digest(m.payload)
          .map(b => f"${b & 0xff}%02x").mkString
        MediaFeatures(
          m.doc_id, n, hash,
          width = (64 + n % 512).toInt,
          height = (64 + (n * 7) % 512).toInt,
          n_frames = (1 + n % 8).toInt)
      }
    }
  }
}
