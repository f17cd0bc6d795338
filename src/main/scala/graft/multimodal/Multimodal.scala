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
