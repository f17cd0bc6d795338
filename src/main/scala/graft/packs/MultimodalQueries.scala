package graft.packs

import graft.QueryPack
import graft.core.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): binary payloads
  * through a partition-iterator decode stage. The decode is a documented
  * stub (codecs unavailable); the byte-derived features are exact, so the
  * whole Spark path — binary encode → Dataset[MediaRecord] →
  * mapPartitions decode → features — is oracle-verified.
  */
object MultimodalQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    "multimodal_decode_meta" -> ((s, dir) => {
      val media = Multimodal.toMedia(Tables(s, dir).documents)
      Multimodal.decodeStub(media).toDF()
        .orderBy(col("doc_id"))
    }),

    // Frame sampling: every 2nd frame of each "video", frame payload
    // sliced from the binary column, per-frame content hash.
    "multimodal_frame_sample" -> ((s, dir) => {
      val media = Multimodal.toMedia(Tables(s, dir).documents)
      val meta = Multimodal.decodeStub(media).toDF()
        .select(col("doc_id"), col("n_frames"))
      val withFrames = media.toDF().join(meta, "doc_id")
      Multimodal.sampleFrames(withFrames, "n_frames", stride = 2)
        .select(col("doc_id"), col("frame_idx"), col("frame_len"),
          col("frame_hash"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // Aspect-preserving resize geometry for a 224-box.
    "multimodal_resize_fit" -> ((s, dir) => {
      val media = Multimodal.toMedia(Tables(s, dir).documents)
      Multimodal.resizeFit(Multimodal.decodeStub(media).toDF(), box = 224)
        .select(col("doc_id"), col("width"), col("height"),
          col("out_w"), col("out_h"))
        .orderBy(col("doc_id"))
    }),

    // Fixed-size chunking (audio/blob shape) with per-chunk hashes.
    "multimodal_chunks" -> ((s, dir) => {
      val media = Multimodal.toMedia(
        Tables(s, dir).documents.where(col("doc_id") < 200))
      Multimodal.chunkPayload(media.toDF(), chunkBytes = 500)
        .select(col("doc_id"), col("chunk_idx"), col("chunk_len"),
          col("chunk_hash"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    })
  )

  val oracles: Map[String, String] = Map(
    // ascii corpus ⇒ utf-8 bytes == chars; md5(text) == md5(payload).
    "multimodal_decode_meta" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_hash,
        |  CAST(64 + length(text) % 512 AS INT) AS width,
        |  CAST(64 + (length(text) * 7) % 512 AS INT) AS height,
        |  CAST(1 + length(text) % 8 AS INT) AS n_frames
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // ascii corpus: payload slice == text substring, same md5.
    "multimodal_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n,
        |    CAST(1 + length(text) % 8 AS BIGINT) AS f
        |  FROM documents),
        |e AS (SELECT doc_id, text, n, f, unnest(range(0, f, 2)) AS i FROM m)
        |SELECT doc_id, CAST(i AS INT) AS frame_idx,
        |  CAST(((i + 1) * n) // f - (i * n) // f AS BIGINT) AS frame_len,
        |  md5(substr(text, CAST((i * n) // f + 1 AS INT),
        |      CAST(((i + 1) * n) // f - (i * n) // f AS INT))) AS frame_hash
        |FROM e
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "multimodal_resize_fit" ->
      """WITH meta AS (
        |  SELECT doc_id,
        |    CAST(64 + length(text) % 512 AS INT) AS width,
        |    CAST(64 + (length(text) * 7) % 512 AS INT) AS height
        |  FROM documents)
        |SELECT doc_id, width, height,
        |  CAST(greatest(1, (width * 224) // greatest(width, height)) AS INT) AS out_w,
        |  CAST(greatest(1, (height * 224) // greatest(width, height)) AS INT) AS out_h
        |FROM meta
        |ORDER BY doc_id""".stripMargin,

    "multimodal_chunks" ->
      """WITH m AS (
        |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
        |  FROM documents WHERE doc_id < 200 AND length(text) > 0),
        |e AS (SELECT doc_id, text, unnest(range(0, (n - 1) // 500 + 1)) AS i FROM m)
        |SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        |  CAST(length(substr(text, CAST(i * 500 + 1 AS INT), 500)) AS BIGINT)
        |    AS chunk_len,
        |  md5(substr(text, CAST(i * 500 + 1 AS INT), 500)) AS chunk_hash
        |FROM e
        |ORDER BY doc_id, chunk_idx""".stripMargin
  )
}
