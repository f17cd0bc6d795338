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
        |ORDER BY doc_id""".stripMargin
  )
}
