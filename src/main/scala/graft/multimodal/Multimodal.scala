package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
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

/** Parsed media metadata + content digest — one row per decoded payload.
  * `media_type` is what the DECODER detected from the bytes (never the
  * claimed type); `data_hash` digests only the content region
  * (pixels/samples), so re-containerized media keeps its identity.
  */
final case class MediaMeta(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    n_frames: Long,
    channels: Int,
    sample_rate: Int,
    data_offset: Int,
    data_len: Long,
    data_hash: String)

/** Nearest-neighbor-downsampled image: target geometry + the sampled
  * raster summarized as exact integers (byte count, byte-value sum) and a
  * content digest — permutation-proof numbers an SQL oracle recomputes
  * from the source bytes.
  */
final case class DownsampledImage(
    doc_id: Long,
    media_type: String,
    width: Int,
    height: Int,
    out_w: Int,
    out_h: Int,
    n_px_bytes: Long,
    px_sum: Long,
    raster_hash: String)

/** Container-level video metadata — one row per payload, every field
  * read from the actual container bytes (RIFF/AVI header walk or ISO
  * BMFF box walk). `rate` is the AVI fps / the MP4 movie timescale;
  * `frames_walked` is the number of video-frame chunks the movi walk
  * actually finds for AVI (a header-vs-content cross-check), 0 for MP4
  * where frames stay opaque inside mdat.
  */
final case class VideoMeta(
    doc_id: Long,
    container: String,
    width: Int,
    height: Int,
    n_frames: Long,
    rate: Int,
    frames_walked: Long)

/** One sampled video frame: container-relative index, the frame's OWN
  * decoded geometry (MJPEG frames are complete JPEGs), and a digest of
  * the frame bytes for exact frame-level dedup across videos.
  */
final case class VideoFrameFeature(
    doc_id: Long,
    frame_idx: Int,
    width: Int,
    height: Int,
    decode_ok: Boolean,
    frame_hash: String)

final case class ImageAHash(
    doc_id: Long,
    media_type: String,
    ahash: String,
    n_ones: Long)

final case class AudioEnvelope(
    doc_id: Long,
    media_type: String,
    envelope: String,
    n_ones: Long,
    energy: Long)

/** One spectral sub-fingerprint per audio frame (Haitsma–Kalker shape):
  * `print` is the bands−1 bit string of band-energy difference signs vs
  * the previous frame, `energy` the frame's total spectral energy.
  */
final case class AudioSpectralPrint(
    doc_id: Long,
    frame_idx: Int,
    print: String,
    energy: Long)

/** Per-document PDF header/structure facts ([[PdfCodec.pdfMeta]]). */
final case class PdfDocMeta(
    doc_id: Long,
    version: String,
    n_pages: Int,
    n_objects: Int,
    compressed: Boolean,
    encrypted: Boolean)

/** One extracted PDF page ([[PdfCodec.pdfText]]): `text` is the page's
  * Tj/TJ show strings, lines joined by '\n'.
  */
final case class PdfPageText(
    doc_id: Long,
    page: Int,
    text: String,
    n_chars: Int)

/** One web archive (WARC-style): many records framed into one opaque
  * payload row ([[WarcCodec]]).
  */
final case class WarcArchive(
    archive_id: Long,
    payload: Array[Byte],
    n_records: Int)

/** One record pulled out of a [[WarcArchive]]. */
final case class WarcRecordRow(
    archive_id: Long,
    rec_idx: Int,
    warc_type: String,
    url: String,
    http_status: Int,
    content_type: String,
    n_bytes: Int,
    body_md5: String)

/** Multimodal-column plumbing (north-star extension).
  *
  * The decode stage runs REAL header parsers ([[MediaCodec]]: BMP, RIFF
  * WAV, binary PPM) inside a partition iterator — the Scala analog of
  * `mapInPandas`: one batch-iterator call per partition, zero per-row
  * overhead. Formats needing an external codec (JPEG, video containers)
  * are out of scope in this environment; unknown payloads decode to a
  * typed `unknown` row, never an exception.
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

  /** Wrap a text corpus as REAL self-describing media blobs — each doc's
    * utf-8 bytes become the content region of a valid BMP, PCM WAV,
    * binary-PPM, or PNG container (round-robin by doc_id). Geometry
    * derives deterministically from the content length n, so an SQL
    * oracle can recompute what the header parser must find:
    *   BMP (doc_id%4=0): w = 16 + n%97,  h = max(1, ceil(n / (3w)))
    *   WAV (doc_id%4=1): channels = 1 + n%2, rate = 8000 + (n%5)*1000,
    *                     16-bit  =>  frames = n div (channels*2)
    *   PPM (doc_id%4=2): w = 8 + n%61,   h = max(1, ceil(n / (3w)))
    *   PNG (doc_id%4=3): w = 12 + n%71,  h = max(1, ceil(n / (3w)));
    *                     content rides zlib STORED blocks, so the blob is
    *                     68 + n + 5·⌊(n−1)/65535⌋ bytes
    * This is the ingestion-side twin of [[decodeMedia]]: synthetic
    * content, genuine containers, genuine parse (PNG decode verifies
    * chunk CRCs and inflates the IDAT stream).
    */
  def encodeCorpus(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Encode/decode is CPU-bound (CRC32 + zlib + MD5 per row), not
    // IO-bound: a small parquet scan yields 1-2 partitions and would
    // serialize the whole codec stage on one core. Rebalance up to the
    // cluster's parallelism when the scan under-partitions. The signal is
    // the SCAN's file count (`inputFiles` — a listing, no plan build or
    // execution; the former `.rdd.getNumPartitions` probe constructed a
    // whole separate physical plan per call, and under AQE its
    // pre-execution answer need not match the executed plan). Non-file
    // inputs report 0 files and rebalance too — correct for the small
    // in-memory frames that shape takes.
    val par = spark.sparkContext.defaultParallelism
    val projected = docs.select(col("doc_id").cast("long"), col("text"))
    val balanced =
      if (docs.inputFiles.length < par) projected.repartition(par)
      else projected
    balanced
      .as[(Long, String)]
      .map { case (id, text) =>
        val data = Option(text).getOrElse("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val n = data.length
        (id % 4) match {
          case 0 =>
            val w = 16 + n % 97
            val h = math.max(1, (n + 3 * w - 1) / (3 * w))
            MediaRecord(id, MediaCodec.encodeBmp(w, h, data), "image/bmp")
          case 1 =>
            val ch = 1 + n % 2
            MediaRecord(id,
              MediaCodec.encodeWav(ch, 8000 + (n % 5) * 1000, 16, data),
              "audio/wav")
          case 2 =>
            val w = 8 + n % 61
            val h = math.max(1, (n + 3 * w - 1) / (3 * w))
            MediaRecord(id, MediaCodec.encodePpm(w, h, data), "image/ppm")
          case _ =>
            val w = 12 + n % 71
            val h = math.max(1, (n + 3 * w - 1) / (3 * w))
            MediaRecord(id, MediaCodec.encodePng(w, h, data), "image/png")
        }
      }
  }

  /** [[encodeCorpus]] widened with a JPEG stratum (id % 5 == 4 wraps in
    * a [[MediaCodec.encodeJpegShell]] container): the corpus real
    * crawled data looks like — geometry parseable for every image, but
    * one stratum whose scan-less shell fails the attempted baseline
    * entropy decode (a stand-in for the progressive/corrupt tail of a
    * crawl). Feeds the decode-coverage surface; the original four-way
    * corpus keeps its own queries (and their hashes) unchanged.
    */
  def encodeCorpusWithJpeg(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val projected = docs.select(col("doc_id").cast("long"), col("text"))
    val balanced =
      if (docs.inputFiles.length < par) projected.repartition(par)
      else projected
    balanced
      .as[(Long, String)]
      .map { case (id, text) =>
        val data = Option(text).getOrElse("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val n = data.length
        (id % 5) match {
          case 0 =>
            val w = 16 + n % 97
            val h = math.max(1, (n + 3 * w - 1) / (3 * w))
            MediaRecord(id, MediaCodec.encodeBmp(w, h, data), "image/bmp")
          case 1 =>
            val ch = 1 + n % 2
            MediaRecord(id,
              MediaCodec.encodeWav(ch, 8000 + (n % 5) * 1000, 16, data),
              "audio/wav")
          case 2 =>
            val w = 8 + n % 61
            val h = math.max(1, (n + 3 * w - 1) / (3 * w))
            MediaRecord(id, MediaCodec.encodePpm(w, h, data), "image/ppm")
          case 3 =>
            val w = 12 + n % 71
            val h = math.max(1, (n + 3 * w - 1) / (3 * w))
            MediaRecord(id, MediaCodec.encodePng(w, h, data), "image/png")
          case _ =>
            val w = 10 + n % 83
            val h = math.max(1, (n + 3 * w - 1) / (3 * w))
            // four sub-variants of the real-crawl JPEG tail, cycled
            // deterministically within the stratum so the coverage
            // query exercises every triage bucket: a corrupt baseline
            // shell, a REAL progressive (SOF2) encode, a REAL Adobe
            // YCCK (4-component) encode — both decoded into the pixel
            // surfaces — and a scan-less CMYK shell (corrupt)
            val payload = ((id / 5) % 4) match {
              case 0 => MediaCodec.encodeJpegShell(w, h, data)
              case 1 =>
                val gw = 10 + n % 83
                val gh = math.max(1, (n + gw - 1) / gw)
                JpegProgressive.encodeGray(gw, gh,
                  java.util.Arrays.copyOf(data, gw * gh))
              case 2 =>
                val cw = 10 + n % 43
                val ch = math.max(1, (n + 3 * cw - 1) / (3 * cw))
                val rgb = new Array[Byte](cw * ch * 3)
                val k = new Array[Byte](cw * ch)
                if (n > 0) {
                  var i = 0
                  while (i < rgb.length) { rgb(i) = data(i % n); i += 1 }
                  i = 0
                  while (i < k.length) { k(i) = data(i % n); i += 1 }
                }
                JpegCodec.encodeCmyk(cw, ch, rgb, k, ycck = true)
              case _ => MediaCodec.encodeJpegShell(w, h, data,
                components = 4)
            }
            MediaRecord(id, payload, "image/jpeg")
        }
      }
  }

  /** Wrap a text corpus as genuine VIDEO containers: even doc_ids
    * become MJPEG AVIs whose frames are REAL baseline JPEGs (encoded by
    * [[JpegCodec]] from rasters derived deterministically from the text
    * bytes), odd doc_ids become MP4 shells with genuine box-level
    * metadata and an opaque mdat (the honest posture for codecs the
    * engine does not decode). Geometry is length-derived so an SQL
    * oracle recomputes every metadata field from `documents`:
    *   AVI (id%2=0): frame w = 8 + n%25, h = max(1, ceil(n/w)),
    *                 frames = 2 + n%4, fps = 6 + n%24; frame f's grey
    *                 raster is a 64-pixel avalanche-mixed marker seeded
    *                 on (hash(text), f) followed by the text bytes
    *                 rotated by f. The random-valued marker makes
    *                 frames byte-distinct within a video AND across
    *                 different texts (quantization cannot collapse 64
    *                 uncorrelated pixels), while equal-text docs
    *                 produce identical frame SETS — the planted
    *                 structure the frame-level dedup queries recover
    *   MP4 (id%2=1): w = 16 + n%101, h = 16 + n%59, timescale = 600,
    *                 duration = 100·(1 + n%50), samples = 1 + n%30
    */
  /** PDF corpus fixture: each doc's tokens paginate into 40-token
    * pages of 8-token lines; even ids flate-compress every content
    * stream, ids % 3 == 0 emit every 2nd line as a TJ array (same
    * text, different operator). Deterministic from (doc_id, text), so
    * the text oracle replays pagination in SQL without parsing a byte.
    */
  def encodePdfCorpus(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val projected = docs.select(col("doc_id").cast("long"), col("text"))
    val balanced =
      if (docs.inputFiles.length < par) projected.repartition(par)
      else projected
    balanced.as[(Long, String)].map { case (id, text) =>
      val toks = Option(text).getOrElse("").split(" ")
      val pages = toks.grouped(40)
        .map(_.grouped(8).map(_.mkString(" ")).toSeq).toSeq
      MediaRecord(id,
        PdfCodec.encodePdf(pages, compress = id % 2 == 0,
          tjEvery = if (id % 3 == 0) 2 else 0),
        "application/pdf")
    }
  }

  /** Header/structure facts per PDF — the triage row (encrypted and
    * damaged files surface here with n_pages = 0, never an exception).
    */
  def pdfDocMeta(media: Dataset[MediaRecord]): Dataset[PdfDocMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      PdfCodec.pdfMeta(r.payload) match {
        case Some(m) => PdfDocMeta(r.doc_id, m.version, m.nPages,
          m.nObjects, m.compressed, m.encrypted)
        case None => PdfDocMeta(r.doc_id, "", 0, 0,
          compressed = false, encrypted = false)
      }
    }
  }

  /** One row per extracted page; a damaged page yields text = "" (the
    * drop stays attributable), a non-PDF payload yields no rows.
    */
  def pdfPageTexts(media: Dataset[MediaRecord]): Dataset[PdfPageText] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      PdfCodec.pdfText(r.payload).toSeq.flatMap(_.zipWithIndex.map {
        case (t, i) => PdfPageText(r.doc_id, i, t, t.length)
      })
    }
  }

  /** WARC-archive corpus fixture: `perArchive` consecutive docs per
    * archive (records ordered by doc_id), each doc one HTTP 200
    * text/plain response at `https://example.com/doc/<id>`; even
    * archive ids use per-record gzip members, odd ids plain framing —
    * both transports must yield identical records.
    */
  def encodeWarcCorpus(docs: DataFrame,
                       perArchive: Int = 10): Dataset[WarcArchive] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select((col("doc_id").cast("long") / perArchive).cast("long")
        .as("archive_id"), col("doc_id").cast("long"), col("text"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .mapGroups { (aid, it) =>
        val recs = it.toSeq.sortBy(_._2).map { case (_, id, text) =>
          (s"https://example.com/doc/$id", 200, "text/plain",
            Option(text).getOrElse("")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
        WarcArchive(aid,
          WarcCodec.encodeWarc(recs, gzipPerRecord = aid % 2 == 0),
          recs.length)
      }
  }

  /** Record extraction: one row per archived record, map-side over the
    * archive payloads (bytes never shuffle; the exchange is the encode
    * side's grouping only).
    */
  def warcRecords(archives: Dataset[WarcArchive]): Dataset[WarcRecordRow] = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.flatMap { a =>
      WarcCodec.decodeWarc(a.payload).zipWithIndex.map { case (r, i) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        WarcRecordRow(a.archive_id, i, r.warcType, r.targetUri,
          r.httpStatus, r.contentType, r.body.length,
          md.digest(r.body).map("%02x".format(_)).mkString)
      }
    }
  }

  /** Record bodies as text: (archive_id, rec_idx, url, body) — the
    * hand-off row between the transport layer and the html/curation
    * stages (UTF-8 decode of the framed body bytes).
    */
  def warcBodies(archives: Dataset[WarcArchive]): DataFrame = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.flatMap { a =>
      WarcCodec.decodeWarc(a.payload).zipWithIndex.map { case (r, i) =>
        (a.archive_id, i, r.targetUri,
          new String(r.body, java.nio.charset.StandardCharsets.UTF_8))
      }
    }.toDF("archive_id", "rec_idx", "url", "body")
  }

  def encodeVideoCorpus(docs: DataFrame,
                        frameSeedOffset: Int = 0): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val projected = docs.select(col("doc_id").cast("long"), col("text"))
    val balanced =
      if (docs.inputFiles.length < par) projected.repartition(par)
      else projected
    balanced.as[(Long, String)].map { case (id, text) =>
      val data = Option(text).getOrElse("")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = data.length
      if (id % 2 == 0) {
        val w = 8 + n % 25
        val h = math.max(1, (n + w - 1) / w)
        val nf = 2 + n % 4
        // FNV-1a over the text bytes: the marker prefix below must be
        // a function of the WHOLE content, not just its length —
        // small frames (w·h ≤ 64) are all marker, and a length-only
        // marker made same-length different-text docs share frames
        var contentHash = 0x811c9dc5
        var ci = 0
        while (ci < n) {
          contentHash = (contentHash ^ (data(ci) & 0xff)) * 0x01000193
          ci += 1
        }
        // frame CONTENT is a pure function of (text, f + offset): two
        // corpora encoded with offsets differing by d overlap in
        // nf − |d| frames — the planted partial-clip structure the
        // shared-clip detector recovers
        val frames = (0 until nf).map { fi =>
          val f = fi + frameSeedOffset
          val seed = contentHash * 31 + f
          val raster = Array.tabulate(w * h) { j =>
            if (j < 64) {
              // avalanche mix of (seed, j): any text difference flips
              // the whole 64-pixel marker, so distinct texts can never
              // quantize-collapse to identical JPEG frames, and frame
              // index f keeps frames distinct WITHIN a video
              var v = seed ^ (j * 0x9E3779B9)
              v *= 0x85EBCA6B
              v ^= v >>> 13
              v.toByte
            } else if (n > 0) data((j - 64 + f) % n)
            else 0.toByte
          }
          JpegCodec.encodeGray(w, h, raster)
        }
        MediaRecord(id, MediaCodec.encodeAviMjpeg(w, h, 6 + n % 24, frames),
          "video/avi")
      } else
        MediaRecord(id, MediaCodec.encodeMp4Shell(16 + n % 101, 16 + n % 59,
          timescale = 600, duration = 100L * (1 + n % 50),
          nSamples = 1 + n % 30, data = data), "video/mp4")
    }
  }

  /** Container-level metadata scan over a video corpus: one map-side
    * pass, no shuffle — the 100 TB shape is "parse headers at scan
    * time, never touch frame bytes you don't need". For AVI the movi
    * walk also counts the actual frame chunks (`frames_walked`), so a
    * header/content mismatch (truncated tail, lying index) is a
    * queryable fact rather than a downstream surprise.
    */
  def videoMeta(media: Dataset[MediaRecord]): Dataset[VideoMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      val h = MediaCodec.decode(m.payload)
      val walked =
        if (h.media_type == "video/avi")
          MediaCodec.aviVideoFrames(m.payload).length.toLong
        else 0L
      VideoMeta(m.doc_id, h.media_type, h.width, h.height, h.n_frames,
        h.sample_rate, walked)
    }
  }

  /** Frame sampling over MJPEG AVI payloads: every `stride`-th frame
    * chunk is sliced out of the movi region and decoded as the complete
    * JPEG it is — geometry from ITS OWN SOF header, frame-bytes digest
    * for exact cross-video frame dedup. Non-AVI payloads contribute no
    * rows (MP4 frames are opaque — see [[videoMeta]]). This is the real
    * row-explosion stage [[sampleFrames]] stubs: output rows =
    * Σ ceil(n_frames/stride), each carrying a decoded frame, payloads
    * never duplicated beyond the emitted slices.
    */
  def videoFrameFeatures(media: Dataset[MediaRecord],
                         stride: Int = 1): Dataset[VideoFrameFeature] = {
    require(stride >= 1, s"stride=$stride must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val digest = MessageDigest.getInstance("MD5")
      it.flatMap { m =>
        val frames = MediaCodec.aviVideoFrames(m.payload)
        (0 until frames.length by stride).iterator.map { i =>
          val fb = frames(i)
          digest.reset()
          digest.update(fb)
          val hash = digest.digest().map(b => f"${b & 0xff}%02x").mkString
          JpegCodec.decodeGray(fb) match {
            case Some((fw, fh, _)) =>
              VideoFrameFeature(m.doc_id, i, fw, fh, decode_ok = true, hash)
            case None =>
              VideoFrameFeature(m.doc_id, i, 0, 0, decode_ok = false, hash)
          }
        }
      }
    }
  }

  /** Frame-level video near-dup: videos sharing at least `minShared`
    * DISTINCT frame digests (re-encodes, re-containerizations, and
    * clip-with-shared-footage all surface; a frame repeated within one
    * video counts once). Hash-keyed equi-join — linear in Σ per-frame
    * group², never |videos|². Frames appearing in more than
    * `maxVideosPerFrame` videos are dropped before the join: ubiquitous
    * boilerplate (black frames, intro cards) is the stop-word of frame
    * space, and one such frame would otherwise quadratically own the
    * stage — same posture as the hot-shingle gate in text dedup.
    */
  def videoNearDupPairs(frames: DataFrame, minShared: Int = 2,
                        maxVideosPerFrame: Int = 1024): DataFrame = {
    require(minShared >= 1, s"minShared=$minShared must be >= 1")
    val vf = frames.select(col("doc_id"), col("frame_hash")).distinct()
    val hot = vf.groupBy(col("frame_hash"))
      .agg(count(lit(1)).as("_nv"))
      .where(col("_nv") > maxVideosPerFrame)
      .select(col("frame_hash"))
    val cold = vf.join(hot, Seq("frame_hash"), "left_anti")
    cold.select(col("frame_hash"), col("doc_id").as("a_id"))
      .join(cold.select(col("frame_hash"), col("doc_id").as("b_id")),
        Seq("frame_hash"))
      .where(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("shared_frames"))
      .where(col("shared_frames") >= minShared)
  }

  /** Shared-CLIP detection: maximal runs of consecutive frames two
    * videos share (same digests, same order, same spacing) — the
    * sequence-aware upgrade of [[videoNearDupPairs]]. A re-upload
    * containing a clip of another video surfaces as one row per shared
    * clip with both start offsets and the run length; frame-COUNT
    * overlap alone cannot tell a clip from scattered boilerplate hits.
    *
    * Shape: hash-keyed join to matched index pairs (hot-frame gated,
    * like the pair counter), then gaps-and-islands per (a, b, index
    * offset): consecutive a-indices at a fixed a−b offset belong to one
    * island (`a_idx − row_number` is constant exactly on consecutive
    * runs). The window partitions by (pair, offset) — cardinality is
    * matched-pair-sized, never corpus-sized. Requires stride-1 frame
    * features (sampling gaps would split every run).
    */
  def videoSharedClips(frames: DataFrame, minRun: Int = 2,
                       maxVideosPerFrame: Int = 1024): DataFrame = {
    require(minRun >= 1, s"minRun=$minRun must be >= 1")
    // one index per (video, digest): a frame repeated within a video
    // keeps its first position, so islands stay well-defined
    val vf = frames.groupBy(col("doc_id"), col("frame_hash"))
      .agg(min(col("frame_idx")).as("frame_idx"))
    val hot = vf.groupBy(col("frame_hash"))
      .agg(count(lit(1)).as("_nv"))
      .where(col("_nv") > maxVideosPerFrame)
      .select(col("frame_hash"))
    val cold = vf.join(hot, Seq("frame_hash"), "left_anti")
    val matched = cold
      .select(col("frame_hash"), col("doc_id").as("a_id"),
        col("frame_idx").as("a_idx"))
      .join(cold.select(col("frame_hash"), col("doc_id").as("b_id"),
        col("frame_idx").as("b_idx")), Seq("frame_hash"))
      .where(col("a_id") < col("b_id"))
      .withColumn("_off", col("a_idx") - col("b_idx"))
    val wIsl = Window.partitionBy(col("a_id"), col("b_id"), col("_off"))
      .orderBy(col("a_idx"))
    matched
      .withColumn("_island", col("a_idx") - row_number().over(wIsl))
      .groupBy(col("a_id"), col("b_id"), col("_off"), col("_island"))
      .agg(min(col("a_idx")).as("a_start"), min(col("b_idx")).as("b_start"),
        count(lit(1)).as("run_len"))
      .where(col("run_len") >= minRun)
      .select(col("a_id"), col("b_id"), col("a_start"), col("b_start"),
        col("run_len"))
  }

  /** The raster formats whose CONTENT region is addressable as pixels
    * without an entropy codec (BMP/PPM slice in place, PNG inflates).
    * JPEG is NOT in this list yet still often pixel-decodable: the
    * engine carries a baseline-sequential greyscale decoder
    * ([[JpegCodec]]); [[rasterOf]] is the single authority on whether
    * a given payload's pixels are reachable.
    */
  val pixelDecodableTypes: Seq[String] =
    Seq("image/bmp", "image/ppm", "image/png")

  /** The addressable 3-byte/pixel raster of an image payload, or None
    * when its pixels are out of reach — the ONE predicate every
    * pixel-touching stage (aHash, downsample, coverage) shares, so
    * "which payloads are actually decoded" is a queryable fact
    * instead of a per-operator iterator filter. BMP/PPM address the
    * payload slice in place; PNG uses the already-inflated IDAT
    * stream (None when truncated/bomb-capped); JPEG runs the baseline
    * greyscale decode and expands grey to 3 bytes/pixel so the
    * downstream raster model is uniform.
    */
  private[multimodal] def rasterOf(payload: Array[Byte],
      h: DecodedHeader, pngContent: Array[Byte])
      : Option[(Array[Byte], Int, Int, Int, Int)] =
    h.media_type match {
      case "image/bmp" | "image/ppm" =>
        Some((payload, h.data_offset, h.data_len.toInt, h.width, h.height))
      case "image/png" =>
        if (pngContent == null) None
        else Some((pngContent, 0, h.data_len.toInt, h.width, h.height))
      case "image/jpeg" =>
        // greyscale AND color baseline decode; decodeRgb already emits
        // the uniform 3-byte/pixel model (grey replicated)
        JpegCodec.decodeRgb(payload).map { case (w, ht, rgb) =>
          (rgb, 0, rgb.length, w, ht)
        }
      case _ => None
    }

  /** Per-payload pixel-decodability disposition: parsed type plus an
    * explicit (pixel_decodable, skip_reason) pair, decided by the same
    * [[rasterOf]] the pixel stages run — for JPEG that means an actual
    * baseline-decode attempt, not a type allowlist. The visibility
    * contract the aHash/downsample family needs at 100 TB: a
    * mostly-JPEG crawl must show up as countable decoded rows or "N
    * rows skipped: jpeg decode failed", never as silently-missing
    * output rows.
    */
  def decodeStatus(media: Dataset[MediaRecord]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (h, pngContent) = MediaCodec.decodeWithContent(m.payload)
        val decodable = rasterOf(m.payload, h, pngContent).isDefined
        val reason: Option[String] =
          if (decodable) None
          else if (h.media_type == "image/jpeg")
            // the baseline codec DID attempt entropy decode; classify
            // what's left by its SOF frame type so triage can tell
            // "implement SOF2" (~8–10% of a real crawl is progressive)
            // from "needs the CMYK transform" from "drop the file" —
            // one undifferentiated failure bucket hides that decision
            Some(JpegCodec.sniffSof(m.payload) match {
              case Some((s, _)) if s == 0xc9 || s == 0xcb || s == 0xcd =>
                "arithmetic-coded jpeg not supported"
              case Some((s, comps)) if comps == 4 &&
                  (s == 0xc2 || s == 0xc6 || s == 0xca || s == 0xce) =>
                // 4-component decode is baseline-only
                "progressive cmyk/ycck jpeg not supported"
              case Some((_, comps)) if comps == 4 =>
                // the 4-component Adobe decode DID attempt this stream
                "corrupt cmyk/ycck jpeg stream (entropy decode failed)"
              case Some((s, _)) if s == 0xc2 || s == 0xc6 ||
                  s == 0xca || s == 0xce =>
                // the progressive decoder DID attempt this stream
                "corrupt progressive jpeg stream (entropy decode failed)"
              case Some(_) =>
                "corrupt baseline jpeg stream (entropy decode failed)"
              case None =>
                "corrupt jpeg stream (no SOF marker)"
            })
          else if (h.media_type == "image/png") Some("corrupt png stream")
          else if (h.media_type.startsWith("image/"))
            Some("unsupported image format")
          else if (h.media_type.startsWith("audio/")) Some("not an image")
          else Some("unknown container")
        (m.doc_id, h.media_type, decodable, reason)
      }
    }.toDF("doc_id", "media_type", "pixel_decodable", "skip_reason")
  }

  /** [[aHashImages]] with the skip set made explicit: one row per IMAGE
    * payload — decoded rows (incl. baseline JPEGs) carry their hash,
    * unreachable ones carry `decoded = false` and null hash columns.
    * Schema: (doc_id, media_type, ahash, n_ones, decoded).
    */
  def aHashImagesStatus(media: Dataset[MediaRecord]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val (h, pngContent) = MediaCodec.decodeWithContent(m.payload)
        if (!h.media_type.startsWith("image/")) Iterator.empty
        else rasterOf(m.payload, h, pngContent) match {
          case Some((buf, base, contentLen, w, ht)) =>
            val (bits, ones) = hashCells(buf, base, contentLen, w, ht)
            Iterator.single((m.doc_id, h.media_type,
              Option(bits), Option(ones), true))
          case None =>
            Iterator.single((m.doc_id, h.media_type,
              None: Option[String], None: Option[Long], false))
        }
      }
    }.toDF("doc_id", "media_type", "ahash", "n_ones", "decoded")
  }

  /** The 8×8 mean-threshold bit grid shared by [[aHashImages]] and
    * [[aHashImagesStatus]] — exact integer arithmetic over the sampled
    * raster bytes (cell value = sum of the up-to-3 content bytes at
    * the nearest-neighbor position; threshold compares v·64 > Σv).
    */
  private def hashCells(buf: Array[Byte], base: Int, contentLen: Int,
                        w: Int, ht: Int): (String, Long) = {
    val cells = new Array[Long](64)
    var total = 0L
    var idx = 0
    var oy = 0
    while (oy < 8) {
      val sy = (oy.toLong * ht / 8).toInt
      var ox = 0
      while (ox < 8) {
        val sx = (ox.toLong * w / 8).toInt
        val off = (sy.toLong * w + sx) * 3
        var v = 0L
        var k = 0
        while (k < 3 && off + k < contentLen) {
          v += (buf(base + (off + k).toInt) & 0xff)
          k += 1
        }
        cells(idx) = v
        total += v
        idx += 1
        ox += 1
      }
      oy += 1
    }
    val sb = new java.lang.StringBuilder(64)
    var ones = 0L
    var i = 0
    while (i < 64) {
      if (cells(i) * 64 > total) { sb.append('1'); ones += 1 }
      else sb.append('0')
      i += 1
    }
    (sb.toString, ones)
  }

  /** Whole-loop proof of the JPEG pixel path on REAL compressed data:
    * build a deterministic greyscale raster per doc (text bytes tiled
    * row-major, length-derived geometry), encode it as a genuine
    * baseline JPEG ([[JpegCodec.encodeGray]] — real DCT, quantization,
    * Huffman entropy coding), decode it back, and report geometry plus
    * whether the reconstruction stayed within `tol` grey levels. The
    * geometry and the tolerance verdict are exact integers an SQL
    * oracle replays from the text length; the lossy pixel values
    * themselves are pinned by spec (flat rasters round-trip exactly,
    * gradients within quantization error).
    *
    * Scale shape: map-side partition-iterator encode+decode, no
    * shuffle; cost is 2·64 multiplies/pixel (two DCT passes).
    */
  def jpegRoundTrip(docs: DataFrame, quality: Int = 95,
                    tol: Int = 32, color: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val projected = docs.select(col("doc_id").cast("long"), col("text"))
    val balanced =
      if (docs.inputFiles.length < par) projected.repartition(par)
      else projected
    balanced.as[(Long, String)].map { case (id, text) =>
      val data = Option(text).getOrElse("")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = data.length
      val bpp = if (color) 3 else 1
      val w = if (color) 8 + n % 41 else 8 + n % 57
      val h = math.max(1, (n + bpp * w - 1) / (bpp * w))
      val raster = new Array[Byte](w * h * bpp)
      if (n > 0) {
        var i = 0
        while (i < raster.length) { raster(i) = data(i % n); i += 1 }
      }
      val enc =
        if (color) JpegCodec.encodeColor(w, h, raster, quality)
        else JpegCodec.encodeGray(w, h, raster, quality)
      val dec =
        if (color) JpegCodec.decodeRgb(enc) else JpegCodec.decodeGray(enc)
      dec match {
        case Some((dw, dh, px)) =>
          var mx = 0
          var i = 0
          while (i < raster.length) {
            val e = math.abs((raster(i) & 0xff) - (px(i) & 0xff))
            if (e > mx) mx = e
            i += 1
          }
          (id, dw, dh, dw.toLong * dh, mx,
            dw == w && dh == h && px.length == raster.length && mx <= tol)
        case None => (id, -1, -1, -1L, -1, false)
      }
    }.toDF("doc_id", "width", "height", "n_px", "max_abs_err",
      "within_tol")
  }

  /** Progressive-vs-baseline EQUIVALENCE loop: per document, build the
    * text-derived grey and color rasters (the [[jpegRoundTrip]]
    * geometries), encode each BOTH ways (baseline SOF0 and progressive
    * SOF2 with the six-stage successive-approximation scan script),
    * decode both, and report whether the reconstructions match BIT FOR
    * BIT. Progressive transport is lossless over the quantized
    * coefficients, so exact equality is the invariant — any drift in
    * any scan path (DC/AC first, refinement, EOB runs, correction
    * bits) flips a hashed boolean. `prog_is_sof2` pins that the
    * progressive stream really is progressive, not a baseline
    * fallback. Same 100 TB shape as the other codec loops: per-payload
    * partition-iterator work, no shuffle.
    */
  def jpegProgressiveEquivalence(docs: DataFrame,
                                 quality: Int = 95): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val projected = docs.select(col("doc_id").cast("long"), col("text"))
    val balanced =
      if (docs.inputFiles.length < par) projected.repartition(par)
      else projected
    balanced.as[(Long, String)].map { case (id, text) =>
      val data = Option(text).getOrElse("")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = data.length
      def cyclic(len: Int): Array[Byte] = {
        val a = new Array[Byte](len)
        if (n > 0) {
          var i = 0
          while (i < len) { a(i) = data(i % n); i += 1 }
        }
        a
      }
      val gw = 8 + n % 57
      val gh = math.max(1, (n + gw - 1) / gw)
      val gray = cyclic(gw * gh)
      val gProg = JpegProgressive.encodeGray(gw, gh, gray, quality)
      val gBase = JpegCodec.encodeGray(gw, gh, gray, quality)
      val greyExact =
        (JpegCodec.decodeGray(gProg), JpegCodec.decodeGray(gBase)) match {
          case (Some((w1, h1, p1)), Some((w2, h2, p2))) =>
            w1 == w2 && h1 == h2 && p1.sameElements(p2)
          case _ => false
        }
      val progSof2 = JpegCodec.sniffSof(gProg).exists(_._1 == 0xc2)
      val cw = 8 + n % 41
      val ch = math.max(1, (n + 3 * cw - 1) / (3 * cw))
      val rgb = cyclic(cw * ch * 3)
      val cProg = JpegProgressive.encodeColor(cw, ch, rgb, quality)
      val cBase = JpegCodec.encodeColor(cw, ch, rgb, quality)
      val colorExact =
        (JpegCodec.decodeRgb(cProg), JpegCodec.decodeRgb(cBase)) match {
          case (Some((w1, h1, p1)), Some((w2, h2, p2))) =>
            w1 == w2 && h1 == h2 && p1.sameElements(p2)
          case _ => false
        }
      (id, gw, gh, gw.toLong * gh, progSof2, greyExact, colorExact)
    }.toDF("doc_id", "width", "height", "n_px", "prog_is_sof2",
      "grey_exact", "color_exact")
  }

  /** PIXEL-LEVEL nearest-neighbor downsample over parsed image rasters —
    * the stage that processes media content, not just headers. For each
    * image payload: parse the container ([[MediaCodec.decodeWithContent]]
    * — BMP/PPM slice in place, PNG inflates its IDAT stream once), map
    * the decoded geometry through the aspect-preserving `box` fit (same
    * arithmetic as [[resizeFit]]), then sample the source raster at
    * nearest-neighbor positions: output pixel (ox, oy) reads the 3 bytes
    * at ((⌊oy·h/oh⌋·w + ⌊ox·w/ow⌋)·3) into the content region. Bytes past
    * `data_len` (a final partial row) are skipped, so the sampled raster
    * is exact on truncated content. Non-image rows (audio, unknown) drop.
    *
    * Raster model: rows tightly packed at 3 bytes/pixel, top-down —
    * exactly what [[encodeCorpus]]'s containers carry. Genuine BMPs pad
    * rows to 4-byte boundaries bottom-up and real PNG scanlines carry a
    * leading filter byte; those transforms belong in the codec layer and
    * are out of scope here for the same reason JPEG entropy decode is
    * (no media libs in this environment — the sampling arithmetic, the
    * Spark shape, and the byte addressing are the real thing).
    *
    * 100 TB shape: map-side only — decode, sample, and digest run inside
    * one partition iterator; the output carries ≤ 3·box² bytes per row
    * summarized to integers + md5, never the source payload. No shuffle,
    * no skew surface; cost is linear in rows with a hard per-row bound.
    */
  def downsampleImages(media: Dataset[MediaRecord], box: Int): Dataset[DownsampledImage] = {
    require(box >= 1, s"box=$box must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val digest = MessageDigest.getInstance("MD5")
      it.flatMap { m =>
        val (h, pngContent) = MediaCodec.decodeWithContent(m.payload)
        // Address content in place through the shared rasterOf: PNG's
        // region is the inflated buffer from offset 0, BMP/PPM's is
        // the payload slice at data_offset (no copy), baseline JPEG
        // decodes to a grey-expanded raster. Unreachable pixels
        // (non-image, corrupt PNG, unsupported JPEG variant) drop —
        // decodeStatus is the queryable account of that skip set.
        rasterOf(m.payload, h, pngContent) match {
        case None => Iterator.empty
        case Some((buf, base, contentLen, w, ht)) =>
          val longSide = math.max(w, ht)
          val ow = math.max(1, w * box / longSide)
          val oh = math.max(1, ht * box / longSide)
          val out = new Array[Byte](ow * oh * 3)
          var outLen = 0
          var sum = 0L
          var oy = 0
          while (oy < oh) {
            val sy = (oy.toLong * ht / oh).toInt
            var ox = 0
            while (ox < ow) {
              val sx = (ox.toLong * w / ow).toInt
              val off = (sy.toLong * w + sx) * 3
              var k = 0
              while (k < 3 && off + k < contentLen) {
                val b = buf(base + (off + k).toInt)
                out(outLen) = b
                sum += (b & 0xff)
                outLen += 1
                k += 1
              }
              ox += 1
            }
            oy += 1
          }
          digest.reset()
          digest.update(out, 0, outLen)
          val hash = digest.digest().map(b => f"${b & 0xff}%02x").mkString
          Iterator.single(DownsampledImage(m.doc_id, h.media_type, w, ht,
            ow, oh, outLen.toLong, sum, hash))
        }
      }
    }
  }

  /** Partition-wise decode: parse each payload's actual header bytes
    * ([[MediaCodec.decode]] — magic sniff, little-endian fields, RIFF
    * chunk walk, PPM ASCII scan) and digest the content region. One
    * digest instance per partition; decode is total (corrupt blobs
    * yield `unknown` rows) — both non-negotiable at 100 TB scan scale.
    */
  def decodeMedia(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val digest = MessageDigest.getInstance("MD5")
      it.map { m =>
        // decodeWithContent: PNG payloads inflate ONCE (the header's
        // data_len and the digested content share the same inflate).
        val (h, content) = MediaCodec.decodeWithContent(m.payload)
        digest.reset()
        if (h.media_type == "image/png") digest.update(content)
        else digest.update(m.payload, h.data_offset, h.data_len.toInt)
        val hash = digest.digest().map(b => f"${b & 0xff}%02x").mkString
        MediaMeta(m.doc_id, h.media_type, m.payload.length.toLong,
          h.width, h.height, h.n_frames, h.channels, h.sample_rate,
          h.data_offset, h.data_len, hash)
      }
    }
  }

  /** Perceptual average-hash (aHash): nearest-neighbor sample each
    * image's raster to a fixed 8×8 grid (cell value = sum of the up-to-3
    * content bytes at the sampled pixel), threshold every cell at the
    * grid mean, emit the 64 bits as a '0'/'1' string in row-major
    * order — the image-dedup signature that survives re-encoding and
    * mild resizing, bringing the SimHash discipline to pixels. All
    * arithmetic is EXACT integers (the threshold compares v·64 > Σv, no
    * division), so the oracle replays every sampled byte; hamming
    * distance between hashes is the near-dup measure, exact-match
    * grouping the fast path. Map-side, stateless, one pass.
    */
  def aHashImages(media: Dataset[MediaRecord]): Dataset[ImageAHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val (h, pngContent) = MediaCodec.decodeWithContent(m.payload)
        // reachable rasters only (incl. baseline JPEG via the full
        // decode) — hashing a compressed entropy stream would emit a
        // deterministic-but-meaningless signature; aHashImagesStatus
        // reports unreachable rows as skipped instead
        rasterOf(m.payload, h, pngContent) match {
          case None => Iterator.empty
          case Some((buf, base, contentLen, w, ht)) =>
            val (bits, ones) = hashCells(buf, base, contentLen, w, ht)
            Iterator.single(ImageAHash(m.doc_id, h.media_type, bits, ones))
        }
      }
    }
  }

  /** Audio energy-envelope fingerprint — [[aHashImages]]' discipline on
    * the time axis: partition each audio payload's content bytes into
    * `frames` equal spans (byte p lands in frame ⌊p·F/n⌋), sum the
    * byte values per frame, threshold each frame's energy at the
    * stream mean (exact-integer e·F > Σe) and emit the F bits plus the
    * total energy. Loudness-profile matching for audio dedup; exact
    * arithmetic keeps it oracle-replayable per byte.
    */
  def audioEnvelope(media: Dataset[MediaRecord],
                    frames: Int = 16): Dataset[AudioEnvelope] = {
    require(frames >= 1 && frames <= 256, s"frames=$frames out of 1..256")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val h = MediaCodec.decode(m.payload)
        if (!h.media_type.startsWith("audio/")) Iterator.empty
        else {
          val n = h.data_len.toInt
          val e = new Array[Long](frames)
          var total = 0L
          var p = 0
          while (p < n) {
            val v = (m.payload(h.data_offset + p) & 0xff).toLong
            e((p.toLong * frames / n).toInt) += v
            total += v
            p += 1
          }
          val sb = new java.lang.StringBuilder(frames)
          var ones = 0L
          var f = 0
          while (f < frames) {
            if (e(f) * frames > total) { sb.append('1'); ones += 1 }
            else sb.append('0')
            f += 1
          }
          Iterator.single(AudioEnvelope(m.doc_id, h.media_type,
            sb.toString, ones, total))
        }
      }
    }
  }

  /** Spectral audio sub-fingerprints — the Haitsma–Kalker (ISMIR 2002)
    * bit derivation over an integer-exact transform: decode the WAV PCM
    * stream (channel 0; 16-bit little-endian signed or 8-bit offset
    * samples), cut it into non-overlapping `frameLen`-sample frames,
    * Walsh–Hadamard-transform each frame (the integer-exact stand-in
    * for the FFT filter bank — same energy-compaction role, zero
    * floating point, so every bit is DuckDB-oracle-replayable), sum
    * squared coefficients into `bands` equal bands, and emit per frame
    * t ≥ 1 the (bands−1)-bit sign string
    * `bit(b) = [ (E_t(b)−E_t(b+1)) − (E_{t−1}(b)−E_{t−1}(b+1)) > 0 ]`
    * — the energy-difference-of-differences that makes the print
    * invariant to volume scaling and robust to re-encoding, the
    * property the loudness-only [[audioEnvelope]] lacks. Frame 0 has
    * no predecessor and emits nothing; a payload shorter than two
    * complete frames drops.
    *
    * Map-side per payload, no shuffle; overflow-safe by construction
    * (|coeff| ≤ frameLen·2¹⁵ so Σ coeff² ≤ frameLen³·2³⁰ ≪ 2⁶³ for any
    * frameLen ≤ 256).
    */
  def audioSpectralPrints(media: Dataset[MediaRecord],
                          frameLen: Int = 16,
                          bands: Int = 8): Dataset[AudioSpectralPrint] = {
    require(frameLen >= 2 && (frameLen & (frameLen - 1)) == 0 &&
      frameLen <= 256, s"frameLen=$frameLen must be a power of two in 2..256")
    require(bands >= 2 && frameLen % bands == 0,
      s"bands=$bands must be >= 2 and divide frameLen=$frameLen")
    val spark = media.sparkSession
    import spark.implicits._
    val width = frameLen / bands
    media.mapPartitions { it =>
      it.flatMap { m =>
        val h = MediaCodec.decode(m.payload)
        if (h.media_type != "audio/wav" || h.n_frames <= 0) Iterator.empty
        else {
          val blockAlign = (h.data_len / h.n_frames).toInt
          val bytesPerSample = blockAlign / math.max(h.channels, 1)
          if (bytesPerSample != 1 && bytesPerSample != 2) Iterator.empty
          else {
            val nSamples = h.n_frames.toInt
            val nFrames = nSamples / frameLen
            if (nFrames < 2) Iterator.empty
            else {
              val prevE = new Array[Long](bands)
              val curE = new Array[Long](bands)
              val a = new Array[Long](frameLen)
              (0 until nFrames).iterator.flatMap { t =>
                var j = 0
                while (j < frameLen) {
                  val p = h.data_offset + (t * frameLen + j) * blockAlign
                  a(j) =
                    if (bytesPerSample == 2)
                      ((m.payload(p) & 0xff) |
                        (m.payload(p + 1) << 8)).toShort.toLong
                    else (m.payload(p) & 0xff).toLong - 128L
                  j += 1
                }
                // in-place fast Walsh–Hadamard: natural (Hadamard)
                // order, W[k] = Σ_j (−1)^popcount(k&j) · x[j]
                var half = 1
                while (half < frameLen) {
                  var i = 0
                  while (i < frameLen) {
                    var q = i
                    while (q < i + half) {
                      val x = a(q); val y = a(q + half)
                      a(q) = x + y; a(q + half) = x - y
                      q += 1
                    }
                    i += 2 * half
                  }
                  half *= 2
                }
                var total = 0L
                var b = 0
                while (b < bands) {
                  var e = 0L
                  var k = b * width
                  while (k < (b + 1) * width) { e += a(k) * a(k); k += 1 }
                  curE(b) = e
                  total += e
                  b += 1
                }
                val out =
                  if (t == 0) Iterator.empty
                  else {
                    val sb = new java.lang.StringBuilder(bands - 1)
                    var bb = 0
                    while (bb < bands - 1) {
                      val d = (curE(bb) - curE(bb + 1)) -
                        (prevE(bb) - prevE(bb + 1))
                      sb.append(if (d > 0) '1' else '0')
                      bb += 1
                    }
                    Iterator.single(AudioSpectralPrint(
                      m.doc_id, t, sb.toString, total))
                  }
                System.arraycopy(curE, 0, prevE, 0, bands)
                out
              }
            }
          }
        }
      }
    }
  }

  /** Audio near-dup over [[audioSpectralPrints]] output: documents
    * sharing at least `minShared` DISTINCT `shingle`-frame print runs —
    * matching on a RUN of consecutive sub-fingerprints (concatenated
    * print strings at consecutive frame indices) rather than one frame's
    * handful of bits, because a (bands−1)-bit single print has only
    * 2^(bands−1) values and would collide corpus-wide. The shingled key
    * also time-aligns for free: a re-encode or a shifted re-upload
    * matches wherever any `shingle` consecutive frames coincide. Same
    * scale posture as [[videoNearDupPairs]]: key-equality join, never
    * all-pairs; shingles appearing in more than `maxDocsPerShingle`
    * documents (the silence/boilerplate stop-words of print space) are
    * dropped before the join so no hot key owns the stage
    * quadratically. Requires DENSE per-doc frame indices (the
    * [[audioSpectralPrints]] emission): shingles are built from
    * row-adjacent prints, so a sampled/filtered input would silently
    * shingle across gaps — the videoSharedClips stride-1 rule.
    */
  def audioNearDupPairs(prints: DataFrame, shingle: Int = 4,
                        minShared: Int = 2,
                        maxDocsPerShingle: Int = 1024): DataFrame = {
    require(shingle >= 1, s"shingle=$shingle must be >= 1")
    require(minShared >= 1, s"minShared=$minShared must be >= 1")
    val wNext = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val shingled = prints
      .withColumn("_sh", concat_ws("",
        (0 until shingle).map(i => lead(col("print"), i).over(wNext)): _*))
      // a complete shingle concatenates exactly `shingle` prints; the
      // per-doc tail windows are shorter (lead -> null drops from
      // concat_ws) and are cut by length
      .where(length(col("_sh")) === lit(shingle) * length(col("print")))
      .select(col("doc_id"), col("_sh"))
      .distinct()
    val hot = shingled.groupBy(col("_sh"))
      .agg(count(lit(1)).as("_nd"))
      .where(col("_nd") > maxDocsPerShingle)
      .select(col("_sh"))
    val cold = shingled.join(hot, Seq("_sh"), "left_anti")
    cold.select(col("_sh"), col("doc_id").as("a_id"))
      .join(cold.select(col("_sh"), col("doc_id").as("b_id")), Seq("_sh"))
      .where(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("shared_shingles"))
      .where(col("shared_shingles") >= minShared)
  }

  /** Near-duplicate image pairs over [[aHashImages]] output — the Manku
    * multi-block index on the 64-bit perceptual hash: split each hash
    * into `blocks` equal substrings; any pair within hamming distance
    * `maxHamming` < `blocks` shares at least one block verbatim
    * (pigeonhole ⇒ EXACT recall), so candidates come from equality
    * joins on (block, substring) — never all-pairs — and only
    * candidates pay the 64-char hamming count. The same structure as
    * the text simhash `_blocked` path, applied to pixels.
    */
  def aHashNearPairs(hashed: DataFrame, maxHamming: Int = 3,
                     blocks: Int = 4): DataFrame =
    hammingNearPairs(hashed, "doc_id", "ahash", bits = 64,
      maxHamming = maxHamming, blocks = blocks)

  /** Hamming-banded near-pair operator over ANY fixed-width bit-string
    * signature column — the Manku multi-block index shared by the
    * image aHash (64 bits) and audio envelope (16 bits) paths: split
    * each signature into `blocks` equal substrings; any pair within
    * hamming distance `maxHamming` < `blocks` shares at least one
    * block verbatim (pigeonhole ⇒ EXACT recall), so candidates come
    * from equality joins on (block, substring) — never all-pairs —
    * and only candidates pay the `bits`-char hamming count.
    */
  def hammingNearPairs(sigs: DataFrame, idCol: String, sigCol: String,
                       bits: Int, maxHamming: Int,
                       blocks: Int): DataFrame = {
    require(idCol.matches("[A-Za-z_][A-Za-z0-9_]*") &&
      sigCol.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"plain identifiers required, got $idCol/$sigCol")
    require(blocks >= 1 && bits % blocks == 0,
      s"blocks=$blocks must divide bits=$bits")
    require(maxHamming >= 0 && maxHamming < blocks,
      s"maxHamming=$maxHamming needs > hamming blocks for exact recall")
    val width = bits / blocks
    val blk = sigs.select(col(idCol).as("_id"), col(sigCol).as("_sig0"),
        explode(expr(s"transform(sequence(0, ${blocks - 1}), " +
          s"b -> struct(b AS b, substring($sigCol, b * $width + 1, $width)" +
          " AS sig))")).as("_b"))
      .select(col("_id"), col("_sig0"),
        col("_b.b").as("b"), col("_b.sig").as("sig"))
    blk.as("x").join(blk.as("y"),
        col("x.b") === col("y.b") && col("x.sig") === col("y.sig") &&
          col("x._id") < col("y._id"))
      .select(col("x._id").as("id_a"), col("y._id").as("id_b"),
        col("x._sig0").as("_ha"), col("y._sig0").as("_hb"))
      .distinct()
      .withColumn("hamming", expr(
        "size(filter(zip_with(split(_ha, ''), split(_hb, ''), " +
          "(p, q) -> p <> q), v -> v))").cast("long"))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
