package graft.packs

import graft.QueryPack
import graft.core.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): binary payloads
  * through a partition-iterator decode stage running REAL header parsers
  * (BMP / RIFF-WAV / binary-PPM, [[graft.multimodal.MediaCodec]]). The
  * corpus is wrapped in genuine containers with length-derived geometry,
  * so the oracle recomputes what the parser must extract from the actual
  * bytes — the whole path (binary encode → Dataset[MediaRecord] →
  * mapPartitions parse → metadata) is hash-verified.
  */
object MultimodalQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // Real decode: parse each container's header bytes, digest the
    // content region. media_type is what the PARSER detected.
    "multimodal_decode_meta" -> ((s, dir) => {
      val media = Multimodal.encodeCorpus(Tables(s, dir).documents)
      Multimodal.decodeMedia(media).toDF()
        .orderBy(col("doc_id"))
    }),

    // Frame sampling: every 2nd frame of each payload, frame bytes
    // sliced from the binary column, per-frame content hash. The frame
    // count is a sampling PARAMETER (1 + n%8), not a decode — this query
    // pins the generator/slice/hash plumbing on opaque blobs.
    "multimodal_frame_sample" -> ((s, dir) => {
      val media = Multimodal.toMedia(Tables(s, dir).documents)
      val withFrames = media.toDF()
        .withColumn("n_frames",
          (lit(1) + length(col("payload")) % 8).cast("long"))
      Multimodal.sampleFrames(withFrames, "n_frames", stride = 2)
        .select(col("doc_id"), col("frame_idx"), col("frame_len"),
          col("frame_hash"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // VIDEO metadata scan: genuine MJPEG-AVI / MP4 containers, every
    // field read back from the container bytes (RIFF header walk, ISO
    // BMFF box walk); frames_walked cross-checks the AVI movi region
    // against the declared frame count.
    "multimodal_video_meta" -> ((s, dir) => {
      val media = Multimodal.encodeVideoCorpus(
        Tables(s, dir).documents.where(col("doc_id") < 400))
      Multimodal.videoMeta(media).toDF()
        .orderBy(col("doc_id"))
    }),

    // WARC transport round trip: 10-doc archives (even archive ids
    // gzip-member-per-record, odd plain), records re-extracted with
    // framing, HTTP status/headers, and body digests — the
    // CommonCrawl-shaped ingest container in front of the html/text
    // stages. Oracle replays every field from the documents table.
    "multimodal_warc_records" -> ((s, dir) => {
      Multimodal.warcRecords(
          Multimodal.encodeWarcCorpus(Tables(s, dir).documents)).toDF()
        .orderBy(col("archive_id"), col("rec_idx"))
    }),

    // PDF structure triage: version/pages/objects/filters parsed from
    // real xref'd documents (even ids FlateDecode-compressed).
    "multimodal_pdf_meta" -> ((s, dir) => {
      Multimodal.pdfDocMeta(
          Multimodal.encodePdfCorpus(Tables(s, dir).documents)).toDF()
        .orderBy(col("doc_id"))
    }),

    // PDF text extraction end to end: object scan -> page tree walk ->
    // content-stream inflate -> Tj/'/TJ show strings. The oracle
    // replays the fixture's pagination (40-token pages, 8-token lines)
    // straight from the documents table — decode(encode(text)) == text
    // per page, across compressed/uncompressed and Tj/TJ strata.
    "multimodal_pdf_text" -> ((s, dir) => {
      Multimodal.pdfPageTexts(
          Multimodal.encodePdfCorpus(Tables(s, dir).documents)).toDF()
        .orderBy(col("doc_id"), col("page"))
    }),

    // VIDEO frame sampling: every 2nd MJPEG frame sliced from the movi
    // region and decoded as the complete JPEG it is — geometry from
    // each frame's own SOF header, literal decode_ok.
    "multimodal_video_frames" -> ((s, dir) => {
      val media = Multimodal.encodeVideoCorpus(
        Tables(s, dir).documents.where(col("doc_id") < 400))
      Multimodal.videoFrameFeatures(media, stride = 2).toDF()
        .select(col("doc_id"), col("frame_idx"), col("width"),
          col("height"), col("decode_ok"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // Frame-level video near-dup over frame digests: the corpus plus a
    // re-ingested copy (doc_id + 100000, same text ⇒ byte-identical
    // frame sets). Recovered pairs = every equal-text pair across the
    // widened corpus — planted twins AND any natural text duplicates —
    // each sharing all 2 + n%4 of its frames.
    "multimodal_video_neardup" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
        .where(col("doc_id") < 200 && col("doc_id") % 2 === 0)
      val again = docs.withColumn("doc_id", col("doc_id") + 100000)
      val media = Multimodal.encodeVideoCorpus(docs.unionByName(again))
      val frames = Multimodal.videoFrameFeatures(media, stride = 1).toDF()
      Multimodal.videoNearDupPairs(frames, minShared = 2)
        .orderBy(col("a_id"), col("b_id"))
    }),

    // Shared-CLIP detection: the corpus plus a copy whose frame seeds
    // shift by one (a re-upload starting one frame in) — every
    // equal-text pair shares a contiguous nf−|Δoffset| run, recovered
    // with both start offsets by the gaps-and-islands pass.
    "multimodal_video_clips" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
        .where(col("doc_id") < 200 && col("doc_id") % 2 === 0)
      val orig = Multimodal.encodeVideoCorpus(docs)
      val shifted = Multimodal.encodeVideoCorpus(
        docs.withColumn("doc_id", col("doc_id") + 100000),
        frameSeedOffset = 1)
      val frames = Multimodal.videoFrameFeatures(
        orig.union(shifted), stride = 1).toDF()
      Multimodal.videoSharedClips(frames, minRun = 2)
        .orderBy(col("a_id"), col("b_id"), col("a_start"))
    }),

    // Aspect-preserving resize geometry for a 224-box over the PARSED
    // image dimensions (audio rows have no geometry and are excluded).
    "multimodal_resize_fit" -> ((s, dir) => {
      val media = Multimodal.encodeCorpus(Tables(s, dir).documents)
      val meta = Multimodal.decodeMedia(media).toDF()
        .where(col("media_type").startsWith("image/"))
      Multimodal.resizeFit(meta, box = 224)
        .select(col("doc_id"), col("media_type"), col("width"),
          col("height"), col("out_w"), col("out_h"))
        .orderBy(col("doc_id"))
    }),

    // Audio metadata math over PARSED WAV headers: duration from the
    // sample-frame count and sample rate the RIFF fmt chunk declares.
    "multimodal_audio_duration" -> ((s, dir) => {
      val meta = Multimodal.decodeMedia(
        Multimodal.encodeCorpus(Tables(s, dir).documents)).toDF()
      meta.where(col("media_type") === "audio/wav")
        .select(col("doc_id"), col("channels"), col("sample_rate"),
          col("n_frames"),
          (round(col("n_frames") * lit(1000.0) / col("sample_rate"), 3)
            + lit(0.0)).as("duration_ms"))
        .orderBy(col("doc_id"))
    }),

    // PIXEL-LEVEL downsample: parse each image container, nearest-
    // neighbor-sample its raster into a 24-box target, summarize the
    // sampled bytes exactly (count / value-sum / md5). The oracle
    // recomputes every sampled byte from the source text (ascii corpus:
    // content region == text bytes), so the sampling arithmetic — not
    // just the geometry — is hash-pinned.
    "multimodal_downsample" -> ((s, dir) => {
      val media = Multimodal.encodeCorpus(Tables(s, dir).documents)
      Multimodal.downsampleImages(media, box = 24).toDF()
        .orderBy(col("doc_id"))
    }),

    // Perceptual average-hash over every image (decode → 8×8 grid →
    // mean-threshold bits) with exact-hash dup-mate counts — image
    // dedup through the multimodal decode path; the oracle recomputes
    // all 64 sampled cells byte for byte.
    "multimodal_image_ahash" -> ((s, dir) => {
      val media = Multimodal.encodeCorpus(Tables(s, dir).documents)
      val hashed = Multimodal.aHashImages(media).toDF()
      hashed
        .withColumn("n_mates",
          (count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("ahash"))) - 1).cast("long"))
        .orderBy(col("doc_id"))
    }),

    // Near-dup image PAIRS through the Manku 4-block index on the
    // perceptual hash: hamming ≤ 3 ⇒ one of four 16-bit blocks matches
    // verbatim (pigeonhole, exact recall) — equality-join candidates,
    // hamming paid only by candidates.
    "multimodal_ahash_pairs" -> ((s, dir) => {
      val media = Multimodal.encodeCorpus(Tables(s, dir).documents)
      Multimodal.aHashNearPairs(
          Multimodal.aHashImages(media).toDF(), maxHamming = 3, blocks = 4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Audio energy-envelope fingerprint (the aHash discipline on the
    // time axis): 16 frame-energy bits per wav + total energy +
    // exact-envelope dup mates; the oracle re-sums every content byte.
    "multimodal_audio_envelope" -> ((s, dir) => {
      val media = Multimodal.encodeCorpus(Tables(s, dir).documents)
      Multimodal.audioEnvelope(media, frames = 16).toDF()
        .withColumn("n_mates",
          (count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("envelope"))) - 1).cast("long"))
        .orderBy(col("doc_id"))
    }),

    // Near-dup AUDIO pairs through the same hamming-banded operator as
    // the image path (generalized over signature column/width): the
    // 16-bit energy envelope splits into four 4-bit blocks; hamming ≤ 2
    // < 4 blocks ⇒ one block matches verbatim (pigeonhole, exact
    // recall) — loudness-profile near-dup matching without all-pairs.
    "multimodal_audio_near_pairs" -> ((s, dir) => {
      val media = Multimodal.encodeCorpus(Tables(s, dir).documents)
      Multimodal.hammingNearPairs(
          Multimodal.audioEnvelope(media, frames = 16).toDF(),
          "doc_id", "envelope", bits = 16, maxHamming = 2, blocks = 4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Spectral audio sub-fingerprints: Haitsma–Kalker sign bits over an
    // integer-exact Walsh–Hadamard filter bank (16-sample frames, 8
    // bands) — every bit re-derivable from the content bytes, so the
    // oracle replays byte → 16-bit LE sample → WHT coefficient → band
    // energy → difference-of-differences sign, exactly.
    "multimodal_audio_spectral" -> ((s, dir) => {
      val media = Multimodal.encodeCorpus(Tables(s, dir).documents)
      Multimodal.audioSpectralPrints(media, frameLen = 16, bands = 8).toDF()
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // Audio near-dup over shingled spectral prints: the corpus plus a
    // re-ingested copy (doc_id + 100000, same text ⇒ byte-identical
    // WAVs ⇒ identical print streams). Every twin with ≥5 prints shares
    // all its 4-frame shingles; pairs surface via the shingle-keyed
    // join, never all-pairs.
    "multimodal_audio_spectral_pairs" -> ((s, dir) => {
      val docs = Tables(s, dir).documents.where(col("doc_id") < 400)
      val again = docs.withColumn("doc_id", col("doc_id") + 100000)
      val media = Multimodal.encodeCorpus(docs.unionByName(again))
      val prints = Multimodal.audioSpectralPrints(media).toDF()
      Multimodal.audioNearDupPairs(prints, shingle = 4, minShared = 2)
        .orderBy(col("a_id"), col("b_id"))
    }),

    // Pixel-decode COVERAGE over the JPEG-inclusive corpus: per parsed
    // media type, how many payloads the engine can address as pixels
    // and the explicit reason for the rest — the visibility contract a
    // mostly-JPEG crawl needs (decode gaps must be queryable counts,
    // never silently-missing rows).
    "multimodal_decode_coverage" -> ((s, dir) => {
      val media = Multimodal.encodeCorpusWithJpeg(Tables(s, dir).documents)
      Multimodal.decodeStatus(media)
        .groupBy(col("media_type"), col("pixel_decodable"),
          col("skip_reason"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("media_type"), col("skip_reason"))
    }),

    // The aHash path's skip set made explicit: every IMAGE row gets a
    // disposition — raster formats decoded (hash pinned by
    // multimodal_image_ahash), JPEG visibly excluded with
    // decoded=false, never silently dropped.
    "multimodal_ahash_status" -> ((s, dir) => {
      val media = Multimodal.encodeCorpusWithJpeg(Tables(s, dir).documents)
      Multimodal.aHashImagesStatus(media)
        .select(col("doc_id"), col("media_type"), col("decoded"))
        .orderBy(col("doc_id"))
    }),

    // REAL JPEG pixels through the full loop: text-derived greyscale
    // rasters → genuine baseline encode (DCT + quantization + Huffman)
    // → decode → geometry + tolerance verdict. The oracle replays the
    // length-derived geometry and demands within_tol literally true —
    // any decoder regression (wrong size, drifting reconstruction,
    // decode failure) flips a hashed column. Pixel values are pinned
    // by spec (flat exact, gradient within quantization error).
    "multimodal_jpeg_roundtrip" -> ((s, dir) => {
      Multimodal.jpegRoundTrip(
          Tables(s, dir).documents.where(col("doc_id") < 500))
        .select(col("doc_id"), col("width"), col("height"), col("n_px"),
          col("within_tol"))
        .orderBy(col("doc_id"))
    }),

    // The COLOR loop: text bytes as interleaved RGB, 4:4:4 YCbCr
    // encode (real color matrices + chrominance quantization) ->
    // decode -> geometry + tolerance verdict, same oracle discipline
    // as the greyscale twin. Chroma tolerance is wider: byte-noise
    // chrominance pays the coarse chroma table.
    "multimodal_jpeg_color_roundtrip" -> ((s, dir) => {
      Multimodal.jpegRoundTrip(
          Tables(s, dir).documents.where(col("doc_id") < 500),
          quality = 95, tol = 64, color = true)
        .select(col("doc_id"), col("width"), col("height"), col("n_px"),
          col("within_tol"))
        .orderBy(col("doc_id"))
    }),

    // PROGRESSIVE JPEG through the full loop, pinned by the strongest
    // property the format offers: progressive transport is lossless
    // over the quantized coefficients, so the SOF2 reconstruction must
    // equal the baseline reconstruction of the same raster BIT FOR BIT
    // (grey AND 4:4:4 color, successive-approximation scan script).
    // The oracle replays the geometry and demands all three booleans
    // literally true — any scan-path drift flips a hashed column.
    "multimodal_jpeg_progressive_roundtrip" -> ((s, dir) => {
      Multimodal.jpegProgressiveEquivalence(
          Tables(s, dir).documents.where(col("doc_id") < 300))
        .select(col("doc_id"), col("width"), col("height"), col("n_px"),
          col("prog_is_sof2"), col("grey_exact"), col("color_exact"))
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

  /** Shared DuckDB replay of the audio spectral-print chain
    * ([[graft.multimodal.Multimodal.audioSpectralPrints]] at
    * frameLen=16, bands=8). Expects a CTE `w(doc_id, text, n, ch)`
    * selecting the WAV stratum; emits CTEs through
    * `pr(doc_id, t, print)` and `tot(doc_id, t, energy)`. Chain:
    * char → byte (ascii corpus) → channel-0 16-bit LE sample →
    * Walsh–Hadamard coefficient by definition (sign = parity of
    * popcount(k & j), the O(n²) twin of the engine's butterfly) →
    * per-band squared-coefficient energy → Haitsma–Kalker
    * difference-of-differences sign bits, frames t ≥ 1 only.
    */
  private val spectralChainSql: String =
    """geo AS (
      |  SELECT doc_id, ch, (n // (2 * ch)) // 16 AS nfr FROM w),
      |chars AS (
      |  SELECT doc_id, ch,
      |    CAST(generate_subscripts(string_split(text, ''), 1) AS BIGINT) - 1
      |      AS p,
      |    CAST(ascii(unnest(string_split(text, ''))) AS BIGINT) AS v
      |  FROM w),
      |samp AS (
      |  SELECT c.doc_id, c.p // (2 * c.ch) AS s,
      |    CAST(sum(CASE WHEN c.p % (2 * c.ch) = 0 THEN c.v
      |                  WHEN c.p % (2 * c.ch) = 1 THEN 256 * c.v
      |                  ELSE 0 END) AS BIGINT) AS x
      |  FROM chars c JOIN geo g ON g.doc_id = c.doc_id
      |  WHERE c.p < g.nfr * 16 * 2 * c.ch
      |  GROUP BY c.doc_id, c.p // (2 * c.ch)),
      |coef AS (
      |  SELECT s.doc_id, s.s // 16 AS t, r.k AS k,
      |    CAST(sum(CASE WHEN
      |        bit_count(CAST(r.k AS BIGINT) & CAST(s.s % 16 AS BIGINT))
      |          % 2 = 0
      |      THEN s.x ELSE -s.x END) AS BIGINT) AS c
      |  FROM samp s, range(0, 16) r(k)
      |  GROUP BY s.doc_id, s.s // 16, r.k),
      |be AS (
      |  SELECT doc_id, t, k // 2 AS b, CAST(sum(c * c) AS BIGINT) AS e
      |  FROM coef GROUP BY doc_id, t, k // 2),
      |tot AS (
      |  SELECT doc_id, t, CAST(sum(e) AS BIGINT) AS energy
      |  FROM be GROUP BY doc_id, t),
      |d AS (
      |  SELECT x.doc_id, x.t, x.b, x.e - y.e AS dd
      |  FROM be x JOIN be y
      |    ON y.doc_id = x.doc_id AND y.t = x.t AND y.b = x.b + 1),
      |bits AS (
      |  SELECT cur.doc_id, cur.t, cur.b,
      |    CASE WHEN cur.dd - prv.dd > 0 THEN '1' ELSE '0' END AS bit
      |  FROM d cur JOIN d prv
      |    ON prv.doc_id = cur.doc_id AND prv.t = cur.t - 1
      |    AND prv.b = cur.b),
      |pr AS (
      |  SELECT doc_id, t, string_agg(bit, '' ORDER BY b) AS print
      |  FROM bits GROUP BY doc_id, t),
      |""".stripMargin

  val oracles: Map[String, String] = Map(
    // Every WARC field recomputed from the raw corpus: archive/record
    // placement from doc_id arithmetic, the URL string, the HTTP
    // constants the writer frames, and the body digest. The engine
    // must recover each from real (possibly gzip-member) archive
    // bytes — transport equality across both framings is implicit in
    // the single shared expectation.
    "multimodal_warc_records" ->
      """SELECT CAST(doc_id // 10 AS BIGINT) AS archive_id,
        |  CAST(doc_id % 10 AS INT) AS rec_idx,
        |  'response' AS warc_type,
        |  'https://example.com/doc/' || CAST(doc_id AS STRING) AS url,
        |  200 AS http_status, 'text/plain' AS content_type,
        |  CAST(length(text) AS INT) AS n_bytes,
        |  md5(text) AS body_md5
        |FROM documents ORDER BY archive_id, rec_idx""".stripMargin,

    // PDF structure facts derived from the fixture arithmetic: object
    // count = catalog + pages node + font + 2 per page; even ids
    // compress. The engine must recover each from real parsed bytes.
    "multimodal_pdf_meta" ->
      """SELECT doc_id, '1.4' AS version,
        |  CAST(ceil(len(string_split(text, ' ')) / 40.0) AS INT)
        |    AS n_pages,
        |  CAST(3 + 2 * ceil(len(string_split(text, ' ')) / 40.0) AS INT)
        |    AS n_objects,
        |  (doc_id % 2 = 0) AS compressed, false AS encrypted
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Pagination replayed from the raw tokens: page p carries tokens
    // [40p+1 .. 40p+40] as ceil(k/8) lines of 8 joined by \n. DuckDB
    // list slices clamp at the array end, mirroring Scala grouped().
    "multimodal_pdf_text" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS t,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents),
        |pg AS (
        |  SELECT doc_id, t, n,
        |    unnest(range(0, CAST(ceil(n / 40.0) AS INT))) AS p
        |  FROM tok),
        |ln AS (
        |  SELECT doc_id, t, n, p,
        |    unnest(range(0,
        |      CAST(ceil(least(40, n - p * 40) / 8.0) AS INT))) AS l
        |  FROM pg),
        |lt AS (
        |  SELECT doc_id, p, l,
        |    array_to_string(
        |      t[p * 40 + l * 8 + 1 : least(p * 40 + l * 8 + 8, n)], ' ')
        |      AS line
        |  FROM ln),
        |pt AS (
        |  SELECT doc_id, p, string_agg(line, chr(10) ORDER BY l) AS text
        |  FROM lt GROUP BY doc_id, p)
        |SELECT doc_id, CAST(p AS INT) AS page, text,
        |  CAST(length(text) AS INT) AS n_chars
        |FROM pt ORDER BY doc_id, page""".stripMargin,

    // The id % 5 container mapping replayed: three raster strata are
    // pixel-decodable, WAV is not an image, and the JPEG stratum's
    // four cycled sub-variants ((doc_id / 5) % 4) split into two REAL
    // decodable encodes (progressive SOF2 and Adobe YCCK — both
    // decoders at work) and the two distinct corrupt-stream triage
    // reasons the SOF sniff reports.
    "multimodal_decode_coverage" ->
      """WITH t AS (
        |  SELECT CASE CAST(doc_id % 5 AS INT)
        |      WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'audio/wav'
        |      WHEN 2 THEN 'image/ppm' WHEN 3 THEN 'image/png'
        |      ELSE 'image/jpeg' END AS media_type,
        |    CAST(doc_id % 5 AS INT) IN (0, 2, 3)
        |      OR (CAST(doc_id % 5 AS INT) = 4
        |          AND CAST((doc_id // 5) % 4 AS INT) IN (1, 2))
        |      AS pixel_decodable,
        |    CASE WHEN CAST(doc_id % 5 AS INT) IN (0, 2, 3) THEN NULL
        |      WHEN CAST(doc_id % 5 AS INT) = 4 THEN
        |        CASE CAST((doc_id // 5) % 4 AS INT)
        |          WHEN 0 THEN 'corrupt baseline jpeg stream (entropy decode failed)'
        |          WHEN 3 THEN 'corrupt cmyk/ycck jpeg stream (entropy decode failed)'
        |          ELSE NULL END
        |      ELSE 'not an image' END AS skip_reason
        |  FROM documents)
        |SELECT media_type, pixel_decodable, skip_reason,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM t
        |GROUP BY media_type, pixel_decodable, skip_reason
        |ORDER BY media_type, skip_reason""".stripMargin,

    // Every image row dispositioned: rasters AND the real progressive
    // / YCCK encodes decoded, the corrupt tail visibly not.
    "multimodal_ahash_status" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 5 AS INT)
        |    WHEN 0 THEN 'image/bmp' WHEN 2 THEN 'image/ppm'
        |    WHEN 3 THEN 'image/png' ELSE 'image/jpeg' END AS media_type,
        |  CAST(doc_id % 5 AS INT) <> 4
        |    OR CAST((doc_id // 5) % 4 AS INT) IN (1, 2) AS decoded
        |FROM documents
        |WHERE CAST(doc_id % 5 AS INT) <> 1
        |ORDER BY doc_id""".stripMargin,

    // Length-derived raster geometry (ascii corpus: utf-8 bytes ==
    // chars) + the literal tolerance verdict: the Spark side computes
    // within_tol from the actual decode, the oracle asserts it true.
    "multimodal_jpeg_roundtrip" ->
      """WITH g AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n
        |  FROM documents WHERE doc_id < 500)
        |SELECT doc_id,
        |  CAST(8 + n % 57 AS INT) AS width,
        |  CAST(greatest(1, (n + (8 + n % 57) - 1) // (8 + n % 57)) AS INT)
        |    AS height,
        |  CAST((8 + n % 57) *
        |    greatest(1, (n + (8 + n % 57) - 1) // (8 + n % 57)) AS BIGINT)
        |    AS n_px,
        |  true AS within_tol
        |FROM g
        |ORDER BY doc_id""".stripMargin,

    // Grey-geometry replay + the three literal invariants: the stream
    // is SOF2, and both reconstructions equal baseline exactly.
    "multimodal_jpeg_progressive_roundtrip" ->
      """WITH g AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n
        |  FROM documents WHERE doc_id < 300)
        |SELECT doc_id,
        |  CAST(8 + n % 57 AS INT) AS width,
        |  CAST(greatest(1, (n + (8 + n % 57) - 1) // (8 + n % 57)) AS INT)
        |    AS height,
        |  CAST((8 + n % 57) *
        |    greatest(1, (n + (8 + n % 57) - 1) // (8 + n % 57)) AS BIGINT)
        |    AS n_px,
        |  true AS prog_is_sof2,
        |  true AS grey_exact,
        |  true AS color_exact
        |FROM g
        |ORDER BY doc_id""".stripMargin,

    // Color-geometry replay: w = 8 + n % 41, h = ceil(n / (3w)).
    "multimodal_jpeg_color_roundtrip" ->
      """WITH g AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n
        |  FROM documents WHERE doc_id < 500)
        |SELECT doc_id,
        |  CAST(8 + n % 41 AS INT) AS width,
        |  CAST(greatest(1, (n + 3 * (8 + n % 41) - 1) // (3 * (8 + n % 41)))
        |    AS INT) AS height,
        |  CAST((8 + n % 41) *
        |    greatest(1, (n + 3 * (8 + n % 41) - 1) // (3 * (8 + n % 41)))
        |    AS BIGINT) AS n_px,
        |  true AS within_tol
        |FROM g
        |ORDER BY doc_id""".stripMargin,

    // Container-geometry replay from documents: every field of both
    // video strata is a pure function of the text byte length and the
    // doc_id parity stratum; frames_walked literally equals the
    // declared frame count for AVI (the movi walk must find them all).
    "multimodal_video_meta" ->
      """WITH g AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n
        |  FROM documents WHERE doc_id < 400)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'video/avi'
        |       ELSE 'video/mp4' END AS container,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 8 + n % 25
        |            ELSE 16 + n % 101 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 2 = 0
        |            THEN greatest(1, (n + (8 + n % 25) - 1) // (8 + n % 25))
        |            ELSE 16 + n % 59 END AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 2 + n % 4
        |            ELSE 1 + n % 30 END AS BIGINT) AS n_frames,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 6 + n % 24
        |            ELSE 600 END AS INT) AS rate,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 2 + n % 4
        |            ELSE 0 END AS BIGINT) AS frames_walked
        |FROM g ORDER BY doc_id""".stripMargin,

    // Sampled-frame replay: indices 0,2,… below the frame count, each
    // frame's SOF geometry equal to the encode geometry, decode_ok
    // literally true (the frames are this engine's own baseline JPEGs).
    "multimodal_video_frames" ->
      """WITH g AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n
        |  FROM documents WHERE doc_id < 400 AND doc_id % 2 = 0),
        |f AS (
        |  SELECT doc_id, n, unnest(range(0, 2 + n % 4, 2)) AS frame_idx
        |  FROM g)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(8 + n % 25 AS INT) AS width,
        |  CAST(greatest(1, (n + (8 + n % 25) - 1) // (8 + n % 25)) AS INT)
        |    AS height,
        |  true AS decode_ok
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    // Frame sets are a pure function of the text, so the recovered
    // near-dup pairs are exactly the equal-text pairs of the widened
    // corpus, each sharing all 2 + n%4 of its (always byte-distinct)
    // frames. Null-safe text equality: two null-text docs produce
    // identical all-marker frames.
    "multimodal_video_neardup" ->
      """WITH d AS (
        |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
        |  FROM documents WHERE doc_id < 200 AND doc_id % 2 = 0),
        |u AS (
        |  SELECT doc_id, text, n FROM d
        |  UNION ALL
        |  SELECT doc_id + 100000, text, n FROM d)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(2 + a.n % 4 AS BIGINT) AS shared_frames
        |FROM u a JOIN u b
        |  ON a.text IS NOT DISTINCT FROM b.text AND a.doc_id < b.doc_id
        |ORDER BY a_id, b_id""".stripMargin,

    // Clip replay: frame content is a pure function of (text, seed), so
    // two videos overlap in exactly nf − |off_a − off_b| consecutive
    // frames when their texts match — one island per pair, start
    // offsets from the offset difference. a_start/b_start are INTs on
    // the engine side (frame indices), run_len a count.
    "multimodal_video_clips" ->
      """WITH d AS (
        |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
        |  FROM documents WHERE doc_id < 200 AND doc_id % 2 = 0),
        |u AS (
        |  SELECT doc_id, text, n, 0 AS off FROM d
        |  UNION ALL
        |  SELECT doc_id + 100000, text, n, 1 AS off FROM d),
        |p AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    2 + a.n % 4 AS nf, a.off AS offa, b.off AS offb
        |  FROM u a JOIN u b
        |    ON a.text IS NOT DISTINCT FROM b.text AND a.doc_id < b.doc_id)
        |SELECT a_id, b_id,
        |  CAST(greatest(0, offb - offa) AS INT) AS a_start,
        |  CAST(greatest(0, offa - offb) AS INT) AS b_start,
        |  CAST(nf - abs(offa - offb) AS BIGINT) AS run_len
        |FROM p WHERE nf - abs(offa - offb) >= 2
        |ORDER BY a_id, b_id, a_start""".stripMargin,

    // Mirrors encodeCorpus's length-derived container geometry (ascii
    // corpus ⇒ utf-8 bytes == chars, so the content region == text and
    // md5(text) is the data hash). PPM's data offset is its ASCII header
    // length ("P6\n"+w+" "+h+"\n255\n" = 9 + digits(w) + digits(h));
    // PNG's is 41 (signature 8 + IHDR chunk 25 + IDAT length/type 8) and
    // its total size adds the zlib stored-block framing (header 2 +
    // 5/block + adler 4 ⇒ blob = 68 + n + 5·⌊(n−1)/65535⌋).
    "multimodal_decode_meta" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n, md5(text) AS h,
        |    doc_id % 4 AS f
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, n, h, f,
        |    16 + n % 97 AS wb, 8 + n % 61 AS wp, 12 + n % 71 AS wg,
        |    1 + n % 2 AS ch
        |  FROM m),
        |o AS (
        |  SELECT doc_id, n, h, f, ch,
        |    CASE f WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'audio/wav'
        |      WHEN 2 THEN 'image/ppm' ELSE 'image/png' END AS media_type,
        |    CASE f WHEN 0 THEN wb WHEN 1 THEN 0 WHEN 2 THEN wp
        |      ELSE wg END AS width,
        |    CASE f WHEN 0 THEN greatest(1, (n + 3*wb - 1) // (3*wb))
        |           WHEN 1 THEN 0
        |           WHEN 2 THEN greatest(1, (n + 3*wp - 1) // (3*wp))
        |           ELSE greatest(1, (n + 3*wg - 1) // (3*wg)) END AS height,
        |    CASE f WHEN 1 THEN n // (ch * 2) ELSE 1 END AS n_frames,
        |    CASE f WHEN 0 THEN 54 WHEN 1 THEN 44
        |      WHEN 2 THEN 9 + length(CAST(wp AS VARCHAR))
        |             + length(CAST(greatest(1, (n + 3*wp - 1) // (3*wp))
        |                 AS VARCHAR))
        |      ELSE 41 END AS data_offset,
        |    CASE f WHEN 3 THEN 68 + n + 5 * greatest(0, (n - 1) // 65535)
        |      ELSE NULL END AS png_bytes
        |  FROM g)
        |SELECT doc_id, media_type,
        |  CAST(coalesce(png_bytes, n + data_offset) AS BIGINT) AS n_bytes,
        |  CAST(width AS INT) AS width, CAST(height AS INT) AS height,
        |  CAST(n_frames AS BIGINT) AS n_frames,
        |  CAST(CASE f WHEN 1 THEN ch ELSE 0 END AS INT) AS channels,
        |  CAST(CASE f WHEN 1 THEN 8000 + (n % 5) * 1000 ELSE 0 END AS INT)
        |    AS sample_rate,
        |  CAST(data_offset AS INT) AS data_offset,
        |  CAST(n AS BIGINT) AS data_len,
        |  h AS data_hash
        |FROM o
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

    "multimodal_audio_duration" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n
        |  FROM documents WHERE doc_id % 4 = 1),
        |w AS (
        |  SELECT doc_id, 1 + n % 2 AS ch, 8000 + (n % 5) * 1000 AS rate,
        |    n // ((1 + n % 2) * 2) AS frames
        |  FROM m)
        |SELECT doc_id, CAST(ch AS INT) AS channels,
        |  CAST(rate AS INT) AS sample_rate,
        |  CAST(frames AS BIGINT) AS n_frames,
        |  round(frames * 1000.0 / rate, 3) + 0.0 AS duration_ms
        |FROM w
        |ORDER BY doc_id""".stripMargin,

    "multimodal_resize_fit" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n, doc_id % 4 AS f
        |  FROM documents WHERE doc_id % 4 <> 1),
        |g AS (
        |  SELECT doc_id, n, f,
        |    CASE f WHEN 0 THEN 16 + n % 97 WHEN 2 THEN 8 + n % 61
        |      ELSE 12 + n % 71 END AS w
        |  FROM m),
        |meta AS (
        |  SELECT doc_id,
        |    CASE f WHEN 0 THEN 'image/bmp' WHEN 2 THEN 'image/ppm'
        |      ELSE 'image/png' END AS media_type,
        |    CAST(w AS INT) AS width,
        |    CAST(greatest(1, (n + 3*w - 1) // (3*w)) AS INT) AS height
        |  FROM g)
        |SELECT doc_id, media_type, width, height,
        |  CAST(greatest(1, (width * 224) // greatest(width, height)) AS INT) AS out_w,
        |  CAST(greatest(1, (height * 224) // greatest(width, height)) AS INT) AS out_h
        |FROM meta
        |ORDER BY doc_id""".stripMargin,

    // The image-ahash chain, then the 4-block index and the candidate
    // hamming count (range-join per position — candidates only).
    "multimodal_ahash_pairs" ->
      """WITH m AS (
        |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n, doc_id % 4 AS f
        |  FROM documents WHERE doc_id % 4 <> 1),
        |g AS (
        |  SELECT doc_id, text, n, f,
        |    CASE f WHEN 0 THEN 16 + n % 97 WHEN 2 THEN 8 + n % 61
        |      ELSE 12 + n % 71 END AS w
        |  FROM m),
        |meta AS (
        |  SELECT doc_id, text, n,
        |    w, greatest(1, (n + 3*w - 1) // (3*w)) AS h
        |  FROM g),
        |cells AS (
        |  SELECT doc_id, text, n,
        |    (r1.oy * 8 + r2.ox) AS k,
        |    (((r1.oy * h) // 8) * w + ((r2.ox * w) // 8)) * 3 AS off
        |  FROM meta, range(0, 8) r1(oy), range(0, 8) r2(ox)),
        |vals AS (
        |  SELECT doc_id, k, CAST(
        |    coalesce(CASE WHEN off < n
        |      THEN ascii(substr(text, CAST(off + 1 AS INT), 1)) END, 0) +
        |    coalesce(CASE WHEN off + 1 < n
        |      THEN ascii(substr(text, CAST(off + 2 AS INT), 1)) END, 0) +
        |    coalesce(CASE WHEN off + 2 < n
        |      THEN ascii(substr(text, CAST(off + 3 AS INT), 1)) END, 0)
        |    AS BIGINT) AS v
        |  FROM cells),
        |tot AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS total
        |        FROM vals GROUP BY doc_id),
        |bits AS (
        |  SELECT v.doc_id, v.k,
        |    CASE WHEN v.v * 64 > t.total THEN '1' ELSE '0' END AS b
        |  FROM vals v JOIN tot t ON v.doc_id = t.doc_id),
        |hash AS (
        |  SELECT doc_id, string_agg(b, '' ORDER BY k) AS ahash
        |  FROM bits GROUP BY doc_id),
        |blk AS (
        |  SELECT doc_id, ahash, r.b AS b,
        |    substr(ahash, CAST(r.b * 16 + 1 AS INT), 16) AS sig
        |  FROM hash, range(0, 4) r(b)),
        |p AS (
        |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
        |    x.ahash AS ha, y.ahash AS hb
        |  FROM blk x JOIN blk y
        |    ON x.b = y.b AND x.sig = y.sig AND x.doc_id < y.doc_id),
        |hm AS (
        |  SELECT id_a, id_b, CAST(sum(CASE WHEN
        |      substr(ha, CAST(i AS INT), 1) <> substr(hb, CAST(i AS INT), 1)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS hamming
        |  FROM p, range(1, 65) r(i)
        |  GROUP BY id_a, id_b)
        |SELECT id_a, id_b, hamming FROM hm
        |WHERE hamming <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // Per-byte replay: frame of byte p is ⌊p·16/n⌋ on both sides; empty
    // frames materialize as 0 via the grid left join.
    "multimodal_audio_envelope" ->
      """WITH w AS (
        |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
        |  FROM documents WHERE doc_id % 4 = 1),
        |chars AS (
        |  SELECT doc_id, n,
        |    CAST(generate_subscripts(string_split(text, ''), 1) AS BIGINT) - 1
        |      AS p,
        |    ascii(unnest(string_split(text, ''))) AS v
        |  FROM w),
        |fr AS (
        |  SELECT doc_id, (p * 16) // n AS f, CAST(sum(v) AS BIGINT) AS e
        |  FROM chars GROUP BY doc_id, (p * 16) // n),
        |tot AS (SELECT doc_id, CAST(sum(e) AS BIGINT) AS total
        |        FROM fr GROUP BY doc_id),
        |grid AS (SELECT w.doc_id, r.f FROM w, range(0, 16) r(f)),
        |bits AS (
        |  SELECT g.doc_id, g.f, t.total,
        |    CASE WHEN coalesce(fr.e, 0) * 16 > t.total THEN '1' ELSE '0'
        |      END AS b
        |  FROM grid g
        |  LEFT JOIN fr ON fr.doc_id = g.doc_id AND fr.f = g.f
        |  JOIN tot t ON t.doc_id = g.doc_id),
        |env AS (
        |  SELECT doc_id, 'audio/wav' AS media_type,
        |    string_agg(b, '' ORDER BY f) AS envelope,
        |    CAST(sum(CASE WHEN b = '1' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_ones,
        |    max(total) AS energy
        |  FROM bits GROUP BY doc_id)
        |SELECT doc_id, media_type, envelope, n_ones, energy,
        |  CAST(count(*) OVER (PARTITION BY envelope) - 1 AS BIGINT)
        |    AS n_mates
        |FROM env
        |ORDER BY doc_id""".stripMargin,

    // The envelope chain (per-byte energy replay), then the 4-block
    // index on the 16-bit signature and the candidate hamming count —
    // the image-pairs oracle tail at width 4.
    "multimodal_audio_near_pairs" ->
      """WITH w AS (
        |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
        |  FROM documents WHERE doc_id % 4 = 1),
        |chars AS (
        |  SELECT doc_id, n,
        |    CAST(generate_subscripts(string_split(text, ''), 1) AS BIGINT) - 1
        |      AS p,
        |    ascii(unnest(string_split(text, ''))) AS v
        |  FROM w),
        |fr AS (
        |  SELECT doc_id, (p * 16) // n AS f, CAST(sum(v) AS BIGINT) AS e
        |  FROM chars GROUP BY doc_id, (p * 16) // n),
        |tot AS (SELECT doc_id, CAST(sum(e) AS BIGINT) AS total
        |        FROM fr GROUP BY doc_id),
        |grid AS (SELECT w.doc_id, r.f FROM w, range(0, 16) r(f)),
        |bits AS (
        |  SELECT g.doc_id, g.f,
        |    CASE WHEN coalesce(fr.e, 0) * 16 > t.total THEN '1' ELSE '0'
        |      END AS b
        |  FROM grid g
        |  LEFT JOIN fr ON fr.doc_id = g.doc_id AND fr.f = g.f
        |  JOIN tot t ON t.doc_id = g.doc_id),
        |env AS MATERIALIZED (
        |  SELECT doc_id, string_agg(b, '' ORDER BY f) AS envelope
        |  FROM bits GROUP BY doc_id),
        |blk AS (
        |  SELECT doc_id, envelope, r.b AS b,
        |    substr(envelope, CAST(r.b * 4 + 1 AS INT), 4) AS sig
        |  FROM env, range(0, 4) r(b)),
        |p AS (
        |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
        |    x.envelope AS ha, y.envelope AS hb
        |  FROM blk x JOIN blk y
        |    ON x.b = y.b AND x.sig = y.sig AND x.doc_id < y.doc_id),
        |hm AS (
        |  SELECT id_a, id_b, CAST(sum(CASE WHEN
        |      substr(ha, CAST(i AS INT), 1) <> substr(hb, CAST(i AS INT), 1)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS hamming
        |  FROM p, range(1, 17) r(i)
        |  GROUP BY id_a, id_b)
        |SELECT id_a, id_b, hamming FROM hm
        |WHERE hamming <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // Per-bit replay of the spectral chain (shared prefix below): the
    // ascii corpus makes char == byte, so the oracle rebuilds the PCM
    // stream and re-derives every Walsh–Hadamard coefficient by its
    // O(n²) definition — sign = parity of popcount(k & j) — then the
    // band energies and the HK difference-of-differences bits.
    "multimodal_audio_spectral" ->
      ("""WITH w AS (
        |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n,
        |    CAST(1 + length(text) % 2 AS BIGINT) AS ch
        |  FROM documents WHERE doc_id % 4 = 1),
        |""".stripMargin + spectralChainSql +
        """fin AS (
          |  SELECT p.doc_id, CAST(p.t AS INT) AS frame_idx, p.print,
          |    tt.energy
          |  FROM pr p JOIN tot tt ON tt.doc_id = p.doc_id AND tt.t = p.t)
          |SELECT doc_id, frame_idx, print, energy FROM fin
          |ORDER BY doc_id, frame_idx""".stripMargin),

    // The spectral chain over the widened corpus, then 4-print shingles
    // (window leads), the >1024-doc stop-word gate, and the shingle-
    // keyed pair count — the engine's audioNearDupPairs replayed.
    "multimodal_audio_spectral_pairs" ->
      ("""WITH base AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 400
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, text FROM documents
        |  WHERE doc_id < 400),
        |w AS (
        |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n,
        |    CAST(1 + length(text) % 2 AS BIGINT) AS ch
        |  FROM base WHERE doc_id % 4 = 1),
        |""".stripMargin + spectralChainSql +
        """shg AS (
          |  SELECT doc_id, t, print,
          |    lead(print, 1) OVER (PARTITION BY doc_id ORDER BY t) AS p1,
          |    lead(print, 2) OVER (PARTITION BY doc_id ORDER BY t) AS p2,
          |    lead(print, 3) OVER (PARTITION BY doc_id ORDER BY t) AS p3
          |  FROM pr),
          |shd AS (
          |  SELECT DISTINCT doc_id, print || p1 || p2 || p3 AS sh
          |  FROM shg WHERE p3 IS NOT NULL),
          |hot AS (SELECT sh FROM shd GROUP BY sh HAVING count(*) > 1024),
          |cold AS (
          |  SELECT doc_id, sh FROM shd
          |  WHERE sh NOT IN (SELECT sh FROM hot)),
          |pairs AS (
          |  SELECT x.doc_id AS a_id, y.doc_id AS b_id,
          |    CAST(count(*) AS BIGINT) AS shared_shingles
          |  FROM cold x JOIN cold y
          |    ON x.sh = y.sh AND x.doc_id < y.doc_id
          |  GROUP BY x.doc_id, y.doc_id
          |  HAVING count(*) >= 2)
          |SELECT a_id, b_id, shared_shingles FROM pairs
          |ORDER BY a_id, b_id""".stripMargin),

    // Same geometry CTEs as the downsample oracle, fixed 8×8 grid: cell
    // value = Σ ascii of the up-to-3 chars at the sampled offset (ascii
    // corpus: char == byte), bit = v·64 > Σv (exact integers), hash =
    // the 64 bits string_agg'd row-major, mates = same-hash window
    // count.
    "multimodal_image_ahash" ->
      """WITH m AS (
        |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n, doc_id % 4 AS f
        |  FROM documents WHERE doc_id % 4 <> 1),
        |g AS (
        |  SELECT doc_id, text, n, f,
        |    CASE f WHEN 0 THEN 16 + n % 97 WHEN 2 THEN 8 + n % 61
        |      ELSE 12 + n % 71 END AS w
        |  FROM m),
        |meta AS (
        |  SELECT doc_id, text, n,
        |    CASE f WHEN 0 THEN 'image/bmp' WHEN 2 THEN 'image/ppm'
        |      ELSE 'image/png' END AS media_type,
        |    w, greatest(1, (n + 3*w - 1) // (3*w)) AS h
        |  FROM g),
        |cells AS (
        |  SELECT doc_id, media_type, text, n,
        |    (r1.oy * 8 + r2.ox) AS k,
        |    (((r1.oy * h) // 8) * w + ((r2.ox * w) // 8)) * 3 AS off
        |  FROM meta, range(0, 8) r1(oy), range(0, 8) r2(ox)),
        |vals AS (
        |  SELECT doc_id, media_type, k, CAST(
        |    coalesce(CASE WHEN off < n
        |      THEN ascii(substr(text, CAST(off + 1 AS INT), 1)) END, 0) +
        |    coalesce(CASE WHEN off + 1 < n
        |      THEN ascii(substr(text, CAST(off + 2 AS INT), 1)) END, 0) +
        |    coalesce(CASE WHEN off + 2 < n
        |      THEN ascii(substr(text, CAST(off + 3 AS INT), 1)) END, 0)
        |    AS BIGINT) AS v
        |  FROM cells),
        |tot AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS total
        |        FROM vals GROUP BY doc_id),
        |bits AS (
        |  SELECT v.doc_id, v.media_type, v.k,
        |    CASE WHEN v.v * 64 > t.total THEN '1' ELSE '0' END AS b
        |  FROM vals v JOIN tot t ON v.doc_id = t.doc_id),
        |hash AS (
        |  SELECT doc_id, media_type, string_agg(b, '' ORDER BY k) AS ahash,
        |    CAST(sum(CASE WHEN b = '1' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_ones
        |  FROM bits GROUP BY doc_id, media_type)
        |SELECT doc_id, media_type, ahash, n_ones,
        |  CAST(count(*) OVER (PARTITION BY ahash) - 1 AS BIGINT) AS n_mates
        |FROM hash
        |ORDER BY doc_id""".stripMargin,

    // Per-pixel mirror of downsampleImages: same geometry CTEs as the
    // resize oracle, then one row per output pixel — source offset
    // ((⌊oy·h/oh⌋·w + ⌊ox·w/ow⌋)·3), 3-byte slice truncated at the
    // content end, byte-value sum via ascii() (ascii corpus: char ==
    // byte). raster_hash md5s the slices concatenated in (oy, ox) scan
    // order — the exact raster the Spark-side sampler digests.
    "multimodal_downsample" ->
      """WITH m AS (
        |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n, doc_id % 4 AS f
        |  FROM documents WHERE doc_id % 4 <> 1),
        |g AS (
        |  SELECT doc_id, text, n, f,
        |    CASE f WHEN 0 THEN 16 + n % 97 WHEN 2 THEN 8 + n % 61
        |      ELSE 12 + n % 71 END AS w
        |  FROM m),
        |meta AS (
        |  SELECT doc_id, text, n,
        |    CASE f WHEN 0 THEN 'image/bmp' WHEN 2 THEN 'image/ppm'
        |      ELSE 'image/png' END AS media_type,
        |    w, greatest(1, (n + 3*w - 1) // (3*w)) AS h
        |  FROM g),
        |geo AS (
        |  SELECT *, greatest(1, (w * 24) // greatest(w, h)) AS ow,
        |    greatest(1, (h * 24) // greatest(w, h)) AS oh
        |  FROM meta),
        |ys AS (SELECT *, unnest(range(0, oh)) AS oy FROM geo),
        |xs AS (SELECT *, unnest(range(0, ow)) AS ox FROM ys),
        |px AS (
        |  SELECT doc_id, media_type, w, h, ow, oh, oy, ox, n, text,
        |    ((oy * h) // oh * w + (ox * w) // ow) * 3 AS off
        |  FROM xs),
        |sl AS (
        |  SELECT doc_id, media_type, w, h, ow, oh, oy, ox,
        |    CASE WHEN off < n THEN substr(text, CAST(off + 1 AS INT),
        |      CAST(least(3, n - off) AS INT)) ELSE '' END AS b,
        |    CASE WHEN off < n
        |      THEN ascii(substr(text, CAST(off + 1 AS INT), 1)) ELSE 0 END
        |    + CASE WHEN off + 1 < n
        |      THEN ascii(substr(text, CAST(off + 2 AS INT), 1)) ELSE 0 END
        |    + CASE WHEN off + 2 < n
        |      THEN ascii(substr(text, CAST(off + 3 AS INT), 1)) ELSE 0 END AS s
        |  FROM px)
        |SELECT doc_id, media_type,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(ow AS INT) AS out_w, CAST(oh AS INT) AS out_h,
        |  CAST(sum(length(b)) AS BIGINT) AS n_px_bytes,
        |  CAST(sum(s) AS BIGINT) AS px_sum,
        |  md5(string_agg(b, '' ORDER BY oy, ox)) AS raster_hash
        |FROM sl
        |GROUP BY doc_id, media_type, w, h, ow, oh
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
