package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** Decoded media header: what a real codec's metadata pass emits.
  *
  * `data_offset`/`data_len` delimit the payload's content region (pixel
  * array / audio samples / raster), so downstream stages (hashing,
  * chunking, frame slicing) can address content without re-parsing.
  * `width`/`height` are 0 for audio; `n_frames` is 1 for still images and
  * the sample-frame count for audio.
  */
final case class DecodedHeader(
    media_type: String,
    width: Int,
    height: Int,
    n_frames: Long,
    channels: Int,
    sample_rate: Int,
    data_offset: Int,
    data_len: Long)

/** Pure-JVM header codecs for three self-describing binary formats —
  * BMP (BITMAPINFOHEADER), WAV (RIFF chunk walk), and binary PPM (P6).
  *
  * These are REAL parsers over the actual byte layout (magic numbers,
  * little-endian fields, RIFF chunk traversal, ASCII header scanning with
  * comment handling) — pointed at any genuine BMP/WAV/P6 file they return
  * its true geometry. They replace the former `decodeStub`, which
  * fabricated dimensions from byte length. Formats that need an external
  * codec (JPEG entropy decode, video containers) stay out of scope: this
  * environment ships no media libraries, and pretending otherwise would
  * un-verify the pipeline.
  *
  * Everything is allocation-light and branch-only — safe to run inside a
  * `mapPartitions` over billions of rows.
  */
object MediaCodec {

  val Unknown: DecodedHeader =
    DecodedHeader("unknown", 0, 0, 0L, 0, 0, 0, 0L)

  // ---- helpers ---------------------------------------------------------

  private def le32(b: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt

  private def le16(b: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(b, off, 2).order(ByteOrder.LITTLE_ENDIAN).getShort & 0xffff

  private def putLe32(buf: ByteBuffer, v: Int): ByteBuffer = buf.putInt(v)

  // ---- decode ----------------------------------------------------------

  /** Sniff the magic number and parse the matching header. Unknown or
    * malformed payloads yield [[Unknown]] — never an exception (a 100 TB
    * scan WILL contain corrupt blobs; decode must be total).
    */
  def decode(p: Array[Byte]): DecodedHeader = {
    if (p == null || p.length < 2) Unknown
    else if (p(0) == 'B' && p(1) == 'M') decodeBmp(p)
    else if (p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
      p(3) == 'F' && p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E')
      decodeWav(p)
    else if (p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
      p(3) == 'F' && p(8) == 'A' && p(9) == 'V' && p(10) == 'I' && p(11) == ' ')
      decodeAvi(p)
    else if (p.length >= 12 && p(4) == 'f' && p(5) == 't' && p(6) == 'y' &&
      p(7) == 'p')
      decodeMp4(p)
    else if (p(0) == 'P' && p(1) == '6') decodePpm(p)
    else if (isPngSignature(p)) decodePng(p)
    else if (p.length >= 3 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8 &&
      (p(2) & 0xff) == 0xff) decodeJpeg(p)
    else Unknown
  }

  /** Header plus MATERIALIZED content where the content is not
    * addressable in-payload: for PNG the inflated IDAT stream (inflated
    * exactly once — computing `data_len` requires the inflate anyway, so
    * the hot decode path must not pay it twice); for every other format
    * `null` — the content is the payload slice at
    * `[data_offset, data_offset + data_len)`, address it in place rather
    * than copying. ([[Unknown]], null) for corrupt payloads.
    */
  def decodeWithContent(p: Array[Byte]): (DecodedHeader, Array[Byte]) =
    if (p != null && isPngSignature(p)) decodePngFull(p)
    else (decode(p), null)

  // The FULL 8-byte signature — decode() and decodeWithContent() must
  // classify identically, so both sniff through this predicate.
  private def isPngSignature(p: Array[Byte]): Boolean =
    p.length >= 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P' &&
      p(2) == 'N' && p(3) == 'G' && p(4) == 0x0d && p(5) == 0x0a &&
      p(6) == 0x1a && p(7) == 0x0a

  /** Content region of a decoded payload: the raw byte slice for formats
    * that store content uncompressed; the INFLATED IDAT stream for PNG.
    * Returns an empty array for [[Unknown]]. (For the hot path prefer
    * [[decodeWithContent]] — this re-inflates PNG payloads.)
    */
  def contentBytes(p: Array[Byte], h: DecodedHeader): Array[Byte] =
    if (h.media_type == "image/png")
      inflatePngIdat(p, pngInflateCap(h.width, h.height))
    else if (h == Unknown) Array.emptyByteArray
    else java.util.Arrays.copyOfRange(p, h.data_offset,
      h.data_offset + h.data_len.toInt)

  /** BMP: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER. Pixel-array
    * offset lives at byte 10 (le32), width/height at 18/22 within the
    * info header. Height may be negative (top-down rows) — geometry is
    * |height|.
    */
  private def decodeBmp(p: Array[Byte]): DecodedHeader = {
    if (p.length < 26) return Unknown
    val dataOffset = le32(p, 10)
    val width = le32(p, 18)
    val height = math.abs(le32(p, 22))
    if (width <= 0 || height <= 0 || dataOffset < 26 || dataOffset > p.length)
      return Unknown
    DecodedHeader("image/bmp", width, height, 1L, 0, 0, dataOffset,
      (p.length - dataOffset).toLong)
  }

  /** WAV: walk RIFF chunks from byte 12; "fmt " gives channels/bits,
    * "data" gives the sample region. Frames = dataLen / blockAlign.
    */
  private def decodeWav(p: Array[Byte]): DecodedHeader = {
    var off = 12
    var channels = 0
    var bits = 0
    var rate = 0
    var dataOffset = -1
    var dataLen = 0L
    while (off + 8 <= p.length) {
      val id = new String(p, off, 4, US_ASCII)
      val size = le32(p, off + 4)
      if (size < 0 || off + 8 + size.toLong > Int.MaxValue) return Unknown
      id match {
        case "fmt " if off + 8 + 16 <= p.length =>
          channels = le16(p, off + 10)
          rate = le32(p, off + 12)
          bits = le16(p, off + 22)
        case "data" =>
          dataOffset = off + 8
          dataLen = math.min(size.toLong, (p.length - dataOffset).toLong)
        case _ => // skip unknown chunks (LIST, fact, ...)
      }
      // RIFF chunks are word-aligned: odd sizes carry a pad byte
      off += 8 + size + (size & 1)
    }
    if (channels <= 0 || bits <= 0 || rate <= 0 || dataOffset < 0)
      return Unknown
    val blockAlign = channels * (bits / 8)
    if (blockAlign <= 0) return Unknown
    DecodedHeader("audio/wav", 0, 0, dataLen / blockAlign, channels, rate,
      dataOffset, dataLen)
  }

  /** AVI (RIFF form 'AVI '): the video-container twin of the WAV walk.
    * `LIST hdrl` carries the MainAVIHeader (`avih`: frame count, canvas
    * geometry) and one `strl` per stream (`strh`: fps as dwRate/dwScale
    * for the 'vids' stream); `LIST movi` is the frame-chunk region —
    * reported as the content slice so [[aviVideoFrames]] can address
    * individual frames without re-walking the header. `sample_rate`
    * carries the video fps (rounded), `channels` stays 0.
    */
  private def decodeAvi(p: Array[Byte]): DecodedHeader = {
    var width = 0
    var height = 0
    var nFrames = 0L
    var fps = 0
    var moviOffset = -1
    var moviLen = 0L
    // top-level RIFF chunk walk; LIST chunks expose their form type in
    // the first 4 data bytes
    var off = 12
    val end = math.min(p.length.toLong, 8L + le32(p, 4)).toInt
    while (off + 8 <= end) {
      val id = new String(p, off, 4, US_ASCII)
      val size = le32(p, off + 4)
      if (size < 0 || off + 8 + size.toLong > end) return Unknown
      if (id == "LIST" && size >= 4) {
        val form = new String(p, off + 8, 4, US_ASCII)
        if (form == "hdrl") {
          // nested walk of the header list only — avih + strl/strh
          var ho = off + 12
          val hend = off + 8 + size
          while (ho + 8 <= hend) {
            val hid = new String(p, ho, 4, US_ASCII)
            val hsize = le32(p, ho + 4)
            if (hsize < 0 || ho + 8 + hsize.toLong > hend) return Unknown
            if (hid == "avih" && hsize >= 40) {
              nFrames = le32(p, ho + 8 + 16).toLong & 0xffffffffL
              width = le32(p, ho + 8 + 32)
              height = le32(p, ho + 8 + 36)
            } else if (hid == "LIST" && hsize >= 4 &&
              new String(p, ho + 8, 4, US_ASCII) == "strl") {
              var so = ho + 12
              val send = ho + 8 + hsize
              while (so + 8 <= send) {
                val sid = new String(p, so, 4, US_ASCII)
                val ssize = le32(p, so + 4)
                if (ssize < 0 || so + 8 + ssize.toLong > send) return Unknown
                if (sid == "strh" && ssize >= 36 &&
                  new String(p, so + 8, 4, US_ASCII) == "vids") {
                  val scale = le32(p, so + 8 + 20)
                  val rate = le32(p, so + 8 + 24)
                  if (scale > 0 && rate > 0)
                    fps = math.round(rate.toDouble / scale).toInt
                }
                so += 8 + ssize + (ssize & 1)
              }
            }
            ho += 8 + hsize + (hsize & 1)
          }
        } else if (form == "movi") {
          moviOffset = off + 12
          moviLen = (size - 4).toLong
        }
      }
      off += 8 + size + (size & 1)
    }
    if (width <= 0 || height <= 0 || moviOffset < 0) Unknown
    else DecodedHeader("video/avi", width, height, nFrames, 0, fps,
      moviOffset, moviLen)
  }

  /** The individual video-frame payloads of an MJPEG AVI: every `##dc`
    * / `##db` chunk in the movi region, in stream order — each slice is
    * a complete still-image stream (a full JPEG for MJPG). Malformed
    * chunk sizes end the walk (totality over crawl garbage); non-video
    * chunks (audio `##wb`, index) are skipped.
    */
  def aviVideoFrames(p: Array[Byte]): Seq[Array[Byte]] = {
    val h = decode(p)
    if (h.media_type != "video/avi") return Seq.empty
    val out = Seq.newBuilder[Array[Byte]]
    var off = h.data_offset
    val end = math.min(p.length.toLong, h.data_offset + h.data_len).toInt
    while (off + 8 <= end) {
      val id = new String(p, off, 4, US_ASCII)
      val size = le32(p, off + 4)
      if (size < 0 || off + 8 + size.toLong > end) return out.result()
      if (id.length == 4 && id.charAt(0).isDigit && id.charAt(1).isDigit &&
        (id.endsWith("dc") || id.endsWith("db")))
        out += java.util.Arrays.copyOfRange(p, off + 8, off + 8 + size)
      off += 8 + size + (size & 1)
    }
    out.result()
  }

  // ---- MP4 (ISO base media file format) --------------------------------

  private def be32u(p: Array[Byte], off: Int): Long =
    ByteBuffer.wrap(p, off, 4).getInt.toLong & 0xffffffffL

  /** Iterate the boxes of `[from, to)`, calling `f(type, dataOff,
    * dataEnd)` per box. Returns false on a malformed size — the caller
    * maps the whole payload to [[Unknown]] (strictness is safe: crawl
    * garbage classifying as unknown is the conservative disposition).
    * 64-bit largesize and size-0 ("to end of file") boxes are treated
    * as malformed — our parse targets metadata boxes, all far below
    * 4 GiB.
    */
  private def walkBoxes(p: Array[Byte], from: Int, to: Int)
      (f: (String, Int, Int) => Unit): Boolean = {
    var off = from
    while (off + 8 <= to) {
      val size = be32u(p, off)
      if (size < 8 || off + size > to) return false
      val btype = new String(p, off + 4, 4, US_ASCII)
      f(btype, off + 8, (off + size).toInt)
      off += size.toInt
    }
    true
  }

  /** MP4/ISO-BMFF metadata walk: `moov/mvhd` (timescale, duration),
    * the VIDEO `trak`'s `tkhd` (16.16 fixed-point canvas), `stbl/stsz`
    * (sample count = frame count), `stbl/stsd` (codec fourcc — carried
    * in [[VideoStreamInfo]] via [[mp4Info]]). The mdat region is the
    * content slice. This is the typed-metadata posture for codecs the
    * engine does not decode (H.264/AAC): geometry, duration, and frame
    * counts are queryable at scan time, payload stays opaque.
    */
  private def decodeMp4(p: Array[Byte]): DecodedHeader =
    mp4Info(p) match {
      case None => Unknown
      case Some(i) => DecodedHeader("video/mp4", i.width, i.height,
        i.n_frames, 0, i.timescale, i.data_offset, i.data_len)
    }

  /** Codec-aware MP4 fields beyond the uniform [[DecodedHeader]]. */
  final case class VideoStreamInfo(
      width: Int, height: Int, n_frames: Long, timescale: Int,
      duration: Long, vcodec: String, data_offset: Int, data_len: Long)

  def mp4Info(p: Array[Byte]): Option[VideoStreamInfo] = {
    if (p == null || p.length < 12 ||
      new String(p, 4, 4, US_ASCII) != "ftyp") return None
    var timescale = 0
    var duration = 0L
    var width = 0
    var height = 0
    var nFrames = 0L
    var vcodec = ""
    var mdatOff = -1
    var mdatLen = 0L
    var ok = true
    ok &= walkBoxes(p, 0, p.length) { (t, d0, d1) =>
      t match {
        case "moov" =>
          ok &= walkBoxes(p, d0, d1) { (mt, m0, m1) =>
            mt match {
              case "mvhd" if m1 - m0 >= 20 && p(m0) == 0 =>
                // version-0 fullbox: ctime/mtime then timescale+duration
                timescale = be32u(p, m0 + 12).toInt
                duration = be32u(p, m0 + 16)
              case "trak" =>
                var w = 0; var h = 0; var frames = 0L
                var codec = ""; var isVideo = false
                walkBoxes(p, m0, m1) { (tt, t0, t1) =>
                  tt match {
                    case "tkhd" if t1 - t0 >= 84 && p(t0) == 0 =>
                      w = (be32u(p, t0 + 76) >> 16).toInt
                      h = (be32u(p, t0 + 80) >> 16).toInt
                    case "mdia" =>
                      walkBoxes(p, t0, t1) { (dt, e0, e1) =>
                        dt match {
                          case "hdlr" if e1 - e0 >= 12 =>
                            isVideo =
                              new String(p, e0 + 8, 4, US_ASCII) == "vide"
                          case "minf" =>
                            walkBoxes(p, e0, e1) { (ft, g0, g1) =>
                              if (ft == "stbl")
                                walkBoxes(p, g0, g1) { (st, s0, s1) =>
                                  st match {
                                    case "stsz" if s1 - s0 >= 12 =>
                                      frames = be32u(p, s0 + 8)
                                    case "stsd" if s1 - s0 >= 16 =>
                                      codec =
                                        new String(p, s0 + 12, 4, US_ASCII)
                                    case _ =>
                                  }
                                }
                            }
                          case _ =>
                        }
                      }
                    case _ =>
                  }
                }
                if (isVideo) {
                  width = w; height = h; nFrames = frames; vcodec = codec
                }
              case _ =>
            }
          }
        case "mdat" =>
          mdatOff = d0
          mdatLen = (d1 - d0).toLong
        case _ =>
      }
    }
    if (!ok || timescale <= 0 || width <= 0 || height <= 0) None
    else Some(VideoStreamInfo(width, height, nFrames, timescale, duration,
      vcodec, math.max(mdatOff, 0), mdatLen))
  }

  /** Binary PPM (P6): ASCII "P6", then width, height, maxval as decimal
    * ints separated by whitespace (with `#` comments legal between
    * tokens), then EXACTLY ONE whitespace byte before the raster.
    */
  private def decodePpm(p: Array[Byte]): DecodedHeader = {
    var off = 2
    def skipSpaceAndComments(): Boolean = {
      var progressed = true
      while (progressed && off < p.length) {
        progressed = false
        while (off < p.length && (p(off) == ' ' || p(off) == '\n' ||
          p(off) == '\r' || p(off) == '\t')) { off += 1; progressed = true }
        if (off < p.length && p(off) == '#') {
          while (off < p.length && p(off) != '\n') off += 1
          progressed = true
        }
      }
      off < p.length
    }
    def readInt(): Long = {
      if (!skipSpaceAndComments()) return -1L
      var v = 0L
      var any = false
      // Consume ALL digits; a value past Int.MaxValue is malformed, not
      // truncatable — stopping mid-number would both return garbage via
      // toInt and leave the remaining digits to be misparsed as the next
      // token.
      while (off < p.length && p(off) >= '0' && p(off) <= '9') {
        if (v <= Int.MaxValue) v = v * 10 + (p(off) - '0')
        off += 1; any = true
      }
      if (!any || v > Int.MaxValue) -1L else v
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 65535 || off >= p.length)
      return Unknown
    off += 1 // the single whitespace separating header from raster
    if (off > p.length) return Unknown
    DecodedHeader("image/ppm", w.toInt, h.toInt, 1L, 0, 0, off,
      (p.length - off).toLong)
  }

  /** PNG: 8-byte signature, then length/type/data/CRC chunks (lengths and
    * IHDR dims big-endian). The chunk walk VERIFIES each CRC32 — a
    * corrupted chunk makes the whole payload [[Unknown]] rather than
    * returning dims read from damaged bytes. `data_offset` points at the
    * first IDAT's data; `data_len` is the INFLATED IDAT stream length
    * (PNG stores content zlib-compressed — see [[contentBytes]]).
    */
  private def decodePng(p: Array[Byte]): DecodedHeader = decodePngFull(p)._1

  /** Absolute ceiling on any single payload's inflated size, independent
    * of what the (attacker-controlled) IHDR claims: the geometry-derived
    * bound alone lets a forged 65535×65535 header authorize ~68 GB.
    * 256 MB covers any plausible row-sized image while keeping the
    * worst-case allocation bounded per task.
    */
  private val MaxInflatedBytes: Long = 1L << 28

  /** Upper bound on a legitimate PNG's inflated size from its IHDR
    * geometry: ≤ 8 bytes/pixel (16-bit RGBA) + 1 filter byte per row,
    * doubled for Adam7 interlace overhead, plus slack — then clamped to
    * [[MaxInflatedBytes]] (the geometry is attacker-controlled; the
    * clamp also sidesteps Long overflow for w·h near 2^62). Anything
    * beyond the bound is a zlib bomb, not an image — inflating
    * unboundedly inside mapPartitions would let one small adversarial
    * row allocate gigabytes, breaking the "decode is total and safe over
    * corrupt blobs" contract.
    */
  private def pngInflateCap(width: Int, height: Int): Long = {
    val px = width.toLong * height.toLong // w,h <= 2^31 so this fits
    if (px > MaxInflatedBytes) MaxInflatedBytes
    else math.min(2L * (8L * px + height) + 1024L, MaxInflatedBytes)
  }

  /** PNG header AND inflated content in one chunk walk — geometry needs
    * the inflate anyway (data_len is the inflated length), so parsing and
    * content extraction share it. (Unknown, null) on any malformation.
    */
  private def decodePngFull(p: Array[Byte]): (DecodedHeader, Array[Byte]) = {
    def be32(off: Int): Int = ByteBuffer.wrap(p, off, 4).getInt
    if (p.length < 8 + 25) return (Unknown, null)
    var off = 8
    var width = 0; var height = 0
    var firstIdat = -1
    var sawIhdr = false
    val crc = new java.util.zip.CRC32
    while (off + 12 <= p.length) {
      val len = be32(off)
      if (len < 0 || off + 12 + len.toLong > p.length) return (Unknown, null)
      crc.reset()
      crc.update(p, off + 4, 4 + len) // type + data
      if (crc.getValue.toInt != be32(off + 8 + len)) return (Unknown, null)
      val ctype = new String(p, off + 4, 4, US_ASCII)
      ctype match {
        case "IHDR" if len >= 8 =>
          width = be32(off + 8); height = be32(off + 12); sawIhdr = true
        case "IDAT" if firstIdat < 0 => firstIdat = off + 8
        case "IEND" =>
          if (!sawIhdr || width <= 0 || height <= 0 || firstIdat < 0)
            return (Unknown, null)
          val inflated = inflatePngIdat(p, pngInflateCap(width, height))
          if (inflated == null) return (Unknown, null)
          return (DecodedHeader("image/png", width, height, 1L, 0, 0,
            firstIdat, inflated.length.toLong), inflated)
        case _ => // ancillary chunks (tEXt, pHYs, ...) skip
      }
      off += 12 + len
    }
    (Unknown, null) // no IEND — truncated stream
  }

  /** Concatenate all IDAT chunk data and inflate (zlib), refusing to
    * produce more than `maxOut` bytes (geometry-derived cap — see
    * [[pngInflateCap]]). Null on any decompression error, truncation, or
    * cap overrun. CRCs are assumed pre-checked by [[decodePngFull]].
    */
  private def inflatePngIdat(p: Array[Byte], maxOut: Long): Array[Byte] = {
    def be32(off: Int): Int = ByteBuffer.wrap(p, off, 4).getInt
    val deflated = new java.io.ByteArrayOutputStream()
    var off = 8
    while (off + 12 <= p.length) {
      val len = be32(off)
      if (len < 0 || off + 12 + len.toLong > p.length) return null
      if (new String(p, off + 4, 4, US_ASCII) == "IDAT")
        deflated.write(p, off + 8, len)
      off += 12 + len
    }
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(deflated.toByteArray)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) return null // truncated stream
        out.write(buf, 0, n)
        if (out.size().toLong > maxOut) return null // zlib bomb
      }
      out.toByteArray
    } catch {
      case _: java.util.zip.DataFormatException => null
    } finally inf.end()
  }

  /** JPEG: walk 0xFF-prefixed marker segments (big-endian lengths that
    * include their own 2 bytes) to the first SOF0/SOF1/SOF2 frame header,
    * which carries height then width at payload offsets 1/3. The entropy
    * stream needs a full codec; geometry lives in plain markers, so
    * parse-only is honest — the content region is the whole payload.
    */
  private def decodeJpeg(p: Array[Byte]): DecodedHeader = {
    def be16(off: Int): Int =
      ((p(off) & 0xff) << 8) | (p(off + 1) & 0xff)
    var off = 2
    while (off + 2 <= p.length) {
      if ((p(off) & 0xff) != 0xff) return Unknown
      // The spec allows any number of 0xFF fill bytes before the marker
      // byte — genuine encoders emit them as padding. Skip them; the
      // marker is the first non-0xFF after the run.
      var mOff = off + 1
      while (mOff < p.length && (p(mOff) & 0xff) == 0xff) mOff += 1
      if (mOff >= p.length) return Unknown
      val marker = p(mOff) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) ||
        marker == 0x01) {
        off = mOff + 1 // standalone markers carry no length
      } else if (marker == 0xd9) {
        return Unknown // EOI before any SOF
      } else {
        if (mOff + 3 > p.length) return Unknown
        val len = be16(mOff + 1)
        if (len < 2 || mOff + 1 + len > p.length) return Unknown
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
          if (len < 9) return Unknown
          val height = be16(mOff + 4)
          val width = be16(mOff + 6)
          if (width <= 0 || height <= 0) return Unknown
          return DecodedHeader("image/jpeg", width, height, 1L, 0, 0, 0,
            p.length.toLong)
        }
        off = mOff + 1 + len
      }
    }
    Unknown
  }

  // ---- encode (test-fixture and ingestion-side constructors) -----------

  /** Minimal valid 24bpp BMP wrapping `data` as the pixel region. */
  def encodeBmp(width: Int, height: Int, data: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad BMP geometry ${width}x$height")
    val buf = ByteBuffer.allocate(54 + data.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    putLe32(buf, 54 + data.length) // file size
    putLe32(buf, 0)                // reserved
    putLe32(buf, 54)               // pixel-array offset
    putLe32(buf, 40)               // BITMAPINFOHEADER size
    putLe32(buf, width)
    putLe32(buf, height)
    buf.putShort(1.toShort)        // planes
    buf.putShort(24.toShort)       // bpp
    putLe32(buf, 0)                // BI_RGB
    putLe32(buf, data.length)      // image size
    putLe32(buf, 2835)             // x ppm (72 dpi)
    putLe32(buf, 2835)             // y ppm
    putLe32(buf, 0)                // palette colors
    putLe32(buf, 0)                // important colors
    buf.put(data)
    buf.array()
  }

  /** Canonical 44-byte-header PCM WAV wrapping `data` as samples. */
  def encodeWav(channels: Int, sampleRate: Int, bitsPerSample: Int,
                data: Array[Byte]): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && bitsPerSample % 8 == 0,
      s"bad WAV params ch=$channels rate=$sampleRate bits=$bitsPerSample")
    val blockAlign = channels * (bitsPerSample / 8)
    val buf = ByteBuffer.allocate(44 + data.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(US_ASCII))
    putLe32(buf, 36 + data.length)
    buf.put("WAVE".getBytes(US_ASCII))
    buf.put("fmt ".getBytes(US_ASCII))
    putLe32(buf, 16)
    buf.putShort(1.toShort) // PCM
    buf.putShort(channels.toShort)
    putLe32(buf, sampleRate)
    putLe32(buf, sampleRate * blockAlign)
    buf.putShort(blockAlign.toShort)
    buf.putShort(bitsPerSample.toShort)
    buf.put("data".getBytes(US_ASCII))
    putLe32(buf, data.length)
    buf.put(data)
    buf.array()
  }

  /** MJPEG AVI: a genuine RIFF/AVI mux of complete JPEG still frames —
    * `LIST hdrl` (avih + one 'vids'/'MJPG' strl), `LIST movi` with one
    * word-aligned `00dc` chunk per frame, and a standard AVI 1.0 `idx1`
    * (offsets relative to the movi form fourcc, keyframe-flagged — MJPEG
    * frames are all intra). fps rides dwRate/dwScale = fps/1. Decoders
    * that read AVI (this file's [[decodeAvi]] walk included) see real
    * geometry and can slice every frame back out byte-identical.
    */
  def encodeAviMjpeg(width: Int, height: Int, fps: Int,
                     frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && frames.nonEmpty,
      s"bad AVI params ${width}x$height fps=$fps frames=${frames.length}")
    def padded(n: Int): Int = n + (n & 1)
    val moviData = 4 + frames.map(f => 8 + padded(f.length)).sum
    val idx1Data = 16 * frames.length
    val strlData = 4 + 8 + 56 + 8 + 40
    val hdrlData = 4 + 8 + 56 + 8 + strlData
    val riffData = 4 + 8 + hdrlData + 8 + moviData + 8 + idx1Data
    val buf = ByteBuffer.allocate(8 + riffData)
      .order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes(US_ASCII))
    fourcc("RIFF"); putLe32(buf, riffData); fourcc("AVI ")
    fourcc("LIST"); putLe32(buf, hdrlData); fourcc("hdrl")
    fourcc("avih"); putLe32(buf, 56)
    putLe32(buf, 1000000 / fps)           // dwMicroSecPerFrame
    putLe32(buf, 0); putLe32(buf, 0)      // maxBytesPerSec, padding
    putLe32(buf, 0x10)                    // AVIF_HASINDEX
    putLe32(buf, frames.length)           // dwTotalFrames
    putLe32(buf, 0); putLe32(buf, 1)      // initialFrames, dwStreams
    putLe32(buf, 0)                       // suggestedBufferSize
    putLe32(buf, width); putLe32(buf, height)
    (0 until 4).foreach(_ => putLe32(buf, 0)) // dwReserved
    fourcc("LIST"); putLe32(buf, strlData); fourcc("strl")
    fourcc("strh"); putLe32(buf, 56)
    fourcc("vids"); fourcc("MJPG")
    putLe32(buf, 0)                       // dwFlags
    putLe32(buf, 0)                       // wPriority + wLanguage
    putLe32(buf, 0)                       // dwInitialFrames
    putLe32(buf, 1)                       // dwScale
    putLe32(buf, fps)                     // dwRate
    putLe32(buf, 0)                       // dwStart
    putLe32(buf, frames.length)           // dwLength (frames)
    putLe32(buf, 0); putLe32(buf, -1)     // bufferSize, quality
    putLe32(buf, 0)                       // dwSampleSize (varies)
    buf.putShort(0.toShort); buf.putShort(0.toShort)   // rcFrame l,t
    buf.putShort(width.toShort); buf.putShort(height.toShort)
    fourcc("strf"); putLe32(buf, 40)
    putLe32(buf, 40)                      // biSize
    putLe32(buf, width); putLe32(buf, height)
    buf.putShort(1.toShort); buf.putShort(24.toShort)  // planes, bpp
    fourcc("MJPG")                        // biCompression
    putLe32(buf, width * height * 3)      // biSizeImage
    putLe32(buf, 0); putLe32(buf, 0)      // x/y pels per meter
    putLe32(buf, 0); putLe32(buf, 0)      // clrUsed, clrImportant
    fourcc("LIST"); putLe32(buf, moviData)
    val moviFormPos = buf.position()
    fourcc("movi")
    val offsets = frames.map { f =>
      val rel = buf.position() - moviFormPos
      fourcc("00dc"); putLe32(buf, f.length); buf.put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte)
      rel
    }
    fourcc("idx1"); putLe32(buf, idx1Data)
    frames.zip(offsets).foreach { case (f, rel) =>
      fourcc("00dc")
      putLe32(buf, 0x10)                  // AVIIF_KEYFRAME
      putLe32(buf, rel)
      putLe32(buf, f.length)
    }
    buf.array()
  }

  /** Minimal valid ISO-BMFF MP4: ftyp('isom') + moov(mvhd, one video
    * trak with tkhd 16.16 geometry, mdia(mdhd/hdlr'vide'/minf(stbl(stsd
    * 'avc1' visual sample entry, stts, stsz per-sample sizes, stco)))) +
    * mdat carrying `data`. The H.264 bitstream itself is NOT claimed —
    * the mdat payload is opaque, exactly the typed-metadata posture
    * real pipelines take for codecs they do not decode: every metadata
    * field ([[mp4Info]] reads them back) is genuine, the frame bytes
    * are whatever the caller supplies. Samples split `data` evenly
    * (first samples 1 byte longer when it does not divide).
    */
  def encodeMp4Shell(width: Int, height: Int, timescale: Int,
                     duration: Long, nSamples: Int,
                     data: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && timescale > 0 && nSamples > 0,
      s"bad MP4 params ${width}x$height ts=$timescale n=$nSamples")
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Array[Byte] =
      Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte,
        v.toByte)
    def box(btype: String)(body: => Array[Byte]): Array[Byte] = {
      val b = body
      be32(8 + b.length) ++ btype.getBytes(US_ASCII) ++ b
    }
    val sampleSizes = {
      val base = data.length / nSamples
      val extra = data.length % nSamples
      (0 until nSamples).map(i => if (i < extra) base + 1 else base)
    }
    val ftyp = box("ftyp")(
      "isom".getBytes(US_ASCII) ++ be32(0) ++ "isom".getBytes(US_ASCII))
    val mvhd = box("mvhd")(
      be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++
        be32(duration.toInt) ++ be32(0x00010000) ++
        Array[Byte](0x01, 0x00) ++ new Array[Byte](10) ++
        // identity matrix
        be32(0x00010000) ++ be32(0) ++ be32(0) ++
        be32(0) ++ be32(0x00010000) ++ be32(0) ++
        be32(0) ++ be32(0) ++ be32(0x40000000) ++
        new Array[Byte](24) ++ be32(2))            // next_track_ID
    val tkhd = box("tkhd")(
      be32(3) ++ be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++
        be32(duration.toInt) ++ new Array[Byte](8) ++
        new Array[Byte](8) ++                      // layer..volume+pad
        be32(0x00010000) ++ be32(0) ++ be32(0) ++
        be32(0) ++ be32(0x00010000) ++ be32(0) ++
        be32(0) ++ be32(0) ++ be32(0x40000000) ++
        be32(width << 16) ++ be32(height << 16))
    val mdhd = box("mdhd")(
      be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++
        be32(duration.toInt) ++ Array[Byte](0x55, (0xc4 & 0xff).toByte) ++
        Array[Byte](0, 0))
    val hdlr = box("hdlr")(
      be32(0) ++ be32(0) ++ "vide".getBytes(US_ASCII) ++
        new Array[Byte](12) ++ Array[Byte](0))
    val stsd = box("stsd")(be32(0) ++ be32(1) ++ box("avc1") {
      new Array[Byte](6) ++ Array[Byte](0, 1) ++    // data_ref_index
        new Array[Byte](16) ++                      // pre_defined/reserved
        Array[Byte]((width >> 8).toByte, width.toByte,
          (height >> 8).toByte, height.toByte) ++
        be32(0x00480000) ++ be32(0x00480000) ++     // 72 dpi
        be32(0) ++ Array[Byte](0, 1) ++             // frame_count = 1
        new Array[Byte](32) ++                      // compressorname
        Array[Byte](0, 24) ++ Array[Byte](-1, -1)   // depth, pre_defined
    })
    val stts = box("stts")(
      be32(0) ++ be32(1) ++ be32(nSamples) ++
        be32(math.max(1, (duration / nSamples).toInt)))
    val stsz = box("stsz")(
      be32(0) ++ be32(0) ++ be32(nSamples) ++
        sampleSizes.flatMap(be32).toArray)
    // stco chunk offset = absolute mdat data position: everything
    // before mdat's payload is ftyp + moov + mdat header
    val stblNoStco = stsd ++ stts ++ stsz
    def assemble(stcoOff: Int): (Array[Byte], Int) = {
      val stco = box("stco")(be32(0) ++ be32(1) ++ be32(stcoOff))
      val stbl = box("stbl")(stblNoStco ++ stco)
      val dinf = box("dinf")(box("dref")(
        be32(0) ++ be32(1) ++ box("url ")(be32(1))))
      val vmhd = box("vmhd")(be32(1) ++ new Array[Byte](8))
      val minf = box("minf")(vmhd ++ dinf ++ stbl)
      val mdia = box("mdia")(mdhd ++ hdlr ++ minf)
      val trak = box("trak")(tkhd ++ mdia)
      val moov = box("moov")(mvhd ++ trak)
      (moov, ftyp.length + moov.length + 8)
    }
    // moov length does not depend on the stco VALUE (fixed 4-byte
    // field) — assemble once with 0 to learn the offset, then for real
    val (probe, realOff) = assemble(0)
    val (moov, _) = assemble(realOff)
    assert(moov.length == probe.length)
    out.write(ftyp); out.write(moov)
    out.write(box("mdat")(data))
    out.toByteArray
  }

  /** PNG (8-bit grayscale IHDR) wrapping `data` as the IDAT stream. The
    * zlib framing is hand-rolled with STORED deflate blocks, so the
    * compressed length is exactly `n + 11 + 5·(⌈n/65535⌉ − 1)` (header 2
    * + 5 per block + adler 4) — deterministic arithmetic an SQL oracle
    * can mirror, and `Inflater` reads it like any other zlib stream.
    * Chunk CRCs are real CRC32s (decodePng verifies them).
    */
  def encodePng(width: Int, height: Int, data: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad PNG geometry ${width}x$height")
    val crc = new java.util.zip.CRC32
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(ctype: String, body: Array[Byte]): Unit = {
      out.write(be32(body.length), 0, 4)
      val t = ctype.getBytes(US_ASCII)
      out.write(t, 0, 4); out.write(body, 0, body.length)
      crc.reset(); crc.update(t); crc.update(body)
      out.write(be32(crc.getValue.toInt), 0, 4)
    }
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      0, 8)
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte) // bit depth
    ihdr.put(0.toByte) // grayscale
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/none
    chunk("IHDR", ihdr.array())
    chunk("IDAT", zlibStored(data))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** zlib stream with STORED blocks: header 0x78 0x01, ≤65535-byte raw
    * blocks (BFINAL/BTYPE=00, LEN/NLEN little-endian), adler32 trailer.
    */
  private def zlibStored(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x78); out.write(0x01)
    var off = 0
    var done = false
    while (!done) {
      val len = math.min(65535, data.length - off)
      val fin = off + len >= data.length
      out.write(if (fin) 1 else 0)
      out.write(len & 0xff); out.write((len >> 8) & 0xff)
      out.write(~len & 0xff); out.write((~len >> 8) & 0xff)
      out.write(data, off, len)
      off += len
      done = fin
    }
    val ad = new java.util.zip.Adler32
    ad.update(data)
    val v = ad.getValue
    out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
    out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    out.toByteArray
  }

  /** Minimal JPEG container SHELL: SOI + JFIF APP0 + SOF0 geometry +
    * SOS + `data` standing in for the entropy-coded stream + EOI. The
    * marker walk ([[decode]]) parses real geometry out of it; the
    * entropy region is opaque bytes (pixel decode needs a full Huffman
    * + DCT codec), which is exactly the case the decode-coverage
    * surface must report as pixel-undecodable instead of hashing
    * compressed garbage.
    */
  /** Geometry-parseable JPEG container with an OPAQUE entropy stand-in
    * (no DQT/DHT, `data` as the scan bytes) — always undecodable, by
    * design: the fixture for the triage surface. `sofMarker` and
    * `components` select the undecodability CLASS a real crawl shows:
    * the default SOF0/1-component shell reads as a corrupt baseline
    * stream, `sofMarker = 0xc2` as progressive, `components = 4` as
    * CMYK/YCCK — the three buckets `decodeStatus` must tell apart.
    */
  def encodeJpegShell(width: Int, height: Int, data: Array[Byte],
                      sofMarker: Int = 0xc0,
                      components: Int = 1): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
      s"bad JPEG geometry ${width}x$height")
    require(components >= 1 && components <= 4,
      s"components=$components out of [1, 4]")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    marker(0xd8) // SOI
    marker(0xe0) // APP0 "JFIF"
    be16(16)
    out.write("JFIF".getBytes(US_ASCII), 0, 4); out.write(0)
    out.write(1); out.write(1)         // version 1.1
    out.write(0)                       // aspect-ratio units
    be16(1); be16(1)                   // density 1x1
    out.write(0); out.write(0)         // no thumbnail
    marker(sofMarker)                  // SOFn: 8-bit precision
    be16(8 + 3 * components)
    out.write(8)
    be16(height); be16(width)
    out.write(components)
    var c = 0
    while (c < components) {           // id, 1x1 sampling, quant 0
      out.write(c + 1); out.write(0x11); out.write(0)
      c += 1
    }
    marker(0xda) // SOS over every component
    be16(6 + 2 * components)
    out.write(components)
    c = 0
    while (c < components) {
      out.write(c + 1); out.write(0)
      c += 1
    }
    out.write(0); out.write(0x3f); out.write(0)
    out.write(data, 0, data.length)    // opaque entropy stand-in
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Binary PPM (P6) wrapping `data` as the raster. */
  def encodePpm(width: Int, height: Int, data: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad PPM geometry ${width}x$height")
    val header = s"P6\n$width $height\n255\n".getBytes(US_ASCII)
    val out = new Array[Byte](header.length + data.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(data, 0, out, header.length, data.length)
    out
  }
}
