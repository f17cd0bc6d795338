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
