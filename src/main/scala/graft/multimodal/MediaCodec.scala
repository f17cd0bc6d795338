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

  val Unknown: DecodedHeader = DecodedHeader("unknown", 0, 0, 0L, 0, 0L)

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
    else Unknown
  }

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
    DecodedHeader("image/bmp", width, height, 1L, dataOffset,
      (p.length - dataOffset).toLong)
  }

  /** WAV: walk RIFF chunks from byte 12; "fmt " gives channels/bits,
    * "data" gives the sample region. Frames = dataLen / blockAlign.
    */
  private def decodeWav(p: Array[Byte]): DecodedHeader = {
    var off = 12
    var channels = 0
    var bits = 0
    var dataOffset = -1
    var dataLen = 0L
    while (off + 8 <= p.length) {
      val id = new String(p, off, 4, US_ASCII)
      val size = le32(p, off + 4)
      if (size < 0 || off + 8 + size.toLong > Int.MaxValue) return Unknown
      id match {
        case "fmt " if off + 8 + 16 <= p.length =>
          channels = le16(p, off + 10)
          bits = le16(p, off + 22)
        case "data" =>
          dataOffset = off + 8
          dataLen = math.min(size.toLong, (p.length - dataOffset).toLong)
        case _ => // skip unknown chunks (LIST, fact, ...)
      }
      // RIFF chunks are word-aligned: odd sizes carry a pad byte
      off += 8 + size + (size & 1)
    }
    if (channels <= 0 || bits <= 0 || dataOffset < 0) return Unknown
    val blockAlign = channels * (bits / 8)
    if (blockAlign <= 0) return Unknown
    DecodedHeader("audio/wav", 0, 0, dataLen / blockAlign, dataOffset, dataLen)
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
      while (off < p.length && p(off) >= '0' && p(off) <= '9' && v <= Int.MaxValue) {
        v = v * 10 + (p(off) - '0'); off += 1; any = true
      }
      if (any) v else -1L
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 65535 || off >= p.length)
      return Unknown
    off += 1 // the single whitespace separating header from raster
    if (off > p.length) return Unknown
    DecodedHeader("image/ppm", w.toInt, h.toInt, 1L, off,
      (p.length - off).toLong)
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
