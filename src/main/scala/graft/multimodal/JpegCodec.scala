package graft.multimodal

/** Pure-JVM BASELINE-SEQUENTIAL greyscale JPEG codec (ITU-T T.81):
  * 8-bit, one component, standard zigzag + canonical Huffman coding,
  * double-precision DCT. Closes the "header walk only" gap for JPEG —
  * real crawled corpora are mostly JPEG, and a pipeline that can't
  * address their pixels can neither perceptual-hash nor downsample
  * the bulk of a multimodal crawl.
  *
  * Scope is deliberate: baseline (SOF0), greyscale (1 component),
  * 8-bit, no restart markers, no progressive/arithmetic modes. The
  * decoder reads quant + Huffman tables FROM THE STREAM (it is not
  * paired to this encoder's choices); anything outside the supported
  * envelope — multi-component color, SOF2 progressive, malformed
  * entropy data — returns None, never throws (the decode-totality
  * contract of [[MediaCodec]]). The encoder exists to build real,
  * self-contained fixtures: its output is a spec-conforming JPEG any
  * baseline decoder reads.
  *
  * Scale shape: both directions are per-payload, partition-iterator
  * work — 64 multiplies/pixel for the O(64²)-per-block DCT, no
  * shuffle, no driver state. Determinism: fixed double-precision
  * cosine tables, fixed standard quantization (scaled by `quality`
  * with the classic 5000/q | 200−2q rule), so encode∘decode is a pure
  * function of (pixels, quality) — spec- and oracle-safe.
  */
object JpegCodec {

  // zigzag index order (T.81 figure A.6): zigzag(k) = raster index of
  // the k-th coefficient in scan order
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // standard luminance quantization table (T.81 Annex K.1), zigzag order
  // applied at emit time — stored here in RASTER order
  private val StdLumaQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  // standard luminance DC/AC Huffman specs (T.81 Annex K.3):
  // counts[i] = number of codes of length i+1, then the value list
  private val DcBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Int] = (0 to 11).toArray
  private val AcBits: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  // DCT basis: cos((2x+1)·u·π/16) — one shared 8×8 table
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }
  private def c(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** Canonical Huffman code assignment: (code, length) per value, in
    * the T.81 order (lengths ascending, values in listed order).
    */
  private def canonicalCodes(
      bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    val out = Map.newBuilder[Int, (Int, Int)]
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out += vals(k) -> ((code, len))
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out.result()
  }

  /** Decoder-side canonical table: (length, code) -> value. */
  private def canonicalDecode(
      bits: Array[Int], vals: Array[Int]): Map[(Int, Int), Int] = {
    val out = Map.newBuilder[(Int, Int), Int]
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out += (len, code) -> vals(k)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out.result()
  }

  private def quantTable(quality: Int): Array[Int] = {
    val q = math.min(100, math.max(1, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    StdLumaQuant.map { v =>
      math.min(255, math.max(1, (v * scale + 50) / 100))
    }
  }

  /** MSB-first bit accumulator with JPEG 0xFF byte stuffing. */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(value: Int, length: Int): Unit = {
      var i = length - 1
      while (i >= 0) {
        acc = (acc << 1) | ((value >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flushWithOnes(): Unit =
      if (nbits > 0) { put(0x7f, 8 - nbits); () }
  }

  private def magnitudeCategory(v: Int): Int = {
    var a = math.abs(v)
    var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** Encode an 8-bit greyscale raster (row-major, w·h bytes) as a
    * baseline JPEG. Edge blocks replicate their border pixels.
    */
  def encodeGray(width: Int, height: Int, gray: Array[Byte],
                 quality: Int = 90): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
      s"bad JPEG geometry ${width}x$height")
    require(gray.length == width * height,
      s"raster length ${gray.length} != ${width}x$height")
    val quant = quantTable(quality)
    val dcCodes = canonicalCodes(DcBits, DcVals)
    val acCodes = canonicalCodes(AcBits, AcVals)
    val out = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xdb) // DQT, table 0, 8-bit, zigzag order
    be16(2 + 1 + 64)
    out.write(0x00)
    var zi = 0
    while (zi < 64) { out.write(quant(Zigzag(zi))); zi += 1 }
    marker(0xc0) // SOF0: 8-bit, 1 component, 1x1 sampling, quant 0
    be16(11)
    out.write(8); be16(height); be16(width)
    out.write(1); out.write(1); out.write(0x11); out.write(0)
    def dht(tc: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4)
      be16(2 + 1 + 16 + vals.length)
      out.write(tc << 4) // class (0 DC / 1 AC), id 0
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    dht(0, DcBits, DcVals)
    dht(1, AcBits, AcVals)
    marker(0xda) // SOS: 1 component, DC table 0 / AC table 0
    be16(8)
    out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(0x3f); out.write(0)
    val bw = new BitWriter(out)
    def putMagnitude(v: Int, cat: Int): Unit =
      if (cat > 0) bw.put(if (v < 0) v + (1 << cat) - 1 else v, cat)
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    var prevDc = 0
    var by = 0
    while (by < height) {
      var bx = 0
      while (bx < width) {
        // load + level shift, edge-replicated
        var y = 0
        while (y < 8) {
          val sy = math.min(by + y, height - 1)
          var x = 0
          while (x < 8) {
            val sx = math.min(bx + x, width - 1)
            block(y * 8 + x) = (gray(sy * width + sx) & 0xff) - 128.0
            x += 1
          }
          y += 1
        }
        // forward DCT + quantize
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            var s = 0.0
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                s += block(yy * 8 + xx) * Cos(xx)(u) * Cos(yy)(v)
                xx += 1
              }
              yy += 1
            }
            val f = 0.25 * c(u) * c(v) * s
            val idx = v * 8 + u
            coef(idx) = math.round(f / quant(idx)).toInt
            u += 1
          }
          v += 1
        }
        // entropy-code the block in zigzag order
        val dcDiff = coef(0) - prevDc
        prevDc = coef(0)
        val dcCat = magnitudeCategory(dcDiff)
        val (dcCode, dcLen) = dcCodes(dcCat)
        bw.put(dcCode, dcLen)
        putMagnitude(dcDiff, dcCat)
        var run = 0
        var k = 1
        while (k < 64) {
          val ac = coef(Zigzag(k))
          if (ac == 0) run += 1
          else {
            while (run > 15) {
              val (z, zl) = acCodes(0xf0); bw.put(z, zl); run -= 16
            }
            val cat = magnitudeCategory(ac)
            val (cd, cl) = acCodes((run << 4) | cat)
            bw.put(cd, cl)
            putMagnitude(ac, cat)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (e, el) = acCodes(0x00); bw.put(e, el) }
        bx += 8
      }
      by += 8
    }
    bw.flushWithOnes()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Decode a baseline greyscale JPEG to (width, height, row-major
    * 8-bit raster). None for anything outside the supported envelope
    * (color, progressive, missing tables, truncated/invalid entropy
    * data) — never throws.
    */
  def decodeGray(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    try decodeGrayInner(p)
    catch { case scala.util.control.NonFatal(_) => None }
  }

  private def decodeGrayInner(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (p == null || p.length < 4 ||
      (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) return None
    def be16(off: Int): Int = ((p(off) & 0xff) << 8) | (p(off + 1) & 0xff)
    var off = 2
    var width = 0
    var height = 0
    var quantZig: Array[Int] = null   // zigzag-order table as streamed
    var dcTable: Map[(Int, Int), Int] = null
    var acTable: Map[(Int, Int), Int] = null
    var sofQuantId = -1
    var scanStart = -1
    while (scanStart < 0) {
      if (off + 2 > p.length) return None
      if ((p(off) & 0xff) != 0xff) return None
      var mOff = off + 1
      while (mOff < p.length && (p(mOff) & 0xff) == 0xff) mOff += 1
      if (mOff >= p.length) return None
      val m = p(mOff) & 0xff
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
        off = mOff + 1
      } else if (m == 0xd9) {
        return None // EOI before a scan
      } else {
        if (mOff + 3 > p.length) return None
        val len = be16(mOff + 1)
        if (len < 2 || mOff + 1 + len > p.length) return None
        val seg = mOff + 3
        m match {
          case 0xdb => // DQT: possibly several tables per segment
            var q = seg
            while (q < mOff + 1 + len) {
              val pq = (p(q) & 0xff) >> 4
              val tq = p(q) & 0x0f
              if (pq != 0) return None // 16-bit tables unsupported
              if (q + 1 + 64 > mOff + 1 + len) return None
              if (tq == 0 || quantZig == null) {
                quantZig = new Array[Int](64)
                var i = 0
                while (i < 64) { quantZig(i) = p(q + 1 + i) & 0xff; i += 1 }
              }
              q += 65
            }
          case 0xc4 => // DHT: possibly several tables per segment
            var q = seg
            while (q < mOff + 1 + len) {
              val tc = (p(q) & 0xff) >> 4
              if (q + 17 > mOff + 1 + len) return None
              val bits = Array.tabulate(16)(i => p(q + 1 + i) & 0xff)
              val n = bits.sum
              if (q + 17 + n > mOff + 1 + len) return None
              val vals = Array.tabulate(n)(i => p(q + 17 + i) & 0xff)
              val tbl = canonicalDecode(bits, vals)
              if (tc == 0) dcTable = tbl else acTable = tbl
              q += 17 + n
            }
          case 0xc0 | 0xc1 => // baseline / extended-sequential SOF
            if (len < 9) return None
            if ((p(seg) & 0xff) != 8) return None
            height = be16(seg + 1); width = be16(seg + 3)
            val ncomp = p(seg + 5) & 0xff
            if (ncomp != 1) return None // greyscale only
            sofQuantId = p(seg + 8) & 0xff
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            return None // progressive / arithmetic / hierarchical
          case 0xda => // SOS
            if ((p(seg) & 0xff) != 1) return None
            scanStart = mOff + 1 + len
          case 0xdd =>
            return None // DRI: restart intervals unsupported
          case _ => // APPn / COM / others: skip
        }
        if (scanStart < 0) off = mOff + 1 + len
      }
    }
    if (width <= 0 || height <= 0 || quantZig == null ||
      dcTable == null || acTable == null) return None
    // dequantization table back in raster order
    val quant = new Array[Int](64)
    var zi = 0
    while (zi < 64) { quant(Zigzag(zi)) = quantZig(zi); zi += 1 }

    // entropy reader: unstuffs 0xFF00, stops at any other marker
    var pos = scanStart
    var bitBuf = 0
    var bitCnt = 0
    var exhausted = false
    def nextBit(): Int = {
      if (bitCnt == 0) {
        if (pos >= p.length) { exhausted = true; return 0 }
        var b = p(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= p.length) { exhausted = true; return 0 }
          val nb = p(pos) & 0xff
          if (nb == 0x00) pos += 1
          else { exhausted = true; return 0 } // a marker ends the scan
        }
        bitBuf = b; bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }
    def readCode(tbl: Map[(Int, Int), Int]): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        code = (code << 1) | nextBit()
        len += 1
        if (exhausted) return -1
        tbl.get((len, code)) match {
          case Some(v) => return v
          case None =>
        }
      }
      -1
    }
    def readMagnitude(cat: Int): Int = {
      if (cat == 0) return 0
      var v = 0
      var i = 0
      while (i < cat) { v = (v << 1) | nextBit(); i += 1 }
      if (exhausted) 0
      else if (v < (1 << (cat - 1))) v - (1 << cat) + 1
      else v
    }

    val out = new Array[Byte](width * height)
    val coef = new Array[Int](64)
    var prevDc = 0
    var by = 0
    while (by < height) {
      var bx = 0
      while (bx < width) {
        java.util.Arrays.fill(coef, 0)
        val dcSym = readCode(dcTable)
        if (dcSym < 0) return None
        prevDc += readMagnitude(dcSym)
        coef(0) = prevDc * quant(0)
        var k = 1
        while (k < 64) {
          val sym = readCode(acTable)
          if (sym < 0) return None
          if (sym == 0x00) k = 64 // EOB
          else if (sym == 0xf0) k += 16 // ZRL
          else {
            k += (sym >> 4)
            if (k > 63) return None
            val idx = Zigzag(k)
            coef(idx) = readMagnitude(sym & 0x0f) * quant(idx)
            k += 1
          }
        }
        if (exhausted) return None
        // inverse DCT + level shift + clamp
        var y = 0
        while (y < 8) {
          val oy = by + y
          var x = 0
          while (x < 8) {
            val ox = bx + x
            if (oy < height && ox < width) {
              var s = 0.0
              var v = 0
              while (v < 8) {
                var u = 0
                while (u < 8) {
                  s += c(u) * c(v) * coef(v * 8 + u) * Cos(x)(u) * Cos(y)(v)
                  u += 1
                }
                v += 1
              }
              val px = math.round(0.25 * s + 128.0).toInt
              out(oy * width + ox) =
                math.min(255, math.max(0, px)).toByte
            }
            x += 1
          }
          y += 1
        }
        bx += 8
      }
      by += 8
    }
    Some((width, height, out))
  }
}
