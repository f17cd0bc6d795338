package graft.multimodal

/** Pure-JVM BASELINE-SEQUENTIAL JPEG codec (ITU-T T.81): 8-bit,
  * greyscale and YCbCr color (4:4:4 and 4:2:0 chroma subsampling),
  * standard zigzag + canonical Huffman coding, double-precision DCT.
  * Closes the "header walk only" gap for JPEG — real crawled corpora
  * are mostly color JPEG, and a pipeline that can't address their
  * pixels can neither perceptual-hash nor downsample the bulk of a
  * multimodal crawl.
  *
  * Scope: baseline/extended-sequential Huffman (SOF0/1), 1-, 3-, and
  * 4-component frames (greyscale, YCbCr, Adobe CMYK/YCCK via the
  * APP14 transform tag) with sampling factors in {1, 2}, 8-bit
  * samples, restart markers (DRI/RSTn). [[decodeRgb]] additionally
  * dispatches SOF2 streams to [[JpegProgressive]] (spectral selection
  * + successive approximation), covering the progressive crawl tail;
  * arithmetic and hierarchical modes stay out. The decoder reads
  * quantization and Huffman tables FROM THE STREAM (it is not paired
  * to this encoder's choices); anything outside the supported
  * envelope — malformed entropy data included — returns None, never
  * throws (the decode-totality contract of [[MediaCodec]]). The
  * encoder builds real, self-contained fixtures: its output is a
  * spec-conforming JPEG any baseline decoder reads.
  *
  * Scale shape: both directions are per-payload, partition-iterator
  * work — 64 multiplies/pixel-per-component for the O(64²)-per-block
  * DCT, no shuffle, no driver state. Determinism: fixed
  * double-precision cosine tables, fixed standard quantization
  * (scaled by `quality` with the classic 5000/q | 200−2q rule), fixed
  * JFIF color matrices — encode∘decode is a pure function of
  * (pixels, quality, subsampling), spec- and oracle-safe.
  */
object JpegCodec {

  // zigzag index order (T.81 figure A.6): zigzag(k) = raster index of
  // the k-th coefficient in scan order
  private[multimodal] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // standard luminance / chrominance quantization tables (T.81 Annex
  // K.1/K.2), RASTER order here — zigzag applied at emit time
  private[multimodal] val StdLumaQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  private[multimodal] val StdChromaQuant: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // standard luminance DC/AC Huffman specs (T.81 Annex K.3) — the
  // encoder uses this one family for every component (legal: the DHT
  // segment declares what the scan uses); the decoder reads whatever
  // tables the stream carries
  private[multimodal] val DcBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private[multimodal] val DcVals: Array[Int] = (0 to 11).toArray
  private[multimodal] val AcBits: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private[multimodal] val AcVals: Array[Int] = Array(
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
  private[multimodal] val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }
  private[multimodal] def c(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** Canonical Huffman code assignment: (code, length) per value, in
    * the T.81 order (lengths ascending, values in listed order).
    */
  private[multimodal] def canonicalCodes(
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
  private[multimodal] def canonicalDecode(
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

  private[multimodal] def scaledQuant(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.min(100, math.max(1, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map(v => math.min(255, math.max(1, (v * scale + 50) / 100)))
  }

  /** MSB-first bit accumulator with JPEG 0xFF byte stuffing. */
  private[multimodal] final class BitWriter(out: java.io.ByteArrayOutputStream) {
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

  private[multimodal] def magnitudeCategory(v: Int): Int = {
    var a = math.abs(v)
    var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  // ---- encoder core ----------------------------------------------------

  /** Forward DCT + quantization of one level-shifted 8×8 block. */
  private[multimodal] def fdctQuant(block: Array[Double], quant: Array[Int],
                        coef: Array[Int]): Unit = {
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
  }

  /** Entropy-code one quantized block; returns the new DC predictor. */
  private def writeBlock(bw: BitWriter, coef: Array[Int], prevDc: Int,
                         dcCodes: Map[Int, (Int, Int)],
                         acCodes: Map[Int, (Int, Int)]): Int = {
    def putMagnitude(v: Int, cat: Int): Unit =
      if (cat > 0) bw.put(if (v < 0) v + (1 << cat) - 1 else v, cat)
    val dcDiff = coef(0) - prevDc
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
    coef(0)
  }

  /** Load one 8×8 block from a sample plane, edge-replicated, level
    * shifted to [-128, 127].
    */
  private[multimodal] def loadBlock(plane: Array[Byte], pw: Int, ph: Int,
                        bx: Int, by: Int, block: Array[Double]): Unit = {
    var y = 0
    while (y < 8) {
      val sy = math.min(by + y, ph - 1)
      var x = 0
      while (x < 8) {
        val sx = math.min(bx + x, pw - 1)
        block(y * 8 + x) = (plane(sy * pw + sx) & 0xff) - 128.0
        x += 1
      }
      y += 1
    }
  }

  private def writeHeaders(out: java.io.ByteArrayOutputStream,
                           width: Int, height: Int,
                           quants: Seq[Array[Int]],
                           comps: Seq[(Int, Int, Int, Int)],
                           restartInterval: Int = 0,
                           adobeTransform: Option[Int] = None): Unit = {
    // comps: (id, hSamp, vSamp, quantId)
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    adobeTransform.foreach { t =>
      marker(0xee) // APP14 "Adobe": the color-transform tag
      be16(14)
      out.write("Adobe".getBytes(
        java.nio.charset.StandardCharsets.US_ASCII), 0, 5)
      be16(100) // version
      be16(0); be16(0) // flags
      out.write(t)
    }
    quants.zipWithIndex.foreach { case (qt, id) =>
      marker(0xdb)
      be16(2 + 1 + 64)
      out.write(id)
      var zi = 0
      while (zi < 64) { out.write(qt(Zigzag(zi))); zi += 1 }
    }
    marker(0xc0) // SOF0
    be16(8 + 3 * comps.size)
    out.write(8); be16(height); be16(width)
    out.write(comps.size)
    comps.foreach { case (id, hs, vs, qid) =>
      out.write(id); out.write((hs << 4) | vs); out.write(qid)
    }
    def dht(tc: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4)
      be16(2 + 1 + 16 + vals.length)
      out.write(tc << 4)
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    dht(0, DcBits, DcVals)
    dht(1, AcBits, AcVals)
    if (restartInterval > 0) {
      marker(0xdd) // DRI
      be16(4); be16(restartInterval)
    }
    marker(0xda) // SOS: every component reads DC table 0 / AC table 0
    be16(6 + 2 * comps.size)
    out.write(comps.size)
    comps.foreach { case (id, _, _, _) => out.write(id); out.write(0x00) }
    out.write(0); out.write(0x3f); out.write(0)
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
    val quant = scaledQuant(StdLumaQuant, quality)
    val dcCodes = canonicalCodes(DcBits, DcVals)
    val acCodes = canonicalCodes(AcBits, AcVals)
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, width, height, Seq(quant), Seq((1, 1, 1, 0)))
    val bw = new BitWriter(out)
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    var prevDc = 0
    var by = 0
    while (by < height) {
      var bx = 0
      while (bx < width) {
        loadBlock(gray, width, height, bx, by, block)
        fdctQuant(block, quant, coef)
        prevDc = writeBlock(bw, coef, prevDc, dcCodes, acCodes)
        bx += 8
      }
      by += 8
    }
    bw.flushWithOnes()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Encode a 24-bit RGB raster (row-major, 3 bytes/pixel) as a color
    * baseline JPEG: JFIF full-range YCbCr, luminance + chrominance
    * standard quantization, 4:4:4 (`subsample = false`) or 4:2:0
    * (`subsample = true`, chroma averaged over 2×2 blocks).
    */
  def encodeColor(width: Int, height: Int, rgb: Array[Byte],
                  quality: Int = 90,
                  subsample: Boolean = false): Array[Byte] =
    if (subsample)
      encodeColorSampled(width, height, rgb, quality, 2, 2)
    else
      encodeColorSampled(width, height, rgb, quality, 1, 1)

  /** General color encode with explicit luma sampling factors
    * (hSamp, vSamp ∈ {1, 2}: (1,1) = 4:4:4, (2,2) = 4:2:0,
    * (2,1) = 4:2:2) and optional RESTART MARKERS every
    * `restartInterval` MCUs (`0` = none) — the two stream features a
    * real crawl's encoders actually vary. Chroma is box-averaged over
    * each hSamp×vSamp cell.
    */
  def encodeColorSampled(width: Int, height: Int, rgb: Array[Byte],
                         quality: Int, hSamp: Int, vSamp: Int,
                         restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
      s"bad JPEG geometry ${width}x$height")
    require(rgb.length == width * height * 3,
      s"raster length ${rgb.length} != ${width}x${height}x3")
    require(hSamp >= 1 && hSamp <= 2 && vSamp >= 1 && vSamp <= 2,
      s"sampling ${hSamp}x$vSamp out of the baseline envelope")
    require(restartInterval >= 0, "restartInterval must be >= 0")
    // RGB -> full-range YCbCr planes (JFIF)
    val n = width * height
    val yP = new Array[Byte](n)
    val cbFull = new Array[Byte](n)
    val crFull = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val r = rgb(i * 3) & 0xff
      val g = rgb(i * 3 + 1) & 0xff
      val b = rgb(i * 3 + 2) & 0xff
      val y = 0.299 * r + 0.587 * g + 0.114 * b
      val cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
      val cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
      yP(i) = math.min(255, math.max(0, math.round(y).toInt)).toByte
      cbFull(i) = math.min(255, math.max(0, math.round(cb).toInt)).toByte
      crFull(i) = math.min(255, math.max(0, math.round(cr).toInt)).toByte
      i += 1
    }
    // chroma planes box-averaged over hSamp×vSamp cells
    val (cw, ch, cbP, crP) =
      if (hSamp == 1 && vSamp == 1) (width, height, cbFull, crFull)
      else {
        val cw0 = (width + hSamp - 1) / hSamp
        val ch0 = (height + vSamp - 1) / vSamp
        val cb = new Array[Byte](cw0 * ch0)
        val cr = new Array[Byte](cw0 * ch0)
        var cy = 0
        while (cy < ch0) {
          var cx = 0
          while (cx < cw0) {
            var sCb = 0; var sCr = 0; var cnt = 0
            var dy = 0
            while (dy < vSamp) {
              val sy = cy * vSamp + dy
              var dx = 0
              while (dx < hSamp) {
                val sx = cx * hSamp + dx
                if (sx < width && sy < height) {
                  sCb += cbFull(sy * width + sx) & 0xff
                  sCr += crFull(sy * width + sx) & 0xff
                  cnt += 1
                }
                dx += 1
              }
              dy += 1
            }
            cb(cy * cw0 + cx) = ((sCb + cnt / 2) / cnt).toByte
            cr(cy * cw0 + cx) = ((sCr + cnt / 2) / cnt).toByte
            cx += 1
          }
          cy += 1
        }
        (cw0, ch0, cb, cr)
      }
    val lumaQ = scaledQuant(StdLumaQuant, quality)
    val chromaQ = scaledQuant(StdChromaQuant, quality)
    val dcCodes = canonicalCodes(DcBits, DcVals)
    val acCodes = canonicalCodes(AcBits, AcVals)
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, width, height, Seq(lumaQ, chromaQ),
      Seq((1, hSamp, vSamp, 0), (2, 1, 1, 1), (3, 1, 1, 1)),
      restartInterval)
    var bw = new BitWriter(out)
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    var dcY = 0; var dcCb = 0; var dcCr = 0
    val mcuW = 8 * hSamp
    val mcuH = 8 * vSamp
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    var mcuCount = 0
    var rstIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        // restart boundary BEFORE this MCU (never before the first):
        // byte-align, emit RSTn (cycling 0..7), reset DC predictors
        if (restartInterval > 0 && mcuCount > 0 &&
          mcuCount % restartInterval == 0) {
          bw.flushWithOnes()
          out.write(0xff); out.write(0xd0 + (rstIdx & 7))
          rstIdx += 1
          dcY = 0; dcCb = 0; dcCr = 0
          bw = new BitWriter(out)
        }
        // Y blocks (hSamp×vSamp per MCU, raster order within the MCU)
        var byi = 0
        while (byi < vSamp) {
          var bxi = 0
          while (bxi < hSamp) {
            loadBlock(yP, width, height,
              mx * mcuW + bxi * 8, my * mcuH + byi * 8, block)
            fdctQuant(block, lumaQ, coef)
            dcY = writeBlock(bw, coef, dcY, dcCodes, acCodes)
            bxi += 1
          }
          byi += 1
        }
        // one Cb + one Cr block per MCU
        loadBlock(cbP, cw, ch, mx * 8, my * 8, block)
        fdctQuant(block, chromaQ, coef)
        dcCb = writeBlock(bw, coef, dcCb, dcCodes, acCodes)
        loadBlock(crP, cw, ch, mx * 8, my * 8, block)
        fdctQuant(block, chromaQ, coef)
        dcCr = writeBlock(bw, coef, dcCr, dcCodes, acCodes)
        mcuCount += 1
        mx += 1
      }
      my += 1
    }
    bw.flushWithOnes()
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  /** Encode an RGB raster plus a K (black-ink) plane as a 4-component
    * Adobe CMYK (`ycck = false`, APP14 transform 0) or YCCK
    * (`ycck = true`, transform 2) baseline JPEG — the print-workflow
    * fixtures the 4-component decode path needs. Values follow the
    * Adobe INVERTED-ink convention the decoder applies (R = C'·K'/255),
    * so with a flat 255 K plane the stored leading planes are the RGB
    * (CMYK) or JFIF YCbCr (YCCK) values directly.
    */
  def encodeCmyk(width: Int, height: Int, rgb: Array[Byte],
                 k: Array[Byte], quality: Int = 90,
                 ycck: Boolean = false): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
      s"bad JPEG geometry ${width}x$height")
    require(rgb.length == width * height * 3,
      s"raster length ${rgb.length} != ${width}x${height}x3")
    require(k.length == width * height,
      s"K plane length ${k.length} != ${width}x$height")
    val n = width * height
    val p0 = new Array[Byte](n)
    val p1 = new Array[Byte](n)
    val p2 = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val r = rgb(i * 3) & 0xff
      val g = rgb(i * 3 + 1) & 0xff
      val b = rgb(i * 3 + 2) & 0xff
      if (ycck) {
        val y = 0.299 * r + 0.587 * g + 0.114 * b
        val cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        val cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        p0(i) = math.min(255, math.max(0, math.round(y).toInt)).toByte
        p1(i) = math.min(255, math.max(0, math.round(cb).toInt)).toByte
        p2(i) = math.min(255, math.max(0, math.round(cr).toInt)).toByte
      } else {
        p0(i) = r.toByte; p1(i) = g.toByte; p2(i) = b.toByte
      }
      i += 1
    }
    val lumaQ = scaledQuant(StdLumaQuant, quality)
    val chromaQ = scaledQuant(StdChromaQuant, quality)
    val quants = if (ycck) Seq(lumaQ, chromaQ) else Seq(lumaQ)
    // YCCK: chroma-quantize the Cb/Cr planes; CMYK: one table for all
    val compSpecs =
      if (ycck) Seq((1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1), (4, 1, 1, 0))
      else Seq((1, 1, 1, 0), (2, 1, 1, 0), (3, 1, 1, 0), (4, 1, 1, 0))
    val dcCodes = canonicalCodes(DcBits, DcVals)
    val acCodes = canonicalCodes(AcBits, AcVals)
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, width, height, quants, compSpecs,
      adobeTransform = Some(if (ycck) 2 else 0))
    val bw = new BitWriter(out)
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    val planes = Array(p0, p1, p2, k)
    val planeQ = compSpecs.map(s => if (s._4 == 0) lumaQ else chromaQ)
    val prevDc = new Array[Int](4)
    val bwX = (width + 7) / 8
    val bhY = (height + 7) / 8
    var by = 0
    while (by < bhY) {
      var bx = 0
      while (bx < bwX) {
        var ci = 0
        while (ci < 4) {
          loadBlock(planes(ci), width, height, bx * 8, by * 8, block)
          fdctQuant(block, planeQ(ci), coef)
          prevDc(ci) = writeBlock(bw, coef, prevDc(ci), dcCodes, acCodes)
          ci += 1
        }
        bx += 1
      }
      by += 1
    }
    bw.flushWithOnes()
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  // ---- decoder ---------------------------------------------------------

  /** Decode a baseline greyscale OR color JPEG to (width, height,
    * row-major RGB raster, 3 bytes/pixel; greyscale replicates the
    * grey value). None for anything outside the supported envelope —
    * never throws.
    */
  def decodeRgb(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    try {
      decodeInner(p).orElse {
        // baseline path refuses SOF2 streams; hand those to the
        // progressive decoder (the ~8–10% crawl tail)
        if (sniffSof(p).exists(_._1 == 0xc2)) JpegProgressive.decode(p)
        else None
      }
    }
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Single-component (greyscale) decode to a 1-byte/pixel raster;
    * None for color streams (use [[decodeRgb]]) or unsupported input.
    */
  def decodeGray(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val isGray =
      try sniffSof(p).exists { case (sof, comps) =>
        (sof == 0xc0 || sof == 0xc1 || sof == 0xc2) && comps == 1
      }
      catch { case scala.util.control.NonFatal(_) => false }
    if (!isGray) None
    else decodeRgb(p).map { case (w, h, rgb) =>
      val g = new Array[Byte](w * h)
      var i = 0
      while (i < g.length) { g(i) = rgb(i * 3); i += 1 }
      (w, h, g)
    }
  }

  /** Frame classification for triage: the first SOFn marker and its
    * component count, walking the segment chain like the decoder does
    * (entropy-free — safe on arbitrary crawl bytes). This is what lets
    * a decode-coverage report split "implement SOF2" (progressive,
    * ~8–10% of a real crawl) from "drop the file" (corrupt stream) from
    * "needs a color transform" (4-component CMYK/YCCK) instead of one
    * undifferentiated failure bucket. None when the payload is not a
    * JPEG or no SOF segment survives before SOS/EOI/truncation.
    */
  def sniffSof(p: Array[Byte]): Option[(Int, Int)] = {
    if (p == null || p.length < 4 ||
      (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) return None
    def be16(off: Int): Int = ((p(off) & 0xff) << 8) | (p(off + 1) & 0xff)
    val sofMarkers = Set(0xc0, 0xc1, 0xc2, 0xc3, 0xc5, 0xc6, 0xc7,
      0xc9, 0xca, 0xcb, 0xcd, 0xce, 0xcf)
    var off = 2
    while (off + 4 <= p.length) {
      if ((p(off) & 0xff) != 0xff) return None
      var mOff = off + 1
      while (mOff < p.length && (p(mOff) & 0xff) == 0xff) mOff += 1
      if (mOff + 2 >= p.length) return None
      val m = p(mOff) & 0xff
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) off = mOff + 1
      else if (m == 0xd9 || m == 0xda) return None
      else {
        val len = be16(mOff + 1)
        if (len < 2 || mOff + 1 + len > p.length) return None
        if (sofMarkers(m)) {
          if (len < 9) return None
          return Some((m, p(mOff + 3 + 5) & 0xff))
        }
        off = mOff + 1 + len
      }
    }
    None
  }

  private def decodeInner(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (p == null || p.length < 4 ||
      (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) return None
    def be16(off: Int): Int = ((p(off) & 0xff) << 8) | (p(off + 1) & 0xff)
    var off = 2
    var width = 0
    var height = 0
    val quantZig = new Array[Array[Int]](4)
    val dcTables = new Array[Map[(Int, Int), Int]](4)
    val acTables = new Array[Map[(Int, Int), Int]](4)
    // per component: id, hSamp, vSamp, quantId, dcId, acId
    var compIds: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var compDc: Array[Int] = null
    var compAc: Array[Int] = null
    var restartInterval = 0
    // Adobe APP14 color-transform tag: -1 = absent, 0 = raw CMYK,
    // 1 = YCbCr, 2 = YCCK — decides how a 4-component frame's planes
    // map to RGB
    var adobeTransform = -1
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
              if (pq != 0 || tq > 3) return None
              if (q + 1 + 64 > mOff + 1 + len) return None
              val tbl = new Array[Int](64)
              var i = 0
              while (i < 64) { tbl(i) = p(q + 1 + i) & 0xff; i += 1 }
              quantZig(tq) = tbl
              q += 65
            }
          case 0xc4 => // DHT: possibly several tables per segment
            var q = seg
            while (q < mOff + 1 + len) {
              val tc = (p(q) & 0xff) >> 4
              val th = p(q) & 0x0f
              if (tc > 1 || th > 3) return None
              if (q + 17 > mOff + 1 + len) return None
              val bits = Array.tabulate(16)(i => p(q + 1 + i) & 0xff)
              val cnt = bits.sum
              if (q + 17 + cnt > mOff + 1 + len) return None
              val vals = Array.tabulate(cnt)(i => p(q + 17 + i) & 0xff)
              val tbl = canonicalDecode(bits, vals)
              if (tc == 0) dcTables(th) = tbl else acTables(th) = tbl
              q += 17 + cnt
            }
          case 0xc0 | 0xc1 => // baseline / extended-sequential SOF
            if (len < 9) return None
            if ((p(seg) & 0xff) != 8) return None
            height = be16(seg + 1); width = be16(seg + 3)
            val ncomp = p(seg + 5) & 0xff
            if (ncomp != 1 && ncomp != 3 && ncomp != 4) return None
            if (len < 8 + 3 * ncomp) return None
            compIds = new Array[Int](ncomp)
            compH = new Array[Int](ncomp)
            compV = new Array[Int](ncomp)
            compQ = new Array[Int](ncomp)
            var ci = 0
            while (ci < ncomp) {
              val base = seg + 6 + 3 * ci
              compIds(ci) = p(base) & 0xff
              compH(ci) = (p(base + 1) & 0xff) >> 4
              compV(ci) = p(base + 1) & 0x0f
              compQ(ci) = p(base + 2) & 0xff
              if (compH(ci) < 1 || compH(ci) > 2 ||
                compV(ci) < 1 || compV(ci) > 2 || compQ(ci) > 3) return None
              ci += 1
            }
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            return None // progressive / arithmetic / hierarchical
          case 0xda => // SOS
            if (compIds == null) return None
            val ns = p(seg) & 0xff
            if (ns != compIds.length) return None
            if (len < 6 + 2 * ns) return None
            compDc = new Array[Int](ns)
            compAc = new Array[Int](ns)
            var si = 0
            while (si < ns) {
              val cid = p(seg + 1 + 2 * si) & 0xff
              val ci = compIds.indexOf(cid)
              if (ci < 0) return None
              compDc(ci) = (p(seg + 2 + 2 * si) & 0xff) >> 4
              compAc(ci) = p(seg + 2 + 2 * si) & 0x0f
              if (compDc(ci) > 3 || compAc(ci) > 3) return None
              si += 1
            }
            scanStart = mOff + 1 + len
          case 0xdd => // DRI: restart interval in MCUs
            if (len != 4) return None
            restartInterval = be16(seg)
          case 0xee => // APP14 "Adobe": color-transform tag
            if (len >= 14 &&
              p(seg) == 'A' && p(seg + 1) == 'd' && p(seg + 2) == 'o' &&
              p(seg + 3) == 'b' && p(seg + 4) == 'e')
              adobeTransform = p(seg + 11) & 0xff
          case _ => // APPn / COM / others: skip
        }
        if (scanStart < 0) off = mOff + 1 + len
      }
    }
    val ncomp = compIds.length
    if (width <= 0 || height <= 0) return None
    // decode-bomb guard (the PNG zlib-cap discipline): the SOF header
    // alone dictates plane allocation, so a 9-byte forgery declaring
    // 32768×32768 would commit gigabytes per task BEFORE any entropy
    // byte is validated. 64 MPx ≈ 192 MB of RGB — beyond any honest
    // fixture, far below an allocation bomb.
    if (width.toLong * height > (1L << 26)) return None
    var ci = 0
    while (ci < ncomp) {
      if (quantZig(compQ(ci)) == null ||
        dcTables(compDc(ci)) == null || acTables(compAc(ci)) == null)
        return None
      ci += 1
    }
    // dequantization tables back in raster order, per component
    val quant = Array.tabulate(ncomp) { i =>
      val z = quantZig(compQ(i))
      val t = new Array[Int](64)
      var zi = 0
      while (zi < 64) { t(Zigzag(zi)) = z(zi); zi += 1 }
      t
    }
    val hMax = compH.max
    val vMax = compV.max
    val mcuW = 8 * hMax
    val mcuH = 8 * vMax
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    // sample planes, MCU-padded
    val planeW = Array.tabulate(ncomp)(i => mcusX * compH(i) * 8)
    val planeH = Array.tabulate(ncomp)(i => mcusY * compV(i) * 8)
    val planes = Array.tabulate(ncomp)(i => new Array[Byte](
      planeW(i) * planeH(i)))

    // entropy reader: unstuffs 0xFF00, stops at any other marker
    var pos = scanStart
    var bitBuf = 0
    var bitCnt = 0
    var exhausted = false
    def nextBit(): Int = {
      if (bitCnt == 0) {
        if (pos >= p.length) { exhausted = true; return 0 }
        val b = p(pos) & 0xff
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

    // restart boundary: byte-align, consume the RSTn marker (D0–D7),
    // reset every DC predictor — mirrors the encoder's emission
    def consumeRestart(): Boolean = {
      bitCnt = 0
      // a 1-padded final entropy byte of 0xFF carries a stuffed 0x00
      // the bit reader never consumed — skip it before the marker
      if (pos < p.length && (p(pos) & 0xff) == 0x00) pos += 1
      if (pos + 2 > p.length) return false
      if ((p(pos) & 0xff) != 0xff) return false
      val m = p(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return false
      pos += 2
      true
    }
    val coef = new Array[Int](64)
    val prevDc = new Array[Int](ncomp)
    var mcuCount = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcuCount > 0 &&
          mcuCount % restartInterval == 0) {
          if (!consumeRestart()) return None
          java.util.Arrays.fill(prevDc, 0)
        }
        ci = 0
        while (ci < ncomp) {
          val dcTbl = dcTables(compDc(ci))
          val acTbl = acTables(compAc(ci))
          val qt = quant(ci)
          var byi = 0
          while (byi < compV(ci)) {
            var bxi = 0
            while (bxi < compH(ci)) {
              java.util.Arrays.fill(coef, 0)
              val dcSym = readCode(dcTbl)
              if (dcSym < 0) return None
              prevDc(ci) += readMagnitude(dcSym)
              coef(0) = prevDc(ci) * qt(0)
              var k = 1
              while (k < 64) {
                val sym = readCode(acTbl)
                if (sym < 0) return None
                if (sym == 0x00) k = 64 // EOB
                else if (sym == 0xf0) k += 16 // ZRL
                else {
                  k += (sym >> 4)
                  if (k > 63) return None
                  val idx = Zigzag(k)
                  coef(idx) = readMagnitude(sym & 0x0f) * qt(idx)
                  k += 1
                }
              }
              if (exhausted) return None
              // inverse DCT + level shift + clamp into the plane
              val ox0 = mx * compH(ci) * 8 + bxi * 8
              val oy0 = my * compV(ci) * 8 + byi * 8
              val pw = planeW(ci)
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
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
                  planes(ci)((oy0 + y) * pw + (ox0 + x)) =
                    math.min(255, math.max(0, px)).toByte
                  x += 1
                }
                y += 1
              }
              bxi += 1
            }
            byi += 1
          }
          ci += 1
        }
        mcuCount += 1
        mx += 1
      }
      my += 1
    }
    // assemble RGB with nearest-sample chroma upsampling
    val out = new Array[Byte](width * height * 3)
    if (ncomp == 1) {
      val pw = planeW(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val g = planes(0)(y * pw + x)
          val o = (y * width + x) * 3
          out(o) = g; out(o + 1) = g; out(o + 2) = g
          x += 1
        }
        y += 1
      }
    } else if (ncomp == 3) {
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          def sample(i: Int): Int = {
            val sx = x * compH(i) / hMax
            val sy = y * compV(i) / vMax
            planes(i)(sy * planeW(i) + sx) & 0xff
          }
          val yv = sample(0).toDouble
          val cb = sample(1) - 128.0
          val cr = sample(2) - 128.0
          val o = (y * width + x) * 3
          def clamp(d: Double): Byte =
            math.min(255, math.max(0, math.round(d).toInt)).toByte
          out(o) = clamp(yv + 1.402 * cr)
          out(o + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp(yv + 1.772 * cb)
          x += 1
        }
        y += 1
      }
    } else {
      // 4-component Adobe CMYK/YCCK (the print-workflow tail of a real
      // crawl). Adobe stores INVERTED ink values (the libjpeg
      // convention): plain CMYK maps R = C'·K'/255 directly; YCCK
      // (transform 2) first runs the YCbCr math on the leading three
      // planes, then multiplies by K'. An absent APP14 on a 4-comp
      // frame is treated as raw CMYK (transform 0), also per libjpeg.
      val ycck = adobeTransform == 2
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          def sample(i: Int): Int = {
            val sx = x * compH(i) / hMax
            val sy = y * compV(i) / vMax
            planes(i)(sy * planeW(i) + sx) & 0xff
          }
          def clamp(d: Double): Double =
            math.min(255.0, math.max(0.0, d))
          val k = sample(3).toDouble
          val (c0, m0, y0) =
            if (ycck) {
              val yv = sample(0).toDouble
              val cb = sample(1) - 128.0
              val cr = sample(2) - 128.0
              (clamp(yv + 1.402 * cr),
                clamp(yv - 0.344136 * cb - 0.714136 * cr),
                clamp(yv + 1.772 * cb))
            } else
              (sample(0).toDouble, sample(1).toDouble, sample(2).toDouble)
          val o = (y * width + x) * 3
          def px(v: Double): Byte =
            math.min(255, math.max(0, math.round(v * k / 255.0).toInt)).toByte
          out(o) = px(c0)
          out(o + 1) = px(m0)
          out(o + 2) = px(y0)
          x += 1
        }
        y += 1
      }
    }
    Some((width, height, out))
  }
}
