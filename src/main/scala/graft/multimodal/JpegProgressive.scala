package graft.multimodal

/** Pure-JVM PROGRESSIVE JPEG codec (ITU-T T.81 Annex G, Huffman,
  * SOF2): spectral selection AND successive approximation, both
  * directions. Closes the largest remaining slice of the real-crawl
  * JPEG tail — ~8–10% of crawled JPEGs are progressive, and until now
  * they were triage-classified ("progressive jpeg (SOF2) not
  * supported") instead of decoded into the perceptual-hash /
  * downsample surfaces.
  *
  * Decoder scope: SOF2, 8-bit, 1 or 3 components, sampling factors in
  * {1, 2}, any legal scan script (interleaved DC scans, single-
  * component AC scans, EOB runs, successive-approximation refinement
  * of both DC and AC, DHT/DQT/DRI redefinition between scans, restart
  * markers). Arithmetic coding, 4-component CMYK, and hierarchical
  * modes stay out (reported distinctly by `Multimodal.decodeStatus`).
  * Anything malformed returns None, never throws — the decode-totality
  * contract of [[MediaCodec]]. The coefficient store is bounded by the
  * same 64 MPx decode-bomb guard as the baseline decoder, applied
  * BEFORE allocation.
  *
  * Encoder scope: greyscale and 4:4:4 color fixtures with a
  * six-stage scan script exercising every decoder path — DC first at
  * Al=1, two spectral AC bands at Al=2, an AC refinement at Ah=2→Al=1,
  * a DC refinement, and a final AC refinement to Al=0. AC scans use a
  * flat 9-bit Huffman table carrying the full EOB-run symbol family
  * (0x00–0xF0), so multi-block EOB runs with attached correction bits
  * are emitted and decoded for real, not just code-pathed.
  *
  * Scale shape: per-payload partition-iterator work like the baseline
  * codec — no shuffle, no driver state; a progressive decode costs one
  * coefficient pass per scan (bounded at 100 scans) plus the same
  * IDCT as baseline. Determinism: fixed tables and double-precision
  * DCT — encode∘decode is a pure function of (pixels, quality).
  */
object JpegProgressive {
  import JpegCodec.{Zigzag, Cos, c, canonicalCodes, canonicalDecode,
    scaledQuant, magnitudeCategory, StdLumaQuant, StdChromaQuant,
    DcBits, DcVals}

  // Flat AC Huffman spec for progressive scans: every (run, size)
  // symbol the scans can emit — the 16-symbol EOB/ZRL family 0x00–0xF0
  // plus run 0–15 × size 1–10 — all at 9 bits (176 < 511 codes, the
  // all-ones code stays unused as T.81 requires). Compression is not
  // the fixture's job; total symbol coverage is.
  private val FlatAcBits: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0)
  private val FlatAcVals: Array[Int] =
    (0 to 15).map(_ << 4).toArray ++
      (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s).toArray

  // ---- decoder ---------------------------------------------------------

  /** Decode a progressive (SOF2) greyscale or color JPEG to (width,
    * height, row-major RGB). None outside the envelope — never throws.
    */
  def decode(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    try inner(p)
    catch { case scala.util.control.NonFatal(_) => None }
  }

  private def inner(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (p == null || p.length < 4 ||
      (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) return None
    def be16(off: Int): Int = ((p(off) & 0xff) << 8) | (p(off + 1) & 0xff)
    var off = 2
    var width = 0
    var height = 0
    val quantZig = new Array[Array[Int]](4)
    val dcTables = new Array[Map[(Int, Int), Int]](4)
    val acTables = new Array[Map[(Int, Int), Int]](4)
    var compIds: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var restartInterval = 0
    // per component: zigzag-order coefficient store over the
    // MCU-padded block grid, filled in scan by scan
    var coefs: Array[Array[Int]] = null
    var blocksPerRow: Array[Int] = null // padded grid width in blocks
    var trueBw: Array[Int] = null // non-interleaved (true) grid
    var trueBh: Array[Int] = null
    var mcusX = 0
    var mcusY = 0
    var hMax = 1
    var vMax = 1
    var nScans = 0
    var sawEoi = false

    // ---- one scan's entropy decode; returns offset of the next
    // marker's 0xFF, or -1 on malformed data ----
    def decodeScan(scanCis: Array[Int], scanDc: Array[Int],
                   scanAc: Array[Int], ss: Int, se: Int,
                   ah: Int, al: Int, scanStart: Int): Int = {
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
      def readBits(n: Int): Int = {
        var v = 0
        var i = 0
        while (i < n) { v = (v << 1) | nextBit(); i += 1 }
        v
      }
      def readCode(tbl: Map[(Int, Int), Int]): Int = {
        if (tbl == null) return -1
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
      def extend(v: Int, cat: Int): Int =
        if (cat == 0) 0
        else if (v < (1 << (cat - 1))) v - (1 << cat) + 1
        else v
      def consumeRestart(): Boolean = {
        bitCnt = 0
        if (pos < p.length && (p(pos) & 0xff) == 0x00) pos += 1
        if (pos + 2 > p.length) return false
        if ((p(pos) & 0xff) != 0xff) return false
        val m = p(pos + 1) & 0xff
        if (m < 0xd0 || m > 0xd7) return false
        pos += 2
        true
      }

      val ns = scanCis.length
      val p1 = 1 << al
      val m1 = -1 << al
      val prevDc = new Array[Int](ns)
      var eobrun = 0
      var ok = true

      // ---- per-block workers over the zigzag store ----
      def dcFirstBlock(si: Int, base: Int): Unit = {
        val s = readCode(dcTables(scanDc(si)))
        if (s < 0 || s > 15) { ok = false; return }
        val diff = extend(readBits(s), s)
        prevDc(si) += diff
        coefs(scanCis(si))(base) = prevDc(si) << al
      }
      def dcRefineBlock(si: Int, base: Int): Unit =
        if (nextBit() == 1)
          coefs(scanCis(si))(base) = coefs(scanCis(si))(base) | p1
      def acFirstBlock(co: Array[Int], base: Int): Unit = {
        if (eobrun > 0) { eobrun -= 1; return }
        var k = ss
        var done = false
        while (!done && k <= se) {
          val rs = readCode(acTables(scanAc(0)))
          if (rs < 0) { ok = false; return }
          val r = rs >> 4
          val s = rs & 15
          if (s != 0) {
            k += r
            if (k > se) { ok = false; return }
            co(base + k) = extend(readBits(s), s) << al
            k += 1
          } else if (r != 15) {
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += readBits(r)
            done = true
          } else k += 16 // ZRL
        }
      }
      def acRefineBlock(co: Array[Int], base: Int): Unit = {
        def correct(k: Int): Unit = {
          val v = co(base + k)
          if (v != 0 && nextBit() == 1 && (v & p1) == 0)
            co(base + k) = if (v >= 0) v + p1 else v + m1
        }
        var k = ss
        if (eobrun == 0) {
          var done = false
          while (!done && k <= se) {
            val rs = readCode(acTables(scanAc(0)))
            if (rs < 0) { ok = false; return }
            var r = rs >> 4
            val s = rs & 15
            var newVal = 0
            if (s != 0) {
              if (s != 1) { ok = false; return } // refinement codes ±1 only
              newVal = if (nextBit() == 1) p1 else m1
            } else if (r != 15) {
              eobrun = 1 << r
              if (r > 0) eobrun += readBits(r)
              done = true
            }
            if (!done) {
              // advance over r zero-HISTORY coefs, correcting nonzero
              // ones in passing; land the new value on the (r+1)-th
              var landed = false
              while (!landed && k <= se) {
                if (co(base + k) != 0) correct(k)
                else if (r == 0) { co(base + k) = newVal; landed = true }
                else r -= 1
                k += 1
              }
              if (!landed && newVal != 0) { ok = false; return }
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) { correct(k); k += 1 }
          eobrun -= 1
        }
      }
      def doBlock(si: Int, base: Int): Unit = {
        if (ss == 0) {
          if (ah == 0) dcFirstBlock(si, base) else dcRefineBlock(si, base)
        } else {
          if (ah == 0) acFirstBlock(coefs(scanCis(si)), base)
          else acRefineBlock(coefs(scanCis(si)), base)
        }
      }

      if (ss == 0) {
        // DC scan: MCU-interleaved when ns > 1; a single-component
        // scan (even of a one-component frame) is non-interleaved and
        // walks the component's TRUE block grid (T.81 A.2.2)
        if (ns > 1) {
          var mcu = 0
          val nMcus = mcusX * mcusY
          while (ok && mcu < nMcus) {
            if (restartInterval > 0 && mcu > 0 &&
              mcu % restartInterval == 0) {
              if (!consumeRestart()) return -1
              java.util.Arrays.fill(prevDc, 0)
              eobrun = 0
            }
            val mx = mcu % mcusX
            val my = mcu / mcusX
            var si = 0
            while (ok && si < ns) {
              val ci = scanCis(si)
              var byi = 0
              while (ok && byi < compV(ci)) {
                var bxi = 0
                while (ok && bxi < compH(ci)) {
                  val bx = mx * compH(ci) + bxi
                  val by = my * compV(ci) + byi
                  doBlock(si, (by * blocksPerRow(ci) + bx) * 64)
                  bxi += 1
                }
                byi += 1
              }
              si += 1
            }
            mcu += 1
          }
        } else {
          // non-interleaved DC scan: true block grid
          val ci = scanCis(0)
          var b = 0
          val nb = trueBw(ci) * trueBh(ci)
          while (ok && b < nb) {
            if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
              if (!consumeRestart()) return -1
              java.util.Arrays.fill(prevDc, 0)
              eobrun = 0
            }
            val bx = b % trueBw(ci)
            val by = b / trueBw(ci)
            doBlock(0, (by * blocksPerRow(ci) + bx) * 64)
            b += 1
          }
        }
      } else {
        // AC scan: always single-component, true block grid
        if (ns != 1) return -1
        val ci = scanCis(0)
        var b = 0
        val nb = trueBw(ci) * trueBh(ci)
        while (ok && b < nb) {
          if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
            if (!consumeRestart()) return -1
            eobrun = 0
          }
          val bx = b % trueBw(ci)
          val by = b / trueBw(ci)
          doBlock(0, (by * blocksPerRow(ci) + bx) * 64)
          b += 1
        }
      }
      if (!ok || exhausted) return -1
      // walk to the next marker (skip entropy padding and stuffed FFs)
      var q = pos
      while (q + 1 < p.length &&
        !((p(q) & 0xff) == 0xff && (p(q + 1) & 0xff) != 0x00)) q += 1
      if (q + 1 >= p.length) -1 else q
    }

    // ---- segment walk ----
    while (!sawEoi) {
      if (off + 2 > p.length) return None
      if ((p(off) & 0xff) != 0xff) return None
      var mOff = off + 1
      while (mOff < p.length && (p(mOff) & 0xff) == 0xff) mOff += 1
      if (mOff >= p.length) return None
      val m = p(mOff) & 0xff
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
        off = mOff + 1
      } else if (m == 0xd9) {
        sawEoi = true
      } else {
        if (mOff + 3 > p.length) return None
        val len = be16(mOff + 1)
        if (len < 2 || mOff + 1 + len > p.length) return None
        val seg = mOff + 3
        var nextOff = mOff + 1 + len
        m match {
          case 0xdb => // DQT
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
          case 0xc4 => // DHT
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
          case 0xc2 => // SOF2: progressive DCT, Huffman
            if (compIds != null) return None // one frame per stream
            if (len < 9) return None
            if ((p(seg) & 0xff) != 8) return None
            height = be16(seg + 1); width = be16(seg + 3)
            val ncomp = p(seg + 5) & 0xff
            if (ncomp != 1 && ncomp != 3) return None
            if (len < 8 + 3 * ncomp) return None
            if (width <= 0 || height <= 0) return None
            // decode-bomb guard BEFORE any allocation (baseline rule)
            if (width.toLong * height > (1L << 26)) return None
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
            hMax = compH.max
            vMax = compV.max
            mcusX = (width + 8 * hMax - 1) / (8 * hMax)
            mcusY = (height + 8 * vMax - 1) / (8 * vMax)
            blocksPerRow = Array.tabulate(ncomp)(i => mcusX * compH(i))
            trueBw = Array.tabulate(ncomp) { i =>
              val cw = (width * compH(i) + hMax - 1) / hMax
              (cw + 7) / 8
            }
            trueBh = Array.tabulate(ncomp) { i =>
              val ch = (height * compV(i) + vMax - 1) / vMax
              (ch + 7) / 8
            }
            coefs = Array.tabulate(ncomp)(i =>
              new Array[Int](blocksPerRow(i) * mcusY * compV(i) * 64))
          case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
               0xcb | 0xcd | 0xce | 0xcf =>
            return None // not progressive-Huffman — baseline path or out
          case 0xdd => // DRI
            if (len != 4) return None
            restartInterval = be16(seg)
          case 0xda => // SOS
            if (compIds == null) return None
            nScans += 1
            if (nScans > 100) return None // scan-script bomb guard
            val ns = p(seg) & 0xff
            if (ns < 1 || ns > compIds.length) return None
            if (len < 6 + 2 * ns) return None
            val scanCis = new Array[Int](ns)
            val scanDc = new Array[Int](ns)
            val scanAc = new Array[Int](ns)
            var si = 0
            while (si < ns) {
              val cid = p(seg + 1 + 2 * si) & 0xff
              val ci = compIds.indexOf(cid)
              if (ci < 0) return None
              scanCis(si) = ci
              scanDc(si) = (p(seg + 2 + 2 * si) & 0xff) >> 4
              scanAc(si) = p(seg + 2 + 2 * si) & 0x0f
              if (scanDc(si) > 3 || scanAc(si) > 3) return None
              si += 1
            }
            val ss = p(seg + 1 + 2 * ns) & 0xff
            val se = p(seg + 2 + 2 * ns) & 0xff
            val ahal = p(seg + 3 + 2 * ns) & 0xff
            val ah = ahal >> 4
            val al = ahal & 0x0f
            if (ss > 63 || se > 63 || ss > se) return None
            if (ss == 0 && se != 0) return None // DC scans are 0..0
            if (ss > 0 && ns != 1) return None // AC scans: one component
            if (ah > 13 || al > 13) return None
            if (ah != 0 && ah != al + 1) return None // SA steps by one bit
            val next = decodeScan(scanCis, scanDc, scanAc, ss, se, ah, al,
              mOff + 1 + len)
            if (next < 0) return None
            nextOff = next
          case _ => // APPn / COM: skip
        }
        if (!sawEoi) off = nextOff
      }
    }
    if (coefs == null || nScans == 0) return None
    val ncomp = compIds.length
    var ci = 0
    while (ci < ncomp) {
      if (quantZig(compQ(ci)) == null) return None
      ci += 1
    }
    // dequantize + inverse DCT into MCU-padded sample planes
    val planeW = Array.tabulate(ncomp)(i => blocksPerRow(i) * 8)
    val planeH = Array.tabulate(ncomp)(i => mcusY * compV(i) * 8)
    val planes = Array.tabulate(ncomp)(i => new Array[Byte](
      planeW(i) * planeH(i)))
    val raster = new Array[Int](64)
    ci = 0
    while (ci < ncomp) {
      val qz = quantZig(compQ(ci))
      val co = coefs(ci)
      val bpr = blocksPerRow(ci)
      val nbY = mcusY * compV(ci)
      val pw = planeW(ci)
      var by = 0
      while (by < nbY) {
        var bx = 0
        while (bx < bpr) {
          val base = (by * bpr + bx) * 64
          var zi = 0
          while (zi < 64) {
            raster(Zigzag(zi)) = co(base + zi) * qz(zi)
            zi += 1
          }
          val ox0 = bx * 8
          val oy0 = by * 8
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              var s = 0.0
              var v = 0
              while (v < 8) {
                var u = 0
                while (u < 8) {
                  s += c(u) * c(v) * raster(v * 8 + u) * Cos(x)(u) * Cos(y)(v)
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
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    // assemble RGB with nearest-sample chroma upsampling (baseline rule)
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
    } else {
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
    }
    Some((width, height, out))
  }

  // ---- encoder ---------------------------------------------------------

  /** Encode an 8-bit greyscale raster as a PROGRESSIVE JPEG with the
    * six-stage scan script (see object doc). Spec-conforming output:
    * any progressive-capable decoder reads it.
    */
  def encodeGray(width: Int, height: Int, gray: Array[Byte],
                 quality: Int = 90): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
      s"bad JPEG geometry ${width}x$height")
    require(gray.length == width * height,
      s"raster length ${gray.length} != ${width}x$height")
    val lumaQ = scaledQuant(StdLumaQuant, quality)
    encodeProgressive(width, height, Array(gray), Array(lumaQ),
      Array(0), Array(1))
  }

  /** Encode a row-major RGB raster as a PROGRESSIVE 4:4:4 color JPEG
    * (JFIF YCbCr), same scan script per component.
    */
  def encodeColor(width: Int, height: Int, rgb: Array[Byte],
                  quality: Int = 90): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
      s"bad JPEG geometry ${width}x$height")
    require(rgb.length == width * height * 3,
      s"raster length ${rgb.length} != ${width}x${height}x3")
    val n = width * height
    val yP = new Array[Byte](n)
    val cbP = new Array[Byte](n)
    val crP = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val r = rgb(i * 3) & 0xff
      val g = rgb(i * 3 + 1) & 0xff
      val b = rgb(i * 3 + 2) & 0xff
      val y = 0.299 * r + 0.587 * g + 0.114 * b
      val cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
      val cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
      yP(i) = math.min(255, math.max(0, math.round(y).toInt)).toByte
      cbP(i) = math.min(255, math.max(0, math.round(cb).toInt)).toByte
      crP(i) = math.min(255, math.max(0, math.round(cr).toInt)).toByte
      i += 1
    }
    val lumaQ = scaledQuant(StdLumaQuant, quality)
    val chromaQ = scaledQuant(StdChromaQuant, quality)
    encodeProgressive(width, height, Array(yP, cbP, crP),
      Array(lumaQ, chromaQ), Array(0, 1, 1), Array(1, 2, 3))
  }

  /** Shared progressive emitter: all components at 1×1 sampling (the
    * block grid IS the MCU grid), coefficients computed once, then the
    * six-stage scan script over them.
    */
  private def encodeProgressive(width: Int, height: Int,
                                planes: Array[Array[Byte]],
                                quants: Array[Array[Int]],
                                compQ: Array[Int],
                                ids: Array[Int]): Array[Byte] = {
    val ncomp = planes.length
    val bwX = (width + 7) / 8
    val bhY = (height + 7) / 8
    val nBlocks = bwX * bhY
    // quantized coefficients, zigzag order per block, per component
    val coefZ = Array.ofDim[Int](ncomp, nBlocks * 64)
    val block = new Array[Double](64)
    val raster = new Array[Int](64)
    var ci = 0
    while (ci < ncomp) {
      var b = 0
      while (b < nBlocks) {
        val bx = (b % bwX) * 8
        val by = (b / bwX) * 8
        JpegCodec.loadBlock(planes(ci), width, height, bx, by, block)
        JpegCodec.fdctQuant(block, quants(compQ(ci)), raster)
        var zi = 0
        while (zi < 64) {
          coefZ(ci)(b * 64 + zi) = raster(Zigzag(zi))
          zi += 1
        }
        b += 1
      }
      ci += 1
    }
    val dcCodes = canonicalCodes(DcBits, DcVals)
    val acCodes = canonicalCodes(FlatAcBits, FlatAcVals)
    val out = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    quants.zipWithIndex.foreach { case (qt, id) =>
      marker(0xdb)
      be16(2 + 1 + 64)
      out.write(id)
      var zi = 0
      while (zi < 64) { out.write(qt(Zigzag(zi))); zi += 1 }
    }
    marker(0xc2) // SOF2
    be16(8 + 3 * ncomp)
    out.write(8); be16(height); be16(width)
    out.write(ncomp)
    var k = 0
    while (k < ncomp) {
      out.write(ids(k)); out.write(0x11); out.write(compQ(k))
      k += 1
    }
    def dht(tc: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4)
      be16(2 + 1 + 16 + vals.length)
      out.write(tc << 4)
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    dht(0, DcBits, DcVals)
    dht(1, FlatAcBits, FlatAcVals)
    def sos(cis: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xda)
      be16(6 + 2 * cis.length)
      out.write(cis.length)
      cis.foreach { i => out.write(ids(i)); out.write(0x00) }
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }

    // ---- scan emitters ----
    def putMagnitude(bw: JpegCodec.BitWriter, v: Int, cat: Int): Unit =
      if (cat > 0) bw.put(if (v < 0) v + (1 << cat) - 1 else v, cat)

    def dcFirstScan(al: Int): Unit = {
      sos(0 until ncomp, 0, 0, 0, al)
      val bw = new JpegCodec.BitWriter(out)
      val prevDc = new Array[Int](ncomp)
      var b = 0
      while (b < nBlocks) {
        var i = 0
        while (i < ncomp) {
          val dc = coefZ(i)(b * 64) >> al // DC point transform: arith shift
          val diff = dc - prevDc(i)
          prevDc(i) = dc
          val cat = magnitudeCategory(diff)
          val (cd, cl) = dcCodes(cat)
          bw.put(cd, cl)
          putMagnitude(bw, diff, cat)
          i += 1
        }
        b += 1
      }
      bw.flushWithOnes()
    }
    def dcRefineScan(al: Int): Unit = {
      sos(0 until ncomp, 0, 0, al + 1, al)
      val bw = new JpegCodec.BitWriter(out)
      var b = 0
      while (b < nBlocks) {
        var i = 0
        while (i < ncomp) {
          bw.put((coefZ(i)(b * 64) >> al) & 1, 1)
          i += 1
        }
        b += 1
      }
      bw.flushWithOnes()
    }
    def acFirstScan(ci2: Int, ss: Int, se: Int, al: Int): Unit = {
      sos(Seq(ci2), ss, se, 0, al)
      val bw = new JpegCodec.BitWriter(out)
      val co = coefZ(ci2)
      var eobrun = 0
      def flushEob(): Unit = if (eobrun > 0) {
        val r = 31 - Integer.numberOfLeadingZeros(eobrun)
        val (cd, cl) = acCodes(r << 4)
        bw.put(cd, cl)
        if (r > 0) bw.put(eobrun - (1 << r), r)
        eobrun = 0
      }
      var b = 0
      while (b < nBlocks) {
        val base = b * 64
        var run = 0
        var emitted = false
        var k2 = ss
        while (k2 <= se) {
          val v = co(base + k2)
          val t = math.abs(v) >> al // AC point transform: magnitude shift
          if (t == 0) run += 1
          else {
            if (!emitted) { flushEob(); emitted = true }
            while (run > 15) {
              val (z, zl) = acCodes(0xf0); bw.put(z, zl); run -= 16
            }
            val s = magnitudeCategory(t)
            val (cd, cl) = acCodes((run << 4) | s)
            bw.put(cd, cl)
            putMagnitude(bw, if (v < 0) -t else t, s)
            run = 0
          }
          k2 += 1
        }
        if (!emitted || run > 0) {
          eobrun += 1
          if (eobrun == 0x7fff) flushEob()
        }
        b += 1
      }
      flushEob()
      bw.flushWithOnes()
    }
    def acRefineScan(ci2: Int, ss: Int, se: Int, al: Int): Unit = {
      sos(Seq(ci2), ss, se, al + 1, al)
      val bw = new JpegCodec.BitWriter(out)
      val co = coefZ(ci2)
      var eobrun = 0
      val pending = scala.collection.mutable.ArrayBuffer.empty[Int]
      def flushEob(): Unit = if (eobrun > 0) {
        val r = 31 - Integer.numberOfLeadingZeros(eobrun)
        val (cd, cl) = acCodes(r << 4)
        bw.put(cd, cl)
        if (r > 0) bw.put(eobrun - (1 << r), r)
        eobrun = 0
        pending.foreach(bit => bw.put(bit, 1))
        pending.clear()
      }
      val absv = new Array[Int](64)
      var b = 0
      while (b < nBlocks) {
        val base = b * 64
        var eobPos = ss - 1
        var k2 = ss
        while (k2 <= se) {
          val t = math.abs(co(base + k2)) >> al
          absv(k2) = t
          if (t == 1) eobPos = k2 // last NEWLY-significant coefficient
          k2 += 1
        }
        var r = 0
        val br = scala.collection.mutable.ArrayBuffer.empty[Int]
        def drainBr(): Unit = { br.foreach(bit => bw.put(bit, 1)); br.clear() }
        k2 = ss
        while (k2 <= se) {
          val t = absv(k2)
          if (t == 0) r += 1
          else {
            // ZRLs not foldable into the block's EOB must be emitted
            while (r > 15 && k2 <= eobPos) {
              flushEob()
              val (z, zl) = acCodes(0xf0); bw.put(z, zl)
              r -= 16
              drainBr()
            }
            if (t > 1) br += (t & 1) // history coef: one correction bit
            else {
              flushEob()
              val (cd, cl) = acCodes((r << 4) | 1)
              bw.put(cd, cl)
              bw.put(if (co(base + k2) < 0) 0 else 1, 1)
              drainBr()
              r = 0
            }
          }
          k2 += 1
        }
        if (r > 0 || br.nonEmpty) {
          eobrun += 1
          pending ++= br
          if (eobrun == 0x7fff || pending.size > 900) flushEob()
        }
        b += 1
      }
      flushEob()
      bw.flushWithOnes()
    }

    // ---- the six-stage script ----
    dcFirstScan(al = 1)
    var i2 = 0
    while (i2 < ncomp) {
      acFirstScan(i2, 1, 5, al = 2)
      acFirstScan(i2, 6, 63, al = 2)
      i2 += 1
    }
    i2 = 0
    while (i2 < ncomp) {
      acRefineScan(i2, 1, 63, al = 1) // Ah=2 → Al=1
      i2 += 1
    }
    dcRefineScan(al = 0)
    i2 = 0
    while (i2 < ncomp) {
      acRefineScan(i2, 1, 63, al = 0) // Ah=1 → Al=0
      i2 += 1
    }
    marker(0xd9) // EOI
    out.toByteArray
  }
}
