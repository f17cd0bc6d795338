package graft

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

import graft.multimodal.{MediaCodec, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Header-codec unit tests: encode → decode round trips, hand-built byte
  * fixtures (the parser must read the REAL offsets, not trust the
  * encoder), and corrupt-input totality — decode never throws.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val data = "the quick brown fox".getBytes(UTF_8)

  test("JPEG baseline codec: round trip within quantization error, totality") {
    import graft.multimodal.JpegCodec
    // smooth gradient: DCT-friendly, so quality-90 error stays small
    val w = 37; val h = 21
    val gray = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (((x * 255) / (w - 1) + (y * 255) / (h - 1)) / 2).toByte
    }
    val jpeg = JpegCodec.encodeGray(w, h, gray, quality = 90)
    // the container is a REAL JPEG: the existing marker walk reads it
    val hdr = MediaCodec.decode(jpeg)
    assert(hdr.media_type === "image/jpeg")
    assert(hdr.width === w && hdr.height === h)
    val Some((dw, dh, px)) = JpegCodec.decodeGray(jpeg)
    assert(dw === w && dh === h && px.length === w * h)
    val errs = gray.indices.map(i => math.abs((gray(i) & 0xff) - (px(i) & 0xff)))
    assert(errs.max <= 12, s"max quantization error ${errs.max} too large")
    assert(errs.sum.toDouble / errs.size <= 3.0,
      s"mean error ${errs.sum.toDouble / errs.size} too large")
    // flat block: DC-only, reconstructs exactly
    val flat = Array.fill(16 * 16)(77.toByte)
    val Some((_, _, fpx)) = JpegCodec.decodeGray(
      JpegCodec.encodeGray(16, 16, flat, quality = 90))
    assert(fpx.forall(_ == 77.toByte), "flat raster must round-trip exactly")
    // determinism: encode is a pure function
    assert(JpegCodec.encodeGray(w, h, gray, 90)
      .sameElements(jpeg))
    // totality: the opaque SHELL container has no tables -> None; a
    // truncated real stream -> None; garbage -> None — never a throw
    assert(JpegCodec.decodeGray(
      MediaCodec.encodeJpegShell(8, 8, data)).isEmpty)
    assert(JpegCodec.decodeGray(jpeg.take(jpeg.length / 2)).isEmpty)
    assert(JpegCodec.decodeGray("not a jpeg at all".getBytes(UTF_8)).isEmpty)
    // decode-bomb guard: a forged SOF declaring a huge frame must be
    // rejected BEFORE plane allocation, not OOM a scan task. Patch
    // this fixture's SOF geometry bytes to 32768x32768 in place.
    val bomb = jpeg.clone()
    val sofAt = {
      var i = 2
      var at = -1
      while (at < 0 && i + 1 < bomb.length) {
        if ((bomb(i) & 0xff) == 0xff && (bomb(i + 1) & 0xff) == 0xc0) at = i
        i += 1
      }
      at
    }
    assert(sofAt > 0)
    bomb(sofAt + 5) = 0x80.toByte; bomb(sofAt + 6) = 0x00 // height 32768
    bomb(sofAt + 7) = 0x80.toByte; bomb(sofAt + 8) = 0x00 // width 32768
    assert(JpegCodec.decodeRgb(bomb).isEmpty,
      "header-forged giant frame must be capped, not allocated")
  }

  test("JPEG color codec: 4:4:4 and 4:2:0 round trips, chroma within tolerance") {
    import graft.multimodal.JpegCodec
    val w = 40; val h = 24
    // smooth color field: R gradient on x, G gradient on y, B diagonal
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      rgb(o) = ((x * 255) / (w - 1)).toByte
      rgb(o + 1) = ((y * 255) / (h - 1)).toByte
      rgb(o + 2) = (((x + y) * 255) / (w + h - 2)).toByte
    }
    def maxErr(a: Array[Byte], b: Array[Byte]): Int =
      a.indices.map(i => math.abs((a(i) & 0xff) - (b(i) & 0xff))).max
    // 4:4:4: every sample coded at full resolution
    val full = JpegCodec.encodeColor(w, h, rgb, quality = 90)
    val Some((fw, fh, fpx)) = JpegCodec.decodeRgb(full)
    assert(fw === w && fh === h && fpx.length === w * h * 3)
    assert(maxErr(rgb, fpx) <= 24,
      s"4:4:4 error ${maxErr(rgb, fpx)} beyond color round-trip tolerance")
    // 4:2:0: chroma quartered; smooth fields stay close
    val sub = JpegCodec.encodeColor(w, h, rgb, quality = 90,
      subsample = true)
    val Some((sw, sh, spx)) = JpegCodec.decodeRgb(sub)
    assert(sw === w && sh === h)
    assert(maxErr(rgb, spx) <= 48,
      s"4:2:0 error ${maxErr(rgb, spx)} beyond subsampled tolerance")
    assert(sub.length < full.length,
      "subsampling must shrink the payload on a color image")
    // the marker walk sees a real color jpeg
    val hdr = MediaCodec.decode(full)
    assert(hdr.media_type === "image/jpeg" && hdr.width === w)
    // decodeGray refuses color (decodeRgb is the color surface)
    assert(JpegCodec.decodeGray(full).isEmpty)
    // a color jpeg flows through the pixel surfaces
    import graft.multimodal.MediaRecord
    val media = Seq(MediaRecord(9L, full, "image/jpeg")).toDS()
    val st = Multimodal.aHashImagesStatus(media)
      .as[(Long, String, Option[String], Option[Long], Boolean)].collect()
    assert(st.head._5 && st.head._3.exists(_.length == 64))
    // grey round trip still exact on flat rasters (regression guard)
    val flat = Array.fill(8 * 8)(200.toByte)
    val Some((_, _, fg)) = JpegCodec.decodeGray(
      JpegCodec.encodeGray(8, 8, flat, 90))
    assert(fg.forall(_ == 200.toByte))
  }

  test("JPEG 4:2:2 sampling and restart markers round-trip") {
    import graft.multimodal.JpegCodec
    val w = 36; val h = 20
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      rgb(o) = ((x * 255) / (w - 1)).toByte
      rgb(o + 1) = ((y * 255) / (h - 1)).toByte
      rgb(o + 2) = 96.toByte
    }
    def maxErr(a: Array[Byte], b: Array[Byte]): Int =
      a.indices.map(i => math.abs((a(i) & 0xff) - (b(i) & 0xff))).max
    // 4:2:2: chroma halved horizontally only
    val s422 = JpegCodec.encodeColorSampled(w, h, rgb, 90, 2, 1)
    val Some((dw, dh, px)) = JpegCodec.decodeRgb(s422)
    assert(dw === w && dh === h)
    assert(maxErr(rgb, px) <= 48, s"4:2:2 error ${maxErr(rgb, px)}")
    // restart markers every 2 MCUs: stream carries DRI + RSTn and the
    // decoder resynchronizes predictors at each boundary — the
    // reconstruction must equal the marker-free encoding's EXACTLY
    // (restart points change the stream layout, not the math)
    val plain = JpegCodec.encodeColorSampled(w, h, rgb, 90, 1, 1)
    val rst = JpegCodec.encodeColorSampled(w, h, rgb, 90, 1, 1,
      restartInterval = 2)
    assert(rst.length > plain.length, "RSTn markers must be present")
    val Some((_, _, pxPlain)) = JpegCodec.decodeRgb(plain)
    val Some((_, _, pxRst)) = JpegCodec.decodeRgb(rst)
    assert(pxPlain.sameElements(pxRst),
      "restart markers must not change the reconstruction")
    // 4:2:0 with restarts: both features compose
    val rst420 = JpegCodec.encodeColorSampled(w, h, rgb, 90, 2, 2,
      restartInterval = 1)
    val Some((rw, rh, rpx)) = JpegCodec.decodeRgb(rst420)
    assert(rw === w && rh === h && maxErr(rgb, rpx) <= 48)
    // a corrupted restart marker is a decode failure, not a throw
    val bad = rst.clone()
    var i = 2
    var patched = false
    while (!patched && i + 1 < bad.length) {
      val m = bad(i + 1) & 0xff
      if ((bad(i) & 0xff) == 0xff && m >= 0xd0 && m <= 0xd7) {
        bad(i + 1) = 0xc8.toByte // not a restart marker
        patched = true
      }
      i += 1
    }
    assert(patched)
    assert(JpegCodec.decodeRgb(bad).isEmpty)
  }

  test("real JPEG flows through the pixel surfaces; the shell stays skipped") {
    import graft.multimodal.{JpegCodec, MediaRecord}
    val w = 24; val h = 16
    val gray = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (((x * 255) / (w - 1) + (y * 255) / (h - 1)) / 2).toByte
    }
    val real = JpegCodec.encodeGray(w, h, gray, quality = 90)
    val shell = MediaCodec.encodeJpegShell(8, 8, data)
    val media = Seq(
      MediaRecord(1L, real, "image/jpeg"),
      MediaRecord(2L, shell, "image/jpeg")).toDS()
    // status: the real jpeg is decoded with a full hash, the shell not
    val st = Multimodal.aHashImagesStatus(media)
      .as[(Long, String, Option[String], Option[Long], Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(st(1L)._5 && st(1L)._3.exists(_.length == 64))
    assert(!st(2L)._5 && st(2L)._3.isEmpty)
    // plain aHash emits exactly the decoded row
    val hashed = Multimodal.aHashImages(media).toDF()
      .as[(Long, String, String, Long)].collect()
    assert(hashed.map(_._1).toSeq === Seq(1L))
    assert(st(1L)._3.contains(hashed.head._3),
      "status and plain surfaces share one signature")
    // downsample reaches the decoded jpeg's pixels too
    val ds = Multimodal.downsampleImages(media, box = 8)
      .toDF().as[(Long, String, Int, Int, Int, Int, Long, Long, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(ds.keySet === Set(1L))
    assert(ds(1L)._3 === w && ds(1L)._4 === h)
    assert(ds(1L)._7 > 0L, "sampled bytes come from decoded pixels")
    // decodeStatus tells the two apart with the decode ATTEMPT
    val cov = Multimodal.decodeStatus(media)
      .select(col("doc_id"), col("pixel_decodable"), col("skip_reason"))
      .as[(Long, Boolean, Option[String])].collect().map(r => r._1 -> r).toMap
    assert(cov(1L)._2 && cov(1L)._3.isEmpty)
    assert(!cov(2L)._2 && cov(2L)._3.contains(
      "corrupt baseline jpeg stream (entropy decode failed)"))
  }

  test("JPEG triage: SOF sniff splits progressive / CMYK / corrupt shells") {
    import graft.multimodal.{JpegCodec, MediaRecord}
    val base = MediaCodec.encodeJpegShell(8, 8, data)
    val prog = MediaCodec.encodeJpegShell(8, 8, data, sofMarker = 0xc2)
    val cmyk = MediaCodec.encodeJpegShell(8, 8, data, components = 4)
    assert(JpegCodec.sniffSof(base) === Some((0xc0, 1)))
    assert(JpegCodec.sniffSof(prog) === Some((0xc2, 1)))
    assert(JpegCodec.sniffSof(cmyk) === Some((0xc0, 4)))
    assert(JpegCodec.sniffSof("not a jpeg".getBytes) === None)
    // SOI then immediate EOI: valid marker chain, no frame
    assert(JpegCodec.sniffSof(Array(0xff, 0xd8, 0xff, 0xd9)
      .map(_.toByte)) === None)
    // all three shells are geometry-parseable JPEGs and none decodes
    Seq(base, prog, cmyk).foreach { p =>
      assert(MediaCodec.decode(p).media_type === "image/jpeg")
      assert(JpegCodec.decodeRgb(p).isEmpty)
    }
    // decodeStatus routes each to its distinct triage bucket
    val media = Seq(
      MediaRecord(1L, base, "image/jpeg"),
      MediaRecord(2L, prog, "image/jpeg"),
      MediaRecord(3L, cmyk, "image/jpeg")).toDS()
    val rs = Multimodal.decodeStatus(media)
      .select(col("doc_id"), col("skip_reason"))
      .as[(Long, Option[String])].collect().toMap
    assert(rs(1L).contains(
      "corrupt baseline jpeg stream (entropy decode failed)"))
    assert(rs(2L).contains("corrupt progressive jpeg stream (entropy decode failed)"))
    assert(rs(3L).contains("corrupt cmyk/ycck jpeg stream (entropy decode failed)"))
  }

  test("progressive JPEG: SA + spectral-selection round trip equals baseline exactly") {
    import graft.multimodal.{JpegCodec, JpegProgressive, MediaRecord}
    val w = 37; val h = 21
    val gray = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (((x * 255) / (w - 1) + (y * 255) / (h - 1)) / 2).toByte
    }
    val prog = JpegProgressive.encodeGray(w, h, gray, quality = 90)
    // the stream is REALLY progressive, and the generic header walk
    // still reads its geometry
    assert(JpegCodec.sniffSof(prog) === Some((0xc2, 1)))
    assert(MediaCodec.decode(prog).media_type === "image/jpeg")
    assert(MediaCodec.decode(prog).width === w)
    // decode through the PUBLIC dispatch (decodeRgb tries baseline,
    // hands SOF2 to the progressive decoder)
    val Some((dw, dh, px)) = JpegCodec.decodeGray(prog)
    assert(dw === w && dh === h)
    // progressive transport is lossless over the quantized
    // coefficients: the reconstruction must equal the BASELINE
    // encoding of the same raster at the same quality BIT FOR BIT —
    // any drift in any scan path (DC/AC first, DC/AC refinement, EOB
    // runs, correction bits) breaks this equality
    val Some((_, _, basePx)) = JpegCodec.decodeGray(
      JpegCodec.encodeGray(w, h, gray, quality = 90))
    assert(px.sameElements(basePx),
      "progressive reconstruction must equal baseline exactly")
    // color: same exact-equality contract against the 4:4:4 baseline
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      rgb(o) = ((x * 255) / (w - 1)).toByte
      rgb(o + 1) = ((y * 255) / (h - 1)).toByte
      rgb(o + 2) = (((x + y) * 255) / (w + h - 2)).toByte
    }
    val cProg = JpegProgressive.encodeColor(w, h, rgb, quality = 90)
    assert(JpegCodec.sniffSof(cProg) === Some((0xc2, 3)))
    val Some((cw2, ch2, cPx)) = JpegCodec.decodeRgb(cProg)
    assert(cw2 === w && ch2 === h)
    val Some((_, _, cBase)) = JpegCodec.decodeRgb(
      JpegCodec.encodeColor(w, h, rgb, quality = 90))
    assert(cPx.sameElements(cBase),
      "progressive color reconstruction must equal 4:4:4 baseline")
    // high-frequency + low-amplitude sweeps: land coefficients on
    // every successive-approximation boundary (newly-significant in
    // first scans vs in refinement scans, long zero runs → ZRL and
    // EOB-run paths on both sides)
    for (amp <- 1 to 12) {
      val cb = Array.tabulate(16 * 16) { i =>
        val x = i % 16; val y = i / 16
        (128 + (if ((x + y) % 2 == 0) amp else -amp)).toByte
      }
      val pr = JpegProgressive.encodeGray(16, 16, cb, quality = 90)
      val ba = JpegCodec.encodeGray(16, 16, cb, quality = 90)
      val Some((_, _, pPx)) = JpegCodec.decodeGray(pr)
      val Some((_, _, bPx)) = JpegCodec.decodeGray(ba)
      assert(pPx.sameElements(bPx), s"checkerboard amp=$amp diverged")
    }
    // dense pseudo-noise at low quality: broad (run, size) coverage
    val rnd = new scala.util.Random(11)
    val noise = Array.fill(24 * 24)((rnd.nextInt(256) - 128).toByte)
    val nProg = JpegProgressive.encodeGray(24, 24, noise, quality = 50)
    val nBase = JpegCodec.encodeGray(24, 24, noise, quality = 50)
    val Some((_, _, nP)) = JpegCodec.decodeGray(nProg)
    val Some((_, _, nB)) = JpegCodec.decodeGray(nBase)
    assert(nP.sameElements(nB), "noise raster diverged")
    // determinism + totality: truncation and garbage fail clean
    assert(JpegProgressive.encodeGray(w, h, gray, 90).sameElements(prog))
    assert(JpegCodec.decodeRgb(prog.take(prog.length / 2)).isEmpty)
    assert(JpegProgressive.decode("junk".getBytes(UTF_8)).isEmpty)
    assert(JpegProgressive.decode(
      JpegCodec.encodeGray(w, h, gray, 90)).isEmpty,
      "progressive decoder must refuse baseline frames")
    // a real progressive payload flows through the pixel surfaces
    val media = Seq(MediaRecord(5L, prog, "image/jpeg")).toDS()
    val st = Multimodal.aHashImagesStatus(media)
      .as[(Long, String, Option[String], Option[Long], Boolean)].collect()
    assert(st.head._5 && st.head._3.exists(_.length == 64))
    val cov = Multimodal.decodeStatus(media)
      .select(col("pixel_decodable"), col("skip_reason"))
      .as[(Boolean, Option[String])].collect().head
    assert(cov._1 && cov._2.isEmpty)
  }

  test("CMYK/YCCK JPEG: 4-component Adobe decode round-trips") {
    import graft.multimodal.{JpegCodec, MediaRecord}
    val w = 32; val h = 18
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      rgb(o) = ((x * 255) / (w - 1)).toByte
      rgb(o + 1) = ((y * 255) / (h - 1)).toByte
      rgb(o + 2) = (((x + y) * 255) / (w + h - 2)).toByte
    }
    val fullK = Array.fill(w * h)(255.toByte)
    def maxErr(a: Array[Byte], b: Array[Byte]): Int =
      a.indices.map(i => math.abs((a(i) & 0xff) - (b(i) & 0xff))).max
    // plain CMYK (transform 0): with K' = 255 the stored leading
    // planes ARE the RGB values — per-channel greyscale accuracy
    val cmyk = JpegCodec.encodeCmyk(w, h, rgb, fullK, ycck = false)
    assert(JpegCodec.sniffSof(cmyk) === Some((0xc0, 4)))
    val Some((dw, dh, px)) = JpegCodec.decodeRgb(cmyk)
    assert(dw === w && dh === h && px.length === w * h * 3)
    assert(maxErr(rgb, px) <= 24, s"CMYK error ${maxErr(rgb, px)}")
    // YCCK (transform 2): YCbCr math on the leading planes, then K —
    // the dominant real-world 4-component variant (Adobe print chain)
    val ycck = JpegCodec.encodeCmyk(w, h, rgb, fullK, ycck = true)
    assert(JpegCodec.sniffSof(ycck) === Some((0xc0, 4)))
    val Some((_, _, ypx)) = JpegCodec.decodeRgb(ycck)
    assert(maxErr(rgb, ypx) <= 24, s"YCCK error ${maxErr(rgb, ypx)}")
    // a VARYING K plane scales every channel: expected = rgb·K/255
    val gradK = Array.tabulate(w * h)(i => ((i % w) * 255 / (w - 1)).toByte)
    val varK = JpegCodec.encodeCmyk(w, h, rgb, gradK, ycck = false)
    val Some((_, _, vpx)) = JpegCodec.decodeRgb(varK)
    val expected = Array.tabulate(w * h * 3) { i =>
      val kv = gradK(i / 3) & 0xff
      (((rgb(i) & 0xff) * kv + 127) / 255).toByte
    }
    assert(maxErr(expected, vpx) <= 32,
      s"K-scaled error ${maxErr(expected, vpx)}")
    // decode totality + triage: the scan-less 4-component shell fails
    // with the corrupt-cmyk reason; a REAL ycck payload is decodable
    assert(JpegCodec.decodeRgb(ycck.take(ycck.length / 2)).isEmpty)
    val media = Seq(
      MediaRecord(1L, ycck, "image/jpeg"),
      MediaRecord(2L, MediaCodec.encodeJpegShell(8, 8, data,
        components = 4), "image/jpeg")).toDS()
    val rs = Multimodal.decodeStatus(media)
      .select(col("doc_id"), col("pixel_decodable"), col("skip_reason"))
      .as[(Long, Boolean, Option[String])].collect().map(r => r._1 -> r).toMap
    assert(rs(1L)._2 && rs(1L)._3.isEmpty)
    assert(!rs(2L)._2 && rs(2L)._3.contains(
      "corrupt cmyk/ycck jpeg stream (entropy decode failed)"))
    // and the ycck payload flows into the perceptual-hash surface
    val st = Multimodal.aHashImagesStatus(media)
      .as[(Long, String, Option[String], Option[Long], Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(st(1L)._5 && st(1L)._3.exists(_.length == 64))
    assert(!st(2L)._5)
  }

  test("JPEG shell: geometry parses; pixels visibly undecodable, never hashed") {
    val p = MediaCodec.encodeJpegShell(33, 7, data)
    val h = MediaCodec.decode(p)
    assert(h.media_type === "image/jpeg")
    assert(h.width === 33 && h.height === 7)
    assert(h.data_len === p.length.toLong, "content region = whole payload")
    // five-stratum corpus: wav excluded from the image surface; jpeg
    // id 4 ((4/5)%3=0: corrupt baseline shell) skipped with null hash,
    // jpeg id 9 ((9/5)%3=1: REAL progressive encode) decoded and
    // hashed like the rasters
    val docs = (0L to 9L)
      .map(i => (i, s"stratum $i carries some words for container payload"))
      .toDF("doc_id", "text")
    val media = Multimodal.encodeCorpusWithJpeg(docs)
    val status = Multimodal.aHashImagesStatus(media)
      .as[(Long, String, Option[String], Option[Long], Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(status.keySet === (0L to 9L).filter(_ % 5 != 1).toSet,
      "every image row dispositioned; audio rows excluded")
    for ((id, (_, mt, ahash, nOnes, decoded)) <- status) {
      if (id == 4L) {
        assert(mt === "image/jpeg" && !decoded &&
          ahash.isEmpty && nOnes.isEmpty, s"jpeg row $id must be skipped")
      } else {
        assert(decoded && ahash.exists(_.length == 64) && nOnes.nonEmpty,
          s"row $id must carry its hash")
      }
    }
    // decoded rows' hashes are EXACTLY aHashImages' output (the status
    // surface adds visibility, it does not fork the signature)
    val plain = Multimodal.aHashImages(media).toDF()
      .as[(Long, String, String, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(plain.keySet === status.keySet - 4L)
    plain.foreach { case (id, hash) =>
      assert(status(id)._3.contains(hash))
    }
    // coverage disposition: rasters AND the real progressive jpeg
    // decodable; the corrupt-baseline shell carries its triage reason
    val cov = Multimodal.decodeStatus(media)
      .select(col("media_type"), col("pixel_decodable"), col("skip_reason"))
      .distinct()
      .as[(String, Boolean, Option[String])].collect()
    val byType = cov.groupBy(_._1)
      .view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    assert(byType("image/bmp") === Set((true, None)))
    assert(byType("image/png") === Set((true, None)))
    assert(byType("image/ppm") === Set((true, None)))
    assert(byType("audio/wav") === Set((false, Some("not an image"))))
    assert(byType("image/jpeg") === Set(
      (true, None),
      (false, Some("corrupt baseline jpeg stream (entropy decode failed)"))))
  }

  test("BMP round trip and real field offsets") {
    val bmp = MediaCodec.encodeBmp(640, 480, data)
    val h = MediaCodec.decode(bmp)
    assert(h.media_type === "image/bmp")
    assert(h.width === 640 && h.height === 480 && h.n_frames === 1L)
    assert(h.data_offset === 54 && h.data_len === data.length.toLong)
    // top-down BMP: negative height field, geometry is |height|
    val neg = bmp.clone()
    val hv = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-480).array()
    System.arraycopy(hv, 0, neg, 22, 4)
    assert(MediaCodec.decode(neg).height === 480)
  }

  test("WAV round trip: RIFF chunk walk finds fmt and data") {
    val wav = MediaCodec.encodeWav(2, 44100, 16, data)
    val h = MediaCodec.decode(wav)
    assert(h.media_type === "audio/wav")
    assert(h.width === 0 && h.height === 0)
    assert(h.n_frames === data.length / 4) // 2ch * 16bit = 4-byte frames
    assert(h.channels === 2 && h.sample_rate === 44100)
    assert(h.data_offset === 44 && h.data_len === data.length.toLong)
  }

  test("WAV parser walks past extra chunks before data") {
    // hand-build: RIFF [fmt ][LIST (odd size -> pad byte)][data]
    val fmt = MediaCodec.encodeWav(1, 8000, 16, Array.emptyByteArray)
      .slice(12, 36) // the canonical "fmt " chunk
    val listBody = "INFOx".getBytes(US_ASCII) // 5 bytes, odd
    val payload = Array[Byte](1, 2, 3, 4)
    val body = new java.io.ByteArrayOutputStream()
    body.write("WAVE".getBytes(US_ASCII))
    body.write(fmt)
    body.write("LIST".getBytes(US_ASCII))
    body.write(Array[Byte](5, 0, 0, 0)); body.write(listBody)
    body.write(0) // pad to word boundary
    body.write("data".getBytes(US_ASCII))
    body.write(Array[Byte](4, 0, 0, 0)); body.write(payload)
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes(US_ASCII))
    val sz = body.size()
    out.write(Array[Byte](sz.toByte, (sz >> 8).toByte, (sz >> 16).toByte,
      (sz >> 24).toByte))
    body.writeTo(out)
    val h = MediaCodec.decode(out.toByteArray)
    assert(h.media_type === "audio/wav")
    assert(h.n_frames === 2L && h.data_len === 4L) // 1ch*16bit frames
  }

  test("MJPEG AVI round trip: header walk, frame slicing, frames decode") {
    import graft.multimodal.JpegCodec
    val (w, h) = (24, 16)
    val frames = (0 until 3).map { f =>
      val grey = Array.tabulate(w * h)(i => ((i * 7 + f * 31) % 251).toByte)
      JpegCodec.encodeGray(w, h, grey)
    }
    val avi = MediaCodec.encodeAviMjpeg(w, h, fps = 12, frames)
    val hdr = MediaCodec.decode(avi)
    assert(hdr.media_type === "video/avi")
    assert(hdr.width === w && hdr.height === h)
    assert(hdr.n_frames === 3L && hdr.sample_rate === 12)
    // every frame slices back byte-identical and is itself a decodable JPEG
    val sliced = MediaCodec.aviVideoFrames(avi)
    assert(sliced.length === 3)
    sliced.zip(frames).foreach { case (got, want) =>
      assert(java.util.Arrays.equals(got, want))
      val dec = JpegCodec.decodeGray(got)
      assert(dec.isDefined && dec.get._1 === w && dec.get._2 === h)
    }
    // a WAV is still a WAV: the RIFF dispatch keys on the form type
    assert(MediaCodec.decode(MediaCodec.encodeWav(1, 8000, 16, data))
      .media_type === "audio/wav")
    // truncation is total: garbage in, Unknown out, no exception
    assert(MediaCodec.decode(avi.slice(0, 40)).media_type === "unknown")
    assert(MediaCodec.aviVideoFrames(avi.slice(0, 40)).isEmpty)
  }

  test("MP4 shell: box walk reads back geometry, codec, samples; mdat opaque") {
    val payload = "not real h264, and never claimed to be".getBytes(UTF_8)
    val mp4 = MediaCodec.encodeMp4Shell(width = 320, height = 180,
      timescale = 600, duration = 1800, nSamples = 5, data = payload)
    val hdr = MediaCodec.decode(mp4)
    assert(hdr.media_type === "video/mp4")
    assert(hdr.width === 320 && hdr.height === 180)
    assert(hdr.n_frames === 5L && hdr.sample_rate === 600)
    assert(hdr.data_len === payload.length.toLong)
    val info = MediaCodec.mp4Info(mp4).get
    assert(info.vcodec === "avc1" && info.duration === 1800L)
    // the mdat slice is the payload verbatim
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(mp4, hdr.data_offset,
        hdr.data_offset + hdr.data_len.toInt), payload))
    // totality: truncated box sizes classify unknown, never throw
    assert(MediaCodec.decode(mp4.slice(0, 60)).media_type === "unknown")
    assert(MediaCodec.mp4Info("ftypnope".getBytes(US_ASCII)).isEmpty)
  }

  test("video pipeline: meta scan, stride sampling, planted near-dup, hot-frame gate") {
    import graft.multimodal.MediaRecord
    val docs = Seq(
      (0L, "shared footage shared footage shared footage!"),
      (2L, "completely different reel of text here........"),  // same length as 0
      (4L, "short"),
      (100L, "shared footage shared footage shared footage!"), // twin of 0
      (1L, "an mp4 side doc")).toDF("doc_id", "text")
    val media = Multimodal.encodeVideoCorpus(docs)
    // meta: every field a function of (parity, n); AVI walk finds all frames
    val meta = Multimodal.videoMeta(media).collect().map(m => m.doc_id -> m).toMap
    val n0 = 45
    assert(meta(0L).container === "video/avi")
    assert(meta(0L).width === 8 + n0 % 25 && meta(0L).n_frames === 2 + n0 % 4)
    assert(meta(0L).frames_walked === meta(0L).n_frames)
    assert(meta(1L).container === "video/mp4" && meta(1L).frames_walked === 0L)
    // stride-2 sampling: indices 0,2,… and every sampled frame decodes
    val sampled = Multimodal.videoFrameFeatures(media, stride = 2).collect()
    assert(sampled.forall(f => f.frame_idx % 2 == 0 && f.decode_ok))
    assert(sampled.count(_.doc_id == 0L) ===
      (meta(0L).n_frames.toInt + 1) / 2)
    // frames within one video are byte-distinct; equal-text twins share
    // ALL frames; different-text same-length docs share none
    val all = Multimodal.videoFrameFeatures(media, stride = 1).toDF()
    val byDoc = all.select("doc_id", "frame_hash").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert(byDoc(0L).size.toLong === meta(0L).n_frames)
    assert(byDoc(0L) === byDoc(100L))
    assert(byDoc(0L).intersect(byDoc(2L)).isEmpty)
    val pairs = Multimodal.videoNearDupPairs(all, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((0L, 100L, meta(0L).n_frames)))
    // hot-frame gate: a frame present in more videos than the cap is a
    // stop-word — with the cap below the twin multiplicity no pair
    // survives (the shared frames are exactly the ubiquitous ones)
    assert(Multimodal.videoNearDupPairs(all, minShared = 2,
      maxVideosPerFrame = 1).collect().isEmpty)
  }

  test("videoSharedClips: islands separate contiguous clips from scattered hits") {
    // synthetic frame table — the operator is pure dataframe logic over
    // (doc_id, frame_idx, frame_hash); hashes stand in for digests.
    // video 1 vs 2: frames 2..4 of 1 appear at 0..2 of 2 (one clip),
    // plus an isolated shared frame at (7, 9) — island of 1, dropped.
    // video 1 vs 3: same THREE hashes but scattered (0,3,6) — every
    // island is length 1 at a different offset, so no clip row.
    val rows = Seq(
      (1L, 0, "u0"), (1L, 1, "u1"), (1L, 2, "A"), (1L, 3, "B"),
      (1L, 4, "C"), (1L, 5, "u5"), (1L, 6, "u6"), (1L, 7, "X"),
      (2L, 0, "A"), (2L, 1, "B"), (2L, 2, "C"), (2L, 3, "v3"),
      (2L, 9, "X"),
      (3L, 0, "A"), (3L, 3, "B"), (3L, 6, "C"))
      .toDF("doc_id", "frame_idx", "frame_hash")
    val clips = Multimodal.videoSharedClips(rows, minRun = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3), r.getLong(4)))
    assert(clips.toSeq === Seq((1L, 2L, 2, 0, 3L)))
    // minRun = 1 also surfaces the isolated hit and the scattered
    // singles — count-level overlap, no longer clip-shaped
    val loose = Multimodal.videoSharedClips(rows, minRun = 1)
      .collect()
    // (1,2): the clip + isolated X; (1,3) and (2,3): three scattered
    // singles each — A/B/C land at pairwise-different offsets
    assert(loose.length === 2 + 3 + 3)
    // the ubiquitous-frame gate drops hashes shared too widely: with a
    // cap of 1 every shared hash is boilerplate and nothing survives
    assert(Multimodal.videoSharedClips(rows, minRun = 1,
      maxVideosPerFrame = 1).collect().isEmpty)
  }

  test("PPM round trip, comments, and malformed headers") {
    val ppm = MediaCodec.encodePpm(320, 200, data)
    val h = MediaCodec.decode(ppm)
    assert(h.media_type === "image/ppm")
    assert(h.width === 320 && h.height === 200)
    assert(h.data_offset === "P6\n320 200\n255\n".length)
    assert(h.data_len === data.length.toLong)
    // comments between tokens are legal P6
    val commented = ("P6\n# made by hand\n17 9\n# maxval next\n255\n"
      .getBytes(US_ASCII) ++ data)
    val hc = MediaCodec.decode(commented)
    assert(hc.width === 17 && hc.height === 9)
    assert(hc.data_len === data.length.toLong)
    // zero width is malformed
    assert(MediaCodec.decode("P6\n0 5\n255\n".getBytes(US_ASCII))
      === MediaCodec.Unknown)
  }

  test("PNG round trip: chunk walk, CRC verification, IDAT inflate") {
    val png = MediaCodec.encodePng(31, 7, data)
    val h = MediaCodec.decode(png)
    assert(h.media_type === "image/png")
    assert(h.width === 31 && h.height === 7 && h.n_frames === 1L)
    assert(h.data_offset === 41) // signature 8 + IHDR 25 + IDAT len/type 8
    assert(h.data_len === data.length.toLong) // INFLATED length
    assert(png.length === 68 + data.length)   // stored-block framing
    assert(MediaCodec.contentBytes(png, h).toSeq === data.toSeq)
    // flip one IDAT payload byte: CRC check must reject the whole blob
    val corrupt = png.clone()
    corrupt(45) = (corrupt(45) ^ 0x01).toByte
    assert(MediaCodec.decode(corrupt) === MediaCodec.Unknown)
    // empty content still a valid PNG (one empty final stored block)
    val empty = MediaCodec.encodePng(3, 3, Array.emptyByteArray)
    assert(MediaCodec.decode(empty).data_len === 0L)
    assert(empty.length === 68)
  }

  test("JPEG: marker walk finds SOF dims; entropy stream untouched") {
    // hand-built marker stream: SOI, APP0 (skippable), SOF0, EOI
    def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0xff.toByte, 0xd8.toByte)) // SOI
    out.write(Array[Byte](0xff.toByte, 0xe0.toByte)) // APP0
    out.write(be16(7)); out.write("JFIF\u0000".getBytes(US_ASCII))
    out.write(Array[Byte](0xff.toByte, 0xc0.toByte)) // SOF0 (baseline)
    out.write(be16(11))     // length incl. itself
    out.write(8)            // precision
    out.write(be16(480))    // height
    out.write(be16(640))    // width
    out.write(1)            // components
    out.write(Array[Byte](1, 0x11, 0)) // component spec
    out.write(Array[Byte](0xff.toByte, 0xd9.toByte)) // EOI
    val h = MediaCodec.decode(out.toByteArray)
    assert(h.media_type === "image/jpeg")
    assert(h.width === 640 && h.height === 480)
    // EOI before any SOF -> Unknown
    assert(MediaCodec.decode(Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xd9.toByte)) === MediaCodec.Unknown)
  }

  test("PPM dimension overflowing Int is malformed, not truncated") {
    // 21474836470 = 10 * (Int.MaxValue + ~5): a naive accumulator stop
    // would truncate it into garbage width and misparse leftover digits
    val p = ("P6\n21474836470 5\n255\n".getBytes(US_ASCII) ++ data)
    assert(MediaCodec.decode(p) === MediaCodec.Unknown)
  }

  test("JPEG fill bytes (0xFF padding runs) before markers are skipped") {
    def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0xff.toByte, 0xd8.toByte)) // SOI
    // two fill bytes, then SOF0 — spec-legal padding a strict walk rejects
    out.write(Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, 0xc0.toByte))
    out.write(be16(11)); out.write(8)
    out.write(be16(480)); out.write(be16(640))
    out.write(1); out.write(Array[Byte](1, 0x11, 0))
    val h = MediaCodec.decode(out.toByteArray)
    assert(h.media_type === "image/jpeg")
    assert(h.width === 640 && h.height === 480)
  }

  test("PNG zlib bomb: inflated stream far beyond IHDR geometry is rejected") {
    // 1x1 image claiming a deflate stream that inflates to 1 MB: the
    // geometry-derived cap (~1 KB for 1x1) must refuse before allocating
    val crc = new java.util.zip.CRC32
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(ctype: String, body: Array[Byte]): Unit = {
      out.write(be32(body.length), 0, 4)
      val t = ctype.getBytes(US_ASCII)
      out.write(t, 0, 4); out.write(body, 0, body.length)
      crc.reset(); crc.update(t); crc.update(body)
      out.write(be32(crc.getValue.toInt), 0, 4)
    }
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      0, 8)
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(1).putInt(1)
    ihdr.put(8.toByte).put(0.toByte)
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(new Array[Byte](1 << 20)) // 1 MB of zeros, ~1 KB deflated
    deflater.finish()
    val cbuf = new Array[Byte](1 << 16)
    val clen = deflater.deflate(cbuf)
    deflater.end()
    chunk("IDAT", java.util.Arrays.copyOf(cbuf, clen))
    chunk("IEND", Array.emptyByteArray)
    assert(MediaCodec.decode(out.toByteArray) === MediaCodec.Unknown)
  }

  test("decodeWithContent inflates PNG once and matches contentBytes") {
    val png = MediaCodec.encodePng(31, 7, data)
    val (h, content) = MediaCodec.decodeWithContent(png)
    assert(h.media_type === "image/png")
    assert(content.toSeq === data.toSeq)
    // non-PNG: content is null — addressable in place via the header
    val bmp = MediaCodec.encodeBmp(4, 4, data)
    val (hb, cb) = MediaCodec.decodeWithContent(bmp)
    assert(hb.media_type === "image/bmp" && cb === null)
  }

  test("decode is total: garbage, truncated, and empty inputs") {
    assert(MediaCodec.decode(null) === MediaCodec.Unknown)
    assert(MediaCodec.decode(Array.emptyByteArray) === MediaCodec.Unknown)
    assert(MediaCodec.decode("no magic here".getBytes(UTF_8))
      === MediaCodec.Unknown)
    assert(MediaCodec.decode(Array[Byte]('B', 'M')) === MediaCodec.Unknown)
    assert(MediaCodec.decode("RIFFxxxxWAVE".getBytes(US_ASCII))
      === MediaCodec.Unknown) // no fmt/data chunks
    // BMP claiming a pixel offset beyond the payload
    val bad = MediaCodec.encodeBmp(4, 4, Array.emptyByteArray)
    bad(10) = 99
    assert(MediaCodec.decode(bad) === MediaCodec.Unknown)
  }

  test("encodeCorpus emits the claimed container; detection matches claim") {
    val docs = Seq((0L, "alpha"), (1L, "beta beta"), (2L, "gamma"),
      (3L, "delta"), (4L, ""), (5L, "epsilon zeta"))
      .toDF("doc_id", "text")
    val got = Multimodal.decodeMedia(Multimodal.encodeCorpus(docs))
      .collect().map(m => m.doc_id -> m).toMap
    assert(got(0L).media_type === "image/bmp")
    assert(got(1L).media_type === "audio/wav")
    assert(got(2L).media_type === "image/ppm")
    assert(got(3L).media_type === "image/png")
    assert(got(4L).media_type === "image/bmp") // empty content, valid header
    assert(got(4L).data_len === 0L)
    // WAV frames: n=9 bytes, channels=1+9%2=2, 16-bit -> 9 div 4 = 2
    assert(got(1L).n_frames === 2L)
    // PNG data hash is over the INFLATED content == the original text
    assert(got(3L).data_len === 5L)
    val claimed = Multimodal.encodeCorpus(docs).collect()
      .map(m => m.doc_id -> m.media_type).toMap
    assert(got.forall { case (id, m) => m.media_type === claimed(id) })
  }

  test("aHash: 64 bits, uniform image all-zero, identical content identical hash, wav skipped") {
    // ids 0/4/8 -> bmp, 2 -> ppm, 1 -> wav (excluded from image hashing).
    // For the all-zero check the raster must fit EXACTLY (3·w·h == n):
    // a ceil-rounded height leaves partial bottom cells whose lower
    // values pull the mean under the full cells — a real property of
    // the hash, not a bug (the 375-image oracle pins it corpus-wide).
    val nBmp = (100 to 20000).find(n => n % (3 * (16 + n % 97)) == 0).get
    val nPpm = (100 to 20000).find(n => n % (3 * (8 + n % 61)) == 0).get
    val uniB = "a" * nBmp
    val docs = Seq((0L, uniB), (4L, uniB), (8L, "b" * 300 + "a" * 300),
      (2L, "a" * nPpm), (1L, uniB)).toDF("doc_id", "text")
    val h = Multimodal.aHashImages(Multimodal.encodeCorpus(docs))
      .collect().map(r => r.doc_id -> r).toMap
    assert(!h.contains(1L), "wav must not be image-hashed")
    h.values.foreach { r =>
      assert(r.ahash.length === 64 && r.ahash.forall(c => c == '0' || c == '1'))
      assert(r.n_ones === r.ahash.count(_ == '1').toLong)
    }
    // exactly-filled uniform raster: every cell equals the mean ->
    // strict > never fires, in both containers
    assert(h(0L).ahash === "0" * 64)
    assert(h(2L).ahash === "0" * 64)
    // identical text in the same container -> identical hash
    assert(h(0L).ahash === h(4L).ahash)
    // half-bright image: some cells above the mean
    assert(h(8L).n_ones > 0)
  }

  test("aHashNearPairs: pigeonhole recall at the bound, per-block spread escapes the gate") {
    val zeros = "0" * 64
    val flip2 = "11" + "0" * 62                    // hamming 2, block 0 only
    val spread = ("1" + "0" * 15) * 4              // hamming 4, one per block
    val hashed = Seq((0L, zeros), (1L, zeros), (2L, spread), (3L, flip2))
      .toDF("doc_id", "ahash")
    val pairs = Multimodal.aHashNearPairs(hashed, maxHamming = 3, blocks = 4)
      .as[(Long, Long, Long)].collect().toSet
    // exact dup + the 2-bit flip pair with both zeros rows; the 4-bit
    // spread differs in EVERY block -> no candidate (and hamming 4 > 3
    // would drop it anyway — the gate never sees it at all)
    assert(pairs === Set((0L, 1L, 0L), (0L, 3L, 2L), (1L, 3L, 2L)))
  }

  test("audioEnvelope: frame partition exact, uniform all-zero, loud half flagged") {
    // id 1/5 -> wav; 320 = 16·20 bytes -> every frame exactly 20 bytes
    val docs = Seq((1L, "a" * 320), (5L, "a" * 160 + "z" * 160),
      (0L, "a" * 320)).toDF("doc_id", "text")
    val e = Multimodal.audioEnvelope(Multimodal.encodeCorpus(docs), frames = 16)
      .collect().map(r => r.doc_id -> r).toMap
    assert(!e.contains(0L), "images must not be audio-enveloped")
    assert(e(1L).envelope === "0" * 16)
    assert(e(1L).energy === 320L * 'a'.toLong)
    // back half louder ('z' > 'a'): exactly the last 8 frames flag
    assert(e(5L).envelope === "0" * 8 + "1" * 8)
    assert(e(5L).n_ones === 8L)
  }

  test("hammingNearPairs generalizes over signature width and column name") {
    // 16-bit signatures in a non-default column, 4 blocks of 4: the
    // same pigeonhole contract as the 64-bit image path. hamming-2
    // flip confined to block 0 -> found; one flipped bit in EVERY
    // block -> no shared block, never a candidate.
    val zeros = "0" * 16
    val flip2 = "11" + "0" * 14
    val spread = ("1000") * 4
    val sigs = Seq((0L, zeros), (1L, zeros), (2L, spread), (3L, flip2))
      .toDF("doc_id", "envelope")
    val pairs = Multimodal.hammingNearPairs(sigs, "doc_id", "envelope",
        bits = 16, maxHamming = 2, blocks = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L, 0L), (0L, 3L, 2L), (1L, 3L, 2L)))
    // parameter misuse is rejected: blocks must divide bits, and
    // maxHamming >= blocks would break the pigeonhole recall guarantee
    intercept[IllegalArgumentException] {
      Multimodal.hammingNearPairs(sigs, "doc_id", "envelope",
        bits = 16, maxHamming = 2, blocks = 5)
    }
    intercept[IllegalArgumentException] {
      Multimodal.hammingNearPairs(sigs, "doc_id", "envelope",
        bits = 16, maxHamming = 4, blocks = 4)
    }
  }

  private def pcm16(samples: Seq[Int]): Array[Byte] =
    samples.flatMap(s =>
      Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray

  test("audioSpectralPrints: WHT band layout, HK sign bits, signed LE, stereo ch0") {
    import graft.multimodal.MediaRecord
    // three constant 16-sample frames (levels 1, 3, 2): all spectral
    // energy in coefficient 0 (band 0), so only bit 0 can fire and it
    // tracks the frame-energy step sign; frame 0 emits nothing
    val mono = Seq.fill(16)(1) ++ Seq.fill(16)(3) ++ Seq.fill(16)(2)
    val dsM = spark.createDataset(Seq(MediaRecord(
      1L, MediaCodec.encodeWav(1, 8000, 16, pcm16(mono)), "audio/wav")))
    val outM = Multimodal.audioSpectralPrints(dsM, frameLen = 16, bands = 8)
      .collect().sortBy(_.frame_idx)
    assert(outM.map(_.frame_idx).toSeq === Seq(1, 2))
    assert(outM(0).print === "1000000") // (16·3)² > (16·1)²
    assert(outM(1).print === "0000000") // (16·2)² < (16·3)²
    assert(outM(0).energy === 48L * 48L) // W[0] = 16·3, all other coeffs 0
    // band indexing: x[j] = 5·(−1)^popcount(j&13) concentrates W[13]
    // (band 6 of 8 at width 2), then a constant-2 frame moves the
    // energy to band 0 — bits 0, 5, 6 are each hand-derivable
    val f0 = (0 until 16).map(j =>
      if (Integer.bitCount(j & 13) % 2 == 0) 5 else -5)
    val banded = f0 ++ Seq.fill(16)(2)
    val dsB = spark.createDataset(Seq(MediaRecord(
      2L, MediaCodec.encodeWav(1, 8000, 16, pcm16(banded)), "audio/wav")))
    val outB = Multimodal.audioSpectralPrints(dsB, frameLen = 16, bands = 8)
      .collect()
    assert(outB.length === 1 && outB(0).frame_idx === 1)
    // E0 = [0,…,0, 6400(b6), 0]; E1 = [1024(b0), 0,…]:
    // b0: (1024−0)−(0−0)=+ → 1; b5: (0−0)−(0−6400)=+ → 1;
    // b6: (0−0)−(6400−0)=− → 0; others 0−0 → 0
    assert(outB(0).print === "1000010")
    assert(outB(0).energy === 1024L)
    // signed 16-bit LE: constant −256 (bytes 00 FF) → W[0] = −4096,
    // energy (−4096)² — an unsigned read would square 65280·16 instead
    val dsN = spark.createDataset(Seq(MediaRecord(
      3L, MediaCodec.encodeWav(1, 8000, 16, pcm16(Seq.fill(32)(-256))),
      "audio/wav")))
    val outN = Multimodal.audioSpectralPrints(dsN).collect()
    assert(outN.length === 1 && outN(0).energy === 4096L * 4096L)
    // stereo: channel 0 carries the mono fixture, channel 1 loud junk —
    // prints must equal the mono run (channel-0 selection, blockAlign 4)
    val stereo = mono.zipWithIndex.flatMap { case (s, i) =>
      Seq(s, 999 - i)
    }
    val dsS = spark.createDataset(Seq(MediaRecord(
      4L, MediaCodec.encodeWav(2, 8000, 16, pcm16(stereo)), "audio/wav")))
    val outS = Multimodal.audioSpectralPrints(dsS).collect().sortBy(_.frame_idx)
    assert(outS.map(p => (p.frame_idx, p.print, p.energy)).toSeq ===
      outM.map(p => (p.frame_idx, p.print, p.energy)).toSeq)
    // shorter than two complete frames (31 samples) emits nothing, and
    // non-audio payloads are skipped entirely
    val dsT = spark.createDataset(Seq(
      MediaRecord(5L, MediaCodec.encodeWav(1, 8000, 16,
        pcm16(Seq.fill(31)(7))), "audio/wav"),
      MediaRecord(6L, MediaCodec.encodeBmp(4, 4, Array.fill(48)(1.toByte)),
        "image/bmp")))
    assert(Multimodal.audioSpectralPrints(dsT).collect().isEmpty)
    // parameter misuse rejected: non-power-of-two frame, non-dividing bands
    intercept[IllegalArgumentException] {
      Multimodal.audioSpectralPrints(dsM, frameLen = 24)
    }
    intercept[IllegalArgumentException] {
      Multimodal.audioSpectralPrints(dsM, frameLen = 16, bands = 3)
    }
  }

  test("audioNearDupPairs: shingled print join, minShared, hot-shingle gate") {
    // six prints → three 4-shingles per doc; docs 1 and 2 identical,
    // doc 3 shares only the first shingle (then diverges)
    val v = Seq("0000001", "0000010", "0000011", "0000100", "0000101",
      "0000110")
    val rows =
      v.zipWithIndex.map { case (p, i) => (1L, i + 1, p) } ++
        v.zipWithIndex.map { case (p, i) => (2L, i + 1, p) } ++
        (v.take(4) ++ Seq("1111111", "1111110")).zipWithIndex
          .map { case (p, i) => (3L, i + 1, p) }
    val prints = rows.toDF("doc_id", "frame_idx", "print")
    val pairs = Multimodal.audioNearDupPairs(prints, shingle = 4,
        minShared = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L, 3L)))
    // the shared first shingle lives in all 3 docs: maxDocsPerShingle=2
    // drops it as a stop-word, and the twins still match on the other 2
    val gated = Multimodal.audioNearDupPairs(prints, shingle = 4,
        minShared = 2, maxDocsPerShingle = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(gated === Set((1L, 2L, 2L)))
    // minShared=1 surfaces the partial overlap too
    val loose = Multimodal.audioNearDupPairs(prints, shingle = 4,
        minShared = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(loose === Set((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }
  test("pdf: round-trip across compression and TJ strata, with escapes") {
    import graft.multimodal.PdfCodec
    val pages = Seq(
      Seq("plain first line", "text (with parens) and \\ backslash"),
      Seq("second page here", "tail"))
    for (compress <- Seq(false, true); tj <- Seq(0, 2)) {
      val pdf = PdfCodec.encodePdf(pages, compress, tj)
      assert(PdfCodec.pdfText(pdf).get ===
        pages.map(_.mkString("\n")).toVector, s"c=$compress tj=$tj")
      val m = PdfCodec.pdfMeta(pdf).get
      assert(m.version === "1.4" && m.nPages === 2 && m.nObjects === 7)
      assert(m.compressed === compress && !m.encrypted)
    }
  }

  test("pdf: nested page tree and indirect /Length parse") {
    import graft.multimodal.PdfCodec
    import java.nio.charset.StandardCharsets.ISO_8859_1
    // hand-built: Pages -> [Pages -> [Page], Page], /Length indirect
    val body =
      """%PDF-1.7
        |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
        |2 0 obj << /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >> endobj
        |3 0 obj << /Type /Pages /Kids [4 0 R] /Count 1 >> endobj
        |4 0 obj << /Type /Page /Parent 3 0 R /Contents 6 0 R >> endobj
        |5 0 obj << /Type /Page /Parent 2 0 R /Contents 7 0 R >> endobj
        |6 0 obj << /Length 8 0 R >>
        |stream
        |BT (inner page) Tj ET
        |endstream
        |endobj
        |7 0 obj << /Length 19 >>
        |stream
        |BT (outer) Tj ET
        |endstream
        |endobj
        |8 0 obj 21 endobj
        |trailer << /Size 9 /Root 1 0 R >>
        |%%EOF
        |""".stripMargin
    val pdf = body.getBytes(ISO_8859_1)
    assert(PdfCodec.pdfText(pdf).get === Vector("inner page", "outer"))
    assert(PdfCodec.pdfMeta(pdf).get.nPages === 2)
  }

  test("pdf: damage and triage never throw") {
    import graft.multimodal.PdfCodec
    import java.nio.charset.StandardCharsets.ISO_8859_1
    assert(PdfCodec.pdfText("not a pdf at all".getBytes(ISO_8859_1)).isEmpty)
    assert(PdfCodec.pdfMeta(Array[Byte](1, 2, 3)).isEmpty)
    // oversized /Length -> that page extracts as "", document survives
    val ok = PdfCodec.encodePdf(Seq(Seq("good")), compress = false)
    val broken = new String(ok, ISO_8859_1)
      .replaceFirst("/Length \\d+", "/Length 999999")
      .getBytes(ISO_8859_1)
    assert(PdfCodec.pdfText(broken).get === Vector(""))
    // /Encrypt in the trailer is surfaced, not decrypted
    val enc = new String(ok, ISO_8859_1)
      .replace("/Root 1 0 R", "/Root 1 0 R /Encrypt 9 0 R")
      .getBytes(ISO_8859_1)
    assert(PdfCodec.pdfMeta(enc).get.encrypted)
  }

  test("pdf: hostile lexer bytes never throw (hex junk, bare signs, overflow)") {
    import graft.multimodal.PdfCodec
    import java.nio.charset.StandardCharsets.ISO_8859_1
    val ok = PdfCodec.encodePdf(Seq(Seq("good line")), compress = false)
    val okText = PdfCodec.pdfText(ok).get
    // invalid hex-string chars inside an object body: <XYZ>
    val hexJunk = new String(ok, ISO_8859_1)
      .replace("/Type /Catalog", "/Type /Catalog /ID <XY0Z9!>")
      .getBytes(ISO_8859_1)
    assert(PdfCodec.pdfText(hexJunk).get === okText)
    // degenerate numeric tokens '-' and '+.' where a number is expected
    val badNum = new String(ok, ISO_8859_1)
      .replace("/MediaBox [0 0 612 792]", "/MediaBox [- +. 612 792]")
      .getBytes(ISO_8859_1)
    assert(PdfCodec.pdfText(badNum).get === okText)
    // a >10-digit run right before 'obj' in stream-ish bytes: would
    // previously Integer-overflow-throw in scanObjects
    val overflow = (new String(ok, ISO_8859_1) +
      "\n99999999999 0 obj\n<< >>\nendobj\n").getBytes(ISO_8859_1)
    assert(PdfCodec.pdfText(overflow).get === okText)
    assert(PdfCodec.pdfMeta(overflow).nonEmpty)
    // pure binary garbage after a valid header must not throw either
    val garbage = ("%PDF-1.4\n" + new String(Array.tabulate(4096)(i =>
      ((i * 131 + 7) % 251).toByte).map(_.toChar))).getBytes(ISO_8859_1)
    PdfCodec.pdfText(garbage) // Option either way; must not throw
    PdfCodec.pdfMeta(garbage)
  }

  test("warc: framing, gzip members, mixed types, binary bodies, damage") {
    import graft.multimodal.WarcCodec
    import java.nio.charset.StandardCharsets.ISO_8859_1
    // binary body containing CRLFCRLF — Content-Length framing must not
    // be fooled by scan-for-separator
    val tricky = ("abc\r\n\r\ndef").getBytes(ISO_8859_1)
    val recs = Seq(
      ("https://a/1", 200, "text/html", "<p>one</p>".getBytes(ISO_8859_1)),
      ("https://a/2", 404, "text/plain", tricky))
    for (gz <- Seq(false, true)) {
      val out = WarcCodec.decodeWarc(WarcCodec.encodeWarc(recs, gz))
      assert(out.length === 2, s"gz=$gz")
      assert(out(0).targetUri === "https://a/1" && out(0).httpStatus === 200)
      assert(out(1).httpStatus === 404 &&
        out(1).body.toSeq === tricky.toSeq, s"gz=$gz")
    }
    // non-response record types are carried through with their type
    val mixed = ("WARC/1.0\r\nWARC-Type: request\r\n" +
      "WARC-Target-URI: https://a/3\r\nContent-Length: 4\r\n\r\nBODY\r\n\r\n")
      .getBytes(ISO_8859_1) ++ WarcCodec.encodeWarc(recs.take(1), false)
    val m = WarcCodec.decodeWarc(mixed)
    assert(m.map(_.warcType) === Seq("request", "response"))
    // truncation: the walk returns the parsed prefix, never throws
    val whole = WarcCodec.encodeWarc(recs, false)
    val cut = java.util.Arrays.copyOfRange(whole, 0, whole.length / 2)
    assert(WarcCodec.decodeWarc(cut).length <= 1)
    assert(WarcCodec.decodeWarc("garbage".getBytes(ISO_8859_1)).isEmpty)
  }

}
