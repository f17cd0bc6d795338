package graft

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

import graft.multimodal.{MediaCodec, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** Header-codec unit tests: encode → decode round trips, hand-built byte
  * fixtures (the parser must read the REAL offsets, not trust the
  * encoder), and corrupt-input totality — decode never throws.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val data = "the quick brown fox".getBytes(UTF_8)

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
      (3L, ""), (4L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val got = Multimodal.decodeMedia(Multimodal.encodeCorpus(docs))
      .collect().map(m => m.doc_id -> m).toMap
    assert(got(0L).media_type === "image/bmp")
    assert(got(1L).media_type === "audio/wav")
    assert(got(2L).media_type === "image/ppm")
    assert(got(3L).media_type === "image/bmp") // empty content, valid header
    assert(got(3L).data_len === 0L)
    // WAV frames: n=9 bytes, channels=1+9%2=2, 16-bit -> 9 div 4 = 2
    assert(got(1L).n_frames === 2L)
    val claimed = Multimodal.encodeCorpus(docs).collect()
      .map(m => m.doc_id -> m.media_type).toMap
    assert(got.forall { case (id, m) => m.media_type === claimed(id) })
  }
}
