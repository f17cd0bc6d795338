package graft.multimodal

import java.nio.charset.StandardCharsets.ISO_8859_1

/** WARC-style web-archive framing — the transport CommonCrawl ships:
  * one archive holds many response records, each a WARC header block +
  * an HTTP response (status line, headers, body), records separated by
  * blank lines, and — in the compressed variant — each record its own
  * gzip MEMBER so archives stay record-seekable. Pure JVM
  * (java.util.zip GZIP streams; multi-member concatenation read back
  * with a single member-walking loop).
  *
  * Reader subset (matches the writer plus the crawl shapes): WARC/1.0
  * and 1.1, `WARC-Type: response` records (others carried through with
  * their type so triage can count them), Content-Length framing,
  * optional per-record gzip members detected by magic. Damage is
  * per-record: a record whose framing fails ends the walk and returns
  * what parsed — never an exception.
  *
  * 100 TB posture: the unit of parallelism is one archive per row
  * (the library's opaque-binary-column model); record parsing is
  * map-side byte work. A real deployment points
  * `spark.sql.files.maxPartitionBytes` at the archive size so decode
  * batches bound memory, exactly like the JPEG/AVI paths.
  */
object WarcCodec {

  final case class WarcRecord(warcType: String, targetUri: String,
                              httpStatus: Int, contentType: String,
                              body: Array[Byte])

  private val CRLF = "\r\n"

  // ---- writer ---------------------------------------------------------

  private def httpPayload(status: Int, contentType: String,
                          body: Array[Byte]): Array[Byte] = {
    val head = s"HTTP/1.1 $status OK$CRLF" +
      s"Content-Type: $contentType$CRLF" +
      s"Content-Length: ${body.length}$CRLF$CRLF"
    head.getBytes(ISO_8859_1) ++ body
  }

  private def record(uri: String, status: Int, contentType: String,
                     body: Array[Byte]): Array[Byte] = {
    val payload = httpPayload(status, contentType, body)
    val head = s"WARC/1.0$CRLF" +
      s"WARC-Type: response$CRLF" +
      s"WARC-Target-URI: $uri$CRLF" +
      s"Content-Type: application/http;msgtype=response$CRLF" +
      s"Content-Length: ${payload.length}$CRLF$CRLF"
    head.getBytes(ISO_8859_1) ++ payload ++ (CRLF + CRLF).getBytes(ISO_8859_1)
  }

  private def gzipMember(raw: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(raw); gz.finish(); gz.close()
    bos.toByteArray
  }

  /** One archive from (uri, status, contentType, body) tuples;
    * `gzipPerRecord` wraps each record in its own gzip member.
    */
  def encodeWarc(records: Seq[(String, Int, String, Array[Byte])],
                 gzipPerRecord: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(4096)
    records.foreach { case (uri, status, ct, body) =>
      val r = record(uri, status, ct, body)
      out.write(if (gzipPerRecord) gzipMember(r) else r)
    }
    out.toByteArray
  }

  // ---- reader ---------------------------------------------------------

  private def isGzip(p: Array[Byte]): Boolean =
    p.length > 2 && (p(0) & 0xff) == 0x1f && (p(1) & 0xff) == 0x8b

  private val MaxInflate = 256L << 20

  /** Concatenated gzip members → plain bytes (Java's GZIPInputStream
    * walks members natively; capped against bombs).
    */
  private def gunzipAll(p: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(p.length * 3 + 64)
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(p))
    val buf = new Array[Byte](8192)
    try {
      var k = in.read(buf)
      while (k >= 0) {
        out.write(buf, 0, k)
        if (out.size() > MaxInflate) return None
        k = in.read(buf)
      }
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }
    finally in.close()
  }

  private def headerBlock(p: Array[Byte], from: Int): Option[(Map[String, String], Int)] = {
    var i = from
    // skip leading blank lines between records
    while (i + 1 < p.length && (p(i) == '\r' || p(i) == '\n')) i += 1
    if (i >= p.length) return None
    var end = i
    while (end + 3 < p.length && !(p(end) == '\r' && p(end + 1) == '\n' &&
      p(end + 2) == '\r' && p(end + 3) == '\n')) end += 1
    if (end + 3 >= p.length) return None
    val lines = new String(p, i, end - i, ISO_8859_1).split("\r\n")
    val kv = lines.drop(1).flatMap { l =>
      val c = l.indexOf(':')
      if (c > 0) Some(l.substring(0, c).trim -> l.substring(c + 1).trim)
      else None
    }.toMap
    Some((kv + ("_first" -> lines.head), end + 4))
  }

  /** All records of one archive (gzip-member or plain), in order. */
  def decodeWarc(p0: Array[Byte]): Seq[WarcRecord] = {
    val p = if (isGzip(p0)) gunzipAll(p0).getOrElse(return Seq.empty)
            else p0
    val out = Seq.newBuilder[WarcRecord]
    var i = 0
    var guard = 0
    while (i < p.length && guard < 1000000) {
      guard += 1
      headerBlock(p, i) match {
        case Some((warc, bodyStart)) if warc("_first").startsWith("WARC/") =>
          val len = warc.get("Content-Length").flatMap(_.toIntOption)
            .getOrElse(return out.result())
          if (bodyStart + len > p.length) return out.result()
          val payload = java.util.Arrays.copyOfRange(p, bodyStart,
            bodyStart + len)
          val wtype = warc.getOrElse("WARC-Type", "")
          val uri = warc.getOrElse("WARC-Target-URI", "")
          if (wtype == "response") {
            headerBlock(payload, 0) match {
              case Some((http, hBodyStart)) =>
                val status = http("_first").split(" ")
                  .lift(1).flatMap(_.toIntOption).getOrElse(0)
                out += WarcRecord(wtype, uri, status,
                  http.getOrElse("Content-Type", ""),
                  java.util.Arrays.copyOfRange(payload, hBodyStart,
                    payload.length))
              case None =>
                out += WarcRecord(wtype, uri, 0, "", payload)
            }
          } else out += WarcRecord(wtype, uri, 0, "", payload)
          i = bodyStart + len
        case _ => return out.result()
      }
    }
    out.result()
  }
}
