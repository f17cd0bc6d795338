package graft.multimodal

import java.nio.charset.StandardCharsets.ISO_8859_1

/** Minimal PDF writer + text extractor — the "3% of a web crawl"
  * document format a training-data pipeline must turn into text.
  * Pure JVM (java.util.zip for FlateDecode, same dependency budget as
  * the PNG path).
  *
  * Writer: classic PDF 1.4 — Catalog → Pages → Page objects, one
  * content stream per page (`BT /F1 12 Tf .. Td (..) Tj .. ET`),
  * optional FlateDecode, classic xref table + trailer. Every byte
  * offset in the xref is real, so any conformant reader accepts the
  * fixture.
  *
  * Reader (documented subset, matching the writer plus the common
  * crawl shapes): classic `N G obj … endobj` bodies located by a
  * single scan (no incremental-update chains), direct or indirect
  * /Length, /Filter /FlateDecode or none, a recursive /Pages tree,
  * /Contents as one ref or an array of refs, and the text-show
  * operators Tj, ' and TJ. Text layout is NOT reconstructed (no
  * positioning math): each Tj/' emits one line, a TJ array emits its
  * strings concatenated — exactly the fidelity CCNet-class pipelines
  * extract before quality filtering. Object streams (/ObjStm) and
  * encryption are out of scope; [[pdfMeta]] surfaces /Encrypt so the
  * triage can say WHY a file yielded no text.
  *
  * 100 TB posture: both directions are per-row byte work inside
  * mapPartitions-style Dataset.map — no shuffle, no driver state; the
  * decode-bomb guard caps inflation at 64 MiB per stream before any
  * allocation, mirroring the JPEG/PNG guards.
  */
object PdfCodec {

  final case class PdfInfo(version: String, nPages: Int, nObjects: Int,
                           compressed: Boolean, encrypted: Boolean)

  private val MaxInflate = 64L << 20

  // ---- writer ---------------------------------------------------------

  /** Escape a text line into a PDF literal string. */
  private def esc(s: String): String =
    s.flatMap {
      case '('  => "\\("
      case ')'  => "\\)"
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case c    => c.toString
    }

  /** Content stream for one page: one `Tj` per line; lines where
    * `asTJ(i)` is true are emitted as a two-segment TJ array instead
    * (split at the first space, space carried in segment 1) — same
    * text, different operator, so decoders must handle both.
    */
  private[multimodal] def pageStream(lines: Seq[String],
                                     asTJ: Int => Boolean): Array[Byte] = {
    val sb = new StringBuilder("BT /F1 12 Tf 72 720 Td\n")
    lines.zipWithIndex.foreach { case (l, i) =>
      val cut = l.indexOf(' ')
      if (asTJ(i) && cut > 0)
        sb.append(s"[(${esc(l.substring(0, cut + 1))}) -250 (${
          esc(l.substring(cut + 1))})] TJ 0 -14 Td\n")
      else sb.append(s"(${esc(l)}) Tj 0 -14 Td\n")
    }
    sb.append("ET\n")
    sb.toString.getBytes(ISO_8859_1)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** One PDF from per-page line lists. `compress` flate-encodes every
    * content stream; `tjEvery` > 0 turns every tjEvery-th line of a
    * page into a TJ array.
    */
  def encodePdf(pages: Seq[Seq[String]], compress: Boolean,
                tjEvery: Int = 0): Array[Byte] = {
    require(pages.nonEmpty, "pdf needs at least one page")
    val out = new java.io.ByteArrayOutputStream(4096)
    def put(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val offsets = collection.mutable.ArrayBuffer[Int]()
    def beginObj(n: Int): Unit = { offsets += out.size(); put(s"$n 0 obj\n") }

    val nPages = pages.length
    val fontNum = 3 + 2 * nPages
    put("%PDF-1.4\n")
    beginObj(1); put("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2)
    put(s"<< /Type /Pages /Kids [${
      (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    }] /Count $nPages >>\nendobj\n")
    pages.zipWithIndex.foreach { case (lines, i) =>
      val pageNum = 3 + 2 * i
      beginObj(pageNum)
      put(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontNum 0 R >> >> " +
        s"/Contents ${pageNum + 1} 0 R >>\nendobj\n")
      val raw = pageStream(lines,
        j => tjEvery > 0 && (j + 1) % tjEvery == 0)
      val body = if (compress) deflate(raw) else raw
      beginObj(pageNum + 1)
      put(s"<< /Length ${body.length}" +
        (if (compress) " /Filter /FlateDecode" else "") + " >>\nstream\n")
      out.write(body)
      put("\nendstream\nendobj\n")
    }
    beginObj(fontNum)
    put("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    val xref = out.size()
    val n = offsets.length + 1
    put(s"xref\n0 $n\n0000000000 65535 f \n")
    offsets.foreach(o => put(f"$o%010d 00000 n \n"))
    put(s"trailer\n<< /Size $n /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  // ---- object model + parser ------------------------------------------

  private[multimodal] sealed trait PObj
  private[multimodal] case class PNum(v: Double) extends PObj
  private[multimodal] case class PName(v: String) extends PObj
  private[multimodal] case class PStr(v: Array[Byte]) extends PObj
  private[multimodal] case class PArr(v: Vector[PObj]) extends PObj
  private[multimodal] case class PDict(v: Map[String, PObj]) extends PObj
  private[multimodal] case class PRef(num: Int) extends PObj
  private[multimodal] case object PNull extends PObj

  /** Recursive-descent parser over a byte slice; returns (obj, next). */
  private final class Lexer(p: Array[Byte], var i: Int, end: Int) {
    private def ws(c: Byte) =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == 0 || c == 12
    def skipWs(): Unit = {
      while (i < end && (ws(p(i)) || p(i) == '%')) {
        if (p(i) == '%') while (i < end && p(i) != '\n' && p(i) != '\r') i += 1
        else i += 1
      }
    }
    private def delim(c: Byte) =
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' ||
        c == ']' || c == '/' || c == '%'
    def parse(): PObj = {
      skipWs()
      if (i >= end) return PNull
      p(i) match {
        case '/' =>
          i += 1; val s = i
          while (i < end && !ws(p(i)) && !delim(p(i))) i += 1
          PName(new String(p, s, i - s, ISO_8859_1))
        case '(' => parseString()
        case '[' =>
          i += 1
          val b = Vector.newBuilder[PObj]
          skipWs()
          while (i < end && p(i) != ']') { b += parse(); skipWs() }
          i += 1
          PArr(b.result())
        case '<' if i + 1 < end && p(i + 1) == '<' =>
          i += 2
          val m = Map.newBuilder[String, PObj]
          skipWs()
          while (i + 1 < end && !(p(i) == '>' && p(i + 1) == '>')) {
            parse() match {
              case PName(k) => m += (k -> parse())
              case _ => i = end // malformed dict: bail
            }
            skipWs()
          }
          i += 2
          PDict(m.result())
        case '<' => // hex string
          i += 1; val s = i
          while (i < end && p(i) != '>') i += 1
          // keep hex digits only: the spec ignores whitespace, and crawl
          // files contain arbitrary junk (<XYZ>) that must not throw
          val hex = new String(p, s, i - s, ISO_8859_1)
            .filter(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')
              || (c >= 'A' && c <= 'F'))
          i += 1
          val padded = if (hex.length % 2 == 1) hex + "0" else hex
          PStr(padded.grouped(2)
            .map(h => Integer.parseInt(h, 16).toByte).toArray)
        case c if (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.' =>
          val s = i
          while (i < end && ((p(i) >= '0' && p(i) <= '9') || p(i) == '+'
            || p(i) == '-' || p(i) == '.')) i += 1
          // degenerate tokens ('-', '+.', '1.2.3') appear in damaged
          // crawl bytes — toDoubleOption, never throw inside a Spark task
          val first = new String(p, s, i - s, ISO_8859_1).toDoubleOption
          // lookahead for "G R" (indirect reference)
          val save = i
          skipWs()
          val s2 = i
          while (i < end && p(i) >= '0' && p(i) <= '9') i += 1
          if (i > s2) {
            val save2 = i
            skipWs()
            if (i < end && p(i) == 'R' &&
              (i + 1 >= end || ws(p(i + 1)) || delim(p(i + 1)))) {
              i += 1
              return first.map(v => PRef(v.toInt)).getOrElse(PNull)
            }
            i = save2; i = save
          } else i = save
          first.map(PNum.apply).getOrElse(PNull)
        case 't' if end - i >= 4 => i += 4; PNum(1) // true
        case 'f' if end - i >= 5 => i += 5; PNum(0) // false
        case 'n' if end - i >= 4 => i += 4; PNull   // null
        case _ => i += 1; PNull
      }
    }
    private def parseString(): PStr = {
      i += 1
      val out = new java.io.ByteArrayOutputStream(64)
      var depth = 1
      while (i < end && depth > 0) {
        p(i) match {
          case '\\' if i + 1 < end =>
            i += 1
            p(i) match {
              case 'n' => out.write('\n'); i += 1
              case 'r' => out.write('\r'); i += 1
              case 't' => out.write('\t'); i += 1
              case 'b' => out.write('\b'); i += 1
              case 'f' => out.write(12); i += 1
              case d if d >= '0' && d <= '7' =>
                var v = 0; var k = 0
                while (k < 3 && i < end && p(i) >= '0' && p(i) <= '7') {
                  v = v * 8 + (p(i) - '0'); i += 1; k += 1
                }
                out.write(v & 0xff)
              case '\n' => i += 1 // line continuation
              case c => out.write(c); i += 1
            }
          case '(' => depth += 1; out.write('('); i += 1
          case ')' =>
            depth -= 1
            if (depth > 0) out.write(')')
            i += 1
          case c => out.write(c); i += 1
        }
      }
      PStr(out.toByteArray)
    }
  }

  // ---- document walk ---------------------------------------------------

  /** All classic `N G obj` bodies by one linear scan: objNum ->
    * (bodyStart, bodyEnd). Robust to files whose xref is damaged — the
    * crawl case — at the cost of ignoring incremental-update shadowing.
    */
  private def scanObjects(p: Array[Byte]): Map[Int, (Int, Int)] = {
    val out = collection.mutable.Map[Int, (Int, Int)]()
    var i = 0
    val n = p.length
    while (i + 3 < n) {
      if (p(i) == 'o' && p(i + 1) == 'b' && p(i + 2) == 'j' &&
        (i + 3 >= n || p(i + 3) < '0' || p(i + 3) > '9')) {
        // walk back: ws gen ws num
        var j = i - 1
        def back(pred: Byte => Boolean): Unit =
          while (j >= 0 && pred(p(j))) j -= 1
        back(c => c == ' ' || c == '\r' || c == '\n')
        val genEnd = j
        back(c => c >= '0' && c <= '9')
        if (j < genEnd) {
          back(c => c == ' ' || c == '\r' || c == '\n')
          val numEnd = j
          back(c => c >= '0' && c <= '9')
          // toIntOption: a >10-digit run in binary stream bytes before
          // 'obj' must not overflow-throw; skip the bogus match instead
          new String(p, j + 1, numEnd - j, ISO_8859_1).toIntOption match {
            case Some(num) =>
              var e = i + 3
              while (e + 6 <= n && !(p(e) == 'e' && p(e + 1) == 'n' &&
                p(e + 2) == 'd' && p(e + 3) == 'o' && p(e + 4) == 'b' &&
                p(e + 5) == 'j')) e += 1
              if (!out.contains(num)) out(num) = (i + 3, math.min(e, n))
              i = e
            case None => ()
          }
        }
      }
      i += 1
    }
    out.toMap
  }

  private def parseBody(p: Array[Byte], span: (Int, Int)): PObj =
    new Lexer(p, span._1, span._2).parse()

  private def resolve(o: PObj, p: Array[Byte],
                      objs: Map[Int, (Int, Int)]): PObj = o match {
    case PRef(n) => objs.get(n).map(parseBody(p, _)).getOrElse(PNull)
    case x => x
  }

  private def trailerDict(p: Array[Byte]): Option[PDict] = {
    val s = new String(p, ISO_8859_1)
    val t = s.lastIndexOf("trailer")
    if (t < 0) None
    else new Lexer(p, t + 7, p.length).parse() match {
      case d: PDict => Some(d)
      case _ => None
    }
  }

  /** Stream payload of a content object: dict + raw bytes between
    * `stream` and `endstream`, /Length direct or indirect, inflated if
    * /Filter /FlateDecode (64 MiB cap). Returns None on bombs/damage.
    */
  private def streamBytes(p: Array[Byte], span: (Int, Int),
                          objs: Map[Int, (Int, Int)]): Option[Array[Byte]] = {
    val lex = new Lexer(p, span._1, span._2)
    val dict = lex.parse() match {
      case d: PDict => d
      case _ => return None
    }
    // find "stream" keyword after the dict
    var i = lex.i
    val end = span._2
    while (i + 6 <= end && !(p(i) == 's' && p(i + 1) == 't' &&
      p(i + 2) == 'r' && p(i + 3) == 'e' && p(i + 4) == 'a' &&
      p(i + 5) == 'm')) i += 1
    if (i + 6 > end) return None
    i += 6
    if (i < end && p(i) == '\r') i += 1
    if (i < end && p(i) == '\n') i += 1
    val len = resolve(dict.v.getOrElse("Length", PNull), p, objs) match {
      case PNum(v) if v >= 0 && v <= end - i => v.toInt
      case _ => return None
    }
    val body = java.util.Arrays.copyOfRange(p, i, i + len)
    val flate = dict.v.get("Filter") match {
      case Some(PName("FlateDecode")) => true
      case Some(PArr(fs)) => fs.contains(PName("FlateDecode"))
      case _ => false
    }
    if (!flate) Some(body)
    else {
      val inf = new java.util.zip.Inflater()
      inf.setInput(body)
      val out = new java.io.ByteArrayOutputStream(body.length * 3 + 64)
      val buf = new Array[Byte](8192)
      try {
        while (!inf.finished() && !inf.needsInput()) {
          val k = inf.inflate(buf)
          if (k == 0 && !inf.finished()) return None
          out.write(buf, 0, k)
          if (out.size() > MaxInflate) return None
        }
        Some(out.toByteArray)
      } catch { case _: java.util.zip.DataFormatException => None }
      finally inf.end()
    }
  }

  /** Depth-first page refs under a /Pages node (crawl PDFs nest). */
  private def collectPages(node: PObj, p: Array[Byte],
                           objs: Map[Int, (Int, Int)],
                           depth: Int): Vector[PDict] = {
    if (depth > 16) return Vector.empty
    resolve(node, p, objs) match {
      case d: PDict =>
        d.v.get("Type") match {
          case Some(PName("Pages")) =>
            d.v.get("Kids") match {
              case Some(PArr(kids)) =>
                kids.toVector.flatMap(collectPages(_, p, objs, depth + 1))
              case _ => Vector.empty
            }
          case Some(PName("Page")) => Vector(d)
          case _ => Vector.empty
        }
      case _ => Vector.empty
    }
  }

  private def rootPages(p: Array[Byte],
                        objs: Map[Int, (Int, Int)]): Vector[PDict] = {
    val root = trailerDict(p).flatMap(_.v.get("Root"))
      .map(resolve(_, p, objs))
    val pagesNode = root match {
      case Some(d: PDict) => d.v.get("Pages")
      case _ => None
    }
    pagesNode.map(collectPages(_, p, objs, 0)).getOrElse(Vector.empty)
  }

  def isPdf(p: Array[Byte]): Boolean =
    p.length > 8 && p(0) == '%' && p(1) == 'P' && p(2) == 'D' &&
      p(3) == 'F' && p(4) == '-'

  def pdfMeta(p: Array[Byte]): Option[PdfInfo] = {
    if (!isPdf(p)) return None
    // crawl bytes are hostile: any residual parser edge degrades to None
    // (triaged as damaged) rather than failing the whole Spark task
    try {
      val version = new String(p, 5, 3, ISO_8859_1)
      val objs = scanObjects(p)
      val pages = rootPages(p, objs)
      val encrypted = trailerDict(p).exists(_.v.contains("Encrypt"))
      val compressed = new String(p, ISO_8859_1).contains("/FlateDecode")
      Some(PdfInfo(version, pages.length, objs.size, compressed, encrypted))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Text-show extraction from one content stream: Tj and ' emit one
    * line each, TJ emits its array's strings concatenated as one line.
    */
  private[multimodal] def streamText(cs: Array[Byte]): Vector[String] = {
    val lex = new Lexer(cs, 0, cs.length)
    val lines = Vector.newBuilder[String]
    var lastStr: Array[Byte] = null
    var lastArr: Vector[PObj] = null
    var i = 0
    while (lex.i < cs.length && i < 1000000) {
      i += 1
      lex.skipWs()
      if (lex.i >= cs.length) return lines.result()
      val c = cs(lex.i)
      if (c == '(' || c == '<' || c == '[' || c == '/' ||
        (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.') {
        lex.parse() match {
          case PStr(b) => lastStr = b; lastArr = null
          case PArr(a) => lastArr = a; lastStr = null
          case _ => ()
        }
      } else { // operator token
        val s = lex.i
        while (lex.i < cs.length && cs(lex.i) > ' ' && cs(lex.i) != '(' &&
          cs(lex.i) != '[' && cs(lex.i) != '/' && cs(lex.i) != '<') lex.i += 1
        val op = new String(cs, s, lex.i - s, ISO_8859_1)
        op match {
          case "Tj" | "'" if lastStr != null =>
            lines += new String(lastStr, ISO_8859_1)
          case "TJ" if lastArr != null =>
            lines += lastArr.collect { case PStr(b) =>
              new String(b, ISO_8859_1) }.mkString
          case _ => ()
        }
        if (lex.i == s) lex.i += 1 // safety: never stall
      }
    }
    lines.result()
  }

  /** Per-page text, lines joined with '\n'. None for non-PDF bytes;
    * pages whose content stream is damaged yield "" (attributable
    * downstream, does not fail the document).
    */
  def pdfText(p: Array[Byte]): Option[Vector[String]] = {
    if (!isPdf(p)) return None
    // same hostile-bytes posture as pdfMeta: degrade, never throw
    try {
      val objs = scanObjects(p)
      val pages = rootPages(p, objs)
      Some(pages.map { page =>
        val contentRefs = page.v.get("Contents") match {
          case Some(PRef(n)) => Vector(n)
          case Some(PArr(a)) => a.collect { case PRef(n) => n }.toVector
          case _ => Vector.empty
        }
        contentRefs
          .flatMap(n => objs.get(n).flatMap(streamBytes(p, _, objs)))
          .flatMap(streamText)
          .mkString("\n")
      })
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
