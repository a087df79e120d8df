package graft.extract

import scala.collection.mutable

/** The non-HTML payload branch of the extraction pipeline: minimal,
  * dependency-free PDF text extraction. The reference (lol-html) has no
  * PDF semantics — this branch exists because the north rule's pipeline
  * must route non-HTML payloads somewhere deterministic instead of
  * mis-parsing them as markup.
  *
  * Scope (clearly fenced):
  *  - content streams: raw or FlateDecode (JDK Inflater); other filters
  *    (DCT, LZW, crypt) are skipped;
  *  - text operators: `(...) Tj`, `(...) '`, `[(a) -120 (b)] TJ` inside
  *    BT/ET blocks; hex strings `<...>` and font/encoding CMaps are NOT
  *    interpreted (bytes are passed through as Latin-1);
  *  - output spans carry the byte offset of the string literal within the
  *    (decoded) content stream, namespaced per stream by stream index.
  *
  * A production deployment swaps this for a real PDF library behind the
  * same `extract(bytes): ExtractResult` signature.
  */
object PdfTextExtract {

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes.length >= 5 && bytes(0) == '%' && bytes(1) == 'P' &&
      bytes(2) == 'D' && bytes(3) == 'F' && bytes(4) == '-'

  def extract(bytes: Array[Byte]): ExtractResult = {
    val spans = mutable.ArrayBuffer[Span]()
    var error: String = null
    try {
      var from = 0
      var streamIdx = 0
      var more = true
      while (more) {
        val s = indexOf(bytes, "stream", from)
        if (s < 0) more = false
        else {
          var cs = s + "stream".length
          if (cs < bytes.length && bytes(cs) == '\r') cs += 1
          if (cs < bytes.length && bytes(cs) == '\n') cs += 1
          val e = indexOf(bytes, "endstream", cs)
          if (e < 0) more = false
          else {
            val raw = java.util.Arrays.copyOfRange(bytes, cs, e)
            val content = inflateOrRaw(raw)
            extractTextOps(content, streamIdx, spans)
            streamIdx += 1
            from = e + "endstream".length
          }
        }
      }
    } catch {
      case e: Exception => error = s"pdf_error:${e.getClass.getSimpleName}"
    }
    ExtractResult(spans.toIndexedSeq, error)
  }

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val n = needle.getBytes("ISO-8859-1")
    var i = math.max(0, from)
    val end = hay.length - n.length
    while (i <= end) {
      var j = 0
      while (j < n.length && hay(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i += 1
    }
    -1
  }

  private def inflateOrRaw(raw: Array[Byte]): Array[Byte] = {
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(raw)
      val out = new java.io.ByteArrayOutputStream(raw.length * 3)
      val buf = new Array[Byte](8192)
      var n = inf.inflate(buf)
      if (n == 0 && inf.needsInput) return raw // not deflate data
      while (n > 0) {
        out.write(buf, 0, n)
        n = if (inf.finished()) 0 else inf.inflate(buf)
      }
      inf.end()
      val res = out.toByteArray
      if (res.nonEmpty) res else raw
    } catch { case _: Exception => raw }
  }

  /** Scan BT..ET blocks for Tj / ' / TJ string operands. */
  private def extractTextOps(c: Array[Byte], streamIdx: Int,
                             out: mutable.ArrayBuffer[Span]): Unit = {
    var i = 0
    var inText = false
    while (i < c.length) {
      if (!inText) {
        val bt = indexOf(c, "BT", i)
        if (bt < 0) return
        inText = true
        i = bt + 2
      } else {
        c(i) match {
          case '(' =>
            val (str, next) = readPdfString(c, i)
            var k = skipWs(c, next)
            val isShow =
              (k + 1 < c.length && c(k) == 'T' && c(k + 1) == 'j') ||
                (k < c.length && c(k) == '\'')
            if (isShow) out += Span("text", str, "", streamIdx * 1000000 + i)
            i = next
          case '[' =>
            // candidate TJ array: collect strings up to ']', emit if 'TJ'
            val pending = mutable.ArrayBuffer[(String, Int)]()
            var k = i + 1
            var closed = -1
            while (closed < 0 && k < c.length) {
              c(k) match {
                case '(' =>
                  val (str, next) = readPdfString(c, k)
                  pending += ((str, k))
                  k = next
                case ']' => closed = k
                case 'B' | 'E' => closed = c.length // not an array we understand
                case _ => k += 1
              }
            }
            if (closed >= 0 && closed < c.length) {
              val op = skipWs(c, closed + 1)
              if (op + 1 < c.length && c(op) == 'T' && c(op + 1) == 'J')
                pending.foreach { case (str, at) =>
                  out += Span("text", str, "", streamIdx * 1000000 + at)
                }
              i = closed + 1
            } else i += 1
          case 'E' if i + 1 < c.length && c(i + 1) == 'T' =>
            inText = false
            i += 2
          case _ => i += 1
        }
      }
    }
  }

  @inline private def skipWs(c: Array[Byte], from: Int): Int = {
    var k = from
    while (k < c.length && (c(k) == ' ' || c(k) == '\n' || c(k) == '\r' || c(k) == '\t')) k += 1
    k
  }

  /** PDF string literal with escapes and balanced parens. Returns
    * (decoded text, index after closing paren).
    */
  private def readPdfString(c: Array[Byte], start: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = start + 1
    var depth = 1
    while (i < c.length && depth > 0) {
      c(i) match {
        case '\\' if i + 1 < c.length =>
          c(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '(' => sb.append('('); i += 2
            case ')' => sb.append(')'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case d if d >= '0' && d <= '7' =>
              var v = 0
              var n = 0
              i += 1
              while (n < 3 && i < c.length && c(i) >= '0' && c(i) <= '7') {
                v = v * 8 + (c(i) - '0'); i += 1; n += 1
              }
              sb.append(v.toChar)
            case other => sb.append(other.toChar); i += 2
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(')')
          i += 1
        case b => sb.append((b & 0xff).toChar); i += 1
      }
    }
    (sb.toString, i)
  }
}

/** Payload router: sniffs the document payload and dispatches to the
  * HTML engine or the PDF branch — the pipeline's single entry point for
  * heterogeneous corpora.
  */
final class DocRouter(policy: ExtractPolicy = ExtractPolicy.Default) {
  private val html = new Extractor(policy)

  def extract(bytes: Array[Byte]): ExtractResult =
    if (PdfTextExtract.isPdf(bytes)) PdfTextExtract.extract(bytes)
    else html.extractHtml(bytes, Vector.empty, Vector.empty)
}
