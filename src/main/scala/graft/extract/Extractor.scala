package graft.extract

import graft.core.{ParsingAmbiguityException, TextType}
import graft.rewrite._
import scala.collection.mutable

/** One output span: `kind` is "text" (extracted main content) or "media"
  * (passthrough placeholder). `offset` is the byte offset in the logical
  * concatenated HTML stream of the document. Matches the table schema in
  * BASELINE.json `input_hint`.
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** One input fragment: either an HTML text fragment or a media placeholder. */
final case class InFrag(isText: Boolean, text: String, mediaRef: String)

/** Extraction policy: which elements are boilerplate (removed with their
  * content), which text contexts count as content, and strictness of the
  * ambiguity guard. The default follows the north rule's strip list
  * (nav/footer/script/style) plus the obvious non-content containers.
  */
final case class ExtractPolicy(
    stripSelectors: Seq[String] = ExtractPolicy.DefaultStrip,
    keepRcData: Boolean = true, // textarea/title outside head
    keepCData: Boolean = true,  // CDATA in foreign content (svg/math usually stripped anyway)
    dropWhitespaceOnlyNodes: Boolean = true,
    strict: Boolean = true
) extends Serializable

object ExtractPolicy {
  val DefaultStrip: Seq[String] = Seq(
    "script", "style", "nav", "footer", "aside", "noscript",
    "iframe", "form", "template", "head", "svg", "math"
  )
  val Default: ExtractPolicy = ExtractPolicy()
}

/** Result of extracting one document. `error` is null on success; on a
  * strict-mode bail-out (parsing ambiguity) the spans produced before the
  * bail-out are kept and `error` carries the reason — a document never
  * fails the task (graceful bail-out, reference
  * /root/reference/src/rewriter/mod.rs:77-95).
  */
final case class ExtractResult(spans: IndexedSeq[Span], error: String)

/** Per-row main-content extractor over interleaved text+media documents.
  *
  * The document's text fragments are concatenated into one HTML byte
  * stream (fragment boundaries are invisible to parsing — chunk
  * invariance); media placeholders are recorded at their byte offsets.
  * The engine strips `policy.stripSelectors` subtrees and emits one text
  * span per retained text node; media spans survive iff they fall outside
  * every removed interval, and text nodes crossing a media offset are
  * split so document order is preserved.
  *
  * One instance per task / partition; NOT thread-safe; reused across rows.
  */
final class Extractor(policy: ExtractPolicy) {

  // removal intervals of the current doc (disjoint, increasing)
  private val removedFrom = new mutable.ArrayBuffer[Int](16)
  private val removedTo = new mutable.ArrayBuffer[Int](16)
  private var removing = false

  private object listener extends RewriteListener {
    override def onEmissionDisabled(pos: Int): Unit = {
      removing = true
      removedFrom += pos
    }
    override def onEmissionEnabled(pos: Int): Unit = {
      removing = false
      removedTo += pos
    }
  }

  // text nodes of the current doc as byte ranges
  private val nodeStarts = new mutable.ArrayBuffer[Int](64)
  private val nodeEnds = new mutable.ArrayBuffer[Int](64)
  private var curNodeStart = -1
  private var curNodeEnd = -1

  private def acceptType(tt: Int): Boolean =
    tt == TextType.Data ||
      (policy.keepRcData && tt == TextType.RCData) ||
      (policy.keepCData && tt == TextType.CDataSection)

  private val rewriter = new Rewriter(
    policy.stripSelectors.map(sel => sel -> ElementHandlers(element = el => el.remove())),
    docHandlers = Seq(DocHandlers(text = t => {
      if (!removing) {
        if (!t.lastInTextNode) {
          if (acceptType(t.textType) && t.sourceEnd > t.sourceStart) {
            if (curNodeStart < 0) curNodeStart = t.sourceStart
            curNodeEnd = t.sourceEnd
          }
        } else {
          if (curNodeStart >= 0) {
            nodeStarts += curNodeStart
            nodeEnds += curNodeEnd
            curNodeStart = -1
          }
        }
      } else if (t.lastInTextNode) curNodeStart = -1
    })),
    strict = policy.strict,
    listener = listener
  )

  /** Extract one document given its ordered input fragments. */
  def extract(frags: Iterable[InFrag]): ExtractResult = {
    // 1. concatenate text fragments; record media offsets
    var total = 0
    frags.foreach(f => if (f.isText) total += utf8Len(f.text))
    val html = new Array[Byte](total)
    val mediaRefs = new mutable.ArrayBuffer[String](4)
    val mediaOffsets = new mutable.ArrayBuffer[Int](4)
    var off = 0
    frags.foreach { f =>
      if (f.isText) {
        val b = f.text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        System.arraycopy(b, 0, html, off, b.length)
        off += b.length
      } else {
        mediaRefs += f.mediaRef
        mediaOffsets += off
      }
    }
    extractHtml(html, mediaRefs, mediaOffsets)
  }

  private def utf8Len(s: String): Int = {
    // fast path: count UTF-8 bytes without materializing
    var n = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      n += (if (c < 0x80) 1 else if (c < 0x800) 2 else if (Character.isHighSurrogate(c)) { i += 1; 4 } else 3)
      i += 1
    }
    n
  }

  /** Extract from a complete HTML byte stream plus media placements. */
  def extractHtml(html: Array[Byte], mediaRefs: collection.IndexedSeq[String],
                  mediaOffsets: collection.IndexedSeq[Int]): ExtractResult = {
    removedFrom.clear(); removedTo.clear(); removing = false
    nodeStarts.clear(); nodeEnds.clear(); curNodeStart = -1

    var error: String = null
    try rewriter.rewriteToBytes(html)
    catch {
      case e: ParsingAmbiguityException =>
        error = s"parsing_ambiguity:${e.tagName}"
        if (curNodeStart >= 0) { nodeStarts += curNodeStart; nodeEnds += curNodeEnd; curNodeStart = -1 }
      case e: Exception =>
        error = s"engine_error:${e.getClass.getSimpleName}"
    }
    if (removing) removedTo += html.length

    // 2. media survival: offset outside every removed interval
    val keptMediaIdx = new mutable.ArrayBuffer[Int](mediaRefs.size)
    var ri = 0
    var mi = 0
    while (mi < mediaOffsets.length) {
      val o = mediaOffsets(mi)
      while (ri < removedFrom.length && removedTo(ri) <= o) ri += 1
      val inRemoved = ri < removedFrom.length && removedFrom(ri) <= o && o < removedTo(ri)
      if (!inRemoved) keptMediaIdx += mi
      mi += 1
    }

    // 3. merge text nodes and media in document order, splitting nodes
    //    that contain a media offset
    val out = new mutable.ArrayBuffer[Span](nodeStarts.length + keptMediaIdx.length)
    var ni = 0
    var ki = 0
    @inline def mediaOff(k: Int) = mediaOffsets(keptMediaIdx(k))
    def emitText(s: Int, e: Int): Unit = {
      if (e > s) {
        val str = new String(html, s, e - s, java.nio.charset.StandardCharsets.UTF_8)
        if (!(policy.dropWhitespaceOnlyNodes && isAllWs(html, s, e)))
          out += Span("text", str, "", s)
      }
    }
    while (ni < nodeStarts.length || ki < keptMediaIdx.length) {
      if (ni < nodeStarts.length &&
          (ki >= keptMediaIdx.length || nodeStarts(ni) < mediaOff(ki) ||
            (nodeStarts(ni) == mediaOff(ki) && false))) {
        // emit text node, splitting at any media offsets inside it
        var s = nodeStarts(ni)
        val e = nodeEnds(ni)
        if (policy.dropWhitespaceOnlyNodes && isAllWs(html, s, e)) {
          ni += 1
        } else {
          while (ki < keptMediaIdx.length && mediaOff(ki) <= s) {
            out += Span("media", "", mediaRefs(keptMediaIdx(ki)), mediaOff(ki)); ki += 1
          }
          while (ki < keptMediaIdx.length && mediaOff(ki) < e) {
            val m = mediaOff(ki)
            if (m > s) { val str = new String(html, s, m - s, java.nio.charset.StandardCharsets.UTF_8); out += Span("text", str, "", s) }
            out += Span("media", "", mediaRefs(keptMediaIdx(ki)), m)
            s = m
            ki += 1
          }
          if (e > s) { val str = new String(html, s, e - s, java.nio.charset.StandardCharsets.UTF_8); out += Span("text", str, "", s) }
          ni += 1
        }
      } else {
        out += Span("media", "", mediaRefs(keptMediaIdx(ki)), mediaOff(ki))
        ki += 1
      }
    }
    ExtractResult(out.toIndexedSeq, error)
  }

  private def isAllWs(b: Array[Byte], s: Int, e: Int): Boolean = {
    var i = s
    while (i < e) {
      val c = b(i)
      if (c != ' ' && c != '\n' && c != '\r' && c != '\t' && c != 0x0c) return false
      i += 1
    }
    true
  }

  /** Convenience: whole-string extraction (the `rewrite_str` analog). */
  def extractString(html: String): ExtractResult =
    extractHtml(html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      Vector.empty, Vector.empty)
}
