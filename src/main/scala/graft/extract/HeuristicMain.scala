package graft.extract

import graft.rewrite.{Element, ElementHandlers, Rewriter, TextChunk}
import graft.core.TextType

/** DOM-heuristic main-content extraction — the third branch the north
  * rule names next to selector-based boilerplate stripping and the PDF
  * branch: no fixed strip list, instead every paragraph-level block is
  * scored on its own text, JusText/boilerpipe-style, and boilerplate is
  * whatever scores badly.
  *
  * Built on the streaming engine (no DOM): block elements (p, li, td,
  * headings, ...) open a scoring frame via their element handler; text
  * chunks credit the INNERMOST open frame (Data text only — RCDATA/
  * RAWTEXT/script never count); an `a` handler tracks anchor depth so
  * link text is tallied separately; the frame closes on the element's
  * end tag (or implicit close — both fire `onEndTag`). A block is KEPT
  * iff its direct text is at least `minTextLen` chars AND its link-text
  * density is at most `maxLinkDensity` — navigation and link farms are
  * link-dense, content paragraphs are not. Nested blocks score
  * independently (paragraph-level flattening, like JusText).
  *
  * One instance per task, reused across rows; NOT thread-safe.
  */
final class HeuristicMain(minTextLen: Int = 25, maxLinkDensity: Double = 0.33,
                          keepShortNearGood: Boolean = false) {

  /** Paragraph-level block elements (the JusText block set). */
  private val BlockTags = Seq(
    "p", "li", "td", "th", "dd", "dt", "h1", "h2", "h3", "h4", "h5", "h6",
    "blockquote", "pre", "figcaption", "caption")

  private final class Block(val seq: Int) {
    val sb = new java.lang.StringBuilder
    var linkChars = 0
  }

  // open blocks in document-open order (innermost = last); finalized
  // blocks can drain outermost-first on implicit closes, so removal is
  // by identity, not LIFO
  private val open = new java.util.ArrayList[Block]()
  private val all = new scala.collection.mutable.ArrayBuffer[(Int, String, Int)]()
  private var seq = 0
  private var anchorDepth = 0
  private var lastTok: TextChunk = _

  private def finalizeBlock(b: Block): Unit = {
    open.remove(b)
    val text = b.sb.toString
    all += ((b.seq, text, b.linkChars))
  }

  private val blockHandler = ElementHandlers(
    element = (el: Element) => if (el.canHaveContent) {
      val b = new Block(seq)
      seq += 1
      open.add(b)
      el.onEndTag(_ => finalizeBlock(b))
    },
    text = (tok: TextChunk) => {
      // the same chunk is delivered once per active (nested) block
      // handler — credit only the innermost frame, once
      if ((tok ne lastTok) && tok.textType == TextType.Data && !open.isEmpty) {
        lastTok = tok
        val b = open.get(open.size - 1)
        b.sb.append(tok.text)
        if (anchorDepth > 0) b.linkChars += tok.text.length
      }
    })

  private val anchorHandler = ElementHandlers(element = (el: Element) =>
    if (el.canHaveContent) {
      anchorDepth += 1
      el.onEndTag(_ => anchorDepth -= 1)
    })

  private val rewriter = new Rewriter(
    BlockTags.map(_ -> blockHandler) :+ ("a" -> anchorHandler),
    strict = false, produceOutput = false)

  /** Kept block texts in document order. With `keepShortNearGood`
    * (JusText's context rule), a block that passes the density test but
    * is too short is still kept when an ADJACENT block in document order
    * is independently good — isolated short snippets (copyright lines,
    * timestamps) stay out, short sentences inside an article stay in.
    */
  def extract(html: Array[Byte]): Seq[String] = {
    open.clear(); all.clear(); seq = 0; anchorDepth = 0; lastTok = null
    rewriter.rewriteToBytes(html)
    // blocks left open at EOF (unclosed markup) still score
    while (!open.isEmpty) finalizeBlock(open.get(open.size - 1))
    val blocks = all.sortBy(_._1).toIndexedSeq
    def lowDensity(i: Int): Boolean = {
      val (_, t, l) = blocks(i)
      t.isEmpty || l.toDouble / t.length <= maxLinkDensity
    }
    def good(i: Int): Boolean = blocks(i)._2.length >= minTextLen && lowDensity(i)
    blocks.indices.iterator.filter { i =>
      good(i) || (keepShortNearGood && lowDensity(i) && blocks(i)._2.nonEmpty &&
        ((i > 0 && good(i - 1)) || (i < blocks.length - 1 && good(i + 1))))
    }.map(blocks(_)._2).toSeq
  }

  def extractString(html: String): Seq[String] =
    extract(html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
