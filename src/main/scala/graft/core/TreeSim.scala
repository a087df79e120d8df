package graft.core

/** Thrown when the tokenizer encounters a text-element start tag in a
  * context (`<select>` content / in-or-after `<frameset>`) where it is
  * ambiguous whether the tag is ignored by the tree builder — a security
  * bail-out, mirroring the reference
  * (/root/reference/src/parser/tree_builder_simulator/ambiguity_guard.rs).
  */
abstract class EngineBailoutException(msg: String) extends Exception(msg) {
  /** Raw byte offset of the tag that triggered the bail-out (the amount
    * of input safely parsed before it — the reference's `parsedChunk`
    * boundary). Set by the lexer when rethrowing.
    */
  var pos: Int = -1
  def errorCode: String
}

final class ParsingAmbiguityException(val tagName: String)
    extends EngineBailoutException(s"Parsing ambiguity on tag <$tagName>") {
  def errorCode: String = s"parsing_ambiguity:$tagName"
}

/** Security cap on `<template>` nesting inside `<select>` (matches the
  * reference fixture expected_bailouts.json: MaxTemplateNestingReached
  * with depth_limit 255).
  */
final class TemplateNestingException(val depthLimit: Int)
    extends EngineBailoutException(s"Template nesting deeper than $depthLimit") {
  def errorCode: String = s"max_template_nesting:$depthLimit"
}

/** Read access to the currently-lexed tag, for the feedback cases that
  * need the full lexeme (`<annotation-xml>`, `<font color|size|face>`,
  * integration-point self-closing checks) — the reference's
  * `RequestLexeme` callbacks resolved inline since we always fully lex
  * (/root/reference/src/parser/tree_builder_simulator/mod.rs:222-308).
  */
trait TagView {
  def tagInput: Array[Byte]
  def tagNameStart: Int
  def tagNameEnd: Int
  def tagSelfClosing: Boolean
  def tagAttrCount: Int
  def tagAttrNameStart(i: Int): Int
  def tagAttrNameEnd(i: Int): Int
  def tagAttrValueStart(i: Int): Int
  def tagAttrValueEnd(i: Int): Int
}

object TreeSim {
  /** Max template nesting inside select before bail-out. */
  final val TemplateDepthLimit = 255

  // Feedback codes returned by the simulator.
  final val FbNone = 0
  final val FbSwitchData = 1 // +TextType
  final val FbCdataOff = 16
  final val FbCdataOn = 17

  @inline def fbSwitch(textType: Int): Int = FbSwitchData + textType

  // Ambiguity guard states.
  private final val AgDefault = 0
  private final val AgInSelect = 1
  private final val AgInTemplateInSelect = 2
  private final val AgInOrAfterFrameset = 3
}

/** Simulates HTML tree-construction feedback without a DOM: text-type
  * switches, SVG/MathML namespace stack, integration points, and the
  * `<select>`/`<frameset>` ambiguity guard.
  * Port of /root/reference/src/parser/tree_builder_simulator/mod.rs.
  */
final class TreeSim(strict: Boolean) {
  import TreeSim._
  import TagHash._

  private var nsStack: Array[Int] = new Array[Int](64)
  private var nsTop = 0
  nsStack(0) = Ns.Html

  private var agState = AgDefault
  private var agTemplateDepth = 0L

  def currentNs: Int = nsStack(nsTop)

  def reset(): Unit = {
    nsTop = 0
    nsStack(0) = Ns.Html
    agState = AgDefault
    agTemplateDepth = 0
  }

  private def enterNs(ns: Int): Int = {
    nsTop += 1
    if (nsTop == nsStack.length) nsStack = java.util.Arrays.copyOf(nsStack, nsStack.length * 2)
    nsStack(nsTop) = ns
    if (ns != Ns.Html) FbCdataOn else FbCdataOff
  }

  private def leaveNs(): Int = {
    if (nsTop > 0) nsTop -= 1
    if (currentNs != Ns.Html) FbCdataOn else FbCdataOff
  }

  private def textTypeAdjustment(h: Long): Int =
    if (h == Textarea || h == Title) fbSwitch(TextType.RCData)
    else if (h == Plaintext) fbSwitch(TextType.PlainText)
    else if (h == Script) fbSwitch(TextType.ScriptData)
    else if (h == Style || h == Iframe || h == Xmp || h == Noembed ||
             h == Noframes || h == Noscript) fbSwitch(TextType.RawText)
    else FbNone

  private def causesForeignContentExit(h: Long): Boolean =
    h == B || h == Big || h == Blockquote || h == Body || h == Br ||
    h == Center || h == Code || h == Dd || h == Div || h == Dl || h == Dt ||
    h == Em || h == Embed || h == H1 || h == H2 || h == H3 || h == H4 ||
    h == H5 || h == H6 || h == Head || h == Hr || h == I || h == Img ||
    h == Li || h == Listing || h == Menu || h == Meta || h == Nobr ||
    h == Ol || h == P || h == Pre || h == Ruby || h == S || h == Small ||
    h == Span || h == Strong || h == Strike || h == Sub || h == Sup ||
    h == Table || h == Tt || h == U || h == Ul || h == Var

  private def isTextIntegrationPointInMathMl(h: Long): Boolean =
    h == Mi || h == Mo || h == Mn || h == Ms || h == Mtext

  private def isHtmlIntegrationPointInSvg(h: Long): Boolean =
    h == Desc || h == Title || h == ForeignObject

  /** Feedback for a start tag; `tag` gives lazy access to the full lexeme. */
  def feedbackForStartTag(nameHash: Long, tag: TagView): Int = {
    if (strict) trackStartTag(nameHash)

    // unhashable names (custom elements) can never be one of the special
    // tags below — all of those are hashable — so in HTML content they
    // take one branch instead of the whole comparison ladder
    if (nameHash == TagHash.Empty) {
      if (currentNs != Ns.Html) startTagInForeignContent(nameHash, tag)
      else FbNone
    }
    else if (nameHash == Svg) enterNs(Ns.Svg)
    else if (nameHash == Math) enterNs(Ns.MathML)
    else if (currentNs != Ns.Html) startTagInForeignContent(nameHash, tag)
    else textTypeAdjustment(nameHash)
  }

  def feedbackForEndTag(nameHash: Long, tag: TagView): Int = {
    if (strict) trackEndTag(nameHash)

    if (currentNs == Ns.Html) checkIntegrationPointExit(nameHash, tag)
    else if (shouldLeaveNs(nameHash)) leaveNs()
    else FbNone
  }

  private def shouldLeaveNs(h: Long): Boolean = {
    if ((currentNs == Ns.Svg && h == Svg) || (currentNs == Ns.MathML && h == Math)) true
    else (currentNs == Ns.Svg || currentNs == Ns.MathML) && (h == P || h == Br)
  }

  private def checkIntegrationPointExit(h: Long, tag: TagView): Int = {
    if (nsTop < 1) return FbNone
    val prevNs = nsStack(nsTop - 1)
    if ((prevNs == Ns.MathML && isTextIntegrationPointInMathMl(h)) ||
        (prevNs == Ns.Svg && isHtmlIntegrationPointInSvg(h))) leaveNs()
    else if (h == Empty && prevNs == Ns.MathML) {
      // possibly </annotation-xml>
      if (HtmlUtil.eqIgnoreCase(tag.tagInput, tag.tagNameStart, tag.tagNameEnd, "annotation-xml"))
        leaveNs()
      else FbNone
    } else FbNone
  }

  private def startTagInForeignContent(h: Long, tag: TagView): Int = {
    if (causesForeignContentExit(h)) return leaveNs()

    val integrationEnter =
      (currentNs == Ns.Svg && isHtmlIntegrationPointInSvg(h)) ||
      (currentNs == Ns.MathML && isTextIntegrationPointInMathMl(h))
    if (integrationEnter) {
      return if (tag.tagSelfClosing) FbNone else enterNs(Ns.Html)
    }

    if (h == Font) {
      var i = 0
      while (i < tag.tagAttrCount) {
        val ns = tag.tagAttrNameStart(i); val ne = tag.tagAttrNameEnd(i)
        if (HtmlUtil.eqIgnoreCase(tag.tagInput, ns, ne, "color") ||
            HtmlUtil.eqIgnoreCase(tag.tagInput, ns, ne, "size") ||
            HtmlUtil.eqIgnoreCase(tag.tagInput, ns, ne, "face"))
          return leaveNs()
        i += 1
      }
      return FbNone
    }

    if (h == Empty && currentNs == Ns.MathML) {
      // possibly <annotation-xml encoding="text/html|application/xhtml+xml">
      if (!tag.tagSelfClosing &&
          HtmlUtil.eqIgnoreCase(tag.tagInput, tag.tagNameStart, tag.tagNameEnd, "annotation-xml")) {
        var i = 0
        while (i < tag.tagAttrCount) {
          if (HtmlUtil.eqIgnoreCase(tag.tagInput, tag.tagAttrNameStart(i), tag.tagAttrNameEnd(i), "encoding")) {
            val vs = tag.tagAttrValueStart(i); val ve = tag.tagAttrValueEnd(i)
            if (HtmlUtil.eqIgnoreCase(tag.tagInput, vs, ve, "text/html") ||
                HtmlUtil.eqIgnoreCase(tag.tagInput, vs, ve, "application/xhtml+xml"))
              return enterNs(Ns.Html)
          }
          i += 1
        }
      }
      return FbNone
    }

    FbNone
  }

  // ---- Ambiguity guard -------------------------------------------------

  private def isAmbiguousTextTypeSwitch(h: Long): Boolean =
    h == Textarea || h == Title || h == Plaintext || h == Script ||
    h == Style || h == Iframe || h == Xmp || h == Noembed ||
    h == Noframes || h == Noscript

  private def assertNotAmbiguous(h: Long): Unit =
    if (isAmbiguousTextTypeSwitch(h))
      throw new ParsingAmbiguityException(TagHash.toName(h))

  import TreeSim.TemplateDepthLimit

  private def trackStartTag(h: Long): Unit = agState match {
    case AgDefault =>
      if (h == Select) agState = AgInSelect
      else if (h == Frameset) agState = AgInOrAfterFrameset
    case AgInSelect =>
      if (h == Select || h == Textarea || h == Input || h == Keygen) agState = AgDefault
      else if (h == Template) { agState = AgInTemplateInSelect; agTemplateDepth = 1 }
      else if (h != Script) assertNotAmbiguous(h)
    case AgInTemplateInSelect =>
      if (h == Template) {
        if (agTemplateDepth >= TemplateDepthLimit) throw new TemplateNestingException(TemplateDepthLimit)
        agTemplateDepth += 1
      } else assertNotAmbiguous(h)
    case AgInOrAfterFrameset =>
      if (h != Noframes) assertNotAmbiguous(h)
  }

  private def trackEndTag(h: Long): Unit = agState match {
    case AgInSelect if h == Select => agState = AgDefault
    case AgInTemplateInSelect if h == Template =>
      if (agTemplateDepth == 1) agState = AgInSelect
      else agTemplateDepth -= 1
    case _ => ()
  }
}
