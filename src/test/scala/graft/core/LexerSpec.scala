package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Records lexemes as readable strings for golden-style assertions. */
final class RecordingSink(input: Array[Byte]) extends LexemeSink {
  val events = mutable.ArrayBuffer[String]()
  private def s(a: Int, b: Int) = new String(input, a, b - a, "UTF-8")
  def onText(start: Int, end: Int, textType: Int): Unit =
    events += s"text[${TextType.name(textType)}](${s(start, end)})"
  def onStartTag(nameStart: Int, nameEnd: Int, nameHash: Long, ns: Int,
                 selfClosing: Boolean, attrs: AttrList, rawStart: Int, rawEnd: Int): Unit = {
    val as = (0 until attrs.count).map { i =>
      s(attrs.nameStart(i), attrs.nameEnd(i)) + "=" + s(attrs.valueStart(i), attrs.valueEnd(i))
    }.mkString(",")
    events += s"start(${s(nameStart, nameEnd)}|$as|sc=$selfClosing|ns=$ns)"
  }
  def onEndTag(nameStart: Int, nameEnd: Int, nameHash: Long, rawStart: Int, rawEnd: Int): Unit =
    events += s"end(${s(nameStart, nameEnd)})"
  def onComment(textStart: Int, textEnd: Int, rawStart: Int, rawEnd: Int): Unit =
    events += s"comment(${s(textStart, textEnd)})"
  def onDoctype(nameStart: Int, nameEnd: Int, hasName: Boolean,
                publicIdStart: Int, publicIdEnd: Int, hasPublicId: Boolean,
                systemIdStart: Int, systemIdEnd: Int, hasSystemId: Boolean,
                forceQuirks: Boolean, rawStart: Int, rawEnd: Int): Unit = {
    val n = if (hasName) s(nameStart, nameEnd) else "<none>"
    val p = if (hasPublicId) s(publicIdStart, publicIdEnd) else "<none>"
    val sy = if (hasSystemId) s(systemIdStart, systemIdEnd) else "<none>"
    events += s"doctype($n|$p|$sy|quirks=$forceQuirks)"
  }
  def onRawWithoutToken(rawStart: Int, rawEnd: Int): Unit =
    events += s"raw(${s(rawStart, rawEnd)})"
  def onEof(pos: Int): Unit = events += "eof"
}

object Tokenize {
  def apply(html: String, strict: Boolean = true): Seq[String] = {
    val bytes = html.getBytes("UTF-8")
    val sink = new RecordingSink(bytes)
    new Lexer(strict).parse(bytes, sink)
    sink.events.toSeq
  }
}

class LexerSpec extends AnyFunSuite {

  test("simple tags and text") {
    assert(Tokenize("<div>hello</div>") ==
      Seq("start(div||sc=false|ns=0)", "text[Data](hello)", "end(div)", "eof"))
  }

  test("attributes: quoted, unquoted, empty") {
    assert(Tokenize("""<a href="x" id='y' checked data-k=v>t</a>""") ==
      Seq("start(a|href=x,id=y,checked=,data-k=v|sc=false|ns=0)", "text[Data](t)", "end(a)", "eof"))
  }

  test("self-closing flag") {
    assert(Tokenize("<br/>") == Seq("start(br||sc=true|ns=0)", "eof"))
  }

  test("comments") {
    assert(Tokenize("a<!-- c --->b") ==
      Seq("text[Data](a)", "comment( c -)", "text[Data](b)", "eof"))
    assert(Tokenize("<!-->") == Seq("comment()", "eof"))
    assert(Tokenize("<!--->") == Seq("comment()", "eof"))
    assert(Tokenize("<!-- <!-- -->") == Seq("comment( <!-- )", "eof"))
  }

  test("bogus comments") {
    assert(Tokenize("<?php x ?>y") == Seq("comment(?php x ?)", "text[Data](y)", "eof"))
    assert(Tokenize("</>x") == Seq("raw(</>)", "text[Data](x)", "eof"))
    assert(Tokenize("</#bad>x") == Seq("comment(#bad)", "text[Data](x)", "eof"))
  }

  test("doctype variants") {
    assert(Tokenize("<!doctype html>") == Seq("doctype(html|<none>|<none>|quirks=false)", "eof"))
    assert(Tokenize("<!DOCTYPE HTML PUBLIC \"pub\" 'sys'>") ==
      Seq("doctype(HTML|pub|sys|quirks=false)", "eof"))
    assert(Tokenize("<!doctype html SYSTEM \"sys\">") ==
      Seq("doctype(html|<none>|sys|quirks=false)", "eof"))
  }

  test("script data: markup inside script is text") {
    assert(Tokenize("<script>if (a<b) { x = '</div>'; }</script>") ==
      Seq("start(script||sc=false|ns=0)",
        "text[ScriptData](if (a)", "text[ScriptData](<)",
        "text[ScriptData](b) { x = ')",
        "text[ScriptData](</div)", "text[ScriptData](>'; })",
        "end(script)", "eof"))
  }

  test("script data double escape") {
    val ev = Tokenize("<script><!--<script>alert('</script>')--></script>x")
    // the inner </script> is consumed as script text (double-escaped mode)
    assert(ev.count(_.startsWith("end(script)")) == 1)
    assert(ev.last == "eof")
    assert(ev.contains("text[Data](x)"))
  }

  test("rawtext: style content not parsed") {
    assert(Tokenize("<style>a { content: '<div>' }</style>") ==
      Seq("start(style||sc=false|ns=0)",
        "text[RawText](a { content: ')",
        "text[RawText](<)", "text[RawText](div>' })",
        "end(style)", "eof"))
  }

  test("rcdata: title; entity text kept raw") {
    assert(Tokenize("<title>a &amp; <b></title>") ==
      Seq("start(title||sc=false|ns=0)",
        "text[RCData](a &amp; )",
        "text[RCData](<)", "text[RCData](b>)",
        "end(title)", "eof"))
  }

  test("plaintext swallows everything") {
    assert(Tokenize("<plaintext><div>x") ==
      Seq("start(plaintext||sc=false|ns=0)", "text[PlainText](<div>x)", "eof"))
  }

  test("cdata only in foreign content") {
    assert(Tokenize("<![CDATA[x]]>") == Seq("comment([CDATA[x]])", "eof"))
    assert(Tokenize("<svg><![CDATA[x <b> y]]></svg>") ==
      Seq("start(svg||sc=false|ns=1)",
        "raw(<![CDATA[)",
        "text[CDataSection](x <b> y)",
        "raw(]]>)",
        "end(svg)", "eof"))
  }

  test("svg/mathml namespaces and exits") {
    assert(Tokenize("<svg><circle/><text>a</text></svg><p>b") ==
      Seq("start(svg||sc=false|ns=1)", "start(circle||sc=true|ns=1)",
        "start(text||sc=false|ns=1)", "text[Data](a)", "end(text)",
        "end(svg)", "start(p||sc=false|ns=0)", "text[Data](b)", "eof"))
    // <div> causes foreign content exit
    assert(Tokenize("<svg><div>x</div>") ==
      Seq("start(svg||sc=false|ns=1)", "start(div||sc=false|ns=0)",
        "text[Data](x)", "end(div)", "eof"))
  }

  test("svg foreignObject is an html integration point") {
    val ev = Tokenize("<svg><foreignObject><script>x</script></foreignObject></svg>")
    assert(ev.contains("text[ScriptData](x)")) // script works inside integration point
  }

  test("noscript is rawtext (scripting-enabled parse)") {
    assert(Tokenize("<noscript><p>x</noscript>") ==
      Seq("start(noscript||sc=false|ns=0)", "text[RawText](<)", "text[RawText](p>x)", "end(noscript)", "eof"))
  }

  test("appropriate end tag only exits rawtext") {
    assert(Tokenize("<style>a</div>b</style>") ==
      Seq("start(style||sc=false|ns=0)",
        "text[RawText](a)", "text[RawText](</div)", "text[RawText](>b)",
        "end(style)", "eof"))
  }

  test("ambiguity guard: script in select bails out in strict mode") {
    intercept[ParsingAmbiguityException] { Tokenize("<select><xmp>") }
    intercept[ParsingAmbiguityException] { Tokenize("<frameset><plaintext>") }
    // allowed cases
    assert(Tokenize("<select><script>x</script></select>").nonEmpty)
    assert(Tokenize("<frameset><noframes>x</noframes>").nonEmpty)
    // non-strict mode doesn't throw
    assert(Tokenize("<select><xmp>", strict = false).nonEmpty)
  }

  test("unfinished tag at eof flushed raw without token") {
    assert(Tokenize("a<div cl") == Seq("text[Data](a)", "raw(<div cl)", "eof"))
  }

  test("lone < and <1 are text") {
    assert(Tokenize("a < b") ==
      Seq("text[Data](a )", "text[Data](<)", "text[Data]( b)", "eof"))
    assert(Tokenize("a<1>") ==
      Seq("text[Data](a)", "text[Data](<)", "text[Data](1>)", "eof"))
  }

  test("tag name hash matches reference constants") {
    assert(TagHash.of("script") == 814463673L)
    assert(TagHash.of("blockquote") == 265678647808810L)
    assert(TagHash.of("h1") == 416L)
    assert(TagHash.of("foreignObject") == java.lang.Long.parseUnsignedLong("13428975859192539417"))
    assert(TagHash.of("annotation-xml") == TagHash.Empty)
    assert(TagHash.toName(TagHash.of("textarea")) == "textarea")
  }
}
