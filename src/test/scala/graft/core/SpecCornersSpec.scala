package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Hand-derived tokenizer edge cases: every expectation in this file was
  * computed BY HAND from the WHATWG HTML tokenization spec (§13.2.5
  * state machine), independently of the engine — the html5lib-tests
  * submodule is empty in the reference checkout, so this suite stands in
  * for the spec-corner coverage the upstream corpus would give.
  *
  * Conventions (the reference's LEXEME level, not html5lib's token
  * level): text is RAW (no character-reference decoding — lol-html
  * tokenizes without entity decoding), attributes are the raw recorded
  * outlines (duplicates kept — dedup is a tree-construction concern),
  * and adjacent text events of the same type are JOINED before
  * comparison so expectations do not depend on where the engine splits
  * its text runs.
  */
class SpecCornersSpec extends AnyFunSuite {

  /** Tokenize and join adjacent text events of the same text type. */
  private def joined(html: String): Seq[String] = {
    val raw = Tokenize(html, strict = false)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val Text = """text\[([A-Za-z]+)\]\((.*)\)""".r
    raw.foreach {
      case t @ Text(tt, body) =>
        out.lastOption match {
          case Some(Text(pt, pbody)) if pt == tt =>
            out(out.length - 1) = s"text[$tt]($pbody$body)"
          case _ => out += t
        }
      case e => out += e
    }
    out.toSeq
  }

  private def check(html: String, expected: String*): Unit =
    assert(joined(html) == expected, s"\ninput: $html")

  // ---- tag-open edge cases (spec: data state / tag open state) ----

  test("tag open followed by a non-letter is text") {
    // '<' then '1' -> parse error, '<' emitted as character, reconsume
    check("<1x>", "text[Data](<1x>)", "eof")
  }

  test("lone '<' at EOF is text") {
    check("a<", "text[Data](a<)", "eof")
  }

  test("'</' at EOF is text") {
    // end tag open state, EOF -> emit '<' '/' as characters
    check("a</", "text[Data](a</)", "eof")
  }

  test("'</>' is dropped entirely (missing end tag name)") {
    // spec: '>' in end tag open -> parse error, ignore both chars
    check("a</>b", "text[Data](a)", "raw(</>)", "text[Data](b)", "eof")
  }

  test("'<' is a valid tag-name character") {
    // tag name state consumes everything except ws, '/', '>', EOF
    check("<a<b>x", "start(a<b||sc=false|ns=0)", "text[Data](x)", "eof")
  }

  test("end tag with attributes records them at the lexeme level") {
    // spec drops end-tag attributes at the token level (parse error);
    // the lexeme keeps the name — attrs are not recorded for end tags
    check("<b></b id=x>", "start(b||sc=false|ns=0)", "end(b)", "eof")
  }

  // ---- attribute edge cases ----

  test("equals sign in an unquoted value is literal") {
    check("<a a=b=c>", "start(a|a=b=c|sc=false|ns=0)", "eof")
  }

  test("leading '=' starts an attribute NAMED '='") {
    // before attribute name + '=' -> unexpected-equals-sign parse error,
    // start a new attribute whose name is '='; the next '=' then begins
    // the value
    check("<a ==x>", "start(a|==x|sc=false|ns=0)", "eof")
  }

  test("slash not followed by '>' separates attributes") {
    check("<a/b>", "start(a|b=|sc=false|ns=0)", "eof")
  }

  test("quotes inside an attribute NAME are kept") {
    // attribute name state treats '"' as an (error but literal) name char
    check("""<a "x"='y'>""", "start(a|\"x\"=y|sc=false|ns=0)", "eof")
  }

  test("duplicate attributes are recorded at the lexeme level") {
    check("<a k=1 k=2>", "start(a|k=1,k=2|sc=false|ns=0)", "eof")
  }

  test("whitespace around '=' and before '>'") {
    check("<a href = 'x' >", "start(a|href=x|sc=false|ns=0)", "eof")
  }

  test("the '<img src=x/>' trap: the slash joins the UNQUOTED value") {
    // unquoted value state treats '/' as an ordinary value character —
    // the tag is NOT self-closing and the value is "x/" (the classic
    // authoring trap; only '/' after a quoted value or whitespace
    // reaches the self-closing state)
    check("<img src=x/>", "start(img|src=x/|sc=false|ns=0)", "eof")
    // ... whereas after a QUOTED value the '/' does set the flag
    check("<img src=\"x\"/>", "start(img|src=x|sc=true|ns=0)", "eof")
  }

  test("slash inside an unquoted value is literal, tag is NOT self-closing") {
    // unquoted value state consumes '/'; only '/>' in before-attr-name
    // sets the flag
    check("<a href=a/b>", "start(a|href=a/b|sc=false|ns=0)", "eof")
  }

  // ---- comments ----

  test("empty and dash-only comments") {
    check("<!---->", "comment()", "eof")
    check("<!----->", "comment(-)", "eof")
    check("<!------>", "comment(--)", "eof")
  }

  test("comment closed by --!>") {
    // comment end bang state: '>' after '--!' closes the comment
    check("<!--x--!>y", "comment(x)", "text[Data](y)", "eof")
  }

  test("'<!' inside a comment is literal") {
    check("<!--<!-->", "comment(<!)", "eof")
  }

  test("double dashes inside a comment are literal") {
    check("<!--x--y-->", "comment(x--y)", "eof")
  }

  test("'<!--' inside a comment does not nest") {
    check("<!--a<!--b-->c", "comment(a<!--b)", "text[Data](c)", "eof")
  }

  test("unterminated comment at EOF is emitted") {
    check("<!--x", "comment(x)", "eof")
  }

  test("comment whose body starts with '>' closes immediately") {
    // comment start state: '>' -> abrupt closing, empty comment
    check("<!-->y", "comment()", "text[Data](y)", "eof")
  }

  // ---- doctype ----

  test("doctype without whitespace before the name") {
    // missing-whitespace-before-doctype-name: reconsume into name state
    check("<!doctypehtml>", "doctype(html|<none>|<none>|quirks=false)", "eof")
  }

  test("doctype with no name forces quirks") {
    check("<!doctype>", "doctype(<none>|<none>|<none>|quirks=true)", "eof")
  }

  test("doctype public keyword without an id forces quirks") {
    check("<!doctype html public>", "doctype(html|<none>|<none>|quirks=true)", "eof")
  }

  test("doctype with public id only") {
    check("<!doctype html public \"p\">",
      "doctype(html|p|<none>|quirks=false)", "eof")
  }

  test("junk after the doctype name forces quirks (bogus doctype)") {
    check("<!doctype html x>", "doctype(html|<none>|<none>|quirks=true)", "eof")
  }

  test("doctype public id abruptly closed by '>'") {
    // abrupt-doctype-public-identifier: force quirks, emit
    check("<!doctype html public \"p>x",
      "doctype(html|p|<none>|quirks=true)", "text[Data](x)", "eof")
  }

  // ---- RCDATA (title / textarea) ----

  test("markup inside title is RCDATA text") {
    check("<title>a<b></title>",
      "start(title||sc=false|ns=0)", "text[RCData](a<b>)", "end(title)", "eof")
  }

  test("non-appropriate end tag inside title is text") {
    check("<title></div></title>",
      "start(title||sc=false|ns=0)", "text[RCData](</div>)", "end(title)", "eof")
  }

  test("appropriate end tag matches case-insensitively") {
    check("<textarea>x</TEXTAREA>y",
      "start(textarea||sc=false|ns=0)", "text[RCData](x)", "end(TEXTAREA)",
      "text[Data](y)", "eof")
  }

  test("partial end tag at EOF inside rcdata is text") {
    check("<title></titl", "start(title||sc=false|ns=0)",
      "text[RCData](</titl)", "eof")
  }

  // ---- RAWTEXT (style / xmp / iframe / noframes) ----

  test("markup inside style is raw text") {
    check("<style>a{x:'</div>'}</style>",
      "start(style||sc=false|ns=0)", "text[RawText](a{x:'</div>'})",
      "end(style)", "eof")
  }

  test("xmp is a rawtext element") {
    check("<xmp><b>bold</b></xmp>",
      "start(xmp||sc=false|ns=0)", "text[RawText](<b>bold</b>)",
      "end(xmp)", "eof")
  }

  // ---- script data escape states ----

  test("script escaped: '</script>' inside a comment-escape closes the element") {
    // script data escaped state does NOT protect an appropriate end tag
    check("<script><!--</script>-->x",
      "start(script||sc=false|ns=0)", "text[ScriptData](<!--)",
      "end(script)", "text[Data](-->x)", "eof")
  }

  test("script DOUBLE-escaped: '</script>' inside <script> escape is text") {
    check("<script><!--<script></script>--></script>y",
      "start(script||sc=false|ns=0)",
      "text[ScriptData](<!--<script></script>-->)",
      "end(script)", "text[Data](y)", "eof")
  }

  test("script escape that never closes still ends at the appropriate end tag") {
    check("<script><!-- if (a<b) --></script>",
      "start(script||sc=false|ns=0)", "text[ScriptData](<!-- if (a<b) -->)",
      "end(script)", "eof")
  }

  test("dashes inside script without '<!--' do not escape") {
    check("<script>a--b</script>",
      "start(script||sc=false|ns=0)", "text[ScriptData](a--b)",
      "end(script)", "eof")
  }

  // ---- plaintext ----

  test("plaintext never ends") {
    check("<plaintext>a</plaintext>b",
      "start(plaintext||sc=false|ns=0)", "text[PlainText](a</plaintext>b)", "eof")
  }

  // ---- CDATA ----

  test("CDATA is only recognized in foreign content") {
    check("<svg><![CDATA[x<y]]></svg>",
      "start(svg||sc=false|ns=1)", "raw(<![CDATA[)",
      "text[CDataSection](x<y)", "raw(]]>)", "end(svg)", "eof")
  }

  test("CDATA outside foreign content is a bogus comment") {
    check("<![CDATA[x]]>", "comment([CDATA[x]])", "eof")
  }

  test("CDATA with ']]' inside stays open") {
    check("<svg><![CDATA[a]]b]]></svg>",
      "start(svg||sc=false|ns=1)", "raw(<![CDATA[)",
      "text[CDataSection](a]]b)", "raw(]]>)", "end(svg)", "eof")
  }

  // ---- foreign content feedback ----

  // ---- batch 3 ----

  test("missing whitespace after a quoted value still starts the next attribute") {
    // after-attribute-value-quoted: anything but ws / '/' / '>' is a
    // parse error that reconsumes into before-attribute-name
    check("<a a='1'b=2>", "start(a|a=1,b=2|sc=false|ns=0)", "eof")
  }

  test("'</ ' inside rcdata is literal text") {
    // rcdata end-tag-open requires an ASCII letter; ' ' re-emits '</'
    check("<title></ title></title>", "start(title||sc=false|ns=0)",
      "text[RCData](</ title>)", "end(title)", "eof")
  }

  test("doctype with both public and system ids") {
    check("<!DOCTYPE html PUBLIC \"p\" \"s\">",
      "doctype(html|p|s|quirks=false)", "eof")
  }

  test("double-escape ended by '-->' returns to plain script data") {
    // script-data-double-escaped-dash-dash: '>' leaves BOTH escape levels
    check("<script><!--<script>--></script>x",
      "start(script||sc=false|ns=0)", "text[ScriptData](<!--<script>-->)",
      "end(script)", "text[Data](x)", "eof")
  }

  test("two valueless attributes") {
    check("<a b c>", "start(a|b=,c=|sc=false|ns=0)", "eof")
  }

  test("three and four dashes before the comment close") {
    check("<!--x--->", "comment(x-)", "eof")
    check("<!--x---->", "comment(x--)", "eof")
  }

  test("CDATA keyword is case-sensitive even in foreign content") {
    check("<svg><![cdata[x]]></svg>", "start(svg||sc=false|ns=1)",
      "comment([cdata[x]])", "end(svg)", "eof")
  }

  // ---- batch 4 ----

  test("'<%' is text (ASP-style tags are not markup)") {
    check("<%x%>", "text[Data](<%x%>)", "eof")
  }

  test("junk after the SYSTEM id does NOT force quirks (asymmetric with public)") {
    // after-doctype-system-identifier: unexpected characters are a parse
    // error and swallowed, but — unlike junk after the name or between
    // ids — the spec does NOT set force-quirks here
    check("<!doctype html system \"s\" x>",
      "doctype(html|<none>|s|quirks=false)", "eof")
  }

  test("svg desc is an HTML integration point") {
    // children of <desc> parse under HTML rules: <b> is an HTML element,
    // no foreign-content breakout involved. Note the integration-point
    // element ITSELF reports the entered HTML namespace — the reference
    // stamps the lexeme ns AFTER tree feedback runs (enter_ns happens in
    // get_feedback_for_start_tag, the ns is captured at
    // lexer/actions.rs:104), and this engine mirrors that capture point
    check("<svg><desc><b>x</b></desc></svg>",
      "start(svg||sc=false|ns=1)", "start(desc||sc=false|ns=0)",
      "start(b||sc=false|ns=0)", "text[Data](x)", "end(b)",
      "end(desc)", "end(svg)", "eof")
  }

  test("mathml mtext is a text integration point") {
    // same post-feedback ns capture as the desc case above
    check("<math><mtext><b>x</b></mtext></math>",
      "start(math||sc=false|ns=2)", "start(mtext||sc=false|ns=0)",
      "start(b||sc=false|ns=0)", "text[Data](x)", "end(b)",
      "end(mtext)", "end(math)", "eof")
  }

  test("markup inside a comment is comment data") {
    check("<!--<div>-->", "comment(<div>)", "eof")
  }

  test("comment syntax inside rcdata is just text") {
    check("<textarea><!--</textarea>-->",
      "start(textarea||sc=false|ns=0)", "text[RCData](<!--)",
      "end(textarea)", "text[Data](-->)", "eof")
  }

  test("passthrough serialization is byte-identical on every corner input") {
    // a no-handler rewriter must reproduce even the nastiest inputs
    // byte-for-byte (raw losslessness at the edge cases, not just on the
    // random property corpus)
    val inputs = Seq(
      "<1x>", "a<", "a</", "a</>b", "<a<b>x", "<b></b id=x>",
      "<a a=b=c>", "<a ==x>", "<a/b>", "<a \"x\"='y'>", "<a k=1 k=2>",
      "<a href = 'x' >", "<img src=x/>", "<img src=\"x\"/>", "<a href=a/b>",
      "<!---->", "<!----->", "<!------>", "<!--x--!>y", "<!--<!-->",
      "<!--x--y-->", "<!--a<!--b-->c", "<!--x", "<!-->y", "<!-- ->",
      "<!--x-- >", "<!x>y",
      "<!doctypehtml>", "<!doctype>", "<!doctype html public>",
      "<!doctype html public \"p\">", "<!doctype html x>",
      "<!doctype html public \"p>x", "<!doctype html SyStEm 'x'>",
      "<!doctype html public 'p' junk>", "<!doctype html public'p'>",
      "<title>a<b></title>", "<title></div></title>", "<textarea>x</TEXTAREA>y",
      "<title></titl", "<title>x</title y=1>", "<title>x</title/>",
      "<style>a{x:'</div>'}</style>", "<xmp><b>bold</b></xmp>",
      "<noscript><b></noscript>", "<noembed><b></noembed>",
      "<script><!--</script>-->x", "<script><!--<script></script>--></script>y",
      "<script><!-- if (a<b) --></script>", "<script>a--b</script>",
      "<plaintext>a</plaintext>b", "<a>x</a/>", "<a x >", "<a x/>",
      "<title>&amp;</title>", "a&lt;b", "<style></styl></style>",
      "<svg><![CDATA[x<y]]></svg>", "<![CDATA[x]]>",
      "<svg><![CDATA[a]]b]]></svg>", "<svg><script>a<g>b</g></script></svg>",
      "<svg><script>a<b</script></svg>", "<svg><script>a<i>b",
      // batch 5
      "a<!", "a<!-", "<!-x>y", "<?>y",
      "<!doctype", "<!doctype html", "<!doctype html ", "<!DOCTYPE HTML>",
      "<!doctype html system>", "<!doctype html system \"s>x",
      "<!doctype html publi \"p\">",
      "<a\rhref=x>", "<a\fhref=x>", "<a href\r=\nx>", "<a href=\"x\ry\">",
      "a\r\nb", "<textarea>a\r\nb</textarea>", "<b></b\n>",
      "<title>x</title", "<script><!--x",
      "<svg><title>a</title></svg>b",
      "<math><annotation-xml encoding=\"text/html\"><b>x</b></annotation-xml></math>",
      "<math><annotation-xml><b>x", "<math><mn><b>x</b></mn></math>",
      "<svg><font>x", "<svg><font color=red>x", "<svg><circle/><rect/></svg>",
      "<a href='x'/ b>", "<DIV CLASS=Foo>",
      // batch 6
      "<a =b>", "<!doctype html public \"p\"\"s\">",
      "<script><!--<script></script>x--></script>y",
      "<svg><![CDATA[x",
      "<math><annotation-xml encoding=TEXT/HTML><abbr>x",
      "<math><annotation-xml encoding=text/xml><abbr>x",
      "<a b=\">\">t", "<a b='>'>t", "<a b=\"x", "<a b=c>d=e>",
      "<!--a\r\nb-->", "<textarea/>x</textarea>y", "<!--", "</?x>y",
      "<!doctype html public 'p' \"s\">", "<script><!-- --> </script>",
      // batch 7
      "<math><mi><mglyph>x", "<math><mi><malignmark>x", "<svg><mglyph>x",
      "<svg><foreignObject><abbr>x",
      "<math><annotation-xml encoding='application/xhtml+xml'><abbr>x",
      "<!doctype html public \"p", "<!doctype html system 's",
      "<iframe><b></iframe>", "<noframes><b></noframes>",
      "<svg><svg><g></svg>y</svg>z", "<title></title0></title>",
      "<textarea></textarea ></textarea>",
      // batch 8
      "<a b= >x", "<a b=>x", "<a b=x", "<a//>x", "<a / >x", "<a b = = >x",
      "<script><!-- - --></script>x", "<script><!----></script>x",
      "<script><!--<script>-</script>--></script>x",
      "<title>a<!--b--></title>",
      // batch 9
      "a</3>b", "<b </b>x", "<a b='x'/c>z", "<!doctype html public\"p\">x",
      "<!doctype html public \"p\"'s'>x", "<a b/c=d>x",
      "<a b=\"x\"=\"y\">z", "<!doctype html system>x",
      // batch 10
      "<!doctyp>x", "<svg><![CDATA[]]>x</svg>", "<svg><desc><svg><g>x",
      "<math><annotation-xml encoding=\"text/html;charset=utf-8\"><abbr>x",
      // batch 11
      "<script><!--<scriptx></script>-->z",
      "<script><!--<script/></script>--></script>",
      "<script><!--<script></scriptx>--></script>y",
      "<script><!--<script>--></script>z",
      "<script><!--<SCRIPT ></SCRIPT >--></script>x",
      "<script><!--<script><!--</script>x", "<script><!--<script>",
      "<title>a</title id=x>b", "<title>a</title/>b",
      "<title>a</style id=x></title>", "<title>a</title x",
      "<title>a</titlex></title>", "<textarea></title>x</textarea>",
      "<title>a</title b=\">\">c",
      "a\u0000b", "<title>a\u0000b</title>", "<script>a\u0000b</script>",
      "<di\u0000v>x</di\u0000v>", "<\u0000a>b", "a</\u0000x>b",
      "<a b\u0000=c\u0000d>x", "<!--a\u0000b-->x", "<!doctype ht\u0000ml>x",
      "<plaintext>", "<plaintext>\u0000", "<xmp>a<b",
      // batch 12
      "<style/>a</style>b", "<script/>x</script>y", "<title/>x</title>y",
      "<plaintext/>x", "<textarea/>x</textarea>y",
      "<script><!--x--!></script>z",
      "<svg><![CDATA[a]>b]]></svg>", "<svg><![CDATA[a]]]></svg>",
      "<!--x--!-->y", "<!--x--!a-->z",
      "<!doctype html \"p\">x", "<!doctype html pub>x",
      "<title></ x</title>", "<SVG><G>x</G></SVG>y", "<svg><B>x",
      "a<plaintext><plaintext>x",
      "<script><!--</script x>-->y", "<script>a</script x>y",
      // batch 13
      "a&#65;b&amp;c", "<a b=\"&quot;x\">t", "<!---x-->y",
      "<script><!-x</script>y", "<title>a\rb</title>", "x<br/", "a<?",
      "x</br>y", "<!doctype html public 'p>x",
      "<svg><script/>x</svg>",
      "<math><annotation-xml encoding=\"text/html\"/><abbr>x",
      "<math><mtext><b>x",
      "<svg><foreignObject><![CDATA[x]]></foreignObject></svg>",
      "<svg><desc><title>a<b></title>x",
      // batch 14
      "<svg><p>x", "<svg><font class=z>w", "<a b='' c=\"\">x",
      "<!DoCtYpE HtMl>x", "<math><annotation-xml><![CDATA[x]]>",
      "<textarea>&amp;</textarea>",
      // batch 15
      "<noscript><b></noscript>x", "<noembed><i></noembed>y",
      "<b>x</b/>y", "<DIV CLASS=Foo>x</DIV>", "<svg><style>a<b>c",
      "<title><title></title>x",
      // batch 16
      "<a b=\"c\"d=e>x", "<a b=\"c\"/>x",
      "<script><!--<a>x-->y</script>z",
      "<!doctype html public \"p\" x>y", "<a =b>x", "<svg></svg/>x",
      // batch 22
      "<a a\"b=c>z", "<a b==c>z", "<!--x<!--y-->z", "x</ b>y",
      "<svg><![CDATA[a]x]]></svg>")
    val rw = new graft.rewrite.Rewriter(Nil, strict = false)
    inputs.foreach { in =>
      assert(rw.rewrite(in) == in, s"passthrough mismatch for: $in")
    }
  }

  test("script inside SVG is an ordinary (content) element") {
    // tree feedback: no ScriptData mode in foreign content — '<g>' is a
    // real child tag, not script text (g is NOT in the breakout list)
    check("<svg><script>a<g>b</g></script></svg>",
      "start(svg||sc=false|ns=1)", "start(script||sc=false|ns=1)",
      "text[Data](a)", "start(g||sc=false|ns=1)", "text[Data](b)",
      "end(g)", "end(script)", "end(svg)", "eof")
  }

  // ---- batch 2: more states ----

  test("'<!x' is a bogus comment") {
    check("<!x>y", "comment(x)", "text[Data](y)", "eof")
  }

  test("'-' then '>' inside a comment does not close it") {
    // comment end dash state: anything but '-' appends the dash and
    // reconsumes — '->' is comment data; EOF then emits
    check("<!-- ->", "comment( ->)", "eof")
  }

  test("'--' followed by non-'>' stays inside the comment") {
    check("<!--x-- >", "comment(x-- >)", "eof")
  }

  test("appropriate end tag with attributes still closes rcdata") {
    // rcdata end-tag-name state switches to before-attribute-name for
    // the appropriate tag; the end tag's attrs are dropped by spec
    check("<title>x</title y=1>", "start(title||sc=false|ns=0)",
      "text[RCData](x)", "end(title)", "eof")
  }

  test("self-closing appropriate end tag closes rcdata") {
    check("<title>x</title/>", "start(title||sc=false|ns=0)",
      "text[RCData](x)", "end(title)", "eof")
  }

  test("noscript is rawtext (scripting-enabled tokenizer)") {
    check("<noscript><b></noscript>", "start(noscript||sc=false|ns=0)",
      "text[RawText](<b>)", "end(noscript)", "eof")
  }

  test("noembed is rawtext") {
    check("<noembed><b></noembed>", "start(noembed||sc=false|ns=0)",
      "text[RawText](<b>)", "end(noembed)", "eof")
  }

  test("doctype keyword matching is case-insensitive") {
    check("<!doctype html SyStEm 'x'>",
      "doctype(html|<none>|x|quirks=false)", "eof")
  }

  test("junk between public and system ids forces quirks, public kept") {
    check("<!doctype html public 'p' junk>",
      "doctype(html|p|<none>|quirks=true)", "eof")
  }

  test("missing whitespace after the public keyword is tolerated") {
    check("<!doctype html public'p'>",
      "doctype(html|p|<none>|quirks=false)", "eof")
  }

  test("self-closing end tag in data is dropped to a plain end tag") {
    check("<a>x</a/>", "start(a||sc=false|ns=0)", "text[Data](x)",
      "end(a)", "eof")
  }

  test("valueless attribute followed by whitespace before '>'") {
    check("<a x >", "start(a|x=|sc=false|ns=0)", "eof")
  }

  test("valueless attribute followed by '/>' sets self-closing") {
    check("<a x/>", "start(a|x=|sc=true|ns=0)", "eof")
  }

  test("character references are NOT decoded at the lexeme level") {
    // lol-html tokenizes without entity decoding; &amp; passes through raw
    check("<title>&amp;</title>", "start(title||sc=false|ns=0)",
      "text[RCData](&amp;)", "end(title)", "eof")
    check("a&lt;b", "text[Data](a&lt;b)", "eof")
  }

  test("prefix-only end tag inside rawtext is text") {
    check("<style></styl></style>", "start(style||sc=false|ns=0)",
      "text[RawText](</styl>)", "end(style)", "eof")
  }

  test("'<i>' inside SVG triggers the foreign-content breakout") {
    // i/b/font/... are in the spec's breakout list: the parser pops back
    // to HTML content and processes the tag there (ns flips to HTML)
    check("<svg><script>a<i>b",
      "start(svg||sc=false|ns=1)", "start(script||sc=false|ns=1)",
      "text[Data](a)", "start(i||sc=false|ns=0)", "text[Data](b)", "eof")
  }

  test("'a<b</script>' forms a tag NAMED 'b<' (tag-name state consumes '<')") {
    // after 'a', '<b' opens a tag; the following '<' is a NAME character;
    // '/' then reaches self-closing-start, 's' is not '>' so it
    // reconsumes into before-attribute-name — yielding start tag "b<"
    // with a valueless attribute "script"
    check("<svg><script>a<b</script></svg>",
      "start(svg||sc=false|ns=1)", "start(script||sc=false|ns=1)",
      "text[Data](a)", "start(b<|script=|sc=false|ns=1)",
      "end(svg)", "eof")
  }

  // ---- batch 5: bogus-comment states ----

  test("'<!' at EOF is an empty bogus comment") {
    // markup declaration open: no '--'/DOCTYPE/[CDATA match ->
    // incorrectly-opened-comment, bogus comment state; EOF emits
    check("a<!", "text[Data](a)", "comment()", "eof")
  }

  test("'<!-' at EOF is a bogus comment containing the dash") {
    // a single '-' fails the '--' sequence match; the dash is
    // reconsumed as bogus-comment data
    check("a<!-", "text[Data](a)", "comment(-)", "eof")
  }

  test("'<!-x>' is a bogus comment, not a comment") {
    check("<!-x>y", "comment(-x)", "text[Data](y)", "eof")
  }

  test("'<?>' is a bogus comment containing '?'") {
    // unexpected-question-mark-instead-of-tag-name: '?' reconsumed
    // into bogus comment
    check("<?>y", "comment(?)", "text[Data](y)", "eof")
  }

  // ---- batch 5: doctype EOF / quirks corners ----

  test("EOF in doctype state forces quirks, no name") {
    check("<!doctype", "doctype(<none>|<none>|<none>|quirks=true)", "eof")
  }

  test("EOF during the doctype name keeps the name and forces quirks") {
    check("<!doctype html", "doctype(html|<none>|<none>|quirks=true)", "eof")
  }

  test("EOF after the doctype name forces quirks") {
    check("<!doctype html ", "doctype(html|<none>|<none>|quirks=true)", "eof")
  }

  test("doctype name case is preserved at the lexeme level") {
    // the spec lowercases the NAME in the token; the lexeme keeps the
    // raw outline (same raw convention as attributes/entities)
    check("<!DOCTYPE HTML>", "doctype(HTML|<none>|<none>|quirks=false)", "eof")
  }

  test("system keyword without an id forces quirks") {
    check("<!doctype html system>",
      "doctype(html|<none>|<none>|quirks=true)", "eof")
  }

  test("doctype system id abruptly closed by '>'") {
    // abrupt-doctype-system-identifier: quirks on, collected id kept
    check("<!doctype html system \"s>x",
      "doctype(html|<none>|s|quirks=true)", "text[Data](x)", "eof")
  }

  test("misspelled public/system keyword is a bogus doctype") {
    // 'publi' matches neither keyword -> invalid-character-sequence-
    // after-doctype-name, bogus doctype, quirks on, ids dropped
    check("<!doctype html publi \"p\">",
      "doctype(html|<none>|<none>|quirks=true)", "eof")
  }

  // ---- batch 5: CR / form-feed whitespace in tag states ----

  test("CR is tag whitespace before an attribute name") {
    check("<a\rhref=x>", "start(a|href=x|sc=false|ns=0)", "eof")
  }

  test("form feed is tag whitespace before an attribute name") {
    check("<a\fhref=x>", "start(a|href=x|sc=false|ns=0)", "eof")
  }

  test("CR before '=' and LF before the value are whitespace") {
    // attr name ends at \r (after-attribute-name), '=' then \n is
    // skipped in before-attribute-value
    check("<a href\r=\nx>", "start(a|href=x|sc=false|ns=0)", "eof")
  }

  test("CR inside a quoted attribute value is kept raw") {
    // no input preprocessing (the reference rewrites raw bytes; CRLF
    // normalization is a DOM concern) — the outline keeps the CR
    check("<a href=\"x\ry\">", "start(a|href=x\ry|sc=false|ns=0)", "eof")
  }

  test("CRLF in text is kept raw") {
    check("a\r\nb", "text[Data](a\r\nb)", "eof")
    check("<textarea>a\r\nb</textarea>", "start(textarea||sc=false|ns=0)",
      "text[RCData](a\r\nb)", "end(textarea)", "eof")
  }

  test("LF inside an end tag reaches before-attribute-name and closes") {
    check("<b></b\n>", "start(b||sc=false|ns=0)", "end(b)", "eof")
  }

  // ---- batch 5: EOF in content modes ----

  test("complete-looking end tag name at EOF inside rcdata is text") {
    // '</title' with no '>' never leaves the end-tag-name state
    check("<title>x</title", "start(title||sc=false|ns=0)",
      "text[RCData](x</title)", "eof")
  }

  test("EOF inside script escape is script text") {
    check("<script><!--x", "start(script||sc=false|ns=0)",
      "text[ScriptData](<!--x)", "eof")
  }

  // ---- batch 5: foreign-content integration points ----

  test("svg title is an HTML integration point (no rcdata inside svg)") {
    // SPEC TRAP (first-guess expectation was wrong): <title> in the SVG
    // namespace is one of the spec's HTML integration points
    // (desc/title/foreignObject — reference tree_builder_simulator
    // mod.rs:98-100), so its children parse under HTML rules AND the
    // rcdata mode switch for HTML <title> does NOT apply; the element
    // itself reports the entered HTML ns (post-feedback capture, as
    // with desc in batch 4)
    check("<svg><title>a</title></svg>b",
      "start(svg||sc=false|ns=1)", "start(title||sc=false|ns=0)",
      "text[Data](a)", "end(title)", "end(svg)", "text[Data](b)", "eof")
  }

  test("annotation-xml with encoding=text/html is an HTML integration point") {
    // the integration-point decision inspects the encoding ATTRIBUTE
    // (text/html or application/xhtml+xml)
    check("<math><annotation-xml encoding=\"text/html\"><b>x</b></annotation-xml></math>",
      "start(math||sc=false|ns=2)",
      "start(annotation-xml|encoding=text/html|sc=false|ns=0)",
      "start(b||sc=false|ns=0)", "text[Data](x)", "end(b)",
      "end(annotation-xml)", "end(math)", "eof")
  }

  test("annotation-xml without encoding stays MathML; <b> breaks out anyway") {
    // no integration point without the encoding attr — but 'b' is in
    // the foreign-content breakout list, so it pops to HTML regardless
    check("<math><annotation-xml><b>x",
      "start(math||sc=false|ns=2)", "start(annotation-xml||sc=false|ns=2)",
      "start(b||sc=false|ns=0)", "text[Data](x)", "eof")
  }

  test("mathml mn is a text integration point") {
    check("<math><mn><b>x</b></mn></math>",
      "start(math||sc=false|ns=2)", "start(mn||sc=false|ns=0)",
      "start(b||sc=false|ns=0)", "text[Data](x)", "end(b)",
      "end(mn)", "end(math)", "eof")
  }

  test("svg font WITHOUT color/face/size is NOT a breakout tag") {
    // the font breakout is conditional on those attributes
    check("<svg><font>x", "start(svg||sc=false|ns=1)",
      "start(font||sc=false|ns=1)", "text[Data](x)", "eof")
  }

  test("svg font WITH a color attribute breaks out to HTML") {
    check("<svg><font color=red>x", "start(svg||sc=false|ns=1)",
      "start(font|color=red|sc=false|ns=0)", "text[Data](x)", "eof")
  }

  test("self-closing foreign elements produce no content scope") {
    // in foreign content the self-closing flag is honored: circle/rect
    // never open, so </svg> closes svg directly
    check("<svg><circle/><rect/></svg>",
      "start(svg||sc=false|ns=1)", "start(circle||sc=true|ns=1)",
      "start(rect||sc=true|ns=1)", "end(svg)", "eof")
  }

  // ---- batch 5: more attribute-state corners ----

  test("'/' after a quoted value followed by a non-'>' starts a new attribute") {
    // self-closing-start-tag state: 'b' is not '>', reconsume into
    // before-attribute-name — the slash is swallowed, no self-closing
    check("<a href='x'/ b>", "start(a|href=x,b=|sc=false|ns=0)", "eof")
  }

  test("tag and attribute name case is preserved at the lexeme level") {
    check("<DIV CLASS=Foo>", "start(DIV|CLASS=Foo|sc=false|ns=0)", "eof")
  }

  // ---- batch 6 ----

  test("'=' before an attribute name starts a name that keeps growing") {
    // unexpected-equals-sign starts an attribute NAMED '='; the 'b'
    // appends to that name (attribute name state), yielding name "=b"
    check("<a =b>", "start(a|=b=|sc=false|ns=0)", "eof")
  }

  test("missing whitespace between public and system ids is tolerated") {
    // after-doctype-public-identifier: a quote is a parse error but
    // STARTS the system id — no quirks
    check("<!doctype html public \"p\"\"s\">",
      "doctype(html|p|s|quirks=false)", "eof")
  }

  test("'</script>' inside double-escape exits to escaped, '-->' then to data") {
    // the inner </script> is TEXT (double-escape-end), after which the
    // escape level is 'escaped' — so x--> leaves the escape and the
    // outer </script> closes the element
    check("<script><!--<script></script>x--></script>y",
      "start(script||sc=false|ns=0)",
      "text[ScriptData](<!--<script></script>x-->)",
      "end(script)", "text[Data](y)", "eof")
  }

  test("CDATA truncated at EOF still emits the section text") {
    check("<svg><![CDATA[x", "start(svg||sc=false|ns=1)",
      "raw(<![CDATA[)", "text[CDataSection](x)", "eof")
  }

  test("annotation-xml encoding value matches ASCII-case-insensitively") {
    // spec: 'an ASCII case-insensitive match for text/html' — abbr is
    // NOT in the breakout list, so ns=0 here proves the integration
    // point (not a breakout)
    check("<math><annotation-xml encoding=TEXT/HTML><abbr>x",
      "start(math||sc=false|ns=2)",
      "start(annotation-xml|encoding=TEXT/HTML|sc=false|ns=0)",
      "start(abbr||sc=false|ns=0)", "text[Data](x)", "eof")
  }

  test("annotation-xml with a non-html encoding stays foreign") {
    // text/xml is not an integration-point encoding; abbr (non-breakout)
    // remains a MathML-namespace element
    check("<math><annotation-xml encoding=text/xml><abbr>x",
      "start(math||sc=false|ns=2)",
      "start(annotation-xml|encoding=text/xml|sc=false|ns=2)",
      "start(abbr||sc=false|ns=2)", "text[Data](x)", "eof")
  }

  test("'>' inside a quoted attribute value does not close the tag") {
    check("<a b=\">\">t", "start(a|b=>|sc=false|ns=0)", "text[Data](t)", "eof")
  }

  test("EOF inside a quoted attribute value drops the token, keeps the raw") {
    // eof-in-tag: the start tag token is never emitted; the consumed
    // bytes surface as raw-without-token (lossless serialization)
    check("<a b=\"x", "raw(<a b=\"x)", "eof")
  }

  test("CR/CRLF inside a comment is kept raw") {
    check("<!--a\r\nb-->", "comment(a\r\nb)", "eof")
  }

  test("self-closing textarea still switches to RCDATA") {
    // the self-closing flag on a non-void HTML element is ignored by the
    // tree builder, so the mode switch happens regardless
    check("<textarea/>x</textarea>y", "start(textarea||sc=true|ns=0)",
      "text[RCData](x)", "end(textarea)", "text[Data](y)", "eof")
  }

  test("'<!--' alone at EOF is an empty comment") {
    check("<!--", "comment()", "eof")
  }

  // ---- batch 7 ----

  test("mglyph inside a MathML text integration point: REFERENCE PARITY (html ns)") {
    // the full tree-construction dispatcher keeps mglyph/malignmark in
    // the MathML namespace inside text integration points; the
    // reference's simulator does NOT model that carve-out — it enters
    // the HTML ns unconditionally at the integration point
    // (tree_builder_simulator/mod.rs:203-207 has no mglyph check), and
    // this engine matches the reference's observable behavior exactly
    check("<math><mi><mglyph>x",
      "start(math||sc=false|ns=2)", "start(mi||sc=false|ns=0)",
      "start(mglyph||sc=false|ns=0)", "text[Data](x)", "eof")
    check("<math><mi><malignmark>x",
      "start(math||sc=false|ns=2)", "start(mi||sc=false|ns=0)",
      "start(malignmark||sc=false|ns=0)", "text[Data](x)", "eof")
  }

  test("mglyph directly inside svg stays foreign (no integration point)") {
    check("<svg><mglyph>x", "start(svg||sc=false|ns=1)",
      "start(mglyph||sc=false|ns=1)", "text[Data](x)", "eof")
  }

  test("svg foreignObject is an HTML integration point") {
    // abbr is NOT in the breakout list — ns=0 proves the integration
    // point, not a breakout
    check("<svg><foreignObject><abbr>x",
      "start(svg||sc=false|ns=1)", "start(foreignObject||sc=false|ns=0)",
      "start(abbr||sc=false|ns=0)", "text[Data](x)", "eof")
  }

  test("annotation-xml accepts application/xhtml+xml too") {
    check("<math><annotation-xml encoding='application/xhtml+xml'><abbr>x",
      "start(math||sc=false|ns=2)",
      "start(annotation-xml|encoding=application/xhtml+xml|sc=false|ns=0)",
      "start(abbr||sc=false|ns=0)", "text[Data](x)", "eof")
  }

  test("EOF inside the doctype public id keeps the collected id, quirks on") {
    check("<!doctype html public \"p",
      "doctype(html|p|<none>|quirks=true)", "eof")
  }

  test("EOF inside the doctype system id keeps the collected id, quirks on") {
    check("<!doctype html system 's",
      "doctype(html|<none>|s|quirks=true)", "eof")
  }

  test("iframe and noframes are rawtext elements") {
    check("<iframe><b></iframe>", "start(iframe||sc=false|ns=0)",
      "text[RawText](<b>)", "end(iframe)", "eof")
    check("<noframes><b></noframes>", "start(noframes||sc=false|ns=0)",
      "text[RawText](<b>)", "end(noframes)", "eof")
  }

  test("nested svg: each end tag pops one namespace level") {
    check("<svg><svg><g></svg>y</svg>z",
      "start(svg||sc=false|ns=1)", "start(svg||sc=false|ns=1)",
      "start(g||sc=false|ns=1)", "end(svg)", "text[Data](y)",
      "end(svg)", "text[Data](z)", "eof")
  }

  test("'</title0>' is NOT an appropriate end tag for title") {
    // rcdata end-tag-name: '0' is not ws / '/' / '>' after the matching
    // name, so the whole run stays text
    check("<title></title0></title>", "start(title||sc=false|ns=0)",
      "text[RCData](</title0>)", "end(title)", "eof")
  }

  test("a stray end tag after rcdata closes is still emitted") {
    // first '</textarea >' closes (appropriate, ws then '>'); the
    // second is an ordinary Data-state end tag lexeme
    check("<textarea></textarea ></textarea>",
      "start(textarea||sc=false|ns=0)", "end(textarea)",
      "end(textarea)", "eof")
  }

  // ---- batch 8 ----

  test("missing attribute value: '=' then ws/'>' yields an empty value") {
    // before-attribute-value skips whitespace; '>' is the
    // missing-attribute-value parse error — tag still emitted
    check("<a b= >x", "start(a|b=|sc=false|ns=0)", "text[Data](x)", "eof")
    check("<a b=>x", "start(a|b=|sc=false|ns=0)", "text[Data](x)", "eof")
  }

  test("EOF inside an unquoted value drops the token, keeps the raw") {
    check("<a b=x", "raw(<a b=x)", "eof")
  }

  test("double slash before '>' still sets self-closing") {
    // first '/' -> self-closing-start, '/' is not '>' so reconsume into
    // before-attribute-name, second '/' -> self-closing-start, '>' sets
    // the flag
    check("<a//>x", "start(a||sc=true|ns=0)", "text[Data](x)", "eof")
  }

  test("slash then whitespace does NOT set self-closing") {
    check("<a / >x", "start(a||sc=false|ns=0)", "text[Data](x)", "eof")
  }

  test("'=' as the first unquoted value character is literal") {
    // before-attribute-value reconsumes anything else into the unquoted
    // value state, where '=' is an (error but literal) value char
    check("<a b = = >x", "start(a|b==|sc=false|ns=0)", "text[Data](x)", "eof")
  }

  test("script escaped: a lone dash does not close the escape") {
    check("<script><!-- - --></script>x",
      "start(script||sc=false|ns=0)", "text[ScriptData](<!-- - -->)",
      "end(script)", "text[Data](x)", "eof")
  }

  test("'<!---->' inside script stays in the dash-dash state until '>'") {
    check("<script><!----></script>x",
      "start(script||sc=false|ns=0)", "text[ScriptData](<!---->)",
      "end(script)", "text[Data](x)", "eof")
  }

  test("double-escape with a dash before the inner end tag") {
    // '-' -> double-escaped-dash; '</script' ends only the DOUBLE escape
    // (text), then '-->' leaves the single escape, then the real end tag
    check("<script><!--<script>-</script>--></script>x",
      "start(script||sc=false|ns=0)",
      "text[ScriptData](<!--<script>-</script>-->)",
      "end(script)", "text[Data](x)", "eof")
  }

  test("comment syntax inside rcdata title is text") {
    check("<title>a<!--b--></title>", "start(title||sc=false|ns=0)",
      "text[RCData](a<!--b-->)", "end(title)", "eof")
  }

  // ---- batch 9 ----

  test("end tag open with a digit is a bogus comment") {
    // end-tag-open: not a letter and not '>' -> invalid-first-character-
    // of-tag-name parse error, RECONSUME in bogus comment state — the
    // digit becomes comment data, consumed through '>'
    check("a</3>b", "text[Data](a)", "comment(3)", "text[Data](b)", "eof")
  }

  test("'<' as an attribute name, '/' between attrs leaves no flag") {
    // before-attr-name reconsumes '<' into attribute name (error but
    // consumed); '/' ends the name via after-attribute-name -> self-
    // closing-start; 'b' is not '>' so the flag is NOT set and a second
    // attribute starts
    check("<b </b>x", "start(b|<=,b=|sc=false|ns=0)", "text[Data](x)", "eof")
  }

  test("'/' after a quoted value enters self-closing-start, then resets") {
    // after-attribute-value-quoted '/' -> self-closing-start; 'c' is not
    // '>' so the flag is NOT set and c becomes a valueless attribute
    // (distinct from the batch-3 missing-whitespace case, which
    // reconsumes a NAME character directly)
    check("<a b='x'/c>z", "start(a|b=x,c=|sc=false|ns=0)",
      "text[Data](z)", "eof")
  }

  test("quote directly after the PUBLIC keyword still reads the id") {
    // after-doctype-public-keyword: '\"' -> missing-whitespace-after-
    // doctype-public-keyword parse error, but the id is read and quirks
    // stays off
    check("<!doctype html public\"p\">x",
      "doctype(html|p|<none>|quirks=false)", "text[Data](x)", "eof")
  }

  test("no whitespace between public and system ids still reads both") {
    // after-doctype-public-identifier: a quote is the missing-whitespace-
    // between-doctype-public-and-system-identifiers error, then the
    // system id is read normally
    check("<!doctype html public \"p\"'s'>x",
      "doctype(html|p|s|quirks=false)", "text[Data](x)", "eof")
  }

  test("'/' between a valueless attribute and the next does not stick") {
    // b -> after-attribute-name via '/', self-closing-start; 'c' is not
    // '>' so the flag resets and c=d parses as a normal attribute
    check("<a b/c=d>x", "start(a|b=,c=d|sc=false|ns=0)",
      "text[Data](x)", "eof")
  }

  test("'=' after a quoted value starts an attribute NAMED '=\"y\"'") {
    // after-attribute-value-quoted '=' reconsumes in before-attribute-
    // name, whose '=' branch starts an attribute named '='; the
    // following quote and letters are (error but literal) NAME
    // characters, so the whole '=\"y\"' is one valueless attribute name
    check("<a b=\"x\"=\"y\">z", "start(a|b=x,=\"y\"=|sc=false|ns=0)",
      "text[Data](z)", "eof")
  }

  test("SYSTEM keyword with a missing id forces quirks") {
    // after-doctype-system-keyword: '>' -> missing-doctype-system-
    // identifier parse error, quirks on, token still emitted
    check("<!doctype html system>x",
      "doctype(html|<none>|<none>|quirks=true)", "text[Data](x)", "eof")
  }

  // ---- batch 10 ----

  test("a near-miss of the DOCTYPE keyword is a bogus comment") {
    // markup-declaration-open matches the full 'doctype' (case-insens);
    // 'doctyp>' falls through to incorrectly-opened-comment -> bogus
    // comment whose data starts right after '<!'
    check("<!doctyp>x", "comment(doctyp)", "text[Data](x)", "eof")
  }

  test("empty CDATA section emits no text") {
    check("<svg><![CDATA[]]>x</svg>", "start(svg||sc=false|ns=1)",
      "raw(<![CDATA[)", "raw(]]>)", "text[Data](x)", "end(svg)", "eof")
  }

  test("svg re-entered from inside an HTML integration point is foreign again") {
    // desc switches children to HTML dispatch; an <svg> child there
    // starts a NEW foreign subtree (ns captured after feedback)
    check("<svg><desc><svg><g>x", "start(svg||sc=false|ns=1)",
      "start(desc||sc=false|ns=0)", "start(svg||sc=false|ns=1)",
      "start(g||sc=false|ns=1)", "text[Data](x)", "eof")
  }

  test("annotation-xml encoding with a parameter is NOT an integration point") {
    // the spec compares the encoding attribute EXACTLY (case-insens) to
    // 'text/html' / 'application/xhtml+xml' — a charset parameter breaks
    // the match, so children stay in the MathML namespace
    check("<math><annotation-xml encoding=\"text/html;charset=utf-8\"><abbr>x",
      "start(math||sc=false|ns=2)",
      "start(annotation-xml|encoding=text/html;charset=utf-8|sc=false|ns=2)",
      "start(abbr||sc=false|ns=2)", "text[Data](x)", "eof")
  }

  // ---- batch 11: script-data double-escape entry/exit corners ----

  test("double-escape entry needs a delimiter after the keyword") {
    // '<scriptx' in escaped: double-escape-start keeps appending letters,
    // the '>' delimiter compares 'scriptx' != 'script' -> STAY escaped,
    // so the following appropriate end tag closes the element
    check("<script><!--<scriptx></script>-->z",
      "start(script||sc=false|ns=0)", "text[ScriptData](<!--<scriptx>)",
      "end(script)", "text[Data](-->z)", "eof")
  }

  test("double-escape entry via '/' delimiter; exit via '>' returns to ESCAPED") {
    // '<script/' -> double-escaped; '</script>' there is TEXT and flips
    // back to escaped (double-escape-end), so '-->' then leaves escape
    // and the final end tag closes
    check("<script><!--<script/></script>--></script>",
      "start(script||sc=false|ns=0)",
      "text[ScriptData](<!--<script/></script>-->)",
      "end(script)", "eof")
  }

  test("double-escape exit needs the delimiter too") {
    // '</scriptx' inside double-escape: keyword mismatch at '>' keeps the
    // DOUBLE-escaped state; '-->' in double-escaped-dash-dash goes
    // straight to script data, where the end tag is appropriate
    check("<script><!--<script></scriptx>--></script>y",
      "start(script||sc=false|ns=0)",
      "text[ScriptData](<!--<script></scriptx>-->)",
      "end(script)", "text[Data](y)", "eof")
  }

  test("'-->' inside double-escape exits directly to script data") {
    check("<script><!--<script>--></script>z",
      "start(script||sc=false|ns=0)", "text[ScriptData](<!--<script>-->)",
      "end(script)", "text[Data](z)", "eof")
  }

  test("double-escape keyword comparison is case-insensitive") {
    check("<script><!--<SCRIPT ></SCRIPT >--></script>x",
      "start(script||sc=false|ns=0)",
      "text[ScriptData](<!--<SCRIPT ></SCRIPT >-->)",
      "end(script)", "text[Data](x)", "eof")
  }

  test("'<!--' inside double-escape is inert; exiting lands in ESCAPED, not data") {
    // nesting is not tracked: the inner '<!--' is text; '</script>' ends
    // the DOUBLE escape (back to escaped, still text), and with no '-->'
    // the element never closes — everything to EOF is script text
    check("<script><!--<script><!--</script>x",
      "start(script||sc=false|ns=0)",
      "text[ScriptData](<!--<script><!--</script>x)", "eof")
  }

  test("EOF inside double-escape is script text") {
    check("<script><!--<script>",
      "start(script||sc=false|ns=0)", "text[ScriptData](<!--<script>)", "eof")
  }

  // ---- batch 11: RCDATA appropriate end tag with attrs / self-closing ----

  test("appropriate end tag with attributes still closes (attrs dropped)") {
    // rcdata-end-tag-name ws -> before-attribute-name only when
    // APPROPRIATE; the tag machinery then runs normally and end-tag
    // attrs are dropped at the lexeme level
    check("<title>a</title id=x>b",
      "start(title||sc=false|ns=0)", "text[RCData](a)", "end(title)",
      "text[Data](b)", "eof")
  }

  test("appropriate end tag with self-closing slash still closes") {
    // '/' -> self-closing-start (appropriate only); '>' emits the end
    // tag (the sc flag on an end tag is a tree-stage parse error)
    check("<title>a</title/>b",
      "start(title||sc=false|ns=0)", "text[RCData](a)", "end(title)",
      "text[Data](b)", "eof")
  }

  test("inappropriate end tag with attributes is all text") {
    // '</style' fails the appropriate check at the space -> '</' + name
    // re-emitted as text, the rest reconsumed as RCDATA characters
    check("<title>a</style id=x></title>",
      "start(title||sc=false|ns=0)", "text[RCData](a</style id=x>)",
      "end(title)", "eof")
  }

  test("appropriate end tag dropped at EOF mid-attributes keeps the raw") {
    // EOF in before-attribute-name drops the token; the consumed tag
    // bytes surface as a raw (no-token) range, like data-context tags
    check("<title>a</title x",
      "start(title||sc=false|ns=0)", "text[RCData](a)", "raw(</title x)", "eof")
  }

  test("end tag name that over-runs the keyword is text") {
    // 'titlex' fails the appropriate check at '>', which reconsumes as
    // an RCDATA character
    check("<title>a</titlex></title>",
      "start(title||sc=false|ns=0)", "text[RCData](a</titlex>)",
      "end(title)", "eof")
  }

  test("appropriate check uses THIS element's name, not any rcdata name") {
    check("<textarea></title>x</textarea>",
      "start(textarea||sc=false|ns=0)", "text[RCData](</title>x)",
      "end(textarea)", "eof")
  }

  test("quoted '>' in an end-tag attribute does not end the tag early") {
    // the attribute-value machinery runs in the end-tag context: the
    // quoted '>' is value data, the tag ends at the real '>'
    check("<title>a</title b=\">\">c",
      "start(title||sc=false|ns=0)", "text[RCData](a)", "end(title)",
      "text[Data](c)", "eof")
  }

  // ---- batch 11: NUL handling per state (lexeme level: raw bytes kept;
  // the spec's U+FFFD replacement is a token/tree-stage concern and
  // replacing would break the serializer's passthrough byte identity) ----

  test("NUL in data text passes through") {
    check("a\u0000b", "text[Data](a\u0000b)", "eof")
  }

  test("NUL in RCDATA passes through") {
    check("<title>a\u0000b</title>",
      "start(title||sc=false|ns=0)", "text[RCData](a\u0000b)", "end(title)", "eof")
  }

  test("NUL in script data passes through") {
    check("<script>a\u0000b</script>",
      "start(script||sc=false|ns=0)", "text[ScriptData](a\u0000b)",
      "end(script)", "eof")
  }

  test("NUL in a tag name is a name byte (unhashable name)") {
    check("<di\u0000v>x</di\u0000v>",
      "start(di\u0000v||sc=false|ns=0)", "text[Data](x)", "end(di\u0000v)", "eof")
  }

  test("NUL right after '<' makes the whole run text") {
    // tag-open: not a letter -> '<' is a character, reconsume in data
    check("<\u0000a>b", "text[Data](<\u0000a>b)", "eof")
  }

  test("NUL after '</' opens a bogus comment") {
    check("a</\u0000x>b",
      "text[Data](a)", "comment(\u0000x)", "text[Data](b)", "eof")
  }

  test("NUL in attribute name and value is kept") {
    check("<a b\u0000=c\u0000d>x",
      "start(a|b\u0000=c\u0000d|sc=false|ns=0)", "text[Data](x)", "eof")
  }

  test("NUL in comment data is kept") {
    check("<!--a\u0000b-->x", "comment(a\u0000b)", "text[Data](x)", "eof")
  }

  test("NUL in the doctype name is kept") {
    check("<!doctype ht\u0000ml>x",
      "doctype(ht\u0000ml|<none>|<none>|quirks=false)", "text[Data](x)", "eof")
  }

  // ---- batch 11: plaintext / rawtext EOF ----

  test("plaintext at immediate EOF emits no text") {
    check("<plaintext>", "start(plaintext||sc=false|ns=0)", "eof")
  }

  test("plaintext containing only NUL") {
    check("<plaintext>\u0000",
      "start(plaintext||sc=false|ns=0)", "text[PlainText](\u0000)", "eof")
  }

  test("rawtext partial markup at EOF is text") {
    // rawtext-less-than-sign: 'b' is not '/' -> reconsume as text
    check("<xmp>a<b", "start(xmp||sc=false|ns=0)", "text[RawText](a<b)", "eof")
  }

  // ---- batch 12: self-closing flags on HTML text elements (the tree
  // builder acknowledges the flag only for void/foreign elements — the
  // generic raw-text/RCDATA/script algorithms run regardless) ----

  test("<style/> still enters RAWTEXT") {
    check("<style/>a</style>b",
      "start(style||sc=true|ns=0)", "text[RawText](a)", "end(style)",
      "text[Data](b)", "eof")
  }

  test("<script/> still enters script data") {
    check("<script/>x</script>y",
      "start(script||sc=true|ns=0)", "text[ScriptData](x)", "end(script)",
      "text[Data](y)", "eof")
  }

  test("<title/> still enters RCDATA") {
    check("<title/>x</title>y",
      "start(title||sc=true|ns=0)", "text[RCData](x)", "end(title)",
      "text[Data](y)", "eof")
  }

  test("<plaintext/> still enters plaintext") {
    check("<plaintext/>x", "start(plaintext||sc=true|ns=0)",
      "text[PlainText](x)", "eof")
  }

  test("<textarea/> still enters RCDATA") {
    check("<textarea/>x</textarea>y",
      "start(textarea||sc=true|ns=0)", "text[RCData](x)", "end(textarea)",
      "text[Data](y)", "eof")
  }

  // ---- batch 12: script-escape and CDATA terminator corners ----

  test("'--!>' inside script escape is text (no comment-end-bang there)") {
    // the escaped dash-dash state's '!' branch is anything-else -> back
    // to plain escaped; the '>' is text and the escape never ends, but
    // the appropriate end tag still closes the element from escaped
    check("<script><!--x--!></script>z",
      "start(script||sc=false|ns=0)", "text[ScriptData](<!--x--!>)",
      "end(script)", "text[Data](z)", "eof")
  }

  test("']>' inside CDATA is data") {
    check("<svg><![CDATA[a]>b]]></svg>",
      "start(svg||sc=false|ns=1)", "raw(<![CDATA[)",
      "text[CDataSection](a]>b)", "raw(]]>)", "end(svg)", "eof")
  }

  test("three brackets before '>': the extra ']' is data") {
    // CDATA end state ']' -> emit one ']' as data, stay; '>' then closes
    check("<svg><![CDATA[a]]]></svg>",
      "start(svg||sc=false|ns=1)", "raw(<![CDATA[)",
      "text[CDataSection](a])", "raw(]]>)", "end(svg)", "eof")
  }

  // ---- batch 12: comment-end-bang continuations ----

  test("'--!-' continues the comment with '--!' as data") {
    // comment-end-bang '-' -> append '--!', comment-end-dash; '--' '>'
    // then closes
    check("<!--x--!-->y", "comment(x--!)", "text[Data](y)", "eof")
  }

  test("'--!a' continues the comment with '--!' as data") {
    check("<!--x--!a-->z", "comment(x--!a)", "text[Data](z)", "eof")
  }

  // ---- batch 12: doctype keyword near-misses ----

  test("a quote after the doctype name is bogus-doctype junk (quirks)") {
    check("<!doctype html \"p\">x",
      "doctype(html|<none>|<none>|quirks=true)", "text[Data](x)", "eof")
  }

  test("a PUBLIC keyword prefix that stops short is bogus (quirks)") {
    check("<!doctype html pub>x",
      "doctype(html|<none>|<none>|quirks=true)", "text[Data](x)", "eof")
  }

  // ---- batch 12: rcdata end-tag-open without a letter ----

  test("'</ ' inside rcdata is text (end-tag-open needs a letter)") {
    check("<title></ x</title>",
      "start(title||sc=false|ns=0)", "text[RCData](</ x)", "end(title)", "eof")
  }

  // ---- batch 12: foreign-content case rules ----

  test("uppercase <SVG> still enters the SVG namespace") {
    check("<SVG><G>x</G></SVG>y",
      "start(SVG||sc=false|ns=1)", "start(G||sc=false|ns=1)",
      "text[Data](x)", "end(G)", "end(SVG)", "text[Data](y)", "eof")
  }

  test("the breakout list is case-insensitive: <B> pops foreign content") {
    check("<svg><B>x",
      "start(svg||sc=false|ns=1)", "start(B||sc=false|ns=0)",
      "text[Data](x)", "eof")
  }

  // ---- batch 12: plaintext swallows later markup ----

  test("a second <plaintext> inside plaintext is text") {
    check("a<plaintext><plaintext>x",
      "text[Data](a)", "start(plaintext||sc=false|ns=0)",
      "text[PlainText](<plaintext>x)", "eof")
  }

  // ---- batch 12: appropriate end tags with attrs in script states ----

  test("escaped-script appropriate end tag with attributes closes") {
    check("<script><!--</script x>-->y",
      "start(script||sc=false|ns=0)", "text[ScriptData](<!--)",
      "end(script)", "text[Data](-->y)", "eof")
  }

  test("plain script data appropriate end tag with attributes closes") {
    check("<script>a</script x>y",
      "start(script||sc=false|ns=0)", "text[ScriptData](a)",
      "end(script)", "text[Data](y)", "eof")
  }

  // ---- batch 13: entity rawness, comment-start-dash, escape-start miss,
  // CR non-normalization, EOF raws ----

  test("character references stay raw at the lexeme level") {
    // lol-html tokenizes without entity decoding; the serializer's
    // passthrough identity depends on it
    check("a&#65;b&amp;c", "text[Data](a&#65;b&amp;c)", "eof")
  }

  test("&quot; inside a quoted attribute value does not close it") {
    check("<a b=\"&quot;x\">t", "start(a|b=&quot;x|sc=false|ns=0)",
      "text[Data](t)", "eof")
  }

  test("comment-start-dash followed by data keeps the dash") {
    // comment start dash: not '-' or '>' -> append '-' and reconsume
    check("<!---x-->y", "comment(-x)", "text[Data](y)", "eof")
  }

  test("'<!-' in script data never enters the escape") {
    // escape-start-dash needs a SECOND dash; 'x' falls back to plain
    // script data, and the appropriate end tag closes as usual
    check("<script><!-x</script>y",
      "start(script||sc=false|ns=0)", "text[ScriptData](<!-x)",
      "end(script)", "text[Data](y)", "eof")
  }

  test("CR in RCDATA is not normalized at the lexeme level") {
    check("<title>a\rb</title>",
      "start(title||sc=false|ns=0)", "text[RCData](a\rb)", "end(title)", "eof")
  }

  test("'<br/' at EOF drops the tag, keeps the raw") {
    check("x<br/", "text[Data](x)", "raw(<br/)", "eof")
  }

  test("bogus comment from '<?' at EOF is emitted") {
    check("a<?", "text[Data](a)", "comment(?)", "eof")
  }

  test("'</br>' is an ordinary end-tag lexeme") {
    // voidness is a tree concern; the tokenizer emits the end tag
    check("x</br>y", "text[Data](x)", "end(br)", "text[Data](y)", "eof")
  }

  test("doctype public id in single quotes abruptly closed") {
    check("<!doctype html public 'p>x",
      "doctype(html|p|<none>|quirks=true)", "text[Data](x)", "eof")
  }

  // ---- batch 13: foreign-content self-closing and integration points ----

  test("self-closing IS acknowledged in foreign content") {
    // <script/> inside svg closes immediately (no script data mode in
    // foreign content): x is ordinary svg child text — the foreign
    // counterpart of batch 12's HTML text-element cases
    check("<svg><script/>x</svg>",
      "start(svg||sc=false|ns=1)", "start(script||sc=true|ns=1)",
      "text[Data](x)", "end(svg)", "eof")
  }

  test("self-closed annotation-xml is not an open integration point") {
    check("<math><annotation-xml encoding=\"text/html\"/><abbr>x",
      "start(math||sc=false|ns=2)",
      "start(annotation-xml|encoding=text/html|sc=true|ns=2)",
      "start(abbr||sc=false|ns=2)", "text[Data](x)", "eof")
  }

  test("mtext is a MathML text integration point") {
    // ADJUDICATED: first guess said mtext reports ns=2 (it lives in the
    // MathML subtree), but the engine's convention — set in batch 4/5
    // with svg <desc>/<title> — is that integration-point elements
    // report the ENTERED namespace their children parse in (the ns is
    // captured after feedback). mtext is a text integration point, so
    // ns=0, exactly like desc
    check("<math><mtext><b>x",
      "start(math||sc=false|ns=2)", "start(mtext||sc=false|ns=0)",
      "start(b||sc=false|ns=0)", "text[Data](x)", "eof")
  }

  test("CDATA is NOT recognized inside an HTML integration point") {
    // foreignObject children parse under HTML rules: '<![CDATA[' is the
    // incorrectly-opened-comment path -> bogus comment
    check("<svg><foreignObject><![CDATA[x]]></foreignObject></svg>",
      "start(svg||sc=false|ns=1)", "start(foreignObject||sc=false|ns=0)",
      "comment([CDATA[x]])", "end(foreignObject)", "end(svg)", "eof")
  }

  test("HTML <title> inside an svg integration point is RCDATA again") {
    // desc switches children to HTML dispatch, so <title> there is the
    // HTML title element and the rcdata switch applies — the complement
    // of the svg-title trap (svg <title> itself is NOT rcdata)
    check("<svg><desc><title>a<b></title>x",
      "start(svg||sc=false|ns=1)", "start(desc||sc=false|ns=0)",
      "start(title||sc=false|ns=0)", "text[RCData](a<b>)", "end(title)",
      "text[Data](x)", "eof")
  }

  // ---- batch 14 ----

  test("<p> is in the foreign-content breakout list") {
    check("<svg><p>x",
      "start(svg||sc=false|ns=1)", "start(p||sc=false|ns=0)",
      "text[Data](x)", "eof")
  }

  test("<font> breaks out of foreign content ONLY with color/size/face") {
    // bare font is a legitimate foreign element; a color attribute makes
    // it the HTML font element (tree feedback reads the attributes)
    check("<svg><font>x",
      "start(svg||sc=false|ns=1)", "start(font||sc=false|ns=1)",
      "text[Data](x)", "eof")
    check("<svg><font color=red>y",
      "start(svg||sc=false|ns=1)", "start(font|color=red|sc=false|ns=0)",
      "text[Data](y)", "eof")
    // a font attribute OUTSIDE the trigger set does not break out
    check("<svg><font class=z>w",
      "start(svg||sc=false|ns=1)", "start(font|class=z|sc=false|ns=1)",
      "text[Data](w)", "eof")
  }

  test("empty quoted attribute values") {
    check("<a b='' c=\"\">x", "start(a|b=,c=|sc=false|ns=0)",
      "text[Data](x)", "eof")
  }

  test("doctype name keeps its raw case at the lexeme level") {
    // the spec lowercases the NAME at the token level; the lexeme keeps
    // the raw slice (passthrough identity), like tag names do
    check("<!DoCtYpE HtMl>x",
      "doctype(HtMl|<none>|<none>|quirks=false)", "text[Data](x)", "eof")
  }

  test("CDATA IS recognized inside a non-integration annotation-xml") {
    // annotation-xml WITHOUT an html encoding keeps its children in the
    // MathML namespace, so the CDATA machinery stays on — the foreign
    // complement of batch 13's foreignObject case
    check("<math><annotation-xml><![CDATA[x]]>",
      "start(math||sc=false|ns=2)", "start(annotation-xml||sc=false|ns=2)",
      "raw(<![CDATA[)", "text[CDataSection](x)", "raw(]]>)", "eof")
  }

  test("entities in RCDATA stay raw") {
    check("<textarea>&amp;</textarea>",
      "start(textarea||sc=false|ns=0)", "text[RCData](&amp;)",
      "end(textarea)", "eof")
  }

  // ---- batch 15 ----

  test("end tag with a self-closing slash in data context still closes") {
    check("<b>x</b/>y",
      "start(b||sc=false|ns=0)", "text[Data](x)", "end(b)",
      "text[Data](y)", "eof")
  }

  test("tag and attribute names keep raw case at the lexeme level") {
    check("<DIV CLASS=Foo>x</DIV>",
      "start(DIV|CLASS=Foo|sc=false|ns=0)", "text[Data](x)", "end(DIV)", "eof")
  }

  test("style inside svg is NOT rawtext; breakout still applies inside it") {
    // foreign content has no rawtext switch; <b> is in the breakout
    // list so it pops the foreign subtree mid-'style'
    check("<svg><style>a<b>c",
      "start(svg||sc=false|ns=1)", "start(style||sc=false|ns=1)",
      "text[Data](a)", "start(b||sc=false|ns=0)", "text[Data](c)", "eof")
  }

  test("a nested <title> start inside RCDATA is text") {
    check("<title><title></title>x",
      "start(title||sc=false|ns=0)", "text[RCData](<title>)",
      "end(title)", "text[Data](x)", "eof")
  }

  // ---- batch 16 ----

  test("letter directly after a quoted value starts a new attribute") {
    // after-attribute-value-quoted: anything but ws/'/'/'>' is a
    // missing-whitespace-between-attributes error, reconsumed in
    // before-attribute-name — 'd' opens attribute d=e
    check("<a b=\"c\"d=e>x",
      "start(a|b=c,d=e|sc=false|ns=0)", "text[Data](x)", "eof")
  }

  test("solidus directly after a quoted value sets self-closing") {
    // after-attribute-value-quoted '/' -> self-closing-start -> '>'
    check("<a b=\"c\"/>x",
      "start(a|b=c|sc=true|ns=0)", "text[Data](x)", "eof")
  }

  test("double-escape start with a non-script name stays single-escaped") {
    // '<a' in script-data-escaped enters double-escape-START, but the
    // temp buffer 'a' != 'script' at '>' so the state falls back to
    // script-data-escaped — the later '-->' exits the escape and the
    // appropriate end tag closes normally
    check("<script><!--<a>x-->y</script>z",
      "start(script||sc=false|ns=0)", "text[ScriptData](<!--<a>x-->y)",
      "end(script)", "text[Data](z)", "eof")
  }

  test("junk after the PUBLIC id forces quirks (asymmetric with system)") {
    // between-doctype-public-and-system-identifiers: a non-quote char is
    // a parse error with force-quirks ON and bogus-doctype skip — the
    // counterpart of the batch-4 after-SYSTEM case where quirks stays off
    check("<!doctype html public \"p\" x>y",
      "doctype(html|p|<none>|quirks=true)", "text[Data](y)", "eof")
  }

  test("'=' opening an attribute NAME keeps collecting name characters") {
    // before-attribute-name '=' -> unexpected-equals-sign error, the
    // char STARTS the name; 'b' continues it -> attr named '=b', no value
    // (distinct from the batch-1 '<a ==x>' case, where the SECOND '='
    // terminates the one-char name and 'x' becomes the value)
    check("<a =b>x", "start(a|=b=|sc=false|ns=0)", "text[Data](x)", "eof")
  }

  test("self-closing slash on a foreign END tag still closes the subtree") {
    // '/' on an end tag reaches self-closing-start and '>' sets a flag
    // the spec ignores for end tags; the svg subtree is exited either way
    check("<svg></svg/>x",
      "start(svg||sc=false|ns=1)", "end(svg)", "text[Data](x)", "eof")
  }

  // ---- batch 17 ----

  test("appropriate end tag matches case-insensitively, lexeme keeps raw case") {
    // 'appropriate end tag' compares the LOWERCASED name against the last
    // start tag; the lexeme itself is raw, so </TITLE> both exits RCDATA
    // and prints with its original case
    check("<title>x</TITLE>y",
      "start(title||sc=false|ns=0)", "text[RCData](x)",
      "end(TITLE)", "text[Data](y)", "eof")
  }

  test("whitespace on both sides of '=' still binds the value") {
    // attribute-name -> after-attribute-name (ws) -> '=' ->
    // before-attribute-value (ws skipped) -> unquoted value
    check("<a b = c>x", "start(a|b=c|sc=false|ns=0)", "text[Data](x)", "eof")
  }

  test("breakout from a re-entered foreign subtree stops at the integration point") {
    // stack: svg(foreign) > desc(HTML integration point) > svg(foreign);
    // <b> is in the breakout list, pops ONLY the inner svg (the pop walks
    // until an integration point or HTML element), so b is created under
    // desc's HTML dispatch — the breakout twin of batch 10's <g> case
    check("<svg><desc><svg><b>x",
      "start(svg||sc=false|ns=1)", "start(desc||sc=false|ns=0)",
      "start(svg||sc=false|ns=1)", "start(b||sc=false|ns=0)",
      "text[Data](x)", "eof")
  }

  test("EOF inside a question-mark bogus comment emits the collected data") {
    // '<?' -> bogus comment (the '?' reconsumed into the data); EOF in
    // bogus-comment emits the comment as collected, then EOF
    check("a<?xy", "text[Data](a)", "comment(?xy)", "eof")
  }

  // ---- batch 18 ----

  test("SYSTEM keyword matches case-insensitively; system-only doctype is not quirks") {
    // after-doctype-name compares the next six chars case-insensitively;
    // a well-formed system-only doctype never sets the tokenizer's
    // force-quirks flag (quirks from ID VALUES is a tree-construction
    // decision, not a tokenizer one)
    check("<!doctype html SyStEm \"s\">y",
      "doctype(html|<none>|s|quirks=false)", "text[Data](y)", "eof")
  }

  test("a CDATA-looking run inside RCDATA is plain text") {
    // '<' in RCDATA only matters before '/'; '<!' has no markup meaning
    // there, so the whole bracket run is RCDATA text (contrast: bogus
    // comment in Data state, real CDATA in foreign content)
    check("<title><![CDATA[x]]></title>y",
      "start(title||sc=false|ns=0)", "text[RCData](<![CDATA[x]]>)",
      "end(title)", "text[Data](y)", "eof")
  }

  test("svg re-entered from a MathML TEXT integration point, then breakout") {
    // mi's children are HTML-dispatched (text integration point), so its
    // <svg> child opens a NEW foreign subtree; <b> is a breakout tag and
    // pops only that inner svg — the MathML twin of batch 17's desc case
    check("<math><mi><svg><b>x",
      "start(math||sc=false|ns=2)", "start(mi||sc=false|ns=0)",
      "start(svg||sc=false|ns=1)", "start(b||sc=false|ns=0)",
      "text[Data](x)", "eof")
  }

  test("<svg> under annotation-xml enters SVG even WITHOUT the encoding attr") {
    // SPEC TRAP (first-guess expectation was ns=2 — the ENGINE was
    // right): the foreign-content rules carry an EXPLICIT carve-out —
    // "if the adjusted current node is a MathML annotation-xml element
    // and the token is a start tag named svg", the element is inserted
    // in the SVG namespace. This is independent of the encoding
    // attribute (which only decides the HTML integration point).
    check("<math><annotation-xml><svg>x",
      "start(math||sc=false|ns=2)",
      "start(annotation-xml||sc=false|ns=2)",
      "start(svg||sc=false|ns=1)", "text[Data](x)", "eof")
  }

  test("an <svg> START TAG in plain MathML foreign content enters SVG (reference parity)") {
    // ADJUDICATED to the reference convention (full-spec answer differs):
    // per §13.2.6.5 a non-breakout start tag under mrow (no integration
    // point, no annotation-xml carve-out) is created in the ADJUSTED
    // CURRENT namespace — an element NAMED svg in the MathML ns. The
    // reference's tree_builder_simulator has no tree: it dispatches on
    // the tag NAME before the foreign-content rules (mod.rs:134 —
    // `if tag_name == Tag::Svg { enter_ns(Svg) }` unconditionally), so
    // any <svg> start tag enters the SVG namespace. The downstream
    // decisions the simulator exists for (text modes, CDATA gating,
    // integration points) come out the same either way; we match the
    // reference, as with batch 14's mtext adjudication.
    check("<math><mrow><svg>x",
      "start(math||sc=false|ns=2)", "start(mrow||sc=false|ns=2)",
      "start(svg||sc=false|ns=1)", "text[Data](x)", "eof")
  }

  // ---- batch 19 ----

  test("'--!>' does NOT exit script-data-escaped (unlike comments)") {
    // comment-end-bang has a '>' arm that closes a COMMENT; the script
    // escape's dash-dash state only exits on '>', so '!' falls back to
    // script-data-escaped and the '>' after it is plain text — the run
    // ends at the appropriate end tag, not at '--!>'
    check("<script><!--x--!>y</script>z",
      "start(script||sc=false|ns=0)", "text[ScriptData](<!--x--!>y)",
      "end(script)", "text[Data](z)", "eof")
  }

  test("an end tag named p breaks out of foreign content") {
    // the foreign-content breakout rule covers END tags br/p as well as
    // the start-tag list (reference should_leave_ns, mod.rs:160-171):
    // </p> pops the svg subtree and is reprocessed as an HTML end tag
    check("<svg></p>x",
      "start(svg||sc=false|ns=1)", "end(p)", "text[Data](x)", "eof")
  }

  test("a double quote inside an UNQUOTED attribute value is a value character") {
    // attribute-value-unquoted: '\"', ''', '<', '=', '`' are
    // unexpected-character-in-unquoted-attribute-value errors but are
    // APPENDED to the value, not terminators
    check("<a b=c\"d>x",
      "start(a|b=c\"d|sc=false|ns=0)", "text[Data](x)", "eof")
  }

  // ---- batch 20 ----

  test("appropriate end tag exits from script-data-escaped-DASH (one pending dash)") {
    // '<!--x' lands in script-data-escaped; the single '-' moves to
    // escaped-dash, whose '<' arm reaches the end-tag path — the
    // single-escape sibling of the covered double-escape '-</script>'
    // case; the pending dash stays in the text
    check("<script><!--x-</script>y",
      "start(script||sc=false|ns=0)", "text[ScriptData](<!--x-)",
      "end(script)", "text[Data](y)", "eof")
  }

  // ---- batch 21 ----

  test("'<' inside an attribute NAME is a literal name character") {
    // attribute-name state: '<' is unexpected-character-in-attribute-name
    // (parse error) but collected like any other — sibling of the
    // covered quote-in-name case
    check("<a x<y=1>z", "start(a|x<y=1|sc=false|ns=0)", "text[Data](z)", "eof")
  }

  test("EOF in comment-end state emits the comment without the pending dashes") {
    // comment-end: the two dashes were consumed but never appended to
    // the data (they only join on '-' or anything-else continuations);
    // EOF -> eof-in-comment, emit what was collected
    check("<!--x--", "comment(x)", "eof")
  }

  test("EOF in comment-end-dash state emits the comment without the pending dash") {
    check("<!--x-", "comment(x)", "eof")
  }

  test("EOF in comment-end-bang state emits the comment without '--!'") {
    // comment-end-bang: '--!' joins the data only on a '-' or
    // anything-else continuation; EOF emits the bare collected data
    check("<!--x--!", "comment(x)", "eof")
  }

  test("escaped less-than followed by a non-letter stays in script text") {
    // script-data-escaped-less-than-sign: '4' is neither '/' nor a
    // letter -> the '<' is plain text, reconsume; '-->' then exits the
    // escape and the end tag closes from plain script data
    check("<script><!--<4--></script>y",
      "start(script||sc=false|ns=0)", "text[ScriptData](<!--<4-->)",
      "end(script)", "text[Data](y)", "eof")
  }

  test("escaped less-than followed by another '<' re-enters the less-than path") {
    // first '<' (after the dash-dash run) parks in escaped-less-than;
    // the second '<' is anything-else -> reconsume, then '/' opens the
    // appropriate end tag
    check("<script><!--<</script>y",
      "start(script||sc=false|ns=0)", "text[ScriptData](<!--<)",
      "end(script)", "text[Data](y)", "eof")
  }

  test("quote right after a quoted value starts an attribute NAMED with quotes") {
    // after-attribute-value-quoted: ''' is missing-whitespace-between-
    // attributes (parse error), reconsume into before-attribute-name —
    // the quotes become name characters, so the attr is named 'd'
    // (quotes included) with no value
    check("<a b=\"c\"'d'>x",
      "start(a|b=c,'d'=|sc=false|ns=0)", "text[Data](x)", "eof")
  }

  test("PUBLIC keyword is matched case-insensitively") {
    // after-doctype-name compares the six chars ASCII-case-insensitively
    // (the batch-18 SYSTEM fold's sibling)
    check("<!doctype html PuBlIc \"p\" \"s\">y",
      "doctype(html|p|s|quirks=false)", "text[Data](y)", "eof")
  }

  // ---- batch 22: attribute-name quote append, first-char '=' value,
  // nested comment open, data-state '</ ' bogus comment, CDATA single
  // bracket ----

  test("a double quote INSIDE an attribute name is a name character") {
    // attribute name state: '\"' is unexpected-character-in-attribute-
    // name (parse error) but appends — distinct from batch 21's
    // after-attribute-value-quoted case, which STARTS a new quote-named
    // attribute
    check("<a a\"b=c>z", "start(a|a\"b=c|sc=false|ns=0)",
      "text[Data](z)", "eof")
  }

  test("'=' as the FIRST unquoted value character is part of the value") {
    // before attribute value has no '=' carve-out: anything-else
    // reconsumes into attribute-value-unquoted, so the value is '=c'
    // (batch-1's '<a a=b=c>' covers '=' MID-value; this is the
    // error-path first character)
    check("<a b==c>z", "start(a|b==c|sc=false|ns=0)",
      "text[Data](z)", "eof")
  }

  test("a nested comment open collects as comment data") {
    // comment state: '<' and '!' append via the less-than-sign states;
    // the two dashes route through bang-dash-dash, whose anything-else
    // branch reconsumes in comment END — whose anything-else appends the
    // swallowed '--' back and returns to comment data. Net: '<!--y' is
    // all data (nested-comment parse error, nothing re-opens)
    check("<!--x<!--y-->z", "comment(x<!--y)", "text[Data](z)", "eof")
  }

  test("'</ ' in DATA starts a bogus comment (unlike rcdata, where it is text)") {
    // end tag open: a non-letter that is not '>' is invalid-first-
    // character-of-tag-name -> bogus comment state with the char
    // reconsumed, so everything to '>' becomes comment data ' b'
    check("x</ b>y", "text[Data](x)", "comment( b)",
      "text[Data](y)", "eof")
  }

  test("a single ']' inside CDATA stays in the section") {
    // cdata-section-bracket: anything-else emits the ']' and reconsumes
    // in the section (the batch-1 ']]b' case covers bracket->END->
    // anything; this is bracket->anything directly)
    check("<svg><![CDATA[a]x]]></svg>",
      "start(svg||sc=false|ns=1)", "raw(<![CDATA[)",
      "text[CDataSection](a]x)", "raw(]]>)", "end(svg)", "eof")
  }
}
