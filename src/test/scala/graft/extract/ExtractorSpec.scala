package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.spark.InterleavedGen
import graft.spark.InterleavedGen.DocRow

class ExtractorSpec extends AnyFunSuite {
  private val ex = new Extractor(ExtractPolicy.Default)

  test("strips boilerplate, keeps main text") {
    val r = ex.extractString(
      "<html><head><title>T</title><script>var x='<p>no</p>';</script></head>" +
        "<body><nav>menu</nav><article><p>Hello world</p></article><footer>f</footer></body></html>")
    assert(r.error == null)
    assert(r.spans.map(_.text) == Seq("Hello world"))
    assert(r.spans.head.kind == "text")
  }

  test("nested strip and whitespace-only nodes dropped") {
    val r = ex.extractString(
      "<body>\n  <nav><ul><li>a</li></ul></nav>\n  <p>keep <b>bold</b> tail</p>\n</body>")
    assert(r.spans.map(_.text) == Seq("keep ", "bold", " tail"))
  }

  test("comments and doctype are never content") {
    val r = ex.extractString("<!doctype html><!-- c --><p>x</p><!-- d -->")
    assert(r.spans.map(_.text) == Seq("x"))
  }

  test("rcdata kept, rawtext/script dropped") {
    val r = ex.extractString("<body><textarea>keep me</textarea><xmp>drop?</xmp><p>p</p></body>")
    // xmp is RawText and not in the strip list; RawText is not content
    assert(r.spans.map(_.text) == Seq("keep me", "p"))
  }

  test("unclosed stripped element removes to EOF") {
    val r = ex.extractString("<p>a</p><footer>junk<p>more junk")
    assert(r.spans.map(_.text) == Seq("a"))
  }

  test("ambiguity bails out gracefully with partial spans") {
    val r = ex.extractString("<p>before</p><select><xmp>x")
    assert(r.error != null && r.error.startsWith("parsing_ambiguity"))
    assert(r.spans.map(_.text) == Seq("before"))
  }

  test("media passthrough: kept outside removed intervals, dropped inside") {
    val html = "<body><nav>abc</nav><p>hello</p></body>"
    val navStart = html.indexOf("<nav>")
    val inNav = html.indexOf("abc") + 1
    val afterNav = html.indexOf("<p>")
    val inP = html.indexOf("hello") + 2
    val r = ex.extractHtml(html.getBytes("UTF-8"),
      Vector("m-dropped", "m-kept", "m-split"),
      Vector(inNav, afterNav, inP))
    assert(r.spans.map(s => (s.kind, if (s.kind == "text") s.text else s.media_ref)) == Seq(
      ("media", "m-kept"),
      ("text", "he"),
      ("media", "m-split"),
      ("text", "llo")))
    // offsets are byte positions in the stream
    assert(r.spans.map(_.offset) == Seq(afterNav, html.indexOf("hello"), inP, inP))
  }

  test("generator roundtrip: concat of text spans == original text") {
    for (id <- 0L to 24L) {
      val words = (1 to (id.toInt % 13) + 6).map(i => s"w$i${"x" * (i % 5)}").mkString(" ")
      val d = DocRow(id, words, "en", s"src$id", words.length)
      val spans = InterleavedGen.spansFor(d)
      val r = ex.extract(spans.map(s => InFrag(s.kind == "text", s.text, s.media_ref)))
      assert(r.error == null, s"doc $id error ${r.error}")
      val mainText = r.spans.filter(_.kind == "text").map(_.text).mkString
      assert(mainText == words, s"doc $id roundtrip")
      val media = r.spans.filter(_.kind == "media").map(_.media_ref)
      assert(media == (0 until (id % 5).toInt).map(j => s"media://$id/$j"), s"doc $id media")
      // spans are offset-ordered
      assert(r.spans.map(_.offset) == r.spans.map(_.offset).sorted)
    }
  }

  test("generator fragment-size invariance") {
    val d = DocRow(7L, ("lorem ipsum " * 30).trim, "en", "s", 0)
    def run(frag: Int) = {
      val spans = InterleavedGen.spansFor(d, fragBytes = frag)
      ex.extract(spans.map(s => InFrag(s.kind == "text", s.text, s.media_ref))).spans
    }
    assert(run(7) == run(97))
    assert(run(1) == run(100000))
  }

  test("extractor instance reuse across documents") {
    val a = ex.extractString("<p>one</p>")
    val b = ex.extractString("<nav>x</nav><p>two</p>")
    assert(a.spans.map(_.text) == Seq("one"))
    assert(b.spans.map(_.text) == Seq("two"))
  }
}
