package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.extract.{ExtractPolicy, Extractor, InFrag}

/** Property tests: the engine must be total (no crashes) on arbitrary
  * byte soup, raw-lossless, and fragmentation-invariant — the whole-doc
  * analog of the reference's random-chunk-size testing
  * (/root/reference/tests/harness/input.rs:59-72).
  */
class PropertySpec extends AnyFunSuite {

  /** Deterministic sampling loop (scalatestplus bridge not available in
    * the offline cache; plain scalacheck Gen + fixed seeds).
    */
  private def forAllSamples[A](gen: Gen[A], n: Int = 300)(check: A => Unit): Unit = {
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(check)
      i += 1
    }
  }

  private val htmlish: Gen[String] = {
    val piece = Gen.oneOf(
      Gen.oneOf("<", ">", "</", "<!--", "-->", "<!", "]]>", "<![CDATA[", "'", "\"",
        "=", " ", "/", "&amp;", "-", "!", "\n"),
      Gen.oneOf("div", "p", "script", "style", "svg", "math", "title", "textarea",
        "plaintext", "xmp", "select", "template", "nav", "li", "annotation-xml",
        "foreignObject", "mtext", "font", "br", "img"),
      Gen.oneOf("<div>", "</div>", "<script>", "</script>", "<svg>", "</svg>",
        "<math>", "</math>", "<select>", "</select>", "<template>", "</template>",
        "<style a=b c>", "<!doctype html>", "<?bogus?>", "<p class='x y'>",
        "text content", "a<b", "1>2"),
      Gen.asciiPrintableStr.map(_.take(12))
    )
    Gen.listOf(piece).map(_.mkString).map(_.take(600))
  }

  test("tokenizer is total and raw-lossless on arbitrary html-ish input") {
    val lexer = new Lexer(strict = false)
    forAllSamples(htmlish) { s =>
      val bytes = s.getBytes("UTF-8")
      val cover = new CoverageSink(bytes.length)
      lexer.parse(bytes, cover)
      assert(cover.fullyCovered, s"raw ranges do not tile: ${s.take(120)}")
    }
  }

  test("extraction is fragmentation-invariant on arbitrary input") {
    val ex = new Extractor(ExtractPolicy.Default.copy(strict = false))
    forAllSamples(Gen.zip(htmlish, Gen.choose(1, 50))) { case (s, frag) =>
      val whole = ex.extractString(s).spans
      val parts = s.grouped(frag).map(p => InFrag(isText = true, p, "")).toSeq
      assert(ex.extract(parts).spans == whole)
    }
  }

  test("strict mode either parses or bails, never crashes") {
    val lexer = new Lexer(strict = true)
    forAllSamples(htmlish) { s =>
      try lexer.parse(s.getBytes("UTF-8"), new NullSink)
      catch { case _: EngineBailoutException => () }
    }
  }

  test("rewrite with passthrough handlers is identity") {
    import graft.rewrite._
    // a comment handler on a never-matching selector still forces full
    // dispatch without mutations: output must equal input
    val rw = new Rewriter(Seq("never-matches-anything" -> ElementHandlers(
      element = _ => (), comments = _ => (), text = _ => ())), strict = false)
    forAllSamples(htmlish) { s =>
      assert(rw.rewrite(s) == s)
    }
  }

  test("selector parser is total: parses or rejects, never crashes") {
    import graft.selectors._
    val selish = {
      val piece = Gen.oneOf(
        Gen.oneOf(">", " ", ",", ".", "#", "[", "]", "=", "~=", "|=", "^=", "$=", "*=",
          "*", ":", "(", ")", "'", "\"", "\\", "i", "s", "-", "2n+1"),
        Gen.oneOf("div", "p", "a", "href", "class", "note", "not", "nth-child",
          "first-child", "nth-of-type", "x y"),
        Gen.asciiPrintableStr.map(_.take(6)))
      Gen.listOf(piece).map(_.mkString).map(_.take(80))
    }
    forAllSamples(selish, n = 500) { s =>
      try { SelectorParser.parse(s); () }
      catch { case _: SelectorParseException => () } // the ONLY rejection channel
    }
  }

  test("scan mode (attr-skip) and full-attr mode rewrite identically on arbitrary input") {
    import graft.rewrite._
    // the scan-mode equivalence claim (T3/O1/O5), property-style: for a
    // program that skips most tags' attributes, output and match counts
    // must be byte-identical with the skip disabled
    var n1 = 0; var n2 = 0
    val mk = (count: () => Unit) => Seq(
      "div" -> ElementHandlers(element = _ => count()),
      "p.note" -> ElementHandlers(element = _ => count()),
      "a" -> ElementHandlers(element = el => { el.attr("href"); count() }))
    val rwSkip = new Rewriter(mk(() => n1 += 1), strict = false)
    val rwFull = new Rewriter(mk(() => n2 += 1), strict = false)
    rwFull.disableAttrSkip = true
    forAllSamples(htmlish, n = 300) { s =>
      n1 = 0; n2 = 0
      val a = rwSkip.rewrite(s)
      val b = rwFull.rewrite(s)
      assert(a == b, s"output diverged for: ${s.take(120)}")
      assert(n1 == n2, s"match counts diverged ($n1 vs $n2) for: ${s.take(120)}")
    }
  }

  test("graceful bail-out conserves bytes on arbitrary input") {
    import graft.rewrite._
    // the whole point of the graceful contract: the caller's response is
    // NEVER truncated. With passthrough handlers, every budget either
    // (a) trips on input size -> output is marker + the untouched doc,
    // lastBailOut set; or (b) does not trip -> identity, lastBailOut null
    val marker = "<!--B-->"
    forAllSamples(Gen.zip(htmlish, Gen.choose(1, 700)), n = 200) { case (s, budget) =>
      val rw = new Rewriter(
        Seq("never-matches-anything" -> ElementHandlers(element = _ => ())),
        strict = false, maxDocBytes = budget,
        gracefulBailOutOnMemoryLimit = true,
        bailOutHandlers = Seq((_, bo) => bo.append(marker, ContentType.Html)))
      val out = rw.rewrite(s)
      if (s.getBytes("UTF-8").length > budget) {
        assert(out == marker + s, s"budget=$budget input=${s.take(80)}")
        assert(rw.lastBailOut != null)
      } else {
        assert(out == s)
        assert(rw.lastBailOut == null)
      }
    }
  }
}
