package graft.rewrite

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import scala.collection.mutable

/** Frameless-VM equivalence: entry-only programs (no combinators — the
  * extraction default) run on per-name depth stacks plus a matched-only
  * element stack instead of full open-element frames. These tests pin the
  * frameless path byte- and event-identical to the framed stack on the
  * same inputs: serialized output, element/text handler event order,
  * emission intervals, and end-tag semantics (implicit closes, stray end
  * tags, FNV-keyed unhashable names, ESI voids).
  */
class FramelessVmSpec extends AnyFunSuite {

  /** Run an entry-only workload both ways; return (events, output). */
  private def run(html: String, selectors: Seq[String], forceFramed: Boolean,
                  removeSel: Set[String] = Set.empty,
                  enableEsi: Boolean = false): (Seq[String], String) = {
    val events = new mutable.ArrayBuffer[String]()
    val handlers = selectors.map { s =>
      s -> ElementHandlers(
        element = el => {
          events += s"el:$s:${el.tagName}:${el.canHaveContent}"
          if (removeSel(s)) el.remove()
        },
        text = tc => { if (tc.text.nonEmpty) events += s"tx:$s:${tc.text}" })
    }
    val listener = new RewriteListener {
      override def onEmissionDisabled(pos: Int): Unit = events += s"off:$pos"
      override def onEmissionEnabled(pos: Int): Unit = events += s"on:$pos"
    }
    val rw = new Rewriter(handlers, strict = false, listener = listener,
      enableEsiTags = enableEsi)
    if (forceFramed) rw.disableFramelessVm()
    val out = rw.rewrite(html)
    (events.toSeq, out)
  }

  private def bothModes(html: String, selectors: Seq[String],
                        removeSel: Set[String] = Set.empty,
                        enableEsi: Boolean = false): (Seq[String], String) = {
    val (eF, oF) = run(html, selectors, forceFramed = true, removeSel, enableEsi)
    val (eL, oL) = run(html, selectors, forceFramed = false, removeSel, enableEsi)
    assert(eL == eF, s"event divergence on: $html")
    assert(oL == oF, s"output divergence on: $html")
    (eL, oL)
  }

  test("strip workload: removal intervals and output identical across modes") {
    val (events, out) = bothModes(
      "<html><head><title>t</title></head><body><nav>menu</nav><p>keep</p>" +
        "<script>var x=1;</script><div>also</div></body></html>",
      Seq("nav", "script", "head"), removeSel = Set("nav", "script", "head"))
    assert(out == "<html><body><p>keep</p><div>also</div></body></html>")
    assert(events.count(_.startsWith("off:")) == 3)
  }

  test("implicit closes: <li>/<dd> runs drain matched ancestors correctly") {
    bothModes("<ul><li>a<li>b<li>c</ul><p>after</p>", Seq("ul", "li"),
      removeSel = Set("li"))
    bothModes("<div><ul><li>x<div>deep</div><li>y</ul>tail</div>",
      Seq("div"), removeSel = Set.empty)
    // end tag closes an OUTER element: everything inside (incl. matched
    // frames) is implicitly closed in one pop
    val (_, out) = bothModes("<section><article>a<p>b</section>done",
      Seq("article"), removeSel = Set("article"))
    assert(out == "<section>done")
  }

  test("text capture scoping survives implicit closes in both modes") {
    val (events, _) = bothModes(
      "<div>in<span>deep</span></div>out<ul><li>one<li>two</ul>",
      Seq("div", "li"))
    assert(events.filter(_.startsWith("tx:div")) == Seq("tx:div:in", "tx:div:deep"))
    assert(events.filter(_.startsWith("tx:li")) == Seq("tx:li:one", "tx:li:two"))
  }

  test("stray end tags and void elements") {
    bothModes("a</div>b<br></br><img src=x></img>c<p>d</p>", Seq("p", "br"))
    bothModes("</em-custom-long-name>x<hr>y", Seq("hr"))
  }

  test("unhashable names: nesting, implicit close, stray reject") {
    val (_, out) = bothModes(
      "<emu-clause-like-name>a<emu-xref-like-name>b</emu-clause-like-name>c",
      Seq("emu-xref-like-name"), removeSel = Set("emu-xref-like-name"))
    assert(out == "<emu-clause-like-name>ac")
    bothModes("</emu-stray-long-name>keep<emu-stray-long-name>x</emu-stray-long-name>",
      Seq("emu-stray-long-name"), removeSel = Set("emu-stray-long-name"))
  }

  test("foreign content: self-closing non-HTML-ns elements") {
    bothModes("<svg><circle r=1/><text>t</text></svg>after", Seq("text"),
      removeSel = Set("text"))
    bothModes("<math><mi>x</mi><annotation-xml><div>d</div></annotation-xml></math>",
      Seq("div"))
  }

  test("esi void tags close nothing in either mode") {
    val (_, out) = bothModes("<div>a<esi:include src=\"/u\"/>b</div>",
      Seq("esi\\:include"), removeSel = Set("esi\\:include"), enableEsi = true)
    assert(out == "<div>ab</div>")
  }

  test("extraction spans identical on the golden bench documents") {
    import graft.extract.{ExtractPolicy, Extractor}
    // the Extractor always runs frameless (entry-only strip program);
    // compare against a framed-mode Rewriter with the same strip handlers
    for (name <- Seq("cloudflare.com.html", "ecma402-spec.html", "html-parsing-spec.html")) {
      val in = getClass.getResourceAsStream(s"/benchdocs/$name")
      assume(in != null)
      val bytes = in.readAllBytes(); in.close()
      val framedEvents = new mutable.ArrayBuffer[(Char, Int)]()
      val framedListener = new RewriteListener {
        override def onEmissionDisabled(pos: Int): Unit = framedEvents += (('d', pos))
        override def onEmissionEnabled(pos: Int): Unit = framedEvents += (('e', pos))
        override def wantsRawText: Boolean = true
        override def onRawText(s: Int, e: Int, t: Int): Unit = framedEvents += (('t', s * 31 + e))
        override def onRawTextEnd(): Unit = framedEvents += (('n', 0))
      }
      val framedRw = new Rewriter(
        ExtractPolicy.DefaultStrip.map(s => s -> ElementHandlers(element = el => el.remove())) :+
          ("meta" -> ElementHandlers(element = _ => ())),
        strict = false, listener = framedListener, produceOutput = false)
      framedRw.disableFramelessVm()
      framedRw.rewriteToBytes(bytes)

      val flEvents = new mutable.ArrayBuffer[(Char, Int)]()
      val flListener = new RewriteListener {
        override def onEmissionDisabled(pos: Int): Unit = flEvents += (('d', pos))
        override def onEmissionEnabled(pos: Int): Unit = flEvents += (('e', pos))
        override def wantsRawText: Boolean = true
        override def onRawText(s: Int, e: Int, t: Int): Unit = flEvents += (('t', s * 31 + e))
        override def onRawTextEnd(): Unit = flEvents += (('n', 0))
      }
      val flRw = new Rewriter(
        ExtractPolicy.DefaultStrip.map(s => s -> ElementHandlers(element = el => el.remove())) :+
          ("meta" -> ElementHandlers(element = _ => ())),
        strict = false, listener = flListener, produceOutput = false)
      flRw.rewriteToBytes(bytes)

      assert(flEvents == framedEvents, s"listener-event divergence on $name")

      // and the actual Extractor (frameless) produces non-empty spans
      val ex = new Extractor(ExtractPolicy.Default.copy(strict = false))
      assert(ex.extractRaw(bytes, Vector.empty, Vector.empty).count > 0)
    }
  }

  test("property: random html-ish input, frameless == framed (events + output)") {
    val piece = Gen.oneOf(
      Gen.oneOf("<", ">", "</", "<!--", "-->", "'", "\"", "=", "/", "/>", " ",
        "<div>", "</div>", "<ul>", "<li>", "</ul>", "<p>", "</p>", "<br>",
        "<script>", "</script>", "<svg>", "</svg>", "<circle r=1/>",
        "<nav>", "</nav>", "<emu-long-custom-name>", "</emu-long-custom-name>",
        "<span>", "</span>", "</li>", "<td>", "<tr>", "</table>", "<table>"),
      Gen.asciiPrintableStr.map(_.take(10))
    )
    val htmlish = Gen.listOf(piece).map(_.mkString).map(_.take(500))
    val selectors = Seq("div", "li", "nav", "emu-long-custom-name", "script")
    var i = 0
    while (i < 400) {
      htmlish.apply(Gen.Parameters.default, Seed(7042L + i)).foreach { doc =>
        val (eF, oF) = run(doc, selectors, forceFramed = true, removeSel = Set("nav", "script"))
        val (eL, oL) = run(doc, selectors, forceFramed = false, removeSel = Set("nav", "script"))
        assert(eL == eF, s"event divergence on: $doc")
        assert(oL == oF, s"output divergence on: $doc")
      }
      i += 1
    }
  }

  test("property: PREDICATE entry programs (class/[attr]/:not) frameless == framed") {
    // round-4 generalization: entry-only programs with universal and
    // attribute predicates run frameless too (no fastEntry) — same
    // equivalence bar as the name-only property above
    val piece = Gen.oneOf(
      Gen.oneOf("<", ">", "</", "<!--", "-->", "'", "\"", "=", "/", "/>", " ",
        "<div>", "</div>", "<div class='note'>", "<a href='/x'>", "</a>",
        "<a rel=ext href=y>", "<ul>", "<li>", "</ul>", "<p class=note>",
        "</p>", "<br>", "<script>", "</script>", "<svg>", "</svg>",
        "<span class='note other'>", "</span>", "</li>",
        "<emu-x href=q>", "</emu-x>", "<td>", "<tr>", "</table>", "<table>"),
      Gen.asciiPrintableStr.map(_.take(10))
    )
    val htmlish = Gen.listOf(piece).map(_.mkString).map(_.take(500))
    val selectors = Seq("div", ".note", "[href]", "a[rel=ext]", ":not(span)")
    var i = 0
    while (i < 400) {
      htmlish.apply(Gen.Parameters.default, Seed(9137L + i)).foreach { doc =>
        val (eF, oF) = run(doc, selectors, forceFramed = true, removeSel = Set("[href]"))
        val (eL, oL) = run(doc, selectors, forceFramed = false, removeSel = Set("[href]"))
        assert(eL == eF, s"event divergence on: $doc")
        assert(oL == oF, s"output divergence on: $doc")
      }
      i += 1
    }
  }

  test("comma list: one match id on two satisfied compounds fires ONCE (VM level)") {
    // "div, .note" compiles ONE match id onto TWO entry instrs; a
    // <div class=note> satisfies both. The framed path dedups ids via its
    // match mask — the frameless path must too (round-5 fix), or any
    // per-match consumer (span/metric counting) double-counts. Duplicates
    // are invisible at the Rewriter level (refcounts are symmetric), so
    // this asserts on the raw VM onMatch callbacks.
    import graft.selectors._
    import graft.core.TagHash
    def viewOf(name: String, classes: String): VmElemView = new VmElemView {
      private val bytes = name.getBytes("UTF-8")
      nameFnvV = 0L; nameStartV = 0; nameEndV = bytes.length
      def nameInput: Array[Byte] = bytes
      def nameLower: String = name
      def nameHash: Long = TagHash.of(name)
      def isHtmlNs: Boolean = true
      def attrCount: Int = if (classes == null) 0 else 1
      def attrNameLower(i: Int): String = "class"
      def attrValue(i: Int): String = classes
    }
    def idsOf(forceFramed: Boolean, name: String, classes: String): Seq[Int] = {
      val program = Program.compile(Seq(
        (SelectorParser.parse("div, .note"), 0), (SelectorParser.parse("span"), 1)))
      val vm = new MatchingVm(program)
      vm.disableFrameless = forceFramed
      vm.reset()
      val got = new mutable.ArrayBuffer[Int]()
      vm.execStartTag(viewOf(name, classes), selfClosing = false,
        (id: Int, _: Boolean) => got += id)
      got.toSeq
    }
    for (framed <- Seq(true, false)) {
      assert(idsOf(framed, "div", "note") == Seq(0), s"framed=$framed") // both compounds, one fire
      assert(idsOf(framed, "div", null) == Seq(0), s"framed=$framed")
      assert(idsOf(framed, "p", "note") == Seq(0), s"framed=$framed")
      assert(idsOf(framed, "span", null) == Seq(1), s"framed=$framed")
      assert(idsOf(framed, "p", null) == Seq(), s"framed=$framed")
    }
  }

  test("comma list: Rewriter events identical across modes") {
    val (events, _) = bothModes(
      "<div class=note>x</div><div>y</div><p class=note>z</p><span>w</span>",
      Seq("div, .note"))
    assert(events.count(_.startsWith("el:div, .note:")) == 3)
  }

  test("nth predicates force the framed stack (frameless has no child counters)") {
    // :nth-child needs per-parent counters — the program must NOT go
    // frameless, and both calls must agree (i.e. the eligibility check
    // keeps it framed rather than silently mis-matching)
    val html = "<ul><li>a</li><li>b</li><li>c</li></ul>"
    val hits = new mutable.ArrayBuffer[String]()
    val rw = new Rewriter(Seq("li:nth-child(2)" -> ElementHandlers(
      element = el => hits += el.tagName)), strict = false, produceOutput = false)
    rw.rewrite(html)
    rw.rewrite(html)
    assert(hits.toSeq == Seq("li", "li"))
  }

  test("engine reuse across documents: stale depth entries never leak") {
    val rw = new Rewriter(Seq("div" -> ElementHandlers(element = el => el.remove())),
      strict = false)
    // doc 1 leaves unclosed elements at EOF (entries stay in the stacks)
    assert(rw.rewrite("<section><div>gone") == "<section>")
    // doc 2 must not see doc 1's depths: this </section> is stray here
    assert(rw.rewrite("x</section><div>y</div>z") == "x</section>z")
    // doc 3: unhashable leftovers
    assert(rw.rewrite("<emu-stale-name-x><div>a") == "<emu-stale-name-x>")
    assert(rw.rewrite("b</emu-stale-name-x><div>c</div>") == "b</emu-stale-name-x>")
  }
}
