package graft.extract

import org.scalatest.funsuite.AnyFunSuite

class HeuristicMainSpec extends AnyFunSuite {

  private def run(html: String, minLen: Int = 25, maxLink: Double = 0.33): Seq[String] =
    new HeuristicMain(minLen, maxLink).extractString(html)

  test("content paragraphs kept, link-dense nav dropped, no selectors configured") {
    val html =
      "<html><body>" +
        "<nav><ul><li><a href='/a'>Home sweet home page</a></li>" +
        "<li><a href='/b'>About this fine website</a></li></ul></nav>" +
        "<article><p>This paragraph carries the actual long-form content of the page.</p>" +
        "<p>And a second paragraph with more substantive text for the reader.</p></article>" +
        "</body></html>"
    assert(run(html) == Seq(
      "This paragraph carries the actual long-form content of the page.",
      "And a second paragraph with more substantive text for the reader."))
  }

  test("inline links below the density threshold do not sink a paragraph") {
    val html = "<p>A long paragraph of prose that happens to cite " +
      "<a href='/x'>a source</a> somewhere in the middle of its text.</p>"
    assert(run(html).size == 1)
  }

  test("a paragraph that is mostly link text is dropped") {
    val html = "<p><a href='/x'>almost everything in here is one link text</a> hm</p>"
    assert(run(html).isEmpty)
  }

  test("blocks shorter than minTextLen are dropped") {
    assert(run("<p>too short</p>").isEmpty)
    assert(run("<p>too short</p>", minLen = 5) == Seq("too short"))
  }

  test("nested blocks score independently (paragraph-level flattening)") {
    val html = "<ul><li>item text long enough to pass the length bar here" +
      "<p>a nested paragraph with its own long content inside the item</p></li></ul>"
    assert(run(html) == Seq(
      "item text long enough to pass the length bar here",
      "a nested paragraph with its own long content inside the item"))
  }

  test("script/style/rcdata text never counts as content") {
    val html = "<p>real content that is clearly long enough to keep" +
      "<script>var boilerplate_that_should_never_count = 1;</script></p>" +
      "<title>page title text never counts either</title>"
    assert(run(html) == Seq("real content that is clearly long enough to keep"))
  }

  test("blocks left open at EOF still score") {
    assert(run("<p>an unclosed paragraph with plenty of content to keep it") ==
      Seq("an unclosed paragraph with plenty of content to keep it"))
  }

  test("document order is preserved across implicit closes") {
    val html = "<ul><li>first item with enough text to clear the bar easily" +
      "<li>second item with enough text to clear the bar easily</ul>"
    assert(run(html) == Seq(
      "first item with enough text to clear the bar easily",
      "second item with enough text to clear the bar easily"))
  }

  test("context rule: a short clean block between good blocks is kept") {
    val html = "<p>a first paragraph that is clearly long enough to be good</p>" +
      "<p>Short one.</p>" +
      "<p>a third paragraph that is also clearly long enough to be good</p>"
    // default: the short middle block drops
    assert(run(html).size == 2)
    // with the JusText context rule it rides along with its neighbors
    assert(new HeuristicMain(25, 0.33, keepShortNearGood = true)
      .extractString(html).size == 3)
    // an ISOLATED short block still drops either way
    val iso = "<p>Short one.</p><p><a href='/x'>all link text in this one block</a></p>"
    assert(new HeuristicMain(25, 0.33, keepShortNearGood = true)
      .extractString(iso).isEmpty)
  }

  test("instance reuse across documents resets all state") {
    val hx = new HeuristicMain(5, 0.33)
    val a = hx.extractString("<p>first document body</p>")
    val b = hx.extractString("<p>second document body</p>")
    assert(a == Seq("first document body") && b == Seq("second document body"))
  }
}
