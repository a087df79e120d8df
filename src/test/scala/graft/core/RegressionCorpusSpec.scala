package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.TestJson
import graft.extract.{ExtractPolicy, Extractor, InFrag}

/** Runs the reference's regression corpora
  * (tests/data/regression .dat files + tests/data/expected_bailouts.json):
  *
  *  - expected_bailouts.json: every input must bail out with the same
  *    ambiguous tag AND at the same parsed-input boundary (parsedChunk)
  *    as the reference;
  *  - all other .dat inputs must tokenize without errors in strict mode
  *    and produce fragmentation-invariant extraction output.
  */
class RegressionCorpusSpec extends AnyFunSuite {

  private def datInputs(name: String): Seq[String] = {
    val text = TestJson.readFile(s"src/test/resources/regression/$name")
    // html5lib .dat: "#data" line, then input lines, terminated by "#"
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    val lines = text.split("\n", -1)
    while (i < lines.length) {
      if (lines(i) == "#data") {
        val buf = new StringBuilder
        i += 1
        while (i < lines.length && lines(i) != "#") {
          if (buf.nonEmpty) buf.append('\n')
          buf.append(lines(i))
          i += 1
        }
        out += buf.toString
      }
      i += 1
    }
    out.toSeq
  }

  test("expected_bailouts.json: same tag, same parsed-chunk boundary") {
    val obj = TestJson.parseObj(TestJson.readFile("src/test/resources/expected_bailouts.json"))
    var checked = 0
    for ((input, v) <- obj) {
      val exp = v.asInstanceOf[Map[String, Any]]
      val reason = exp("reason").asInstanceOf[String]
      val parsedChunk = exp("parsedChunk").asInstanceOf[String]
      val tagRx = """on_tag_name: \\?"([a-z]+)\\?"""".r
      val bytes = input.getBytes("UTF-8")
      val ex = intercept[EngineBailoutException] {
        new Lexer(strict = true).parse(bytes, new NullSink)
      }
      if (reason.startsWith("TextParsingAmbiguity")) {
        val expTag = tagRx.findFirstMatchIn(reason).map(_.group(1))
          .getOrElse(fail(s"unparseable reason $reason"))
        assert(ex.isInstanceOf[ParsingAmbiguityException], s"input: $input")
        assert(ex.asInstanceOf[ParsingAmbiguityException].tagName == expTag, s"input: $input")
      } else if (reason.startsWith("MaxTemplateNestingReached")) {
        assert(ex.isInstanceOf[TemplateNestingException], s"input: $input")
      } else fail(s"unknown reason kind: $reason")
      assert(ex.pos == parsedChunk.getBytes("UTF-8").length,
        s"bail position for: $input (got ${ex.pos}, expected chunk '${parsedChunk}')")
      checked += 1
    }
    info(s"checked $checked expected bailouts")
    assert(checked >= 10)
  }

  test("regression .dat inputs: strict tokenization matches bail-out set") {
    val bailouts = TestJson.parseObj(
      TestJson.readFile("src/test/resources/expected_bailouts.json")).keySet
    var ok = 0
    for (name <- Seq("script.dat", "foreign_content.dat",
                     "text_parsing_ambiguity.dat", "limits_bailouts.dat");
         input <- datInputs(name)) {
      val shouldBail = bailouts.contains(input)
      val bytes = input.getBytes("UTF-8")
      val bailed =
        try { new Lexer(strict = true).parse(bytes, new NullSink); false }
        catch { case _: EngineBailoutException => true }
      assert(bailed == shouldBail, s"[$name] strict bail mismatch for: $input")
      ok += 1
    }
    info(s"checked $ok .dat inputs")
    assert(ok >= 30)
  }

  test("regression .dat inputs: extraction is fragmentation-invariant") {
    val ex = new Extractor(ExtractPolicy.Default.copy(strict = false))
    for (name <- Seq("script.dat", "foreign_content.dat",
                     "text_parsing_ambiguity.dat", "limits_bailouts.dat");
         input <- datInputs(name)) {
      val whole = ex.extractString(input).spans
      for (frag <- Seq(1, 3, 7)) {
        val parts = input.grouped(frag).map(p => InFrag(isText = true, p, "")).toSeq
        assert(ex.extract(parts).spans == whole, s"[$name] frag=$frag for: $input")
      }
    }
  }

  /** Also: tokenizer must reconstruct the input exactly — text + raw
    * ranges tile the whole document (lossless offsets).
    */
  test("lossless raw coverage on regression inputs") {
    for (name <- Seq("script.dat", "foreign_content.dat", "limits_bailouts.dat");
         input <- datInputs(name)) {
      val bytes = input.getBytes("UTF-8")
      val cover = new CoverageSink(bytes.length)
      try new Lexer(strict = false).parse(bytes, cover)
      catch { case _: EngineBailoutException => () }
      assert(cover.fullyCovered, s"[$name] raw ranges do not tile: $input")
    }
  }
}

/** Discards everything. */
final class NullSink extends LexemeSink {
  def onText(s: Int, e: Int, t: Int): Unit = ()
  def onStartTag(ns: Int, ne: Int, h: Long, n: Int, sc: Boolean,
                 a: AttrList, rs: Int, re: Int): Unit = ()
  def onEndTag(ns: Int, ne: Int, h: Long, rs: Int, re: Int): Unit = ()
  def onComment(ts: Int, te: Int, rs: Int, re: Int): Unit = ()
  def onDoctype(a: Int, b: Int, c: Boolean, d: Int, e: Int, f: Boolean,
                g: Int, h: Int, i: Boolean, j: Boolean, k: Int, l: Int): Unit = ()
  def onRawWithoutToken(rs: Int, re: Int): Unit = ()
  def onEof(p: Int): Unit = ()
}

/** Asserts emitted raw ranges are contiguous from 0 and reach EOF. */
final class CoverageSink(len: Int) extends LexemeSink {
  private var cursor = 0
  private var gap = false
  private def cover(rs: Int, re: Int): Unit = {
    if (rs != cursor) gap = true
    cursor = re
  }
  def fullyCovered: Boolean = !gap && cursor == len
  def onText(s: Int, e: Int, t: Int): Unit = cover(s, e)
  def onStartTag(ns: Int, ne: Int, h: Long, n: Int, sc: Boolean,
                 a: AttrList, rs: Int, re: Int): Unit = cover(rs, re)
  def onEndTag(ns: Int, ne: Int, h: Long, rs: Int, re: Int): Unit = cover(rs, re)
  def onComment(ts: Int, te: Int, rs: Int, re: Int): Unit = cover(rs, re)
  def onDoctype(a: Int, b: Int, c: Boolean, d: Int, e: Int, f: Boolean,
                g: Int, h: Int, i: Boolean, j: Boolean, rs: Int, re: Int): Unit = cover(rs, re)
  def onRawWithoutToken(rs: Int, re: Int): Unit = cover(rs, re)
  def onEof(p: Int): Unit = ()
}
