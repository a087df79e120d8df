package graft.rewrite

import org.scalatest.funsuite.AnyFunSuite
import graft.TestJson
import graft.selectors.{SelectorParser, SelectorParseException}

/** Runs the reference's css3-modsel golden corpora
  * (tests/data/selector_matching and tests/data/element_content_replacement,
  * loaded via tests/harness/suites/selectors_tests.rs semantics): selectors
  * that fail to parse are skipped exactly like the reference skips them;
  * every parseable selector must reproduce the expected output verbatim.
  */
abstract class CorpusRunner extends AnyFunSuite {
  def suite: String
  def runCase(selector: String, src: String): String

  private def listCases(): Seq[(String, String, String, String)] = {
    val dir = TestJson.resourceDir(suite)
    val infos = dir.listFiles().filter(_.getName.endsWith("-info.json")).sortBy(_.getName)
    infos.toSeq.flatMap { f =>
      val obj = TestJson.parseObj(TestJson.readFile(f.getPath))
      val src = TestJson.readFile(new java.io.File(dir, obj("src").asInstanceOf[String]).getPath)
      val sels = obj("selectors").asInstanceOf[Map[String, Any]]
      sels.toSeq.sortBy(_._2.asInstanceOf[String]).map { case (sel, expFile) =>
        val expected = TestJson.readFile(new java.io.File(dir, expFile.asInstanceOf[String]).getPath)
        (f.getName, sel, src, expected)
      }
    }
  }

  test(s"$suite corpus") {
    var run = 0
    var skipped = 0
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, sel, src, expected) <- listCases()) {
      val parsed =
        try { SelectorParser.parse(sel); true }
        catch { case _: SelectorParseException => skipped += 1; false }
      if (parsed) {
        run += 1
        val actual =
          try runCase(sel, src)
          catch { case e: Throwable => s"<<exception: ${e.getMessage}>>" }
        if (actual != expected) {
          failures += s"$name selector `$sel`"
          if (failures.size <= 3) {
            info(s"=== FAIL $name `$sel`")
            info(s"--- expected:\n${expected.take(2000)}")
            info(s"--- actual:\n${actual.take(2000)}")
          }
        }
      }
    }
    info(s"$suite: ran $run, skipped(unsupported selector) $skipped, failed ${failures.size}")
    assert(failures.isEmpty, s"${failures.size} of $run failed: ${failures.take(20).mkString("; ")}")
  }
}

class SelectorMatchingCorpusSpec extends CorpusRunner {
  def suite = "selector_matching"

  def runCase(selector: String, src: String): String = {
    var firstTextChunkExpected = true
    val rw = new Rewriter(
      Seq(selector -> ElementHandlers(
        element = el => {
          el.before(s"<!--[ELEMENT('$selector')]-->", ContentType.Html)
          el.after(s"<!--[/ELEMENT('$selector')]-->", ContentType.Html)
        },
        comments = c => {
          c.before(s"<!--[COMMENT('$selector')]-->", ContentType.Html)
          c.after(s"<!--[/COMMENT('$selector')]-->", ContentType.Html)
        },
        text = t => {
          if (firstTextChunkExpected) {
            t.before(s"<!--[TEXT('$selector')]-->", ContentType.Html)
            firstTextChunkExpected = false
          }
          if (t.lastInTextNode) {
            t.after(s"<!--[/TEXT('$selector')]-->", ContentType.Html)
            firstTextChunkExpected = true
          }
        }
      )))
    rw.rewrite(src)
  }
}

class ElementContentReplacementCorpusSpec extends CorpusRunner {
  def suite = "element_content_replacement"

  def runCase(selector: String, src: String): String = {
    val rw = new Rewriter(
      Seq(selector -> ElementHandlers(
        element = el => el.setInnerContent(s"<!--Replaced ($selector) -->", ContentType.Html)
      )))
    rw.rewrite(src)
  }
}
