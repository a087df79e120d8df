package graft.extract

import org.scalatest.funsuite.AnyFunSuite

class PdfSpec extends AnyFunSuite {

  private def rawPdf(content: String): Array[Byte] =
    (s"%PDF-1.4\n1 0 obj\n<< /Length ${content.length} >>\nstream\n" +
      content + "\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")

  private def flatePdf(content: String): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(content.getBytes("ISO-8859-1")); d.finish()
    val buf = new Array[Byte](content.length * 2 + 64)
    val n = d.deflate(buf)
    d.end()
    val head = "%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode >>\nstream\n".getBytes("ISO-8859-1")
    val tail = "\nendstream\nendobj\n%%EOF".getBytes("ISO-8859-1")
    head ++ buf.take(n) ++ tail
  }

  test("sniffing: only %PDF- payloads route to the pdf branch") {
    assert(PdfTextExtract.isPdf("%PDF-1.7\n".getBytes))
    assert(!PdfTextExtract.isPdf("<html></html>".getBytes))
    assert(!PdfTextExtract.isPdf("%PD".getBytes))
  }

  test("Tj and ' operators in an uncompressed stream") {
    val r = PdfTextExtract.extract(rawPdf("BT /F1 12 Tf (Hello) Tj (World) ' ET"))
    assert(r.error == null)
    assert(r.spans.map(_.text) == Seq("Hello", "World"))
  }

  test("TJ array operator with kerning numbers") {
    val r = PdfTextExtract.extract(rawPdf("BT [(Hel) -20 (lo) 5 ( wor) (ld)] TJ ET"))
    assert(r.spans.map(_.text) == Seq("Hel", "lo", " wor", "ld"))
  }

  test("escapes and nested parens decode") {
    val r = PdfTextExtract.extract(rawPdf("""BT (a\(b\)c \\ \110i) Tj ET"""))
    assert(r.spans.map(_.text) == Seq("a(b)c \\ Hi"))
  }

  test("FlateDecode streams inflate via the JDK") {
    val r = PdfTextExtract.extract(flatePdf("BT (compressed text) Tj ET"))
    assert(r.error == null)
    assert(r.spans.map(_.text) == Seq("compressed text"))
  }

  test("strings outside BT/ET are ignored") {
    val r = PdfTextExtract.extract(rawPdf("(not text) BT (yes) Tj ET (also not) Tj"))
    assert(r.spans.map(_.text) == Seq("yes"))
  }

  test("router dispatches by payload") {
    val router = new DocRouter()
    val html = router.extract("<body><nav>x</nav><p>hi</p></body>".getBytes("UTF-8"))
    assert(html.spans.map(_.text) == Seq("hi"))
    val pdf = router.extract(rawPdf("BT (doc) Tj ET"))
    assert(pdf.spans.map(_.text) == Seq("doc"))
  }
}
