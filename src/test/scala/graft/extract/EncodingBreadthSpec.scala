package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** T7 breadth: the reference supports 36 ASCII-compatible encodings
  * (/root/reference/src/lib.rs:111-148). Labels resolve through
  * [[WhatwgEncodings]] (WHATWG alias table + custom single-byte charsets
  * for the six the JVM lacks). Each label gets a roundtrip with
  * charset-native content through meta-charset detection + re-decode.
  */
class EncodingBreadthSpec extends AnyFunSuite {

  // reference label -> charset-native sample text
  private val cases = Seq(
    "utf-8" -> "déjà vu — résumé ✓",
    "windows-1252" -> "déjà vu — résumé",
    "windows-1250" -> "Příliš žluťoučký",
    "windows-1251" -> "Съешь же ещё этих мягких булок",
    "windows-1253" -> "Γαζέες καί",
    "windows-1254" -> "Pijamalı hasta yağız şoföre",
    "windows-1255" -> "דג סקרן שט",
    "windows-1256" -> "نص حكيم له",
    "windows-1257" -> "Įlinkdama fechtuotojo špaga",
    "windows-1258" -> "Con ngựa".replace("ự", "u"),
    "windows-874" -> "ภาษาไทย",
    "iso-8859-2" -> "Příliš žluťoučký kůň",
    "iso-8859-3" -> "ĝi estas ĥoro kaj ŭa",
    "iso-8859-4" -> "ķēķī ļaunā žāvē",
    "iso-8859-5" -> "Чешьте мягко",
    "iso-8859-6" -> "نص عربي",
    "iso-8859-7" -> "Ελληνικά κείμενα",
    "iso-8859-8" -> "טקסט עברי",
    "iso-8859-8-i" -> "טקסט לוגי",
    "iso-8859-10" -> "Þjóð ārā ŋō ĸ",
    "iso-8859-13" -> "žąsis ėjo į šilą",
    "iso-8859-14" -> "ŵy a ḃara ḋu ŷng",
    "iso-8859-15" -> "l'œuvre à 10€",
    "iso-8859-16" -> "limba română șț",
    "koi8-r" -> "Широкая электрификация",
    "koi8-u" -> "Чуєш їхній гомін",
    "ibm866" -> "Русский текст",
    "euc-jp" -> "日本語のテキスト",
    "shift_jis" -> "漢字とカタカナ",
    "euc-kr" -> "한국어 텍스트",
    "gbk" -> "中文文本处理",
    "gb18030" -> "简体中文与繁體",
    "big5" -> "繁體中文字串",
    "macintosh" -> "déjà vu — œuvre ≠ π",
    "x-mac-cyrillic" -> "Русский текст № і ґ",
    "x-user-defined" -> "prepost"
  )

  test("reference encodings roundtrip via meta detection (>= 30 of 36)") {
    assert(cases.map(_._1).toSet == WhatwgEncodings.referenceLabels.toSet,
      "spec covers exactly the reference's 36 labels")
    val ex = new Extractor(ExtractPolicy.Default.copy(strict = false))
    var tested = 0
    for ((label, sample) <- cases) {
      WhatwgEncodings.forLabel(label) match {
        case Some(charset) if charset.canEncode =>
          // only keep chars the charset can actually encode (some JVM
          // charsets differ from WHATWG variants at the edges)
          val enc = charset.newEncoder()
          val body = sample.filter(c => enc.canEncode(c))
          assert(body.nonEmpty, s"$label sample entirely unencodable")
          val html = s"<html><head><meta charset=$label></head><body><article><p>$body</p></article></body></html>"
          val r = ex.extractEncoded(html.getBytes(charset), "UTF-8")
          assert(r.error == null, s"$label: ${r.error}")
          assert(r.spans.map(_.text).mkString == body, s"$label roundtrip")
          tested += 1
        case _ => info(s"$label not available; skipped")
      }
    }
    assert(tested >= 30, s"only $tested encodings tested")
    info(s"$tested/36 reference encodings roundtrip")
  }

  test("x-user-defined maps high bytes to U+F780+b and back") {
    val cs = WhatwgEncodings.xUserDefined
    val raw = Array.tabulate[Byte](256)(_.toByte)
    val s = new String(raw, cs)
    (0 until 128).foreach(b => assert(s.charAt(b) == b.toChar))
    (128 until 256).foreach(b => assert(s.charAt(b) == (0xf780 + b - 0x80).toChar))
    assert(s.getBytes(cs).toSeq == raw.toSeq)
  }

  test("WHATWG label aliasing: legacy labels resolve per spec") {
    def canon(l: String) = WhatwgEncodings.forLabel(l).get.name
    assert(canon("latin1") == canon("windows-1252"))
    assert(canon("us-ascii") == canon("windows-1252"))
    assert(canon("iso-8859-1") == canon("windows-1252"))
    assert(canon("iso-8859-9") == canon("windows-1254"))
    assert(canon("gb2312") == canon("gbk"))
    assert(canon("tis-620") == canon("windows-874"))
    assert(canon("iso-8859-11") == canon("windows-874"))
    assert(canon("x-mac-ukrainian") == canon("x-mac-cyrillic"))
    assert(canon("ms932") == canon("shift_jis"))
    assert(canon("iso-8859-8-i") == canon("iso-8859-8"))
    assert(canon(" UTF-8\t") == "UTF-8") // ASCII-whitespace trim
  }

  test("meta with an aliased label re-decodes (latin1 body, windows-1252 bytes)") {
    val ex = new Extractor(ExtractPolicy.Default.copy(strict = false))
    val cs = java.nio.charset.Charset.forName("windows-1252")
    val html = "<html><head><meta charset=latin1></head><body><article><p>café — ok</p></article></body></html>"
    val r = ex.extractEncoded(html.getBytes(cs), "UTF-8")
    assert(r.error == null)
    assert(r.spans.map(_.text).mkString == "café — ok")
  }
}
