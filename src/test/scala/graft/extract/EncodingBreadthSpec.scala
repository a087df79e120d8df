package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** T7 breadth: the reference supports 36 encodings
  * (/root/reference/src/lib.rs:111-148); this engine accepts every
  * ASCII-compatible label the JVM provides. Each label gets a roundtrip
  * with native-script content through meta-charset detection + re-decode.
  */
class EncodingBreadthSpec extends AnyFunSuite {

  // reference label -> charset-native sample text
  private val cases = Seq(
    "windows-1252" -> "déjà vu — résumé",
    "windows-1250" -> "Pøíli¹ ¾luťouèký".replace('¹', 'š').replace('ø', 'ř'),
    "windows-1251" -> "Съешь же ещё этих мягких булок",
    "windows-1253" -> "Γαζέες καὶ".replace("ὶ", "ί"),
    "windows-1254" -> "Pijamalı hasta yağız şoföre",
    "windows-1255" -> "דג סקרן שט",
    "windows-1256" -> "نص حكيم له",
    "windows-1257" -> "Įlinkdama fechtuotojo špaga",
    "windows-1258" -> "Con ngựa".replace("ự", "u"),
    "windows-874" -> "ภาษาไทย",
    "iso-8859-2" -> "Příliš žluťoučký kůň",
    "iso-8859-5" -> "Чешьте мягко",
    "iso-8859-7" -> "Ελληνικά κείμενα",
    "iso-8859-15" -> "l'œuvre à 10€",
    "koi8-r" -> "Широкая электрификация",
    "koi8-u" -> "Чуєш їхній гомін",
    "ibm866" -> "Русский текст",
    "euc-jp" -> "日本語のテキスト",
    "shift_jis" -> "漢字とカタカナ",
    "euc-kr" -> "한국어 텍스트",
    "gbk" -> "中文文本处理",
    "gb18030" -> "简体中文与繁體",
    "big5" -> "繁體中文字串",
    "macintosh" -> "déjà vu"
  )

  test("ASCII-compatible reference encodings roundtrip via meta detection") {
    val ex = new Extractor(ExtractPolicy.Default.copy(strict = false))
    var tested = 0
    for ((label, sample) <- cases) {
      val cs =
        try Some(java.nio.charset.Charset.forName(label))
        catch { case _: Exception => None }
      cs match {
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
        case _ => info(s"$label not available on this JVM; skipped")
      }
    }
    assert(tested >= 20, s"only $tested encodings tested")
  }
}
