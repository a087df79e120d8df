package graft.extract

import java.nio.{ByteBuffer, CharBuffer}
import java.nio.charset.{Charset, CharsetDecoder, CharsetEncoder, CoderResult}

/** WHATWG Encoding Standard label resolution (reference T7 breadth:
  * /root/reference/src/lib.rs:111-148 lists the 36 ASCII-compatible
  * encodings the reference supports via encoding_rs; labels and the
  * single-byte index tables are from the public WHATWG Encoding spec).
  *
  * The JVM provides most of these natively; the six it lacks
  * (`x-user-defined`, `iso-8859-8-i`, `x-mac-cyrillic`, `iso-8859-10`,
  * `iso-8859-14`, `macintosh`) are implemented here as single-byte
  * [[Charset]]s over 128-entry high tables. Notable WHATWG label
  * semantics preserved: `latin1`/`us-ascii`/`iso-8859-1` resolve to
  * windows-1252, `iso-8859-9` to windows-1254, `tis-620`/`iso-8859-11`
  * to windows-874, `gb2312` to GBK, and `iso-8859-8-i` decodes like
  * iso-8859-8 (the -I suffix only changes bidi presentation).
  */
object WhatwgEncodings {

  // ---- single-byte charset over a high table (bytes 0x80-0xFF) ----

  private final class SingleByte(name: String, hi: String) extends Charset(name, null) {
    require(hi.length == 128)
    private val lo = {
      // reverse map for the encoder: char -> byte (-1 = unmappable)
      val m = new java.util.HashMap[Char, Byte](256)
      var b = 0
      while (b < 128) {
        val c = hi.charAt(b)
        if (c != '�') m.putIfAbsent(c, (b + 128).toByte)
        b += 1
      }
      m
    }
    def contains(cs: Charset): Boolean = cs == this || cs.name == "US-ASCII"
    def newDecoder(): CharsetDecoder = new CharsetDecoder(this, 1.0f, 1.0f) {
      protected def decodeLoop(in: ByteBuffer, out: CharBuffer): CoderResult = {
        while (in.hasRemaining) {
          if (!out.hasRemaining) return CoderResult.OVERFLOW
          val b = in.get() & 0xff
          val c = if (b < 0x80) b.toChar else hi.charAt(b - 0x80)
          if (c == '�') { in.position(in.position() - 1); return CoderResult.unmappableForLength(1) }
          out.put(c)
        }
        CoderResult.UNDERFLOW
      }
    }
    def newEncoder(): CharsetEncoder = new CharsetEncoder(this, 1.0f, 1.0f, Array('?'.toByte)) {
      protected def encodeLoop(in: CharBuffer, out: ByteBuffer): CoderResult = {
        while (in.hasRemaining) {
          if (!out.hasRemaining) return CoderResult.OVERFLOW
          val c = in.get()
          if (c < 0x80) out.put(c.toByte)
          else {
            val b = lo.get(c)
            if (b == null) { in.position(in.position() - 1); return CoderResult.unmappableForLength(1) }
            out.put(b.byteValue)
          }
        }
        CoderResult.UNDERFLOW
      }
    }
  }

  // WHATWG index tables (public spec data; identical to the Apple/ISO
  // mappings these encodings standardize)
  private val MacCyrillicHi = "АБВГДЕЖЗИЙКЛМНОПРСТУФХЦЧШЩЪЫЬЭЮЯ†°Ґ£§•¶І®©™Ђђ≠Ѓѓ∞±≤≥іµґЈЄєЇїЉљЊњјЅ¬√ƒ≈∆«»… ЋћЌќѕ–—“”‘’÷„ЎўЏџ№Ёёяабвгдежзийклмнопрстуфхцчшщъыьэю€"
  private val Iso885910Hi = " ĄĒĢĪĨĶ§ĻĐŠŦŽ­ŪŊ°ąēģīĩķ·ļđšŧž―ūŋĀÁÂÃÄÅÆĮČÉĘËĖÍÎÏÐŅŌÓÔÕÖŨØŲÚÛÜÝÞßāáâãäåæįčéęëėíîïðņōóôõöũøųúûüýþĸ"
  private val Iso885914Hi = " Ḃḃ£ĊċḊ§Ẁ©ẂḋỲ­®ŸḞḟĠġṀṁ¶ṖẁṗẃṠỳẄẅṡÀÁÂÃÄÅÆÇÈÉÊËÌÍÎÏŴÑÒÓÔÕÖṪØÙÚÛÜÝŶßàáâãäåæçèéêëìíîïŵñòóôõöṫøùúûüýŷÿ"
  private val MacintoshHi = "ÄÅÇÉÑÖÜáàâäãåçéèêëíìîïñóòôöõúùûü†°¢£§•¶ß®©™´¨≠ÆØ∞±≤≥¥µ∂∑∏π∫ªºΩæø¿¡¬√ƒ≈∆«»… ÀÃÕŒœ–—“”‘’÷◊ÿŸ⁄€‹›ﬁﬂ‡·‚„‰ÂÊÁËÈÍÎÏÌÓÔÒÚÛÙıˆ˜¯˘˙˚¸˝˛ˇ"
  // x-user-defined: byte b in 0x80-0xFF -> U+F780 + (b - 0x80)
  private val XUserDefinedHi: String = {
    val sb = new java.lang.StringBuilder(128)
    var b = 0
    while (b < 128) { sb.append((0xf780 + b).toChar); b += 1 }
    sb.toString
  }

  lazy val xUserDefined: Charset = new SingleByte("x-user-defined", XUserDefinedHi)
  lazy val xMacCyrillic: Charset = new SingleByte("x-mac-cyrillic", MacCyrillicHi)
  lazy val iso885910: Charset = new SingleByte("iso-8859-10", Iso885910Hi)
  lazy val iso885914: Charset = new SingleByte("iso-8859-14", Iso885914Hi)
  lazy val macintosh: Charset = new SingleByte("macintosh", MacintoshHi)

  // ---- WHATWG label -> canonical encoding name ----

  private def entries(canonical: String, labels: String*): Seq[(String, String)] =
    labels.map(_ -> canonical)

  /** Full WHATWG label table for the reference's 36 ASCII-compatible
    * encodings (UTF-16/replacement labels resolve but map to UTF-8
    * handling upstream per the meta-charset rules, so they are omitted).
    */
  private val labelMap: Map[String, String] = (
    entries("UTF-8", "unicode-1-1-utf-8", "unicode11utf8", "unicode20utf8", "utf-8", "utf8", "x-unicode20utf8") ++
    entries("IBM866", "866", "cp866", "csibm866", "ibm866") ++
    entries("ISO-8859-2", "csisolatin2", "iso-8859-2", "iso-ir-101", "iso8859-2", "iso88592", "iso_8859-2", "iso_8859-2:1987", "l2", "latin2") ++
    entries("ISO-8859-3", "csisolatin3", "iso-8859-3", "iso-ir-109", "iso8859-3", "iso88593", "iso_8859-3", "iso_8859-3:1988", "l3", "latin3") ++
    entries("ISO-8859-4", "csisolatin4", "iso-8859-4", "iso-ir-110", "iso8859-4", "iso88594", "iso_8859-4", "iso_8859-4:1988", "l4", "latin4") ++
    entries("ISO-8859-5", "csisolatincyrillic", "cyrillic", "iso-8859-5", "iso-ir-144", "iso8859-5", "iso88595", "iso_8859-5", "iso_8859-5:1988") ++
    entries("ISO-8859-6", "arabic", "asmo-708", "csiso88596e", "csiso88596i", "csisolatinarabic", "ecma-114", "iso-8859-6", "iso-8859-6-e", "iso-8859-6-i", "iso-ir-127", "iso8859-6", "iso88596", "iso_8859-6", "iso_8859-6:1987") ++
    entries("ISO-8859-7", "csisolatingreek", "ecma-118", "elot_928", "greek", "greek8", "iso-8859-7", "iso-ir-126", "iso8859-7", "iso88597", "iso_8859-7", "iso_8859-7:1987", "sun_eu_greek") ++
    entries("ISO-8859-8", "csiso88598e", "csisolatinhebrew", "hebrew", "iso-8859-8", "iso-8859-8-e", "iso-ir-138", "iso8859-8", "iso88598", "iso_8859-8", "iso_8859-8:1988", "visual") ++
    entries("iso-8859-8-i", "csiso88598i", "iso-8859-8-i", "logical") ++
    entries("iso-8859-10", "csisolatin6", "iso-8859-10", "iso-ir-157", "iso8859-10", "iso885910", "l6", "latin6") ++
    entries("ISO-8859-13", "iso-8859-13", "iso8859-13", "iso885913") ++
    entries("iso-8859-14", "iso-8859-14", "iso8859-14", "iso885914") ++
    entries("ISO-8859-15", "csisolatin9", "iso-8859-15", "iso8859-15", "iso885915", "iso_8859-15", "l9") ++
    entries("ISO-8859-16", "iso-8859-16") ++
    entries("KOI8-R", "cskoi8r", "koi", "koi8", "koi8-r", "koi8_r") ++
    entries("KOI8-U", "koi8-ru", "koi8-u") ++
    entries("macintosh", "csmacintosh", "mac", "macintosh", "x-mac-roman") ++
    entries("x-windows-874", "dos-874", "iso-8859-11", "iso8859-11", "iso885911", "tis-620", "windows-874") ++
    entries("windows-1250", "cp1250", "windows-1250", "x-cp1250") ++
    entries("windows-1251", "cp1251", "windows-1251", "x-cp1251") ++
    entries("windows-1252", "ansi_x3.4-1968", "ascii", "cp1252", "cp819", "csisolatin1", "ibm819", "iso-8859-1", "iso-ir-100", "iso8859-1", "iso88591", "iso_8859-1", "iso_8859-1:1987", "l1", "latin1", "us-ascii", "windows-1252", "x-cp1252") ++
    entries("windows-1253", "cp1253", "windows-1253", "x-cp1253") ++
    entries("windows-1254", "cp1254", "csisolatin5", "iso-8859-9", "iso-ir-148", "iso8859-9", "iso88599", "iso_8859-9", "iso_8859-9:1989", "l5", "latin5", "windows-1254", "x-cp1254") ++
    entries("windows-1255", "cp1255", "windows-1255", "x-cp1255") ++
    entries("windows-1256", "cp1256", "windows-1256", "x-cp1256") ++
    entries("windows-1257", "cp1257", "windows-1257", "x-cp1257") ++
    entries("windows-1258", "cp1258", "windows-1258", "x-cp1258") ++
    entries("x-mac-cyrillic", "x-mac-cyrillic", "x-mac-ukrainian") ++
    entries("GBK", "chinese", "csgb2312", "csiso58gb231280", "gb2312", "gb_2312", "gb_2312-80", "gbk", "iso-ir-58", "x-gbk") ++
    entries("GB18030", "gb18030") ++
    entries("Big5", "big5", "big5-hkscs", "cn-big5", "csbig5", "x-x-big5") ++
    entries("EUC-JP", "cseucpkdfmtjapanese", "euc-jp", "x-euc-jp") ++
    entries("Shift_JIS", "csshiftjis", "ms932", "ms_kanji", "shift-jis", "shift_jis", "sjis", "windows-31j", "x-sjis") ++
    entries("EUC-KR", "cseuckr", "csksc56011987", "euc-kr", "iso-ir-149", "korean", "ks_c_5601-1987", "ks_c_5601-1989", "ksc5601", "ksc_5601", "windows-949") ++
    entries("x-user-defined", "x-user-defined")
  ).toMap

  private val custom: Map[String, Charset] = Map(
    "x-user-defined" -> xUserDefined,
    "x-mac-cyrillic" -> xMacCyrillic,
    "iso-8859-10" -> iso885910,
    "iso-8859-14" -> iso885914,
    "macintosh" -> macintosh,
    // decode-identical to iso-8859-8; the -I variant only flips the
    // document's bidi presentation, not the byte->char mapping
    "iso-8859-8-i" -> Charset.forName("ISO-8859-8")
  )

  /** Resolve a charset label per WHATWG rules (ASCII-whitespace trim +
    * lowercase, alias table), falling back to the JVM's own resolver for
    * labels outside the table. None if unknown everywhere.
    */
  def forLabel(label: String): Option[Charset] = {
    if (label == null) return None
    val norm = label.trim.toLowerCase(java.util.Locale.ROOT)
    if (norm.isEmpty) return None
    labelMap.get(norm) match {
      case Some(canonical) =>
        custom.get(canonical).orElse(
          try Some(Charset.forName(canonical)) catch { case _: Exception => None })
      case None =>
        try Some(Charset.forName(norm)) catch { case _: Exception => None }
    }
  }

  /** Number of the reference's 36 encodings this resolver can produce a
    * working decoder for (used by the breadth spec).
    */
  val referenceLabels: Seq[String] = Seq(
    "big5", "euc-jp", "euc-kr", "gb18030", "gbk", "ibm866",
    "iso-8859-2", "iso-8859-3", "iso-8859-4", "iso-8859-5", "iso-8859-6",
    "iso-8859-7", "iso-8859-8", "iso-8859-8-i", "iso-8859-10",
    "iso-8859-13", "iso-8859-14", "iso-8859-15", "iso-8859-16",
    "koi8-r", "koi8-u", "macintosh", "shift_jis", "utf-8", "windows-874",
    "windows-1250", "windows-1251", "windows-1252", "windows-1253",
    "windows-1254", "windows-1255", "windows-1256", "windows-1257",
    "windows-1258", "x-mac-cyrillic", "x-user-defined")
}
